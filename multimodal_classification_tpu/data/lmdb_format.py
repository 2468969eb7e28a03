"""Pure-Python LMDB file-format implementation (writer + fallback reader).

The image has no ``lmdb`` module, and the hot-path reader is native C++
(native/lmdb_reader.cc via data/lmdb_store.py). This module provides:

- :func:`write_lmdb` — bulk-writer producing valid LMDB files (data version
  1, 64-bit LE, fresh sequential write: sorted leaf pages + overflow chains +
  branch levels + dual meta pages). Used to fabricate test fixtures in the
  exact format of Facebook's detectron.lmdb and to re-pack feature stores.
- :class:`PythonLMDBReader` — pure-python B+tree reader with the same API as
  the native one (correctness cross-check + fallback when no compiler).

Format notes (mdb.c data layout): 4096-byte pages; meta pages 0/1 pick max
txnid; page header = <pgno:u64, pad:u16, flags:u16, lower:u16, upper:u16>;
node = <lo:u16, hi:u16, flags:u16, ksize:u16, key..., data...>; leaf datasize
= lo|hi<<16; branch child pgno = lo|hi<<16|flags<<32; F_BIGDATA leaf data is
a u64 overflow pgno, overflow data contiguous from first page offset 16.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Tuple

PAGE = 4096
PAGEHDR = 16
MAGIC = 0xBEEFC0DE
VERSION = 1
P_BRANCH, P_LEAF, P_OVERFLOW, P_META, P_LEAF2 = 0x01, 0x02, 0x04, 0x08, 0x20
F_BIGDATA = 0x01
INVALID = (1 << 64) - 1
# LMDB nodemax for 4096 pages: ((psize - PAGEHDR) / MDB_MINKEYS) & -2
NODEMAX = ((PAGE - PAGEHDR) // 2) & ~1

_PAGEHDR_FMT = struct.Struct("<QHHHH")
_OVHDR_FMT = struct.Struct("<QHHI")
_NODEHDR_FMT = struct.Struct("<HHHH")
_DB_FMT = struct.Struct("<IHHQQQQQ")
_META_HEAD_FMT = struct.Struct("<IIQQ")
_META_TAIL_FMT = struct.Struct("<QQ")


def _even(n: int) -> int:
    return (n + 1) & ~1


class _Writer:
    def __init__(self):
        self.pages: Dict[int, bytes] = {}
        self.next_pgno = 2
        self.n_leaf = self.n_branch = self.n_overflow = 0

    def alloc(self, count: int = 1) -> int:
        pg = self.next_pgno
        self.next_pgno += count
        return pg

    def emit_overflow(self, data: bytes) -> int:
        count = -(-(PAGEHDR + len(data)) // PAGE)
        pgno = self.alloc(count)
        # overflow header stores the page count in the pb union (u32 @ offset 12);
        # "<QHHI" is exactly the 16-byte page header
        blob = (_OVHDR_FMT.pack(pgno, 0, P_OVERFLOW, count) + data).ljust(
            count * PAGE, b"\x00"
        )
        for i in range(count):
            self.pages[pgno + i] = blob[i * PAGE : (i + 1) * PAGE]
        self.n_overflow += count
        return pgno

    def emit_node_page(
        self, flags: int, nodes: List[bytes]
    ) -> int:
        pgno = self.alloc()
        ptrs: List[int] = []
        upper = PAGE
        body = bytearray(PAGE)
        for nd in nodes:
            upper -= _even(len(nd))
            body[upper : upper + len(nd)] = nd
            ptrs.append(upper)
        lower = PAGEHDR + 2 * len(nodes)
        assert lower <= upper, "page overflow"
        body[0:PAGEHDR] = _PAGEHDR_FMT.pack(pgno, 0, flags, lower, upper)
        for i, off in enumerate(ptrs):
            body[PAGEHDR + 2 * i : PAGEHDR + 2 * i + 2] = struct.pack("<H", off)
        self.pages[pgno] = bytes(body)
        if flags & P_LEAF:
            self.n_leaf += 1
        else:
            self.n_branch += 1
        return pgno


def _leaf_node(key: bytes, value: bytes, writer: _Writer) -> bytes:
    big = len(value) > NODEMAX - 8 - len(key)
    if big:
        ovpg = writer.emit_overflow(value)
        data = struct.pack("<Q", ovpg)
        flags = F_BIGDATA
    else:
        data = value
        flags = 0
    dsize = len(value)
    return (
        _NODEHDR_FMT.pack(dsize & 0xFFFF, (dsize >> 16) & 0xFFFF, flags, len(key))
        + key
        + data
    )


def _branch_node(key: bytes, child_pgno: int) -> bytes:
    return (
        _NODEHDR_FMT.pack(
            child_pgno & 0xFFFF, (child_pgno >> 16) & 0xFFFF,
            (child_pgno >> 32) & 0xFFFF, len(key),
        )
        + key
    )


def _pack_level(
    writer: _Writer, children: List[Tuple[bytes, int]], leaf: bool, items=None
) -> List[Tuple[bytes, int]]:
    """Pack one tree level; returns [(first_key, pgno)] of the new level."""
    out: List[Tuple[bytes, int]] = []
    cur: List[bytes] = []
    cur_first: Optional[bytes] = None
    used = PAGEHDR

    def flush():
        nonlocal cur, cur_first, used
        if cur:
            pgno = writer.emit_node_page(P_LEAF if leaf else P_BRANCH, cur)
            out.append((cur_first, pgno))
            cur, cur_first, used = [], None, PAGEHDR

    source = items if leaf else children
    for idx, entry in enumerate(source):
        if leaf:
            key, value = entry
            nd = _leaf_node(key, value, writer)
        else:
            key, child = entry
            sep = b"" if not cur else key  # first node of a branch page: empty key
            nd = _branch_node(sep, child)
        need = _even(len(nd)) + 2
        if used + need > PAGE and cur:
            if not leaf:
                # re-emit this node with its real separator on the new page,
                # where it becomes the (empty-key) first node
                flush()
                nd = _branch_node(b"", entry[1])
                need = _even(len(nd)) + 2
            else:
                flush()
        if cur_first is None:
            cur_first = key
        cur.append(nd)
        used += need
    flush()
    return out


def write_lmdb(path: str, items: Dict[bytes, bytes]):
    """Write a fresh single-file LMDB database (open with subdir=False
    semantics, i.e. ``path`` is the data file itself)."""
    writer = _Writer()
    sorted_items = sorted(items.items())
    if sorted_items:
        level = _pack_level(writer, [], leaf=True, items=sorted_items)
        depth = 1
        while len(level) > 1:
            level = _pack_level(writer, level, leaf=False)
            depth += 1
        root = level[0][1]
    else:
        root, depth = INVALID, 0

    last_pg = writer.next_pgno - 1
    free_db = _DB_FMT.pack(PAGE, 0, 0, 0, 0, 0, 0, INVALID)
    main_db = _DB_FMT.pack(
        0, 0, depth, writer.n_branch, writer.n_leaf, writer.n_overflow,
        len(sorted_items), root,
    )
    mapsize = (last_pg + 1) * PAGE

    with open(path, "wb") as f:
        for txnid, pgno in ((0, 0), (1, 1)):
            meta = (
                _PAGEHDR_FMT.pack(pgno, 0, P_META, 0, 0)
                + _META_HEAD_FMT.pack(MAGIC, VERSION, 0, mapsize)
                + free_db
                + main_db
                + _META_TAIL_FMT.pack(last_pg, txnid)
            )
            f.write(meta.ljust(PAGE, b"\x00"))
        for pgno in range(2, last_pg + 1):
            f.write(writer.pages[pgno])


# ---------------------------------------------------------------------------
# Pure-python reader (fallback / cross-check)
# ---------------------------------------------------------------------------


class PythonLMDBReader:
    def __init__(self, path: str):
        import os

        if os.path.isdir(path):
            path = os.path.join(path, "data.mdb")
        with open(path, "rb") as f:
            self.buf = f.read()
        psize = 4096
        best = None
        for i in range(2):
            off = i * psize
            head = _META_HEAD_FMT.unpack_from(self.buf, off + PAGEHDR)
            if head[0] != MAGIC:
                continue
            db0 = _DB_FMT.unpack_from(self.buf, off + PAGEHDR + _META_HEAD_FMT.size)
            if db0[0]:
                psize = db0[0]
            db1 = _DB_FMT.unpack_from(
                self.buf, off + PAGEHDR + _META_HEAD_FMT.size + _DB_FMT.size
            )
            tail = _META_TAIL_FMT.unpack_from(
                self.buf, off + PAGEHDR + _META_HEAD_FMT.size + 2 * _DB_FMT.size
            )
            if best is None or tail[1] >= best[0]:
                best = (tail[1], db1)
        if best is None:
            raise ValueError(f"not an LMDB file: {path}")
        self.psize = psize
        _pad, _flags, self.depth, _b, _l, _o, self.entries, self.root = best[1]

    # -- page/node access -------------------------------------------------
    def _hdr(self, pgno: int):
        return _PAGEHDR_FMT.unpack_from(self.buf, pgno * self.psize)

    def _nodes(self, pgno: int) -> Iterator[Tuple[bytes, int, int, int]]:
        base = pgno * self.psize
        _pg, _pad, flags, lower, _upper = self._hdr(pgno)
        n = (lower - PAGEHDR) >> 1
        for i in range(n):
            (ptr,) = struct.unpack_from("<H", self.buf, base + PAGEHDR + 2 * i)
            yield self._node(base + ptr)

    def _node(self, off: int):
        lo, hi, flags, ksize = _NODEHDR_FMT.unpack_from(self.buf, off)
        key = self.buf[off + 8 : off + 8 + ksize]
        return key, lo, hi, flags, off + 8 + ksize

    def _node_count(self, pgno: int) -> int:
        return (self._hdr(pgno)[3] - PAGEHDR) >> 1

    def _node_at(self, pgno: int, i: int):
        base = pgno * self.psize
        (ptr,) = struct.unpack_from("<H", self.buf, base + PAGEHDR + 2 * i)
        return self._node(base + ptr)

    def _leaf_value(self, lo, hi, flags, data_off) -> bytes:
        dsize = lo | (hi << 16)
        if flags & F_BIGDATA:
            (ovpg,) = struct.unpack_from("<Q", self.buf, data_off)
            start = ovpg * self.psize + PAGEHDR
            return self.buf[start : start + dsize]
        return self.buf[data_off : data_off + dsize]

    # -- API --------------------------------------------------------------
    def get(self, key: bytes) -> Optional[bytes]:
        if self.root == INVALID:
            return None
        pgno = self.root
        while True:
            flags = self._hdr(pgno)[2]
            n = self._node_count(pgno)
            if flags & P_BRANCH:
                best = 0
                lo_i, hi_i = 1, n
                while lo_i < hi_i:
                    mid = (lo_i + hi_i) // 2
                    k, nlo, nhi, nflags, _ = self._node_at(pgno, mid)
                    if k <= key:
                        best = mid
                        lo_i = mid + 1
                    else:
                        hi_i = mid
                k, nlo, nhi, nflags, _ = self._node_at(pgno, best)
                pgno = nlo | (nhi << 16) | (nflags << 32)
            elif flags & P_LEAF:
                lo_i, hi_i = 0, n
                while lo_i < hi_i:
                    mid = (lo_i + hi_i) // 2
                    k, nlo, nhi, nflags, doff = self._node_at(pgno, mid)
                    if k == key:
                        return self._leaf_value(nlo, nhi, nflags, doff)
                    if k < key:
                        lo_i = mid + 1
                    else:
                        hi_i = mid
                return None
            else:
                raise ValueError(f"unexpected page flags {flags:#x}")

    def items(self) -> Iterator[Tuple[bytes, bytes]]:
        if self.root == INVALID:
            return
        stack = [(self.root, 0)]
        while stack:
            pgno, i = stack[-1]
            flags = self._hdr(pgno)[2]
            if i >= self._node_count(pgno):
                stack.pop()
                continue
            stack[-1] = (pgno, i + 1)
            k, lo, hi, nflags, doff = self._node_at(pgno, i)
            if flags & P_BRANCH:
                stack.append((lo | (hi << 16) | (nflags << 32), 0))
            else:
                yield k, self._leaf_value(lo, hi, nflags, doff)

    def close(self):
        pass
