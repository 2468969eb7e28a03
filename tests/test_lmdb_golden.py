"""Spec-derived LMDB golden-byte fixtures.

Every byte here is hand-assembled from the LMDB on-disk format specification
(mdb.c data version 1, 64-bit little-endian: struct MDB_page / MDB_node /
MDB_meta) — these fixtures deliberately NEVER call
``data/lmdb_format.py::write_lmdb``, breaking the writer/reader
mutual-oracle loop flagged in the round-4 verdict: a shared format
misunderstanding between our writer and readers would pass every round-trip
test yet fail on Facebook's real ``detectron.lmdb``. The layouts below are
ones the writer never produces:

- meta page 0 NEWER than meta page 1 (the writer always emits txnid 0 then
  1, so its files can't test the "pick max txnid" rule in this direction);
- a corrupt/stale meta page (bad magic) that must be skipped;
- branch separator keys that are truncated prefixes appearing nowhere as
  leaf keys (real LMDB shortens separators; the writer re-uses full first
  keys);
- an 8192-byte page size advertised via the free-DB ``pad`` field;
- a hand-laid overflow chain with a value length far from a page multiple.

Byte-level provenance (LMDB spec, all little-endian):
- page header (16 B): pgno u64 | pad u16 | flags u16 | lower u16 | upper u16
  (for P_OVERFLOW the lower/upper union is instead a u32 page count at
  offset 12);
- node pointer array: u16 in-page offsets starting at byte 16;
  lower = 16 + 2*nkeys;
- leaf node: lo u16 | hi u16 | flags u16 | ksize u16 | key | data, with
  datasize = lo | hi<<16; F_BIGDATA (0x01) ⇒ data is a u64 overflow pgno
  and the value lives contiguously from byte 16 of that page;
- branch node: same header with child pgno = lo | hi<<16 | flags<<32;
  node 0 of a branch page carries an EMPTY key; separator key k of node i
  satisfies k <= every key in child i (need not itself be a stored key);
- meta page: page header | magic u32 (0xBEEFC0DE) | version u32 | address
  u64 | mapsize u64 | free-DB (48 B) | main-DB (48 B) | last_pg u64 |
  txnid u64; DB record: pad u32 | flags u16 | depth u16 | branch_pages u64
  | leaf_pages u64 | overflow_pages u64 | entries u64 | root u64; the
  free-DB's pad field holds the page size; readers open the NEWER valid
  meta (max txnid).
"""

import struct

import pytest

from multimodal_classification_tpu.data.lmdb_format import PythonLMDBReader
from multimodal_classification_tpu.data.lmdb_store import NativeLMDBReader

MAGIC = 0xBEEFC0DE
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
INVALID = (1 << 64) - 1


@pytest.fixture(scope="module")
def native_so():
    from multimodal_classification_tpu.data.lmdb_store import build_native_reader

    so = build_native_reader()
    if so is None:
        pytest.skip("no C++ compiler for native reader")
    return so


def _leaf_node(key: bytes, data: bytes, flags: int = 0, dsize: int = None) -> bytes:
    if dsize is None:
        dsize = len(data)
    return struct.pack("<HHHH", dsize & 0xFFFF, (dsize >> 16) & 0xFFFF,
                       flags, len(key)) + key + data


def _branch_node(key: bytes, child: int) -> bytes:
    return struct.pack("<HHHH", child & 0xFFFF, (child >> 16) & 0xFFFF,
                       (child >> 32) & 0xFFFF, len(key)) + key


def _node_page(pgno: int, flags: int, nodes, psize: int = 4096) -> bytes:
    """Nodes packed downward from the page end, u16 pointer array at byte 16
    (spec: MDB_page mp_ptrs)."""
    body = bytearray(psize)
    upper = psize
    ptrs = []
    for nd in nodes:
        upper -= (len(nd) + 1) & ~1  # 2-byte node alignment
        body[upper:upper + len(nd)] = nd
        ptrs.append(upper)
    lower = 16 + 2 * len(nodes)
    assert lower <= upper
    body[0:16] = struct.pack("<QHHHH", pgno, 0, flags, lower, upper)
    for i, off in enumerate(ptrs):
        struct.pack_into("<H", body, 16 + 2 * i, off)
    return bytes(body)


def _meta_page(pgno: int, *, txnid: int, root: int, depth: int, entries: int,
               last_pg: int, psize: int = 4096, magic: int = MAGIC,
               n_branch: int = 0, n_leaf: int = 1, n_overflow: int = 0) -> bytes:
    free_db = struct.pack("<IHHQQQQQ", psize, 0, 0, 0, 0, 0, 0, INVALID)
    main_db = struct.pack("<IHHQQQQQ", 0, 0, depth, n_branch, n_leaf,
                          n_overflow, entries, root)
    meta = (struct.pack("<QHHHH", pgno, 0, P_META, 0, 0)
            + struct.pack("<IIQQ", magic, 1, 0, (last_pg + 1) * psize)
            + free_db + main_db
            + struct.pack("<QQ", last_pg, txnid))
    return meta.ljust(psize, b"\x00")


def _write(tmp_path, name: str, pages) -> str:
    path = str(tmp_path / name)
    with open(path, "wb") as f:
        for p in pages:
            f.write(p)
    return path


def _readers(path, native_so):
    return [("python", PythonLMDBReader(path)),
            ("native", NativeLMDBReader(path, native_so))]


class TestMetaSelection:
    def test_meta0_newer_wins(self, tmp_path, native_so):
        """txnid(meta0)=7 > txnid(meta1)=2, pointing at DIFFERENT roots with
        different values for the same key — the newer meta's value must win.
        The repo writer always emits meta1 newer, so only a golden fixture
        can probe this direction."""
        leaf_old = _node_page(2, P_LEAF, [_leaf_node(b"k", b"OLD")])
        leaf_new = _node_page(3, P_LEAF, [_leaf_node(b"k", b"NEW")])
        path = _write(tmp_path, "meta0new.mdb", [
            _meta_page(0, txnid=7, root=3, depth=1, entries=1, last_pg=3),
            _meta_page(1, txnid=2, root=2, depth=1, entries=1, last_pg=3),
            leaf_old, leaf_new,
        ])
        for name, r in _readers(path, native_so):
            assert r.get(b"k") == b"NEW", name
            assert r.entries == 1, name

    def test_stale_meta_bad_magic_skipped(self, tmp_path, native_so):
        """meta0 carries a corrupt magic (torn write / stale page): readers
        must recover via meta1 even though meta0's txnid field is larger."""
        leaf = _node_page(2, P_LEAF, [_leaf_node(b"k", b"GOOD")])
        path = _write(tmp_path, "stale.mdb", [
            _meta_page(0, txnid=99, root=2, depth=1, entries=1, last_pg=2,
                       magic=0xDEADBEEF),
            _meta_page(1, txnid=1, root=2, depth=1, entries=1, last_pg=2),
            leaf,
        ])
        for name, r in _readers(path, native_so):
            assert r.get(b"k") == b"GOOD", name


class TestBranchLayout:
    def _tree(self, tmp_path):
        """Two-level tree whose separators ("c", "e") are truncated prefixes
        stored nowhere as leaf keys — exactly what real LMDB's separator
        shortening produces and what the repo writer (which copies full
        first keys) never emits."""
        leaves = {
            2: [(b"apple", b"v-apple"), (b"banana", b"v-banana")],
            3: [(b"cherry", b"v-cherry"), (b"damson", b"v-damson")],
            4: [(b"elder", b"v-elder"), (b"fig", b"v-fig")],
        }
        pages = [
            _meta_page(0, txnid=0, root=5, depth=2, entries=6, last_pg=5,
                       n_branch=1, n_leaf=3),
            _meta_page(1, txnid=1, root=5, depth=2, entries=6, last_pg=5,
                       n_branch=1, n_leaf=3),
        ]
        for pgno in (2, 3, 4):
            pages.append(_node_page(
                pgno, P_LEAF, [_leaf_node(k, v) for k, v in leaves[pgno]]))
        pages.append(_node_page(5, P_BRANCH, [
            _branch_node(b"", 2),     # branch node 0: empty key (spec)
            _branch_node(b"c", 3),    # truncated separator, not a leaf key
            _branch_node(b"e", 4),
        ]))
        items = [kv for pg in (2, 3, 4) for kv in leaves[pg]]
        return _write(tmp_path, "branch.mdb", pages), items

    def test_truncated_separators_route_gets(self, tmp_path, native_so):
        path, items = self._tree(tmp_path)
        for name, r in _readers(path, native_so):
            for k, v in items:
                assert r.get(k) == v, (name, k)
            # probes landing between separators and leaf keys
            assert r.get(b"c") is None, name       # == separator, not a key
            assert r.get(b"cat") is None, name     # routes to page 3
            assert r.get(b"aaa") is None, name     # before first key
            assert r.get(b"zzz") is None, name     # after last key

    def test_iteration_in_key_order(self, tmp_path, native_so):
        path, items = self._tree(tmp_path)
        for name, r in _readers(path, native_so):
            assert list(r.items()) == items, name


class TestOverflowChain:
    def test_hand_laid_overflow_pages(self, tmp_path, native_so):
        """9000-byte value: 16-byte overflow header + data spans 3 pages
        (ceil(9016/4096)); data runs CONTIGUOUSLY across page boundaries
        with no headers on the continuation pages (spec: OVERFLOW chains)."""
        value = bytes((i * 37 + 11) % 251 for i in range(9000))
        leaf = _node_page(2, P_LEAF, [
            _leaf_node(b"big", struct.pack("<Q", 3), flags=F_BIGDATA,
                       dsize=len(value)),
            _leaf_node(b"small", b"tiny"),
        ])
        ov = (struct.pack("<QHHI", 3, 0, P_OVERFLOW, 3) + value).ljust(
            3 * 4096, b"\x00")
        path = _write(tmp_path, "overflow.mdb", [
            _meta_page(0, txnid=0, root=2, depth=1, entries=2, last_pg=5,
                       n_overflow=3),
            _meta_page(1, txnid=1, root=2, depth=1, entries=2, last_pg=5,
                       n_overflow=3),
            leaf, ov,
        ])
        for name, r in _readers(path, native_so):
            assert r.get(b"big") == value, name
            assert r.get(b"small") == b"tiny", name
            assert dict(r.items()) == {b"big": value, b"small": b"tiny"}, name


class TestPageSize:
    def test_8k_pages_from_free_db_pad(self, tmp_path, native_so):
        """Page size is advertised ONLY via the free-DB pad field; meta1 and
        every later page then sit at 8192-byte strides. Readers must pick
        the size up from meta0 before locating meta1."""
        psize = 8192
        leaf = _node_page(2, P_LEAF,
                          [_leaf_node(b"key8k", b"val8k"),
                           _leaf_node(b"key8k-2", b"x" * 5000)],  # inline: fits 8k page
                          psize=psize)
        path = _write(tmp_path, "8k.mdb", [
            _meta_page(0, txnid=0, root=2, depth=1, entries=2, last_pg=2,
                       psize=psize),
            _meta_page(1, txnid=1, root=2, depth=1, entries=2, last_pg=2,
                       psize=psize),
            leaf,
        ])
        for name, r in _readers(path, native_so):
            assert r.get(b"key8k") == b"val8k", name
            assert r.get(b"key8k-2") == b"x" * 5000, name


class TestUnsupportedFormats:
    def test_leaf2_page_rejected_not_misparsed(self, tmp_path, native_so):
        """LEAF2 (fixed-size-key) pages are out of scope for both readers
        (detectron.lmdb never uses them): a lookup touching one must fail
        CLEANLY — an exception or a miss — never return garbage bytes."""
        P_LEAF2_FLAGS = P_LEAF | 0x20  # spec: P_LEAF2 = 0x20
        # LEAF2 pages pack raw fixed-width keys with NO node headers — any
        # node-header interpretation of these bytes is a misparse
        body = bytearray(4096)
        body[0:16] = struct.pack("<QHHHH", 2, 0, P_LEAF2_FLAGS, 16 + 2, 4096)
        path = _write(tmp_path, "leaf2.mdb", [
            _meta_page(0, txnid=0, root=2, depth=1, entries=1, last_pg=2),
            _meta_page(1, txnid=1, root=2, depth=1, entries=1, last_pg=2),
            bytes(body),
        ])
        for name, r in _readers(path, native_so):
            try:
                got = r.get(b"k")
            except Exception:
                continue  # clean rejection
            assert got is None or got == b"", (name, got)

    def test_truncated_file_fails_cleanly(self, tmp_path, native_so):
        """A file cut mid-page (torn copy) must not crash the process: the
        branch child / overflow bounds checks reject out-of-map accesses."""
        leaf = _node_page(2, P_LEAF, [_leaf_node(b"k", b"v")])
        full = (_meta_page(0, txnid=0, root=2, depth=1, entries=1, last_pg=2)
                + _meta_page(1, txnid=1, root=2, depth=1, entries=1, last_pg=2)
                + leaf)
        path = str(tmp_path / "torn.mdb")
        with open(path, "wb") as f:
            f.write(full[: 2 * 4096 + 100])  # leaf page torn off
        import pytest as _pytest

        for name, opener in (
            ("python", lambda: PythonLMDBReader(path)),
            ("native", lambda: NativeLMDBReader(path, native_so)),
        ):
            try:
                r = opener()
            except Exception:
                continue  # rejecting at open is fine
            try:
                got = r.get(b"k")
            except Exception:
                continue
            assert got is None or got == b"v"[: len(got)], (name, got)
