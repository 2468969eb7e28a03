// Minimal read-only LMDB (Lightning Memory-Mapped Database) reader.
//
// Native replacement for the py-lmdb dependency on the framework's hottest
// input path: Facebook's detectron.lmdb region features (~10GB, read per
// training example — reference: pipelines/data_processing/lmdb_dataset.py).
// The file is mmap'd once; get() walks the B+tree and returns zero-copy
// pointers into the map (overflow-page data is contiguous on disk, so even
// ~800KB pickled feature blobs need no copying).
//
// Implements the on-disk format of LMDB data version 1 (64-bit, little
// endian): meta pages 0/1 (pick higher txnid), branch/leaf node layout,
// F_BIGDATA overflow chains. Not supported (not used by detectron.lmdb):
// DUPSORT, LEAF2 fixed-key pages, named sub-databases.
//
// Exposed as a C ABI for Python ctypes binding (data/lmdb_store.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0xBEEFC0DE;
constexpr uint16_t kPBranch = 0x01;
constexpr uint16_t kPLeaf = 0x02;
constexpr uint16_t kPOverflow = 0x04;
constexpr uint16_t kPMeta = 0x08;
constexpr uint16_t kPLeaf2 = 0x20;
constexpr uint16_t kFBigData = 0x01;
constexpr size_t kPageHdrSz = 16;
constexpr uint64_t kInvalidPage = ~0ULL;

#pragma pack(push, 1)
struct PageHeader {
  uint64_t pgno;
  uint16_t pad;
  uint16_t flags;
  union {
    struct {
      uint16_t lower;
      uint16_t upper;
    } pb;
    uint32_t pages;  // overflow page count
  } u;
};

struct Db {
  uint32_t pad;       // page size for dbs[0]
  uint16_t flags;
  uint16_t depth;
  uint64_t branch_pages;
  uint64_t leaf_pages;
  uint64_t overflow_pages;
  uint64_t entries;
  uint64_t root;
};

struct Meta {
  uint32_t magic;
  uint32_t version;
  uint64_t address;
  uint64_t mapsize;
  Db dbs[2];
  uint64_t last_pg;
  uint64_t txnid;
};

struct Node {
  uint16_t lo;
  uint16_t hi;
  uint16_t flags;
  uint16_t ksize;
  // key bytes, then data bytes
};
#pragma pack(pop)

struct Env {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_size = 0;
  size_t psize = 4096;
  uint64_t root = kInvalidPage;
  uint64_t entries = 0;
  uint16_t depth = 0;
  std::string error;
  // iteration state: stack of (pgno, index)
  std::vector<std::pair<uint64_t, unsigned>> iter_stack;
  bool iter_active = false;
};

inline const PageHeader* page(const Env* e, uint64_t pgno) {
  size_t off = pgno * e->psize;
  if (off + kPageHdrSz > e->map_size) return nullptr;
  return reinterpret_cast<const PageHeader*>(e->map + off);
}

inline unsigned num_keys(const PageHeader* p) {
  return (p->u.pb.lower - kPageHdrSz) >> 1;
}

inline const Node* node_at(const PageHeader* p, unsigned i) {
  const uint16_t* ptrs =
      reinterpret_cast<const uint16_t*>(reinterpret_cast<const uint8_t*>(p) + kPageHdrSz);
  return reinterpret_cast<const Node*>(reinterpret_cast<const uint8_t*>(p) + ptrs[i]);
}

inline const uint8_t* node_key(const Node* n) {
  return reinterpret_cast<const uint8_t*>(n) + sizeof(Node);
}

inline size_t node_datasize(const Node* n) {
  return static_cast<size_t>(n->lo) | (static_cast<size_t>(n->hi) << 16);
}

inline uint64_t branch_pgno(const Node* n) {
  return static_cast<uint64_t>(n->lo) | (static_cast<uint64_t>(n->hi) << 16) |
         (static_cast<uint64_t>(n->flags) << 32);
}

// memcmp-style byte-lexicographic compare (LMDB default for blob keys)
int key_cmp(const uint8_t* a, size_t alen, const uint8_t* b, size_t blen) {
  size_t n = alen < blen ? alen : blen;
  int c = memcmp(a, b, n);
  if (c) return c;
  return (alen < blen) ? -1 : (alen > blen ? 1 : 0);
}

// Resolve a leaf node's value (possibly on overflow pages) to a pointer.
bool node_value(const Env* e, const Node* n, const uint8_t** val, size_t* vlen) {
  size_t dsize = node_datasize(n);
  if (n->flags & kFBigData) {
    uint64_t ovpg;
    memcpy(&ovpg, node_key(n) + n->ksize, sizeof(ovpg));
    const PageHeader* op = page(e, ovpg);
    if (!op || !(op->flags & kPOverflow)) return false;
    const uint8_t* data = reinterpret_cast<const uint8_t*>(op) + kPageHdrSz;
    if (ovpg * e->psize + kPageHdrSz + dsize > e->map_size) return false;
    *val = data;
    *vlen = dsize;
    return true;
  }
  *val = node_key(n) + n->ksize;
  *vlen = dsize;
  return true;
}

}  // namespace

extern "C" {

void* mmc_lmdb_open(const char* path_cstr) {
  std::string path(path_cstr);
  struct stat st;
  if (stat(path.c_str(), &st) != 0) return nullptr;
  if (S_ISDIR(st.st_mode)) {
    path += "/data.mdb";
    if (stat(path.c_str(), &st) != 0) return nullptr;
  }
  int fd = open(path.c_str(), O_RDONLY);
  if (fd < 0) return nullptr;
  size_t size = static_cast<size_t>(st.st_size);
  void* map = mmap(nullptr, size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  madvise(map, size, MADV_RANDOM);

  Env* e = new Env;
  e->fd = fd;
  e->map = static_cast<const uint8_t*>(map);
  e->map_size = size;

  // choose the newer of the two meta pages; page size comes from meta itself,
  // but both metas always live in the first two 4096-ish pages — read meta 0
  // first assuming min page size, then honor its psize.
  const Meta* best = nullptr;
  size_t psize_guess = 4096;
  for (int i = 0; i < 2; i++) {
    size_t off = i * psize_guess + kPageHdrSz;
    if (off + sizeof(Meta) > size) continue;
    const Meta* m = reinterpret_cast<const Meta*>(e->map + off);
    if (m->magic != kMagic) continue;
    if (m->dbs[0].pad != 0) psize_guess = m->dbs[0].pad;
    if (!best || m->txnid >= best->txnid) best = m;
  }
  if (!best) {
    delete e;
    munmap(map, size);
    close(fd);
    return nullptr;
  }
  e->psize = best->dbs[0].pad ? best->dbs[0].pad : 4096;
  e->root = best->dbs[1].root;
  e->entries = best->dbs[1].entries;
  e->depth = best->dbs[1].depth;
  return e;
}

void mmc_lmdb_close(void* env) {
  Env* e = static_cast<Env*>(env);
  if (!e) return;
  if (e->map) munmap(const_cast<uint8_t*>(e->map), e->map_size);
  if (e->fd >= 0) close(e->fd);
  delete e;
}

long mmc_lmdb_entries(void* env) {
  return static_cast<long>(static_cast<Env*>(env)->entries);
}

// Returns 1 and sets *val/*vlen on hit (pointer into the mmap — valid until
// close), 0 on miss, -1 on corruption/unsupported format.
int mmc_lmdb_get(void* env, const uint8_t* key, size_t klen, const uint8_t** val,
                 size_t* vlen) {
  Env* e = static_cast<Env*>(env);
  if (e->root == kInvalidPage) return 0;
  uint64_t pgno = e->root;
  for (int guard = 0; guard < 64; guard++) {
    const PageHeader* p = page(e, pgno);
    if (!p) return -1;
    if (p->flags & kPLeaf2) return -1;  // unsupported
    unsigned n = num_keys(p);
    if (p->flags & kPBranch) {
      // rightmost child whose separator key <= target (node 0 = -inf)
      unsigned lo = 1, hi = n, best = 0;
      while (lo < hi) {
        unsigned mid = (lo + hi) / 2;
        const Node* nd = node_at(p, mid);
        int c = key_cmp(node_key(nd), nd->ksize, key, klen);
        if (c <= 0) {
          best = mid;
          lo = mid + 1;
        } else {
          hi = mid;
        }
      }
      pgno = branch_pgno(node_at(p, best));
      continue;
    }
    if (p->flags & kPLeaf) {
      unsigned lo = 0, hi = n;
      while (lo < hi) {
        unsigned mid = (lo + hi) / 2;
        const Node* nd = node_at(p, mid);
        int c = key_cmp(node_key(nd), nd->ksize, key, klen);
        if (c == 0) return node_value(e, nd, val, vlen) ? 1 : -1;
        if (c < 0)
          lo = mid + 1;
        else
          hi = mid;
      }
      return 0;
    }
    return -1;
  }
  return -1;
}

// Full-scan cursor (key order). Returns 1 per entry, 0 at end, -1 on error.
int mmc_lmdb_iter_start(void* env) {
  Env* e = static_cast<Env*>(env);
  e->iter_stack.clear();
  e->iter_active = (e->root != kInvalidPage);
  if (e->iter_active) e->iter_stack.push_back({e->root, 0});
  return 0;
}

int mmc_lmdb_iter_next(void* env, const uint8_t** key, size_t* klen,
                       const uint8_t** val, size_t* vlen) {
  Env* e = static_cast<Env*>(env);
  while (e->iter_active && !e->iter_stack.empty()) {
    auto& top = e->iter_stack.back();
    const PageHeader* p = page(e, top.first);
    if (!p) return -1;
    unsigned n = num_keys(p);
    if (top.second >= n) {
      e->iter_stack.pop_back();
      continue;
    }
    const Node* nd = node_at(p, top.second);
    top.second++;
    if (p->flags & kPBranch) {
      e->iter_stack.push_back({branch_pgno(nd), 0});
      continue;
    }
    if (p->flags & kPLeaf) {
      *key = node_key(nd);
      *klen = nd->ksize;
      return node_value(e, nd, val, vlen) ? 1 : -1;
    }
    return -1;
  }
  return 0;
}

}  // extern "C"
