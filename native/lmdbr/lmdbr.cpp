// Minimal LMDB (data.mdb) reader + bulk writer — native data-plumbing layer.
//
// Role: the reference's training data lives in LMDB files
// (data/util.py:_read_img_lmdb, data_scripts/create_lmdb*.py — SURVEY.md
// §2.4 [H]). The `lmdb` python package is not available in this
// environment, so this C++ unit provides:
//   * a read-only, mmap-based B+tree walker for the standard LMDB file
//     format (meta page -> main DB root -> branch/leaf pages, F_BIGDATA
//     overflow chains) — struct layout follows the published LMDB format
//     (openldap mdb.c): 16-byte page header, 8-byte node header,
//     48-bit branch pgnos split across lo/hi/flags.
//   * a bulk writer that builds a valid single-version LMDB from sorted
//     (key, value) pairs bottom-up (values always in overflow pages),
//     used by data_scripts/create_lmdb.py and the round-trip tests.
//
// Read path is zero-copy: lmdbr_get returns pointers into the mapping.
// No locking / txn machinery — files are written once, read many
// (exactly the reference's usage).

#include <algorithm>
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

constexpr uint32_t MDB_MAGIC = 0xBEEFC0DE;
constexpr uint32_t MDB_DATA_VERSION = 1;
constexpr uint16_t P_BRANCH = 0x01;
constexpr uint16_t P_LEAF = 0x02;
constexpr uint16_t P_OVERFLOW = 0x04;
constexpr uint16_t P_META = 0x08;
constexpr uint16_t F_BIGDATA = 0x01;
constexpr uint64_t P_INVALID = ~uint64_t{0};
constexpr size_t PAGEHDRSZ = 16;

#pragma pack(push, 1)
struct PageHeader {
  uint64_t pgno;
  uint16_t pad;
  uint16_t flags;
  union {
    struct {
      uint16_t lower;  // offset of free space start (incl. header)
      uint16_t upper;  // offset of free space end
    } pb;
    uint32_t pages;  // overflow: number of pages
  } b;
};
static_assert(sizeof(PageHeader) == PAGEHDRSZ, "page header must be 16B");

struct Node {
  uint16_t lo;     // leaf: data size low; branch: pgno low
  uint16_t hi;     // leaf: data size high; branch: pgno mid
  uint16_t flags;  // leaf: F_* flags; branch: pgno high (bits 32..47)
  uint16_t ksize;
  // key bytes follow; leaf data (or 8B overflow pgno) after the key
};

struct DbInfo {
  uint32_t md_pad;  // in dbs[0] this doubles as the page size
  uint16_t md_flags;
  uint16_t md_depth;
  uint64_t md_branch_pages;
  uint64_t md_leaf_pages;
  uint64_t md_overflow_pages;
  uint64_t md_entries;
  uint64_t md_root;
};
static_assert(sizeof(DbInfo) == 48, "DbInfo must be 48B");

struct Meta {
  uint32_t mm_magic;
  uint32_t mm_version;
  uint64_t mm_address;
  uint64_t mm_mapsize;
  DbInfo mm_dbs[2];  // [0] free DB (md_pad = page size), [1] main DB
  uint64_t mm_last_pg;
  uint64_t mm_txnid;
};
#pragma pack(pop)

struct Reader {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_size = 0;
  size_t psize = 4096;
  uint64_t root = P_INVALID;
  uint64_t entries = 0;
};

const PageHeader* page(const Reader* r, uint64_t pgno) {
  return reinterpret_cast<const PageHeader*>(r->map + pgno * r->psize);
}

const Node* node_at(const Reader* r, const PageHeader* p, size_t i) {
  const uint16_t* ptrs =
      reinterpret_cast<const uint16_t*>(reinterpret_cast<const uint8_t*>(p) + PAGEHDRSZ);
  return reinterpret_cast<const Node*>(reinterpret_cast<const uint8_t*>(p) + ptrs[i]);
}

size_t num_keys(const PageHeader* p) { return (p->b.pb.lower - PAGEHDRSZ) >> 1; }

const uint8_t* node_key(const Node* n) {
  return reinterpret_cast<const uint8_t*>(n) + sizeof(Node);
}

uint64_t branch_pgno(const Node* n) {
  return uint64_t(n->lo) | (uint64_t(n->hi) << 16) | (uint64_t(n->flags) << 32);
}

size_t leaf_dsize(const Node* n) { return size_t(n->lo) | (size_t(n->hi) << 16); }

int key_cmp(const uint8_t* a, size_t alen, const uint8_t* b, size_t blen) {
  int c = memcmp(a, b, std::min(alen, blen));
  if (c) return c;
  return alen < blen ? -1 : (alen > blen ? 1 : 0);
}

}  // namespace

extern "C" {

void* lmdbr_open(const char* path) {
  Reader* r = new Reader();
  r->fd = open(path, O_RDONLY);
  if (r->fd < 0) {
    delete r;
    return nullptr;
  }
  struct stat st;
  fstat(r->fd, &st);
  r->map_size = size_t(st.st_size);
  r->map = static_cast<const uint8_t*>(
      mmap(nullptr, r->map_size, PROT_READ, MAP_SHARED, r->fd, 0));
  if (r->map == MAP_FAILED) {
    close(r->fd);
    delete r;
    return nullptr;
  }
  // Pick the live meta (larger txnid) out of pages 0 and 1. Page size is
  // unknown before reading a meta; meta 0 always starts at byte 0, and
  // meta 1 sits at the page size RECORDED IN META 0 (fall back to 4096
  // only when meta 0 is invalid).
  const Meta* m0 = reinterpret_cast<const Meta*>(r->map + PAGEHDRSZ);
  const Meta* live = nullptr;
  size_t ps0 = 4096;
  if (r->map_size > PAGEHDRSZ + sizeof(Meta) && m0->mm_magic == MDB_MAGIC) {
    live = m0;
    if (m0->mm_dbs[0].md_pad) ps0 = m0->mm_dbs[0].md_pad;
  }
  const Meta* m1 = reinterpret_cast<const Meta*>(r->map + ps0 + PAGEHDRSZ);
  if (r->map_size > ps0 + PAGEHDRSZ + sizeof(Meta) && m1->mm_magic == MDB_MAGIC &&
      (!live || m1->mm_txnid > live->mm_txnid))
    live = m1;
  if (!live) {
    munmap(const_cast<uint8_t*>(r->map), r->map_size);
    close(r->fd);
    delete r;
    return nullptr;
  }
  r->psize = live->mm_dbs[0].md_pad ? live->mm_dbs[0].md_pad : 4096;
  r->root = live->mm_dbs[1].md_root;
  r->entries = live->mm_dbs[1].md_entries;
  return r;
}

void lmdbr_close(void* h) {
  Reader* r = static_cast<Reader*>(h);
  if (!r) return;
  if (r->map) munmap(const_cast<uint8_t*>(r->map), r->map_size);
  if (r->fd >= 0) close(r->fd);
  delete r;
}

uint64_t lmdbr_entries(void* h) { return static_cast<Reader*>(h)->entries; }

// Returns 0 on hit; *val/*vlen point INTO the mapping (valid until close).
int lmdbr_get(void* h, const uint8_t* key, size_t klen, const uint8_t** val,
              size_t* vlen) {
  Reader* r = static_cast<Reader*>(h);
  if (r->root == P_INVALID) return -1;
  const PageHeader* p = page(r, r->root);
  while (p->flags & P_BRANCH) {
    // Binary search: find the rightmost child whose separator key <= key.
    size_t n = num_keys(p), lo = 1, hi = n;  // node 0 has an empty key
    size_t child = 0;
    while (lo < hi) {
      size_t mid = (lo + hi) / 2;
      const Node* nd = node_at(r, p, mid);
      if (key_cmp(node_key(nd), nd->ksize, key, klen) <= 0)
        lo = mid + 1;
      else
        hi = mid;
    }
    child = lo - 1;
    p = page(r, branch_pgno(node_at(r, p, child)));
  }
  if (!(p->flags & P_LEAF)) return -1;
  size_t n = num_keys(p), lo = 0, hi = n;
  while (lo < hi) {
    size_t mid = (lo + hi) / 2;
    const Node* nd = node_at(r, p, mid);
    int c = key_cmp(node_key(nd), nd->ksize, key, klen);
    if (c == 0) {
      if (nd->flags & F_BIGDATA) {
        uint64_t opg;
        memcpy(&opg, node_key(nd) + nd->ksize, 8);
        const PageHeader* op = page(r, opg);
        *val = reinterpret_cast<const uint8_t*>(op) + PAGEHDRSZ;
        *vlen = leaf_dsize(nd);
      } else {
        *val = node_key(nd) + nd->ksize;
        *vlen = leaf_dsize(nd);
      }
      return 0;
    }
    if (c < 0)
      lo = mid + 1;
    else
      hi = mid;
  }
  return -1;
}

// ---- forward cursor: depth-first leftmost walk ----
struct Cursor {
  Reader* r;
  std::vector<std::pair<uint64_t, size_t>> stack;  // (pgno, child index)
  uint64_t leaf = P_INVALID;
  size_t idx = 0;
  bool done = false;
};

static void descend_left(Cursor* c, uint64_t pgno) {
  const PageHeader* p = page(c->r, pgno);
  while (p->flags & P_BRANCH) {
    c->stack.emplace_back(pgno, 0);
    pgno = branch_pgno(node_at(c->r, p, 0));
    p = page(c->r, pgno);
  }
  c->leaf = pgno;
  c->idx = 0;
}

void* lmdbr_cursor_open(void* h) {
  Reader* r = static_cast<Reader*>(h);
  Cursor* c = new Cursor();
  c->r = r;
  if (r->root == P_INVALID) {
    c->done = true;
    return c;
  }
  descend_left(c, r->root);
  return c;
}

int lmdbr_cursor_next(void* hc, const uint8_t** key, size_t* klen,
                      const uint8_t** val, size_t* vlen) {
  Cursor* c = static_cast<Cursor*>(hc);
  Reader* r = c->r;
  while (!c->done) {
    const PageHeader* p = page(r, c->leaf);
    if (c->idx < num_keys(p)) {
      const Node* nd = node_at(r, p, c->idx++);
      *key = node_key(nd);
      *klen = nd->ksize;
      if (nd->flags & F_BIGDATA) {
        uint64_t opg;
        memcpy(&opg, node_key(nd) + nd->ksize, 8);
        *val = reinterpret_cast<const uint8_t*>(page(r, opg)) + PAGEHDRSZ;
      } else {
        *val = node_key(nd) + nd->ksize;
      }
      *vlen = leaf_dsize(nd);
      return 0;
    }
    // climb to the next right sibling
    while (!c->stack.empty()) {
      auto& top = c->stack.back();
      const PageHeader* bp = page(r, top.first);
      if (++top.second < num_keys(bp)) {
        uint64_t child = branch_pgno(node_at(r, bp, top.second));
        descend_left(c, child);
        goto resume;
      }
      c->stack.pop_back();
    }
    c->done = true;
  resume:;
  }
  return -1;
}

void lmdbr_cursor_close(void* hc) { delete static_cast<Cursor*>(hc); }

// ====================== bulk writer ======================

struct Writer {
  std::string path;
  size_t psize = 4096;
  std::vector<std::pair<std::string, std::string>> kv;
};

void* lmdbw_open(const char* path) {
  Writer* w = new Writer();
  w->path = path;
  return w;
}

// Returns 0 on success, -1 if the key cannot fit in a leaf node: a leaf
// node (header + key + 8B overflow pgno + 2B ptr slot) must fit on one
// page, and ksize is a uint16. Rejecting here keeps lmdbw_close's page
// packing loop safe from overflowing its page buffer on a huge key.
int lmdbw_put(void* h, const uint8_t* key, size_t klen, const uint8_t* val,
              size_t vlen) {
  Writer* w = static_cast<Writer*>(h);
  size_t nsz = ((sizeof(Node) + klen + 8) + 1) & ~size_t(1);
  if (klen > 0xffff || nsz + 2 > w->psize - PAGEHDRSZ) return -1;
  w->kv.emplace_back(std::string(reinterpret_cast<const char*>(key), klen),
                     std::string(reinterpret_cast<const char*>(val), vlen));
  return 0;
}

namespace {

void put_page_hdr(std::vector<uint8_t>& page_buf, uint64_t pgno, uint16_t flags,
                  uint16_t lower, uint16_t upper, uint32_t ovpages = 0) {
  PageHeader h{};
  h.pgno = pgno;
  h.flags = flags;
  if (flags & P_OVERFLOW)
    h.b.pages = ovpages;
  else {
    h.b.pb.lower = lower;
    h.b.pb.upper = upper;
  }
  memcpy(page_buf.data(), &h, sizeof(h));
}

}  // namespace

// Builds the file: meta x2, then overflow chains, leaves, branches, root.
// Returns 0 on success.
int lmdbw_close(void* h) {
  Writer* w = static_cast<Writer*>(h);
  const size_t PS = w->psize;
  std::sort(w->kv.begin(), w->kv.end());
  w->kv.erase(std::unique(w->kv.begin(), w->kv.end(),
                          [](auto& a, auto& b) { return a.first == b.first; }),
              w->kv.end());

  std::vector<std::vector<uint8_t>> pages(2, std::vector<uint8_t>(PS, 0));
  auto alloc = [&]() -> uint64_t {
    pages.emplace_back(PS, 0);
    return pages.size() - 1;
  };

  // 1) overflow chains per value
  std::vector<uint64_t> vpg(w->kv.size());
  for (size_t i = 0; i < w->kv.size(); ++i) {
    const std::string& v = w->kv[i].second;
    uint32_t n = uint32_t((v.size() + PS - PAGEHDRSZ - 1) / (PS - PAGEHDRSZ));
    if (n == 0) n = 1;
    uint64_t first = pages.size();
    // overflow chains must be CONTIGUOUS pages; payload runs straight
    // through pages 2..n (only the first page carries a header)
    for (uint32_t j = 0; j < n; ++j) alloc();
    put_page_hdr(pages[first], first, P_OVERFLOW, 0, 0, n);
    size_t cap0 = PS - PAGEHDRSZ;
    uint8_t* dst = pages[first].data() + PAGEHDRSZ;
    size_t copied = std::min(v.size(), cap0);
    memcpy(dst, v.data(), copied);
    size_t off = copied;
    for (uint32_t j = 1; j < n && off < v.size(); ++j) {
      size_t take = std::min(v.size() - off, PS);
      memcpy(pages[first + j].data(), v.data() + off, take);
      off += take;
    }
    vpg[i] = first;
  }

  // 2) leaf pages
  struct Sep {
    std::string key;  // first key of the page
    uint64_t pgno;
  };
  std::vector<Sep> level;
  {
    size_t i = 0;
    while (i < w->kv.size()) {
      uint64_t pg = alloc();
      std::vector<uint16_t> ptrs;
      uint16_t upper = uint16_t(PS);
      size_t start = i;
      while (i < w->kv.size()) {
        const std::string& k = w->kv[i].first;
        size_t nsz = sizeof(Node) + k.size() + 8;  // bigdata: 8B pgno
        nsz = (nsz + 1) & ~size_t(1);
        size_t need = nsz + 2;  // + ptr slot
        size_t lower = PAGEHDRSZ + ptrs.size() * 2;
        if (upper - lower < need && i > start) break;
        upper = uint16_t(upper - nsz);
        Node nd{};
        nd.lo = uint16_t(w->kv[i].second.size() & 0xffff);
        nd.hi = uint16_t((w->kv[i].second.size() >> 16) & 0xffff);
        nd.flags = F_BIGDATA;
        nd.ksize = uint16_t(k.size());
        memcpy(pages[pg].data() + upper, &nd, sizeof(nd));
        memcpy(pages[pg].data() + upper + sizeof(nd), k.data(), k.size());
        memcpy(pages[pg].data() + upper + sizeof(nd) + k.size(), &vpg[i], 8);
        ptrs.push_back(upper);
        ++i;
      }
      uint16_t lower = uint16_t(PAGEHDRSZ + ptrs.size() * 2);
      put_page_hdr(pages[pg], pg, P_LEAF, lower, upper);
      memcpy(pages[pg].data() + PAGEHDRSZ, ptrs.data(), ptrs.size() * 2);
      level.push_back({w->kv[start].first, pg});
    }
  }

  // 3) branch levels
  uint16_t depth = 1;
  while (level.size() > 1) {
    std::vector<Sep> next;
    size_t i = 0;
    while (i < level.size()) {
      uint64_t pg = alloc();
      std::vector<uint16_t> ptrs;
      uint16_t upper = uint16_t(PS);
      size_t start = i;
      while (i < level.size()) {
        bool first = ptrs.empty();
        const std::string& k = level[i].key;
        size_t ks = first ? 0 : k.size();  // node 0 carries an empty key
        size_t nsz = (sizeof(Node) + ks + 1) & ~size_t(1);
        size_t lower = PAGEHDRSZ + ptrs.size() * 2;
        if (upper - lower < nsz + 2 && !first) break;
        upper = uint16_t(upper - nsz);
        Node nd{};
        uint64_t child = level[i].pgno;
        nd.lo = uint16_t(child & 0xffff);
        nd.hi = uint16_t((child >> 16) & 0xffff);
        nd.flags = uint16_t(child >> 32);
        nd.ksize = uint16_t(ks);
        memcpy(pages[pg].data() + upper, &nd, sizeof(nd));
        if (ks) memcpy(pages[pg].data() + upper + sizeof(nd), k.data(), ks);
        ptrs.push_back(upper);
        ++i;
      }
      uint16_t lower = uint16_t(PAGEHDRSZ + ptrs.size() * 2);
      put_page_hdr(pages[pg], pg, P_BRANCH, lower, upper);
      memcpy(pages[pg].data() + PAGEHDRSZ, ptrs.data(), ptrs.size() * 2);
      next.push_back({level[start].key, pg});
    }
    level.swap(next);
    ++depth;
  }

  // 4) meta pages
  Meta m{};
  m.mm_magic = MDB_MAGIC;
  m.mm_version = MDB_DATA_VERSION;
  m.mm_mapsize = pages.size() * PS;
  m.mm_dbs[0].md_pad = uint32_t(PS);
  m.mm_dbs[0].md_root = P_INVALID;
  m.mm_dbs[1].md_depth = w->kv.empty() ? 0 : depth;
  m.mm_dbs[1].md_entries = w->kv.size();
  m.mm_dbs[1].md_root = w->kv.empty() ? P_INVALID : level[0].pgno;
  m.mm_last_pg = pages.size() - 1;
  m.mm_txnid = 1;
  for (int i = 0; i < 2; ++i) {
    put_page_hdr(pages[i], uint64_t(i), P_META, 0, 0);
    memcpy(pages[i].data() + PAGEHDRSZ, &m, sizeof(m));
  }

  FILE* f = fopen(w->path.c_str(), "wb");
  if (!f) {
    delete w;
    return -1;
  }
  for (auto& p : pages) fwrite(p.data(), 1, PS, f);
  fclose(f);
  delete w;
  return 0;
}

}  // extern "C"
