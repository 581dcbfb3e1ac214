// tensor_cache — mmap'd single-file tensor store for precomputed latents/embeddings.
//
// TPU-native replacement for the reference's latent/prompt-embedding cache, which writes
// one .pt file per sample under data_root/cache/{video_latent,prompt_embeddings}
// (/root/reference/CogVideo-main/finetune/datasets/i2v_dataset.py:102-124). A directory of
// thousands of small files is slow on the network filesystems TPU pods mount; this store
// packs all tensors into one append-only file with an mmap'd read path and a compact
// in-memory index, so the host input pipeline reads training batches at page-cache speed.
//
// Format:
//   header:  magic "LKGDCACH" | u64 version
//   records: u32 key_len | key bytes | u8 dtype | u8 ndim | u64 dims[ndim] | u64 nbytes | data
//   (appended sequentially; the index is rebuilt by scanning on open)
//
// C API (ctypes-friendly): open/close, put, get_info, get_data, count, keys.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

constexpr char kMagic[8] = {'L', 'K', 'G', 'D', 'C', 'A', 'C', 'H'};
constexpr uint64_t kVersion = 1;
constexpr int kMaxDims = 8;

struct Entry {
  uint8_t dtype;
  uint8_t ndim;
  uint64_t dims[kMaxDims];
  uint64_t offset;  // offset of raw data in file
  uint64_t nbytes;
};

struct Cache {
  int fd = -1;
  std::string path;
  std::unordered_map<std::string, Entry> index;
  std::vector<std::string> key_order;
  const uint8_t* map = nullptr;
  size_t map_size = 0;
  std::mutex mu;

  void remap() {
    if (map) {
      munmap(const_cast<uint8_t*>(map), map_size);
      map = nullptr;
      map_size = 0;
    }
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) return;
    void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
    if (p == MAP_FAILED) return;
    map = static_cast<const uint8_t*>(p);
    map_size = st.st_size;
  }
};

bool read_exact(int fd, void* buf, size_t n, off_t off) {
  return pread(fd, buf, n, off) == static_cast<ssize_t>(n);
}

bool scan_index(Cache* c) {
  struct stat st;
  if (fstat(c->fd, &st) != 0) return false;
  off_t pos = 0;
  if (st.st_size == 0) {
    // fresh file: write header
    if (write(c->fd, kMagic, 8) != 8) return false;
    if (write(c->fd, &kVersion, 8) != 8) return false;
    return true;
  }
  char magic[8];
  uint64_t version;
  if (!read_exact(c->fd, magic, 8, 0) || memcmp(magic, kMagic, 8) != 0) return false;
  if (!read_exact(c->fd, &version, 8, 8) || version != kVersion) return false;
  pos = 16;
  while (pos < st.st_size) {
    uint32_t key_len;
    if (!read_exact(c->fd, &key_len, 4, pos)) break;
    pos += 4;
    if (key_len == 0 || key_len > 4096 || pos + key_len > st.st_size) break;
    std::string key(key_len, '\0');
    if (!read_exact(c->fd, key.data(), key_len, pos)) break;
    pos += key_len;
    Entry e{};
    if (!read_exact(c->fd, &e.dtype, 1, pos)) break;
    pos += 1;
    if (!read_exact(c->fd, &e.ndim, 1, pos) || e.ndim > kMaxDims) break;
    pos += 1;
    if (!read_exact(c->fd, e.dims, 8 * e.ndim, pos)) break;
    pos += 8 * e.ndim;
    if (!read_exact(c->fd, &e.nbytes, 8, pos)) break;
    pos += 8;
    e.offset = pos;
    pos += e.nbytes;
    if (pos > st.st_size) break;  // truncated record (partial write): stop
    if (c->index.emplace(key, e).second) c->key_order.push_back(key);
    else c->index[key] = e;  // later record wins
  }
  return true;
}

}  // namespace

extern "C" {

void* lkgd_cache_open(const char* path) {
  auto* c = new Cache();
  c->path = path;
  c->fd = open(path, O_RDWR | O_CREAT, 0644);
  if (c->fd < 0) {
    delete c;
    return nullptr;
  }
  if (!scan_index(c)) {
    close(c->fd);
    delete c;
    return nullptr;
  }
  c->remap();
  return c;
}

void lkgd_cache_close(void* h) {
  auto* c = static_cast<Cache*>(h);
  if (!c) return;
  if (c->map) munmap(const_cast<uint8_t*>(c->map), c->map_size);
  if (c->fd >= 0) close(c->fd);
  delete c;
}

// returns 0 on success
int lkgd_cache_put(void* h, const char* key, uint8_t dtype, uint8_t ndim,
                   const uint64_t* dims, const void* data, uint64_t nbytes) {
  auto* c = static_cast<Cache*>(h);
  if (!c || ndim > kMaxDims) return 1;
  std::lock_guard<std::mutex> lock(c->mu);
  uint32_t key_len = static_cast<uint32_t>(strlen(key));
  off_t end = lseek(c->fd, 0, SEEK_END);
  if (end < 0) return 2;
  // append record
  if (write(c->fd, &key_len, 4) != 4) return 3;
  if (write(c->fd, key, key_len) != static_cast<ssize_t>(key_len)) return 3;
  if (write(c->fd, &dtype, 1) != 1) return 3;
  if (write(c->fd, &ndim, 1) != 1) return 3;
  if (write(c->fd, dims, 8 * ndim) != static_cast<ssize_t>(8 * ndim)) return 3;
  if (write(c->fd, &nbytes, 8) != 8) return 3;
  uint64_t data_off = lseek(c->fd, 0, SEEK_CUR);
  if (write(c->fd, data, nbytes) != static_cast<ssize_t>(nbytes)) return 3;
  Entry e{};
  e.dtype = dtype;
  e.ndim = ndim;
  memcpy(e.dims, dims, 8 * ndim);
  e.offset = data_off;
  e.nbytes = nbytes;
  if (c->index.emplace(key, e).second) c->key_order.push_back(key);
  else c->index[key] = e;
  c->remap();
  return 0;
}

// returns 0 and fills dtype/ndim/dims/nbytes; 1 if missing
int lkgd_cache_info(void* h, const char* key, uint8_t* dtype, uint8_t* ndim,
                    uint64_t* dims, uint64_t* nbytes) {
  auto* c = static_cast<Cache*>(h);
  if (!c) return 1;
  std::lock_guard<std::mutex> lock(c->mu);
  auto it = c->index.find(key);
  if (it == c->index.end()) return 1;
  const Entry& e = it->second;
  *dtype = e.dtype;
  *ndim = e.ndim;
  memcpy(dims, e.dims, 8 * e.ndim);
  *nbytes = e.nbytes;
  return 0;
}

// zero-copy-ish read: memcpy out of the mmap (page cache) into the caller's buffer
int lkgd_cache_get(void* h, const char* key, void* out, uint64_t out_size) {
  auto* c = static_cast<Cache*>(h);
  if (!c) return 1;
  std::lock_guard<std::mutex> lock(c->mu);
  auto it = c->index.find(key);
  if (it == c->index.end()) return 1;
  const Entry& e = it->second;
  if (out_size < e.nbytes) return 2;
  if (c->map && e.offset + e.nbytes <= c->map_size) {
    memcpy(out, c->map + e.offset, e.nbytes);
    return 0;
  }
  return read_exact(c->fd, out, e.nbytes, e.offset) ? 0 : 3;
}

uint64_t lkgd_cache_count(void* h) {
  auto* c = static_cast<Cache*>(h);
  return c ? c->key_order.size() : 0;
}

// copies the idx-th key into buf (returns key length, or 0 if out of range)
uint32_t lkgd_cache_key(void* h, uint64_t idx, char* buf, uint32_t buf_size) {
  auto* c = static_cast<Cache*>(h);
  if (!c || idx >= c->key_order.size()) return 0;
  const std::string& k = c->key_order[idx];
  uint32_t n = k.size() < buf_size - 1 ? k.size() : buf_size - 1;
  memcpy(buf, k.data(), n);
  buf[n] = '\0';
  return static_cast<uint32_t>(k.size());
}

}  // extern "C"
