// Native record loader for the .cnfrec dataset format (see
// arl_conditional_normalizing_flows_tpu/data/records.py for the layout:
// [8B magic "CNFREC01"][8B LE header len][JSON header][pad to 64][blob]).
//
// The reference delegates all record IO to TensorFlow's C++ runtime
// (TFRecordDataset + per-record protobuf parse, conv_cINN_base_functions.py:
// 26-65). This is the TPU-framework equivalent: a small zero-copy mmap
// reader with multi-threaded batch gather and CRC verification, exposed
// through a C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread cnfrec_loader.cc
//        -o libcnfrec.so   (see native/Makefile)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'C', 'N', 'F', 'R', 'E', 'C', '0', '1'};
constexpr size_t kAlign = 64;

// CRC32 (zlib polynomial, matching python's zlib.crc32)
uint32_t crc32_table[256];
bool crc_table_init = [] {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc32_table[i] = c;
  }
  return true;
}();

uint32_t crc32_update(uint32_t crc, const uint8_t* buf, size_t len) {
  crc = ~crc;
  for (size_t i = 0; i < len; ++i)
    crc = crc32_table[(crc ^ buf[i]) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

// CRC32C (Castagnoli, used by TFRecord framing) — slice-by-8 tables
uint32_t crc32c_table[8][256];
bool crc32c_table_init = [] {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? 0x82F63B78u ^ (c >> 1) : c >> 1;
    crc32c_table[0][i] = c;
  }
  for (int t = 1; t < 8; ++t)
    for (uint32_t i = 0; i < 256; ++i)
      crc32c_table[t][i] =
          crc32c_table[0][crc32c_table[t - 1][i] & 0xFF] ^
          (crc32c_table[t - 1][i] >> 8);
  return true;
}();

struct Handle {
  int fd = -1;
  const uint8_t* base = nullptr;  // mmap base
  size_t file_size = 0;
  const uint8_t* data = nullptr;  // blob start
  int64_t count = 0;
  int64_t record_bytes = 0;
  uint32_t stored_crc = 0;
  bool has_crc = false;
  std::string header_json;
};

// minimal JSON field extraction (the header is machine-written, flat).
// Matches the key at TOP LEVEL only (brace depth 1, outside strings): the
// header's free-form "extra" dict may contain identically-named keys (e.g.
// extra={"crc32": ...}), and a naive first-occurrence match would read the
// nested value instead of the real checksum.
bool find_int_field(const std::string& j, const char* key, int64_t* out) {
  std::string pat = std::string("\"") + key + "\":";
  int depth = 0;
  bool in_str = false;
  for (size_t i = 0; i < j.size(); ++i) {
    char c = j[i];
    if (in_str) {
      if (c == '\\') ++i;           // skip escaped char
      else if (c == '"') {
        // closing quote — unless this quote STARTS a top-level key match
        in_str = false;
      }
      continue;
    }
    if (c == '{' || c == '[') { ++depth; continue; }
    if (c == '}' || c == ']') { --depth; continue; }
    if (c == '"') {
      if (depth == 1 && j.compare(i, pat.size(), pat) == 0) {
        size_t p = i + pat.size();
        while (p < j.size() && j[p] == ' ') ++p;
        if (p < j.size() && (isdigit(j[p]) || j[p] == '-')) {
          *out = strtoll(j.c_str() + p, nullptr, 10);
          return true;
        }
        return false;  // null or non-numeric
      }
      in_str = true;
    }
  }
  return false;
}

int64_t dtype_itemsize(const std::string& j) {
  auto p = j.find("\"dtype\":");
  if (p == std::string::npos) return -1;
  p = j.find('"', p + 8);
  if (p == std::string::npos) return -1;
  auto e = j.find('"', p + 1);
  std::string d = j.substr(p + 1, e - p - 1);  // e.g. "<f4"
  if (d.size() < 3) return -1;
  return strtoll(d.c_str() + 2, nullptr, 10);
}

int64_t shape_elems(const std::string& j) {
  auto p = j.find("\"shape\":");
  if (p == std::string::npos) return -1;
  auto lb = j.find('[', p);
  auto rb = j.find(']', lb);
  if (lb == std::string::npos || rb == std::string::npos) return -1;
  int64_t total = 1;
  bool any = false;
  const char* s = j.c_str() + lb + 1;
  const char* end = j.c_str() + rb;
  while (s < end) {
    while (s < end && !isdigit(*s)) ++s;
    if (s >= end) break;
    total *= strtoll(s, const_cast<char**>(&s), 10);
    any = true;
  }
  return any ? total : 1;  // scalar records
}

}  // namespace

extern "C" {

// Open a .cnfrec file; returns nullptr on failure.
void* cnf_open(const char* path) {
  auto h = new Handle();
  h->fd = open(path, O_RDONLY);
  if (h->fd < 0) {
    delete h;
    return nullptr;
  }
  struct stat st;
  if (fstat(h->fd, &st) != 0) {
    close(h->fd);
    delete h;
    return nullptr;
  }
  h->file_size = st.st_size;
  h->base = static_cast<const uint8_t*>(
      mmap(nullptr, h->file_size, PROT_READ, MAP_PRIVATE, h->fd, 0));
  if (h->base == MAP_FAILED || h->file_size < 16 ||
      memcmp(h->base, kMagic, 8) != 0) {
    if (h->base != MAP_FAILED) munmap(const_cast<uint8_t*>(h->base), h->file_size);
    close(h->fd);
    delete h;
    return nullptr;
  }
  uint64_t hlen;
  memcpy(&hlen, h->base + 8, 8);  // little-endian host assumed (x86/arm64)
  // bounds-validate everything derived from file content BEFORE reading it:
  // a truncated/corrupt file must fail cnf_open (caught as IOError in
  // Python, like the pure-Python reader) — not SIGBUS the process later
  if (hlen > h->file_size - 16) {
    munmap(const_cast<uint8_t*>(h->base), h->file_size);
    close(h->fd);
    delete h;
    return nullptr;
  }
  h->header_json.assign(reinterpret_cast<const char*>(h->base + 16), hlen);
  size_t off = 16 + hlen;
  off += (kAlign - off % kAlign) % kAlign;

  if (!find_int_field(h->header_json, "count", &h->count)) h->count = 0;
  int64_t itemsize = dtype_itemsize(h->header_json);
  int64_t elems = shape_elems(h->header_json);
  h->record_bytes = (itemsize > 0 && elems > 0) ? itemsize * elems : 0;
  int64_t crc;
  h->has_crc = find_int_field(h->header_json, "crc32", &crc);
  if (h->has_crc) h->stored_crc = static_cast<uint32_t>(crc);
  // the declared blob must actually fit in the file
  uint64_t blob = static_cast<uint64_t>(h->count) * h->record_bytes;
  if (h->count < 0 || h->record_bytes <= 0 || off > h->file_size ||
      blob > h->file_size - off) {
    munmap(const_cast<uint8_t*>(h->base), h->file_size);
    close(h->fd);
    delete h;
    return nullptr;
  }
  h->data = h->base + off;
  return h;
}

void cnf_close(void* vh) {
  auto h = static_cast<Handle*>(vh);
  if (!h) return;
  if (h->base) munmap(const_cast<uint8_t*>(h->base), h->file_size);
  if (h->fd >= 0) close(h->fd);
  delete h;
}

int64_t cnf_count(void* vh) { return static_cast<Handle*>(vh)->count; }
int64_t cnf_record_bytes(void* vh) {
  return static_cast<Handle*>(vh)->record_bytes;
}
const char* cnf_header_json(void* vh) {
  return static_cast<Handle*>(vh)->header_json.c_str();
}
const void* cnf_data_ptr(void* vh) { return static_cast<Handle*>(vh)->data; }

// Serial CRC32 over the blob; returns 1 if ok (or no CRC stored), 0 on
// mismatch. Parallel slicing would need crc32_combine for no practical gain
// — the serial table pass already runs >1 GB/s.
int cnf_verify_crc(void* vh) {
  auto h = static_cast<Handle*>(vh);
  if (!h->has_crc) return 1;
  size_t blob = static_cast<size_t>(h->count) * h->record_bytes;
  uint32_t crc = crc32_update(0, h->data, blob);
  return crc == h->stored_crc ? 1 : 0;
}

// Gather records[indices[i]] for i in [0, n) into out (n * record_bytes),
// parallelized over nthreads.
void cnf_gather(void* vh, const int64_t* indices, int64_t n, uint8_t* out,
                int nthreads) {
  auto h = static_cast<Handle*>(vh);
  const int64_t rb = h->record_bytes;
  if (nthreads < 1) nthreads = 1;
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      memcpy(out + i * rb, h->data + indices[i] * rb, rb);
    }
  };
  if (nthreads == 1 || n < 256) {
    work(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t per = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * per, hi = std::min<int64_t>(n, lo + per);
    if (lo >= hi) break;
    ts.emplace_back(work, lo, hi);
  }
  for (auto& t : ts) t.join();
}

// Gather from MULTIPLE files: file_ids[i] selects handles[file_ids[i]].
// Used for class-interleaved epochs where each class lives in its own file.
void cnf_gather_multi(void** handles, const int32_t* file_ids,
                      const int64_t* indices, int64_t n, uint8_t* out,
                      int nthreads) {
  if (n == 0) return;
  const int64_t rb = static_cast<Handle*>(handles[file_ids[0]])->record_bytes;
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      auto h = static_cast<Handle*>(handles[file_ids[i]]);
      memcpy(out + i * rb, h->data + indices[i] * rb, rb);
    }
  };
  if (nthreads <= 1 || n < 256) {
    work(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t per = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * per, hi = std::min<int64_t>(n, lo + per);
    if (lo >= hi) break;
    ts.emplace_back(work, lo, hi);
  }
  for (auto& t : ts) t.join();
}

// CRC32C (Castagnoli) of buf[0:len] — the TFRecord frame checksum
// (data/tfrecord_compat.py). Slice-by-8; >1 GB/s, vs the pure-Python
// fallback's ~5 MB/s.
uint32_t cnf_crc32c(const uint8_t* buf, int64_t len) {
  uint32_t crc = 0xFFFFFFFFu;
  int64_t i = 0;
  for (; i + 8 <= len; i += 8) {
    uint64_t w;
    memcpy(&w, buf + i, 8);
    w ^= crc;  // little-endian host assumed (as elsewhere in this file)
    crc = crc32c_table[7][w & 0xFF] ^ crc32c_table[6][(w >> 8) & 0xFF] ^
          crc32c_table[5][(w >> 16) & 0xFF] ^ crc32c_table[4][(w >> 24) & 0xFF] ^
          crc32c_table[3][(w >> 32) & 0xFF] ^ crc32c_table[2][(w >> 40) & 0xFF] ^
          crc32c_table[1][(w >> 48) & 0xFF] ^ crc32c_table[0][(w >> 56) & 0xFF];
  }
  for (; i < len; ++i)
    crc = crc32c_table[0][(crc ^ buf[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

}  // extern "C"
