// Zero-copy mmap safetensors reader.
//
// Native runtime component for checkpoint IO: memory-maps a
// .safetensors file, parses the header, and hands Python raw pointers
// into the mapping so numpy arrays are created with zero copies
// (np.frombuffer on the mmap).  Replaces the reference's
// torch/safetensors double-buffered load path (models/base.py:697-726)
// for multi-GB SDXL/T5 checkpoints.
//
// C ABI (consumed by qdm_tpu/utils/native_loader.py via ctypes):
//   st_open(path)              -> handle (0 on failure)
//   st_num_tensors(h)          -> n
//   st_tensor_name(h, i)       -> const char*
//   st_tensor_dtype(h, i)      -> const char*  ("F32", "BF16", "I32", ...)
//   st_tensor_rank(h, i)       -> rank
//   st_tensor_shape(h, i, out) -> writes rank int64s
//   st_tensor_data(h, i)       -> const void*  (into the mmap)
//   st_tensor_nbytes(h, i)     -> byte length
//   st_close(h)

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct TensorInfo {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0;
  uint64_t end = 0;
};

struct StFile {
  int fd = -1;
  void* map = nullptr;
  size_t map_len = 0;
  const uint8_t* data = nullptr;  // start of tensor data section
  std::vector<TensorInfo> tensors;
};

// --- minimal JSON scanner for the safetensors header -----------------------
// The header is a single JSON object: {"tname": {"dtype": "F32",
// "shape": [1,2], "data_offsets": [0, 8]}, "__metadata__": {...}}.

struct Scanner {
  const char* p;
  const char* end;

  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }
  bool eat(char c) {
    ws();
    if (p < end && *p == c) {
      p++;
      return true;
    }
    return false;
  }
  bool string(std::string* out) {
    ws();
    if (p >= end || *p != '"') return false;
    p++;
    out->clear();
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        p++;
        switch (*p) {
          case 'n': out->push_back('\n'); break;
          case 't': out->push_back('\t'); break;
          case 'u': {  // \uXXXX: keep raw (names are ascii in practice)
            p += 4;
            out->push_back('?');
            break;
          }
          default: out->push_back(*p);
        }
      } else {
        out->push_back(*p);
      }
      p++;
    }
    if (p >= end) return false;
    p++;  // closing quote
    return true;
  }
  bool integer(int64_t* out) {
    ws();
    bool neg = false;
    if (p < end && *p == '-') {
      neg = true;
      p++;
    }
    if (p >= end || *p < '0' || *p > '9') return false;
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
    *out = neg ? -v : v;
    return true;
  }
  // skip any JSON value (for __metadata__)
  bool skip_value() {
    ws();
    if (p >= end) return false;
    if (*p == '"') {
      std::string s;
      return string(&s);
    }
    if (*p == '{') {
      p++;
      ws();
      if (eat('}')) return true;
      do {
        std::string k;
        if (!string(&k) || !eat(':') || !skip_value()) return false;
      } while (eat(','));
      return eat('}');
    }
    if (*p == '[') {
      p++;
      ws();
      if (eat(']')) return true;
      do {
        if (!skip_value()) return false;
      } while (eat(','));
      return eat(']');
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']') p++;
    return true;
  }
};

bool parse_header(const char* hdr, size_t len, std::vector<TensorInfo>* out) {
  Scanner s{hdr, hdr + len};
  if (!s.eat('{')) return false;
  if (s.eat('}')) return true;
  do {
    std::string name;
    if (!s.string(&name) || !s.eat(':')) return false;
    if (name == "__metadata__") {
      if (!s.skip_value()) return false;
      continue;
    }
    TensorInfo ti;
    ti.name = name;
    if (!s.eat('{')) return false;
    do {
      std::string key;
      if (!s.string(&key) || !s.eat(':')) return false;
      if (key == "dtype") {
        if (!s.string(&ti.dtype)) return false;
      } else if (key == "shape") {
        if (!s.eat('[')) return false;
        s.ws();
        if (*s.p != ']') {
          do {
            int64_t d;
            if (!s.integer(&d)) return false;
            ti.shape.push_back(d);
          } while (s.eat(','));
        }
        if (!s.eat(']')) return false;
      } else if (key == "data_offsets") {
        int64_t a, b;
        if (!s.eat('[') || !s.integer(&a) || !s.eat(',') || !s.integer(&b) ||
            !s.eat(']'))
          return false;
        ti.begin = static_cast<uint64_t>(a);
        ti.end = static_cast<uint64_t>(b);
      } else {
        if (!s.skip_value()) return false;
      }
    } while (s.eat(','));
    if (!s.eat('}')) return false;
    out->push_back(std::move(ti));
  } while (s.eat(','));
  return s.eat('}');
}

// Byte width of a safetensors dtype tag; 0 = unknown.
uint64_t dtype_size(const std::string& d) {
  if (d == "F64" || d == "I64" || d == "U64") return 8;
  if (d == "F32" || d == "I32" || d == "U32") return 4;
  if (d == "F16" || d == "BF16" || d == "I16" || d == "U16") return 2;
  if (d == "I8" || d == "U8" || d == "BOOL" || d == "F8_E4M3" ||
      d == "F8_E5M2")
    return 1;
  return 0;
}

// The header is untrusted input (checkpoints come from the hub / disk).
// Reject any tensor whose offsets fall outside the data section or whose
// byte length disagrees with shape x dtype, so st_tensor_data /
// st_tensor_nbytes can never hand Python an out-of-bounds pointer.
bool validate_tensors(const std::vector<TensorInfo>& tensors,
                      uint64_t data_len) {
  for (const auto& t : tensors) {
    if (t.begin > t.end || t.end > data_len) return false;
    uint64_t esize = dtype_size(t.dtype);
    if (esize == 0) return false;
    uint64_t count = 1;
    for (int64_t d : t.shape) {
      if (d < 0) return false;
      uint64_t ud = static_cast<uint64_t>(d);
      if (ud != 0 && count > UINT64_MAX / ud) return false;  // overflow
      count *= ud;
    }
    if (count > UINT64_MAX / esize) return false;
    if (t.end - t.begin != count * esize) return false;
  }
  return true;
}

}  // namespace

extern "C" {

void* st_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8) {
    ::close(fd);
    return nullptr;
  }
  size_t len = static_cast<size_t>(st.st_size);
  void* map = mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(map, len, MADV_SEQUENTIAL);
  const uint8_t* base = static_cast<const uint8_t*>(map);
  uint64_t hdr_len;
  std::memcpy(&hdr_len, base, 8);  // little-endian header length
  // untrusted length: compare without the `8 + hdr_len` sum, which wraps
  // for hdr_len near UINT64_MAX (len >= 8 is guaranteed above)
  if (hdr_len > len - 8) {
    munmap(map, len);
    ::close(fd);
    return nullptr;
  }
  auto* f = new StFile();
  f->fd = fd;
  f->map = map;
  f->map_len = len;
  f->data = base + 8 + hdr_len;
  if (!parse_header(reinterpret_cast<const char*>(base + 8), hdr_len,
                    &f->tensors) ||
      !validate_tensors(f->tensors, len - 8 - hdr_len)) {
    munmap(map, len);
    ::close(fd);
    delete f;
    return nullptr;
  }
  return f;
}

int64_t st_num_tensors(void* h) {
  return static_cast<StFile*>(h)->tensors.size();
}

const char* st_tensor_name(void* h, int64_t i) {
  return static_cast<StFile*>(h)->tensors[i].name.c_str();
}

const char* st_tensor_dtype(void* h, int64_t i) {
  return static_cast<StFile*>(h)->tensors[i].dtype.c_str();
}

int64_t st_tensor_rank(void* h, int64_t i) {
  return static_cast<StFile*>(h)->tensors[i].shape.size();
}

void st_tensor_shape(void* h, int64_t i, int64_t* out) {
  const auto& shape = static_cast<StFile*>(h)->tensors[i].shape;
  for (size_t d = 0; d < shape.size(); ++d) out[d] = shape[d];
}

const void* st_tensor_data(void* h, int64_t i) {
  auto* f = static_cast<StFile*>(h);
  return f->data + f->tensors[i].begin;
}

int64_t st_tensor_nbytes(void* h, int64_t i) {
  const auto& t = static_cast<StFile*>(h)->tensors[i];
  return static_cast<int64_t>(t.end - t.begin);
}

void st_close(void* h) {
  auto* f = static_cast<StFile*>(h);
  if (f->map) munmap(f->map, f->map_len);
  if (f->fd >= 0) ::close(f->fd);
  delete f;
}

}  // extern "C"
