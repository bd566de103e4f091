// Fast Criteo TSV/CSV parser + categorical encoder.
//
// Native replacement for the reference's pandas/sklearn preprocessing path
// (xdftrain.py:125-237): single-pass tokenization, SafeLabelEncoder semantics
// (per-column first-appearance ids 1..N, unknown -> 0, missing -> "-1"), dense
// parse with missing -> 0.  The Python side (xdeepfm_tpu/native.py) exposes it
// via ctypes and falls back to pandas when the shared library is unavailable.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC criteo_parser.cpp -o libcriteo.so

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kDense = 13;
constexpr int kSparse = 26;

struct Parser {
  // per-column token-hash -> id (1..N); 0 reserved for unknown
  std::vector<std::unordered_map<uint64_t, int64_t>> maps;
  Parser() : maps(kSparse) {}
};

inline uint64_t fnv1a(const char* s, size_t n) {
  uint64_t h = 1469598103934665603ULL;
  for (size_t i = 0; i < n; ++i) {
    h ^= (unsigned char)s[i];
    h *= 1099511628211ULL;
  }
  return h;
}

// token for missing sparse values: "-1" (xdftrain.py:207 fillna("-1"))
const uint64_t kMissingHash = fnv1a("-1", 2);

// allocation-free float parse (the old std::string+strtof temporary was ~40
// heap allocations per row); from_chars handles the plain decimal/scientific
// forms Criteo files contain.
inline float parse_float(const char* tok, size_t tlen) {
  float v = 0.0f;
  auto res = std::from_chars(tok, tok + tlen, v);
  if (res.ec != std::errc()) {
    char buf[64];
    size_t n = tlen < 63 ? tlen : 63;
    memcpy(buf, tok, n);
    buf[n] = 0;
    v = strtof(buf, nullptr);
  }
  return v;
}

struct Row {
  float label;
  float dense[kDense];
  uint64_t sparse[kSparse];
};

// Parse one line. `with_label`: 40-column labeled format; else 39-column test
// format (dense first, then sparse; xdftrain.py:292-299).
bool parse_line(const char* line, size_t len, char sep, bool with_label,
                Row* row) {
  int field = 0;
  size_t start = 0;
  const int n_fields = (with_label ? 1 : 0) + kDense + kSparse;
  for (size_t i = 0; i <= len; ++i) {
    if (i == len || line[i] == sep) {
      const char* tok = line + start;
      size_t tlen = i - start;
      // strip \r
      while (tlen > 0 && (tok[tlen - 1] == '\r' || tok[tlen - 1] == '\n'))
        --tlen;
      int f = field;
      if (with_label) {
        if (f == 0) {
          row->label = tlen ? parse_float(tok, tlen) : 0.0f;
        }
        f -= 1;
      }
      if (f >= 0 && f < kDense) {
        row->dense[f] = tlen ? parse_float(tok, tlen) : 0.0f;
      } else if (f >= kDense && f < kDense + kSparse) {
        row->sparse[f - kDense] = tlen ? fnv1a(tok, tlen) : kMissingHash;
      }
      ++field;
      start = i + 1;
      if (field >= n_fields && i == len) break;
    }
  }
  return field >= n_fields;
}

char detect_sep(const char* line) {
  for (const char* p = line; *p && *p != '\n'; ++p)
    if (*p == '\t') return '\t';
  return ',';
}

bool looks_like_header(const char* line) {
  // header starts with "label" or "I1"/"C1" field names
  return strncmp(line, "label", 5) == 0 || strncmp(line, "\"label\"", 7) == 0;
}

}  // namespace

extern "C" {

void* criteo_parser_new() { return new Parser(); }

void criteo_parser_free(void* p) { delete static_cast<Parser*>(p); }

// Count data rows (excluding a detected header).
int64_t criteo_count_rows(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  setvbuf(f, nullptr, _IOFBF, 1 << 20);
  int64_t rows = 0;
  char* line = nullptr;
  size_t cap = 0;
  ssize_t n;
  bool first = true;
  while ((n = getline(&line, &cap, f)) > 0) {
    if (first && looks_like_header(line)) {
      first = false;
      continue;
    }
    first = false;
    if (n > 1) ++rows;
  }
  free(line);
  fclose(f);
  return rows;
}

// Parse `path` into the provided arrays (caller allocates, length = rows from
// criteo_count_rows).  fit != 0: extend the per-column vocab with unseen
// tokens (SafeLabelEncoder.fit semantics); fit == 0: unknown -> 0.
// with_label != 0: labeled 40-col file; else 39-col test file.
// Returns rows parsed, or -1 on error.
int64_t criteo_parse(void* handle, const char* path, int with_label, int fit,
                     float* labels, float* dense, int64_t* sparse_ids) {
  Parser* parser = static_cast<Parser*>(handle);
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  setvbuf(f, nullptr, _IOFBF, 1 << 20);
  char* line = nullptr;
  size_t cap = 0;
  ssize_t n;
  int64_t r = 0;
  bool first = true;
  char sep = 0;
  Row row;
  while ((n = getline(&line, &cap, f)) > 0) {
    if (first) {
      first = false;
      if (looks_like_header(line)) continue;  // data line falls through
    }
    if (n <= 1) continue;
    if (!sep) sep = detect_sep(line);
    if (!parse_line(line, (size_t)n, sep, with_label != 0, &row)) continue;
    if (labels) labels[r] = with_label ? row.label : 0.0f;
    for (int d = 0; d < kDense; ++d) dense[r * kDense + d] = row.dense[d];
    for (int s = 0; s < kSparse; ++s) {
      auto& m = parser->maps[s];
      auto it = m.find(row.sparse[s]);
      int64_t id;
      if (it != m.end()) {
        id = it->second;
      } else if (fit) {
        id = (int64_t)m.size() + 1;  // 1..N, 0 = unknown
        m.emplace(row.sparse[s], id);
      } else {
        id = 0;
      }
      sparse_ids[r * kSparse + s] = id;
    }
    ++r;
  }
  free(line);
  fclose(f);
  return r;
}

// ---- streaming interface (out-of-core training feeds, data.py
// iter_criteo_batches native path) ----------------------------------------

struct Stream {
  Parser* parser;
  FILE* f;
  char* line = nullptr;
  size_t cap = 0;
  bool first = true;
  char sep = 0;
  int with_label;
  int fit;
  ~Stream() {
    free(line);
    if (f) fclose(f);
  }
};

// Open a row stream over `path`.  Returns nullptr on error.
void* criteo_stream_open(void* handle, const char* path, int with_label,
                         int fit) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  setvbuf(f, nullptr, _IOFBF, 1 << 20);
  Stream* s = new Stream();
  s->parser = static_cast<Parser*>(handle);
  s->f = f;
  s->with_label = with_label;
  s->fit = fit;
  return s;
}

// Parse up to `max_rows` rows into the caller's buffers; returns rows
// produced (0 = EOF, -1 = error).
int64_t criteo_stream_next(void* stream, int64_t max_rows, float* labels,
                           float* dense, int64_t* sparse_ids) {
  Stream* st = static_cast<Stream*>(stream);
  if (!st || !st->f) return -1;
  Parser* parser = st->parser;
  int64_t r = 0;
  ssize_t n;
  Row row;
  while (r < max_rows && (n = getline(&st->line, &st->cap, st->f)) > 0) {
    char* line = st->line;
    if (st->first) {
      st->first = false;
      if (looks_like_header(line)) continue;
    }
    if (n <= 1) continue;
    if (!st->sep) st->sep = detect_sep(line);
    if (!parse_line(line, (size_t)n, st->sep, st->with_label != 0, &row))
      continue;
    if (labels) labels[r] = st->with_label ? row.label : 0.0f;
    for (int d = 0; d < kDense; ++d) dense[r * kDense + d] = row.dense[d];
    for (int s = 0; s < kSparse; ++s) {
      auto& m = parser->maps[s];
      auto it = m.find(row.sparse[s]);
      int64_t id;
      if (it != m.end()) {
        id = it->second;
      } else if (st->fit) {
        id = (int64_t)m.size() + 1;
        m.emplace(row.sparse[s], id);
      } else {
        id = 0;
      }
      sparse_ids[r * kSparse + s] = id;
    }
    ++r;
  }
  return r;
}

void criteo_stream_close(void* stream) { delete static_cast<Stream*>(stream); }

// vocab size (max id + 1, including the unknown slot 0) per sparse column.
void criteo_vocab_sizes(void* handle, int64_t* out26) {
  Parser* parser = static_cast<Parser*>(handle);
  for (int s = 0; s < kSparse; ++s)
    out26[s] = (int64_t)parser->maps[s].size() + 1;
}

// Serialize / restore the encoder maps (binary: per column, count then pairs).
int criteo_save_vocab(void* handle, const char* path) {
  Parser* parser = static_cast<Parser*>(handle);
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  for (int s = 0; s < kSparse; ++s) {
    uint64_t cnt = parser->maps[s].size();
    fwrite(&cnt, sizeof(cnt), 1, f);
    for (auto& kv : parser->maps[s]) {
      fwrite(&kv.first, sizeof(kv.first), 1, f);
      fwrite(&kv.second, sizeof(kv.second), 1, f);
    }
  }
  fclose(f);
  return 0;
}

int criteo_load_vocab(void* handle, const char* path) {
  Parser* parser = static_cast<Parser*>(handle);
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  for (int s = 0; s < kSparse; ++s) {
    uint64_t cnt = 0;
    if (fread(&cnt, sizeof(cnt), 1, f) != 1) {
      fclose(f);
      return -1;
    }
    auto& m = parser->maps[s];
    m.clear();
    m.reserve(cnt);
    for (uint64_t i = 0; i < cnt; ++i) {
      uint64_t k;
      int64_t v;
      if (fread(&k, sizeof(k), 1, f) != 1 || fread(&v, sizeof(v), 1, f) != 1) {
        fclose(f);
        return -1;
      }
      m.emplace(k, v);
    }
  }
  fclose(f);
  return 0;
}

}  // extern "C"
