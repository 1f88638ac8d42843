// Native data-loader: multithreaded Criteo-format TSV parser + hash encoder.
//
// The reference framework's input path is single-threaded pandas
// (``kon/utils/data_prepare.py:85-102`` LabelEncoder loop;
// ``example/ctr_example/un_seq.py:36-37`` pd.read_csv).  At full-Criteo scale
// (45M rows) that path is minutes of host time per epoch — long enough to
// starve a v5e chip that trains DeepFM at ~500k examples/s.  This loader
// parses and encodes straight from the raw byte buffer into the framework's
// device-ready layout (float32 dense block, int32 hashed sparse block,
// float32 labels) with one pass per thread and zero intermediate objects.
//
// Format per line (standard Criteo TSV, un_seq.py:39-40 layout):
//   label \t I1 .. I13 \t C1 .. C26 \n          (fields may be empty)
//
// Encoding spec (mirrored by features/native_loader.py::py_reference_parse
// for numeric parity tests):
//   label:  float of field 0 (empty -> 0)
//   dense:  integer/float field; missing -> 0; log1p mode -> log1p(max(v,0))
//   sparse: FNV-1a 64-bit over "<col>:<bytes>" -> 1 + h % (buckets-1)
//           (0 is reserved for missing/padding, matching SparseEncoder's
//           hash mode contract, features/encoders.py:34-41)
//
// Threading: the buffer is split into T byte-ranges snapped to newline
// boundaries; pass 1 counts rows per range (memchr), a prefix sum assigns
// each range its output row offset, pass 2 parses ranges in parallel.
// No locks, no atomics on the hot path.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint64_t fnv1a(const char* s, size_t n, uint64_t h) {
  for (size_t i = 0; i < n; ++i) {
    h ^= static_cast<unsigned char>(s[i]);
    h *= 1099511628211ULL;
  }
  return h;
}

constexpr uint64_t kFnvOffset = 1469598103934665603ULL;

// Parse a float field [s, e); empty -> 0.  Criteo dense fields are small
// integers, so a fast integer path covers ~all rows; fall back to strtod.
inline float parse_num(const char* s, const char* e) {
  if (s >= e) return 0.0f;
  bool neg = false;
  if (*s == '-') { neg = true; ++s; }
  int64_t v = 0;
  const char* p = s;
  while (p < e && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
  if (p == e && p != s) return neg ? -static_cast<float>(v)
                                   : static_cast<float>(v);
  char tmp[64];
  size_t n = static_cast<size_t>(e - (neg ? s - 1 : s));
  if (n >= sizeof(tmp)) n = sizeof(tmp) - 1;
  std::memcpy(tmp, neg ? s - 1 : s, n);
  tmp[n] = 0;
  return static_cast<float>(strtod(tmp, nullptr));
}

struct Range { const char* begin; const char* end; int64_t row0; };

// Split [buf, buf+len) into at most t ranges snapped forward to '\n'.
std::vector<Range> split_ranges(const char* buf, int64_t len, int t) {
  std::vector<Range> out;
  const char* end = buf + len;
  const char* cur = buf;
  int64_t chunk = len / t + 1;
  while (cur < end) {
    const char* stop = cur + chunk;
    if (stop >= end) {
      stop = end;
    } else {
      const char* nl = static_cast<const char*>(
          memchr(stop, '\n', static_cast<size_t>(end - stop)));
      stop = nl ? nl + 1 : end;
    }
    out.push_back({cur, stop, 0});
    cur = stop;
  }
  return out;
}

int64_t count_lines(const char* b, const char* e) {
  int64_t n = 0;
  while (b < e) {
    const char* nl = static_cast<const char*>(
        memchr(b, '\n', static_cast<size_t>(e - b)));
    if (!nl) { ++n; break; }  // final line without trailing newline
    ++n;
    b = nl + 1;
  }
  return n;
}

struct Spec {
  int n_dense;
  int n_sparse;
  int64_t buckets;
  bool log1p;
  // Per-column hash state seeded with "<col>:" so fields with equal bytes
  // land in different buckets (same contract as SparseEncoder's salt).
  std::vector<uint64_t> col_seed;
};

void parse_range(const Range& r, const Spec& sp, float* dense,
                 int32_t* sparse, float* label) {
  const char* p = r.begin;
  const char* end = r.end;
  int64_t row = r.row0;
  const int nfields = 1 + sp.n_dense + sp.n_sparse;
  while (p < end) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char* line_end = nl ? nl : end;
    float* drow = dense + row * sp.n_dense;
    int32_t* srow = sparse + row * sp.n_sparse;
    const char* f = p;
    for (int i = 0; i < nfields && f <= line_end; ++i) {
      const char* tab = static_cast<const char*>(
          memchr(f, '\t', static_cast<size_t>(line_end - f)));
      const char* fe = tab ? tab : line_end;
      if (i == 0) {
        label[row] = parse_num(f, fe);
      } else if (i <= sp.n_dense) {
        float v = parse_num(f, fe);
        drow[i - 1] = sp.log1p ? std::log1p(v > 0.0f ? v : 0.0f) : v;
      } else {
        int j = i - 1 - sp.n_dense;
        if (f == fe) {
          srow[j] = 0;  // missing -> padding id
        } else {
          uint64_t h = fnv1a(f, static_cast<size_t>(fe - f), sp.col_seed[j]);
          srow[j] = static_cast<int32_t>(1 + h % (sp.buckets - 1));
        }
      }
      f = fe + 1;
    }
    ++row;
    if (!nl) break;
    p = nl + 1;
  }
}

}  // namespace

extern "C" {

// Rows in [buf, buf+len), counted in parallel.
int64_t mlf_count_rows(const char* buf, int64_t len, int n_threads) {
  if (len <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  auto ranges = split_ranges(buf, len, n_threads);
  std::vector<int64_t> counts(ranges.size(), 0);
  std::vector<std::thread> ts;
  for (size_t i = 0; i < ranges.size(); ++i)
    ts.emplace_back([&, i] { counts[i] = count_lines(ranges[i].begin,
                                                     ranges[i].end); });
  for (auto& t : ts) t.join();
  int64_t total = 0;
  for (int64_t c : counts) total += c;
  return total;
}

// Parse Criteo TSV into preallocated row-major outputs:
//   dense  (n_rows, n_dense)  float32
//   sparse (n_rows, n_sparse) int32
//   label  (n_rows,)          float32
// col_names: '\n'-joined sparse column names (hash salts).
// Returns rows written, or -1 on spec error.
int64_t mlf_parse_criteo(const char* buf, int64_t len, int n_dense,
                         int n_sparse, int64_t hash_buckets, int log1p_flag,
                         const char* col_names, float* dense_out,
                         int32_t* sparse_out, float* label_out,
                         int n_threads) {
  if (len <= 0 || n_sparse < 0 || n_dense < 0 || hash_buckets < 2) return -1;
  if (n_threads < 1) n_threads = 1;

  Spec sp;
  sp.n_dense = n_dense;
  sp.n_sparse = n_sparse;
  sp.buckets = hash_buckets;
  sp.log1p = log1p_flag != 0;
  {
    const char* c = col_names;
    for (int j = 0; j < n_sparse; ++j) {
      const char* e = strchr(c, '\n');
      size_t n = e ? static_cast<size_t>(e - c) : strlen(c);
      uint64_t seed = fnv1a(c, n, kFnvOffset);
      seed = fnv1a(":", 1, seed);
      sp.col_seed.push_back(seed);
      c += n + (e ? 1 : 0);
    }
  }

  auto ranges = split_ranges(buf, len, n_threads);
  std::vector<int64_t> counts(ranges.size(), 0);
  {
    std::vector<std::thread> ts;
    for (size_t i = 0; i < ranges.size(); ++i)
      ts.emplace_back([&, i] { counts[i] = count_lines(ranges[i].begin,
                                                       ranges[i].end); });
    for (auto& t : ts) t.join();
  }
  int64_t row0 = 0;
  for (size_t i = 0; i < ranges.size(); ++i) {
    ranges[i].row0 = row0;
    row0 += counts[i];
  }

  std::vector<std::thread> ts;
  for (auto& r : ranges)
    ts.emplace_back([&, r] { parse_range(r, sp, dense_out, sparse_out,
                                         label_out); });
  for (auto& t : ts) t.join();
  return row0;
}

}  // extern "C"
