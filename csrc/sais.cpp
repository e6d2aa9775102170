// SA-IS suffix array construction (Nong, Zhang & Chan, 2009) for the
// FM-index builder.  The reference system uses stock `bwa index` (BWT
// via bwt_gen) on the host; this is our native-code equivalent, built
// as a shared library and loaded via ctypes (no pybind11 in this image).
//
// Linear time, works on any integer alphabet.  Two storage backends
// share the templated algorithm:
//   - I64View: plain int64 entries (the fast path for ordinary sizes)
//   - I40View: packed 5-byte little-endian signed entries — 5 bytes
//     per suffix instead of 8, which together with direct BWT emission
//     (bwamem_sais_bwt_u8 below, no int64 SA ever materialized) brings
//     a GRCh38-scale two-strand build (6.2 Gsym) under this host's
//     125 GB: ~8.3 bytes/symbol peak vs ~17 for the int64 path.
//
// The Python wrapper appends the unique 0 sentinel and shifts +1.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct I64View {
  int64_t* p;
  int64_t get(int64_t i) const { return p[i]; }
  void set(int64_t i, int64_t v) const { p[i] = v; }
  I64View at(int64_t off) const { return {p + off}; }
};

// packed 5-byte little-endian signed integers (sign in the top byte)
struct I40View {
  uint8_t* p;
  int64_t get(int64_t i) const {
    const uint8_t* q = p + i * 5;
    uint32_t lo;
    std::memcpy(&lo, q, 4);
    return (int64_t)(int8_t)q[4] << 32 | lo;
  }
  void set(int64_t i, int64_t v) const {
    uint8_t* q = p + i * 5;
    uint32_t lo = (uint32_t)v;
    std::memcpy(q, &lo, 4);
    q[4] = (uint8_t)(v >> 32);
  }
  I40View at(int64_t off) const { return {p + off * 5}; }
};

// text accessor: level 0 reads the uint8 input, deeper levels read the
// reduced problem stored inside SA (via the same view type as SA)
template <typename SAV>
inline int64_t chr_at(const uint8_t* s8, const SAV& s, int64_t i, int cs) {
  return cs == 1 ? (int64_t)s8[i] : s.get(i);
}

template <typename SAV>
void get_counts(const uint8_t* s8, const SAV& s, int64_t* C, int64_t n,
                int64_t K, int cs) {
  std::memset(C, 0, K * sizeof(int64_t));
  for (int64_t i = 0; i < n; ++i) ++C[chr_at(s8, s, i, cs)];
}

inline void get_buckets(const int64_t* C, int64_t* B, int64_t K, bool end) {
  int64_t sum = 0;
  for (int64_t i = 0; i < K; ++i) {
    sum += C[i];
    B[i] = end ? sum : sum - C[i];
  }
}

template <typename SAV>
void induce_l(const uint8_t* s8, const SAV& s, const SAV& SA,
              const std::vector<bool>& t, const int64_t* C, int64_t* B,
              int64_t n, int64_t K, int cs) {
  get_buckets(C, B, K, false);
  for (int64_t i = 0; i < n; ++i) {
    int64_t v = SA.get(i);
    int64_t j = v - 1;
    if (v > 0 && !t[j]) SA.set(B[chr_at(s8, s, j, cs)]++, j);
  }
}

template <typename SAV>
void induce_s(const uint8_t* s8, const SAV& s, const SAV& SA,
              const std::vector<bool>& t, const int64_t* C, int64_t* B,
              int64_t n, int64_t K, int cs) {
  get_buckets(C, B, K, true);
  for (int64_t i = n - 1; i >= 0; --i) {
    int64_t v = SA.get(i);
    int64_t j = v - 1;
    if (v > 0 && t[j]) SA.set(--B[chr_at(s8, s, j, cs)], j);
  }
}

// s[n-1] must be the unique smallest symbol (sentinel).
template <typename SAV>
void sa_is(const uint8_t* s8, const SAV& s, const SAV& SA, int64_t n,
           int64_t K, int cs) {
  if (n == 1) {
    SA.set(0, 0);
    return;
  }
  std::vector<bool> t(n);
  t[n - 1] = true;
  for (int64_t i = n - 2; i >= 0; --i) {
    int64_t a = chr_at(s8, s, i, cs), b = chr_at(s8, s, i + 1, cs);
    t[i] = (a < b) || (a == b && t[i + 1]);
  }
  auto is_lms = [&](int64_t i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<int64_t> C(K), B(K);
  get_counts(s8, s, C.data(), n, K, cs);

  // stage 1: place LMS suffixes, induce to sort LMS substrings
  for (int64_t i = 0; i < n; ++i) SA.set(i, -1);
  get_buckets(C.data(), B.data(), K, true);
  for (int64_t i = 1; i < n; ++i)
    if (is_lms(i)) SA.set(--B[chr_at(s8, s, i, cs)], i);
  induce_l(s8, s, SA, t, C.data(), B.data(), n, K, cs);
  induce_s(s8, s, SA, t, C.data(), B.data(), n, K, cs);

  // compact sorted LMS positions into SA[0..n1)
  int64_t n1 = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t v = SA.get(i);
    if (is_lms(v)) SA.set(n1++, v);
  }

  // name LMS substrings in SA[n1..n)
  for (int64_t i = n1; i < n; ++i) SA.set(i, -1);
  int64_t name = 0, prev = -1;
  for (int64_t i = 0; i < n1; ++i) {
    int64_t pos = SA.get(i);
    bool diff = false;
    if (prev < 0) {
      diff = true;
    } else {
      for (int64_t d = 0;; ++d) {
        if (pos + d >= n || prev + d >= n) {
          diff = true;
          break;
        }
        bool lms_p = is_lms(pos + d), lms_q = is_lms(prev + d);
        if (d > 0 && lms_p && lms_q) break;  // both ended equal
        if (lms_p != lms_q ||
            chr_at(s8, s, pos + d, cs) != chr_at(s8, s, prev + d, cs)) {
          diff = true;
          break;
        }
      }
    }
    if (diff) {
      ++name;
      prev = pos;
    }
    SA.set(n1 + pos / 2, name - 1);
  }
  for (int64_t i = n - 1, j = n - 1; i >= n1; --i) {
    int64_t v = SA.get(i);
    if (v >= 0) SA.set(j--, v);
  }

  // stage 2: sort the reduced problem (text stored inside SA)
  SAV SA1 = SA;
  SAV s1 = SA.at(n - n1);
  if (name < n1) {
    sa_is<SAV>(nullptr, s1, SA1, n1, name, 8);
  } else {
    for (int64_t i = 0; i < n1; ++i) SA1.set(s1.get(i), i);
  }

  // stage 3: induce the full SA from the sorted LMS suffixes
  for (int64_t i = 1, j = 0; i < n; ++i)
    if (is_lms(i)) s1.set(j++, i);
  for (int64_t i = 0; i < n1; ++i) SA1.set(i, s1.get(SA1.get(i)));
  for (int64_t i = n1; i < n; ++i) SA.set(i, -1);
  get_buckets(C.data(), B.data(), K, true);
  for (int64_t i = n1 - 1; i >= 0; --i) {
    int64_t j = SA.get(i);
    SA.set(i, -1);
    SA.set(--B[chr_at(s8, s, j, cs)], j);
  }
  induce_l(s8, s, SA, t, C.data(), B.data(), n, K, cs);
  induce_s(s8, s, SA, t, C.data(), B.data(), n, K, cs);
}

}  // namespace

extern "C" {

// Suffix array of u8 string s[0..n) (sentinel NOT included by caller).
// Internally appends the implicit unique smallest sentinel by shifting
// the alphabet +1.  Writes n entries (a permutation of 0..n-1) to sa.
// Returns 0 on success.
int bwamem_sais_u8(const uint8_t* s, int64_t* sa, int64_t n, int64_t K) {
  if (n <= 0) return 0;
  if (n == 1) {
    sa[0] = 0;
    return 0;
  }
  std::vector<uint8_t> s2(n + 1);
  for (int64_t i = 0; i < n; ++i) s2[i] = s[i] + 1;
  s2[n] = 0;
  std::vector<int64_t> SA(n + 1);
  sa_is<I64View>(s2.data(), I64View{nullptr}, I64View{SA.data()}, n + 1,
                 K + 2, 1);
  // SA[0] is the sentinel suffix; drop it
  std::memcpy(sa, SA.data() + 1, n * sizeof(int64_t));
  return 0;
}

// Memory-bounded build for huge texts: computes the suffix array in
// packed 40-bit entries and emits the BWT and sampled SA directly —
// the int64 SA (8 bytes/suffix, ~50 GB at GRCh38 scale) never exists.
//
// Outputs, over the FULL (n+1)-row SA including the sentinel row:
//   bwt[r]  = s[SA[r]-1], or 5 at the row where SA[r]==0 (primary)
//   ssa[j]  = SA[j * sa_intv]           (caller sizes ssa accordingly)
//   *primary = the sentinel row index
// This matches index/build.py's sa_full/bwt/ssa layout exactly.
// Returns 0 on success; n must be < 2^39.
int bwamem_sais_bwt_u8(const uint8_t* s, int64_t n, uint8_t* bwt,
                       int64_t* ssa, int64_t sa_intv, int64_t* primary) {
  if (n <= 0 || n >= ((int64_t)1 << 39)) return -1;
  std::vector<uint8_t> s2(n + 1);
  for (int64_t i = 0; i < n; ++i) s2[i] = s[i] + 1;
  s2[n] = 0;
  int64_t K = 0;
  for (int64_t i = 0; i < n; ++i)
    if (s[i] > K) K = s[i];
  std::vector<uint8_t> SAbuf((size_t)(n + 1) * 5);
  I40View SA{SAbuf.data()};
  sa_is<I40View>(s2.data(), I40View{nullptr}, SA, n + 1, K + 3, 1);
  for (int64_t r = 0; r <= n; ++r) {
    int64_t pos = SA.get(r);
    if (pos == 0) {
      bwt[r] = 5;
      *primary = r;
    } else {
      bwt[r] = s[pos - 1];
    }
    if (r % sa_intv == 0) ssa[r / sa_intv] = pos;
  }
  return 0;
}

}  // extern "C"
