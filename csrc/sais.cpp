// SA-IS suffix array construction (Nong, Zhang & Chan, 2009) for the
// FM-index builder.  The reference system uses stock `bwa index` (BWT
// via bwt_gen) on the host; this is our native-code equivalent, built
// as a shared library and loaded via ctypes (no pybind11 in this image).
//
// Linear time, int64 indices, works on any integer alphabet.  The
// Python wrapper appends the unique 0 sentinel and shifts symbols +1.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline int64_t chr_at(const void* s, int64_t i, int cs) {
  return cs == 1 ? static_cast<const uint8_t*>(s)[i]
                 : static_cast<const int64_t*>(s)[i];
}

void get_counts(const void* s, int64_t* C, int64_t n, int64_t K, int cs) {
  std::memset(C, 0, K * sizeof(int64_t));
  for (int64_t i = 0; i < n; ++i) ++C[chr_at(s, i, cs)];
}

void get_buckets(const int64_t* C, int64_t* B, int64_t K, bool end) {
  int64_t sum = 0;
  for (int64_t i = 0; i < K; ++i) {
    sum += C[i];
    B[i] = end ? sum : sum - C[i];
  }
}

void induce_l(const void* s, int64_t* SA, const std::vector<bool>& t,
              const int64_t* C, int64_t* B, int64_t n, int64_t K, int cs) {
  get_buckets(C, B, K, false);
  for (int64_t i = 0; i < n; ++i) {
    int64_t j = SA[i] - 1;
    if (SA[i] > 0 && !t[j]) SA[B[chr_at(s, j, cs)]++] = j;
  }
}

void induce_s(const void* s, int64_t* SA, const std::vector<bool>& t,
              const int64_t* C, int64_t* B, int64_t n, int64_t K, int cs) {
  get_buckets(C, B, K, true);
  for (int64_t i = n - 1; i >= 0; --i) {
    int64_t j = SA[i] - 1;
    if (SA[i] > 0 && t[j]) SA[--B[chr_at(s, j, cs)]] = j;
  }
}

// s[n-1] must be the unique smallest symbol (sentinel).
void sa_is(const void* s, int64_t* SA, int64_t n, int64_t K, int cs) {
  if (n == 1) {
    SA[0] = 0;
    return;
  }
  std::vector<bool> t(n);
  t[n - 1] = true;
  for (int64_t i = n - 2; i >= 0; --i) {
    int64_t a = chr_at(s, i, cs), b = chr_at(s, i + 1, cs);
    t[i] = (a < b) || (a == b && t[i + 1]);
  }
  auto is_lms = [&](int64_t i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<int64_t> C(K), B(K);
  get_counts(s, C.data(), n, K, cs);

  // stage 1: place LMS suffixes, induce to sort LMS substrings
  std::fill(SA, SA + n, -1);
  get_buckets(C.data(), B.data(), K, true);
  for (int64_t i = 1; i < n; ++i)
    if (is_lms(i)) SA[--B[chr_at(s, i, cs)]] = i;
  induce_l(s, SA, t, C.data(), B.data(), n, K, cs);
  induce_s(s, SA, t, C.data(), B.data(), n, K, cs);

  // compact sorted LMS positions into SA[0..n1)
  int64_t n1 = 0;
  for (int64_t i = 0; i < n; ++i)
    if (is_lms(SA[i])) SA[n1++] = SA[i];

  // name LMS substrings in SA[n1..n)
  std::fill(SA + n1, SA + n, -1);
  int64_t name = 0, prev = -1;
  for (int64_t i = 0; i < n1; ++i) {
    int64_t pos = SA[i];
    bool diff = false;
    if (prev < 0) {
      diff = true;
    } else {
      for (int64_t d = 0;; ++d) {
        if (pos + d >= n || prev + d >= n) { diff = true; break; }
        bool lms_p = is_lms(pos + d), lms_q = is_lms(prev + d);
        if (d > 0 && lms_p && lms_q) break;  // both substrings ended equal
        if (lms_p != lms_q ||
            chr_at(s, pos + d, cs) != chr_at(s, prev + d, cs)) {
          diff = true;
          break;
        }
      }
    }
    if (diff) {
      ++name;
      prev = pos;
    }
    SA[n1 + pos / 2] = name - 1;
  }
  for (int64_t i = n - 1, j = n - 1; i >= n1; --i)
    if (SA[i] >= 0) SA[j--] = SA[i];

  // stage 2: sort the reduced problem
  int64_t* SA1 = SA;
  int64_t* s1 = SA + n - n1;
  if (name < n1) {
    sa_is(s1, SA1, n1, name, 8);
  } else {
    for (int64_t i = 0; i < n1; ++i) SA1[s1[i]] = i;
  }

  // stage 3: induce the full SA from the sorted LMS suffixes
  // rebuild LMS position list into s1 (order of appearance)
  for (int64_t i = 1, j = 0; i < n; ++i)
    if (is_lms(i)) s1[j++] = i;
  for (int64_t i = 0; i < n1; ++i) SA1[i] = s1[SA1[i]];
  std::fill(SA + n1, SA + n, -1);
  get_buckets(C.data(), B.data(), K, true);
  for (int64_t i = n1 - 1; i >= 0; --i) {
    int64_t j = SA[i];
    SA[i] = -1;
    SA[--B[chr_at(s, j, cs)]] = j;
  }
  induce_l(s, SA, t, C.data(), B.data(), n, K, cs);
  induce_s(s, SA, t, C.data(), B.data(), n, K, cs);
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
  sa_is(s2.data(), SA.data(), n + 1, K + 2, 1);
  // SA[0] is the sentinel suffix; drop it
  std::memcpy(sa, SA.data() + 1, n * sizeof(int64_t));
  return 0;
}

}  // extern "C"
