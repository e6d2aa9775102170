// Native SMEM seeding: bwt_smem1 + re-seeding + SA lookups in C++.
//
// Semantics mirror bwamem_tpu/index/fmindex.py (the tested scalar golden
// twin of bwa-0.7.8's bwt_smem1 / mem_collect_intv / bwt_sa); the rank
// structures are the packed tables of index/occ_packed.py (2-bit lanes,
// 16 symbols per u32 word, 4 words + a checkpoint row per 64-symbol
// block).  The python batched path is dispatch-bound at ~2ms/read; this
// runs the same chain of dependent rank queries at memory latency.

#include <cstdint>
#include <cstddef>
#include <vector>
using std::size_t;

namespace {

struct Index {
  const int64_t* C;          // 6 entries
  int64_t primary;
  int64_t n_rows;
  const int32_t* occ_rows;   // (nb+1) * 4
  const uint32_t* pk_rows;   // (nb+1) * 4
  const uint32_t* va_rows;   // (nb+1) * 4
  const int64_t* ssa;
  int64_t n_ssa;
  int64_t sa_intv;
};

inline int popcnt(uint32_t x) { return __builtin_popcount(x); }

inline void rank4(const Index& ix, int64_t i, int64_t out[4]) {
  int64_t blk = i >> 6;
  int64_t r = i & 63;
  const uint32_t* w = ix.pk_rows + blk * 4;
  const uint32_t* v = ix.va_rows + blk * 4;
  const int32_t* base = ix.occ_rows + blk * 4;
  for (int c = 0; c < 4; ++c) {
    uint32_t pat = 0x55555555u * static_cast<uint32_t>(c);
    int64_t cnt = base[c];
    for (int k = 0; k < 4; ++k) {
      int64_t nsym = r - 16 * k;
      if (nsym <= 0) break;
      if (nsym > 16) nsym = 16;
      uint32_t pmask = nsym >= 16 ? 0xFFFFFFFFu
                                  : ((1u << (2 * nsym)) - 1u);
      uint32_t t = w[k] ^ pat;
      uint32_t q = (~t) & ((~t) >> 1) & 0x55555555u;
      cnt += popcnt(q & v[k] & pmask);
    }
    out[c] = cnt;
  }
}

struct Intv {
  int64_t x0, x1, s;
  int64_t qb, qe;
};

// backward extensions of ik for all 4 chars (bwt_extend is_back=1)
inline void extend_back4(const Index& ix, const Intv& ik, Intv out[4]) {
  int64_t tk[4], tl[4];
  rank4(ix, ik.x0, tk);
  rank4(ix, ik.x0 + ik.s, tl);
  int64_t sz[4];
  for (int c = 0; c < 4; ++c) sz[c] = tl[c] - tk[c];
  int64_t has_s =
      (ik.x0 <= ix.primary && ix.primary < ik.x0 + ik.s) ? 1 : 0;
  int64_t x1 = ik.x1 + has_s;  // char 3 first, complement-order tiling
  int64_t x1s[4];
  x1s[3] = x1;
  x1s[2] = x1s[3] + sz[3];
  x1s[1] = x1s[2] + sz[2];
  x1s[0] = x1s[1] + sz[1];
  for (int c = 0; c < 4; ++c) {
    out[c].x0 = ix.C[c] + tk[c];
    out[c].x1 = x1s[c];
    out[c].s = sz[c];
    out[c].qb = ik.qb;
    out[c].qe = ik.qe;
  }
}

// forward extension P·c = backward extension of revcomp by 3-c, swapped
inline void extend_fwd4(const Index& ix, const Intv& ik, Intv out[4]) {
  Intv sw{ik.x1, ik.x0, ik.s, ik.qb, ik.qe};
  Intv b[4];
  extend_back4(ix, sw, b);
  for (int c = 0; c < 4; ++c) {
    out[c].x0 = b[3 - c].x1;
    out[c].x1 = b[3 - c].x0;
    out[c].s = b[3 - c].s;
    out[c].qb = ik.qb;
    out[c].qe = ik.qe;
  }
}

// bwt_smem1: all SMEMs of q through position x.  Returns next_x.
int64_t smem1(const Index& ix, const uint8_t* q, int64_t len, int64_t x,
              int64_t min_intv, std::vector<Intv>& mems) {
  mems.clear();
  if (q[x] > 3) return x + 1;
  Intv ik;
  int c0 = q[x];
  ik.x0 = ix.C[c0];
  ik.s = ix.C[c0 + 1] - ix.C[c0];
  ik.x1 = ix.C[3 - c0];
  ik.qb = x;
  ik.qe = x + 1;
  std::vector<Intv> curr, prev;
  int64_t i = x + 1;
  for (; i < len; ++i) {
    if (q[i] < 4) {
      Intv ok[4];
      extend_fwd4(ix, ik, ok);
      const Intv& e = ok[q[i]];
      if (e.s != ik.s) {
        curr.push_back(ik);
        if (e.s < min_intv) break;
      }
      ik = e;
      ik.qb = x;
      ik.qe = i + 1;
    } else {
      curr.push_back(ik);
      break;
    }
  }
  if (i == len) curr.push_back(ik);
  if (curr.empty()) return x + 1;
  int64_t ret = curr.back().qe;
  prev.assign(curr.rbegin(), curr.rend());  // longest first
  for (int64_t j = x - 1; j >= -1; --j) {
    int c = (j < 0 || q[j] > 3) ? -1 : q[j];
    curr.clear();
    for (auto& p : prev) {
      Intv ok[4];
      if (c >= 0) extend_back4(ix, p, ok);
      if (c < 0 || ok[c].s < min_intv) {
        if (curr.empty()) {
          if (mems.empty() || j + 1 < mems.back().qb) {
            Intv m = p;
            m.qb = j + 1;
            mems.push_back(m);
          }
        }
      } else if (curr.empty() || ok[c].s != curr.back().s) {
        Intv m = ok[c];
        m.qb = p.qb;
        m.qe = p.qe;
        curr.push_back(m);
      }
    }
    if (curr.empty()) break;
    prev.swap(curr);
  }
  // emitted in decreasing qb; reverse to qb-ascending (bwa order)
  for (size_t a = 0, b = mems.size(); a + 1 < b; ++a, --b)
    std::swap(mems[a], mems[b - 1]);
  return ret;
}

inline int64_t sa_value(const Index& ix, int64_t r) {
  int64_t d = 0;
  for (;;) {
    if (r == ix.primary) return d;
    if (r % ix.sa_intv == 0) return ix.ssa[r / ix.sa_intv] + d;
    int64_t blk = r >> 6, off = r & 63;
    uint32_t w = ix.pk_rows[blk * 4 + off / 16];
    int lane = off % 16;
    int sym = (w >> (2 * lane)) & 3;
    int vbit = (ix.va_rows[blk * 4 + off / 16] >> (2 * lane)) & 1;
    int64_t rk[4];
    rank4(ix, r, rk);
    int64_t c, rankc;
    if (vbit) {
      c = sym;
      rankc = rk[c];
    } else {
      c = 4;  // N (the sentinel row is the primary, handled above)
      rankc = r - (rk[0] + rk[1] + rk[2] + rk[3]) -
              (ix.primary < r ? 1 : 0);
    }
    r = ix.C[c] + rankc;
    ++d;
  }
}

}  // namespace

extern "C" {

// Seeds for a batch of reads (the collect_seeds pipeline stage).
// reads: (n_reads, L) row-major u8 codes padded with 4.
// seeds_out: capacity cap rows of 4 int64 {read_idx, rbeg, qbeg, len},
// in the exact order the python/scalar path produces them.
// Returns the number of seed rows written, or -1 if cap was too small.
int64_t bwamem_collect_seeds(
    const int64_t* C, int64_t primary, int64_t n_rows,
    const int32_t* occ_rows, const uint32_t* pk_rows,
    const uint32_t* va_rows, const int64_t* ssa, int64_t n_ssa,
    int64_t sa_intv, const uint8_t* reads, const int64_t* qlen,
    int64_t n_reads, int64_t L, int64_t min_seed_len, int64_t split_len,
    int64_t split_width, int64_t max_occ, int64_t* seeds_out,
    int64_t cap) {
  Index ix{C, primary, n_rows, occ_rows, pk_rows, va_rows,
           ssa, n_ssa, sa_intv};
  int64_t out_n = 0;
  std::vector<Intv> mems, got;
  for (int64_t ri = 0; ri < n_reads; ++ri) {
    const uint8_t* q = reads + ri * L;
    int64_t len = qlen[ri];
    mems.clear();
    int64_t x = 0;
    while (x < len) {
      if (q[x] < 4) {
        x = smem1(ix, q, len, x, 1, got);
        for (auto& m : got)
          if (m.qe - m.qb >= min_seed_len) mems.push_back(m);
      } else {
        ++x;
      }
    }
    // re-seeding round (0.7.8 second pass)
    size_t first_round = mems.size();
    for (size_t k = 0; k < first_round; ++k) {
      Intv p = mems[k];
      if (p.qe - p.qb >= split_len && p.s <= split_width) {
        smem1(ix, q, len, (p.qb + p.qe) / 2, p.s + 1, got);
        for (auto& m : got)
          if (m.qe - m.qb >= min_seed_len) mems.push_back(m);
      }
    }
    // sort by (qb, qe) — stable order parity with the python path
    for (size_t a = 1; a < mems.size(); ++a) {  // insertion sort (small n)
      Intv key = mems[a];
      size_t b = a;
      while (b > 0 && (mems[b - 1].qb > key.qb ||
                       (mems[b - 1].qb == key.qb &&
                        mems[b - 1].qe > key.qe))) {
        mems[b] = mems[b - 1];
        --b;
      }
      mems[b] = key;
    }
    // enumerate occurrences with bwa's max_occ subsampling
    for (auto& m : mems) {
      int64_t step = m.s > max_occ ? m.s / max_occ : 1;
      int64_t cnt = 0;
      for (int64_t k = 0; k < m.s && cnt < max_occ; k += step, ++cnt) {
        if (out_n >= cap) return -1;
        int64_t rbeg = sa_value(ix, m.x0 + k);
        int64_t* row = seeds_out + out_n * 4;
        row[0] = ri;
        row[1] = rbeg;
        row[2] = m.qb;
        row[3] = m.qe - m.qb;
        ++out_n;
      }
    }
  }
  return out_n;
}

}  // extern "C"
