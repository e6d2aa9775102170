// Local Smith-Waterman with start+end coordinates (bwa's ksw_align),
// used by mate rescue (mem_matesw).  Native twin of
// bwamem_tpu/ops/local_ref.py — identical tie-breaking (first row with
// a strictly better score wins; first column index at the row maximum),
// identical KSW_XSUBO-style second-best.  The Python version's
// per-cell inner loop costs ~100 ms per rescue window, which made mate
// rescue the dominant PE-path cost whenever more than one orientation
// is trained; this runs the same cells at C speed.

#include <cstdint>
#include <vector>

namespace {

struct Fwd {
  int64_t best, bi, bj;
};

// Forward local pass; row_best (len tlen) filled when non-null.
Fwd forward_local(const uint8_t* query, int64_t qlen, const uint8_t* target,
                  int64_t tlen, const int8_t* mat, int64_t m, int64_t o_del,
                  int64_t e_del, int64_t o_ins, int64_t e_ins,
                  int64_t* row_best) {
  const int64_t oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
  std::vector<int64_t> H(qlen + 1, 0), E(qlen + 1, 0);
  int64_t best = 0, bi = -1, bj = -1;
  for (int64_t i = 0; i < tlen; ++i) {
    const int8_t* srow = mat + target[i] * m;
    int64_t f = 0;
    int64_t hdiag = H[0];  // H(i-1, j-1) for j = 0
    H[0] = 0;
    int64_t rb = 0, rj = 0;
    for (int64_t j = 0; j < qlen; ++j) {
      int64_t M = hdiag + srow[query[j]];
      hdiag = H[j + 1];
      int64_t h = M > E[j + 1] ? M : E[j + 1];
      if (h < 0) h = 0;
      if (f > h) h = f;
      H[j + 1] = h;
      // F(i, j+1) = max(F(i,j) - e_ins, H(i,j) - oe_ins, 0)
      int64_t fn = f - e_ins;
      int64_t t2 = h - oe_ins;
      f = fn > t2 ? fn : t2;
      if (f < 0) f = 0;
      // E(i+1, j+1) = max(E(i,j+1) - e_del, H(i,j+1) - oe_del, 0)
      int64_t en = E[j + 1] - e_del;
      int64_t t3 = h - oe_del;
      en = en > t3 ? en : t3;
      E[j + 1] = en > 0 ? en : 0;
      if (h > rb) {
        rb = h;
        rj = j + 1;  // first index with the row maximum (h > rb strict)
      }
    }
    if (row_best) row_best[i] = rb;
    if (rb > best) {
      best = rb;
      bi = i;
      bj = rj - 1;
    }
  }
  return Fwd{best, bi, bj};
}

}  // namespace

extern "C" {

// Returns via out6: [score, qb, qe, tb, te, score2].
void bwamem_ksw_align(const uint8_t* query, int64_t qlen,
                      const uint8_t* target, int64_t tlen,
                      const int8_t* mat, int64_t m, int64_t o_del,
                      int64_t e_del, int64_t o_ins, int64_t e_ins,
                      int64_t* out6) {
  out6[0] = 0;
  out6[1] = out6[2] = out6[3] = out6[4] = -1;
  out6[5] = 0;
  if (qlen == 0 || tlen == 0) {
    out6[2] = out6[4] = -1;
    return;
  }
  std::vector<int64_t> row_best(tlen);
  Fwd f = forward_local(query, qlen, target, tlen, mat, m, o_del, e_del,
                        o_ins, e_ins, row_best.data());
  if (f.best <= 0) return;
  int64_t qe = f.bj + 1, te = f.bi + 1;
  // start positions: the same pass on the reversed prefixes
  std::vector<uint8_t> qr(qe), tr(te);
  for (int64_t j = 0; j < qe; ++j) qr[j] = query[qe - 1 - j];
  for (int64_t i = 0; i < te; ++i) tr[i] = target[te - 1 - i];
  Fwd r = forward_local(qr.data(), qe, tr.data(), te, mat, m, o_del,
                        e_del, o_ins, e_ins, nullptr);
  out6[0] = f.best;
  out6[1] = qe - (r.bj + 1);
  out6[2] = qe;
  out6[3] = te - (r.bi + 1);
  out6[4] = te;
  // second best: best row score at least half a query away from te_i
  int64_t half = qlen / 2 > 1 ? qlen / 2 : 1;
  int64_t s2 = 0;
  for (int64_t i = 0; i < tlen; ++i) {
    int64_t d = i - f.bi;
    if (d < 0) d = -d;
    if (d >= half && row_best[i] > s2) s2 = row_best[i];
  }
  out6[5] = s2;
}

}  // extern "C"
