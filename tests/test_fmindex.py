"""FM-index golden tests: construction, rank, bi-intervals, SMEMs, SA lookup.

Everything is validated against brute-force string search over the
two-strand text, independent of the FM-index machinery.
"""

import numpy as np
import pytest

from bwamem_tpu.index.build import FMIndex, build_index, revcomp_codes, suffix_array
from bwamem_tpu.index.fmindex import (
    BiInterval,
    collect_smems,
    extend_backward,
    extend_forward,
    interval_of_char,
    sa_positions,
    smem1,
)


def brute_occurrences(text: np.ndarray, pat: np.ndarray) -> list[int]:
    m = len(pat)
    if m == 0 or m > len(text):
        return []
    wins = np.lib.stride_tricks.sliding_window_view(text, m)
    return list(np.nonzero((wins == pat).all(axis=1))[0])


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(123)
    pac = rng.integers(0, 4, 400).astype(np.uint8)
    fm = build_index(pac, sa_intv=4)
    text = np.concatenate([pac, revcomp_codes(pac)])
    return fm, text


def test_suffix_array_correct():
    rng = np.random.default_rng(5)
    s = rng.integers(0, 4, 200).astype(np.uint8)
    sa = suffix_array(s)
    sufs = sorted(range(len(s)), key=lambda i: tuple(s[i:]))
    assert list(sa) == sufs


def test_sais_bwt_direct_matches_int64_path():
    """The packed 40-bit direct-BWT builder (bwamem_sais_bwt_u8, the
    GRCh38-scale memory-bounded path) == the int64-SA construction,
    for bwt, ssa and primary, across sizes and N-bearing texts."""
    from bwamem_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    for n, nfrac in ((1, 0.0), (37, 0.0), (1000, 0.1), (20000, 0.02)):
        pac = rng.integers(0, 4, n).astype(np.uint8)
        pac[rng.random(n) < nfrac] = 4
        text = np.concatenate([pac, revcomp_codes(pac)])
        n2 = len(text)
        got = native.sais_bwt_u8(text, 8)
        assert got is not None
        bwt, ssa, primary = got
        sa = suffix_array(text)
        sa_full = np.concatenate([[n2], sa]).astype(np.int64)
        want_primary = int(np.nonzero(sa_full == 0)[0][0])
        want_bwt = text[np.maximum(sa_full - 1, 0)]
        want_bwt[want_primary] = 5
        assert primary == want_primary, n
        assert np.array_equal(bwt, want_bwt), n
        assert np.array_equal(ssa, sa_full[::8]), n


def test_rank_matches_direct(small_index):
    fm, _ = small_index
    rng = np.random.default_rng(0)
    for _ in range(50):
        c = int(rng.integers(0, 4))
        i = int(rng.integers(0, fm.seq_len2 + 2))
        assert fm.rank(c, i) == int(np.count_nonzero(fm.bwt[:i] == c))


def test_sa_value_all_rows(small_index):
    fm, text = small_index
    n2 = fm.seq_len2
    sa = suffix_array(text)
    sa_full = np.concatenate([[n2], sa])
    for r in range(0, n2 + 1, 7):
        assert fm.sa_value(r) == sa_full[r], f"row {r}"


def test_single_char_intervals(small_index):
    fm, text = small_index
    for c in range(4):
        ik = interval_of_char(fm, c)
        assert ik.s == int(np.count_nonzero(text == c))
        # every row in the interval starts with c
        positions = sorted(fm.sa_value(r) for r in range(ik.x0, ik.x0 + ik.s))
        assert all(text[p] == c for p in positions)


def _check_pattern_interval(fm, text, pat, ik):
    """ik must be exactly the SA interval of pat, with x1 = interval of rc."""
    occ = brute_occurrences(text, pat)
    assert ik.s == len(occ)
    if ik.s:
        got = sorted(fm.sa_value(r) for r in range(ik.x0, ik.x0 + ik.s))
        assert got == occ
        rc = revcomp_codes(pat)
        occ_rc = brute_occurrences(text, rc)
        got_rc = sorted(fm.sa_value(r) for r in range(ik.x1, ik.x1 + ik.s))
        assert got_rc == occ_rc


@pytest.mark.parametrize("seed", range(8))
def test_backward_extension_intervals(small_index, seed):
    fm, text = small_index
    rng = np.random.default_rng(seed)
    # random substring of the text => non-empty interval; extend backward
    start = int(rng.integers(0, len(text) - 20))
    ln = int(rng.integers(1, 12))
    pat = text[start:start + ln].copy()
    ik = interval_of_char(fm, int(pat[-1]))
    for j in range(ln - 2, -1, -1):
        ik = extend_backward(fm, ik)[int(pat[j])]
    _check_pattern_interval(fm, text, pat, ik)
    # one more backward extension with each char
    for c in range(4):
        ext = extend_backward(fm, ik)[c]
        _check_pattern_interval(fm, text, np.concatenate([[c], pat]), ext)


@pytest.mark.parametrize("seed", range(8))
def test_forward_extension_intervals(small_index, seed):
    fm, text = small_index
    rng = np.random.default_rng(100 + seed)
    start = int(rng.integers(0, len(text) - 20))
    ln = int(rng.integers(1, 12))
    pat = text[start:start + ln].copy()
    ik = interval_of_char(fm, int(pat[0]))
    for j in range(1, ln):
        ik = extend_forward(fm, ik)[int(pat[j])]
    _check_pattern_interval(fm, text, pat, ik)
    for c in range(4):
        ext = extend_forward(fm, ik)[c]
        _check_pattern_interval(fm, text, np.concatenate([pat, [c]]), ext)


def brute_smems_through(text, q, x):
    """All maximal exact matches of q covering position x (min_intv=1)."""
    n = len(q)
    out = set()
    for qb in range(0, x + 1):
        for qe in range(x + 1, n + 1):
            if np.any(q[qb:qe] > 3):
                continue
            if not brute_occurrences(text, q[qb:qe]):
                continue
            left_ext = (qb > 0 and q[qb - 1] < 4
                        and bool(brute_occurrences(text, q[qb - 1:qe])))
            right_ext = (qe < n and q[qe] < 4
                         and bool(brute_occurrences(text, q[qb:qe + 1])))
            if not left_ext and not right_ext:
                out.add((qb, qe))
    return out


@pytest.mark.parametrize("seed", range(6))
def test_smem1_matches_bruteforce(small_index, seed):
    fm, text = small_index
    rng = np.random.default_rng(200 + seed)
    # read = mutated substring of the forward strand
    start = int(rng.integers(0, fm.l_pac - 60))
    q = fm.pac[start:start + 50].copy().astype(np.int64)
    for _ in range(rng.integers(1, 5)):
        q[rng.integers(0, len(q))] = rng.integers(0, 4)
    x = int(rng.integers(0, len(q)))
    if q[x] > 3:
        return
    _, mems = smem1(fm, q, x)
    got = {(m.qb, m.qe) for m in mems}
    want = brute_smems_through(text, q, x)
    assert got == want, f"x={x} got={sorted(got)} want={sorted(want)}"
    # intervals themselves must be exact
    for m in mems:
        _check_pattern_interval(fm, text, q[m.qb:m.qe], m)


def test_smem_n_bases_split(small_index):
    fm, text = small_index
    q = fm.pac[10:40].copy().astype(np.int64)
    q[15] = 4  # N in the middle
    _, mems_l = smem1(fm, q, 5)
    assert all(m.qe <= 15 for m in mems_l)
    _, mems_r = smem1(fm, q, 20)
    assert all(m.qb >= 16 for m in mems_r)


def test_collect_smems_covers_read(small_index):
    fm, text = small_index
    rng = np.random.default_rng(9)
    start = 100
    q = fm.pac[start:start + 80].copy().astype(np.int64)
    q[40] = (q[40] + 1) % 4  # one SNP splits the exact match
    mems = collect_smems(fm, q, min_seed_len=19, split_len=28, split_width=10)
    assert mems, "expected seeds"
    spans = [(m.qb, m.qe) for m in mems]
    assert spans == sorted(spans)
    for m in mems:
        assert m.qlen >= 19
        _check_pattern_interval(fm, text, q[m.qb:m.qe], m)
    # the two flanks of the SNP must both be seeded
    assert any(m.qe <= 41 for m in mems)
    assert any(m.qb >= 40 for m in mems)


def test_sa_positions_subsampling(small_index):
    fm, text = small_index
    # a 1-char pattern has many occurrences; max_occ subsampling kicks in
    ik = interval_of_char(fm, 0)
    pos = sa_positions(fm, ik, max_occ=10)
    assert len(pos) == 10
    step = ik.s // 10
    for k, (rb, row) in enumerate(pos):
        assert row == ik.x0 + k * step
        assert text[rb] == 0
