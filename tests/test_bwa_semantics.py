"""Property tests pinning the bwa-0.7.8 semantics that cannot be
golden-diffed in this environment (no bwa binary or source exists in
the image — verified by filesystem search both rounds).

Every reconstructed rule is listed in PARITY.md's "Deviations" section;
these tests pin the implemented behavior so a regression (or a future
fix against a real bwa) is visible."""

import numpy as np

from bwamem_tpu.config import MemOptions
from bwamem_tpu.pipeline.align import Region, sort_and_dedup
from bwamem_tpu.pipeline.pair import (
    MIN_RATIO,
    PEStat,
    cal_sub,
    infer_isize,
    mem_pair,
)

OPT = MemOptions()


def R(rb, re, qb, qe, score, **kw):
    return Region(rb=rb, re=re, qb=qb, qe=qe, score=score, **kw)


class TestSortAndDedup:
    def test_exact_duplicates_dropped(self):
        regs = [R(100, 200, 0, 100, 80), R(100, 200, 0, 100, 80),
                R(300, 400, 0, 100, 70)]
        out = sort_and_dedup(OPT, regs)
        assert len(out) == 2

    def test_redundant_subregion_dropped(self):
        """A region whose reference span is >= 95% covered by a
        higher-scoring region is redundant (the MASK_LEVEL_REDUN
        reconstruction — bwa-0.7.10+ has the explicit rule; 0.7.8's
        introsort dedup keeps only exact duplicates)."""
        regs = [R(100, 300, 0, 100, 90), R(105, 300, 5, 100, 60)]
        out = sort_and_dedup(OPT, regs)
        assert len(out) == 1 and out[0].score == 90

    def test_low_overlap_kept(self):
        regs = [R(100, 300, 0, 100, 90), R(250, 450, 0, 100, 60)]
        out = sort_and_dedup(OPT, regs)
        assert len(out) == 2

    def test_final_order_is_score_desc(self):
        """bwa ends with ks_introsort(mem_ars): a[0] must be the best
        hit (mem_pestat reads regs[i][0])."""
        regs = [R(500, 600, 0, 100, 40), R(100, 200, 0, 100, 90),
                R(300, 400, 0, 100, 70)]
        out = sort_and_dedup(OPT, regs)
        assert [r.score for r in out] == [90, 70, 40]


class TestPestatConfidence:
    """mem_pestat's repeat filter is bwa's cal_sub: skip a pair when the
    best hit of either end has an overlapping competitor scoring more
    than MIN_RATIO (0.8) of it."""

    def _pairs(self, sub_score):
        l_pac = 1 << 20
        pairs = []
        for i in range(20):
            rb1 = 1000 + 500 * i
            r1 = [R(rb1, rb1 + 100, 0, 100, 100)]
            if sub_score is not None:
                r1.append(R(rb1 + 9000, rb1 + 9100, 0, 100, sub_score))
            # mate on the reverse strand, FR orientation, isize ~300
            rb2 = (l_pac << 1) - (rb1 + 300)
            r2 = [R(rb2, rb2 + 100, 0, 100, 100)]
            pairs.append((r1, r2))
        return l_pac, pairs

    def test_unique_pairs_counted(self):
        l_pac, pairs = self._pairs(None)
        pes = infer_isize(OPT, l_pac, pairs)
        assert any(not p.failed for p in pes)

    def test_repetitive_pairs_excluded(self):
        l_pac, pairs = self._pairs(90)  # 90 > 0.8 * 100 -> repeat
        pes = infer_isize(OPT, l_pac, pairs)
        assert all(p.failed for p in pes)

    def test_weak_secondary_ok(self):
        l_pac, pairs = self._pairs(50)  # 50 < 0.8 * 100 -> confident
        pes = infer_isize(OPT, l_pac, pairs)
        assert any(not p.failed for p in pes)

    def test_cal_sub_overlap_rule(self):
        regs = [R(0, 100, 0, 100, 100), R(5000, 5100, 0, 100, 77)]
        assert cal_sub(OPT, regs) == 77  # full query overlap
        regs = [R(0, 100, 0, 100, 100), R(5000, 5220, 60, 220, 77)]
        # overlap 40 < 0.5 * min_len 100: not significant -> the floor
        assert cal_sub(OPT, regs) == OPT.min_seed_len * OPT.a


class TestMemPair:
    def _pes(self):
        pes = [PEStat() for _ in range(4)]
        pes[1] = PEStat(low=100, high=600, avg=300.0, std=30.0,
                        failed=False)
        return pes

    def test_n_sub_counts_against_final_best(self):
        l_pac = 1 << 20
        pes = self._pes()
        # two read-1 candidates near each other, one mate: two pair
        # candidates with scores within tmp of each other
        r1 = [R(1000, 1100, 0, 100, 100), R(1010, 1110, 0, 100, 98)]
        rb2 = (l_pac << 1) - 1300
        r2 = [R(rb2, rb2 + 100, 0, 100, 100)]
        score, sub, n_sub, n_raw, z = mem_pair(OPT, l_pac, pes, (r1, r2))
        assert z is not None and score > 0
        assert n_raw == 2
        # tmp = max(a+b, o_del+e_del, o_ins+e_ins) = 7 at defaults;
        # the runner-up is within 7 of the best -> n_sub == 1
        assert n_sub == 1
        assert sub > 0  # second-best score, not -1

    def test_no_candidates(self):
        l_pac = 1 << 20
        score, sub, n_sub, n_raw, z = mem_pair(
            OPT, l_pac, [PEStat()] * 4, ([], []))
        assert (score, sub, n_sub, z) == (0, 0, 0, None)
