"""Device-side SMEM search (ops/smem_jax) must equal the scalar golden
twin exactly — the jitted lockstep bwt_smem1 and the full device-backed
mem_collect_intv, fuzz-pinned against index/fmindex.collect_smems."""

import numpy as np
import pytest

from bwamem_tpu.index.build import build_index
from bwamem_tpu.index.fmindex import collect_smems, smem1
from bwamem_tpu.index.occ_packed import pack_occ
from bwamem_tpu.ops.smem_jax import (
    DeviceOcc,
    collect_smems_device,
    make_smem1_device,
)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(77)
    pac = rng.integers(0, 4, 16000).astype(np.uint8)
    pac[11000:11400] = pac[3000:3400]  # repeat: intervals with s > 1
    fm = build_index(pac)
    return fm, pack_occ(fm), rng


def make_reads(rng, fm, n, L=80):
    reads = []
    for i in range(n):
        pos = int(rng.integers(0, fm.l_pac - L - 5))
        r = fm.pac[pos:pos + L].astype(np.int64).copy()
        for _ in range(int(rng.integers(0, 6))):
            r[rng.integers(0, L)] = rng.integers(0, 5)
        if rng.random() < 0.3:
            rc = r[::-1].copy()
            rc[rc < 4] = 3 - rc[rc < 4]
            r = rc
        reads.append(r)
    return reads


def ivs(mems):
    return [(m.qb, m.qe, m.x0, m.x1, m.s) for m in mems]


@pytest.mark.parametrize("seed", range(3))
def test_smem1_device_matches_scalar(world, seed):
    from bwamem_tpu.index.fmindex import BiInterval

    fm, po, _ = world
    rng = np.random.default_rng(300 + seed)
    reads = make_reads(rng, fm, 12)
    B = len(reads)
    L = max(len(r) for r in reads)
    q = np.full((B, L), 4, np.int32)
    qlen = np.zeros(B, np.int32)
    for b, r in enumerate(reads):
        q[b, :len(r)] = r
        qlen[b] = len(r)
    x = rng.integers(0, qlen).astype(np.int32)
    mi = np.ones(B, np.int32)
    dev = make_smem1_device(DeviceOcc(po))
    ret, overflow, m_qb, m_qe, m_x0, m_x1, m_s, m_n = (
        np.asarray(o) for o in dev(q, qlen, x, mi))
    for b, r in enumerate(reads):
        if r[x[b]] > 3:
            assert ret[b] == x[b] + 1 and m_n[b] == 0
            continue
        wx, want = smem1(fm, r, int(x[b]))
        if overflow[b]:
            continue  # host fallback path, exercised in collect test
        assert ret[b] == wx, b
        got = [BiInterval(x0=int(m_x0[b, k]), x1=int(m_x1[b, k]),
                          s=int(m_s[b, k]), qb=int(m_qb[b, k]),
                          qe=int(m_qe[b, k]))
               for k in range(int(m_n[b]))][::-1]
        assert ivs(got) == ivs(want), b


@pytest.mark.parametrize("seed", range(2))
def test_collect_smems_device_matches_scalar(world, seed):
    fm, po, _ = world
    rng = np.random.default_rng(600 + seed)
    reads = make_reads(rng, fm, 10)
    got = collect_smems_device(DeviceOcc(po), fm, reads,
                               min_seed_len=15, split_len=28,
                               split_width=10)
    for b, r in enumerate(reads):
        want = collect_smems(fm, r, min_seed_len=15, split_len=28,
                             split_width=10)
        assert ivs(got[b]) == ivs(want), b
