"""Batched SMEM search must equal the scalar golden twin exactly."""

import numpy as np
import pytest

from bwamem_tpu.index.build import build_index
from bwamem_tpu.index.fmindex import collect_smems, smem1
from bwamem_tpu.index.occ_packed import pack_occ
from bwamem_tpu.index.smem_batch import collect_smems_batch, smem1_batch


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(13)
    pac = rng.integers(0, 4, 20000).astype(np.uint8)
    # plant a repeat so intervals with s > 1 occur
    pac[15000:15500] = pac[2000:2500]
    fm = build_index(pac)
    return fm, pack_occ(fm), rng


def make_reads(rng, fm, n, L=90):
    reads = []
    for i in range(n):
        pos = int(rng.integers(0, fm.l_pac - L - 5))
        r = fm.pac[pos:pos + L].astype(np.int64).copy()
        for _ in range(int(rng.integers(0, 6))):
            r[rng.integers(0, L)] = rng.integers(0, 5)  # SNPs + Ns
        if rng.random() < 0.3:
            rc = r[::-1].copy()
            rc[rc < 4] = 3 - rc[rc < 4]
            r = rc
        reads.append(r)
    return reads


def ivs(mems):
    return [(m.qb, m.qe, m.x0, m.x1, m.s) for m in mems]


@pytest.mark.parametrize("seed", range(4))
def test_smem1_batch_matches_scalar(world, seed):
    fm, po, _ = world
    rng = np.random.default_rng(100 + seed)
    reads = make_reads(rng, fm, 16)
    L = max(len(r) for r in reads)
    q = np.full((len(reads), L), 4, np.int64)
    qlen = np.zeros(len(reads), np.int64)
    for b, r in enumerate(reads):
        q[b, :len(r)] = r
        qlen[b] = len(r)
    x = rng.integers(0, qlen)
    mi = np.ones(len(reads), np.int64)
    nx, got = smem1_batch(po, fm, q, qlen, x.astype(np.int64), mi)
    for b, r in enumerate(reads):
        if r[x[b]] > 3:
            assert nx[b] == x[b] + 1 and got[b] == []
            continue
        wx, want = smem1(fm, r, int(x[b]))
        assert nx[b] == wx, b
        assert ivs(got[b]) == ivs(want), b


@pytest.mark.parametrize("seed", range(3))
def test_collect_batch_matches_scalar(world, seed):
    fm, po, _ = world
    rng = np.random.default_rng(200 + seed)
    reads = make_reads(rng, fm, 12)
    got = collect_smems_batch(po, fm, reads, 19, 28, 10)
    for b, r in enumerate(reads):
        want = collect_smems(fm, r, 19, 28, 10)
        assert ivs(got[b]) == ivs(want), b


def test_repeat_read_with_reseed(world):
    fm, po, _ = world
    # read inside the planted repeat: s==2 intervals + re-seeding path
    r = fm.pac[2100:2200].astype(np.int64)
    got = collect_smems_batch(po, fm, [r], 19, 28, 10)[0]
    want = collect_smems(fm, r, 19, 28, 10)
    assert ivs(got) == ivs(want)
    assert any(m.s >= 2 for m in got)


def test_min_intv_per_read(world):
    fm, po, _ = world
    r = fm.pac[2100:2160].astype(np.int64)
    L = len(r)
    q = r[None, :].repeat(2, axis=0)
    qlen = np.full(2, L, np.int64)
    x = np.full(2, 30, np.int64)
    mi = np.array([1, 3], np.int64)
    _, got = smem1_batch(po, fm, q, qlen, x, mi)
    _, w1 = smem1(fm, r, 30, 1)
    _, w3 = smem1(fm, r, 30, 3)
    assert ivs(got[0]) == ivs(w1)
    assert ivs(got[1]) == ivs(w3)


def test_chain_reads_batch_matches_scalar(world):
    from bwamem_tpu.config import MemOptions
    from bwamem_tpu.pipeline.chain import chain_read, chain_reads_batch

    fm, po, _ = world
    opt = MemOptions()
    rng = np.random.default_rng(555)
    reads = make_reads(rng, fm, 10)
    got = chain_reads_batch(fm, po, reads, opt)
    for b, r in enumerate(reads):
        want = chain_read(fm, r, opt)
        g = [(c.pos, [(s.rbeg, s.qbeg, s.len) for s in c.seeds])
             for c in got[b]]
        w = [(c.pos, [(s.rbeg, s.qbeg, s.len) for s in c.seeds])
             for c in want]
        assert g == w, b


def test_native_seeding_matches_python(world):
    from bwamem_tpu.config import MemOptions
    from bwamem_tpu.pipeline.chain import (
        collect_seeds_batch,
        collect_seeds_native,
    )

    fm, po, _ = world
    opt = MemOptions()
    rng = np.random.default_rng(808)
    reads = make_reads(rng, fm, 16)
    # include the repeat region (s>1 intervals + reseeding) and an N read
    reads.append(fm.pac[2100:2200].astype(np.int64))
    nr = fm.pac[300:400].astype(np.int64).copy()
    nr[::17] = 4
    reads.append(nr)
    native = collect_seeds_native(fm, po, reads, opt)
    assert native is not None, "native lib unavailable"
    python = collect_seeds_batch(fm, po, reads, opt)
    for b in range(len(reads)):
        g = [(s.rbeg, s.qbeg, s.len) for s in native[b]]
        w = [(s.rbeg, s.qbeg, s.len) for s in python[b]]
        assert g == w, b
