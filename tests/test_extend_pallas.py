"""Pallas kernel equivalence vs the scalar golden reference.

Runs in Pallas interpret mode on CPU (the ASE-style swappable backend,
SURVEY.md §4); the same kernel compiles with Mosaic on real TPUs.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bwamem_tpu.config import MemOptions
from bwamem_tpu.ops.extend_ref import ksw_extend, ksw_extend_core
from bwamem_tpu.ops import extend_pallas
from bwamem_tpu.ops.extend_jax import ExtendParams

from test_extend_jax import make_params, random_batch, check_equal

OPT = MemOptions()
MAT = OPT.mat
QMAX = 128
TMAX = 128
BLK = 8


def pallas_core(query, qlen, target, tlen, aw, h0, params):
    return extend_pallas.extend_batch_core(
        jnp.asarray(query), jnp.asarray(qlen), jnp.asarray(target),
        jnp.asarray(tlen), jnp.asarray(aw), jnp.asarray(h0), params,
        blk_b=BLK, interpret=True)


@pytest.mark.parametrize("seed,band", [(s, b) for s in range(3)
                                       for b in ("wide", "narrow", "mixed")])
def test_pallas_matches_ref(seed, band):
    rng = np.random.default_rng(seed * 31 + hash(band) % 97)
    B = 16
    query, qlen, target, tlen, h0 = random_batch(
        rng, B, qmax=QMAX - 8, tmax=TMAX - 8, qpad=QMAX, tpad=TMAX)
    if band == "wide":
        aw = np.full(B, 100, np.int32)
    elif band == "narrow":
        aw = np.full(B, 7, np.int32)
    else:
        aw = rng.integers(0, 101, B).astype(np.int32)
    out = pallas_core(query, qlen, target, tlen, aw, h0, make_params())
    refs = [
        ksw_extend_core(query[b, :qlen[b]], target[b, :tlen[b]], MAT,
                        6, 1, 6, 1, w=int(aw[b]), h0=int(h0[b]))
        for b in range(B)
    ]
    check_equal(out, refs, aw)


def test_pallas_zdrop_matches_ref():
    rng = np.random.default_rng(77)
    B = 16
    query, qlen, target, tlen, h0 = random_batch(
        rng, B, qmax=QMAX - 8, tmax=TMAX - 8, qpad=QMAX, tpad=TMAX)
    aw = rng.integers(2, 60, B).astype(np.int32)
    out = pallas_core(query, qlen, target, tlen, aw, h0, make_params(zdrop=20))
    refs = [
        ksw_extend_core(query[b, :qlen[b]], target[b, :tlen[b]], MAT,
                        6, 1, 6, 1, w=int(aw[b]), h0=int(h0[b]), zdrop=20)
        for b in range(B)
    ]
    check_equal(out, refs, aw)


def test_pallas_band_doubling():
    rng = np.random.default_rng(5)
    B = 8
    query, qlen, target, tlen, h0 = random_batch(
        rng, B, qmax=QMAX - 8, tmax=TMAX - 8, qpad=QMAX, tpad=TMAX)
    w = np.full(B, 5, np.int32)
    mx = int(MAT.max())
    max_ins = np.maximum((qlen * mx - 6) // 1 + 1, 1).astype(np.int32)
    max_del = max_ins.copy()
    out = extend_pallas.extend_batch(
        jnp.asarray(query), jnp.asarray(qlen), jnp.asarray(target),
        jnp.asarray(tlen), jnp.asarray(w), jnp.asarray(h0),
        jnp.asarray(max_ins), jnp.asarray(max_del), make_params(),
        blk_b=BLK, interpret=True)
    refs = [
        ksw_extend(query[b, :qlen[b]], target[b, :tlen[b]], MAT,
                   6, 1, 6, 1, w=5, h0=int(h0[b]),
                   max_ins=int(max_ins[b]), max_del=int(max_del[b]))
        for b in range(B)
    ]
    check_equal(out, refs, w, fields=("score", "qle", "tle", "gtle",
                                      "gscore", "max_off", "w_used"))


def test_pallas_padding_tasks():
    params = make_params()
    B = 8
    query = np.zeros((B, QMAX), np.int32)
    target = np.zeros((B, TMAX), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    qlen[0], tlen[0] = 10, 10
    h0 = np.full(B, 5, np.int32)
    aw = np.full(B, 10, np.int32)
    out = pallas_core(query, qlen, target, tlen, aw, h0, params)
    assert int(out.score[0]) == 15  # 10 matching zeros
    assert all(int(out.qle[b]) == 0 for b in range(1, B))


def test_pallas_full_width_query():
    """qlen == QMAX exactly (lane `end` doesn't exist) — regression for the
    h1_last/eh[end] edge."""
    rng = np.random.default_rng(3)
    B = 8
    query = rng.integers(0, 4, (B, QMAX)).astype(np.int32)
    target = np.zeros((B, TMAX), np.int32)
    target[:, :QMAX] = query
    target[:, QMAX:] = rng.integers(0, 4, (B, TMAX - QMAX))
    qlen = np.full(B, QMAX, np.int32)
    tlen = np.full(B, TMAX, np.int32)
    h0 = np.full(B, 19, np.int32)
    aw = np.full(B, 100, np.int32)
    out = pallas_core(query, qlen, target, tlen, aw, h0, make_params())
    refs = [
        ksw_extend_core(query[b], target[b], MAT, 6, 1, 6, 1,
                        w=100, h0=19)
        for b in range(B)
    ]
    check_equal(out, refs, aw)


def test_pallas_reference_capacity_limits():
    """The reference hardware caps: qlen<=255/side, tlen<=2047/side
    (SURVEY.md §2.3).  The kernel must handle those extremes exactly."""
    QM, TM = 256, 2048
    rng = np.random.default_rng(9)
    B = 8
    query = rng.integers(0, 4, (B, QM)).astype(np.int32)
    target = np.zeros((B, TM), np.int32)
    target[:, :QM] = query       # query matches the target prefix
    target[:, QM:] = rng.integers(0, 4, (B, TM - QM))
    qlen = np.full(B, 255, np.int32)
    tlen = np.full(B, 2047, np.int32)
    h0 = np.full(B, 100, np.int32)
    aw = np.full(B, 100, np.int32)
    out = extend_pallas.extend_batch_core(
        jnp.asarray(query), jnp.asarray(qlen), jnp.asarray(target),
        jnp.asarray(tlen), jnp.asarray(aw), jnp.asarray(h0),
        make_params(), blk_b=BLK, interpret=True)
    refs = [ksw_extend_core(query[b, :255], target[b, :2047], MAT,
                            6, 1, 6, 1, w=100, h0=100) for b in range(B)]
    check_equal(out, refs, aw)


@pytest.mark.parametrize("pen", [(6, 1, 6, 1), (5, 2, 7, 3), (2, 1, 2, 1)])
def test_pallas_penalty_grid(pen):
    o_del, e_del, o_ins, e_ins = pen
    rng = np.random.default_rng(sum(pen))
    B = 8
    query, qlen, target, tlen, h0 = random_batch(
        rng, B, qmax=QMAX - 8, tmax=TMAX - 8, qpad=QMAX, tpad=TMAX)
    aw = rng.integers(1, 80, B).astype(np.int32)
    params = make_params(o_del, e_del, o_ins, e_ins)
    out = pallas_core(query, qlen, target, tlen, aw, h0, params)
    refs = [ksw_extend_core(query[b, :qlen[b]], target[b, :tlen[b]], MAT,
                            o_del, e_del, o_ins, e_ins,
                            w=int(aw[b]), h0=int(h0[b])) for b in range(B)]
    check_equal(out, refs, aw)
