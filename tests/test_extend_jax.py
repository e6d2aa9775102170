"""Equivalence fuzzing: batched JAX extension twin vs scalar golden ref."""

import numpy as np
import pytest
import jax.numpy as jnp

from bwamem_tpu.config import MemOptions
from bwamem_tpu.ops.extend_ref import ksw_extend, ksw_extend_core
from bwamem_tpu.ops.extend_jax import (
    ExtendParams,
    extend_batch,
    extend_batch_core,
)

OPT = MemOptions()
MAT = OPT.mat

QMAX = 64
TMAX = 128


def make_params(o_del=6, e_del=1, o_ins=6, e_ins=1, zdrop=0):
    return ExtendParams(
        mat_flat=jnp.asarray(MAT.astype(np.int32).ravel()),
        m=5, o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins, zdrop=zdrop,
    )


def random_batch(rng, B, qmax=QMAX - 4, tmax=TMAX - 8, qpad=None, tpad=None):
    """Batch of related query/target pairs with mutations and indels."""
    query = np.zeros((B, qpad or QMAX), np.int32)
    target = np.zeros((B, tpad or TMAX), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    h0 = np.zeros(B, np.int32)
    for b in range(B):
        ql = rng.integers(1, qmax + 1)
        q = rng.integers(0, 4, ql)
        t = q.copy()
        for _ in range(rng.integers(0, max(1, ql // 5) + 1)):
            p = rng.integers(0, len(t))
            t[p] = rng.integers(0, 5)  # includes N
        for _ in range(rng.integers(0, 3)):
            p = rng.integers(0, len(t) + 1)
            if rng.random() < 0.5 and len(t) > 1:
                t = np.delete(t, min(p, len(t) - 1))
            else:
                t = np.insert(t, p, rng.integers(0, 4))
        t = np.concatenate([t, rng.integers(0, 4, rng.integers(0, 20))])
        t = t[:tmax]
        if len(t) == 0:
            t = rng.integers(0, 4, 1)
        query[b, :ql] = q
        target[b, : len(t)] = t
        qlen[b] = ql
        tlen[b] = len(t)
        h0[b] = rng.integers(1, 80)
    return query, qlen, target, tlen, h0


def check_equal(out, refs, aw, fields=("score", "qle", "tle", "gtle", "gscore", "max_off")):
    got = {f: np.asarray(getattr(out, f)) for f in fields}
    for b, r in enumerate(refs):
        for f in fields:
            assert got[f][b] == getattr(r, f), (
                f"task {b} field {f}: jax={got[f][b]} ref={getattr(r, f)} "
                f"(aw={aw[b]}) ref={r}"
            )


@pytest.mark.parametrize("seed,band", [(s, b) for s in range(6)
                                       for b in ("wide", "narrow", "tiny", "mixed")])
def test_core_matches_ref(seed, band):
    rng = np.random.default_rng(seed * 17 + hash(band) % 1000)
    B = 24
    query, qlen, target, tlen, h0 = random_batch(rng, B)
    if band == "wide":
        aw = np.full(B, 100, np.int32)
    elif band == "narrow":
        aw = np.full(B, 8, np.int32)
    elif band == "tiny":
        aw = rng.integers(0, 4, B).astype(np.int32)
    else:
        aw = rng.integers(0, 101, B).astype(np.int32)
    params = make_params()
    out = extend_batch_core(
        jnp.asarray(query), jnp.asarray(qlen), jnp.asarray(target),
        jnp.asarray(tlen), jnp.asarray(aw), jnp.asarray(h0), params)
    refs = [
        ksw_extend_core(query[b, :qlen[b]], target[b, :tlen[b]], MAT,
                        6, 1, 6, 1, w=int(aw[b]), h0=int(h0[b]))
        for b in range(B)
    ]
    check_equal(out, refs, aw)


@pytest.mark.parametrize("seed", range(4))
def test_core_matches_ref_zdrop(seed):
    rng = np.random.default_rng(900 + seed)
    B = 16
    query, qlen, target, tlen, h0 = random_batch(rng, B)
    aw = rng.integers(2, 50, B).astype(np.int32)
    params = make_params(zdrop=15)
    out = extend_batch_core(
        jnp.asarray(query), jnp.asarray(qlen), jnp.asarray(target),
        jnp.asarray(tlen), jnp.asarray(aw), jnp.asarray(h0), params)
    refs = [
        ksw_extend_core(query[b, :qlen[b]], target[b, :tlen[b]], MAT,
                        6, 1, 6, 1, w=int(aw[b]), h0=int(h0[b]), zdrop=15)
        for b in range(B)
    ]
    check_equal(out, refs, aw)


@pytest.mark.parametrize("seed", range(3))
def test_core_asymmetric_penalties(seed):
    rng = np.random.default_rng(500 + seed)
    B = 16
    query, qlen, target, tlen, h0 = random_batch(rng, B)
    aw = rng.integers(1, 40, B).astype(np.int32)
    o_del, e_del, o_ins, e_ins = 5, 2, 7, 1
    params = make_params(o_del, e_del, o_ins, e_ins)
    out = extend_batch_core(
        jnp.asarray(query), jnp.asarray(qlen), jnp.asarray(target),
        jnp.asarray(tlen), jnp.asarray(aw), jnp.asarray(h0), params)
    refs = [
        ksw_extend_core(query[b, :qlen[b]], target[b, :tlen[b]], MAT,
                        o_del, e_del, o_ins, e_ins, w=int(aw[b]), h0=int(h0[b]))
        for b in range(B)
    ]
    check_equal(out, refs, aw)


@pytest.mark.parametrize("seed", range(3))
def test_band_doubling_matches_ref(seed):
    rng = np.random.default_rng(300 + seed)
    B = 16
    query, qlen, target, tlen, h0 = random_batch(rng, B)
    w = np.full(B, 6, np.int32)  # small w so doubling actually triggers
    max_ins = np.zeros(B, np.int32)
    max_del = np.zeros(B, np.int32)
    for b in range(B):
        mx = int(MAT.max())
        max_ins[b] = max(int((qlen[b] * mx - 6) / 1 + 1.0), 1)
        max_del[b] = max(int((qlen[b] * mx - 6) / 1 + 1.0), 1)
    params = make_params()
    out = extend_batch(
        jnp.asarray(query), jnp.asarray(qlen), jnp.asarray(target),
        jnp.asarray(tlen), jnp.asarray(w), jnp.asarray(h0),
        jnp.asarray(max_ins), jnp.asarray(max_del), params)
    refs = [
        ksw_extend(query[b, :qlen[b]], target[b, :tlen[b]], MAT,
                   6, 1, 6, 1, w=6, h0=int(h0[b]),
                   max_ins=int(max_ins[b]), max_del=int(max_del[b]))
        for b in range(B)
    ]
    check_equal(out, refs, w,
                fields=("score", "qle", "tle", "gtle", "gscore", "max_off",
                        "w_used"))


def test_padding_tasks_are_inert():
    params = make_params()
    query = jnp.zeros((4, QMAX), jnp.int32)
    target = jnp.zeros((4, TMAX), jnp.int32)
    qlen = jnp.array([0, 5, 0, 3], jnp.int32)
    tlen = jnp.array([5, 0, 0, 3], jnp.int32)
    h0 = jnp.array([10, 10, 10, 0], jnp.int32)
    aw = jnp.full((4,), 10, jnp.int32)
    out = extend_batch_core(query, qlen, target, tlen, aw, h0, params)
    assert np.all(np.asarray(out.qle) == 0)
    assert np.all(np.asarray(out.gscore) == -1)
