"""Pallas TPU kernel for the banded seed extension — the production path.

This is the TPU-native replacement for the reference's entire compute
stack: the 80 processing elements (sw_pe_array.v:1133-1511), their
one-cell-per-cycle DP pipelines (sw_pe_array_sw_extend.v:144-148), and
the task_parse/receive_match stream plumbing.  One kernel invocation
processes a whole batch:

  grid     = task blocks (BLK_B tasks each — the "PE array" dimension)
  sublanes = tasks within a block
  lanes    = query columns (the whole adaptive band of a row at once)

Per grid step the kernel runs the full row loop for its BLK_B tasks with
all query columns vectorized; the serial F recurrence is a log-depth
Hillis-Steele prefix-max over P[k] = G[k] + e_ins*k.  Semantics are
bit-identical to ops/extend_ref.ksw_extend_core (bwa-0.7.8), including
adaptive band clamping, zero-run band trimming, the M/H split,
row-max==0 break, gscore/max_ie tracking and optional zdrop.

Restriction: the substitution matrix must be bwa-style (+a match,
-b mismatch, -1 vs N) — exactly what the reference FPGA hardcodes
(sw_pe_array_sw_extend.v:1915-1940).  Arbitrary matrices use the
extend_jax twin.

The per-block scalar prefetch `tmax` (max target length per block) sets
each block's row-loop trip count, so buckets of short tasks finish early
— the reference handles task-length divergence with MIMD PEs; we handle
it by sorting tasks into length buckets at packing time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bwamem_tpu.ops.extend_jax import ExtendOut, ExtendParams

NEG = -(1 << 29)
BIG = 1 << 29


def _shift_right(x, k, fill, jidx):
    """x[j] <- x[j-k] with `fill` in the first k lanes."""
    return jnp.where(jidx < k, fill, pltpu.roll(x, k, axis=1))


def _prefix_max(x, jidx, qmax):
    """Inclusive prefix max along lanes (Hillis-Steele, log2(qmax) steps)."""
    k = 1
    while k < qmax:
        x = jnp.maximum(x, _shift_right(x, k, NEG, jidx))
        k *= 2
    return x


def _extend_kernel(tmax_ref, query_ref, target_ref, scal_ref, out_ref, *,
                   qmax, a, b, o_del, e_del, o_ins, e_ins, zdrop):
    g = pl.program_id(0)
    blk_b = query_ref.shape[0]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    query = query_ref[:, :]                       # (BLK_B, QMAX)
    qlen = scal_ref[:, 0:1]                       # (BLK_B, 1)
    tlen = scal_ref[:, 1:2]
    aw = scal_ref[:, 2:3]
    h0 = scal_ref[:, 3:4]

    jidx = jax.lax.broadcasted_iota(jnp.int32, (blk_b, qmax), 1)

    # first virtual row: eh[0].h = h0, eh[j].h = max(h0-oe_ins-(j-1)*e_ins, 0)
    init_h = jnp.where(
        jidx == 0, h0,
        jnp.where(jidx <= qlen,
                  jnp.maximum(h0 - oe_ins - (jidx - 1) * e_ins, 0), 0))
    init_e = jnp.zeros((blk_b, qmax), jnp.int32)

    # Mosaic cannot carry i1 vectors through scf.while -> done is int32
    valid = (qlen > 0) & (tlen > 0) & (h0 > 0)
    done0 = 1 - valid.astype(jnp.int32)

    def row(c):
        (i, tgt_rot, eh_h, eh_e, beg0, end0, done, best, max_i, max_jv,
         max_ie, gscore, max_off) = c
        active = (done == 0) & (i < tlen)

        # adaptive band clamp
        beg = jnp.maximum(beg0, i - aw)
        end = jnp.minimum(jnp.minimum(end0, i + aw + 1), qlen)
        h1_first = jnp.where(
            beg == 0, jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0)

        # current target symbol: lane 0 of the rolled copy (Mosaic forbids
        # dynamic lane slicing; a static slice + per-row roll is cheap)
        t_col = tgt_rot[:, 0:1]                   # (BLK_B, 1)
        s = jnp.where((query > 3) | (t_col > 3), -1,
                      jnp.where(query == t_col, a, -b))

        in_band = (jidx >= beg) & (jidx < end)
        M = jnp.where(eh_h != 0, eh_h + s, 0)
        M = jnp.where(in_band, M, 0)
        E_b = jnp.where(in_band, eh_e, 0)

        G = jnp.maximum(M - oe_ins, 0)
        Pk = jnp.where(in_band, G + e_ins * jidx, NEG)
        S = _prefix_max(Pk, jidx, qmax)
        Sm1 = _shift_right(S, 1, NEG, jidx)
        F = jnp.maximum(Sm1 - e_ins * (jidx - 1), 0)
        F = jnp.where(jidx == beg, 0, F)

        H = jnp.maximum(jnp.maximum(M, E_b), F)
        H = jnp.where(in_band, H, 0)

        row_max = jnp.max(H, axis=1, keepdims=True)
        is_max = in_band & (H == row_max)
        mj = jnp.max(jnp.where(is_max, jidx, -1), axis=1, keepdims=True)
        h1_last = jnp.max(jnp.where(jidx == end - 1, H, NEG),
                          axis=1, keepdims=True)
        h1_last = jnp.where(end > beg, h1_last, h1_first)

        # eh writeback on [beg, end] (stale values outside are semantics)
        Hsh = _shift_right(H, 1, 0, jidx)
        Hsh = jnp.where(jidx == beg, h1_first, Hsh)
        wb = (jidx >= beg) & (jidx <= end) & active
        new_eh_h = jnp.where(wb, Hsh, eh_h)
        Enew = jnp.maximum(E_b - e_del, jnp.maximum(M - oe_del, 0))
        Enew = jnp.where(jidx == end, 0, Enew)
        new_eh_e = jnp.where(wb, Enew, eh_e)

        # gscore / max_ie at the query boundary
        at_qend = active & (end == qlen)
        upd_ie = at_qend & jnp.logical_not(gscore > h1_last)
        max_ie = jnp.where(upd_ie, i, max_ie)
        gscore = jnp.where(at_qend, jnp.maximum(gscore, h1_last), gscore)

        break_zero = active & (row_max == 0)
        improved = active & (row_max > best)
        best = jnp.where(improved, row_max, best)
        new_max_i = jnp.where(improved, i, max_i)
        new_max_j = jnp.where(improved, mj, max_jv)
        max_off = jnp.where(
            improved, jnp.maximum(max_off, jnp.abs(mj - i)), max_off)

        if zdrop > 0:
            di = i - max_i
            dj = mj - max_jv
            pen = jnp.where(di > dj, (di - dj) * e_del, (dj - di) * e_ins)
            break_z = active & (~break_zero) & (~improved) & (
                best - row_max - pen > zdrop)
        else:
            break_z = jnp.zeros_like(break_zero)

        done = jnp.maximum(
            done, (break_zero | break_z | (i + 1 >= tlen)).astype(jnp.int32))

        # zero-run band trimming on the updated eh
        nz = (new_eh_h != 0) | (new_eh_e != 0)
        scan = (jidx >= beg) & (jidx < end) & nz
        first_nz = jnp.min(jnp.where(scan, jidx, BIG), axis=1, keepdims=True)
        new_beg = jnp.minimum(first_nz, end)
        last_in = jnp.max(jnp.where(scan, jidx, beg - 1), axis=1, keepdims=True)
        last_nz = jnp.maximum(last_in, jnp.where(h1_last != 0, end, beg - 1))
        new_end = jnp.minimum(last_nz + 2, qlen)

        sel = lambda x, y: jnp.where(active, x, y)
        # roll left by 1 == roll right by TMAX-1 (pltpu.roll needs shift>=0)
        return (i + 1, pltpu.roll(tgt_rot, tgt_rot.shape[1] - 1, axis=1),
                new_eh_h, new_eh_e, sel(new_beg, beg0), sel(new_end, end0),
                done, best, new_max_i, new_max_j, max_ie, gscore, max_off)

    z1 = jnp.zeros((blk_b, 1), jnp.int32)
    m1 = jnp.full((blk_b, 1), -1, jnp.int32)
    carry = (jnp.int32(0), target_ref[:, :], init_h, init_e, z1, qlen,
             done0, h0, m1, m1, m1, m1, z1)
    tmax = tmax_ref[g]

    def cond(c):
        return (c[0] < tmax) & (jnp.min(c[6]) == 0)

    carry = jax.lax.while_loop(cond, row, carry)
    (_, _, _, _, _, _, _, best, max_i, max_jv, max_ie, gscore,
     max_off) = carry

    out_ref[:, :] = jnp.concatenate(
        [best, max_jv + 1, max_i + 1, max_ie + 1, gscore, max_off, aw, z1],
        axis=1)


def extend_batch_raw(query, target, scal, tmax, params: ExtendParams, *,
                     blk_b: int = 256, interpret: bool = False):
    """The bare kernel invocation: returns the (B, 8) result matrix
    [score, qle, tle, gtle, gscore, max_off, aw, 0].

    `scal` is the (B, 8) int32 per-task scalar block [qlen, tlen, aw, h0,
    0...]; `tmax` the (B//blk_b,) per-block row bound.  Keeping packing on
    the host makes the jitted program essentially just the pallas_call —
    important here because the axon remote XLA compile is pathologically
    slow for composite programs while Mosaic kernels compile in seconds.
    """
    B, qmax = query.shape
    assert B % blk_b == 0, (B, blk_b)
    grid = B // blk_b
    mat = np.asarray(params.mat_flat).reshape(params.m, params.m)
    a = int(mat[0, 0])
    b = -int(mat[0, 1])

    kernel = functools.partial(
        _extend_kernel, qmax=qmax, a=a, b=b,
        o_del=params.o_del, e_del=params.e_del,
        o_ins=params.o_ins, e_ins=params.e_ins, zdrop=params.zdrop)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((blk_b, qmax), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_b, target.shape[1]), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_b, 8), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk_b, 8), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8), jnp.int32),
        interpret=interpret,
    )(tmax, jnp.asarray(query, jnp.int32), jnp.asarray(target, jnp.int32),
      scal)


def pack_scal(qlen, tlen, aw, h0, blk_b: int = 256):
    """Host-side numpy packing of the scalar block + per-block tmax."""
    B = len(qlen)
    scal = np.zeros((B, 8), np.int32)
    scal[:, 0] = qlen
    scal[:, 1] = tlen
    scal[:, 2] = aw
    scal[:, 3] = h0
    grid = B // blk_b
    tl = np.asarray(tlen, np.int32).reshape(grid, blk_b)
    vq = np.asarray(qlen, np.int32).reshape(grid, blk_b)
    tmax = np.max(np.where(vq > 0, tl, 0), axis=1).astype(np.int32)
    return scal, tmax


def extend_batch_core(query, qlen, target, tlen, aw, h0,
                      params: ExtendParams, *, blk_b: int = 256,
                      interpret: bool = False) -> ExtendOut:
    """One banded extension pass (no doubling) — Pallas TPU fast path.

    Same contract as extend_jax.extend_batch_core.  B must be a multiple
    of blk_b (pad with qlen==0 tasks via pipeline.tasks.pack_tasks).
    """
    B = query.shape[0]
    grid = B // blk_b
    qlen = jnp.asarray(qlen, jnp.int32)
    tlen = jnp.asarray(tlen, jnp.int32)
    aw = jnp.asarray(aw, jnp.int32)
    h0 = jnp.asarray(h0, jnp.int32)
    scal = jnp.stack([qlen, tlen, aw, h0] + [jnp.zeros((B,), jnp.int32)] * 4,
                     axis=1)
    tl = tlen.reshape(grid, blk_b)
    vq = qlen.reshape(grid, blk_b)
    tmax = jnp.max(jnp.where(vq > 0, tl, 0), axis=1)
    out = extend_batch_raw(query, target, scal, tmax, params, blk_b=blk_b,
                           interpret=interpret)
    return ExtendOut(
        score=out[:, 0], qle=out[:, 1], tle=out[:, 2], gtle=out[:, 3],
        gscore=out[:, 4], max_off=out[:, 5], w_used=out[:, 6])


def extend_batch(query, qlen, target, tlen, w, h0, max_ins, max_del,
                 params: ExtendParams, prev_score=None,
                 max_band_try: int = 2, *, blk_b: int = 256,
                 interpret: bool = False) -> ExtendOut:
    """Full extension with inline band doubling (select-based, FPGA-style:
    sw_extend.v:1765/1963 runs the k<2 retry inside the kernel)."""
    if prev_score is None:
        prev_score = jnp.full_like(jnp.asarray(h0, jnp.int32), -1)
    out = None
    converged = None
    prev = prev_score
    for k in range(max_band_try):
        awk = jnp.minimum(jnp.minimum(jnp.asarray(w, jnp.int32) << k,
                                      max_ins), max_del)
        o = extend_batch_core(query, qlen, target, tlen, awk, h0, params,
                              blk_b=blk_b, interpret=interpret)
        o = o._replace(w_used=awk)
        conv_k = (o.score == prev) | (o.max_off < ((awk >> 1) + (awk >> 2)))
        if out is None:
            out, converged = o, conv_k
        else:
            keep = converged
            out = ExtendOut(*[jnp.where(keep, x, y) for x, y in zip(out, o)])
            converged = keep | conv_k
        prev = out.score
    return out
