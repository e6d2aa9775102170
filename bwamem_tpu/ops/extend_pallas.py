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

def _band_pass(target_ref, query, qlen, tlen, aw, h0, prm_ref, *, qmax,
               tmax, dt, early_exit=True, inactive=None, t_rev_from=None):
    """One banded-extension pass in the transposed layout (query columns
    on SUBLANES, tasks on LANES) — the shared row loop of the per-phase
    and fused kernels.

    `inactive` (optional (1, BLK_L) bool) marks lanes this pass must
    skip (fused-kernel retry phases); `t_rev_from` (optional (1, BLK_L))
    reads target row i as target_ref[t_rev_from - 1 - i] per lane —
    unused today (left targets arrive pre-reversed from the host).
    Returns (best, max_j, max_i, max_ie, gscore, max_off), each
    (1, BLK_L) in dt, with the same semantics as ksw_extend_core.
    """
    del t_rev_from
    assert qmax <= 1024, qmax  # packed argmax key = H*1024 + j
    blk_l = query.shape[1]
    a = prm_ref[0].astype(dt)
    b = prm_ref[1].astype(dt)
    o_del = prm_ref[2].astype(dt)
    e_del = prm_ref[3].astype(dt)
    o_ins = prm_ref[4].astype(dt)
    e_ins = prm_ref[5].astype(dt)
    zdrop = prm_ref[6].astype(dt)
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    NEG = jnp.asarray(-(1 << 14) if dt == jnp.int16 else -(1 << 29), dt)
    BIG = jnp.asarray((1 << 14) if dt == jnp.int16 else (1 << 29), dt)

    sidx32 = jax.lax.broadcasted_iota(jnp.int32, (qmax, blk_l), 0)
    sidx = sidx32.astype(dt)
    query_isN = query > 3
    # -oe_ins folded into the ramp: Pk = M + ej_oe is one add, not two
    ej_oe = (e_ins * sidx - oe_ins).astype(dt)
    ejm1 = (e_ins * (sidx - 1)).astype(dt)
    # loop-invariant fill masks for the sublane shifts: the row body
    # pays roll+select only, not the sidx<k compare (x ~200 rows)
    fill1 = sidx32 < 1
    scan_fills = []
    k = 1
    while k < qmax:
        scan_fills.append((k, sidx32 < k))
        k *= 2

    init_h = jnp.where(
        sidx == 0, h0,
        jnp.where(sidx <= qlen,
                  jnp.maximum(h0 - oe_ins - (sidx - 1) * e_ins, 0),
                  0)).astype(dt)
    init_e = jnp.zeros((qmax, blk_l), dt)

    valid = (qlen > 0) & (tlen > 0) & (h0 > 0)
    if inactive is not None:
        valid = valid & jnp.logical_not(inactive)
    done0 = 1 - valid.astype(jnp.int32)

    def rmax0(x):
        return jnp.max(x.astype(jnp.int32), axis=0, keepdims=True).astype(dt)

    def rmin0(x):
        return jnp.min(x.astype(jnp.int32), axis=0, keepdims=True).astype(dt)

    def row(c):
        (i, eh_h, eh_e, beg0, end0, done, best, max_i, max_jv,
         max_ie, gscore, max_off) = c
        iv = jnp.asarray(i, dt)
        active = (done == 0) & (iv < tlen)

        beg = jnp.maximum(beg0, iv - aw)
        end = jnp.minimum(jnp.minimum(end0, iv + aw + 1), qlen)
        h1_first = jnp.where(
            beg == 0,
            jnp.maximum(h0 - (o_del + e_del * (iv + 1)), 0), 0).astype(dt)

        # i can overshoot tmax by up to EXIT_EVERY-1 rows (blocked exit
        # check below); those rows are active-masked no-ops, but the
        # slice index must stay in bounds
        i_rd = jnp.minimum(i, target_ref.shape[0] - 1)
        t_row = target_ref[pl.ds(i_rd, 1), :].astype(dt)   # (1, BLK_L)
        s = jnp.where(query_isN | (t_row > 3), -1,
                      jnp.where(query == t_row, a, -b))

        in_band = (sidx >= beg) & (sidx < end)
        # M needs no in-band mask: Pk masks it for the F scan, H is
        # re-masked below, and Enew is only written back inside wb
        # (stale out-of-band eh rows are part of the bwa semantics
        # either way)
        M = jnp.where(eh_h != 0, eh_h + s, 0)
        # E needs no in-band mask: out-of-band lanes of H are re-masked
        # below, Enew is only written back inside wb, and the eq_end
        # column is forced to 0 regardless
        E_b = eh_e

        # F scan feed WITHOUT bwa's per-element G = max(M-oe, 0) clamp:
        # max_k(max(M[k]-oe,0)+e*k) = max(max_k(M[k]-oe+e*k), e*(j-1))
        # over the contiguous in-band prefix, and the second term
        # cancels against the -e*(j-1) in F exactly — so the clamp
        # contributes nothing after the subtraction (F has its own
        # outer max(.,0)).  Saves one (qmax, blk) op per round
        Pk = jnp.where(in_band, M + ej_oe, NEG)
        S = Pk
        for kk, fm in scan_fills:  # Hillis-Steele prefix max
            S = jnp.maximum(S, jnp.where(fm, NEG, pltpu.roll(S, kk, axis=0)))
        Sm1 = jnp.where(fill1, NEG, pltpu.roll(S, 1, axis=0))
        # F[beg] = 0 for free: S[beg-1] is NEG (Pk masked below beg),
        # so max(NEG - ejm1, 0) already lands on bwa's f=0 boundary
        F = jnp.maximum(Sm1 - ejm1, 0)

        H = jnp.maximum(jnp.maximum(M, E_b), F)
        H = jnp.where(in_band, H, 0)

        # one packed reduction yields row max AND argmax (ties -> the
        # larger j, same as the two-reduction form): H is 0 outside the
        # band and qmax <= 1024, so key = H*1024 + j is exact in int32.
        # Out-of-band keys (= j < 1024) only win when the whole band is
        # <= 0 — then row_max = 0 fires break_zero and mj is never
        # consumed (improved needs row_max > best >= h0 > 0)
        key = H.astype(jnp.int32) * 1024 + sidx32
        kmax = jnp.max(key, axis=0, keepdims=True)
        row_max = (kmax >> 10).astype(dt)
        mj = (kmax & 1023).astype(dt)
        eq_end = sidx == end
        # when beg > 0 both h1_first and the rolled-in H[beg-1] are 0,
        # so filling sublane 0 with h1_first covers the sidx==beg case
        Hsh = jnp.where(fill1, h1_first, pltpu.roll(H, 1, axis=0))
        h1_last = rmax0(jnp.where(sidx == end - 1, H, NEG))
        h1_last = jnp.where(end > beg, h1_last, h1_first)

        wb = (in_band | eq_end) & active
        new_eh_h = jnp.where(wb, Hsh, eh_h)
        Enew = jnp.maximum(E_b - e_del, jnp.maximum(M - oe_del, 0))
        Enew = jnp.where(eq_end, 0, Enew)
        new_eh_e = jnp.where(wb, Enew, eh_e)

        at_qend = active & (end == qlen)
        upd_ie = at_qend & jnp.logical_not(gscore > h1_last)
        max_ie = jnp.where(upd_ie, iv, max_ie)
        gscore = jnp.where(at_qend, jnp.maximum(gscore, h1_last), gscore)

        break_zero = active & (row_max == 0)
        improved = active & (row_max > best)
        best = jnp.where(improved, row_max, best)
        new_max_i = jnp.where(improved, iv, max_i)
        new_max_j = jnp.where(improved, mj, max_jv)
        max_off = jnp.where(
            improved, jnp.maximum(max_off, jnp.abs(mj - iv)), max_off)

        # zdrop is a runtime scalar: compute the drop test always and
        # neutralize it when zdrop <= 0 (bwa's zdrop<=0 = disabled)
        di = iv - max_i
        dj = mj - max_jv
        pen = jnp.where(di > dj, (di - dj) * e_del, (dj - di) * e_ins)
        break_z = active & (~break_zero) & (~improved) & (
            best - row_max - pen > zdrop) & (zdrop > 0)

        done = jnp.maximum(
            done, (break_zero | break_z | (iv + 1 >= tlen)).astype(jnp.int32))

        # note: dropping the left-edge zero-run trim (first_nz) is
        # semantically safe — trimmed cells are 0/0 and stay 0/0 under
        # the recurrence — but measured SLOWER (43.5-44.0 vs 44.6
        # GCUPS), so bwa's two-sided trim stays
        scan = in_band & ((new_eh_h != 0) | (new_eh_e != 0))
        first_nz = rmin0(jnp.where(scan, sidx, BIG))
        new_beg = jnp.minimum(first_nz, end)
        last_in = rmax0(jnp.where(scan, sidx, beg - 1))
        last_nz = jnp.maximum(last_in, jnp.where(h1_last != 0, end, beg - 1))
        new_end = jnp.minimum(last_nz + 2, qlen)

        sel = lambda x, y: jnp.where(active, x, y)
        return (i + 1, new_eh_h, new_eh_e, sel(new_beg, beg0),
                sel(new_end, end0), done, best, new_max_i, new_max_j,
                max_ie, gscore, max_off)

    z1 = jnp.zeros((1, blk_l), dt)
    m1 = jnp.full((1, blk_l), -1, dt)
    carry = (jnp.int32(0), init_h, init_e, z1, qlen, done0, h0,
             m1, m1, m1, m1, z1)

    if early_exit:
        # The done-vector check is a vector->scalar reduction in the
        # loop CONDITION — measured at ~44% of the whole kernel when
        # evaluated every row (all-rows workload, 104x200 tasks).  Check
        # it once per EXIT_EVERY rows instead: overshoot rows are
        # active-masked no-ops (that is already how lanes shorter than
        # the block tmax coexist), so semantics are unchanged and the
        # wasted work is < EXIT_EVERY rows per block.
        EXIT_EVERY = 8

        def cond(c):
            return (c[0] < tmax) & (jnp.min(c[5]) == 0)

        def body(c):
            return jax.lax.fori_loop(0, EXIT_EVERY, lambda _, cc: row(cc),
                                     c)

        carry = jax.lax.while_loop(cond, body, carry)
    else:
        # all-rows mode (the timed BENCH config): block 4 rows per
        # while iteration to cut loop-latch overhead; overshoot rows
        # past tmax are active-masked no-ops (same mechanism as lanes
        # shorter than the block tmax)
        def cond(c):
            return c[0] < tmax

        def body4(c):
            return jax.lax.fori_loop(0, 4, lambda _, cc: row(cc), c)

        carry = jax.lax.while_loop(cond, body4, carry)
    (_, _, _, _, _, _, best, max_i, max_jv, max_ie, gscore, max_off) = carry
    return best, max_jv, max_i, max_ie, gscore, max_off


def _extend_kernel_t(tmax_ref, prm_ref, query_ref, target_ref, scal_ref,
                     out_ref, *, qmax, dt=jnp.int32, early_exit=True):
    """Transposed layout: query columns on SUBLANES, tasks on LANES.

    This layout is the fast one on TPU because
    (a) the per-row target symbol is a dynamic SUBLANE slice
    (legal and cheap — no rolled target copy), (b) the row reductions
    (row max, argmax, h1_last, band trim) reduce along sublanes, and
    (c) the F prefix-scan shifts along sublanes.  Cross-LANE traffic —
    the expensive direction, measured at ~80% of the row-major kernel's
    runtime — is eliminated entirely from the row loop.

    Scoring parameters arrive in the scalar-prefetch block `prm_ref`
    ([a, b, o_del, e_del, o_ins, e_ins, zdrop, 0]) instead of being
    baked in at trace time — the reference takes them per batch in
    header words 0-1 (task_parse.v:1954-1955), and here one compiled
    kernel serves any MemOptions (changing -A/-B/-O/-E recompiles
    nothing).
    """
    g = pl.program_id(0)
    blk_l = query_ref.shape[1]                    # tasks per block (lanes)
    query = query_ref[:, :].astype(dt)            # (QMAX, BLK_L)
    qlen = scal_ref[0:1, :].astype(dt)            # (1, BLK_L)
    tlen = scal_ref[1:2, :].astype(dt)
    aw = scal_ref[2:3, :].astype(dt)
    h0 = scal_ref[3:4, :].astype(dt)

    best, max_jv, max_i, max_ie, gscore, max_off = _band_pass(
        target_ref, query, qlen, tlen, aw, h0, prm_ref, qmax=qmax,
        tmax=tmax_ref[g], dt=dt, early_exit=early_exit)

    z1 = jnp.zeros((1, blk_l), dt)
    out_ref[:, :] = jnp.concatenate(
        [best, max_jv + 1, max_i + 1, max_ie + 1, gscore, max_off, aw, z1],
        axis=0).astype(jnp.int32)


def _extend_kernel_fused(tmax_ref, prm_ref, ql_ref, tl_ref, qr_ref,
                         tr_ref, scal_ref, out_ref, *, qmax_l, qmax_r,
                         dt=jnp.int32, early_exit=True):
    """Whole-alignment kernel: left extension, in-kernel band-doubling
    retry, left->right h0 chaining, right extension and its retry — one
    device round trip per chunk instead of four.

    Each LANE is one (chain, seed) extension candidate carrying both its
    left task (reversed query prefix / reversed target) and right task
    (query suffix / forward target).  The four phases run as sequential
    row loops over the whole block; a retry phase costs zero iterations
    when no lane in the block needs it (early exit on the done vector).
    The reference hardware runs band doubling the same way — inside the
    PE, without a host round trip (sw_extend.v:1765/1963); the FPGA host
    only sees final results.

    scal rows: [0]=qlen_l [1]=tlen_l [2]=aw0_l [3]=h0_seed [4]=aw1_l
    [5]=qlen_r [6]=tlen_r [7]=aw0_r [8]=aw1_r [9]=w (for the retry
    threshold (w>>1)+(w>>2), bwa's aggressive_split heuristic).
    Output rows: 4 groups of 8 — [L0 | L1 | R0 | R1], each
    [score, qle, tle, gtle, gscore, max_off, aw, 0] like the per-phase
    kernel; retry groups are garbage for lanes that did not retry (the
    host replays the same convergence rule and ignores them —
    csrc/mempipe.cpp mp_pass_done semantics are preserved exactly).
    """
    g = pl.program_id(0)
    blk_l = ql_ref.shape[1]
    query_l = ql_ref[:, :].astype(dt)
    query_r = qr_ref[:, :].astype(dt)
    qlen_l = scal_ref[0:1, :].astype(dt)
    tlen_l = scal_ref[1:2, :].astype(dt)
    aw0_l = scal_ref[2:3, :].astype(dt)
    h0_seed = scal_ref[3:4, :].astype(dt)
    aw1_l = scal_ref[4:5, :].astype(dt)
    qlen_r = scal_ref[5:6, :].astype(dt)
    tlen_r = scal_ref[6:7, :].astype(dt)
    aw0_r = scal_ref[7:8, :].astype(dt)
    aw1_r = scal_ref[8:9, :].astype(dt)
    wv = scal_ref[9:10, :].astype(dt)
    thr = (wv >> 1) + (wv >> 2)

    def emit(row0, res, aw):
        best, max_jv, max_i, max_ie, gscore, max_off = res
        z1 = jnp.zeros((1, blk_l), dt)
        out_ref[row0:row0 + 8, :] = jnp.concatenate(
            [best, max_jv + 1, max_i + 1, max_ie + 1, gscore, max_off,
             aw, z1], axis=0).astype(jnp.int32)

    # L0 / L1: the in-kernel compacted-retry replacement.  Retry rule
    # matches mp_pass_done: !(max_off < (w>>1)+(w>>2)) — score==prev is
    # checked only at resolve time (both paths store both passes).
    res_l0 = _band_pass(tl_ref, query_l, qlen_l, tlen_l, aw0_l, h0_seed,
                        prm_ref, qmax=qmax_l, tmax=tmax_ref[g, 0], dt=dt,
                        early_exit=early_exit)
    emit(0, res_l0, aw0_l)
    conv_l = res_l0[5] < thr
    res_l1 = _band_pass(tl_ref, query_l, qlen_l, tlen_l, aw1_l, h0_seed,
                        prm_ref, qmax=qmax_l, tmax=tmax_ref[g, 0], dt=dt,
                        early_exit=early_exit, inactive=conv_l)
    emit(8, res_l1, aw1_l)

    # resolve(left, prev=-1): k0 iff max_off0 < thr (score==-1 is
    # impossible: best >= h0 > 0); lanes with no left task fall through
    # to h0_seed because _band_pass leaves best = h0 when invalid
    score_l = jnp.where(conv_l, res_l0[0], res_l1[0])
    h0_r = score_l

    res_r0 = _band_pass(tr_ref, query_r, qlen_r, tlen_r, aw0_r, h0_r,
                        prm_ref, qmax=qmax_r, tmax=tmax_ref[g, 1], dt=dt,
                        early_exit=early_exit)
    emit(16, res_r0, aw0_r)
    conv_r = res_r0[5] < thr
    res_r1 = _band_pass(tr_ref, query_r, qlen_r, tlen_r, aw1_r, h0_r,
                        prm_ref, qmax=qmax_r, tmax=tmax_ref[g, 1], dt=dt,
                        early_exit=early_exit, inactive=conv_r)
    emit(24, res_r1, aw1_r)


def params_vector(params: ExtendParams) -> np.ndarray:
    """The (8,) int32 runtime-scoring block for the kernel's scalar
    prefetch — the analogue of the reference batch header words 0-1
    (task_parse.v:1954-1955): [a, b, o_del, e_del, o_ins, e_ins,
    zdrop, 0]."""
    mat = np.asarray(params.mat_flat).reshape(params.m, params.m)
    return np.array([int(mat[0, 0]), -int(mat[0, 1]), params.o_del,
                     params.e_del, params.o_ins, params.e_ins,
                     params.zdrop, 0], np.int32)


def extend_batch_raw_t(query_t, target_t, scal_t, tmax,
                       params: ExtendParams = None, *, blk_l: int = 512,
                       interpret: bool = False, compute_dtype=None,
                       early_exit: bool = True, prm=None):
    """Transposed-layout kernel invocation (the fast path).

    query_t (QMAX, B), target_t (TMAX, B), scal_t (8, B) int32 — i.e. the
    row-major arrays transposed on the host; returns (8, B) results.

    Scoring parameters are RUNTIME data (scalar-prefetch block): pass
    `prm` (the params_vector array, possibly a jit argument — zero
    recompiles across MemOptions) or let it be derived from `params`.
    """
    qmax, B = query_t.shape
    assert B % blk_l == 0, (B, blk_l)
    grid = B // blk_l
    if prm is None:
        prm = params_vector(params)
    if compute_dtype is None:
        compute_dtype = jnp.int32  # Mosaic: no i16 arithmetic yet

    kernel = functools.partial(
        _extend_kernel_t, qmax=qmax, dt=compute_dtype,
        early_exit=early_exit)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((qmax, blk_l), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((target_t.shape[0], blk_l), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, blk_l), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, blk_l), lambda g, *_: (0, g),
                               memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        interpret=interpret,
    )(tmax, jnp.asarray(prm, jnp.int32), query_t, target_t, scal_t)


def extend_batch_raw_fused(query_l_t, target_l_t, query_r_t, target_r_t,
                           scal_t, tmax2, prm, *, blk_l: int = 512,
                           interpret: bool = False,
                           compute_dtype=jnp.int32,
                           early_exit: bool = True):
    """Fused whole-alignment invocation: one pallas_call runs
    L0/L-retry/R0/R-retry for every lane (see _extend_kernel_fused).

    query_l_t (QL, B), target_l_t (TL, B), query_r_t (QR, B),
    target_r_t (TR, B) int8; scal_t (16, B) int32 (rows documented on
    the kernel); tmax2 (grid, 2) int32 per-block row bounds [left,
    right].  Returns (32, B) int32: [L0 | L1 | R0 | R1] x
    [score, qle, tle, gtle, gscore, max_off, aw, 0].
    """
    qmax_l, B = query_l_t.shape
    qmax_r = query_r_t.shape[0]
    assert B % blk_l == 0, (B, blk_l)
    grid = B // blk_l

    kernel = functools.partial(
        _extend_kernel_fused, qmax_l=qmax_l, qmax_r=qmax_r,
        dt=compute_dtype, early_exit=early_exit)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((qmax_l, blk_l), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((target_l_t.shape[0], blk_l),
                         lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((qmax_r, blk_l), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((target_r_t.shape[0], blk_l),
                         lambda g, *_: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, blk_l), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, blk_l), lambda g, *_: (0, g),
                               memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, B), jnp.int32),
        interpret=interpret,
    )(tmax2, jnp.asarray(prm, jnp.int32), query_l_t, target_l_t,
      query_r_t, target_r_t, scal_t)


def pack_scal(qlen, tlen, aw, h0, blk_b: int = 128):
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
                      params: ExtendParams, *, blk_b: int = 128,
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
    out = extend_batch_raw_t(
        jnp.asarray(query, jnp.int32).T, jnp.asarray(target, jnp.int32).T,
        scal.T, tmax, params, blk_l=blk_b, interpret=interpret).T
    return ExtendOut(
        score=out[:, 0], qle=out[:, 1], tle=out[:, 2], gtle=out[:, 3],
        gscore=out[:, 4], max_off=out[:, 5], w_used=out[:, 6])


def extend_batch(query, qlen, target, tlen, w, h0, max_ins, max_del,
                 params: ExtendParams, prev_score=None,
                 max_band_try: int = 2, *, blk_b: int = 128,
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


def make_raw_backend(params: ExtendParams, blk_l: int = 512):
    """A driver backend whose jitted program is ONLY the pallas_call.

    All packing/transposing/unpacking happens in numpy on the host, so
    the XLA program is the Mosaic kernel alone — it compiles in seconds
    where the composite wrapper takes minutes through this
    environment's remote compile service.  Interface matches
    pipeline.driver's extend_batch_fn.

    Scoring parameters ride the runtime scalar-prefetch block (`prm`
    passed as a jit ARGUMENT, same protocol as the native-driver
    backends): changing MemOptions scoring recompiles nothing — the
    reference takes them per batch in header words 0-1
    (task_parse.v:1954-1955).
    """
    import jax

    prm_vec = params_vector(params)
    fn = jax.jit(lambda q, t, scal, tmax, prm: extend_batch_raw_t(
        q, t, scal, tmax, prm=prm, blk_l=blk_l))

    def backend(query, qlen, target, tlen, aw, h0):
        q = np.ascontiguousarray(np.asarray(query, np.int32).T)
        t = np.ascontiguousarray(np.asarray(target, np.int32).T)
        scal, tmax = pack_scal(np.asarray(qlen), np.asarray(tlen),
                               np.asarray(aw), np.asarray(h0), blk_b=blk_l)
        out = np.asarray(fn(q, t, np.ascontiguousarray(scal.T), tmax,
                            prm_vec))
        return ExtendOut(
            score=out[0], qle=out[1], tle=out[2], gtle=out[3],
            gscore=out[4], max_off=out[5], w_used=out[6])

    return backend
