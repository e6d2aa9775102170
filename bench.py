"""Benchmark harness: banded seed-extension throughput on the local device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GCUPS", "vs_baseline": N/15.0}

Baseline: the reference FPGA's derived peak is 13-16 GCUPS (80 PEs x
167-200 MHz, 1 cell/cycle — BASELINE.md); we normalise against 15.

GCUPS counts *band* cells (tlen x min(qlen, 2w+1) per task), the same
cells the reference actually computes — not the full DP matrix.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from bwamem_tpu.config import MemOptions
    from bwamem_tpu.ops import extend_pallas
    from bwamem_tpu.ops.extend_jax import ExtendParams

    opt = MemOptions()
    params = ExtendParams(
        mat_flat=jnp.asarray(opt.mat.astype(np.int32).ravel()), m=5,
        o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins,
        zdrop=0)

    B, QMAX, TMAX = 16384, 128, 256
    QLEN, TLEN, W = 100, 200, 100
    rng = np.random.default_rng(0)
    # realistic tasks: target = mutated query + flanking tail
    query = rng.integers(0, 4, (B, QMAX)).astype(np.int32)
    target = rng.integers(0, 4, (B, TMAX)).astype(np.int32)
    target[:, :QLEN] = query[:, :QLEN]
    muts = rng.integers(0, QLEN, (B, 6))
    target[np.arange(B)[:, None], muts] = rng.integers(0, 4, (B, 6))
    BLK = 512
    scal, tmax = extend_pallas.pack_scal(
        np.full(B, QLEN, np.int32), np.full(B, TLEN, np.int32),
        np.full(B, W, np.int32), np.full(B, 19, np.int32), blk_b=BLK)
    args = (jnp.asarray(query.T.copy()), jnp.asarray(target.T.copy()),
            jnp.asarray(scal.T.copy()), jnp.asarray(tmax))

    fn = jax.jit(
        lambda *a: extend_pallas.extend_batch_raw_t(*a, params, blk_l=BLK))
    out = fn(*args)
    out.block_until_ready()  # compile
    n_iter = 10
    t0 = time.time()
    for _ in range(n_iter):
        out = fn(*args)
    out.block_until_ready()
    dt = (time.time() - t0) / n_iter

    band = min(QLEN, 2 * W + 1)
    cells = B * TLEN * band
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "seed_extension_throughput",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 15.0, 3),
    }))
    return 0


if __name__ == "__main__":
    # the axon tunnel occasionally drops mid-run; retry a couple of
    # times before giving up so the driver still gets its JSON line
    last = None
    for attempt in range(3):
        try:
            sys.exit(main())
        except Exception as e:  # noqa: BLE001
            last = e
            print(f"[bench] attempt {attempt + 1} failed: {e}",
                  file=sys.stderr)
            time.sleep(60)
    raise last
