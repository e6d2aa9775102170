"""End-to-end reads/s benchmark (the BASELINE.json config ladder).

Usage:
  python bench/throughput.py [--genome-mb 4.6] [--reads 2000]
                             [--read-len 150] [--backend pallas|jax]
                             [--paired]

Simulates a genome + mutated reads, then measures the full pipeline
(seeding -> chaining -> device extension -> CIGAR -> SAM) with the
batched seeding path and the device extension backend, reporting a
stage breakdown.  This is the "reads aligned/sec at 1 chip" number of
the north star; bench.py reports the kernel GCUPS number.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=4.6)
    ap.add_argument("--reads", type=int, default=2000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "jax", "scalar"])
    ap.add_argument("--paired", action="store_true")
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    from bwamem_tpu.config import MemOptions
    from bwamem_tpu.index.build import build_index
    from bwamem_tpu.index.occ_packed import pack_occ
    from bwamem_tpu.io.fasta import Contig, Reference
    from bwamem_tpu.pipeline.align import revcomp_read
    from bwamem_tpu.pipeline.driver import align_batch
    from bwamem_tpu.pipeline.pair import align_pairs

    opt = MemOptions()
    rng = np.random.default_rng(0)
    n_bp = int(args.genome_mb * 1e6)
    print(f"[sim] genome {n_bp/1e6:.1f} Mb, {args.reads} reads x "
          f"{args.read_len} bp", file=sys.stderr)
    pac = rng.integers(0, 4, n_bp).astype(np.uint8)
    ref = Reference(contigs=[Contig("sim", 0, n_bp)], pac=pac)

    t0 = time.time()
    fm = build_index(pac)
    t_index = time.time() - t0
    po = pack_occ(fm)
    print(f"[index] {t_index:.1f}s", file=sys.stderr)

    reads, mates = [], []
    for i in range(args.reads):
        pos = int(rng.integers(0, n_bp - 600))
        r = pac[pos:pos + args.read_len].astype(np.int64).copy()
        nmut = rng.binomial(args.read_len, 0.01)
        for _ in range(nmut):
            r[rng.integers(0, args.read_len)] = rng.integers(0, 4)
        if i % 2:
            r = revcomp_read(r)
        reads.append(r)
        if args.paired:
            isize = int(rng.normal(350, 30))
            m = pac[pos + isize - args.read_len:pos + isize]
            mates.append(revcomp_read(m.astype(np.int64)))

    backend_fn = None
    if args.backend != "scalar":
        import jax

        from bwamem_tpu.utils.jaxcfg import enable_compilation_cache

        enable_compilation_cache()
        import jax.numpy as jnp

        from bwamem_tpu.ops.extend_jax import ExtendParams

        params = ExtendParams(
            mat_flat=jnp.asarray(opt.mat.astype(np.int32).ravel()), m=5,
            o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
            e_ins=opt.e_ins, zdrop=opt.zdrop)
        if args.backend == "jax":
            from bwamem_tpu.ops.extend_jax import extend_batch_core
            backend_fn = jax.jit(lambda *a: extend_batch_core(*a, params))
        else:
            from bwamem_tpu.ops import extend_pallas
            backend_fn = extend_pallas.make_raw_backend(params)

    t0 = time.time()
    n_rec = 0
    chunk_times = []
    for i in range(0, len(reads), args.batch):
        tc = time.time()
        chunk = reads[i:i + args.batch]
        if args.paired:
            mchunk = mates[i:i + args.batch]
            recs = align_pairs(opt, ref, fm, chunk, mchunk, po=po,
                               extend_batch_fn=backend_fn)
        else:
            if backend_fn is None:
                from bwamem_tpu.pipeline.align import align_read
                recs = [align_read(opt, ref, fm, f"r{i+j}", r)
                        for j, r in enumerate(chunk)]
            else:
                recs = align_batch(opt, ref, fm, chunk, backend_fn, po=po)
        n_rec += sum(len(x) for x in recs)
        chunk_times.append((len(chunk), time.time() - tc))
    dt = time.time() - t0
    n = len(reads) * (2 if args.paired else 1)
    mult = 2 if args.paired else 1
    # steady state excludes warm-up chunks (jit compiles in this
    # environment cost minutes and do not persist across processes)
    steady = chunk_times[1:] or chunk_times
    st_rate = sum(c * mult for c, _ in steady) / sum(t for _, t in steady)
    print(f"[align] {n} reads in {dt:.1f}s -> {n/dt:.1f} reads/s total, "
          f"{st_rate:.1f} reads/s steady-state "
          f"({n_rec} SAM records, backend={args.backend})",
          file=sys.stderr)
    print(f"{st_rate:.1f}")


if __name__ == "__main__":
    main()
