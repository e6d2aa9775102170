"""Index-build scaling harness (BASELINE ladder: GRCh38-scale index).

  python bench/index_scale.py --genome-mb 3100

Builds the two-strand FM-index over a simulated genome of the given
size, reporting SA-IS time, total build time, occ-pack time, native
seeding throughput at that scale, and peak RSS."""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=250)
    ap.add_argument("--reads", type=int, default=20000,
                    help="reads for the seeding throughput probe")
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--threads", type=int, default=1,
                    help="seeding probe threads")
    ap.add_argument("--single-build", action="store_true",
                    help="skip the standalone SA-IS probe (one build "
                         "only — use at >= 1 Gb where a second suffix "
                         "sort doubles the runtime)")
    args = ap.parse_args()

    from bwamem_tpu.config import MemOptions
    from bwamem_tpu.index.build import build_index, suffix_array
    from bwamem_tpu.index.occ_packed import pack_occ
    from bwamem_tpu.pipeline.chain import collect_seeds_native

    n_bp = int(args.genome_mb * 1e6)
    rng = np.random.default_rng(0)
    print(f"[sim] genome {n_bp/1e6:.0f} Mb (two-strand text "
          f"{2*n_bp/1e9:.2f} Gsym)", file=sys.stderr)
    pac = rng.integers(0, 4, n_bp).astype(np.uint8)

    t_sais = 0.0
    if not args.single_build:
        t0 = time.time()
        from bwamem_tpu.index.build import revcomp_codes
        text = np.concatenate([pac, revcomp_codes(pac)])
        t0 = time.time()
        sa = suffix_array(text)
        t_sais = time.time() - t0
        print(f"[sais] {t_sais:.1f}s ({2*n_bp/1e6/t_sais:.1f} Msym/s), "
              f"rss {rss_gb():.1f} GB", file=sys.stderr)
        del sa, text

    t0 = time.time()
    fm = build_index(pac)
    t_build = time.time() - t0
    print(f"[index] full build {t_build:.1f}s, rss {rss_gb():.1f} GB",
          file=sys.stderr)
    if args.single_build:
        t_sais = t_build

    t0 = time.time()
    po = pack_occ(fm)
    t_pack = time.time() - t0
    print(f"[pack] {t_pack:.1f}s, rss {rss_gb():.1f} GB", file=sys.stderr)

    # seeding throughput at this genome scale (is seeding the
    # bottleneck? SURVEY §7 step 3 / VERDICT task 9)
    opt = MemOptions()
    reads = []
    for _ in range(args.reads):
        pos = int(rng.integers(0, n_bp - args.read_len))
        r = pac[pos:pos + args.read_len].astype(np.int64).copy()
        nmut = rng.binomial(args.read_len, 0.01)
        for _ in range(nmut):
            r[rng.integers(0, args.read_len)] = rng.integers(0, 4)
        reads.append(r)
    t0 = time.time()
    if args.threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        stripe = (len(reads) + args.threads - 1) // args.threads
        with ThreadPoolExecutor(args.threads) as ex:
            parts = list(ex.map(
                lambda i: collect_seeds_native(
                    fm, po, reads[i * stripe:(i + 1) * stripe], opt),
                range(args.threads)))
        seeds = [s for p in parts if p for s in p]
    else:
        seeds = collect_seeds_native(fm, po, reads, opt)
    t_seed = time.time() - t0
    n_seeds = sum(len(s) for s in seeds) if seeds else 0
    print(f"[seed] {args.reads} reads in {t_seed:.1f}s -> "
          f"{args.reads/t_seed:.0f} reads/s ({n_seeds} seeds), "
          f"rss {rss_gb():.1f} GB", file=sys.stderr)
    print(f"{t_sais:.1f} {t_build:.1f} {t_pack:.1f} "
          f"{args.reads/t_seed:.0f} {rss_gb():.1f}")


if __name__ == "__main__":
    main()
