"""Build and cache the simulated-genome FM-index .npz that
bench/throughput.py expects (same deterministic construction:
rng seed 0, n_bp = genome_mb * 1e6), so ladder rows at GRCh38 scale
can start without paying the ~66-min build inside a timed row.

  python bench/build_cache.py --genome-mb 3100
"""
from __future__ import annotations

import argparse
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=3100)
    args = ap.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import cachefmt
    from bwamem_tpu.index.build import build_index

    n_bp = int(args.genome_mb * 1e6)
    # load_idx validates version + readability, not just existence —
    # a truncated npz from a killed build triggers a rebuild here
    # instead of crashing a timed ladder row later
    z = cachefmt.load_idx(n_bp)
    if z is not None:
        z.close()   # a pure validity probe — release the handle
        print(f"[cache] already exists and loads: "
              f"{cachefmt.idx_path(n_bp)}", file=sys.stderr)
        return 0
    rng = np.random.default_rng(0)
    pac = rng.integers(0, 4, n_bp).astype(np.uint8)
    t0 = time.time()
    fm = build_index(pac)
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"[index] built {n_bp/1e6:.0f} Mb in {dt:.0f}s, "
          f"peak rss {rss:.1f} GB", file=sys.stderr)
    cache = cachefmt.save_idx(n_bp, fm)
    print(f"[cache] wrote {cache} "
          f"({os.path.getsize(cache)/1e9:.2f} GB)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
