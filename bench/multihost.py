"""Multi-host scaling bench: N real `mem --shard` processes + merge.

Usage:
  python bench/multihost.py [--genome-mb 20] [--reads 20000] [--procs 1 2 4]

Launches N share-nothing aligner processes (the `--shard K/N` CLI
path, CPU backend so N processes coexist on one box — the real
multi-chip device path is exercised separately by parallel/dist.py),
waits for all, merges with the `merge` subcommand, and verifies the
merged record stream against the single-process run.  Reports
aggregate and per-process reads/s and the scaling efficiency vs N=1
(BASELINE north star: >=80% linear 1->4 hosts).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=20)
    ap.add_argument("--reads", type=int, default=20000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--procs", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("-t", type=int, default=1,
                    help="host threads per process")
    args = ap.parse_args()

    d = tempfile.mkdtemp(prefix="bwamem_mh_")
    rng = np.random.default_rng(0)
    n_bp = int(args.genome_mb * 1e6)
    bases = np.frombuffer(b"ACGT", np.uint8)
    codes = rng.integers(0, 4, n_bp)
    fa = os.path.join(d, "ref.fa")
    print(f"[sim] genome {args.genome_mb} Mb + {args.reads} reads -> {d}",
          file=sys.stderr)
    with open(fa, "wb") as f:
        f.write(b">sim\n")
        row = bases[codes]
        for i in range(0, n_bp, 1 << 20):
            chunk = row[i:i + (1 << 20)]
            f.write(b"\n".join(chunk[j:j + 70].tobytes()
                               for j in range(0, len(chunk), 70)) + b"\n")
    rl = args.read_len
    pos = rng.integers(0, n_bp - rl - 1, size=args.reads)
    R = codes[pos[:, None] + np.arange(rl)]
    mut = rng.random((args.reads, rl)) < 0.01
    R[mut] = rng.integers(0, 4, int(mut.sum()))
    fq = os.path.join(d, "reads.fq")
    qual = b"I" * rl
    with open(fq, "wb") as f:
        for i in range(args.reads):
            f.write(b"@r%d\n%s\n+\n%s\n"
                    % (i, bases[R[i]].tobytes(), qual))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = (os.path.abspath(
        os.path.join(os.path.dirname(__file__), os.pardir))
        + os.pathsep + env.get("PYTHONPATH", ""))
    subprocess.run([sys.executable, "-m", "bwamem_tpu", "index", fa],
                   env=env, check=True, capture_output=True, timeout=3600)

    base = [sys.executable, "-m", "bwamem_tpu", "mem", "--backend", "jax",
            "--host", "native", "-t", str(args.t), "-b", "2048", "-v", "1"]
    results = {}
    single_body = None
    for N in args.procs:
        t0 = time.time()
        procs = []
        paths = []
        for k in range(N):
            out = os.path.join(d, f"shard{k}of{N}.sam")
            paths.append(out)
            cmd = list(base)
            if N > 1:
                cmd += ["--shard", f"{k}/{N}"]
            cmd += [fa, fq]
            procs.append(subprocess.Popen(
                cmd, env=env, stdout=open(out, "w"),
                stderr=subprocess.DEVNULL))
        for p in procs:
            assert p.wait() == 0, f"shard process failed (N={N})"
        dt = time.time() - t0
        merged = os.path.join(d, f"merged{N}.sam")
        if N > 1:
            subprocess.run([sys.executable, "-m", "bwamem_tpu", "merge",
                            merged, *paths], env=env, check=True,
                           capture_output=True, timeout=600)
        else:
            merged = paths[0]
        body = [l for l in open(merged) if not l.startswith("@")]
        if single_body is None:
            single_body = body
        else:
            assert body == single_body, \
                f"merged SAM (N={N}) != single-process SAM"
        rate = args.reads / dt
        results[N] = rate
        eff = rate / results[args.procs[0]] / (N / args.procs[0]) * 100
        print(f"[mh] N={N}: {dt:.1f}s  {rate:,.0f} reads/s aggregate "
              f"({rate / N:,.0f}/proc, {eff:.0f}% linear vs "
              f"N={args.procs[0]})", file=sys.stderr)
    import json

    best = max(args.procs)
    print(json.dumps({
        "metric": "multihost_scaling",
        "value": round(results[best] / results[args.procs[0]]
                       / (best / args.procs[0]) * 100, 1),
        "unit": f"% linear {args.procs[0]}->{best} procs",
        "reads_per_s": {str(k): round(v) for k, v in results.items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
