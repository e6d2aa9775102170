#!/bin/bash
# Single-chip perf ladder (run serially — the device is single-tenant).
# Each config quotes steady-state (chunk 1 excluded: first-compile cost
# routes through the remote compile service).  Usage:
#   bash bench/ladder.sh [outdir]   # default bench_out/
set -u
OUT=${1:-bench_out}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
PY=python

run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/ladder.log"
  # `/usr/bin/time -v` when available (peak-RSS per config), plain run otherwise
  if [ -x /usr/bin/time ]; then
    /usr/bin/time -v $PY "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  else
    $PY "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  fi
  tail -2 "$OUT/$name.out" | tee -a "$OUT/ladder.log"
}

# 0) kernel GCUPS (fuzz-gated) — the BENCH_r{N} metric
run gcups bench.py

# 1) SE 60 Mb steady-state (the headline reads/s config)
run se60 bench/throughput.py --genome-mb 60 --reads 100000 \
  --batch 2048 -t 4 --overlap --inflight 4

# 2) SE 4.6 Mb (E. coli scale, BASELINE config #2 shape)
run se4 bench/throughput.py --genome-mb 4.6 --reads 100000 \
  --batch 2048 -t 4 --overlap --inflight 4

# 3) PE 60 Mb FR library, depth 4
run pe60 bench/throughput.py --genome-mb 60 --reads 100000 --paired \
  --batch 2048 -t 4 --overlap --inflight 4

# 4) PE 60 Mb FR + device rescue + device CIGAR
run pe60dev bench/throughput.py --genome-mb 60 --reads 100000 --paired \
  --batch 2048 -t 4 --overlap --inflight 4 --device-rescue --device-cigar

# 5) PE stress: 50% RR-discordant (mate rescue fires on half the pairs)
run pe60stress bench/throughput.py --genome-mb 60 --reads 50000 --paired \
  --discordant 0.5 --batch 2048 -t 4 --overlap --inflight 4 --device-rescue

# 6) device-side seeding (the CPU-starved-host path)
run se60dseed bench/throughput.py --genome-mb 60 --reads 20000 \
  --batch 2048 -t 1 --overlap --inflight 4 --device-seed

echo "ladder done -> $OUT/ladder.log"
