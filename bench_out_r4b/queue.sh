#!/bin/bash
# Serialized post-build measurement queue (TPU is single-tenant).
# Waits for the 3.1 Gb index-cache build, then captures the GRCh38-scale
# ladder rows, the 1M-read sustained run, the PE re-measures, and the
# multihost scaling row; commits artifacts after each step.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "[queue $(date +%H:%M:%S)] $*" >> bench_out_r4b/queue.log; }

# 1. wait for the index build (pid arg) and for any device probe to clear
while kill -0 "$1" 2>/dev/null; do sleep 30; done
log "index build done: $(ls -la /tmp/bwamem_bench_idx_3100000000.npz 2>&1)"
# wait for any still-running device probe (arg 2 optional)
if [ -n "${2:-}" ]; then while kill -0 "$2" 2>/dev/null; do sleep 20; done; fi

ck() { git add -A bench_out_r4 bench_out_r4b && git commit -q -m "$1" >/dev/null 2>&1; log "commit: $1"; }

if [ -f /tmp/bwamem_bench_idx_3100000000.npz ]; then
  log "ladder se3100+pe3100"
  timeout 14000 python bench/ladder.py bench_out_r4 --rows se3100,pe3100 >> bench_out_r4b/queue.log 2>&1
  ck "Bench: GRCh38-scale se3100+pe3100 ladder rows (artifacts)"
  log "1M-read sustained run @3.1Gb"
  timeout 7200 python bench/throughput.py --genome-mb 3100 --reads 1000000 \
    --batch 4096 -t 4 --overlap --inflight 6 \
    > bench_out_r4/se3100_1m.out 2> bench_out_r4/se3100_1m.err
  ck "Bench: 1M-read sustained run at 3.1 Gb (artifact)"
else
  log "NO 3.1Gb cache — skipping genome-scale rows"
fi

log "ladder pe60,pe60stress"
timeout 14000 python bench/ladder.py bench_out_r4 --rows pe60,pe60stress >> bench_out_r4b/queue.log 2>&1
ck "Bench: pe60/pe60stress ladder re-measure (artifacts)"

log "ladder multihost"
timeout 7200 python bench/ladder.py bench_out_r4 --rows multihost >> bench_out_r4b/queue.log 2>&1
ck "Bench: multihost steady-state scaling row (artifact)"
log "queue done"
