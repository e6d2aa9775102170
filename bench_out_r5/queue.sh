#!/bin/bash
# r5 serialized measurement queue; one device process at a time.
# No auto-commits (round-4 ADVICE): artifacts are committed manually.
cd /root/repo
L=bench_out_r5/queue.log
log(){ echo "[queue $(date +%H:%M:%S)] $*" >> $L; }
run(){ name=$1; shift; log "start $name: $*"; PYTHONPATH=/root/repo:/root/.axon_site timeout 7200 python "$@" > bench_out_r5/$name.out 2> bench_out_r5/$name.err; log "done $name rc=$? val=$(tail -1 bench_out_r5/$name.out)"; }
# 1. bucket-split A/B on an IDLE host at 60 Mb (VERDICT round-4 weak #2)
run se60_plain_idle  bench/throughput.py --genome-mb 60 --reads 100000 --batch 2048 -t 4 --overlap --inflight 4
run se60_bucket_idle bench/throughput.py --genome-mb 60 --reads 100000 --batch 2048 -t 4 --overlap --inflight 4 --bucket-split
# 2. SE at batch 4096 / 60 Mb: same reads-per-chunk as pe60's 2048 pairs
#    (pe60 46.1k > se60 36.4k analysis — VERDICT weak #5)
run se60b4096_0 bench/throughput.py --genome-mb 60 --reads 100000 --batch 4096 -t 4 --overlap --inflight 4
run se60b4096_1 bench/throughput.py --genome-mb 60 --reads 100000 --batch 4096 -t 4 --overlap --inflight 4
# 3. bucket-split A/B at 3.1 Gb (VERDICT ask #4: measure at the scale that motivated it)
run se3100_plain  bench/throughput.py --genome-mb 3100 --reads 100000 --batch 4096 -t 4 --overlap --inflight 6
run se3100_bucket bench/throughput.py --genome-mb 3100 --reads 100000 --batch 4096 -t 4 --overlap --inflight 6 --bucket-split
# 4. per-batch device trace at 3.1 Gb (VERDICT ask #6)
run se3100_trace bench/throughput.py --genome-mb 3100 --reads 40000 --batch 4096 -t 4 --overlap --inflight 6 --trace bench_out_r5/trace3100.jsonl
log "queue done"
