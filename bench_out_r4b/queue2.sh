#!/bin/bash
# Serialized post-build measurement queue v2 (TPU is single-tenant).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "[queue $(date +%H:%M:%S)] $*" >> bench_out_r4b/queue.log; }
ck() { git add -A bench_out_r4 bench_out_r4b >/dev/null 2>&1; git commit -q -m "$1" >/dev/null 2>&1; log "commit: $1"; }

while kill -0 "$1" 2>/dev/null; do sleep 30; done
log "index build exited: $(ls -la /tmp/bwamem_bench_idx_3100000000.npz 2>&1)"
if [ -n "${2:-}" ]; then while kill -0 "$2" 2>/dev/null; do sleep 20; done; fi
log "device free"

if [ -f /tmp/bwamem_bench_idx_3100000000.npz ]; then
  log "pre-packing occ cache @3.1Gb"
  timeout 3600 python - >> bench_out_r4b/queue.log 2>&1 <<'PY'
import numpy as np, os, time, sys
sys.path.insert(0, "/root/repo")
from bwamem_tpu.index.build import FMIndex
from bwamem_tpu.index.occ_packed import pack_occ
n_bp = 3100000000
occ_cache = f"/tmp/bwamem_bench_occ_{n_bp}.npz"
if not os.path.exists(occ_cache):
    z = np.load(f"/tmp/bwamem_bench_idx_{n_bp}.npz", allow_pickle=False)
    fm = FMIndex(l_pac=int(z["l_pac"]), seq_len2=int(z["seq_len2"]),
                 primary=int(z["primary"]), C=z["C"], bwt=z["bwt"],
                 occ_cp=z["occ_cp"], sa_intv=int(z["sa_intv"]),
                 ssa=z["ssa"], pac=z["pac"])
    t0 = time.time()
    po = pack_occ(fm)
    print(f"[prepack] {time.time()-t0:.0f}s", flush=True)
    tmp = occ_cache + ".part.npz"
    np.savez(tmp, occ_rows=po.occ_rows, pk_rows=po.pk_rows,
             va_rows=po.va_rows, C=po.C, primary=po.primary,
             n_rows=po.n_rows)
    os.replace(tmp, occ_cache)
PY
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
