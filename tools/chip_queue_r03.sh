#!/bin/bash
# Round-3 chip measurement queue: waits for the TPU tunnel to come back,
# then runs the remaining benches sequentially (each step logs to
# /tmp/chipq/, failures don't stop the queue). Steps:
#   1. bench3 (3 fresh-process runs of bench.py 2M bf16) -> BENCH_r03.json
#   2. BM25 hybrid 1M probe (component + streamed e2e)
#   3. BM25 10M-doc CSR hybrid bench (head + selective profiles)
#   4. BENCH_10M re-run (int8+int4 residual, 10M x 768) -> only if step 1
#      shows a fast session (>30k QPS) — the 10k target is session-bound.
set -u
cd /root/repo
mkdir -p /tmp/chipq

probe_tunnel() {
  # must see the REAL chip: a clean axon-init failure falls back to CPU,
  # and CPU "bench" numbers would be garbage
  timeout 60 python -c "
import jax, sys
sys.exit(0 if jax.default_backend() in ('tpu', 'axon') else 1)
" >/dev/null 2>&1
}

echo "$(date +%H:%M:%S) waiting for tunnel..." | tee -a /tmp/chipq/queue.log
until probe_tunnel; do
  echo "$(date +%H:%M:%S) tunnel still down" >> /tmp/chipq/queue.log
  sleep 120
done
echo "$(date +%H:%M:%S) tunnel UP - starting queue" | tee -a /tmp/chipq/queue.log

echo "$(date +%H:%M:%S) step 1: bench3 -> BENCH_r03.json" >> /tmp/chipq/queue.log
# stash any pre-existing result: the step-4 gate must read THIS session's
# throughput, not a stale file from a failed/old run
[ -f BENCH_r03.json ] && mv BENCH_r03.json /tmp/chipq/BENCH_r03.prev.json
timeout 3600 python tools/bench3.py --runs 3 --out BENCH_r03.json \
  > /tmp/chipq/bench3.log 2>&1
S1RC=$?
echo "$(date +%H:%M:%S) step 1 rc=$S1RC" >> /tmp/chipq/queue.log
# a failed step 1 leaves no fresh BENCH_r03.json; restore the previous one
# so the repo keeps its last good measurement (gate below reads 0 -> skip)
if [ ! -f BENCH_r03.json ] && [ -f /tmp/chipq/BENCH_r03.prev.json ]; then
  mv /tmp/chipq/BENCH_r03.prev.json BENCH_r03.json
  touch /tmp/chipq/step1_failed
fi

echo "$(date +%H:%M:%S) step 2: bm25 hybrid probe 1M" >> /tmp/chipq/queue.log
timeout 1800 python tools/bm25_hybrid_probe.py \
  > /tmp/chipq/bm25_probe.log 2>&1
echo "$(date +%H:%M:%S) step 2 rc=$?" >> /tmp/chipq/queue.log

echo "$(date +%H:%M:%S) step 3: bm25 10M CSR hybrid bench" >> /tmp/chipq/queue.log
timeout 2400 python tools/bm25_bench.py --csr --n 10000000 \
  --backends hybrid --head-dtype bfloat16 \
  > /tmp/chipq/bm25_10m.log 2>&1
echo "$(date +%H:%M:%S) step 3 rc=$?" >> /tmp/chipq/queue.log

# step 4 gate: only burn 25 min on the 10M dense re-run if this session is fast
QPS=$(python - <<'EOF'
import json, pathlib
p = pathlib.Path("BENCH_r03.json")
print(json.loads(p.read_text())["value"] if p.exists() else 0)
EOF
)
[ -f /tmp/chipq/step1_failed ] && QPS=0   # never gate on a restored stale file
FAST=$(python -c "print(1 if float('$QPS' or 0) > 30000 else 0)")
echo "$(date +%H:%M:%S) step 4 gate: r03 qps=$QPS fast=$FAST" >> /tmp/chipq/queue.log
if [ "$FAST" = "1" ]; then
  timeout 3600 env BENCH_DTYPE=int8 BENCH_CORPUS_N=10000000 BENCH_BATCH=512 \
    python bench.py > /tmp/chipq/bench10m.log 2>&1
  echo "$(date +%H:%M:%S) step 4 rc=$?" >> /tmp/chipq/queue.log
else
  echo "$(date +%H:%M:%S) step 4 skipped (slow session)" >> /tmp/chipq/queue.log
fi
echo "$(date +%H:%M:%S) queue DONE" | tee -a /tmp/chipq/queue.log
