#!/bin/bash
# Chip measurement queue: waits for the axon tunnel, then runs the
# round-5 measurement backlog sequentially (single chip — never
# concurrent).  A flock guards against duplicate queue instances.
#
# Launch detached:  nohup bash scripts/chipqueue.sh >/tmp/chipqueue_nohup.log 2>&1 &
# Progress:         tail /tmp/chipqueue.log
# Artifacts:        benchmarks/results/cache/*.log (committed — /tmp is
#                   wiped between rounds; round 4's measurements were lost
#                   to exactly that)
cd /root/repo || exit 1
ART=benchmarks/results/cache
mkdir -p "$ART"
LOCK=/tmp/chipqueue.lock
exec 9>"$LOCK"
if ! flock -n 9; then
  echo "another chipqueue instance holds $LOCK; exiting" >&2
  exit 0
fi
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/chipqueue.log; }
log "queue started (pid $$); waiting for tunnel"
while true; do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    break
  fi
  sleep 60
done
log "tunnel is UP"

# 0) fresh headline bench — publishes incrementally into the committed
#    $ART/last_result.json + fingerprinted caches, so even a mid-run
#    tunnel flap leaves fresh rows for the round-end driver bench
log "headline bench start"
BLANCZOS_BENCH_TIMEOUT=7200 timeout 7500 python bench.py \
    > "$ART/bench_queue.log" 2>&1
log "headline bench done rc=$?"

# 0b) refresh the committed truth CSV from the fresh result (refuses
#     flagged cached republications); the round-end driver commit picks
#     the CSV change up
python scripts/update_tpu_truth.py >> /tmp/chipqueue.log 2>&1
log "tpu_truth refresh rc=$?"

# Items below hold the shared chip lock (bench.py's watchdog waits on it),
# so a driver-invoked round-end bench never shares the chip with them.
# Item 0's bench.py takes the lock itself — wrapping it here would deadlock.
CHIPLOCK=/tmp/blanczos_bench/chip.lock
mkdir -p /tmp/blanczos_bench

# 1) wide-field ablation on chip (bench config) — feeds the PERF.md
#    hotspot attribution (VERDICT r4 #3; round 4's log died with /tmp)
log "ablation start"
timeout 2400 flock $CHIPLOCK python benchmarks/ablate_wide.py --iters 20 \
    > "$ART/ablate_wide_chip.log" 2>&1
log "ablation done rc=$?"

# 2) structured skewed instance end-to-end at n=128: CLI solve (dedup +
#    salvage) + independent checker — the committed production-class truth
#    row (VERDICT r4 #4).  /tmp is volatile: regenerate if missing
#    (CPU-only numpy; no jax touch, so force the cpu backend).
if [ ! -f /tmp/blanczos_bench/skew1Mx750k.mtx ]; then
  log "structured matrix regen start"
  JAX_PLATFORMS=cpu timeout 1800 python benchmarks/gen_structured.py \
      > "$ART/gen_structured.log" 2>&1
  log "structured matrix regen done rc=$?"
fi
run_structured() {  # $1 = blocking n; $2 = extra flags
  local n=$1; shift
  log "structured n=$n solve start"
  timeout 5400 flock $CHIPLOCK python -m block_lanczos_tpu.utils.cli \
      --matrix /tmp/blanczos_bench/skew1Mx750k.mtx --prime 2 --n "$n" \
      --output-file "/tmp/blanczos_bench/skew1Mx750k_kernel_n$n.mtx" \
      --no-checks --salvage "$@" \
      > "$ART/structured_solve_n$n.log" 2>&1
  log "structured n=$n solve done rc=$?"
  timeout 1200 flock $CHIPLOCK python -m block_lanczos_tpu.utils.checker \
      --matrix /tmp/blanczos_bench/skew1Mx750k.mtx \
      --kernel "/tmp/blanczos_bench/skew1Mx750k_kernel_n$n.mtx" --prime 2 \
      >> "$ART/structured_solve_n$n.log" 2>&1
  log "structured n=$n check done rc=$?"
}
# one restart fills the salvage residue (round 4 recovered 115/128 in a
# single run); the first solve's own "Terminated in Xs" line stays the
# TTS truth row
run_structured 128 --salvage-restarts 1
# 3) the n=256 blocking A/B on the SAME production instance — validates
#    the measured bench-scale TTS recommendation on the structured class
#    (VERDICT r4 #5)
run_structured 256

# 4) preemption-safe checkpoint on the REAL chip (VERDICT r4 #6): SIGTERM
#    a live tunneled solve mid-flight (dispatch in flight during the
#    signal), expect exit 143 + a checkpoint, resume to completion, pass
#    the independent checker.  --sync-every 64 keeps dispatch blocks short
#    enough that the post-signal save lands promptly.
log "chip SIGTERM checkpoint exercise start"
(
  set -x
  CK=/tmp/blanczos_bench/chip_ck
  rm -rf "$CK"
  flock $CHIPLOCK bash -c '
    CK=/tmp/blanczos_bench/chip_ck
    timeout 3000 python -m block_lanczos_tpu.utils.cli \
        --matrix /tmp/blanczos_bench/skew1Mx750k.mtx --prime 2 --n 128 \
        --checkpoint 45 --checkpoint-dir "$CK" --sync-every 64 \
        --no-checks --salvage \
        --output-file /tmp/blanczos_bench/skew1Mx750k_kernel_ck.mtx &
    PID=$!
    sleep 240 && kill -TERM $PID
    wait $PID; RC=$?
    echo "first run exited rc=$RC (expect 143)"
    [ -f "$CK/manifest.json" ] && echo "checkpoint manifest present" \
                               || echo "MISSING checkpoint manifest"
    timeout 3000 python -m block_lanczos_tpu.utils.cli \
        --matrix /tmp/blanczos_bench/skew1Mx750k.mtx --prime 2 --n 128 \
        --checkpoint 45 --checkpoint-dir "$CK" --load-checkpoint \
        --sync-every 64 --no-checks --salvage \
        --output-file /tmp/blanczos_bench/skew1Mx750k_kernel_ck.mtx
    echo "resume exited rc=$?"
    timeout 1200 python -m block_lanczos_tpu.utils.checker \
        --matrix /tmp/blanczos_bench/skew1Mx750k.mtx \
        --kernel /tmp/blanczos_bench/skew1Mx750k_kernel_ck.mtx --prime 2
    echo "checker exited rc=$?"
  '
) > "$ART/chip_sigterm_resume.log" 2>&1
log "chip SIGTERM checkpoint exercise done rc=$?"
log "queue complete"
