#!/bin/bash
# Queued on-chip revalidation for the next TPU window (run unattended).
# NOTES.md round-3 late sweep: the UNROLL sweep, the masked-cost
# re-measure, and a fresh bench revalidation were blocked on hardware.
set -u
LOGDIR=${LOGDIR:-/tmp/r3_onchip}
mkdir -p "$LOGDIR"
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* (started $(date -u +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "$LOGDIR/$name.log" 2>&1
  rc=$?
  echo "=== $name: rc=$rc ==="
  tail -n 20 "$LOGDIR/$name.log"
}

# 0. slot-tiled wide-bucket kernels: Mosaic/VMEM legality is only checked
#    by the real compiler (interpret mode can't) — run FIRST
run wide_bucket python scripts/exp_wide_bucket_tpu.py
# 1. fresh headline bench (validates this session's engine changes on HW)
run bench python bench.py
# 2. ELL scan unroll-depth sweep (the one untried kernel-level lever)
run unroll python scripts/exp_unroll.py
# 3. masked-search cost re-measure after the fused pad-row mask fold
run doc_mask python scripts/exp_doc_mask_tpu.py
