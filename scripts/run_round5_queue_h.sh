#!/bin/bash
# Round-5 TPU queue, part H — priority swap, launched manually at part G's
# gap-T10 item boundary.  Part G's reserve math (C13 cap = remaining - 5400)
# protects the hybrid + RCA items, but with the device down for the first
# 45 min of the session that math would SKIP the C13 reference-scale study —
# the top item of VERDICT r4 ("re-run and LAND ... the 25-trial reference-
# scale C13 study").  Part H inverts the priority: the study gets the bulk
# of the remaining wall-clock (its per-trial CSV flush + catch= fault
# tolerance make a deadline-killed study real, honest evidence — the
# .study.json completion sidecar stays absent so the manifest marker still
# reads MISSING), and the anchored C17 hybrid takes the tail.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

DEADLINE_EPOCH="${DEADLINE_EPOCH:?set DEADLINE_EPOCH (unix seconds)}"

remaining() { echo $(( DEADLINE_EPOCH - $(date -u +%s) )); }

health_gate() {
  for i in 1 2 3 4 5 6; do
    out=$(timeout 360 python -c "
from vub_image_denoising_tpu.utils.health import probe_device_exec
ok, dt, detail = probe_device_exec(timeout_s=300)
print(f'probe ok={ok} dt={dt:.0f}s {detail}')" 2>&1 | tail -1)
    echo "=== health[$i] $out $(date -u +%FT%TZ)"
    case "$out" in *"ok=True"*) return 0 ;; esac
    sleep 60
  done
  echo "=== health gate FAILED — exec path dead for ~30 min"
  return 1
}

run_item() {  # run_item <name> <min_budget_s> <timeout_s> <cmd...>
  local name="$1" minb="$2" tmo="$3"; shift 3
  local rem; rem=$(remaining)
  if [ "$rem" -lt "$minb" ]; then
    echo "=== $name SKIPPED: ${rem}s left < ${minb}s min $(date -u +%FT%TZ)"
    return 0
  fi
  if [ "$tmo" -gt $(( rem - 60 )) ]; then tmo=$(( rem - 60 )); fi
  health_gate || { echo "=== $name SKIPPED: unhealthy device"; return 1; }
  echo "=== $name start timeout=${tmo}s rem=${rem}s $(date -u +%FT%TZ)"
  timeout "$tmo" "$@"
  echo "=== $name rc=$? $(date -u +%FT%TZ)"
}

echo "=== round5 queue-h start $(date -u +%FT%TZ) deadline=$(date -u -d @"$DEADLINE_EPOCH" +%FT%TZ)"

REM=$(remaining)
C13_CAP=$(( REM - 2100 )); [ "$C13_CAP" -gt 12000 ] && C13_CAP=12000
run_item c13_ref_scale 1800 "$C13_CAP" python scripts/run_search_tpu.py \
    --trials 25 --epochs 5 --size 256 --n-train 256 --n-val 16 \
    --batch-size 16 --engine xla --bf16 \
    --csv runs/trial_results_tpu_ref_scale.csv

run_item c17_anchored 900 1800 python scripts/train_tpu_gan_accuracy.py \
    --algo hybrid --lam-feat 0.05 --lam-content 100 --lam-texture 0.001 \
    --lam-adv 1 --adv-ramp-steps 320 --epochs 40 --eval-every 5 \
    --tag c17-anchored --ckpt-dir runs/accuracy_ckpt_hybrid_anchored

echo "=== round5 queue-h done $(date -u +%FT%TZ)"
