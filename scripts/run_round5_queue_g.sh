#!/bin/bash
# Round-5 TPU queue, part G — final-session master queue.  Parts A-F landed
# stage-2 (30.43 dB), the SIDD re-eval (30.41 dB), and the warm serving
# sweep (12.82 req/s); this queue lands the remainder on a freshly reset
# machine (cold compile cache, runs/ wiped of checkpoints):
#   1. bench.py            — re-warm the compile cache for the driver's
#                            round-end bench (cold ~14 min, warm 37 s)
#   2. corrected s25       — the committed torch_parity.json still cites the
#        + parity refresh    protocol-mismatched 1e-4 ckpt (27.97 dB); regen
#                            at the pinned --lr 3e-4 command and re-measure
#   3. gap-T10             — last missing stage-1 grid row (wedged twice)
#   4. C13 ref-scale       — 25-trial x 5-epoch x 256^2 study (VERDICT r4 #1);
#                            deadline-capped, per-trial CSV flush + catch=
#                            fault tolerance make a partial run real evidence
#   5. C17 anchored hybrid — ablation lesson applied past smoke (VERDICT #5)
#   6. RCA promotion       — 128^2/2048-img/60-epoch run of ablation row #7
#                            with an adv-weight ramp (VERDICT #4); gets the
#                            remaining wall-clock, snapshot-safe
#   7. blind regen         — if budget remains
# New vs part F: every chip item is gated on utils/health.probe_device_exec
# (two prior s25 attempts burned their whole timeout wedged on a dead exec
# path), and the deadline is an absolute epoch (DEADLINE_EPOCH) because
# `date -d "today HH:MM"` breaks across the midnight this session spans.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

DEADLINE_EPOCH="${DEADLINE_EPOCH:?set DEADLINE_EPOCH (unix seconds)}"

remaining() { echo $(( DEADLINE_EPOCH - $(date -u +%s) )); }

# Block until the device exec path answers a small executed matmul from a
# child process, or give up after ~30 min.  Returns 0 when healthy.
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

echo "=== round5 queue-g start $(date -u +%FT%TZ) deadline=$(date -u -d @"$DEADLINE_EPOCH" +%FT%TZ)"

run_item bench 600 1800 python bench.py

# --- corrected s25 (recorded protocol lr 3e-4), up to 3 attempts ---
S25_OK=0
for attempt in 1 2 3; do
  [ $(remaining) -lt 1500 ] && break
  before=$(grep -c '"metric": "rdunet_supervised_synthetic_psnr"' runs/accuracy_log.jsonl || true)
  run_item "s25[$attempt]" 1500 2400 python scripts/regen_artifacts.py --regen s25 --force
  after=$(grep -c '"metric": "rdunet_supervised_synthetic_psnr"' runs/accuracy_log.jsonl || true)
  if [ "$after" -gt "$before" ]; then S25_OK=1; break; fi
  echo "=== s25 attempt $attempt left no result row (wedge?) — cooling down 90s"
  sleep 90
done
if [ "$S25_OK" -eq 1 ]; then
  run_item torch_parity 600 1200 python scripts/check_torch_parity.py \
      --checkpoint runs/accuracy_ckpt_s25/rdunet_denoising.pth \
      --out runs/torch_parity.json
fi

run_item gap_T10 1800 2400 python scripts/train_tpu_accuracy.py \
    --algo diffusion --epochs 40 --batch-size 128 --n-train 2048 \
    --sched-steps-per-epoch 300 --device-data --eval-every 20 --lr 2e-4 \
    --timesteps 10 --tag gap-T10 --ckpt-dir runs/gap_T10

# C13 ref-scale: cap to what's left minus a reserve for the hybrid (2400),
# the RCA promotion floor (2400) and the blind regen (dropped first).
REM=$(remaining)
C13_CAP=$(( REM - 5400 )); [ "$C13_CAP" -gt 12000 ] && C13_CAP=12000
if [ "$C13_CAP" -ge 2400 ]; then
  run_item c13_ref_scale 2400 "$C13_CAP" python scripts/run_search_tpu.py \
      --trials 25 --epochs 5 --size 256 --n-train 256 --n-val 16 \
      --batch-size 16 --engine xla --bf16 \
      --csv runs/trial_results_tpu_ref_scale.csv
else
  echo "=== c13_ref_scale SKIPPED: only ${REM}s left"
fi

run_item c17_anchored 1800 2400 python scripts/train_tpu_gan_accuracy.py \
    --algo hybrid --lam-feat 0.05 --lam-content 100 --lam-texture 0.001 \
    --lam-adv 1 --adv-ramp-steps 320 --epochs 40 --eval-every 5 \
    --tag c17-anchored --ckpt-dir runs/accuracy_ckpt_hybrid_anchored

# RCA promotion takes the remaining wall-clock (snapshot-safe: --eval-every
# flushes progress rows, SIGTERM writes a partial best-so-far row).
REM=$(remaining)
run_item rca_promoted 2400 $(( REM - 300 > 6000 ? 6000 : REM - 300 )) \
    python scripts/train_tpu_gan_accuracy.py --algo rca \
    --lam-feat 0.05 --lam-content 100 --lam-texture 0.001 --lam-adv 1 \
    --adv-ramp-steps 2560 --size 128 --n-train 2048 --n-val 64 \
    --batch-size 16 --epochs 60 --eval-every 5 \
    --tag rca-promoted --ckpt-dir runs/accuracy_ckpt_rca_promoted

run_item blind 2700 3600 python scripts/regen_artifacts.py --regen blind

echo "=== round5 queue-g done $(date -u +%FT%TZ)"
