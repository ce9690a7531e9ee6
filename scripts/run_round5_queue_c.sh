#!/bin/bash
# Round-5 TPU queue, part C.  Same remainder as run_round5_queue_b.sh from the
# serve sweep onward, with ONE insertion: a bench.py run right after the s25
# regen.  The queue's original warm-up bench (part A step 0) was SIGKILLed at
# its 1200 s timeout still cold — the 01:57 machine reset wiped the compile
# cache and the overnight round-4 queue re-populated only TRAINING kernels, so
# bench's batch-128 inference compiles started from zero and ran past budget.
# That first attempt cached whatever it finished; this re-run completes the
# remainder and leaves the driver's round-end bench fully warm.
# See run_round5_queue_b.sh for the item-by-item rationale (VERDICT r4 refs).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
DEADLINE_UTC="${DEADLINE_UTC:-16:50}"

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for s25 regen (pid $WAIT_PID)..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi
echo "=== round5 queue-c start $(date -u +%FT%TZ)"

timeout 1800 python bench.py
echo "=== bench rc=$? $(date -u +%FT%TZ)"

timeout 3600 python scripts/bench_serve.py \
    --checkpoint runs/accuracy_ckpt_s25/rdunet_denoising.pth --trusted-checkpoint \
    --bf16 --max-batch-sweep 16,32,64 --clients-sweep 16,32 --raw \
    --seconds 20 --out runs/serve_sweep.json
echo "=== serve sweep rc=$? $(date -u +%FT%TZ)"

timeout 2400 python scripts/train_tpu_accuracy.py --algo diffusion --epochs 40 \
    --batch-size 128 --n-train 2048 --sched-steps-per-epoch 300 --device-data \
    --eval-every 20 --lr 2e-4 --timesteps 10 --tag gap-T10 --ckpt-dir runs/gap_T10
echo "=== gap-T10 rerun rc=$? $(date -u +%FT%TZ)"

timeout 12000 python scripts/run_search_tpu.py --trials 25 --epochs 5 --size 256 \
    --n-train 256 --n-val 16 --batch-size 16 --engine xla --bf16 \
    --csv runs/trial_results_tpu_ref_scale.csv
echo "=== c13 ref-scale rc=$? $(date -u +%FT%TZ)"

timeout 6000 python scripts/train_tpu_gan_accuracy.py --algo rca \
    --lam-feat 0.05 --lam-content 100 --lam-texture 0.001 --lam-adv 1 \
    --adv-ramp-steps 2560 --size 128 --n-train 2048 --n-val 64 \
    --batch-size 16 --epochs 60 --eval-every 5 \
    --tag rca-promoted --ckpt-dir runs/accuracy_ckpt_rca_promoted
echo "=== rca promotion rc=$? $(date -u +%FT%TZ)"

timeout 2400 python scripts/train_tpu_gan_accuracy.py --algo hybrid \
    --lam-feat 0.05 --lam-content 100 --lam-texture 0.001 --lam-adv 1 \
    --adv-ramp-steps 320 --epochs 40 --eval-every 5 \
    --tag c17-anchored --ckpt-dir runs/accuracy_ckpt_hybrid_anchored
echo "=== c17 anchored rc=$? $(date -u +%FT%TZ)"

timeout 3600 python scripts/regen_artifacts.py --regen blind
echo "=== blind rc=$? $(date -u +%FT%TZ)"

NOW=$(date -u +%s)
END=$(date -u -d "today $DEADLINE_UTC" +%s)
BUDGET=$(( END - NOW - 300 ))
if [ "$BUDGET" -ge 2400 ]; then
  echo "=== stage3 budget ${BUDGET}s (deadline $DEADLINE_UTC UTC)"
  timeout $(( BUDGET + 300 )) python scripts/run_diffusion_gap_stage2.py \
      --tag gap-stage3 --ckpt-dir runs/gap_stage3 --budget-s "$BUDGET"
  echo "=== gap stage3 rc=$? $(date -u +%FT%TZ)"
else
  echo "=== gap stage3 SKIPPED: only ${BUDGET}s left before $DEADLINE_UTC UTC"
fi

echo "=== round5 queue-c done $(date -u +%FT%TZ)"
