#!/bin/bash
# Round-5 TPU queue, part B (reordered remainder).  The original
# run_round5_queue.sh placed the stage-3 gap re-composition dead last behind
# ~8 h of queue, guaranteeing it would be cut at the round boundary; this
# revision keeps every explicit VERDICT r4 item ahead of it and then gives
# stage 3 a DYNAMIC budget: whatever wall-clock remains until the round-end
# deadline (UTC), so the one flexible-length job absorbs the slack instead of
# the queue tail being truncated blind.  Item order:
#   1. SIDD-protocol re-eval with the 30.43 dB stage-2 gap ckpt (VERDICT #7)
#   2. s25 checkpoint regen (VERDICT #3; unblocks the serve sweep and
#      re-validates runs/torch_parity.json's cited path)
#   3. WARM serving sweep -> overwrite runs/serve_sweep.json (VERDICT #2)
#   4. gap-T10 re-run (completes the stage-1 grid for the stage-3 composition;
#      the round-4 attempt wedged on a dead device stream and was killed)
#   5. C13 reference-scale study, 25 trials x 5 epochs x 256^2 (VERDICT #1;
#      timeout >= 11000 s per ADVICE r4; trial-level catch= makes a tunnel
#      blip cost one trial, not the study)
#   6. RCA-GAN promotion at 128^2/2048 imgs (VERDICT #4, ablation row #7
#      weights, late erosion stabilized by --adv-ramp-steps)
#   7. C17 hybrid at the fidelity-anchored weights, 4x smoke length (VERDICT #5)
#   8. blind checkpoint regen (VERDICT #3)
#   9. stage-3 diffusion-gap re-composition over the completed grid
#      (gap-lr4 +1.16 dB and gap-bf64 +1.13 dB were NOT in stage 2's
#      composition), budget = time to DEADLINE_UTC; skipped if < 2400 s remain
# Every trainer run is snapshot-safe: SIGTERM appends a {"partial": true} row
# and <ckpt_dir>/progress.json survives SIGKILL.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
DEADLINE_UTC="${DEADLINE_UTC:-16:50}"

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for bench (pid $WAIT_PID)..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi
echo "=== round5 queue-b start $(date -u +%FT%TZ)"

timeout 2400 python scripts/measure_sidd_eval.py \
    --checkpoint runs/gap_stage2/diffusion_RDUNet_model_checkpointed_epoch_200.pth \
    --content synthetic --engines xla
echo "=== sidd-gap-stage2 rc=$? $(date -u +%FT%TZ)"

timeout 3600 python scripts/regen_artifacts.py --regen s25
echo "=== s25 rc=$? $(date -u +%FT%TZ)"

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

# stage 3: all remaining wall-clock until the deadline, minus teardown slack
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

echo "=== round5 queue-b done $(date -u +%FT%TZ)"
