#!/bin/bash
# Round-5 TPU queue (one chip, strictly sequential).  Ordered by VERDICT r4
# "Next round" priority, with the short high-value items first so a mid-round
# cut still lands them:
#   0. warm-cache bench.py run (the driver's round-end bench then hits warm)
#   1. SIDD-protocol re-eval with the stage-2 gap ckpt (VERDICT #7) — the
#      30.43 dB diffusion model through the C20 conventions
#   2. s25 checkpoint regen (VERDICT #3; also unblocks the serve sweep and
#      re-validates runs/torch_parity.json's cited path)
#   3. WARM serving sweep -> overwrite runs/serve_sweep.json (VERDICT #2)
#   4. C13 reference-scale study, 25 trials x 5 epochs x 256^2 (VERDICT #1).
#      timeout >= 11000 s per ADVICE r4 (the 7200 s round-4 budget was short);
#      trial-level catch means a tunnel blip now costs one trial, not the study
#   5. RCA-GAN promotion (VERDICT #4): the content-anchored convergent config
#      (ablation row #7) at 128^2 / 2048 images / 80-epoch StepLR(10,.5)
#      schedule, late erosion stabilized by --adv-ramp-steps
#   6. C17 hybrid at the fidelity-anchored weights, 4x smoke length (VERDICT #5)
#   7. blind checkpoint regen (VERDICT #3)
# Every trainer run is snapshot-safe: SIGTERM appends a {"partial": true} row
# and <ckpt_dir>/progress.json survives SIGKILL.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for round-4 queue2 (pid $WAIT_PID)..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "=== round5 queue start $(date -u +%FT%TZ)"

timeout 1200 python bench.py
echo "=== bench rc=$? $(date -u +%FT%TZ)"

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

# gap-T10 re-run: the round-4 queue's attempt wedged on a dead device stream
# at epoch 8 (futex wait, tunnel itself alive) and was killed; the stage-3
# composition below wants the complete grid
timeout 2400 python scripts/train_tpu_accuracy.py --algo diffusion --epochs 40 \
    --batch-size 128 --n-train 2048 --sched-steps-per-epoch 300 --device-data \
    --eval-every 20 --lr 2e-4 --timesteps 10 --tag gap-T10 --ckpt-dir runs/gap_T10
echo "=== gap-T10 rerun rc=$? $(date -u +%FT%TZ)"

timeout 2400 python scripts/train_tpu_gan_accuracy.py --algo hybrid \
    --lam-feat 0.05 --lam-content 100 --lam-texture 0.001 --lam-adv 1 \
    --adv-ramp-steps 320 --epochs 40 --eval-every 5 \
    --tag c17-anchored --ckpt-dir runs/accuracy_ckpt_hybrid_anchored
echo "=== c17 anchored rc=$? $(date -u +%FT%TZ)"

timeout 3600 python scripts/regen_artifacts.py --regen blind
echo "=== blind rc=$? $(date -u +%FT%TZ)"

# 8. stage-3: re-compose the diffusion-gap winner over the now-COMPLETE
#    stage-1 grid (gap-lr4 landed +1.25 dB and was NOT in the stage-2
#    composition) and train at the full budget, tag gap-stage3.  Last in the
#    queue: if the round ends mid-run the per-eval partial rows still record
#    the trajectory vs stage-2's 30.43 dB.
timeout 9300 python scripts/run_diffusion_gap_stage2.py \
    --tag gap-stage3 --ckpt-dir runs/gap_stage3 --budget-s 9000
echo "=== gap stage3 rc=$? $(date -u +%FT%TZ)"

echo "=== round5 queue done $(date -u +%FT%TZ)"
