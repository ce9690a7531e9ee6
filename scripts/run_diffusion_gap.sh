#!/bin/bash
# Diffusion quality-gap sweep (VERDICT r3 #4): aim the reference's own tuning
# knobs — combined_loss weights mse/charbonnier/ssim (diffusion_RDUnet.py:60-65),
# Beta(2,1)-biased t-sampling (:71-73), timesteps, base_filters — at the sigma=25
# accuracy protocol where diffusion (29.70 dB at 3200 steps) trails supervised
# (32.08 dB) by 2.4 dB.
#
# Stage 1 (this script): rank ~8 configs at a 640-step budget (the baseline
# config measured 26.09 dB at 600 steps — ranking resolution is adequate).
# Stage 2 (manual): take the winner to the full 3200-step budget; target
# >30.5 dB or a measured negative with per-config numbers.
set -x
cd "$(dirname "$0")/.."

COMMON="--algo diffusion --epochs 40 --batch-size 128 --n-train 2048
        --sched-steps-per-epoch 300 --device-data --eval-every 20"

# 1. baseline re-anchor: charbonnier-only, uniform t, lr 2e-4 (round-3 config)
python scripts/train_tpu_accuracy.py $COMMON --lr 2e-4 \
  --tag gap-base --ckpt-dir runs/gap_base

# 2. Beta(2,1)-biased t (the reference's own alternative, :71-73)
python scripts/train_tpu_accuracy.py $COMMON --lr 2e-4 --t-dist biased \
  --tag gap-biased --ckpt-dir runs/gap_biased

# 3. + SSIM term
python scripts/train_tpu_accuracy.py $COMMON --lr 2e-4 --loss-weights 0,1,0.3 \
  --tag gap-ssim --ckpt-dir runs/gap_ssim

# 4. + MSE term
python scripts/train_tpu_accuracy.py $COMMON --lr 2e-4 --loss-weights 1,1,0 \
  --tag gap-mse --ckpt-dir runs/gap_mse

# 5. higher lr
python scripts/train_tpu_accuracy.py $COMMON --lr 4e-4 \
  --tag gap-lr4 --ckpt-dir runs/gap_lr4

# 6. fewer interpolation steps (search space timesteps in {10,15,20})
python scripts/train_tpu_accuracy.py $COMMON --lr 2e-4 --timesteps 10 \
  --tag gap-T10 --ckpt-dir runs/gap_T10

# 7. bigger model (base_filters 64; reference search space caps at 64)
python scripts/train_tpu_accuracy.py $COMMON --lr 2e-4 --base-filters 64 \
  --tag gap-bf64 --ckpt-dir runs/gap_bf64

# 8. combined: ssim + biased
python scripts/train_tpu_accuracy.py $COMMON --lr 2e-4 --loss-weights 0,1,0.3 \
  --t-dist biased --tag gap-ssim-biased --ckpt-dir runs/gap_ssim_biased

echo "diffusion gap stage-1 sweep done"
