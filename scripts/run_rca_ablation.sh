#!/bin/bash
# RCA-GAN critic-normalization ablation + scale study (VERDICT r3 #1).
#
# Round 3 recorded the reference-architecture RCA-GAN (WGAN-GP, BatchNorm
# critic, paper_gan.py:175-200) diverging at the toy protocol and *asserted*
# the BN critic as the cause (BN couples samples inside the per-sample
# Lipschitz penalty — the WGAN-GP paper's own warning).  This grid upgrades
# the claim from asserted to measured: same run with the critic's BN removed /
# swapped for LayerNorm, plus a scale step toward the reference config
# (128^2 patches, 1024 images; the reference trains 200 epochs on 256^2,
# paper_gan.py:317-453).  Ends with the C17 diffusion-GAN hybrid smoke row.
#
# Each run appends one JSON line to runs/accuracy_log.jsonl (fields algo,
# critic_norm, n_train, tag, psnr_best_db, d_loss_final, ...).
set -x
cd "$(dirname "$0")/.."

# (a) baseline: the reference architecture at the round-3 toy protocol
python scripts/train_tpu_gan_accuracy.py --algo rca --critic-norm bn \
  --epochs 40 --size 64 --n-train 256 --tag ablate64 \
  --ckpt-dir runs/ablate_rca_bn64

# (b) identical run, critic BN removed
python scripts/train_tpu_gan_accuracy.py --algo rca --critic-norm none \
  --epochs 40 --size 64 --n-train 256 --tag ablate64 \
  --ckpt-dir runs/ablate_rca_none64

# (c) identical run, critic BN -> LayerNorm (the standard WGAN-GP fix)
python scripts/train_tpu_gan_accuracy.py --algo rca --critic-norm layernorm \
  --epochs 40 --size 64 --n-train 256 --tag ablate64 \
  --ckpt-dir runs/ablate_rca_ln64

# (d,e) scale step: 128^2 patches, 4x data, same 40-epoch budget (2560 steps)
python scripts/train_tpu_gan_accuracy.py --algo rca --critic-norm bn \
  --epochs 40 --size 128 --n-train 1024 --tag scale128 \
  --ckpt-dir runs/ablate_rca_bn128

python scripts/train_tpu_gan_accuracy.py --algo rca --critic-norm none \
  --epochs 40 --size 128 --n-train 1024 --tag scale128 \
  --ckpt-dir runs/ablate_rca_none128

# C17 smoke: the diffusion-GAN hybrid trains on hardware (short row)
python scripts/train_tpu_gan_accuracy.py --algo hybrid --epochs 10 \
  --size 64 --n-train 256 --tag c17smoke \
  --ckpt-dir runs/ablate_hybrid64

echo "RCA ablation grid done"
