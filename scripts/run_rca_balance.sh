#!/bin/bash
# RCA-GAN G-objective balance study (follow-up to run_rca_ablation.sh).
#
# The critic-norm ablation measured that removing BN does NOT fix the
# divergence — refuting the round-3 diagnosis.  The next causal candidate is
# the G-objective balance: by the reference's argument-shift quirk the pixel
# L1 gets weight 0.01 while the (here random-weight — no pretrained VGG19,
# documented deviation) feature MSE and the unbounded WGAN adversarial term
# get weight 1.  These runs isolate each term and look for a convergent
# operating point of the reference architecture (BN critic intact).
set -x
cd "$(dirname "$0")/.."

# (A) fidelity-only G (adv off, reference fidelity weights): does the
#     feat+content+texture stack denoise at all at this scale?
python scripts/train_tpu_gan_accuracy.py --algo rca --critic-norm bn \
  --epochs 40 --size 64 --n-train 256 --lam-adv 0 \
  --tag balance-noadv --ckpt-dir runs/balance_noadv

# (B) content-dominated G, adversarial on, reference BN critic:
#     candidate convergent operating point (attention-GAN-style L1 weight)
python scripts/train_tpu_gan_accuracy.py --algo rca --critic-norm bn \
  --epochs 40 --size 64 --n-train 256 \
  --lam-feat 0.05 --lam-content 100 --lam-adv 1 \
  --tag balance-l1 --ckpt-dir runs/balance_l1

# (C) same balance, critic BN removed: is the norm irrelevant once balanced?
python scripts/train_tpu_gan_accuracy.py --algo rca --critic-norm none \
  --epochs 40 --size 64 --n-train 256 \
  --lam-feat 0.05 --lam-content 100 --lam-adv 1 \
  --tag balance-l1-nonorm --ckpt-dir runs/balance_l1_nonorm

# (D) reference weights but adv AND feat off: pure 0.01*L1 + texture
#     (how weak is the reference's residual fidelity signal alone?)
python scripts/train_tpu_gan_accuracy.py --algo rca --critic-norm bn \
  --epochs 40 --size 64 --n-train 256 --lam-feat 0 --lam-adv 0 \
  --tag balance-l1tiny --ckpt-dir runs/balance_l1tiny

echo "RCA balance study done"
