#!/bin/bash
# Round-4 TPU queue, part 2. Waits for part 1 (stage-2 gap promotion + C13
# reference-scale search) to release the chip, then:
#   1. regenerates the cheap artifact-of-record checkpoints the reset wiped
#      (s25 ~20 min, gan_attention ~5 min — scripts/regen_artifacts.py),
#   2. re-runs the serving sweep WARM (the committed runs/serve_sweep.json was
#      compile-polluted: a 0.72 req/s row with 12 s device means), with the
#      max-batch x clients grid and the codec-free raw mode (VERDICT r3 #7:
#      breakdown table + >15 req/s or a measured host/tunnel-cap statement),
#   3. fills the three missing stage-1 diffusion-gap rows (lr4, T10, bf64) so
#      the one-knob grid is complete for the record.
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for queue part 1 (pid $WAIT_PID)..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "=== queue2 start $(date -u +%FT%TZ)"
timeout 2400 python scripts/regen_artifacts.py --regen s25
echo "=== s25 rc=$? $(date -u +%FT%TZ)"
timeout 900 python scripts/regen_artifacts.py --regen gan_attention
echo "=== gan_attention rc=$? $(date -u +%FT%TZ)"
timeout 3600 python scripts/bench_serve.py \
    --checkpoint runs/accuracy_ckpt_s25/rdunet_denoising.pth --trusted-checkpoint \
    --bf16 --max-batch-sweep 16,32,64 --clients-sweep 16,32 --raw \
    --seconds 20 --out runs/serve_sweep.json
echo "=== serve sweep rc=$? $(date -u +%FT%TZ)"
COMMON="--algo diffusion --epochs 40 --batch-size 128 --n-train 2048
        --sched-steps-per-epoch 300 --device-data --eval-every 20"
timeout 2400 python scripts/train_tpu_accuracy.py $COMMON --lr 4e-4 \
    --tag gap-lr4 --ckpt-dir runs/gap_lr4
echo "=== gap-lr4 rc=$? $(date -u +%FT%TZ)"
timeout 2400 python scripts/train_tpu_accuracy.py $COMMON --lr 2e-4 --timesteps 10 \
    --tag gap-T10 --ckpt-dir runs/gap_T10
echo "=== gap-T10 rc=$? $(date -u +%FT%TZ)"
timeout 4800 python scripts/train_tpu_accuracy.py $COMMON --lr 2e-4 --base-filters 64 \
    --tag gap-bf64 --ckpt-dir runs/gap_bf64
echo "=== gap-bf64 rc=$? $(date -u +%FT%TZ)"
echo "=== queue2 done $(date -u +%FT%TZ)"
