#!/bin/bash
# Round-4 TPU queue (one chip, so strictly sequential):
#   1. stage-2 diffusion-gap promotion (VERDICT r3 #4): greedy-composed winner
#      of the stage-1 one-knob grid at the full 3200-step-class budget,
#      target >30.5 dB or a measured negative (runs/accuracy_log.jsonl,
#      tag gap-stage2).
#   2. C13 reference-scale hyperparameter study (VERDICT r3 #3): 25 trials x
#      5 epochs at the 256^2-patch protocol (reference runs 50 trials,
#      hyperparams_search.py:93-104), TPE + median pruner,
#      runs/trial_results_tpu_ref_scale.csv.
# Each step is timeout-bounded so a tunnel hang cannot wedge the queue.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
echo "=== queue start $(date -u +%FT%TZ)"
timeout 9300 python scripts/run_diffusion_gap_stage2.py
echo "=== stage2 rc=$? $(date -u +%FT%TZ)"
timeout 7200 python scripts/run_search_tpu.py --trials 25 --epochs 5 --size 256 \
    --n-train 256 --n-val 16 --batch-size 16 --engine xla --bf16 \
    --csv runs/trial_results_tpu_ref_scale.csv
echo "=== c13 rc=$? $(date -u +%FT%TZ)"
echo "=== queue done $(date -u +%FT%TZ)"
