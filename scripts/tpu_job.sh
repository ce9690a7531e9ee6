#!/usr/bin/env bash
# TPU-VM training job — the TPU-native equivalent of the reference's SLURM script
# (job.ssh:1-22: 1 node, 1 GPU, module load, pip install, run the search).
#
# Usage (on a TPU VM or via `gcloud compute tpus tpu-vm ssh ... --command`):
#   bash scripts/tpu_job.sh [diffusion|search|supervised] [extra args...]
set -euo pipefail

# cwd import only — exporting PYTHONPATH breaks axon TPU backend registration in
# this environment (see CLAUDE.md), and the repo root on cwd is sufficient.
cd "$(dirname "$0")/.."

TASK="${1:-diffusion}"
shift || true

case "$TASK" in
  diffusion)
    exec python -m vub_image_denoising_tpu.train.diffusion "$@"
    ;;
  search)
    exec python - "$@" <<'EOF'
from vub_image_denoising_tpu.parallel.mesh import make_mesh, shard_batch
from vub_image_denoising_tpu.train.diffusion import build_arg_parser, load_data_for
from vub_image_denoising_tpu.search.hyperparams import run_search

args = build_arg_parser().parse_args()
train_loader, val_loader = load_data_for(args, sharding=shard_batch(make_mesh()))
run_search(train_loader, val_loader, n_trials=50, num_epochs=5)
EOF
    ;;
  supervised)
    exec python -c "
import sys
from vub_image_denoising_tpu.train.presets import rdunet_supervised_main
rdunet_supervised_main(sys.argv[1])" "$@"
    ;;
  *)
    echo "unknown task: $TASK (expected diffusion|search|supervised)" >&2
    exit 2
    ;;
esac
