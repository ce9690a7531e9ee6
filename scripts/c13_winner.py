"""Turn the C13 reference-scale study's winner into a full-budget retrain.

VERDICT r4 #6: the search subsystem exists to *improve* an accuracy number
(the reference built it for exactly that — hyperparams_search.py:11-104 feeds
its best trial back into training).  This script closes that loop: read the
study CSV (`runs/trial_results_tpu_ref_scale.csv`), pick the best completed
trial, and print — or run with --train — the 3200-step-class accuracy-protocol
command (`scripts/train_tpu_accuracy.py`) at the winner's config, tagged
``c13-winner`` so the evidence row is self-describing.

The study objective is the reference's 20*log10(1/sqrt(mse)) PSNR on [-1,1]
val tensors at a 5-epoch budget; the retrain evaluates the full T-step
improved sampler on the held-out protocol, so the two numbers are NOT
directly comparable — the comparison that matters is the retrained run's
psnr_best_db vs the gap-stage2/3 rows in runs/accuracy_log.jsonl.

Usage: python scripts/c13_winner.py [--csv ...] [--train] [--epochs 200]
"""

import argparse
import csv
import json
import os
import subprocess
import sys


def load_rows(csv_path):
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        sys.exit(f"no trial rows in {csv_path}")
    for r in rows:
        r["psnr"] = float(r["psnr"])
    return rows


def pick_winner(csv_path):
    """Best completed trial; the sidecar (if present) cross-checks the count."""
    rows = load_rows(csv_path)
    sidecar = csv_path + ".study.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
        print(f"study sidecar: {json.dumps(meta)}", flush=True)
    return max(rows, key=lambda r: r["psnr"])


def winner_command(row, epochs=200, tag="c13-winner", ckpt_dir="runs/c13_winner"):
    """The accuracy-protocol retrain command at the winner's config.

    lr/optimizer/scheduler/base_filters/timesteps come from the trial; the
    protocol knobs (batch 128, 2048 imgs, 300 sched-steps/virtual-epoch,
    device data, eval cadence) mirror the gap-stage2 run so rows compare 1:1.
    """
    return ["python", "scripts/train_tpu_accuracy.py", "--algo", "diffusion",
            "--epochs", str(epochs), "--batch-size", "128", "--n-train", "2048",
            "--sched-steps-per-epoch", "300", "--device-data",
            "--eval-every", "20", "--ckpt-every", "40",
            "--lr", str(float(row["lr"])),
            "--optimizer", row["optimizer_choice"],
            "--scheduler", row["scheduler_choice"],
            "--timesteps", str(int(row["timesteps"])),
            "--base-filters", str(int(row["base_filters"])),
            "--tag", tag, "--ckpt-dir", ckpt_dir]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--csv", default="runs/trial_results_tpu_ref_scale.csv")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--tag", default="c13-winner")
    ap.add_argument("--ckpt-dir", default="runs/c13_winner")
    ap.add_argument("--train", action="store_true",
                    help="run the retrain (default: print the command only)")
    args = ap.parse_args(argv)
    row = pick_winner(args.csv)
    print("winner trial:", json.dumps(row), flush=True)
    cmd = winner_command(row, epochs=args.epochs, tag=args.tag,
                         ckpt_dir=args.ckpt_dir)
    print("retrain command:", " ".join(cmd), flush=True)
    if args.train:
        return subprocess.call(cmd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
