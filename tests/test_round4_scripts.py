"""Round-4 script surfaces: the artifact-of-record manifest and the diffusion
quality-gap stage-2 promotion (VERDICT r3 items #4 and #6).

These are host-side drivers (no device work), so the tests run them directly.
"""

import json
import os
import shlex
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import regen_artifacts  # noqa: E402
import run_diffusion_gap_stage2 as stage2  # noqa: E402


def test_regen_manifest_commands_reference_existing_scripts():
    """Every regeneration command must start with a script that exists in-repo
    (a manifest row whose command rots is worse than no manifest)."""
    assert regen_artifacts.MANIFEST, "manifest must not be empty"
    names = [e[0] for e in regen_artifacts.MANIFEST]
    assert len(names) == len(set(names)), "duplicate manifest names"
    for name, path, marker, cmd, cost, row in regen_artifacts.MANIFEST:
        argv = shlex.split(cmd)
        assert argv[0] == "python", (name, cmd)
        assert os.path.exists(os.path.join(REPO, argv[1])), (
            f"manifest entry {name!r} cites missing script {argv[1]}")
        assert row, f"manifest entry {name!r} must cite its BASELINE.md row"
        # the liveness marker must live inside (or be derived from) the
        # artifact path — a sibling completion sidecar like
        # "<csv>.study.json" counts (written only when the run FINISHED)
        assert marker.startswith(path.rstrip("/")), (
            f"manifest entry {name!r}: marker {marker!r} outside {path!r}")


def test_regen_check_reports_live_and_missing(capsys):
    rows = regen_artifacts.check()
    out = capsys.readouterr().out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["live"] + len(summary["missing"]) == len(rows)
    # the s25 checkpoint is regenerated each round and backs torch-parity
    by_name = {r["name"]: r for r in rows}
    assert "s25" in by_name


def test_regen_unknown_name_exits():
    import pytest

    with pytest.raises(SystemExit):
        regen_artifacts.regen(["definitely-not-a-manifest-entry"])


def test_stage2_picks_best_gap_row_and_builds_command(tmp_path):
    log = tmp_path / "log.jsonl"
    rows = [
        {"tag": "gap-base", "psnr_best_db": 26.1, "lr": 2e-4,
         "loss_weights": "0,1,0", "t_dist": "uniform",
         "timesteps": 20, "base_filters": 32},
        {"tag": "gap-ssim", "psnr_best_db": 27.3, "lr": 2e-4,
         "loss_weights": "0,1,0.3", "t_dist": "uniform",
         "timesteps": 20, "base_filters": 32},
        # a completed stage-2 row must never be re-picked as its own winner
        {"tag": "gap-stage2", "psnr_best_db": 99.0},
        # non-gap rows (ablations etc.) are ignored
        {"tag": "ablate64", "psnr_best_db": 50.0},
    ]
    log.write_text("".join(json.dumps(r) + "\n" for r in rows))
    best = stage2.pick_winner(str(log))
    assert best["tag"] == "gap-ssim"
    cmd = stage2.stage2_command(best)
    assert "--loss-weights" in cmd and cmd[cmd.index("--loss-weights") + 1] == "0,1,0.3"
    assert cmd[cmd.index("--tag") + 1] == "gap-stage2"
    assert cmd[cmd.index("--epochs") + 1] == "200"


def test_stage2_excludes_partial_rows_and_stage3(tmp_path):
    """{"partial": true} snapshot rows lack the knob fields and must never be
    promoted as measured grid points; gap-stage3 records are promotions, not
    stage-1 rows (round-5 snapshot-safety)."""
    log = tmp_path / "log.jsonl"
    rows = [
        {"tag": "gap-base", "psnr_best_db": 26.1, "lr": 2e-4,
         "loss_weights": "0,1,0", "t_dist": "uniform",
         "timesteps": 20, "base_filters": 32},
        # a cut run's partial snapshot with a juicy PSNR: must be ignored
        {"tag": "gap-lr4", "psnr_best_db": 99.0, "partial": True},
        {"tag": "gap-stage3", "psnr_best_db": 98.0, "lr": 4e-4,
         "loss_weights": "0,1,0.3", "t_dist": "biased",
         "timesteps": 20, "base_filters": 32},
    ]
    log.write_text("".join(json.dumps(r) + "\n" for r in rows))
    best = stage2.pick_winner(str(log))
    assert best["tag"] == "gap-base"


def test_stage2_command_tag_and_ckpt_dir_override():
    base = {"tag": "gap-base", "psnr_best_db": 26.1, "lr": 2e-4,
            "loss_weights": "0,1,0", "t_dist": "uniform",
            "timesteps": 20, "base_filters": 32}
    cmd = stage2.stage2_command(base, tag="gap-stage3",
                                ckpt_dir="runs/gap_stage3")
    assert cmd[cmd.index("--tag") + 1] == "gap-stage3"
    assert cmd[cmd.index("--ckpt-dir") + 1] == "runs/gap_stage3"


def test_stage2_exits_without_stage1_rows(tmp_path):
    import pytest

    log = tmp_path / "empty.jsonl"
    log.write_text(json.dumps({"tag": "gap-stage2", "psnr_best_db": 1.0}) + "\n")
    with pytest.raises(SystemExit):
        stage2.pick_winner(str(log))


def test_bench_serve_batch_grid_dedupes_baseline():
    """--max-batch 1 (or a sweep containing 1) must not measure the identical
    single-dispatch config twice (wasted TPU wall + duplicate JSON rows)."""
    import importlib

    bench_serve = importlib.import_module("bench_serve")
    src = open(os.path.join(REPO, "scripts", "bench_serve.py")).read()
    assert "dict.fromkeys" in src, "grid dedupe removed"
    del bench_serve


def test_accuracy_scripts_reject_unapplied_flags():
    """Evidence-integrity guards: flags that a branch does not apply must be
    rejected up front, not silently recorded in the JSON evidence log."""
    import subprocess
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_tpu_accuracy.py"),
         "--algo", "supervised", "--t-dist", "biased"],
        capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode != 0 and "only apply to --algo diffusion" in (
        r.stderr + r.stdout)
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "train_tpu_gan_accuracy.py"),
         "--algo", "attention", "--lam-adv", "0"],
        capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode != 0 and "only apply to --algo rca/hybrid" in (
        r.stderr + r.stdout)


def test_stage2_epoch_cap_fits_queue_budget():
    """A heavy stage-1 winner (e.g. base_filters=64 at ~2.5x the bf32 epoch
    cost) must be capped to fit the queue's hard timeout instead of being
    SIGKILLed at 200 epochs and losing its evidence row."""
    heavy = {"tag": "gap-bf64", "psnr_best_db": 27.0, "lr": 2e-4,
             "loss_weights": "0,1,0", "t_dist": "uniform", "timesteps": 20,
             "base_filters": 64, "train_seconds": 2600.0, "epochs": 40}
    cmd = stage2.stage2_command(heavy, epochs=200, budget_s=8600)
    capped = int(cmd[cmd.index("--epochs") + 1])
    assert 40 <= capped < 200
    assert capped % 20 == 0, "must land on an eval-every-20 boundary"
    # a light winner is NOT capped
    light = dict(heavy, train_seconds=1236.0)
    cmd = stage2.stage2_command(light, epochs=200, budget_s=8600)
    assert cmd[cmd.index("--epochs") + 1] == "200"
    # rows without timing info (old logs) pass through unchanged
    del heavy["train_seconds"]
    cmd = stage2.stage2_command(heavy, epochs=200, budget_s=8600)
    assert cmd[cmd.index("--epochs") + 1] == "200"


def test_stage2_greedy_knob_composition():
    """One-knob rows that beat the gap-base re-anchor compose into a single
    stage-2 config; losing knobs are left at baseline values."""
    base = {"tag": "gap-base", "psnr_best_db": 26.18, "lr": 2e-4,
            "loss_weights": "0,1,0", "t_dist": "uniform", "timesteps": 20,
            "base_filters": 32, "train_seconds": 1278.0, "epochs": 40}
    rows = [
        base,
        dict(base, tag="gap-biased", t_dist="biased", psnr_best_db=26.92,
             train_seconds=1236.0),
        dict(base, tag="gap-lr4", lr=4e-4, psnr_best_db=27.1,
             train_seconds=1240.0),
        dict(base, tag="gap-mse", loss_weights="1,1,0", psnr_best_db=25.51),
        # multi-knob rows never contribute knobs directly
        dict(base, tag="gap-ssim-biased", loss_weights="0,1,0.3",
             t_dist="biased", psnr_best_db=26.5),
    ]
    composed = stage2.compose_winner(rows)
    assert composed["t_dist"] == "biased" and composed["lr"] == 4e-4
    assert composed["loss_weights"] == "0,1,0"  # mse lost, stays baseline
    assert composed["base_filters"] == 32 and composed["timesteps"] == 20
    # cost estimate multiplies per-knob ratios off the baseline
    assert abs(composed["train_seconds"]
               - 1278.0 * (1236.0 / 1278.0) * (1240.0 / 1278.0)) < 1.0
    # no baseline row -> no composition (caller falls back to best single)
    assert stage2.compose_winner(rows[1:]) is None
    # no winning knob -> None
    assert stage2.compose_winner([base, rows[3]]) is None


def test_stage2_composition_defers_to_measured_combo_row(tmp_path, capsys):
    """If the grid already measured the composed config and it LOST to the
    best single row, the script must promote the single winner instead."""
    base = {"tag": "gap-base", "psnr_best_db": 26.0, "lr": 2e-4,
            "loss_weights": "0,1,0", "t_dist": "uniform", "timesteps": 20,
            "base_filters": 32, "train_seconds": 1278.0, "epochs": 40}
    rows = [
        base,
        dict(base, tag="gap-biased", t_dist="biased", psnr_best_db=26.9),
        dict(base, tag="gap-ssim", loss_weights="0,1,0.3", psnr_best_db=26.4),
        # the composed config (biased+ssim), measured, and it lost to biased
        dict(base, tag="gap-ssim-biased", t_dist="biased",
             loss_weights="0,1,0.3", psnr_best_db=26.2),
    ]
    log = tmp_path / "log.jsonl"
    log.write_text("".join(json.dumps(r) + "\n" for r in rows))
    rc = stage2.main(["--log", str(log), "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "LOST" in out
    # the promoted command is the single winner: biased WITHOUT ssim
    cmd_line = [l for l in out.splitlines() if l.startswith("running:")][0]
    assert "--t-dist biased" in cmd_line
    assert "--loss-weights 0,1,0 " in cmd_line + " "


def test_c13_winner_pick_and_command(tmp_path):
    """The study->retrain loop closer (VERDICT r4 #6): best completed trial
    wins and its knobs land in the accuracy-protocol command verbatim."""
    import c13_winner
    csvp = tmp_path / "trials.csv"
    csvp.write_text(
        "base_filters,timesteps,optimizer_choice,scheduler_choice,lr,psnr\n"
        "64,15,adam,step,0.0008,20.97\n"
        "16,10,adam,cosine,0.0004,23.03\n"
        "48,20,adamw,step,0.0006,24.89\n")
    row = c13_winner.pick_winner(str(csvp))
    assert (row["base_filters"], row["optimizer_choice"]) == ("48", "adamw")
    cmd = c13_winner.winner_command(row, epochs=200)
    assert cmd[cmd.index("--base-filters") + 1] == "48"
    assert cmd[cmd.index("--optimizer") + 1] == "adamw"
    assert cmd[cmd.index("--scheduler") + 1] == "step"
    assert cmd[cmd.index("--timesteps") + 1] == "20"
    assert cmd[cmd.index("--lr") + 1] == "0.0006"
    assert cmd[cmd.index("--tag") + 1] == "c13-winner"


def test_stage2_command_carries_mid_run_insurance():
    """ADVICE r4 #5: long promoted runs must save resumable mid checkpoints."""
    base = {"tag": "gap-base", "psnr_best_db": 26.1, "lr": 2e-4,
            "loss_weights": "0,1,0", "t_dist": "uniform",
            "timesteps": 20, "base_filters": 32}
    cmd = stage2.stage2_command(base)
    assert cmd[cmd.index("--ckpt-every") + 1] == "40"
