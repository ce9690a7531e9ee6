"""Trainer tests: loss decreases, accumulation semantics, schedules, resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vub_image_denoising_tpu.data import ArrayPatchDataset, PatchLoader
from vub_image_denoising_tpu.data.device import normalize_u8
from vub_image_denoising_tpu.models import RDUNet
from vub_image_denoising_tpu.train import (
    DiffusionTrainer,
    SupervisedTrainer,
    TrainState,
    cosine_annealing_lr,
    make_optimizer,
    make_supervised_train_step,
    step_lr,
)


def _toy_pairs(n=16, size=16, c=3, seed=0):
    rng = np.random.RandomState(seed)
    gt = rng.randint(0, 256, (n, size, size, c), np.uint8)
    noisy = np.clip(
        gt.astype(np.float32) + rng.normal(scale=25, size=gt.shape), 0, 255
    ).astype(np.uint8)
    return noisy, gt


def _loader(batch_size=8, **kw):
    noisy, gt = _toy_pairs(**kw)
    ds = ArrayPatchDataset(noisy, gt)

    def tf(key, n, g):
        return normalize_u8(n), normalize_u8(g)

    return PatchLoader(ds, batch_size, shuffle=True, transform=tf, num_workers=2)


def test_step_lr_matches_torch_steplr():
    sched = step_lr(1e-4, steps_per_epoch=10, step_size=3, gamma=0.5)
    assert sched(0) == 1e-4
    assert sched(29) == 1e-4  # epoch 2
    assert sched(30) == 5e-5  # epoch 3
    assert sched(60) == 2.5e-5  # epoch 6


def test_cosine_lr_matches_torch_cosineannealing():
    sched = cosine_annealing_lr(2e-4, steps_per_epoch=1, t_max=10)
    np.testing.assert_allclose(sched(0), 2e-4)
    np.testing.assert_allclose(sched(5), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(sched(10), 0.0, atol=1e-12)


def test_cosine_lr_traces_under_jit():
    """Regression: optax evaluates schedules on the TRACED step counter inside
    the jitted train step; math.cos on a tracer raised ConcretizationTypeError
    for every adam/cosine config (found by the round-5 C13 retrain smoke)."""
    sched = cosine_annealing_lr(2e-4, steps_per_epoch=10, t_max=10)
    traced = jax.jit(sched)(jnp.asarray(50, jnp.int32))
    np.testing.assert_allclose(float(traced), sched(50), rtol=1e-6)


def test_supervised_step_decreases_loss():
    model = RDUNet(channels=3, base_filters=4)
    loader = _loader(batch_size=8)
    trainer = SupervisedTrainer(model, lr=1e-3, accumulation_steps=2, checkpoint_every=1000)
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((8, 16, 16, 3)), steps_per_epoch=2)
    state, loss0 = trainer.train_epoch(state, loader, epoch=0)
    for e in range(1, 4):
        state, loss = trainer.train_epoch(state, loader, epoch=e)
    assert loss < loss0


def test_accumulation_matches_sum_of_micro_grads():
    """One accumulated step == clip(sum of micro-batch grads) fed to the optimizer."""
    import optax

    model = RDUNet(channels=3, base_filters=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(2), x)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-2))

    step = make_supervised_train_step(model.apply, tx, accumulation_steps=2)
    state = TrainState.create(params, tx)
    new_state, _ = step(state, x, y)

    def loss_fn(p, xs, ys):
        return jnp.mean(jnp.abs(model.apply(p, xs) - ys))

    g1 = jax.grad(loss_fn)(params, x[:2], y[:2])
    g2 = jax.grad(loss_fn)(params, x[2:], y[2:])
    gsum = jax.tree_util.tree_map(jnp.add, g1, g2)
    updates, _ = tx.update(gsum, tx.init(params), params)
    expected = optax.apply_updates(params, updates)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_diffusion_trainer_epoch_and_resume(tmp_path):
    loader = _loader(batch_size=4)
    trainer = DiffusionTrainer(
        base_filters=4, timesteps=4, accumulation_steps=2, output_dir=str(tmp_path)
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((4, 16, 16, 3)), steps_per_epoch=4)
    state, loss = trainer.train_epoch(state, loader, jax.random.PRNGKey(1), epoch=0)
    assert np.isfinite(loss)
    vloss, denoised = trainer.validate(state, loader, epoch=0)
    assert np.isfinite(vloss)
    assert denoised.shape == (4, 16, 16, 3)

    path = trainer.save_epoch_checkpoint(state, epoch=0)
    assert "diffusion_RDUNet_model_checkpointed_epoch_1.pth" in path
    import os

    assert os.path.isdir(path + ".orbax"), "native orbax sidecar must be written"

    # resume (via the orbax sidecar) restores the FULL state exactly: params,
    # optimizer state, and epoch
    trainer2 = DiffusionTrainer(
        base_filters=4, timesteps=4, accumulation_steps=2, output_dir=str(tmp_path)
    )
    state2 = trainer2.init(jax.random.PRNGKey(9), jnp.zeros((4, 16, 16, 3)), steps_per_epoch=4)
    state2, start_epoch = trainer2.load_checkpoint(state2, path)
    assert start_epoch == 1
    for a, b in zip(jax.tree_util.tree_leaves((state.params, state.opt_state)),
                    jax.tree_util.tree_leaves((state2.params, state2.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # missing checkpoint -> epoch 0 (reference behavior, diffusion_RDUnet.py:191-193)
    _, e0 = trainer2.load_checkpoint(state2, str(tmp_path / "nope.pth"))
    assert e0 == 0


def _schedule_and_adam_counts(opt_state):
    """(schedule counts, optimizer counts) from an optax chain state."""
    sched, opt = [], []

    def rec(node):
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            name = type(node).__name__
            if name == "ScaleByScheduleState":
                sched.append(int(node.count))
                return
            if "count" in node._fields:
                opt.append(int(node.count))
            for c in node:
                if isinstance(c, tuple):
                    rec(c)
        elif isinstance(node, tuple):
            for c in node:
                rec(c)

    rec(opt_state)
    return sched, opt


def test_torch_pth_resume_fast_forwards_schedule(tmp_path):
    """Resuming from a reference-written .pth (model_state_dict + epoch +
    scheduler_state_dict, NO optax payload) must fast-forward the optax LR
    SCHEDULE counter to epoch*steps_per_epoch — the information the reference
    restores via scheduler_state_dict (diffusion_RDUnet.py:186-189) — while the
    optimizer counter stays 0: the reference's fresh Adam restarts at t=0 with
    full bias correction (fast-forwarding it over zero moment buffers would
    make the first post-resume update ~3x too large)."""
    from vub_image_denoising_tpu.utils import checkpoint as ckpt_io

    trainer = DiffusionTrainer(base_filters=4, timesteps=4, output_dir=str(tmp_path))
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((4, 16, 16, 3)),
                         steps_per_epoch=7)
    # a torch-reference-shaped checkpoint: epoch 3, no optax_state
    path = str(tmp_path / "ref.pth")
    ckpt_io.save_pth(
        path, state.params, epoch=3, prefix="unet.",
        extra={"optimizer_state_dict": {}, "scheduler_state_dict": {"last_epoch": 3}},
    )
    state2, start_epoch = trainer.load_checkpoint(state, path)
    assert start_epoch == 3
    expect = 3 * 7
    assert int(state2.step) == expect
    sched, opt = _schedule_and_adam_counts(state2.opt_state)
    assert sched and all(c == expect for c in sched), (sched, opt)
    assert all(c == 0 for c in opt), (sched, opt)
    # and the supervised trainer does the same
    model = RDUNet(channels=3, base_filters=4)
    st = SupervisedTrainer(model, checkpoint_dir=str(tmp_path))
    s_state = st.init(jax.random.PRNGKey(0), jnp.zeros((4, 16, 16, 3)),
                      steps_per_epoch=5)
    spath = str(tmp_path / "ref_sup.pth")
    ckpt_io.save_pth(spath, s_state.params, extra={"epoch": 2,
                                                   "optimizer_state_dict": {}})
    s_state2, ep = st.load_checkpoint(s_state, spath)
    assert ep == 2 and int(s_state2.step) == 10
    s_sched, s_opt = _schedule_and_adam_counts(s_state2.opt_state)
    assert s_sched and all(c == 10 for c in s_sched), (s_sched, s_opt)
    assert all(c == 0 for c in s_opt), (s_sched, s_opt)


def test_supervised_orbax_resume_is_exact(tmp_path):
    """SupervisedTrainer.maybe_checkpoint writes the orbax sidecar and
    load_checkpoint resumes the full state (params + optax) bit-exactly."""
    import os

    model = RDUNet(channels=3, base_filters=4)
    loader = _loader(batch_size=8)
    trainer = SupervisedTrainer(
        model, lr=1e-3, accumulation_steps=2, checkpoint_every=1,
        checkpoint_dir=str(tmp_path),
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((8, 16, 16, 3)), steps_per_epoch=2)
    state, _ = trainer.train_epoch(state, loader, epoch=0)
    path = trainer.maybe_checkpoint(state, epoch=0)
    assert path is not None and os.path.isdir(path + ".orbax")

    trainer2 = SupervisedTrainer(model, lr=1e-3, accumulation_steps=2,
                                 checkpoint_dir=str(tmp_path))
    state2 = trainer2.init(jax.random.PRNGKey(7), jnp.zeros((8, 16, 16, 3)), steps_per_epoch=2)
    state2, epoch = trainer2.load_checkpoint(state2, path)
    assert epoch == 1
    for a, b in zip(jax.tree_util.tree_leaves((state.params, state.opt_state)),
                    jax.tree_util.tree_leaves((state2.params, state2.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_pth_is_weights_only_safe_and_resumes_exactly(tmp_path):
    """Framework-written .pth checkpoints must load under torch.load's safe
    weights-only default (torch >= 2.6) — the optax state rides along as
    flattened tensors (checkpoint.py optax_state_to_safe) — and resuming from
    the .pth ALONE (no orbax sidecar) restores the optax state exactly."""
    import os
    import shutil

    import torch

    for make in (
        lambda: (
            DiffusionTrainer(base_filters=4, timesteps=4, output_dir=str(tmp_path)),
            True,
        ),
        lambda: (
            SupervisedTrainer(
                RDUNet(channels=3, base_filters=4), checkpoint_every=1,
                checkpoint_dir=str(tmp_path),
            ),
            False,
        ),
    ):
        trainer, is_diffusion = make()
        loader = _loader(batch_size=4)
        state = trainer.init(
            jax.random.PRNGKey(0), jnp.zeros((4, 16, 16, 3)), steps_per_epoch=4
        )
        if is_diffusion:
            state, _ = trainer.train_epoch(state, loader, jax.random.PRNGKey(1), epoch=0)
            path = trainer.save_epoch_checkpoint(state, epoch=0)
        else:
            state, _ = trainer.train_epoch(state, loader, epoch=0)
            path = trainer.maybe_checkpoint(state, epoch=0)

        # (a) safe load succeeds — no unpickling fallback needed
        payload = torch.load(path, map_location="cpu", weights_only=True)
        assert "optax_leaves" in payload

        # (b) .pth-only resume (sidecar removed) restores the optax state exactly
        shutil.rmtree(path + ".orbax")
        assert not os.path.exists(path + ".orbax")
        trainer2, _ = make()
        state2 = trainer2.init(
            jax.random.PRNGKey(9), jnp.zeros((4, 16, 16, 3)), steps_per_epoch=4
        )
        state2, epoch = trainer2.load_checkpoint(state2, path)
        assert epoch == 1
        for a, b in zip(
            jax.tree_util.tree_leaves((state.params, state.opt_state)),
            jax.tree_util.tree_leaves((state2.params, state2.opt_state)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_train_path_is_data_parallel(tmp_path, monkeypatch):
    """The primary CLI entry (train/diffusion.py::train) must feed mesh-sharded
    batches to the jitted step without the caller doing anything: every train batch
    is split over the 8-device 'data' axis with batch/n samples per device."""
    from PIL import Image

    from vub_image_denoising_tpu.train import diffusion as diff_mod

    # two 512x512 images -> 8 patches x 3 sigma-levels = 24 samples; val 1/3 -> 16/8
    folder = tmp_path / "DIV2K_train_HR.nosync"
    folder.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (512, 512, 3), np.uint8)).save(
            folder / f"im{i}.png"
        )

    seen = []
    orig = diff_mod.DiffusionTrainer.train_epoch

    def spying_train_epoch(self, state, loader, key, epoch):
        class SpyLoader:
            def __len__(self):
                return len(loader)

            def __iter__(self):
                for noisy, clean in loader:
                    seen.append(
                        (noisy.sharding, tuple(s.data.shape for s in noisy.addressable_shards))
                    )
                    yield noisy, clean

        return orig(self, state, SpyLoader(), key, epoch)

    monkeypatch.setattr(diff_mod.DiffusionTrainer, "train_epoch", spying_train_epoch)
    monkeypatch.chdir(tmp_path)  # train() writes runs/ relative to cwd

    args = diff_mod.build_arg_parser().parse_args([
        "--dataset_choice", "DIV2K", "--data_root", str(tmp_path),
        "--num_epochs", "1", "--batch_size", "8", "--num_workers", "2",
        "--validation_split", "0.3333", "--dataset_percentage", "1.0",
        "--base_filters", "4", "--timesteps", "2", "--augment",
        "--output_dir", str(tmp_path / "ckpt"),
    ])
    diff_mod.train(args)

    assert len(seen) == 2  # 16 train samples / batch 8
    n_dev = len(jax.devices())
    for sharding, shard_shapes in seen:
        assert len(sharding.device_set) == n_dev, "batch must span the whole mesh"
        assert set(shard_shapes) == {(8 // n_dev, 256, 256, 3)}


def test_biased_timestep_sampling_distribution():
    from vub_image_denoising_tpu.train.diffusion import sample_timesteps

    t = sample_timesteps(jax.random.PRNGKey(0), 4096, 20, "biased")
    t = np.asarray(t)
    assert t.min() >= 0 and t.max() <= 20
    # Beta(2,1) mean = 2/3 -> scaled mean ~13.3
    assert abs(t.mean() - 20 * 2 / 3) < 0.5

    tu = np.asarray(sample_timesteps(jax.random.PRNGKey(1), 4096, 20, "uniform"))
    assert set(np.unique(tu)).issubset(set(np.arange(21.0)))
    assert abs(tu.mean() - 10.0) < 0.5


def test_diffusion_loss_weights_are_plumbed():
    """combined_loss weights (diffusion_RDUnet.py:60-65) reach the jitted step:
    (0,1,0) reproduces the default exactly; adding mse+ssim changes the loss."""
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16, 16, 3).astype(np.float32)) * 0.1
    clean = x * 0.9
    losses = {}
    for name, lw in (("default", None), ("explicit", (0.0, 1.0, 0.0)),
                     ("mixed", (1.0, 1.0, 0.5))):
        kw = {} if lw is None else {"loss_weights": lw}
        tr = DiffusionTrainer(base_filters=4, timesteps=4, accumulation_steps=1, **kw)
        state = tr.init(jax.random.PRNGKey(0), x, steps_per_epoch=2)
        _, loss = tr._jit_step(state, jax.random.PRNGKey(1), x, clean)
        losses[name] = float(loss)
    assert losses["default"] == losses["explicit"]
    assert losses["mixed"] != losses["default"]
    assert np.isfinite(losses["mixed"])


def test_small_batch_accumulation_never_nans():
    """Batch smaller than accumulation_steps must degrade gracefully, not produce
    empty micro-batches (0/0 = NaN poisoning params) — regression for the
    reference-default accumulation_steps=4 with batch_size 2."""
    from vub_image_denoising_tpu.train.supervised import effective_accumulation

    assert effective_accumulation(2, 4) == 2
    assert effective_accumulation(6, 4) == 4  # non-divisible: keeps the memory bound
    assert effective_accumulation(8, 4) == 4
    assert effective_accumulation(1, 4) == 1
    assert effective_accumulation(127, 4) == 4  # coprime must NOT collapse to 1

    import optax

    model = RDUNet(channels=3, base_filters=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(2), x)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-2))
    step = make_supervised_train_step(model.apply, tx, accumulation_steps=4)
    state, loss = step(TrainState.create(params, tx), x, y)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(state.params))

    from vub_image_denoising_tpu.train.diffusion import DiffusionTrainer

    trainer = DiffusionTrainer(base_filters=4, timesteps=2, accumulation_steps=4)
    dstate = trainer.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)),
                          steps_per_epoch=1)
    dstate, dloss = trainer._jit_step(dstate, jax.random.PRNGKey(1), x, y)
    assert np.isfinite(float(dloss))


def test_supervised_engine_xla_matches_flax_step():
    """SupervisedTrainer(engine='xla') — the optimized-engine train path — takes
    the same first step as the flax path (same grads through a different conv
    structuring)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    states = {}
    for engine in ("flax", "xla"):
        trainer = SupervisedTrainer(RDUNet(channels=3, base_filters=4),
                                    engine=engine, accumulation_steps=2)
        state = trainer.init(jax.random.PRNGKey(2), jnp.zeros((4, 16, 16, 3)),
                             steps_per_epoch=1)
        state, loss = trainer._jit_step(state, x, y)
        states[engine] = (state, float(loss))
    assert abs(states["flax"][1] - states["xla"][1]) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(states["flax"][0].params),
                    jax.tree_util.tree_leaves(states["xla"][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_graceful_shutdown_checkpoints_and_stops(tmp_path):
    """SIGTERM during fit() (pool preemption) finishes the epoch, force-saves the
    checkpoint, and returns — instead of dying mid-epoch with nothing saved."""
    import os
    import signal

    model = RDUNet(channels=3, base_filters=4)
    trainer = SupervisedTrainer(model, checkpoint_every=1000,
                                checkpoint_dir=str(tmp_path))
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((4, 16, 16, 3)),
                         steps_per_epoch=2)

    sent = {"done": False}

    def loader():
        # deliver SIGTERM from inside epoch 0 (handler latches the flag)
        if not sent["done"]:
            sent["done"] = True
            os.kill(os.getpid(), signal.SIGTERM)
        for s in (0, 1):
            k = jax.random.fold_in(jax.random.PRNGKey(9), s)
            yield (jax.random.normal(k, (4, 16, 16, 3)),
                   jax.random.normal(jax.random.fold_in(k, 1), (4, 16, 16, 3)))

    class L:
        def __iter__(self):
            return loader()

        def __len__(self):
            return 2

    state, history = trainer.fit(state, L(), num_epochs=50)
    assert len(history) == 1  # stopped after the interrupted epoch, not 50
    assert (tmp_path / trainer.checkpoint_name).exists()  # force-saved
    # handlers restored: SIGTERM is back to its previous disposition
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, signal.Handlers.SIG_DFL)


def test_diffusion_validate_with_tensorboard_writer():
    """validate() with a live writer must log the scalar AND the image grids
    (the default CLI path has tensorboardX installed, so this branch runs in
    production; it once held a NameError on np that writer=None tests missed)."""

    class FakeWriter:
        def __init__(self):
            self.scalars, self.images = [], []

        def add_scalar(self, tag, value, step):
            self.scalars.append((tag, float(value), step))

        def add_image(self, tag, img, step, dataformats=None):
            self.images.append((tag, np.asarray(img).shape, step))

    trainer = DiffusionTrainer(base_filters=4, timesteps=4)
    trainer.writer = FakeWriter()
    state = trainer.init(
        jax.random.PRNGKey(0), jnp.zeros((4, 16, 16, 3)), steps_per_epoch=1
    )
    vloss, denoised = trainer.validate(state, _loader(batch_size=4), epoch=0)
    assert np.isfinite(vloss)
    assert trainer.writer.scalars and trainer.writer.scalars[0][0] == "Loss/validation"
    assert len(trainer.writer.images) == 3  # clean / noisy / denoised grids
