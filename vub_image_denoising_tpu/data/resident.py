"""Device-resident dataset: sample training batches entirely in HBM.

Greenfield TPU component (no reference counterpart — the reference's
DataLoader feeds from host RAM every step, custom_dataset.py:71-90).  On this
runtime the host→device hop is the training bottleneck for small models: the
batch-128 RDUNet-32 step takes ~0.57 s on-device but the uint8 batch transfer
holds the wall at ~2.3 s/step (BASELINE.md round-3 note: host-feed-bound).

The fix is to stop shipping pixels: a whole uint8 image bank lives in HBM
(a deduped grayscale DIV2K patch bank is ~2 GB — small next to 16 GB/chip)
and each step's batch is sampled, cropped, augmented, degraded, and
normalized ON DEVICE in one jitted dispatch keyed by the epoch/step RNG.
Per-step host→device traffic drops to one PRNG key.

``DeviceBankLoader`` mirrors the ``PatchLoader`` iteration contract and RNG
convention (``__len__`` = steps per epoch; per-epoch key =
``fold_in(key, epoch)``, per-step ``fold_in(epoch_key, step)``; a mutable
``.epoch`` so checkpoint resume can fast-forward it) — both trainers consume
it unchanged, and in ``sequential`` mode with the same key it yields batches
byte-identical to an unshuffled ``PatchLoader`` over the same items.

When NOT to use it: datasets that don't fit HBM next to the train state, or
multi-process meshes where each host should hold only its shard (the bank
here is replicated per process; the classic sharded-fetch ``PatchLoader``
covers that regime).
"""

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


class DeviceBankLoader:
    """Loader-compatible iterable over an HBM-resident uint8 image bank.

    Args:
      images_u8: ``(N, H, W, C)`` uint8 host array — uploaded to device once.
      batch_size: samples per yielded batch.
      transform: jittable ``(key, clean_u8_batch, *aux) -> batch`` (e.g.
        ``device.degrade_and_normalize``) applied inside the same jitted
        dispatch.  Defaults to identity over the crops.
      patch: square crop size; ``None``/H means whole images (no crop).
      mode: ``"sample"`` — indices drawn with replacement each step (pure
        streaming); ``"permute"`` — one on-device permutation of the logical
        index space per epoch, batches are its slices (the shuffle=True
        PatchLoader semantics); ``"sequential"`` — identity order (the
        shuffle=False validation semantics; honors ``drop_last``).
      n_logical: size of the logical index space (defaults to N).  With
        ``index_map`` this lets one stored patch back many logical samples
        (e.g. the reference's patch x noise-level index space,
        custom_dataset.py:62-69).
      index_map: jittable ``(idx,) -> (bank_indices, aux_tuple)`` mapping
        logical indices to bank rows plus per-sample aux arrays forwarded to
        ``transform`` (e.g. per-sample sigma).  Default: identity, no aux.
      steps_per_epoch: batches per epoch (defaults to the mode's natural
        length).
      drop_last: sequential mode only — keep (False, default: one short tail
        batch, its own compiled executable) or drop the tail.
      sharding: optional ``NamedSharding`` for the yielded batch (data
        parallelism) — applied as jit ``out_shardings`` so the batch is BORN
        sharded; the bank itself stays replicated.
      key/seed: sampling RNG; each epoch folds in ``self.epoch``, each step
        folds in the step index (PatchLoader's convention).
    """

    def __init__(
        self,
        images_u8: np.ndarray,
        batch_size: int,
        transform: Optional[Callable] = None,
        patch: Optional[int] = None,
        mode: str = "sample",
        n_logical: Optional[int] = None,
        index_map: Optional[Callable] = None,
        steps_per_epoch: Optional[int] = None,
        drop_last: bool = False,
        sharding=None,
        key: Optional[jax.Array] = None,
        seed: int = 0,
    ):
        images_u8 = np.asarray(images_u8)
        if images_u8.dtype != np.uint8 or images_u8.ndim != 4:
            raise ValueError(
                f"bank must be (N,H,W,C) uint8, got {images_u8.dtype} "
                f"{images_u8.shape}"
            )
        if mode not in ("sample", "permute", "sequential"):
            raise ValueError(f"unknown mode '{mode}'")
        n, h, w, _ = images_u8.shape
        patch = int(patch) if patch else None
        if patch is not None and (patch > h or patch > w):
            raise ValueError(f"patch {patch} exceeds bank images {h}x{w}")
        self.batch_size = int(batch_size)
        self.mode = mode
        self.epoch = 0
        self.key = key if key is not None else jax.random.PRNGKey(seed)
        self.n_logical = int(n_logical if n_logical is not None else n)
        self.bank = jax.device_put(images_u8)  # one upload, lives in HBM
        transform = transform if transform is not None else (lambda k, x: x)
        index_map = index_map if index_map is not None else (lambda i: (i, ()))

        if mode == "sequential":
            full, tail = divmod(self.n_logical, self.batch_size)
            self._steps = full + (1 if tail and not drop_last else 0)
            self._tail = 0 if drop_last else tail
        else:
            if mode == "permute" and self.batch_size > self.n_logical:
                # match PatchLoader's short-batch policy so flipping
                # device_data=True on a tiny split doesn't turn a working
                # config into a constructor crash
                import warnings

                warnings.warn(
                    f"batch_size {self.batch_size} exceeds the "
                    f"{self.n_logical}-item logical space; yielding one "
                    f"short batch of {self.n_logical} per epoch",
                    stacklevel=3,
                )
                self.batch_size = self.n_logical
            natural = max(1, self.n_logical // self.batch_size)
            self._steps = int(steps_per_epoch or natural)
            self._tail = 0
            if mode == "permute" and self._steps * self.batch_size > self.n_logical:
                raise ValueError(
                    f"permute mode: {self._steps} steps x {self.batch_size} "
                    f"exceeds the {self.n_logical}-item logical space"
                )
        if steps_per_epoch is not None and mode == "sequential":
            self._steps = int(steps_per_epoch)

        crop = patch is not None and (patch != h or patch != w)

        def gather(bank, key, idx):
            bank_idx, aux = index_map(idx)
            imgs = jnp.take(bank, bank_idx, axis=0)
            if crop:
                kt, kl, key = jax.random.split(key, 3)
                m = idx.shape[0]
                tops = jax.random.randint(kt, (m,), 0, h - patch + 1)
                lefts = jax.random.randint(kl, (m,), 0, w - patch + 1)
                imgs = jax.vmap(
                    lambda im, t, l: jax.lax.dynamic_slice(
                        im, (t, l, 0), (patch, patch, im.shape[-1])
                    )
                )(imgs, tops, lefts)
            return transform(key, imgs, *aux)

        def sample(bank, key):
            ki, key = jax.random.split(key)
            idx = jax.random.randint(ki, (self.batch_size,), 0, self.n_logical)
            return gather(bank, key, idx)

        kw = {} if sharding is None else {"out_shardings": sharding}
        self._sample = jax.jit(sample, **kw)
        # one executable for all full batches (idx is a (b,) argument, not a
        # static); the short sequential tail gets its own shape — and no
        # sharding, since it may not split over the mesh
        self._gather = jax.jit(gather, **kw)
        self._gather_tail = jax.jit(gather)
        self._perm = jax.jit(
            lambda ek: jax.random.permutation(ek, self.n_logical)
        )

    def __len__(self):
        return self._steps

    def __iter__(self):
        epoch_key = jax.random.fold_in(self.key, self.epoch)
        self.epoch += 1
        perm = self._perm(epoch_key) if self.mode == "permute" else None
        for step in range(self._steps):
            k = jax.random.fold_in(epoch_key, step)
            if self.mode == "sample":
                yield self._sample(self.bank, k)
            elif self.mode == "permute":
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, step * self.batch_size, self.batch_size
                )
                yield self._gather(self.bank, k, idx)
            else:
                start = step * self.batch_size
                if self._tail and step == self._steps - 1:
                    idx = jnp.arange(start, start + self._tail)
                    yield self._gather_tail(self.bank, k, idx)
                else:
                    idx = jnp.arange(start, start + self.batch_size)
                    yield self._gather(self.bank, k, idx)


def bank_loader_from_patches(
    ds,
    batch_size: int,
    transform: Callable,
    mode: str = "permute",
    sharding=None,
    key: Optional[jax.Array] = None,
    seed: int = 0,
    drop_last: bool = False,
    verbose: bool = True,
):
    """Build a :class:`DeviceBankLoader` from a ``FolderPatchDataset`` (or a
    ``Subset`` chain over one, as produced by ``load_data``'s splits).

    The dataset's logical index space is (patch x noise-level)
    (custom_dataset.py:62-69: ``idx % len(levels)`` picks sigma); storing that
    space verbatim would duplicate every patch L times, so the bank keeps each
    UNIQUE patch once and an on-device ``index_map`` carries logical index ->
    (bank row, sigma).  ``transform`` receives ``(key, clean_u8, sigma)`` —
    the same signature ``load_data`` feeds its host loaders.
    """
    from .loader import Subset  # local import: loader imports us lazily too

    li = np.arange(len(ds), dtype=np.int64)
    base = ds
    while isinstance(base, Subset):
        li = np.asarray(base.indices, np.int64)[li]
        base = base.dataset
    n_levels = len(base.noise_levels)
    levels = np.asarray(base.noise_levels, np.float32)
    patch_idx = li // n_levels
    uniq, inv = np.unique(patch_idx, return_inverse=True)
    clean, _ = base.gather_batch(uniq * n_levels)  # sigma of level 0, unused
    if verbose:
        mb = clean.nbytes / 1e6
        print(f"device bank: {len(uniq)} unique patches "
              f"({mb:.0f} MB uint8 in HBM) backing {len(li)} logical samples",
              flush=True)
    inv_dev = jax.device_put(jnp.asarray(inv, jnp.int32))
    sig_dev = jax.device_put(jnp.asarray(levels[li % n_levels], jnp.float32))

    def index_map(idx):
        return jnp.take(inv_dev, idx), (jnp.take(sig_dev, idx),)

    return DeviceBankLoader(
        clean, batch_size, transform=transform, mode=mode,
        n_logical=len(li), index_map=index_map, sharding=sharding,
        key=key, seed=seed, drop_last=drop_last,
    )
