"""Host->device data loading: threaded patch fetch + double-buffered device infeed.

Replaces the reference's torch ``DataLoader(num_workers=...)`` worker processes
(data_loader.py:76-77, SIDD_dataset.py:164-165) with a thread pool (PIL decode releases
the GIL) and an async device prefetcher: while the TPU computes step N, the next batch
is already being transferred and its on-device transform (noise/augment/normalize,
data/device.py) queued — the XLA analog of ``pin_memory=True`` + prefetching.

``load_data`` / ``load_sidd_data`` mirror the reference loader APIs
(data_loader.py:7-79, SIDD_dataset.py:99-168): validation_split, dataset_percentage,
only_validation, augment, per-split noise-level lists, use_rgb.
"""

import collections
import concurrent.futures
from typing import Any, Callable, Iterator, Optional, Sequence

import jax
import numpy as np


class Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    @property
    def channels(self):
        return self.dataset.channels

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[int(self.indices[idx])]

    def __getattr__(self, name):
        # expose gather_batch only when the base dataset has one, so the loader's
        # hasattr capability check stays honest through nested Subsets
        if name == "gather_batch":
            base = getattr(self.dataset, "gather_batch")

            def gather(indices):
                return base(self.indices[np.asarray(indices, np.int64)])

            return gather
        raise AttributeError(name)


def random_split(dataset, sizes: Sequence[int], seed: int = 0):
    """Shuffle-split a dataset into Subsets (torch.utils.data.random_split analog)."""
    assert sum(sizes) == len(dataset)
    perm = np.random.RandomState(seed).permutation(len(dataset))
    out, start = [], 0
    for s in sizes:
        out.append(Subset(dataset, perm[start : start + s]))
        start += s
    return out


def _collate(items):
    """Stack a list of per-sample tuples into a tuple of batched numpy arrays."""
    ncols = len(items[0])
    cols = []
    for c in range(ncols):
        col = [it[c] for it in items]
        if np.isscalar(col[0]) or np.ndim(col[0]) == 0:
            cols.append(np.asarray(col, np.float32))
        else:
            cols.append(np.stack(col))
    return tuple(cols)


def _batch_axis_shards(sh) -> int:
    """Number of ways dim 0 is split — the product of the mesh-axis sizes
    in the spec's first entry (NOT sh.num_devices: on a multi-axis mesh,
    e.g. ('data','tile'), only the 'data' extent divides the batch)."""
    spec = getattr(sh, "spec", None)
    if spec is None or len(spec) == 0 or spec[0] is None:
        return 1
    axes = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
    n = 1
    for a in axes:
        n *= sh.mesh.shape[a]
    return n


class PatchLoader:
    """Iterable over device-resident batches.

    Args:
      dataset: indexable with __len__, items are tuples of arrays/scalars.
      batch_size: global batch size (across all mesh devices).
      shuffle: reshuffle each epoch (seeded, epoch-folded).
      transform: optional jitted fn (key, *host_batch) -> device batch, applied with a
        fresh PRNG key per batch (noise injection / augmentation / normalization).
      sharding: optional jax.sharding.Sharding for the batch dim (data-parallel infeed).
      num_workers: fetch threads.  prefetch: in-flight device batches.
      drop_last: drop the trailing partial batch (static shapes keep XLA cache warm).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        transform: Optional[Callable] = None,
        key: Optional[jax.Array] = None,
        sharding=None,
        num_workers: int = 8,
        prefetch: int = 2,
        drop_last: bool = True,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.transform = transform
        self.key = key if key is not None else jax.random.PRNGKey(seed)
        self.sharding = sharding
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        """Number of batches __iter__ will actually yield.

        Matches the multi-process tail policy (_shard_trim): a drop_last=False
        tail batch smaller than the sharded batch axis is skipped entirely, so
        it must not be counted — consumers use len() for steps_per_epoch /
        per-batch averaging and would otherwise disagree with what ran."""
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        n_full, tail = divmod(n, self.batch_size)
        if (tail and self.sharding is not None and jax.process_count() > 1
                and tail < _batch_axis_shards(self.sharding)):
            tail = 0
        return n_full + (1 if tail else 0)

    def _shard_trim(self, n: int, n_shards: int) -> int:
        """Multi-process policy for a batch not divisible by the sharded batch
        axis (every process must place the same global shape, so the
        single-process one-device fallback is impossible).

        Training loaders (drop_last=True) only ever see full batches, so a
        non-divisible size means the CONFIGURED batch_size is wrong — fail
        fast rather than silently shrink every step of the run.  Validation
        loaders (drop_last=False) trim the batch to the largest shard multiple
        (the tail loses < n_shards samples from the metrics) instead of
        crashing.  Returns the kept length (0 = skip this batch)."""
        keep = (n // n_shards) * n_shards
        if keep == n:
            return n
        if self.drop_last:
            raise ValueError(
                f"batch_size {self.batch_size} does not split over the "
                f"{n_shards}-way sharded batch axis in a multi-process run; "
                "every training batch would be trimmed — pick a divisible "
                "batch_size"
            )
        if not getattr(self, "_warned_trim", False):
            self._warned_trim = True
            import warnings

            warnings.warn(
                f"batch of {n} does not split over the {n_shards}-way sharded "
                f"batch axis in a multi-process run; trimming to {keep} samples "
                "(pick a divisible batch_size to keep them all)",
                stacklevel=3,
            )
        return keep

    def _batch_indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]

    def __iter__(self) -> Iterator[Any]:
        epoch_key = jax.random.fold_in(self.key, self.epoch)
        self.epoch += 1

        gather = getattr(self.dataset, "gather_batch", None)
        # Multi-host: fetch/decode ONLY the rows this process's devices own —
        # O(global_batch / n_processes) host work per process instead of every
        # host decoding the full global batch (VUB_SHARDED_FETCH=0 restores the
        # redundant full-fetch path for debugging).
        import os as _os

        sharded_fetch = (
            self.sharding is not None
            and jax.process_count() > 1
            and _os.environ.get("VUB_SHARDED_FETCH", "1") != "0"
        )

        def fetch_rows(batch_idx):
            if gather is not None:
                # batched path: decode-cache + native patch gather (one C call)
                return tuple(gather(batch_idx))
            items = [self.dataset[int(i)] for i in batch_idx]
            return _collate(items)

        def fetch(batch_idx_and_step):
            batch_idx, step = batch_idx_and_step
            if sharded_fetch:
                from ..parallel.mesh import local_batch_rows

                n_shards = _batch_axis_shards(self.sharding)
                keep = self._shard_trim(len(batch_idx), n_shards)
                if keep == 0:
                    return None, None, step  # tail smaller than the mesh: skip
                rows = local_batch_rows(self.sharding, keep)
                host = fetch_rows(np.asarray(batch_idx)[:keep][rows])
                return host, (rows, keep), step
            return fetch_rows(batch_idx), None, step

        def to_device(host, meta, step):
            batch = host
            if meta is not None:
                # sharded-fetch path: host holds only this process's rows;
                # assemble the global array shard-by-shard
                from ..parallel.mesh import make_global_batch_from_local

                rows, keep = meta
                batch = tuple(
                    make_global_batch_from_local(x, rows, keep, self.sharding)
                    for x in batch
                )
            elif self.sharding is not None:
                sh = self.sharding
                # a batch not divisible by the sharded axis (e.g. the short tail
                # batch of an epoch) cannot be split; fall back to single-device
                # placement for it — LOUDLY, since a non-divisible batch_size
                # would silently disable data parallelism for the whole run
                n_shards = _batch_axis_shards(sh) if batch else 1
                if batch and batch[0].shape[0] % n_shards != 0:
                    if jax.process_count() > 1:
                        keep = self._shard_trim(batch[0].shape[0], n_shards)
                        if keep == 0:
                            return None  # tail smaller than the mesh: skip it
                        batch = tuple(x[:keep] for x in batch)
                    else:
                        if not getattr(self, "_warned_fallback", False):
                            self._warned_fallback = True
                            import warnings

                            warnings.warn(
                                f"batch of {batch[0].shape[0]} does not split over "
                                f"the {n_shards}-way sharded batch axis; placing it "
                                "on ONE device (no data parallelism for such "
                                "batches). Use a divisible batch_size.",
                                stacklevel=2,
                            )
                        sh = None
                from ..parallel.mesh import make_global_batch

                batch = tuple(
                    make_global_batch(x, sh) if sh is not None else jax.device_put(x)
                    for x in batch
                )
            if self.transform is not None:
                k = jax.random.fold_in(epoch_key, step)
                batch = self.transform(k, *batch)
            return batch

        work = list(enumerate(self._batch_indices()))
        if not work:
            return
        with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
            futures = collections.deque()
            pending = collections.deque((idx, step) for step, idx in work)

            def submit_next():
                if pending:
                    idx, step = pending.popleft()
                    futures.append(pool.submit(fetch, (idx, step)))

            # keep `prefetch` host fetches + device transfers in flight
            for _ in range(self.prefetch + 1):
                submit_next()
            device_queue = collections.deque()
            while futures or device_queue:
                while futures and len(device_queue) <= self.prefetch:
                    host, meta, step = futures.popleft().result()
                    dev = to_device(host, meta, step) if host is not None else None
                    if dev is not None:  # None = multi-process-skipped tail batch
                        device_queue.append(dev)
                    submit_next()
                if device_queue:
                    yield device_queue.popleft()


def _split_subsets(dataset, validation_split, dataset_percentage, seed):
    """The canonical percentage + train/val split (seeded identically for the
    host PatchLoader and the device-resident paths)."""
    total = len(dataset)
    subset_size = int(total * dataset_percentage)
    if subset_size < total:
        dataset, _ = random_split(dataset, [subset_size, total - subset_size], seed=seed)
    train_size = int((1 - validation_split) * len(dataset))
    val_size = len(dataset) - train_size
    return random_split(dataset, [train_size, val_size], seed=seed + 1)


def _split_loaders(
    dataset,
    batch_size,
    validation_split,
    dataset_percentage,
    num_workers,
    train_transform,
    val_transform,
    sharding,
    seed,
    key,
):
    train_ds, val_ds = _split_subsets(
        dataset, validation_split, dataset_percentage, seed
    )
    if key is None:
        key = jax.random.PRNGKey(seed)
    k_train, k_val = jax.random.split(key)
    train_loader = PatchLoader(
        train_ds, batch_size, shuffle=True, transform=train_transform,
        key=k_train, sharding=sharding, num_workers=num_workers, seed=seed,
    )
    # validation keeps the tail batch: drop_last would yield ZERO val batches for
    # small splits (val_size < batch_size) and permanently exclude up to
    # batch_size-1 samples from every metric; the occasional short batch only
    # costs one extra XLA compile (single-process: placed on one device;
    # multi-process: trimmed to a shard multiple — see PatchLoader.to_device)
    val_loader = PatchLoader(
        val_ds, batch_size, shuffle=False, transform=val_transform,
        key=k_val, sharding=sharding, num_workers=num_workers, seed=seed,
        drop_last=False,
    )
    return train_loader, val_loader


def load_data(
    image_folder: str,
    batch_size: int = 4,
    num_workers: int = 4,
    validation_split: float = 0.2,
    augment: bool = False,
    dataset_percentage: float = 1.0,
    only_validation: bool = False,
    include_noise_level: bool = False,
    train_noise_levels=None,
    val_noise_levels=None,
    use_rgb: bool = False,
    sharding=None,
    seed: int = 0,
    key: Optional[jax.Array] = None,
    device_data: bool = False,
):
    """Synthetic Gaussian-noise loaders over an image folder.

    API parity with dataset_creation/data_loader.py:7-79.  Yields device batches
    (noisy, clean) in [-1,1] — or (noisy, clean, sigma) with include_noise_level.

    ``device_data=True`` swaps the host PatchLoaders for device-resident
    ``DeviceBankLoader``s (data/resident.py): the deduped uint8 patch bank is
    uploaded once and batches are sampled/degraded/normalized on device —
    removes the per-step host→device transfer (the measured training
    bottleneck on this runtime).  Same splits/seeds as the host path; the
    shuffle RNG stream differs (on-device permutation vs numpy).
    """
    from functools import partial

    from .datasets import FolderPatchDataset
    from .device import degrade_and_normalize

    def make_transform(do_augment):
        def tf(k, clean_u8, sigma):
            noisy, clean = degrade_and_normalize(k, clean_u8, sigma, augment=do_augment)
            if include_noise_level:
                return noisy, clean, sigma
            return noisy, clean

        return tf

    if only_validation:
        ds = FolderPatchDataset(image_folder, noise_levels=val_noise_levels, use_rgb=use_rgb)
        if device_data:
            from .resident import bank_loader_from_patches

            return None, bank_loader_from_patches(
                ds, batch_size, make_transform(augment), mode="sequential",
                sharding=sharding, key=key, seed=seed,
            )
        loader = PatchLoader(
            ds, batch_size, shuffle=False, transform=make_transform(augment),
            key=key, sharding=sharding, num_workers=num_workers, seed=seed,
        )
        return None, loader

    train_ds = FolderPatchDataset(image_folder, noise_levels=train_noise_levels, use_rgb=use_rgb)
    if device_data:
        from .resident import bank_loader_from_patches

        tr, va = _split_subsets(train_ds, validation_split, dataset_percentage, seed)
        if key is None:
            key = jax.random.PRNGKey(seed)
        k_train, k_val = jax.random.split(key)
        train_loader = bank_loader_from_patches(
            tr, batch_size, make_transform(augment), mode="permute",
            sharding=sharding, key=k_train, seed=seed,
        )
        val_loader = bank_loader_from_patches(
            va, batch_size, make_transform(False), mode="sequential",
            sharding=sharding, key=k_val, seed=seed, drop_last=False,
        )
        return train_loader, val_loader
    return _split_loaders(
        train_ds, batch_size, validation_split, dataset_percentage, num_workers,
        make_transform(augment), make_transform(False), sharding, seed, key,
    )


def plot_examples(data_loader, num_examples: int = 4, path: str = "examples.png"):
    """Plot degraded/GT pairs from a loader (data_loader.py:81-126 /
    SIDD_dataset.py:178-232).  Saves to ``path`` (headless backend)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(num_examples, 2, figsize=(10, 5 * num_examples), squeeze=False)
    count = 0
    for batch in data_loader:
        degraded, gt = batch[0], batch[1]
        for i in range(degraded.shape[0]):
            if count >= num_examples:
                break
            for j, (img, title) in enumerate([(degraded[i], "Degraded Image"),
                                              (gt[i], "Ground Truth Image")]):
                arr = np.asarray(img, np.float32) * 0.5 + 0.5  # denormalize
                arr = np.clip(arr.squeeze(), 0, 1)
                axs[count, j].imshow(arr, cmap="gray" if arr.ndim == 2 else None)
                axs[count, j].set_title(title)
                axs[count, j].axis("off")
            count += 1
        if count >= num_examples:
            break
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)
    return path


def load_sidd_data(
    root_folder: str,
    batch_size: int = 4,
    num_workers: int = 2,
    validation_split: float = 0.2,
    augment: bool = False,
    dataset_percentage: float = 1.0,
    only_validation: bool = False,
    use_rgb: bool = False,
    sharding=None,
    seed: int = 0,
    key: Optional[jax.Array] = None,
):
    """Real-noise SIDD pair loaders.  API parity with SIDD_dataset.py:99-168."""
    from .datasets import SIDDPatchDataset
    from .device import normalize_pair

    def make_transform(do_augment):
        def tf(k, noisy_u8, clean_u8):
            return normalize_pair(k, noisy_u8, clean_u8, augment=do_augment)

        return tf

    if only_validation:
        ds = SIDDPatchDataset(root_folder, use_rgb=use_rgb)
        loader = PatchLoader(
            ds, batch_size, shuffle=False, transform=make_transform(augment),
            key=key, sharding=sharding, num_workers=num_workers, seed=seed,
        )
        return None, loader

    ds = SIDDPatchDataset(root_folder, use_rgb=use_rgb)
    return _split_loaders(
        ds, batch_size, validation_split, dataset_percentage, num_workers,
        make_transform(augment), make_transform(False), sharding, seed, key,
    )
