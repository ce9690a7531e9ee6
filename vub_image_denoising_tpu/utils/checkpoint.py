"""Checkpoint IO: native orbax checkpoints + reference-compatible ``.pth`` interop.

The reference saves ``torch.save`` dicts (SURVEY.md §5):
- diffusion: ``{epoch, model_state_dict, optimizer_state_dict, scheduler_state_dict}``
  per epoch (diffusion_RDUnet.py:170-178), model keys prefixed ``unet.`` because the
  saved module is the DiffusionModel wrapper;
- supervised RDUNet: ``{model_state_dict, optimizer_state_dict}`` (RDUNet_model.py:252-261);
- GANs: ``{epoch, generator_state_dict, discriminator_state_dict, ...}``
  (paper_gan.py:447-453) or separate generator/discriminator files.
Loaders must tolerate both dict-wrapped and bare state_dicts (evaluate_model.py:94-110).

We keep full read/write compatibility with those layouts via torch (CPU) pickle, mapping
between torch NCHW/OIHW tensors and our NHWC/HWIO pytrees:
- conv weight  OIHW  <-> HWIO kernel        (transpose (3,2,0,1) / (2,3,1,0))
- convT weight (Cin,Cout,kh,kw) <-> our (kh,kw,Cin,Cout) (transpose (2,3,0,1) both ways)
- PReLU weight (C,)  <-> alpha (C,)
Our flax param paths mirror the torch attribute names (nn/blocks.py), so name mapping is
mechanical: drop the ``core`` wrapper level, join with dots, rename kernel/alpha->weight.

Native checkpoints use orbax (atomic, async-capable) and store the full train state.
"""

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# torch .pth interop
# ---------------------------------------------------------------------------

def _is_transpose_conv(path_names) -> bool:
    """Transpose-conv param paths — their kernels are stored (kh,kw,cin,cout) =
    torch ConvTranspose2d weight (Cin,Cout,kh,kw).transpose(2,3,0,1):
    'conv_t' modules (nn/blocks.py UpsampleBlock, rca_gan.py DeconvBlock) and the
    'upconvN' modules (attention_unet.py _UpconvN002, experimental.py UNet)."""
    return any(n == "conv_t" or n.startswith("upconv") for n in path_names)


def _torch_key(tnames) -> str:
    """Dotted torch state_dict key for a hygienized flax path (shared by export
    AND import so the naming rules cannot drift apart)."""
    leafname = tnames[-1]
    modname = tnames[:-1]
    if leafname in ("kernel", "alpha", "scale"):  # conv/dense kernel, PReLU, BN scale
        return ".".join(modname + ["weight"])
    if leafname == "bias":
        return ".".join(modname + ["bias"])
    if leafname == "mean":
        return ".".join(modname + ["running_mean"])
    if leafname == "var":
        return ".".join(modname + ["running_var"])
    return ".".join(tnames)


def _torch_key_and_tensor(names, leaf):
    """Map one flax path + leaf to (torch dotted key, numpy tensor in torch layout).

    Path hygiene: the internal 'core' wrapper level (models/rdunet.py) and the BN
    'stats' sub-module level (nn/torch_layers.py TorchBatchNorm) are dropped.
    """
    names = [n for n in names if n not in ("core", "stats")]
    key = _torch_key(names)
    if names[-1] == "kernel":
        if leaf.ndim == 2:  # dense: ours (in, out) -> torch (out, in)
            return key, leaf.T
        if _is_transpose_conv(names):
            return key, leaf.transpose(2, 3, 0, 1)
        return key, leaf.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    return key, leaf


def params_to_torch_state_dict(variables: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Flatten flax variables into a torch state_dict.

    ``variables`` may be a bare param tree, ``{'params': ...}``, or a full
    ``{'params': ..., 'batch_stats': ...}`` dict (batch_stats become
    running_mean/running_var, with num_batches_tracked=0 emitted for torch
    load_state_dict(strict=True) compatibility).  ``prefix`` prepends e.g. ``unet.``
    for DiffusionModel-wrapped checkpoints.
    """
    import torch

    # one host gather for the whole tree (multi-process-safe for FSDP state;
    # host_replicated_copy is a collective — all processes reach this together)
    variables = host_replicated_copy(variables)

    collections = []
    if "params" in variables:
        collections.append(variables["params"])
        if "batch_stats" in variables:
            collections.append(variables["batch_stats"])
    else:
        collections.append(variables)

    out: Dict[str, Any] = {}
    for tree in collections:
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            names = [p.key for p in path]
            key, w = _torch_key_and_tensor(names, np.asarray(leaf))
            # torch.from_numpy needs a writable contiguous buffer (device_get
            # views are read-only; transposes are non-contiguous) — but leaves
            # that already qualify are wrapped without another copy
            if not (w.flags.c_contiguous and w.flags.writeable):
                w = np.array(w)  # one fresh contiguous writable copy
            out[prefix + key] = torch.from_numpy(w)
            if key.endswith("running_var"):
                out[prefix + key[: -len("running_var")] + "num_batches_tracked"] = (
                    torch.zeros((), dtype=torch.long)
                )
    return out


def torch_state_dict_to_params(
    state_dict: Dict[str, Any], params_template: Dict[str, Any], prefix: str = ""
) -> Dict[str, Any]:
    """Fill a flax param pytree (template gives structure/shapes) from a torch state_dict."""
    def convert_tree(tree):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for path, leaf in flat:
            names = [p.key for p in path]
            tnames = [n for n in names if n not in ("core", "stats")]
            leafname = tnames[-1]
            key = prefix + _torch_key(tnames)
            if key not in state_dict:
                raise KeyError(
                    f"checkpoint missing '{key}' (for param {'/'.join(names)}); "
                    f"available keys start with: {list(state_dict)[:5]}"
                )
            w = state_dict[key]
            w = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)
            if leafname == "kernel":
                if w.ndim == 2:
                    w = w.T  # torch (out,in) -> ours (in,out)
                elif _is_transpose_conv(tnames):
                    w = w.transpose(2, 3, 0, 1)  # (ci,co,kh,kw) -> (kh,kw,ci,co)
                else:
                    w = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            if w.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch for {key}: ckpt {w.shape} vs model {leaf.shape}"
                )
            leaves.append(jnp.asarray(w, dtype=leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    if "params" in params_template:
        out = {"params": convert_tree(params_template["params"])}
        if "batch_stats" in params_template:
            out["batch_stats"] = convert_tree(params_template["batch_stats"])
        return out
    return convert_tree(params_template)


def load_torch_payload(path: str, *, allow_pickle: bool = False):
    """torch.load with the safe ``weights_only=True`` path first.

    Reference-layout checkpoints and external weights (VGG/LPIPS/DISTS) are
    tensors/ints/dicts and load safely.  Only our own .pth sidecars carrying a
    pickled numpy optax tree ("optax_state") need the unsafe fallback — which
    executes arbitrary pickle code, so it is gated on ``allow_pickle=True``
    (passed only by trainer resume paths on files this framework wrote or the
    user explicitly pointed a resume flag at).  External-weight loaders keep the
    default and fail loudly instead of unpickling untrusted bytes.
    """
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_pickle:
            raise ValueError(
                f"{path!r} failed the safe weights-only torch.load ({e}); refusing "
                "the unpickling fallback for a file not marked trusted. If this is "
                "a checkpoint you trust (e.g. one written by this framework with "
                "an optax-state sidecar), load it via a trainer resume path or "
                "pass allow_pickle=True."
            ) from e
        import warnings

        warnings.warn(
            f"{path!r}: safe weights-only load failed; falling back to full "
            "unpickling (executes pickle code — trusted files only)",
            stacklevel=2,
        )
        return torch.load(path, map_location="cpu", weights_only=False)


def host_replicated_copy(tree):
    """Host numpy copy of a (possibly sharded) pytree, correct on pods.

    ``jax.device_get`` raises for arrays spanning non-addressable devices
    (FSDP-sharded state on a multi-process mesh); ``process_allgather``
    reassembles the full value on every host instead.  Single-process arrays
    (including locally-sharded FSDP state) gather via plain device_get.  On a
    multi-process mesh this is a COLLECTIVE — every process must call it."""
    leaves = jax.tree_util.tree_leaves(tree)
    needs_allgather = jax.process_count() > 1 and any(
        getattr(x, "sharding", None) is not None
        and not x.sharding.is_fully_replicated
        and not getattr(x, "is_fully_addressable", True)
        for x in leaves
    )
    if needs_allgather:
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(tree, tiled=True)
    return jax.device_get(tree)


def _this_process_writes() -> bool:
    """On a multi-process mesh only process 0 writes checkpoint files (all
    processes participate in the gathers); single-process always writes."""
    return jax.process_count() <= 1 or jax.process_index() == 0


def optax_state_to_safe(opt_state) -> list:
    """Flatten an optax state pytree to a list of torch tensors.

    The pytree STRUCTURE (optax namedtuples like ``ScaleByAdamState``) cannot be
    pickled safely — ``torch.load(weights_only=True)`` rejects non-allowlisted
    classes — so only the leaves are stored; restore rebuilds the structure from
    the live trainer's own opt_state template (``safe_to_optax_state``).  This
    keeps framework-written .pth files loadable with plain ``torch.load``
    defaults (torch >= 2.6 is weights-only by default)."""
    import torch

    leaves = jax.tree_util.tree_leaves(host_replicated_copy(opt_state))
    out = []
    for leaf in leaves:
        a = np.asarray(leaf)
        if a.dtype.kind not in "fiub" or a.dtype.itemsize == 0:
            a = a.astype(np.float32)
        elif not (a.flags.c_contiguous and a.flags.writeable):
            # torch.from_numpy rejects read-only views (device_get leaves)
            a = np.array(a)
        try:
            out.append(torch.from_numpy(a))
        except TypeError:
            # dtype torch can't view (e.g. ml_dtypes bfloat16): go through f32
            out.append(torch.from_numpy(a.astype(np.float32)))
    return out


def safe_to_optax_state(leaves, template):
    """Rebuild an optax state from ``optax_state_to_safe`` leaves + a live
    template with the same optimizer config; casts each leaf to the template
    leaf's dtype.  Raises ValueError on a leaf-count mismatch (different
    optimizer/schedule than the one that wrote the checkpoint)."""
    flat, treedef = jax.tree_util.tree_flatten(template)
    if len(flat) != len(leaves):
        raise ValueError(
            f"checkpointed optax state has {len(leaves)} leaves but the "
            f"trainer's optimizer expects {len(flat)} — optimizer configs differ"
        )
    new = [
        jnp.asarray(np.asarray(v), t.dtype) if hasattr(t, "dtype") else v
        for t, v in zip(flat, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new)


def save_pth(
    path: str,
    params: Dict[str, Any],
    *,
    epoch: Optional[int] = None,
    prefix: str = "",
    extra: Optional[Dict[str, Any]] = None,
    bare: bool = False,
):
    """Write a reference-layout .pth checkpoint (torch zip pickle).

    ``bare=True`` writes the bare state_dict (final-model layout,
    diffusion_RDUnet.py:284-286); otherwise a dict with ``model_state_dict`` and
    optionally ``epoch`` plus any ``extra`` entries (e.g. optimizer/scheduler stand-ins).
    """
    import torch

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # the gather inside params_to_torch_state_dict is a collective on
    # multi-process meshes: ALL processes run it, only process 0 writes
    sd = params_to_torch_state_dict(params, prefix=prefix)
    if bare:
        if _this_process_writes():
            _atomic_torch_save(sd, path)
        return
    payload: Dict[str, Any] = {"model_state_dict": sd}
    if epoch is not None:
        payload["epoch"] = epoch
    if extra:
        payload.update(extra)
    if _this_process_writes():
        _atomic_torch_save(payload, path)


def _atomic_torch_save(obj, path: str):
    """torch.save via temp file + os.replace: a SIGTERM/SIGKILL mid-save (the
    timeout/tunnel-wedge scenario periodic checkpointing insures against) must
    not corrupt an existing checkpoint it is overwriting in place."""
    import torch

    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        torch.save(obj, tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_pth(
    path: str,
    params_template: Dict[str, Any],
    *,
    prefix: str = "",
    key: str = "model_state_dict",
    allow_pickle: bool = False,
):
    """Read a reference-layout .pth checkpoint into a param pytree.

    Tolerates both dict-wrapped and bare state_dicts (evaluate_model.py:94-110).
    Returns (params, payload_dict_or_None).
    """
    payload = load_torch_payload(path, allow_pickle=allow_pickle)
    if isinstance(payload, dict) and key in payload:
        sd = payload[key]
    else:
        sd, payload = payload, None
    params = torch_state_dict_to_params(sd, params_template, prefix=prefix)
    return params, payload


# ---------------------------------------------------------------------------
# native orbax checkpoints
# ---------------------------------------------------------------------------

def save_orbax(path: str, state: Any):
    """Atomically save a full train-state pytree with orbax.

    Sharded states (FSDP/TP) save SHARD-NATIVE: pass the sharded arrays
    directly — orbax writes each process's addressable shards without ever
    gathering the replicated full state (the save analog of born-sharded
    init).  Orbax is multihost-aware (internal ``sync_global_devices``
    barriers), so EVERY process must make this call — do not gate it on
    process 0."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # save into a sibling temp dir, then swap: force=True on the final path
    # would DELETE the existing checkpoint before writing the new one, so a
    # kill mid-save loses the only copy.  The fixed (pid-free) temp name keeps
    # every process of a multi-host save writing into the same directory; the
    # swap itself is metadata-only and runs on the writer process after
    # orbax's internal completion barrier.
    tmp = path + ".tmp-save"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, state, force=True)
    ckptr.wait_until_finished()
    if _this_process_writes():
        import shutil

        if os.path.isdir(path):
            old = path + ".tmp-old"
            if os.path.isdir(old):
                shutil.rmtree(old)
            os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old)
        else:
            os.rename(tmp, path)


def restore_orbax(path: str, template: Any):
    """Restore a pytree saved by save_orbax, using ``template`` for structure.

    Template leaves that are sharded ``jax.Array``s (or ShapeDtypeStructs
    carrying a sharding) are restored BORN-SHARDED into those exact shards —
    the replicated full state is never materialized, and a checkpoint written
    under one topology restores under another (8-way FSDP → single device and
    back; orbax reshards from the stored logical array)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)
