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
    return "conv_t" in path_names


def params_to_torch_state_dict(params: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Flatten a flax ``{'params': ...}`` (or bare) pytree into a torch state_dict.

    Returns an OrderedDict-like plain dict of torch tensors keyed by dotted torch
    names.  ``prefix`` prepends e.g. ``unet.`` for DiffusionModel-wrapped checkpoints.
    """
    import torch

    tree = params.get("params", params)
    out: Dict[str, Any] = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        names = [p.key for p in path]
        leaf = np.asarray(jax.device_get(leaf))
        # drop the internal 'core' wrapper (models/rdunet.py)
        names = [n for n in names if n != "core"]
        leafname = names[-1]
        modname = names[:-1]
        if leafname == "kernel":
            if _is_transpose_conv(names):
                w = leaf.transpose(2, 3, 0, 1)  # (kh,kw,ci,co) -> (ci,co,kh,kw)
            else:
                w = leaf.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            key = ".".join(modname + ["weight"])
        elif leafname == "alpha":
            w = leaf
            key = ".".join(modname + ["weight"])
        elif leafname == "bias":
            w = leaf
            key = ".".join(modname + ["bias"])
        else:  # generic leaf (e.g. dense kernels in GAN heads use 'kernel' too)
            w = leaf
            key = ".".join(names)
        out[prefix + key] = torch.from_numpy(np.ascontiguousarray(w))
    return out


def torch_state_dict_to_params(
    state_dict: Dict[str, Any], params_template: Dict[str, Any], prefix: str = ""
) -> Dict[str, Any]:
    """Fill a flax param pytree (template gives structure/shapes) from a torch state_dict."""
    tree = params_template.get("params", params_template)
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in flat:
        names = [p.key for p in path]
        tnames = [n for n in names if n != "core"]
        leafname = tnames[-1]
        modname = tnames[:-1]
        if leafname in ("kernel", "alpha"):
            key = ".".join(modname + ["weight"])
        elif leafname == "bias":
            key = ".".join(modname + ["bias"])
        else:
            key = ".".join(tnames)
        key = prefix + key
        if key not in state_dict:
            raise KeyError(
                f"checkpoint missing '{key}' (for param {'/'.join(names)}); "
                f"available keys start with: {list(state_dict)[:5]}"
            )
        w = np.asarray(state_dict[key].detach().cpu().numpy() if hasattr(state_dict[key], "detach") else state_dict[key])
        if leafname == "kernel":
            if _is_transpose_conv(tnames):
                w = w.transpose(2, 3, 0, 1)  # (ci,co,kh,kw) -> (kh,kw,ci,co)
            else:
                w = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if w.shape != leaf.shape:
            raise ValueError(f"shape mismatch for {key}: ckpt {w.shape} vs model {leaf.shape}")
        leaves.append(jnp.asarray(w, dtype=leaf.dtype))
    new_tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return {"params": new_tree} if "params" in params_template else new_tree


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
    sd = params_to_torch_state_dict(params, prefix=prefix)
    if bare:
        torch.save(sd, path)
        return
    payload: Dict[str, Any] = {"model_state_dict": sd}
    if epoch is not None:
        payload["epoch"] = epoch
    if extra:
        payload.update(extra)
    torch.save(payload, path)


def load_pth(
    path: str,
    params_template: Dict[str, Any],
    *,
    prefix: str = "",
    key: str = "model_state_dict",
):
    """Read a reference-layout .pth checkpoint into a param pytree.

    Tolerates both dict-wrapped and bare state_dicts (evaluate_model.py:94-110).
    Returns (params, payload_dict_or_None).
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
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
    """Atomically save a full train-state pytree with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_orbax(path: str, template: Any):
    """Restore a pytree saved by save_orbax, using ``template`` for structure."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)
