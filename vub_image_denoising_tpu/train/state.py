"""Train state pytree + the sharding/resume plumbing shared by the trainers."""

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, tx):
        import jax.numpy as jnp

        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


class ShardedTrainerMixin:
    """Param-sharding and resume plumbing shared by SupervisedTrainer and
    DiffusionTrainer (and any future epoch-loop trainer).

    One home for the logic both trainers need identically — mesh construction
    per ``param_sharding`` mode, state placement, born-sharded init, the
    three-rung optimizer-state resume ladder, and the orbax-sidecar exact
    resume — so a sharding or resume fix cannot silently diverge between them.
    The host dataclass provides ``param_sharding`` and ``mesh`` fields and
    sets ``self.tx`` before calling ``_make_state``.
    """

    def ensure_mesh(self):
        """Create the mesh on first use: data-parallel over all local devices,
        or a ("data", "model") mesh (pure TP) when param_sharding='tp'."""
        if self.mesh is None:
            if self.param_sharding == "tp":
                from ..parallel.tp import make_tp_mesh

                self.mesh = make_tp_mesh()
            else:
                from ..parallel.mesh import make_mesh

                self.mesh = make_mesh()
        return self.mesh

    def _put_state(self, state):
        if self.param_sharding == "fsdp":
            from ..parallel.fsdp import put_fsdp

            return put_fsdp(state, self.mesh)
        if self.param_sharding == "tp":
            from ..parallel.tp import put_tp

            return put_tp(state, self.mesh)
        from ..parallel.mesh import put_replicated

        return put_replicated(state, self.mesh)

    def _make_state(self, module_init, key, *example_args):
        """TrainState born in its sharding.  fsdp/tp init every leaf directly
        into its shard (peak HBM at init is the SHARDED footprint — the full
        replicated params + f32 Adam moments are never materialized on one
        device); replicated mode inits once and broadcasts."""
        if self.param_sharding in ("fsdp", "tp"):
            if self.param_sharding == "fsdp":
                from ..parallel.fsdp import init_fsdp_state as init_sharded
            else:
                from ..parallel.tp import init_tp_state as init_sharded

            state = init_sharded(
                lambda k, *a: TrainState.create(module_init(k, *a), self.tx),
                self.mesh, key, *example_args,
            )
        else:
            params = jax.jit(module_init)(key, *example_args)
            state = TrainState.create(params, self.tx)
        return self._put_state(state)

    def _resume_opt_state(self, template_opt_state, payload, resume_step: int):
        """Optimizer-state resume ladder for a ``.pth`` checkpoint payload:
        (1) our safe flattened-tensor format ('optax_leaves'), (2) the pre-r3
        pickled-tree format ('optax_state'), (3) a reference-written file with
        neither — fast-forward the LR-schedule counter to the resumed global
        step (the information the reference restores via scheduler_state_dict,
        diffusion_RDUnet.py:186-189; Adam moments restart like the reference's
        fresh optimizer)."""
        if payload and "optax_leaves" in payload:
            from ..utils import checkpoint as ckpt_io

            return ckpt_io.safe_to_optax_state(
                payload["optax_leaves"], template_opt_state
            )
        if payload and "optax_state" in payload:
            import jax.numpy as jnp

            return jax.tree_util.tree_map(
                lambda t, v: jnp.asarray(v, t.dtype) if hasattr(t, "dtype") else v,
                template_opt_state,
                payload["optax_state"],
            )
        if resume_step > 0:
            from .schedules import fast_forward_opt_state

            return fast_forward_opt_state(template_opt_state, resume_step)
        return template_opt_state

    def _resume_from_sidecar(self, state, checkpoint_path: str):
        """Exact resume from the orbax sidecar (params + optax state + step).
        The inited ``state`` is the template: leaves restore BORN into its
        shardings (FSDP restores never materialize the replicated state).
        Returns ``(state, start_epoch)``."""
        from ..utils import checkpoint as ckpt_io
        from ..utils.checkpoint import load_torch_payload

        restored = ckpt_io.restore_orbax(checkpoint_path + ".orbax", state)
        payload = load_torch_payload(checkpoint_path, allow_pickle=True)
        epoch = int(payload.get("epoch", 0)) if isinstance(payload, dict) else 0
        return self._put_state(restored), epoch
