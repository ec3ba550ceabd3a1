"""Training harness: train state, data-parallel steps, checkpoint/resume.

TPU-native replacement for the reference's PyTorch-Lightning orchestration
(SURVEY.md §5): DDP → `shard_map` data parallelism with `psum`-averaged
gradients; `ModelCheckpoint` + latest-glob auto-resume
(`examples/ae_res.py:1000-1024`) → orbax checkpointing with
`latest_step` resume; `self.log` → a simple metric logger.
"""

from __future__ import annotations

import logging
import os
import socket
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

log = logging.getLogger(f"mink_octtree_tpu@{socket.gethostname()}")


class TrainState(struct.PyTreeNode):
    """Minimal train state (params + mutable batch stats + optimizer)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)

    @classmethod
    def create_mixed_precision(cls, params, batch_stats, tx,
                               dtype=jnp.bfloat16):
        """bf16-parameter-storage state WITHOUT losing the fp32 init: the
        optimizer (a `mixed_precision_params`-wrapped chain) builds its
        fp32 master from the ORIGINAL `params`, and only the live copy is
        rounded to ``dtype``.  `create(cast_params(p), ...)` would seed the
        master from already-rounded values instead."""
        from .optim import cast_params  # local: keep module deps one-way

        opt_state = tx.init(params)  # master = exact fp32 params
        return cls(step=jnp.zeros((), jnp.int32),
                   params=cast_params(params, dtype),
                   batch_stats=batch_stats, opt_state=opt_state, tx=tx)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=opt_state,
        )


def make_train_step(loss_fn: Callable):
    """Single-device jitted step.  ``loss_fn(params, batch_stats, batch, rng)
    -> (loss, (aux, new_batch_stats))``."""

    @jax.jit
    def step(state: TrainState, batch, rng):
        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        return state.apply_gradients(grads, new_bs), loss, aux

    return step


def make_dp_train_step(loss_fn: Callable, mesh: Mesh, axis_name: str = "data"):
    """Data-parallel step over ``mesh``: the batch pytree carries a leading
    device axis (see `data.collate.stack_devices`); parameters are
    replicated; per-device grads/metrics are `pmean`-ed over ICI — the
    reference's DDP all-reduce (`examples/multigpu_ddp.py:75-125`) as one
    SPMD program.  Inside the step, norm layers built with
    ``axis_name="data"`` sync their statistics (SyncBN parity)."""

    def device_step(state: TrainState, batch, rng):
        batch = jax.tree.map(lambda x: x[0], batch)  # drop device axis
        rng = rng[0]
        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        # Average in fp32 even under bf16 parameter storage: a bf16 pmean
        # tree-reduction adds per-device rounding that single-device bf16
        # training doesn't have, and `mixed_precision_params` upcasts the
        # result anyway — upcasting first keeps the master update exact.
        grads = jax.tree.map(
            lambda g: g.astype(jnp.float32)
            if jnp.issubdtype(g.dtype, jnp.floating) else g, grads)
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        aux = jax.lax.pmean(aux, axis_name)
        new_bs = jax.lax.pmean(new_bs, axis_name)
        return state.apply_gradients(grads, new_bs), loss, aux

    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(sharded)


def split_device_rngs(rng: jax.Array, num_devices: int) -> jax.Array:
    return jax.random.split(rng, num_devices)


# ---------------------------------------------------------------------------
# Checkpointing (orbax) — reference parity: ModelCheckpoint every N epochs +
# auto-resume from the latest file (`ae_res.py:1000-1024`,
# `diffusion.py:846-853`); cross-model VAE→diffusion handoff loads the
# `model.` subtree (`diffusion.py:815-817`).
# ---------------------------------------------------------------------------


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: TrainState, force: bool = False):
        import orbax.checkpoint as ocp

        payload = {"params": state.params, "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state, "step": state.step}
        self.mngr.save(step, args=ocp.args.StandardSave(payload), force=force)
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None
                ) -> TrainState:
        """Auto-resume: restore into the given (template) state."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self.latest_step()
        if step is None:
            return state
        template = {"params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state, "step": state.step}
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(template))
        return state.replace(params=restored["params"],
                             batch_stats=restored["batch_stats"],
                             opt_state=restored["opt_state"],
                             step=restored["step"])

    def restore_params(self, params_template, step: Optional[int] = None):
        """Cross-model handoff: load only the params subtree (the diffusion
        script strips the VAE's `model.` prefix the same way,
        `diffusion.py:815-817`)."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self.mngr.restore(
            step, args=ocp.args.PyTreeRestore({"params": params_template},
                                              partial_restore=True))
        return restored["params"]

    def restore_vars(self, params_template, batch_stats_template=None,
                     step: Optional[int] = None):
        """Restore params (+ batch_stats) WITHOUT the optimizer state — for
        consumers holding a different optimizer than the trainer (e.g. the
        conditioning script loading the generalization VAE).  Returns
        ``{"params": ..., "batch_stats": ...}``."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        tmpl = {"params": params_template,
                "batch_stats": batch_stats_template or {}}
        restored = self.mngr.restore(
            step, args=ocp.args.PyTreeRestore(tmpl, partial_restore=True))
        return {"params": restored["params"],
                "batch_stats": restored.get("batch_stats", {})}
