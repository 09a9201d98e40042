"""Device-mesh parallelism: data-parallel training over ICI.

Replaces the reference's per-GPU process spawn + gloo DDP
(aot_plus/networks/managers/trainer.py:92-109, tools/train.py:114-118) with a
single-controller `jax.sharding.Mesh`: the batch is sharded over the 'data'
axis, params/opt-state are replicated, and XLA inserts the gradient psum over
ICI. SyncBN is unnecessary — BN is frozen in every shipped config
(configs/models/default.py:15).

Scaling beyond data parallelism (the reference has none — SURVEY §2
parallelism inventory) fits the same mesh: add axes and shard the
[S, B, HW, C] bank over 'data' x batch or 'model' x HW as needed.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1,),
              axes: Sequence[str] = ("data",)) -> Mesh:
    """Create a mesh; -1 absorbs all remaining devices."""
    devices = np.asarray(jax.devices())
    shape = tuple(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape = tuple(len(devices) // known if s == -1 else s for s in shape)
    n = int(np.prod(shape))
    return Mesh(devices[:n].reshape(shape), tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh):
    """Place a host batch with the leading dim split over 'data'."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def make_parallel_train_step(step_fn, mesh: Mesh, state_template=None):
    """jit the train step with explicit shardings: batch and per-sample
    shuffle sharded on 'data'; state replicated, OR — when the mesh has a
    'model' axis and a state template is given — tensor-parallel
    megatron-style param/EMA/moment shardings (parallel/tp.py). XLA
    auto-inserts the gradient all-reduce (and the row-parallel psums)."""
    bsh = batch_sharding(mesh)
    if "model" in mesh.axis_names and state_template is not None:
        from rmem_tpu.parallel.tp import state_shardings
        ssh = state_shardings(state_template, mesh)
    else:
        ssh = replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(ssh, {"imgs": bsh, "labels": bsh, "obj_nums": bsh},
                      bsh),
        out_shardings=(ssh, replicated(mesh)),
        donate_argnums=(0,),
    )
