"""Tensor-parallel parameter shardings on a ('data', 'model') mesh.

The reference scales only by data parallelism (1 process/GPU DDP,
trainer.py:92-109). On TPU the same `jax.sharding` machinery extends to
model sharding with no communication code: annotate the parameter leaves
with PartitionSpecs and let GSPMD partition every op and insert the
collectives over ICI.

The rule here is the classic megatron pair applied to the GPM
self-attention block (models/gpm.py:GatedSelfAttention), whose value/gate
projections hold the block's largest kernels and whose dataflow is purely
local (no memory-bank entanglement):

  linear_V1/V2/U1/U2   column-parallel  kernel [in, out/p]  bias [out/p]
      -> attention output + silu gate + depthwise conv stay channel-sharded
         (elementwise / per-channel ops need no communication)
  tail.projection      row-parallel     kernel [in/p, out]
      -> GSPMD inserts ONE psum per block to rebuild the replicated output

Everything else (encoder convs, bank projections, FPN, id bank) stays
replicated: DeAOT attends with a single 128-d head, so head-sharding does
not apply, and sharding the bank K/V would shard the scan carry. This is a
capability surface (exercised by tests/test_mesh_tp.py on a virtual 2x2
mesh and `RMEM_DRYRUN_TP=1` in __graft_entry__), not a perf claim at
d_model=256 — at this width one psum per block costs more than it saves;
the spec rule is where a wider config would grow.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_DENSE = ("linear_V1", "linear_V2", "linear_U1", "linear_U2")


def _path_keys(path) -> list:
    keys = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", None)
        if name is not None:
            keys.append(str(name))
    return keys


def spec_for_param(path) -> P:
    """PartitionSpec for one state leaf by its path suffix. Works for the
    raw params tree and for optimizer/EMA mirrors (adam mu/nu, EMA params
    carry the same module-path suffix)."""
    keys = _path_keys(path)
    if len(keys) >= 2 and keys[-2] in _COL_DENSE:
        if keys[-1] == "kernel":
            return P(None, "model")
        if keys[-1] == "bias":
            return P("model")
    if (len(keys) >= 2 and keys[-2] == "projection"
            and keys[-1] == "kernel" and "self_attn" in keys):
        return P("model", None)       # row-parallel; bias replicated
    return P()


def state_shardings(state, mesh: Mesh):
    """NamedSharding tree for a TrainState (params + EMA + optimizer
    moments sharded by the same rule; scalars replicated)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, spec_for_param(path)), state)
