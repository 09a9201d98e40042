"""Export the fused VOS inference step as a serialized StableHLO artifact.

Serving deployments want the compiled propagation step without the Python
framework in the loop. This exports the engine's fused step
(encode -> GPM/LSTT bank attention -> decode -> argmax -> memory update,
engine/inference.py:_step_impl) via `jax.export`: a versioned, serialized
StableHLO module plus the input/output tree defs, loadable in any JAX
process (or compilable by PJRT directly) without rmem_tpu installed.

The reference has no equivalent (its deployment story is "run the Python
evaluator"); this is the TPU-native replacement for a TorchScript-style
export.

Usage:
  python -m rmem_tpu.tools.export --stage pre_vost --model r50_deaotl \
      --hw 481 849 --out /tmp/step.stablehlo [--ckpt weights.pth]

The artifact's calling convention is (params, state, img) -> (state, label)
with the example state produced by `add_reference` on a blank frame; any
state with the same tree structure/shapes works.
"""

from __future__ import annotations

import argparse
import pickle


def _register_pytree_serialization():
    """jax.export serializes tree defs; our flax.struct state dataclasses
    need registered (de)serializers for their static auxdata (a small tuple
    of hashables — pickled)."""
    import jax

    from rmem_tpu.engine.inference import EngineState
    from rmem_tpu.memory.bank import MemoryBank, ShortTermMemory

    for cls, name in ((MemoryBank, "rmem_tpu.MemoryBank"),
                      (ShortTermMemory, "rmem_tpu.ShortTermMemory"),
                      (EngineState, "rmem_tpu.EngineState")):
        try:
            jax.export.register_pytree_node_serialization(
                cls, serialized_name=name,
                serialize_auxdata=pickle.dumps,
                deserialize_auxdata=pickle.loads)
        except ValueError:  # already registered (repeat calls)
            pass


def build_exported(cfg, params=None, hw=(481, 849), groups: int = 1):
    """Return (jax.export.Exported, example_state) for the fused step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rmem_tpu.engine import InferenceEngine
    from rmem_tpu.models import build_vos_model, init_params

    _register_pytree_serialization()
    model = build_vos_model(cfg.model_vos, cfg)
    if params is None:
        params = init_params(model, jax.random.PRNGKey(0), hw)
    engine = InferenceEngine(model, params, cfg, donate=False)

    img0 = jnp.zeros((groups, *hw, 3), jnp.float32)
    mask0 = jnp.zeros((groups, *hw), jnp.int32)
    state, _ = engine.add_reference(
        img0, mask0, [cfg.model_max_obj_num] * groups, gap=5)

    def step(params, state, img):
        return engine._step_impl(params, state, img, out_hw=hw)

    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        (params, state, img0))
    exported = jax.export.export(jax.jit(step))(*abstract)
    return exported, state, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="pre_vost")
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--hw", type=int, nargs=2, default=(481, 849))
    ap.add_argument("--groups", type=int, default=1)
    ap.add_argument("--ckpt", default=None, help=".pth or msgpack weights")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from rmem_tpu.config import get_config
    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    cfg = get_config(args.stage, model=args.model)
    params = None
    if args.ckpt:
        from rmem_tpu.models import build_vos_model, load_model_params
        model = build_vos_model(cfg.model_vos, cfg)
        params = load_model_params(model, args.ckpt)

    exported, _, _ = build_exported(cfg, params, tuple(args.hw),
                                    args.groups)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob)} bytes to {args.out} "
          f"(platforms={exported.platforms})")


if __name__ == "__main__":
    main()
