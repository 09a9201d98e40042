"""rmem_tpu: a TPU-native (JAX/XLA/Pallas) video object segmentation framework.

Re-implements the full capability surface of RMem (Restricted Memory Banks for
VOS, CVPR 2024; AOT/DeAOT + restricted long-term memory + temporal positional
embedding) as a from-scratch TPU-first design:

- NHWC/[B,HW,C] layouts, bf16 compute, MXU-shaped einsum attention.
- Fixed-capacity memory bank with static shapes (validity count instead of a
  growing time axis) -> zero recompiles across a video.
- Importance-x-freshness slot eviction as a pure function on carry state.
- Engines are pure jitted step functions (streaming) or `lax.scan` (training).
- Multi-device scaling via jax.sharding.Mesh + collectives, not process spawn.

Reference behavior citations use `aot_plus/...:line` paths of the upstream
PyTorch codebase.
"""

__version__ = "0.1.0"

from rmem_tpu.config import get_config  # noqa: F401
