"""VOS model registry (aot_plus/networks/models/__init__.py:5-12)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rmem_tpu.config import Config
from rmem_tpu.models.aot import AOT  # noqa: F401
from rmem_tpu.models.deaot import DeAOT  # noqa: F401


def build_vos_model(name: str, cfg: Config):
    if name == "aot":
        return AOT(cfg=cfg)
    if name == "deaot":
        return DeAOT(cfg=cfg)
    raise NotImplementedError(f"model {name!r}")


def init_forward(model, img, id_one_hot):
    """Trace one reference-frame pass touching every submodule, for init."""
    xs = model.encode_image(img)
    b, eh, ew, c = xs[-1].shape
    feat = xs[-1].reshape(b, eh * ew, c)
    id_emb = model.get_id_emb(id_one_hot)
    self_pos = model.get_pos_emb(eh, ew)
    cur_pe, mem_pe = model.temporal_pe()
    mem_pe1 = mem_pe[0:1] if mem_pe is not None else None
    inter, mems, _ = model.lstt_forward(feat, None, None, None, id_emb,
                                        self_pos, cur_pe, mem_pe1, (eh, ew))
    model.write_memories(mems, id_emb)
    if model.cfg.gru_memory_active:
        # trace the ConvGRU compression path so its params initialize
        ks = mems["curr_k"]
        hid = jnp.zeros((ks.shape[0], b, eh, ew, ks.shape[-1]), ks.dtype)
        model.lstt.compress_evicted(ks, ks, hid, hid, (eh, ew))
    return model.decode_id_logits(inter, xs)


def init_params(model, rng: jax.Array, input_hw: Tuple[int, int] = (65, 65),
                batch: int = 1):
    """Initialize a parameter pytree for the given input size.

    jitted: eager linen init dispatches hundreds of tiny ops, which costs
    minutes on slow hosts."""
    cfg = model.cfg
    img = jnp.zeros((batch, *input_hw, 3), jnp.float32)
    id_oh = jnp.zeros((batch, *input_hw, cfg.id_channels), jnp.float32)
    init_fn = jax.jit(lambda r: model.init(r, img, id_oh,
                                           method=init_forward))
    return init_fn(rng)["params"]


def load_model_params(model, path: str, log=print):
    """Load params from a native msgpack checkpoint or a reference .pth
    (shape-tolerant merge, utils/checkpoint.py:75-102)."""
    from rmem_tpu.utils.checkpoint import load_pretrained, load_pytree

    params = init_params(model, jax.random.PRNGKey(0))
    if path.endswith(".pth"):
        params, skipped, _ = load_pretrained(
            params, path, model.cfg.model_vos, model.cfg.id_channels)
        if skipped:
            log(f"checkpoint merge skipped {len(skipped)} entries")
        return params
    return load_pytree(params, path)
