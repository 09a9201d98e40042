"""Mask / identity-embedding helpers.

Reference: aot_plus/utils/image.py:69-74 (one_hot_mask with ignore=255),
aot_plus/utils/math.py:4-14 (id-shuffle permutation matrix),
aot_plus/networks/engines/aot_engine.py:208-232 (assign_identity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot_mask(mask: jnp.ndarray, max_obj_num: int):
    """mask [B,H,W] int -> (one_hot [B,H,W,obj+1], ignore [B,H,W,1]).

    Channel-last; label 255 marks ignore (VOST occlusion annotations).
    """
    if mask.ndim == 4:  # [B,H,W,1]
        mask = mask[..., 0]
    ids = jnp.arange(max_obj_num + 1, dtype=mask.dtype)
    one_hot = (mask[..., None] == ids).astype(jnp.float32)
    ignore = (mask[..., None] == 255).astype(jnp.float32)
    return one_hot, ignore


def id_shuffle_matrix(key: jax.Array, dim: int, batch: int,
                      keep_first: bool = True) -> jnp.ndarray:
    """[B, dim, dim] permutation matrices; row 0 (background) pinned.

    Used for training-time identity shuffling
    (aot_plus/networks/engines/aot_engine.py:559-563).
    """
    eye = jnp.eye(dim, dtype=jnp.float32)

    def one(k):
        if keep_first:
            perm = jax.random.permutation(k, dim - 1) + 1
            rows = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                    perm.astype(jnp.int32)])
        else:
            rows = jax.random.permutation(k, dim).astype(jnp.int32)
        return eye[rows]

    keys = jax.random.split(key, batch)
    return jax.vmap(one)(keys)


def host_id_shuffle_matrix(rng, dim: int, batch: int,
                           keep_first: bool = True):
    """Host-side (numpy) variant of id_shuffle_matrix for feeding the train
    step (aot_plus/utils/math.py:4-14). rng: np.random.RandomState."""
    import numpy as np
    eye = np.eye(dim, dtype=np.float32)
    out = np.zeros((batch, dim, dim), np.float32)
    for i in range(batch):
        if keep_first:
            perm = rng.permutation(dim - 1) + 1
            rows = np.concatenate([[0], perm])
        else:
            rows = rng.permutation(dim)
        out[i] = eye[rows]
    return out


def apply_ignore_token(one_hot: jnp.ndarray, ignore: jnp.ndarray,
                       shuffle: jnp.ndarray | None = None) -> jnp.ndarray:
    """Build the (obj+2)-channel id-bank input: zero background where ignored,
    optionally shuffle ids, append the ignore channel.

    Mirrors aot_plus/networks/engines/aot_engine.py:214-224 (channel-last).
    """
    non_ignored = 1.0 - ignore  # [B,H,W,1]
    one_hot = one_hot.at[..., 0:1].multiply(non_ignored)
    if shuffle is not None:
        # 'bohw,bot->bthw' in NCHW == 'bhwo,bot->bhwt' in NHWC
        one_hot = jnp.einsum("bhwo,bot->bhwt", one_hot, shuffle)
    return jnp.concatenate([one_hot, ignore], axis=-1)


def unshuffle_logits(logits: jnp.ndarray, shuffle: jnp.ndarray) -> jnp.ndarray:
    """Reverse id shuffle on predicted logits (aot_engine.py:444-449), NHWC."""
    return jnp.einsum("bhwo,bto->bhwt", logits, shuffle)


def mask_unused_ids(logits: jnp.ndarray, obj_nums: jnp.ndarray,
                    neg: float = -1e10) -> jnp.ndarray:
    """Disable identity channels beyond each sample's object count
    (aot_engine.py:451-453). logits [B,H,W,C], obj_nums [B] int."""
    c = logits.shape[-1]
    ch = jnp.arange(c)
    valid = ch[None, :] <= obj_nums[:, None]  # [B, C]
    return jnp.where(valid[:, None, None, :], logits, neg)
