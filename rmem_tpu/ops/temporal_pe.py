"""Temporal positional embedding over memory slots (the RMem 'Temp_pe_Slot_4').

The reference learns a 4-slot table `mem_pos_emb [4, C]` plus a query-side
`cur_pos_emb [1, C]` and stretches the table to the current bank length T:
linear interpolation with align_corners=True when T <= 4, and a
flip -> nearest-expand -> flip when T > 4 so the *last* table entries align
with the *newest* slots (aot_plus/networks/layers/transformer.py:594-629).

Here T is a traced value (the bank has static capacity S with a validity
count), so we evaluate both formulas per slot index and select — no dynamic
shapes, no recompiles as the bank fills.
"""

from __future__ import annotations

import jax.numpy as jnp


def interpolate_temporal_pe(mem_pos_emb: jnp.ndarray, t: jnp.ndarray,
                            capacity: int) -> jnp.ndarray:
    """Stretch the [P, C] slot table to `t` valid slots of a capacity-S bank.

    Returns [S, C]; rows >= t are unspecified (callers mask invalid slots).

    Exact torch semantics reproduced:
    - t == 1: PE[0] (transformer.py:603-604).
    - 2 <= t <= P: the reference first truncates the table to its first t
      rows (`mem_pos_emb = mem_pos_emb[:T]`, transformer.py:601-602), so the
      subsequent `F.interpolate(mode='linear', align_corners=True)` to size t
      is a t -> t identity: row i is used directly (transformer.py:605-608).
    - t > P: no truncation happens (t exceeds the table); the linear P -> P
      interpolation is an identity, then flip, `mode='nearest'` expand
      P -> t, flip back: the source index for output i is
      P-1 - floor((t-1-i) * P / t) (transformer.py:609-615).
    """
    P, C = mem_pos_emb.shape
    s = jnp.arange(capacity, dtype=jnp.float32)
    t_f = jnp.asarray(t, jnp.float32)

    # t <= P branch: truncate-then-identity-interpolate == direct row i
    lo = jnp.minimum(s.astype(jnp.int32), P - 1)
    linear_pe = mem_pos_emb[lo]

    # flip-nearest branch (t > P)
    src = (P - 1) - jnp.floor((t_f - 1.0 - s) * P / jnp.maximum(t_f, 1.0))
    src = jnp.clip(src, 0, P - 1).astype(jnp.int32)
    nearest_pe = mem_pos_emb[src]

    return jnp.where(t <= P, linear_pe, nearest_pe)


def sinusoidal_temporal_encoding(max_len: int, channels: int,
                                 normalize: bool = False,
                                 scale: float = 2 * 3.141592653589793
                                 ) -> jnp.ndarray:
    """Sinusoidal time encoding [max_len, channels] (the reference's
    TIME_ENCODE variant, aot_plus/networks/layers/position.py:96-158).

    Note: in the shipped reference configs this path is off
    (r50_aotl.py:11-13) and the per-block Q/K time-encode MLPs it would feed
    are constructed but never invoked in the forward — provided here for API
    completeness."""
    pos = jnp.arange(max_len, dtype=jnp.float32)
    if normalize:
        pos = pos / jnp.maximum(pos[-1], 1.0) * scale
    div = 1.0 / (10000.0 ** (jnp.arange(0, channels, 2,
                                        dtype=jnp.float32) / channels))
    ang = pos[:, None] * div[None, :]
    out = jnp.zeros((max_len, channels), jnp.float32)
    out = out.at[:, 0::2].set(jnp.sin(ang))
    out = out.at[:, 1::2].set(jnp.cos(ang))
    return out
