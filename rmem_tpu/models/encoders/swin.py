"""Swin Transformer backbone (Swin-B) for VOS.

Reference: aot_plus/networks/encoders/swin/swin_transformer.py +
swin/build.py:13-18 (embed_dim=128, depths [2,2,18,2], heads [4,8,16,32],
out_indices (0,1,2)). The reference runs all four stages but only taps the
first three (4x/8x/16x) and duplicates the last tap
(swin_transformer.py:684-716); we skip the dead 32x stage entirely.

TPU notes: window partition/reverse are pure reshapes; the 7x7 window
attention batches all windows into one MXU matmul; shifted windows use
jnp.roll + the standard image-mask trick. Feature maps are padded to window
multiples and cropped back.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rmem_tpu.ops.layers import LN_EPS


@functools.lru_cache(maxsize=32)
def _rel_pos_index(ws: int) -> np.ndarray:
    """[ws*ws, ws*ws] index into the (2ws-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=64)
def _shift_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: [num_windows, ws*ws, ws*ws]."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = (win[:, :, None] != win[:, None, :]).astype(np.float32) * -100.0
    return mask


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask=None):
        """x: [B*nW, ws*ws, C]; mask [nW, ws*ws, ws*ws] or None."""
        ws2 = self.window_size ** 2
        b, n, c = x.shape
        dh = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, name="qkv", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.num_heads, dh), 3,
                            axis=2)
        q, k, v = (t[:, :, 0] for t in (q, k, v))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * dh ** -0.5

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_rel_pos_index(self.window_size)).reshape(-1)
        bias = table[idx].reshape(ws2, ws2, self.num_heads)
        logits = logits + bias.transpose(2, 0, 1)[None].astype(logits.dtype)

        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(b // nw, nw, self.num_heads, n, n)
            logits = logits + mask[None, :, None].astype(logits.dtype)
            logits = logits.reshape(b, self.num_heads, n, n)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        out = out.reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj", dtype=self.dtype)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, l, c = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x)
        x = x.reshape(b, h, w, c)

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        shift = self.shift if min(hp, wp) > ws else 0
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(hp, wp, ws, shift))
        else:
            mask = None

        xw = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        xw = WindowAttention(self.dim, self.num_heads, ws, self.dtype,
                             name="attn")(xw, mask)
        x = xw.reshape(b, hp // ws, wp // ws, ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w].reshape(b, l, c)
        x = shortcut + x

        y = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1",
                     dtype=self.dtype)(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="fc2", dtype=self.dtype)(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        nh, nw = x.shape[1], x.shape[2]
        x = x.reshape(b, nh * nw, 4 * c)
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, name="reduction",
                     dtype=self.dtype)(x)
        return x, (nh, nw)


class SwinTransformer(nn.Module):
    """Swin-B trunk tapped at 4x/8x/16x with 16x duplicated."""

    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18)
    num_heads: Sequence[int] = (4, 8, 16)
    window_size: int = 7
    dtype: object = None

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        b = x.shape[0]
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
                    name="patch_embed", dtype=self.dtype)(x)
        h, w = x.shape[1:3]
        x = x.reshape(b, h * w, self.embed_dim)
        # patch_norm=True in the reference build
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm")(x)

        outs = []
        hw = (h, w)
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.embed_dim * 2 ** i
            for j in range(depth):
                x = SwinBlock(dim, heads, self.window_size,
                              shift=0 if j % 2 == 0 else self.window_size // 2,
                              dtype=self.dtype, name=f"stage{i}_block{j}")(
                    x, hw)
            out = nn.LayerNorm(epsilon=LN_EPS, name=f"out_norm{i}")(x)
            outs.append(out.reshape(b, *hw, dim))
            if i < len(self.depths) - 1:
                x, hw = PatchMerging(dim, dtype=self.dtype,
                                     name=f"merge{i}")(x, hw)
        outs.append(outs[-1])  # duplicated 16x
        return tuple(outs)


def SwinB(dtype=None) -> SwinTransformer:
    return SwinTransformer(dtype=dtype)
