"""AOT model assembly: encoder + projector + LSTT + FPN + identity bank.

Reference: aot_plus/networks/models/aot.py:12-205. Engine-facing methods are
pure functions of (params, inputs); per-video memory lives in the engine
state, not the module.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rmem_tpu.config import Config
from rmem_tpu.models.decoders import build_decoder
from rmem_tpu.models.encoders import build_encoder
from rmem_tpu.models.lstt import LSTT
from rmem_tpu.ops.layers import conv, layer_norm
from rmem_tpu.ops.position import sine_position_embedding


def _trunc05(key, shape, dtype=jnp.float32):
    return nn.initializers.truncated_normal(stddev=0.05)(key, shape, dtype)


class _PatchWiseIdBank(nn.Module):
    """The 17x17/s16 (align_corners) or 16x16/s16 mask-embedding conv
    (reference aot.py:64-83) as tile+halo patch extraction + ONE MXU
    matmul.

    nn.Conv on the 12-channel one-hot input runs at <10% MXU utilization
    (the contraction dim pads 12 -> 128 lanes) and spends two thirds of
    its time in layout rearrangement — 0.58 ms of the 6.1 ms eval frame
    (profile_step --mode eval, 'id_bank' component). Flattening each
    k*k*12-long patch into the contraction dim feeds the MXU properly.
    Stride 16 means patches only overlap by one row/column (k=17), so the
    extraction is a blocked reshape plus one halo row and column — no
    unfold blow-up. The param tree matches nn.Conv ('kernel' [k,k,in,out],
    'bias' [out]): checkpoints and the .pth converter are unchanged.
    """

    features: int
    kernel_size: int      # 17 (align_corners, pad 8) or 16 (pad 0)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        b, h, w, c = x.shape
        kernel = self.param("kernel",
                            nn.initializers.orthogonal(scale=k ** -2),
                            (k, k, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        if k == 17:
            oh, ow = (h - 1) // 16 + 1, (w - 1) // 16 + 1
            hp_, wp_ = 16 * oh + 1, 16 * ow + 1
            xp = jnp.pad(x, ((0, 0), (8, max(0, hp_ - 8 - h)),
                             (8, max(0, wp_ - 8 - w)), (0, 0)))
            xp = xp[:, :hp_, :wp_]
            # output row i covers padded rows [16i, 16i+17): 16-row blocks
            # plus the next block's first row as the halo (same in x)
            rows = jnp.concatenate(
                [xp[:, :16 * oh].reshape(b, oh, 16, wp_, c),
                 xp[:, 16::16][:, :, None]], axis=2)      # [b,oh,17,wp,c]
            pat = jnp.concatenate(
                [rows[:, :, :, :16 * ow].reshape(b, oh, 17, ow, 16, c),
                 rows[:, :, :, 16::16][:, :, :, :, None]], axis=4)
            pat = pat.transpose(0, 1, 3, 2, 4, 5)       # [b,oh,ow,17,17,c]
        else:
            oh, ow = h // 16, w // 16
            pat = x[:, :16 * oh, :16 * ow].reshape(b, oh, 16, ow, 16, c)
            pat = pat.transpose(0, 1, 3, 2, 4, 5)
        pat = pat.reshape(b, oh, ow, k * k * c)
        out = pat @ kernel.reshape(k * k * c, self.features).astype(dt)
        return out + bias.astype(dt)


class AOT(nn.Module):
    cfg: Config

    # -- model pieces (models/aot.py:19-103) --
    def setup(self):
        cfg = self.cfg
        c = cfg.model_encoder_embedding_dim
        self.dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                      else jnp.float32)
        self.encoder = build_encoder(cfg.model_encoder, dtype=self.dtype)
        self.encoder_projector = conv(c, 1, name="encoder_projector",
                                      dtype=self.dtype)
        self.lstt = self._build_lstt()
        self.decoder = build_decoder(
            "fpn",
            in_dim=self._decoder_indim(),
            out_dim=cfg.model_max_obj_num + 1,
            decode_intermediate_input=cfg.model_decoder_intermediate_lstt,
            hidden_dim=c,
            shortcut_dims=cfg.model_encoder_dim,
            align_corners=cfg.model_align_corners,
            dtype=self.dtype,
        )
        # 17x17/s16 conv embedding the one-hot (+ignore) mask (aot.py:64-83)
        # — as a patch matmul (see _PatchWiseIdBank)
        k = 17 if cfg.model_align_corners else 16
        self.patch_wise_id_bank = _PatchWiseIdBank(
            features=c, kernel_size=k, name="patch_wise_id_bank",
            dtype=self.dtype)
        if cfg.use_temporal_positional_embedding:
            pe_dim = self._temporal_pe_dim()
            slots = 4 if cfg.temporal_positional_embedding_slot_4 else 2
            self.cur_pos_emb = self.param("cur_pos_emb", _trunc05, (1, pe_dim))
            self.mem_pos_emb = self.param("mem_pos_emb", _trunc05,
                                          (slots, pe_dim))
        self._extra_setup()

    def _build_lstt(self):
        cfg = self.cfg
        return LSTT(num_layers=cfg.model_lstt_num,
                    d_model=cfg.model_encoder_embedding_dim,
                    self_heads=cfg.model_self_heads,
                    att_heads=cfg.model_att_heads,
                    linear_q=cfg.model_linear_q,
                    droppath=cfg.train_lstt_droppath,
                    intermediate_norm=cfg.model_decoder_intermediate_lstt,
                    dtype=self.dtype, gru_memory=cfg.gru_memory,
                    name="lstt")

    def _decoder_indim(self) -> int:
        cfg = self.cfg
        if cfg.model_decoder_intermediate_lstt:
            return cfg.model_encoder_embedding_dim * (cfg.model_lstt_num + 1)
        return cfg.model_encoder_embedding_dim

    def _temporal_pe_dim(self) -> int:
        return self.cfg.model_encoder_embedding_dim

    def _extra_setup(self):
        pass

    @property
    def has_id_values(self) -> bool:
        """DeAOT stores a separate identity-value plane in the bank."""
        return False

    # ------------------------------------------------------------------
    # engine-facing methods (invoked via model.apply(..., method=...))
    # ------------------------------------------------------------------

    def encode_image(self, img: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """img [B,H,W,3] -> pyramid [4x, 8x, 16x, 16x-projected]
        (models/aot.py:116-134). Tuple-returning encoders (resnet50_topdown)
        expose their auxiliary reconstruction loss via `sow` so the train
        loss can pick it up (aot_engine.py:115-118)."""
        out = self.encoder(img)
        if isinstance(out, tuple) and len(out) == 2 and not hasattr(
                out[0], "shape"):
            xs, var_loss = list(out[0]), out[1]
            self.sow("aux_losses", "var_loss", var_loss)
        else:
            xs = list(out)
        xs[-1] = self.encoder_projector(xs[-1])
        return tuple(xs)

    def get_id_emb(self, id_one_hot: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,id_dim] one-hot(+ignore) -> [B, HW, C] identity embedding
        (models/aot.py:111-114)."""
        e = self.patch_wise_id_bank(id_one_hot)
        e = self._id_post(e)
        b, h, w, c = e.shape
        return e.reshape(b, h * w, c)

    def _id_post(self, e):
        return e

    def get_pos_emb(self, h: int, w: int) -> jnp.ndarray:
        return sine_position_embedding(
            h, w, self.cfg.model_encoder_embedding_dim)

    def temporal_pe(self):
        if not self.cfg.use_temporal_positional_embedding:
            return None, None
        return self.cur_pos_emb, self.mem_pos_emb

    def lstt_forward(self, feat: jnp.ndarray, bank, slot_mask, short,
                     id_emb, self_pos, cur_pe, slot_pe,
                     size_2d: Tuple[int, int], need_record: bool = False,
                     deterministic: bool = True, dp_rng=None,
                     use_pallas: bool = False):
        """feat [B,HW,C]. bank/short: tuples of per-plane [L,...] arrays
        (k, v[, id_v]) or None for the reference frame."""
        return self.lstt(feat, bank, slot_mask, short, id_emb, self_pos,
                         cur_pe, slot_pe, size_2d, need_record,
                         deterministic, dp_rng, use_pallas)

    def write_memories(self, mems: Dict[str, jnp.ndarray], id_emb):
        """Project pending emissions into (long, short) write tuples.

        Returns (long_k, long_v, long_id_v|None, short_k, short_v,
        short_id_v|None), each [L,B,HW,*].
        """
        long_v, short_v = self.lstt.project_memories(mems, id_emb)
        return (mems["curr_k"], long_v, None,
                mems["short_k"], short_v, None)

    def decode_id_logits(self, intermediates: Sequence[jnp.ndarray],
                         shortcuts: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """-> [B, H/4, W/4, obj+1] logits (models/aot.py:136-142), NHWC."""
        b, h, w, c = shortcuts[-1].shape
        inputs = [shortcuts[-1]]
        for emb in intermediates:
            inputs.append(emb.reshape(b, h, w, -1))
        return self.decoder(inputs, shortcuts)
