"""Training losses: bootstrapped (top-K) cross-entropy + soft Jaccard.

Reference: aot_plus/networks/layers/loss.py:143-194 (CrossEntropyLoss with
hard-example mining schedule) and loss.py:28-54,118-140 (tversky with
alpha=beta=1 == soft Jaccard), combined 0.5/0.5 per frame
(aot_plus/networks/engines/aot_engine.py:130-146,485-508).

TPU notes: the reference's dynamic top-k (k depends on the training step)
is expressed as a descending sort + masked prefix mean, keeping shapes
static under jit. Per-class "skip absent classes" loops become masked
reductions over the fixed class axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_LABEL = 255
_NEG = -1e30


def _valid_class_logits(logits: jnp.ndarray, obj_num: jnp.ndarray):
    """Mask class channels beyond obj_num (aot_engine.py:497-501 slices
    logits[:obj_num+1] per sample; masking with -inf is equivalent under
    softmax/CE). logits [..., C]."""
    c = logits.shape[-1]
    valid = jnp.arange(c) <= obj_num
    return jnp.where(valid, logits, _NEG), valid


def cross_entropy_topk(logits: jnp.ndarray, label: jnp.ndarray,
                       obj_num: jnp.ndarray, step: jnp.ndarray,
                       top_k_percent: float = 0.15,
                       hard_mining_steps: float = 10_000.0) -> jnp.ndarray:
    """Per-sample bootstrapped CE. logits [H,W,C], label [H,W] -> scalar.

    k anneals from all pixels to `top_k_percent` over `hard_mining_steps`
    (loss.py:176-187). Ignored pixels contribute zero loss but stay in the
    top-k pool, matching reduction='none' + ignore_index semantics.
    """
    h, w, c = logits.shape
    num_pixels = h * w
    logits, _ = _valid_class_logits(logits, obj_num)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lbl = jnp.clip(label, 0, c - 1)
    # one-hot masked reduce instead of take_along_axis: the [HW]-point
    # gather from [H,W,C] was 84 ms/step on the profiled train step
    # (recomputed again under remat in the backward); summing one selected
    # value with zeros is bit-identical and fuses into the log_softmax
    pix = -jnp.sum(jnp.where(lbl[..., None] == jnp.arange(c), logp, 0.0),
                   axis=-1)
    pix = jnp.where(label == IGNORE_LABEL, 0.0, pix)
    pix = pix.reshape(-1)

    ratio = jnp.minimum(1.0, step / hard_mining_steps)
    k = jnp.floor((ratio * top_k_percent + (1.0 - ratio)) * num_pixels)
    k = jnp.maximum(k, 1.0)

    # top-k as a stop-gradient selection MASK (torch.topk semantics: the
    # gradient is 1/k on exactly the selected pixels). A full sort of the
    # 216k pixel losses cost ~47 ms/step at reference scale (profiled);
    # selection only needs the k-th value, found exactly by a 32-step
    # radix select on the IEEE-754 total-order key (each step one cheap
    # masked count), with ties at the threshold broken by lowest pixel
    # index — identical to a stable descending sort. The bool mask is a
    # named remat residual (~216 KB/frame) so the backward recomputes
    # neither the select nor its transpose.
    from jax.ad_checkpoint import checkpoint_name
    ki = k.astype(jnp.int32)
    bits = jax.lax.bitcast_convert_type(pix, jnp.uint32)
    keys = jnp.where(bits >> 31 == 0, bits | jnp.uint32(0x80000000), ~bits)

    def bit_step(i, t):
        cand = t | (jnp.uint32(1) << (31 - i))
        return jnp.where(jnp.sum((keys >= cand).astype(jnp.int32)) >= ki,
                         cand, t)

    thresh = jax.lax.fori_loop(0, 32, bit_step, jnp.uint32(0),
                               unroll=True)
    greater = keys > thresh
    equal = keys == thresh
    need = ki - jnp.sum(greater.astype(jnp.int32))
    sel = greater | (equal & (jnp.cumsum(equal.astype(jnp.int32)) <= need))
    sel = checkpoint_name(sel, "topk_mask")
    return jnp.sum(jnp.where(sel, pix, 0.0)) / k


def soft_jaccard(logits: jnp.ndarray, label: jnp.ndarray,
                 obj_num: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """Per-sample soft Jaccard (tversky alpha=beta=1, loss.py:28-54).

    Classes with no ground-truth pixel are skipped; ignore-label pixels are
    excluded from all sums (loss.py:57-71).
    """
    h, w, c = logits.shape
    logits, class_valid = _valid_class_logits(logits, obj_num)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    pix_valid = (label != IGNORE_LABEL)[..., None].astype(jnp.float32)
    gt = (label[..., None] == jnp.arange(c)).astype(jnp.float32) * pix_valid
    probs = probs * pix_valid

    num = jnp.sum(probs * gt, axis=(0, 1))                # [C]
    den = jnp.sum(probs, axis=(0, 1)) + jnp.sum(gt, axis=(0, 1)) - num
    loss_c = 1.0 - num / (den + epsilon)

    present = (jnp.sum(gt, axis=(0, 1)) > 0) & class_valid
    present = present.astype(jnp.float32)
    return jnp.sum(loss_c * present) / jnp.maximum(jnp.sum(present), 1.0)


def segmentation_loss(logits: jnp.ndarray, label: jnp.ndarray,
                      obj_nums: jnp.ndarray, step: jnp.ndarray,
                      top_k_percent: float = 0.15,
                      hard_mining_steps: float = 10_000.0,
                      ce_weight: float = 0.5,
                      jaccard_weight: float = 0.5) -> jnp.ndarray:
    """Batched 0.5*CE + 0.5*Jaccard -> [B] (aot_engine.py:140-146,503-508).

    logits [B,H,W,C] (full-resolution, already upsampled), label [B,H,W].
    """
    with jax.named_scope("seg_loss"):  # profile attribution (profile_step)
        ce = jax.vmap(lambda lg, lb, on: cross_entropy_topk(
            lg, lb, on, step, top_k_percent, hard_mining_steps))(
            logits, label, obj_nums)
        jac = jax.vmap(lambda lg, lb, on: soft_jaccard(lg, lb, on))(
            logits, label, obj_nums)
        return ce_weight * ce + jaccard_weight * jac
