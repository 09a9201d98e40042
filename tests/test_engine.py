"""End-to-end engine smoke tests: reference frame -> propagate/update loop on
synthetic video, AOT and DeAOT, including eviction engagement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmem_tpu.config import get_config
from rmem_tpu.engine import InferenceEngine, separate_mask, soft_logit_aggregation
from rmem_tpu.models import build_vos_model, init_params

HW = (49, 49)  # stride-snapped: (49-1) % 16 == 0


def _make(model_name, **over):
    cfg = get_config("pre_vost", model=model_name, **over)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    return cfg, model, params


def _video(num_frames, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.rand(num_frames, 1, *HW, 3).astype(np.float32)
    mask = np.zeros((1, *HW), np.int32)
    mask[:, 10:25, 10:25] = 1
    mask[:, 30:45, 30:40] = 2
    return imgs, mask


@pytest.mark.parametrize("model_name", ["tiny_aotl", "r50_deaotl"])
def test_engine_video_loop(model_name):
    cfg, model, params = _make(model_name, latter_mem_len=2)
    engine = InferenceEngine(model, params, cfg, donate=False)
    imgs, mask = _video(8)

    state, logits = engine.add_reference(jnp.asarray(imgs[0]),
                                         jnp.asarray(mask), [2], gap=2)
    assert logits.shape == (1, 13, 13, 11)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert int(state.bank.count) == 1

    counts = []
    for t in range(1, 8):
        state, logits = engine.propagate(state, jnp.asarray(imgs[t]))
        assert np.all(np.isfinite(np.asarray(logits)))
        if state.record is not None:
            rec = np.asarray(state.record)
            np.testing.assert_allclose(rec.sum(-1), 1.0, atol=1e-4)
        full = engine.predict_logits_at(logits, HW)
        label = jnp.argmax(full, axis=-1).astype(jnp.int32)
        state = engine.update_memory(state, label)
        counts.append(int(state.bank.count))

    # gap=2: appends at steps 2,4,6; capacity former+latter=3 -> evictions
    assert counts == [1, 2, 2, 3, 3, 3, 3]
    assert int(state.frame_step) == 7
    assert int(state.last_mem_step) == 6

    # unused id channels masked
    lg = np.asarray(logits)
    assert np.all(lg[..., 3:] <= -1e9)


def test_multi_group_aggregation():
    label = jnp.asarray(np.array([[0, 5, 12], [10, 11, 20], [0, 1, 21]],
                                 np.int32))
    sep = separate_mask(label, num_groups=2, max_obj=10)
    assert sep.shape == (2, 3, 3)
    np.testing.assert_array_equal(np.asarray(sep[0]),
                                  [[0, 5, 0], [10, 0, 0], [0, 1, 0]])
    # label 21 exceeds 2 groups' id range (max 20) and maps to background
    np.testing.assert_array_equal(np.asarray(sep[1]),
                                  [[0, 0, 2], [0, 1, 10], [0, 0, 0]])

    logits = jnp.asarray(np.random.RandomState(0).randn(2, 3, 3, 11)
                         .astype(np.float32))
    merged = soft_logit_aggregation(logits, 10)
    assert merged.shape == (3, 3, 21)
    p = np.asarray(jax.nn.softmax(merged, axis=-1))
    assert np.all(np.isfinite(p))


def test_engine_no_long_memory_flag():
    cfg, model, params = _make("tiny_aotl", no_long_memory=True)
    engine = InferenceEngine(model, params, cfg, donate=False)
    imgs, mask = _video(3)
    state, _ = engine.add_reference(jnp.asarray(imgs[0]), jnp.asarray(mask),
                                    [2], gap=1)
    for t in (1, 2):
        state, logits = engine.propagate(state, jnp.asarray(imgs[t]))
        full = engine.predict_logits_at(logits, HW)
        state = engine.update_memory(
            state, jnp.argmax(full, -1).astype(jnp.int32))
    assert int(state.bank.count) == 1  # never appended beyond the reference


def test_engine_gru_memory_variant():
    """GRU_MEMORY compressed eviction (transformer.py:420-430): bank stays at
    former+latter, ConvGRU hidden states change after eviction rounds."""
    cfg, model, params = _make("tiny_aotl", gru_memory=True, latter_mem_len=2)
    engine = InferenceEngine(model, params, cfg, donate=False)
    imgs, mask = _video(8)
    state, _ = engine.add_reference(jnp.asarray(imgs[0]), jnp.asarray(mask),
                                    [2], gap=1)
    assert state.gru_hid_k is not None
    hid0 = np.asarray(state.gru_hid_k)
    evicted_seen = False
    for t in range(1, 8):
        state, logits = engine.propagate(state, jnp.asarray(imgs[t]))
        assert np.all(np.isfinite(np.asarray(logits)))
        full = engine.predict_logits_at(logits, HW)
        state = engine.update_memory(
            state, jnp.argmax(full, -1).astype(jnp.int32))
        if int(state.bank.count) == cfg.former_mem_len + cfg.latter_mem_len \
                and t >= 4:
            evicted_seen = True
    assert evicted_seen
    hid1 = np.asarray(state.gru_hid_k)
    assert np.abs(hid1 - hid0).max() > 0  # hidden state evolved


def test_engine_multi_group_video():
    """>10 objects -> 2 id groups as a batch axis; encode-once broadcast;
    aggregation produces the full 21-channel label space."""
    cfg, model, params = _make("tiny_aotl", latter_mem_len=2)
    engine = InferenceEngine(model, params, cfg, donate=False)
    imgs, _ = _video(4)
    mask = np.zeros((1, *HW), np.int32)
    for i in range(12):  # 12 objects in stripes
        mask[:, :, 4 * i:4 * i + 3] = i + 1
    groups = 2
    glabels = separate_mask(jnp.asarray(mask), groups, 10)
    state, logits = engine.add_reference(jnp.asarray(imgs[0]), glabels,
                                         [10, 2], gap=2)
    assert logits.shape[0] == groups
    for t in range(1, 4):
        state, logits4 = engine.propagate(state, jnp.asarray(imgs[t]))
        assert logits4.shape[0] == groups
        full = engine.predict_logits_at(logits4, HW)
        merged = soft_logit_aggregation(full, 10)
        assert merged.shape == (*HW, 21)
        label = jnp.argmax(merged, -1).astype(jnp.int32)
        state = engine.update_memory(state, separate_mask(label, groups, 10))
    assert int(state.bank.count) >= 2


def test_engine_long_video_steady_state():
    """Long-video behavior (SURVEY config 3): constant bank size, finite
    logits, and living eviction statistics over 60 frames."""
    cfg, model, params = _make("tiny_deaotl", latter_mem_len=3)
    engine = InferenceEngine(model, params, cfg, donate=False)
    imgs, mask = _video(4, seed=3)
    state, _ = engine.add_reference(jnp.asarray(imgs[0]), jnp.asarray(mask),
                                    [2], gap=2)
    counts, times_max = [], []
    for t in range(1, 61):
        state, logits = engine.propagate(state, jnp.asarray(imgs[t % 4]))
        full = engine.predict_logits_at(logits, HW)
        state = engine.update_memory(
            state, jnp.argmax(full, -1).astype(jnp.int32))
        counts.append(int(state.bank.count))
        times_max.append(int(np.asarray(state.bank.times).max()))
    steady = cfg.former_mem_len + cfg.latter_mem_len
    assert counts[-1] == steady
    assert max(counts) <= steady + 0  # never exceeds after update returns
    # ~30 long-term writes -> many eviction rounds survived by slot 0
    assert times_max[-1] > 10
    assert np.all(np.isfinite(np.asarray(logits)))
    assert int(state.frame_step) == 60


def test_step_epilogue_channel_first_exact():
    """A channel-first upsample+argmax epilogue equals the channel-last
    formulation bit-exactly (same lerp arithmetic, same argmax tie order).
    The engine ships the channel-last form — channel-first measured 158 vs
    182 FPS on the 480p bench — but the equivalence documents that the
    layout is a free scheduling choice, not a numerics one."""
    from rmem_tpu.ops.resize import resize_bilinear

    rng = np.random.RandomState(0)
    # non-multiple output (interp path) and 4x+1 output (interleave path)
    for out_hw in ((49, 49), (41, 37)):
        logits4 = jnp.asarray(rng.randn(1, 13, 13, 11).astype(np.float32))
        # quantize so exact ties exist and tie order is actually exercised
        logits4 = jnp.round(logits4 * 4) / 4
        ref = resize_bilinear(logits4, out_hw, True)
        ref_label = jnp.argmax(ref[0], axis=-1).astype(jnp.int32)
        lf = jnp.transpose(logits4, (0, 3, 1, 2))
        lf = resize_bilinear(lf, out_hw, True, channel_last=False)
        new_label = jnp.argmax(lf, axis=1).astype(jnp.int32)[0]
        np.testing.assert_array_equal(np.asarray(ref_label),
                                      np.asarray(new_label))


def test_step_epilogue_phase_exact():
    """The phase-decomposed upsample+argmax the engine ships for the
    single-group step (ops/resize.upsample_argmax) equals the generic
    resize->argmax chain bit-exactly: integral-ratio fast paths (incl. the
    production 4x logit upsample shape), mixed integral/non-integral axes,
    and the non-integral fallback. Inputs include exact ties and the
    finite -1e10 channel masking mask_unused_ids emits."""
    from rmem_tpu.ops.resize import resize_bilinear, upsample_argmax

    rng = np.random.RandomState(0)
    cases = [((13, 13, 11), (49, 49)),    # 4x/4x integral (phase path)
             ((121, 213, 12), (481, 849)),  # aligned production logit shape
             ((121, 213, 12), (480, 854)),  # PRODUCTION: original-resolution
             # output (non-integral both axes -> generic chain, by identity)
             ((13, 13, 12), (13, 37)),    # H identity, W integral
             ((13, 13, 12), (49, 13)),    # H integral, W identity
             ((7, 9, 5), (7, 9)),         # full identity
             ((13, 13, 11), (50, 40)),    # non-integral -> fallback
             ((13, 13, 11), (25, 97))]    # 2x/8x integral
    for (h, w, c), out_hw in cases:
        x = np.round(rng.randn(1, h, w, c).astype(np.float32) * 4) / 4
        x[..., -1] = -1e10  # mask_unused_ids-style disabled channel
        xj = jnp.asarray(x)
        ref = jnp.argmax(resize_bilinear(xj, out_hw, True)[0],
                         axis=-1).astype(jnp.int32)
        new = upsample_argmax(xj, out_hw, True)
        assert new.shape == out_hw
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))


def test_step_epilogue_rowblock_exact():
    """The opt-in streamed row-block epilogue (RMEM_ROWBLOCK_EPILOGUE=1;
    measured perf-FLAT vs the generic chain on the 480p bench, r5) equals
    the generic chain on tie-free inputs across non-integral, mixed, and
    block-padded shapes. Inputs are NOT quantized to exact ties here:
    the row-block schedule sits in a different XLA fusion context, and
    under the suite's XLA:CPU flags FMA contraction can differ in the last
    ulp — at an exact tie that flips the argmax (values are otherwise
    identical; observed only on constructed ties, r5)."""
    import os

    from rmem_tpu.ops.resize import resize_bilinear, upsample_argmax

    rng = np.random.RandomState(0)
    cases = [((121, 213, 12), (480, 854)),  # production original-resolution
             ((13, 13, 11), (50, 40)),    # non-integral both (single block)
             ((13, 13, 11), (49, 40)),    # H integral-up, W not: must use
             # the interleave path's python-double 1-s/r weights
             ((13, 13, 11), (40, 49)),    # H not, W integral
             ((25, 13, 7), (13, 40)),     # H strided downsample, W not
             ((13, 13, 11), (100, 40))]   # >1 row block + pad remainder
    os.environ["RMEM_ROWBLOCK_EPILOGUE"] = "1"
    try:
        for (h, w, c), out_hw in cases:
            x = rng.randn(1, h, w, c).astype(np.float32)
            x[..., -1] = -1e10  # mask_unused_ids-style disabled channel
            xj = jnp.asarray(x)
            ref = jnp.argmax(resize_bilinear(xj, out_hw, True)[0],
                             axis=-1).astype(jnp.int32)
            new = upsample_argmax(xj, out_hw, True)
            assert new.shape == out_hw
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))
    finally:
        del os.environ["RMEM_ROWBLOCK_EPILOGUE"]


def test_upsample_argmax_rejects_batched_input():
    """The fused epilogue's contract is batch-1; larger batches must fail
    loudly instead of silently dropping batch elements (ADVICE r4)."""
    import pytest

    from rmem_tpu.ops.resize import upsample_argmax

    x = jnp.zeros((2, 5, 5, 3), jnp.float32)
    with pytest.raises(ValueError, match="batch 1"):
        upsample_argmax(x, (9, 9), True)
