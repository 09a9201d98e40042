"""Checkpoint converter coverage: fabricate a reference-named torch
state_dict (names/shapes follow the reference module definitions) and check
every init param is matched by the converter — catching any naming or
transpose drift between our modules and the mapping."""

import os
import numpy as np
import jax
import pytest

from rmem_tpu.config import get_config
from rmem_tpu.models import build_vos_model, init_params
from rmem_tpu.utils.checkpoint import (convert_torch_checkpoint,
                                       latest_checkpoint, load_pytree,
                                       save_checkpoint)
import flax.traverse_util as trav

HW = (33, 33)


def _fabricate_torch_sd(flat_params, model_vos):
    """Invert the converter's transforms to produce torch-shaped arrays with
    reference names."""
    rng = np.random.RandomState(0)
    sd = {}

    def torch_name(path):
        p = list(path)
        j = "/".join(p)
        if p[0] == "encoder":
            if p[1].startswith("layer"):
                stage, idx = p[1].split("_")
                sub = {"downsample_conv": "downsample.0",
                       "downsample_bn": "downsample.1"}.get(p[2], p[2])
                return f"encoder.{stage}.{idx}.{sub}"
            return f"encoder.{p[1]}"
        if p[0] == "lstt":
            if p[1].startswith("decoder_norm"):
                if model_vos == "deaot":
                    # GPM wraps GroupNorm in GroupNorm1D -> `.gn.` keys
                    # (basic.py:6-12; transformer.py:755-758)
                    return f"LSTT.decoder_norms.{p[1][-1]}.gn"
                return f"LSTT.decoder_norms.{p[1][-1]}"
            i = p[1][-1]
            rest = p[2:-1] + [p[-1]] if False else p[2:]
            mid = rest[:-1]
            name_map = {
                ("long_proj",): "long_term_attn.projection",
                ("short_proj",): "short_term_attn.projection",
                ("long_tail", "dw_conv", "conv"): "long_term_attn.dw_conv.conv",
                ("long_tail", "projection"): "long_term_attn.projection",
                ("short_tail", "dw_conv", "conv"):
                    "short_term_attn.dw_conv.conv",
                ("short_tail", "projection"): "short_term_attn.projection",
                ("relative_emb_k",): "short_term_attn.relative_emb_k",
                ("self_attn", "tail", "dw_conv", "conv"):
                    "self_attn.dw_conv.conv",
                ("self_attn", "tail", "projection"): "self_attn.projection",
                ("activation", "gn"): "activation.gn",
                ("activation", "conv"): "activation.conv",
            }
            mid_t = name_map.get(tuple(mid), ".".join(mid))
            return f"LSTT.layers.{i}.{mid_t}"
        if p[0] == "decoder":
            return "decoder." + ".".join(p[1:-1])
        return ".".join(p[:-1]) if len(p) > 1 else p[0]

    for path, leaf in flat_params.items():
        leaf = np.asarray(leaf)
        tname = torch_name(path)
        last = path[-1]
        is_bn = (path[0] == "encoder"
                 and ("bn" in path[-2] if len(path) > 1 else False))
        if is_bn:
            # emit gamma/beta/mean/var once per BN
            c = leaf.shape[0]
            if f"{tname}.running_mean" not in sd:
                sd[f"{tname}.weight"] = rng.randn(c).astype(np.float32)
                sd[f"{tname}.bias"] = rng.randn(c).astype(np.float32)
                sd[f"{tname}.running_mean"] = rng.randn(c).astype(np.float32)
                sd[f"{tname}.running_var"] = np.abs(
                    rng.randn(c)).astype(np.float32) + 0.5
            continue
        if last == "kernel":
            if leaf.ndim == 4:
                sd[f"{tname}.weight"] = np.transpose(
                    rng.randn(*leaf.shape).astype(np.float32), (3, 2, 0, 1))
            else:
                sd[f"{tname}.weight"] = np.transpose(
                    rng.randn(*leaf.shape).astype(np.float32), (1, 0))
        elif last == "scale":
            sd[f"{tname}.weight"] = rng.randn(*leaf.shape).astype(np.float32)
        elif last == "bias":
            sd[f"{tname}.bias"] = rng.randn(*leaf.shape).astype(np.float32)
        else:  # cur_pos_emb / mem_pos_emb
            sd[tname] = rng.randn(*leaf.shape).astype(np.float32)
    return sd


@pytest.mark.parametrize("model_name", ["r50_aotl", "r50_deaotl"])
def test_converter_full_coverage(model_name):
    cfg = get_config("pre_vost", model=model_name)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    flat = trav.flatten_dict(params)
    sd = _fabricate_torch_sd(flat, cfg.model_vos)
    conv = convert_torch_checkpoint(sd, cfg.model_vos,
                                    cfg.model_lstt_num, cfg.id_channels)
    flat_conv = trav.flatten_dict(conv)
    missing = [k for k in flat if k not in flat_conv]
    assert not missing, f"converter missed {missing[:10]}"
    bad = [(k, flat_conv[k].shape, flat[k].shape) for k in flat
           if flat_conv[k].shape != flat[k].shape]
    assert not bad, f"shape mismatches {bad[:10]}"


def test_converter_id_bank_padding():
    """11->12 channel ignore-token padding (utils/checkpoint.py:86-97)."""
    cfg = get_config("pre_vost", model="r50_aotl")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    flat = trav.flatten_dict(params)
    sd = _fabricate_torch_sd(flat, cfg.model_vos)
    w = sd["patch_wise_id_bank.weight"]          # [256, 12, 17, 17]
    sd["patch_wise_id_bank.weight"] = w[:, :11]  # drop ignore channel
    conv = convert_torch_checkpoint(sd, "aot", cfg.model_lstt_num, 12)
    got = trav.flatten_dict(conv)[("patch_wise_id_bank", "kernel")]
    assert got.shape[2] == 12
    assert np.all(got[:, :, 11] == 0)


def test_save_load_roundtrip(tmp_path):
    cfg = get_config("test", model="r50_deaotl")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    d = str(tmp_path / "ckpt")
    save_checkpoint(params, d, 500, max_keep=2)
    save_checkpoint(params, d, 1000, max_keep=2)
    save_checkpoint(params, d, 1500, max_keep=2)
    import os
    assert len(os.listdir(d)) == 2  # pruned to max_keep
    path, step = latest_checkpoint(d)
    assert step == 1500
    loaded = load_pytree(params, path)
    a = trav.flatten_dict(params)
    b = trav.flatten_dict(loaded)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def _fabricate_encoder_sd(flat_params, kind):
    """Torch-style names/shapes for swin/mobilenet encoder params."""
    rng = np.random.RandomState(3)
    sd = {}

    def bn_group(tname, c):
        sd[f"{tname}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{tname}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{tname}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{tname}.running_var"] = np.abs(
            rng.randn(c)).astype(np.float32) + 0.5

    for path, leaf in flat_params.items():
        if path[0] != "encoder":
            continue
        leaf = np.asarray(leaf)
        p = list(path)
        if kind == "swin":
            j = "/".join(p[1:])
            name = None
            if p[1] == "patch_embed":
                name = "encoder.patch_embed.proj"
            elif p[1] == "patch_norm":
                name = "encoder.patch_embed.norm"
            elif p[1].startswith("stage"):
                st, bl = p[1].replace("stage", "").split("_block")
                sub = {"norm1": "norm1", "norm2": "norm2",
                       "fc1": "mlp.fc1", "fc2": "mlp.fc2"}.get(p[2])
                if p[2] == "attn":
                    if p[3] == "relative_position_bias_table":
                        sd[f"encoder.layers.{st}.blocks.{bl}.attn."
                           f"relative_position_bias_table"] = \
                            rng.randn(*leaf.shape).astype(np.float32)
                        continue
                    sub = f"attn.{p[3]}"
                name = f"encoder.layers.{st}.blocks.{bl}.{sub}"
            elif p[1].startswith("merge"):
                i = p[1][-1]
                sub = {"norm": "norm", "reduction": "reduction"}[p[2]]
                name = f"encoder.layers.{i}.downsample.{sub}"
            elif p[1].startswith("out_norm"):
                name = f"encoder.norm{p[1][-1]}"
        else:  # mobilenetv2
            block_map = {"pw": "0", "dw": "1"}
            if p[1] == "stem":
                if p[2] == "bn":
                    bn_group("encoder.features.0.1", leaf.shape[0])
                    continue
                name = "encoder.features.0.0"
            elif p[1] == "head":
                if p[2] == "bn":
                    bn_group("encoder.features.18.1", leaf.shape[0])
                    continue
                name = "encoder.features.18.0"
            else:
                idx = int(p[1].replace("block", ""))
                has_pw = any(k[1] == p[1] and k[2] == "pw"
                             for k in flat_params)
                if p[2] == "pw":
                    if p[3] == "bn":
                        bn_group(f"encoder.features.{idx}.conv.0.1",
                                 leaf.shape[0])
                        continue
                    name = f"encoder.features.{idx}.conv.0.0"
                elif p[2] == "dw":
                    base = "1" if has_pw else "0"
                    if p[3] == "bn":
                        bn_group(f"encoder.features.{idx}.conv.{base}.1",
                                 leaf.shape[0])
                        continue
                    name = f"encoder.features.{idx}.conv.{base}.0"
                elif p[2] == "pw_linear":
                    name = f"encoder.features.{idx}.conv." + \
                        ("2" if has_pw else "1")
                elif p[2] == "bn_out":
                    bn_group(f"encoder.features.{idx}.conv." +
                             ("3" if has_pw else "2"), leaf.shape[0])
                    continue
        assert name is not None, path
        last = path[-1]
        if last == "kernel":
            if leaf.ndim == 4:
                sd[f"{name}.weight"] = np.transpose(
                    rng.randn(*leaf.shape).astype(np.float32), (3, 2, 0, 1))
            else:
                sd[f"{name}.weight"] = np.transpose(
                    rng.randn(*leaf.shape).astype(np.float32), (1, 0))
        elif last == "scale":
            sd[f"{name}.weight"] = rng.randn(*leaf.shape).astype(np.float32)
        elif last == "bias":
            sd[f"{name}.bias"] = rng.randn(*leaf.shape).astype(np.float32)
    return sd


@pytest.mark.parametrize("kind,builder", [
    ("swin", "swin_base"),
    ("mobilenetv2", "mobilenetv2"),
])
def test_encoder_converter_coverage(kind, builder):
    import jax as _jax
    import jax.numpy as jnp
    from rmem_tpu.models.encoders import build_encoder
    from rmem_tpu.utils.checkpoint import (_convert_mobilenetv2,
                                           _convert_swin)
    enc = build_encoder(builder)
    x = jnp.zeros((1, 65, 65, 3))
    variables = _jax.jit(lambda: enc.init(_jax.random.PRNGKey(0), x))()
    # wrap under an "encoder" scope to mirror the model tree
    flat = {("encoder",) + k: v
            for k, v in trav.flatten_dict(variables["params"]).items()}
    sd = _fabricate_encoder_sd(flat, kind)
    out = {}
    if kind == "swin":
        _convert_swin(sd, out)
    else:
        _convert_mobilenetv2(sd, out)
    missing = [k for k in flat if k not in out]
    assert not missing, f"converter missed {missing[:8]}"
    bad = [(k, out[k].shape, flat[k].shape) for k in flat
           if out[k].shape != flat[k].shape]
    assert not bad, f"shape mismatches {bad[:8]}"


def _rand_like_torch_conv(rng, leaf):
    """Torch-shaped random conv weight for a flax kernel [kh,kw,in,out]."""
    kh, kw, cin, cout = leaf.shape
    return rng.randn(cout, cin, kh, kw).astype(np.float32)


def _fabricate_mnv3_sd(flat, rng):
    sd = {}

    def bn(t, c):
        sd[f"{t}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{t}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{t}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{t}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + .5

    for path, leaf in flat.items():
        leaf = np.asarray(leaf)
        p = list(path)
        if p[1] == "stem":
            sd["encoder.features.0.0.weight"] = _rand_like_torch_conv(
                rng, leaf)
        elif p[1] == "stem_bn":
            bn("encoder.features.0.1", leaf.shape[0])
        elif p[1] == "head":
            sd["encoder.conv.0.weight"] = _rand_like_torch_conv(rng, leaf)
        elif p[1] == "head_bn":
            bn("encoder.conv.1", leaf.shape[0])
        elif p[1].startswith("block"):
            i = int(p[1].replace("block", ""))
            has_pw = any(k[1] == p[1] and k[2] == "pw" for k in flat)
            tp = f"encoder.features.{i}.conv"
            idx = {  # torch Sequential indices (mobilenetv3.py:95-133)
                "pw": "0", "pw_bn": "1",
                "dw": "3" if has_pw else "0",
                "dw_bn": "4" if has_pw else "1",
                "se": "5" if has_pw else "3",
                "pw_linear": "7" if has_pw else "4",
                "out_bn": "8" if has_pw else "5"}[p[2]]
            if p[2].endswith("bn") or p[2] == "out_bn":
                bn(f"{tp}.{idx}", leaf.shape[0])
            elif p[2] == "se":
                fc = "0" if p[3] == "fc1" else "2"
                if p[4] == "kernel":
                    sd[f"{tp}.{idx}.fc.{fc}.weight"] = np.transpose(
                        rng.randn(*leaf.shape).astype(np.float32), (1, 0))
                else:
                    sd[f"{tp}.{idx}.fc.{fc}.bias"] = rng.randn(
                        *leaf.shape).astype(np.float32)
            else:
                sd[f"{tp}.{idx}.weight"] = _rand_like_torch_conv(rng, leaf)
    return sd


def _fabricate_resnest_sd(flat, rng):
    sd = {}

    def bn(t, c):
        sd[f"{t}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{t}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{t}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{t}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + .5

    stem = {"stem0": "encoder.conv1.0", "stem1": "encoder.conv1.3",
            "stem2": "encoder.conv1.6"}
    stem_bn = {"stem0_bn": "encoder.conv1.1", "stem1_bn": "encoder.conv1.4",
               "bn1": "encoder.bn1"}
    for path, leaf in flat.items():
        leaf = np.asarray(leaf)
        p = list(path)
        if p[1] in stem:
            sd[f"{stem[p[1]]}.weight"] = _rand_like_torch_conv(rng, leaf)
        elif p[1] in stem_bn:
            bn(stem_bn[p[1]], leaf.shape[0])
        elif p[1].startswith("layer"):
            st, i = p[1].replace("layer", "").split("_")
            tp = f"encoder.layer{st}.{i}"
            if p[2] == "conv2":  # SplAtConv2d
                sub = p[3]
                if sub.startswith("bn"):
                    bn(f"{tp}.conv2.{sub}", leaf.shape[0])
                elif p[4] == "bias":
                    sd[f"{tp}.conv2.{sub}.bias"] = rng.randn(
                        *leaf.shape).astype(np.float32)
                else:
                    sd[f"{tp}.conv2.{sub}.weight"] = _rand_like_torch_conv(
                        rng, leaf)
            elif p[2].startswith("bn"):
                bn(f"{tp}.{p[2]}", leaf.shape[0])
            elif p[2] == "downsample_conv":
                sd[f"{tp}.downsample.1.weight"] = _rand_like_torch_conv(
                    rng, leaf)
            elif p[2] == "downsample_bn":
                bn(f"{tp}.downsample.2", leaf.shape[0])
            else:
                sd[f"{tp}.{p[2]}.weight"] = _rand_like_torch_conv(rng, leaf)
    return sd


def _fabricate_topdown_sd(flat, rng):
    sd = {}

    def bn(t, c):
        sd[f"{t}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{t}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{t}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{t}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + .5

    def conv_t_shape(leaf):  # flax [kh,kw,in,out] -> torch [in,out,kh,kw]
        kh, kw, cin, cout = leaf.shape
        return rng.randn(cin, cout, kh, kw).astype(np.float32)

    for path, leaf in flat.items():
        leaf = np.asarray(leaf)
        p = list(path)
        if p[1] == "conv1":
            sd["encoder.conv1.weight"] = _rand_like_torch_conv(rng, leaf)
        elif p[1] == "bn1":
            bn("encoder.bn1", leaf.shape[0])
        elif p[1].startswith("layer"):
            st, i = p[1].replace("layer", "").split("_")
            tp = f"encoder.layer{st}.{i}"
            sub = {"downsample_conv": "downsample.0",
                   "downsample_bn": "downsample.1"}.get(p[2], p[2])
            if "bn" in p[2]:
                bn(f"{tp}.{sub}", leaf.shape[0])
            else:
                sd[f"{tp}.{sub}.weight"] = _rand_like_torch_conv(rng, leaf)
        elif p[1] == "dec0":
            if p[2] == "unpool":
                if p[3] == "bias":
                    sd["encoder.decoders.0.0.bias"] = rng.randn(
                        *leaf.shape).astype(np.float32)
                else:
                    sd["encoder.decoders.0.0.weight"] = conv_t_shape(leaf)
            elif p[2] == "linear":
                sd["encoder.decoders.0.1.linear.weight"] = conv_t_shape(leaf)
            else:
                sd["encoder.decoders.0.1.linear2.weight"] = \
                    _rand_like_torch_conv(rng, leaf)
        elif p[1].startswith("dec"):
            i = p[1][-1]
            if p[2] == "linear":
                sd[f"encoder.decoders.{i}.linear.weight"] = conv_t_shape(leaf)
            else:
                sd[f"encoder.decoders.{i}.linear2.weight"] = \
                    _rand_like_torch_conv(rng, leaf)
        elif p[1] == "prompt":
            sd["encoder.prompt"] = rng.randn(*leaf.shape).astype(np.float32)
        elif p[1] == "top_down_transform":
            sd["encoder.top_down_transform"] = rng.randn(
                *leaf.shape).astype(np.float32)
    return sd


@pytest.mark.parametrize("kind,builder", [
    ("mobilenetv3", "mobilenetv3"),
    ("resnest", "resnest50"),
    ("topdown", "resnet50_topdown"),
])
def test_encoder_converter_coverage_extended(kind, builder):
    import jax as _jax
    import jax.numpy as jnp
    from rmem_tpu.models.encoders import build_encoder
    from rmem_tpu.utils.checkpoint import (_convert_mobilenetv3,
                                           _convert_resnest,
                                           _convert_topdown)
    enc = build_encoder(builder)
    x = jnp.zeros((1, 65, 65, 3))
    variables = _jax.jit(lambda: enc.init(_jax.random.PRNGKey(0), x))()
    flat = {("encoder",) + k: v
            for k, v in trav.flatten_dict(variables["params"]).items()}
    rng = np.random.RandomState(7)
    fab = {"mobilenetv3": _fabricate_mnv3_sd, "resnest": _fabricate_resnest_sd,
           "topdown": _fabricate_topdown_sd}[kind]
    conv_fn = {"mobilenetv3": _convert_mobilenetv3,
               "resnest": _convert_resnest,
               "topdown": _convert_topdown}[kind]
    sd = fab(flat, rng)
    out = {}
    conv_fn(sd, out)
    missing = [k for k in flat if k not in out]
    assert not missing, f"converter missed {missing[:8]}"
    bad = [(k, out[k].shape, flat[k].shape) for k in flat
           if out[k].shape != flat[k].shape]
    assert not bad, f"shape mismatches {bad[:8]}"


def test_converter_time_encode_report():
    """TIME_ENCODE checkpoints carry Q/K_time_encode MLPs that are dead in
    the reference itself (constructed at transformer.py:518-527, never
    called; the engine's sinusoidal table, aot_engine.py:293-300,413-421, is
    stored on self and never passed to the transformer). The converter must
    classify them as known-dead, not silently-lost (VERDICT r1 #9)."""
    cfg = get_config("pre_vost", model="r50_aotl")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    flat = trav.flatten_dict(params)
    sd = _fabricate_torch_sd(flat, cfg.model_vos)
    rng = np.random.RandomState(3)
    d = cfg.model_encoder_embedding_dim
    for i in range(cfg.model_lstt_num):
        for side in ("Q", "K"):
            for li in (0, 2):  # Sequential(Linear, ReLU, Linear)
                sd[f"LSTT.layers.{i}.{side}_time_encode.{li}.weight"] = \
                    rng.randn(d, d).astype(np.float32)
                sd[f"LSTT.layers.{i}.{side}_time_encode.{li}.bias"] = \
                    rng.randn(d).astype(np.float32)
    sd["encoder.bn1.num_batches_tracked"] = np.asarray(100)
    sd["some.novel.thing.weight"] = rng.randn(4).astype(np.float32)

    report = {}
    conv = convert_torch_checkpoint(sd, cfg.model_vos, cfg.model_lstt_num,
                                    cfg.id_channels, report=report)
    # conversion is unaffected
    flat_conv = trav.flatten_dict(conv)
    assert not [k for k in flat if k not in flat_conv]
    # 3 layers x 2 sides x 2 linears x 2 tensors + 1 BN counter
    assert len(report["dead_keys"]) == 3 * 2 * 2 * 2 + 1
    assert all("time_encode" in k or "num_batches" in k
               for k in report["dead_keys"])
    assert report["unexpected_keys"] == ["some.novel.thing.weight"]


def test_converter_gru_memory_coverage_and_values():
    """memory_grus (GRU_MEMORY compressed eviction, transformer.py:529-545)
    convert onto our ConvGRUCellOutput params with value parity."""
    import torch

    cfg = get_config("pre_vost", model="r50_aotl", gru_memory=True)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    flat = trav.flatten_dict(params)
    sd = _fabricate_torch_sd(flat, cfg.model_vos)
    # drop the auto-fabricated (wrongly named) gru keys; we add the real
    # reference-named memory_grus.* keys below
    sd = {k: v for k, v in sd.items() if "memory_gru_" not in k}
    rng = np.random.RandomState(11)
    d = cfg.model_encoder_embedding_dim
    for i in range(cfg.model_lstt_num):
        for gi, k in ((0, 2), (1, 1)):  # K-plane kernel 2x2, V-plane 1x1
            t = f"LSTT.layers.{i}.memory_grus.{gi}"
            sd[f"{t}.conv_gru_cell.conv_gates.weight"] = rng.randn(
                2 * d, 2 * d, k, k).astype(np.float32) * 0.05
            sd[f"{t}.conv_gru_cell.conv_gates.bias"] = rng.randn(
                2 * d).astype(np.float32) * 0.05
            sd[f"{t}.conv_gru_cell.conv_can.weight"] = rng.randn(
                d, 2 * d, k, k).astype(np.float32) * 0.05
            sd[f"{t}.conv_gru_cell.conv_can.bias"] = rng.randn(
                d).astype(np.float32) * 0.05
            sd[f"{t}.output_conv.weight"] = rng.randn(
                d, d, 1, 1).astype(np.float32) * 0.05
            sd[f"{t}.output_conv.bias"] = rng.randn(d).astype(np.float32)

    report = {}
    conv = convert_torch_checkpoint(sd, cfg.model_vos, cfg.model_lstt_num,
                                    cfg.id_channels, report=report)
    flat_conv = trav.flatten_dict(conv)
    missing = [k for k in flat if k not in flat_conv]
    assert not missing, f"converter missed {missing[:8]}"
    assert report["unexpected_keys"] == []

    # value parity: run torch's ConvGRUCellOutput math vs ours on block0 K
    def torch_gru(x, h, t):
        x, h = torch.tensor(x), torch.tensor(h)  # NCHW
        def c2d(name, inp, pad):
            w = torch.tensor(sd[f"{t}.{name}.weight"])
            b = torch.tensor(sd[f"{t}.{name}.bias"])
            return torch.nn.functional.conv2d(inp, w, b, padding=pad)
        comb = torch.cat([x, h], dim=1)
        # torch padding='same' for k=2: F.pad asymmetric (left 0, right 1)
        if sd[f"{t}.conv_gru_cell.conv_gates.weight"].shape[2] == 2:
            comb_p = torch.nn.functional.pad(comb, (0, 1, 0, 1))
            gates = c2d("conv_gru_cell.conv_gates", comb_p, 0)
        else:
            gates = c2d("conv_gru_cell.conv_gates", comb, 0)
        gamma, beta = torch.split(gates, gates.shape[1] // 2, dim=1)
        reset, update = torch.sigmoid(gamma), torch.sigmoid(beta)
        comb2 = torch.cat([x, reset * h], dim=1)
        if sd[f"{t}.conv_gru_cell.conv_can.weight"].shape[2] == 2:
            comb2 = torch.nn.functional.pad(comb2, (0, 1, 0, 1))
        cand = torch.tanh(c2d("conv_gru_cell.conv_can", comb2, 0))
        h_next = (1 - update) * h + update * cand
        out = c2d("output_conv", h_next, 0)
        return h_next.numpy(), out.numpy()

    from rmem_tpu.models.conv_gru import ConvGRUCellOutput
    x = rng.randn(1, d, 5, 7).astype(np.float32)
    h = rng.randn(1, d, 5, 7).astype(np.float32)
    th, tout = torch_gru(x, h, "LSTT.layers.0.memory_grus.0")
    gmod = ConvGRUCellOutput(d, d, kernel=2)
    gparams = {"params": conv["lstt"]["block0"]["memory_gru_k"]}
    jh, jout = gmod.apply(gparams, np.transpose(x, (0, 2, 3, 1)),
                          np.transpose(h, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(np.asarray(jh), (0, 3, 1, 2)),
                               th, atol=2e-5)
    np.testing.assert_allclose(np.transpose(np.asarray(jout), (0, 3, 1, 2)),
                               tout, atol=2e-5)


def test_save_pytree_atomic_no_partial_file(tmp_path):
    """save_pytree writes via temp+rename, so the final name either has the
    complete bytes or does not exist; the .tmp never matches the resume
    scanner's *.msgpack filter."""
    from rmem_tpu.utils.checkpoint import save_pytree
    tree = {"a": np.arange(1000, dtype=np.float32)}
    path = str(tmp_path / "d" / "save_step_100.msgpack")
    save_pytree(tree, path)
    import os
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")
    got = load_pytree({"a": np.zeros(1000, np.float32)}, path)
    np.testing.assert_array_equal(got["a"], tree["a"])


def test_load_latest_checkpoint_skips_truncated(tmp_path):
    """The 20k-step kill/resume exercise produced a 0-byte latest save
    (SIGKILL mid-write, pre-atomic-rename); resume must fall back to the
    previous complete checkpoint instead of crashing."""
    from rmem_tpu.utils.checkpoint import load_latest_checkpoint, save_pytree
    d = str(tmp_path / "ckpt")
    t500 = {"a": np.full(10, 5.0, np.float32)}
    t1000 = {"a": np.full(10, 7.0, np.float32)}
    save_pytree(t500, os.path.join(d, "save_step_500.msgpack"))
    save_pytree(t1000, os.path.join(d, "save_step_1000.msgpack"))
    # truncated latest (what the mid-write SIGKILL left behind)
    with open(os.path.join(d, "save_step_1500.msgpack"), "wb"):
        pass
    logs = []
    got = load_latest_checkpoint({"a": np.zeros(10, np.float32)}, d,
                                 log=logs.append)
    assert got is not None
    state, step, path = got
    assert step == 1000 and path.endswith("save_step_1000.msgpack")
    np.testing.assert_array_equal(state["a"], t1000["a"])
    assert any("unreadable" in s for s in logs)
    # all corrupt -> None
    with open(os.path.join(d, "save_step_500.msgpack"), "wb"):
        pass
    with open(os.path.join(d, "save_step_1000.msgpack"), "wb"):
        pass
    assert load_latest_checkpoint({"a": np.zeros(10, np.float32)}, d,
                                  log=logs.append) is None
