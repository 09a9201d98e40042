"""Checkpoint I/O: native pytree checkpoints + torch .pth converter.

Native format: flax msgpack files (params / opt_state / EMA), cadence and
retention mirroring the reference (save every 500 steps, keep last 8,
aot_plus/utils/checkpoint.py:104-138, configs/default.py:79-81).

Converter: maps the reference's released PyTorch state_dicts
(R50_AOTL / R50_DeAOTL families) onto our param tree — conv OIHW->HWIO,
linear [out,in]->[in,out], BN (gamma,beta,mean,var) folded into FoldedBN
(scale,bias), `module.` prefixes stripped, 11->12-channel id-bank padding for
the ignore token (utils/checkpoint.py:86-97).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import flax.serialization
import flax.traverse_util as trav
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# native save/load
# ---------------------------------------------------------------------------

def save_pytree(tree, path: str):
    """Atomic write (temp + rename): a SIGKILL mid-save must never leave a
    truncated file at the final name — the 20k-step kill/resume exercise
    (VERDICT r3 Next #2) found exactly that: a 0-byte save_step_10000 from
    a kill 30 s after the save started, which auto-resume then tried to
    load. The reference has the same hazard (torch.save straight to the
    final path, utils/checkpoint.py:112-118); rename-into-place fixes it."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(tree))
    os.replace(tmp, path)


def load_pytree(template, path: str):
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def save_checkpoint(state, ckpt_dir: str, step: int, max_keep: int = 8,
                    prefix: str = "save_step_"):
    """Save + prune to max_keep (utils/checkpoint.py:130-138). On write
    failure (full/unwritable result volume), falls back to ./saved_models
    like the reference (utils/checkpoint.py:120-128)."""
    path = os.path.join(ckpt_dir, f"{prefix}{step}.msgpack")
    try:
        save_pytree(state, path)
    except OSError as e:
        fallback = "./saved_models"
        print(f"checkpoint save to {path} failed ({e}); "
              f"retrying in {fallback}")
        os.makedirs(fallback, exist_ok=True)
        ckpt_dir = fallback
        path = os.path.join(ckpt_dir, f"{prefix}{step}.msgpack")
        save_pytree(state, path)
    kept = sorted(
        (f for f in os.listdir(ckpt_dir)
         if f.startswith(prefix) and f.endswith(".msgpack")),
        key=lambda f: int(re.findall(r"\d+", f)[-1]))
    for f in kept[:-max_keep]:
        os.remove(os.path.join(ckpt_dir, f))
    return path


def latest_checkpoint(ckpt_dir: str, prefix: str = "save_step_"
                      ) -> Optional[Tuple[str, int]]:
    """Auto-resume scan (trainer.py:188-198)."""
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = [f for f in os.listdir(ckpt_dir)
             if f.startswith(prefix) and f.endswith(".msgpack")]
    if not ckpts:
        return None
    steps = [int(re.findall(r"\d+", f)[-1]) for f in ckpts]
    i = int(np.argmax(steps))
    return os.path.join(ckpt_dir, ckpts[i]), steps[i]


def load_latest_checkpoint(template, ckpt_dir: str,
                           prefix: str = "save_step_", log=print):
    """Auto-resume with corrupt-file fallback: try checkpoints newest to
    oldest, skipping any that fail to deserialize. Atomic saves make a
    truncated latest unlikely, but pre-fix files (or torn storage) must
    degrade to the previous save, not crash the trainer.

    Returns (state, step, path) or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = [f for f in os.listdir(ckpt_dir)
             if f.startswith(prefix) and f.endswith(".msgpack")]
    for f in sorted(ckpts, key=lambda f: -int(re.findall(r"\d+", f)[-1])):
        path = os.path.join(ckpt_dir, f)
        try:
            state = load_pytree(template, path)
        except Exception as e:  # truncated/corrupt: fall back
            log(f"checkpoint {path} unreadable ({type(e).__name__}: {e}); "
                f"falling back to the previous save")
            continue
        return state, int(re.findall(r"\d+", f)[-1]), path
    return None


# ---------------------------------------------------------------------------
# torch .pth conversion
# ---------------------------------------------------------------------------

BN_EPS = 1e-5


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str):
    gamma = sd[f"{prefix}.weight"]
    beta = sd[f"{prefix}.bias"]
    mean = sd[f"{prefix}.running_mean"]
    var = sd[f"{prefix}.running_var"]
    scale = gamma / np.sqrt(var + BN_EPS)
    bias = beta - mean * scale
    return {"scale": scale.astype(np.float32),
            "bias": bias.astype(np.float32)}


def _conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    """[out, in] -> [in, out]; 1x1 conv weights squeeze first."""
    if w.ndim == 4:  # 1x1 conv used as a dense layer
        w = w[:, :, 0, 0]
    return np.transpose(w, (1, 0))


def _conv_t(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [in,out,kH,kW] -> flax ConvTranspose
    [kH,kW,in,out] (default transpose_kernel=False needs the spatial flip;
    verified numerically against torch)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


class _RecordingDict(dict):
    """Tracks which source keys a conversion actually read, so unconsumed
    checkpoint content is reported instead of silently dropped."""

    def __init__(self, sd):
        super().__init__(sd)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


# Keys that exist in reference checkpoints but are dead at runtime in the
# reference itself, so dropping them loses nothing:
# - Q_time_encode / K_time_encode: constructed when TIME_ENCODE=True
#   (transformer.py:518-527) but never called anywhere — the engine computes
#   a sinusoidal table (aot_engine.py:293-300,413-421) and stores it on self
#   without ever passing it to the transformer, and the MLPs have no call
#   site. Checkpoint-visible dead parameters.
# - num_batches_tracked: torch BN bookkeeping, irrelevant once BN is folded.
_KNOWN_DEAD_PATTERNS = (
    re.compile(r"\.(Q|K)_time_encode\.\d+\.(weight|bias)$"),
    re.compile(r"num_batches_tracked$"),
)


def classify_unconsumed(sd: "_RecordingDict") -> Tuple[List[str], List[str]]:
    """Split unread source keys into (known-dead, unexpected)."""
    dead, unexpected = [], []
    for k in sd:
        if k in sd.consumed:
            continue
        if any(p.search(k) for p in _KNOWN_DEAD_PATTERNS):
            dead.append(k)
        else:
            unexpected.append(k)
    return sorted(dead), sorted(unexpected)


def _convert_resnet(sd, out: Dict[Tuple[str, ...], np.ndarray],
                    layers=(3, 4, 6)):
    p = ("encoder",)
    out[p + ("conv1", "kernel")] = _conv(sd["encoder.conv1.weight"])
    for k, v in _fold_bn(sd, "encoder.bn1").items():
        out[p + ("bn1", k)] = v
    for stage, blocks in enumerate(layers, start=1):
        for i in range(blocks):
            tp = f"encoder.layer{stage}.{i}"
            fp = p + (f"layer{stage}_{i}",)
            for c in ("conv1", "conv2", "conv3"):
                out[fp + (c, "kernel")] = _conv(sd[f"{tp}.{c}.weight"])
            for b in ("bn1", "bn2", "bn3"):
                for k, v in _fold_bn(sd, f"{tp}.{b}").items():
                    out[fp + (b, k)] = v
            if f"{tp}.downsample.0.weight" in sd:
                out[fp + ("downsample_conv", "kernel")] = _conv(
                    sd[f"{tp}.downsample.0.weight"])
                for k, v in _fold_bn(sd, f"{tp}.downsample.1").items():
                    out[fp + ("downsample_bn", k)] = v


def _convert_swin(sd, out: Dict[Tuple[str, ...], np.ndarray],
                  depths=(2, 2, 18)):
    """Swin-B trunk (mmseg-style naming: patch_embed.proj, layers.i.blocks.j,
    layers.i.downsample, norm{i}) -> models/encoders/swin.py names. The dead
    32x stage (layers.3) is ignored."""
    e = ("encoder",)
    out[e + ("patch_embed", "kernel")] = _conv(
        sd["encoder.patch_embed.proj.weight"])
    out[e + ("patch_embed", "bias")] = sd["encoder.patch_embed.proj.bias"]
    _put_norm(sd, out, "encoder.patch_embed.norm", e + ("patch_norm",))
    for i, depth in enumerate(depths):
        for j in range(depth):
            t = f"encoder.layers.{i}.blocks.{j}"
            f = e + (f"stage{i}_block{j}",)
            _put_norm(sd, out, f"{t}.norm1", f + ("norm1",))
            _put_dense(sd, out, f"{t}.attn.qkv", f + ("attn", "qkv"))
            _put_dense(sd, out, f"{t}.attn.proj", f + ("attn", "proj"))
            out[f + ("attn", "relative_position_bias_table")] = \
                sd[f"{t}.attn.relative_position_bias_table"]
            _put_norm(sd, out, f"{t}.norm2", f + ("norm2",))
            _put_dense(sd, out, f"{t}.mlp.fc1", f + ("fc1",))
            _put_dense(sd, out, f"{t}.mlp.fc2", f + ("fc2",))
        _put_norm(sd, out, f"encoder.norm{i}", e + (f"out_norm{i}",))
        if i < len(depths) - 1:
            t = f"encoder.layers.{i}.downsample"
            f = e + (f"merge{i}",)
            _put_norm(sd, out, f"{t}.norm", f + ("norm",))
            _put_dense(sd, out, f"{t}.reduction", f + ("reduction",))


def _convert_mobilenetv2(sd, out: Dict[Tuple[str, ...], np.ndarray]):
    """Reference MobileNetV2 naming (features.N nested Sequentials,
    mobilenetv2.py:62-205) -> models/encoders/mobilenet.py names."""
    e = ("encoder",)
    out[e + ("stem", "conv", "kernel")] = _conv(
        sd["encoder.features.0.0.weight"])
    for k, v in _fold_bn(sd, "encoder.features.0.1").items():
        out[e + ("stem", "bn", k)] = v
    # inverted residual blocks: features.1..17
    setting = [(1, 1), (6, 2), (6, 3), (6, 4), (6, 3), (6, 3), (6, 1)]
    idx = 1
    for t_exp, n in setting:
        for _ in range(n):
            tp = f"encoder.features.{idx}.conv"
            f = e + (f"block{idx}",)
            if t_exp != 1:
                out[f + ("pw", "conv", "kernel")] = _conv(
                    sd[f"{tp}.0.0.weight"])
                for k, v in _fold_bn(sd, f"{tp}.0.1").items():
                    out[f + ("pw", "bn", k)] = v
                dw, pwl, bno = f"{tp}.1", f"{tp}.2", f"{tp}.3"
            else:
                dw, pwl, bno = f"{tp}.0", f"{tp}.1", f"{tp}.2"
            out[f + ("dw", "conv", "kernel")] = _conv(sd[f"{dw}.0.weight"])
            for k, v in _fold_bn(sd, f"{dw}.1").items():
                out[f + ("dw", "bn", k)] = v
            out[f + ("pw_linear", "kernel")] = _conv(sd[f"{pwl}.weight"])
            for k, v in _fold_bn(sd, bno).items():
                out[f + ("bn_out", k)] = v
            idx += 1
    out[e + ("head", "conv", "kernel")] = _conv(
        sd["encoder.features.18.0.weight"])
    for k, v in _fold_bn(sd, "encoder.features.18.1").items():
        out[e + ("head", "bn", k)] = v


def _convert_mobilenetv3(sd, out: Dict[Tuple[str, ...], np.ndarray]):
    """Reference MobileNetV3-Large naming (flat block Sequentials,
    mobilenetv3.py:78-205) -> models/encoders/mobilenetv3.py names."""
    e = ("encoder",)
    out[e + ("stem", "kernel")] = _conv(sd["encoder.features.0.0.weight"])
    for k, v in _fold_bn(sd, "encoder.features.0.1").items():
        out[e + ("stem_bn", k)] = v
    # (k, t, c, SE, HS, s) rows of the cfgs table (mobilenetv3.py:150-166);
    # only block 1 has inp == hidden (t=1), which drops the leading pw conv
    # and shifts every index down by 3
    se_blocks = {4, 5, 6, 11, 12, 13, 14, 15}
    for idx in range(1, 16):
        tp = f"encoder.features.{idx}.conv"
        f = e + (f"block{idx}",)
        has_pw = f"{tp}.0.weight" in sd and sd[f"{tp}.0.weight"].shape[2] == 1
        if has_pw:
            out[f + ("pw", "kernel")] = _conv(sd[f"{tp}.0.weight"])
            for k, v in _fold_bn(sd, f"{tp}.1").items():
                out[f + ("pw_bn", k)] = v
            dw, dwbn, se, pwl, bno = (f"{tp}.3", f"{tp}.4", f"{tp}.5",
                                      f"{tp}.7", f"{tp}.8")
        else:
            dw, dwbn, se, pwl, bno = (f"{tp}.0", f"{tp}.1", f"{tp}.3",
                                      f"{tp}.4", f"{tp}.5")
        out[f + ("dw", "kernel")] = _conv(sd[f"{dw}.weight"])
        for k, v in _fold_bn(sd, dwbn).items():
            out[f + ("dw_bn", k)] = v
        if idx in se_blocks:
            _put_dense(sd, out, f"{se}.fc.0", f + ("se", "fc1"))
            _put_dense(sd, out, f"{se}.fc.2", f + ("se", "fc2"))
        out[f + ("pw_linear", "kernel")] = _conv(sd[f"{pwl}.weight"])
        for k, v in _fold_bn(sd, bno).items():
            out[f + ("out_bn", k)] = v
    out[e + ("head", "kernel")] = _conv(sd["encoder.conv.0.weight"])
    for k, v in _fold_bn(sd, "encoder.conv.1").items():
        out[e + ("head_bn", k)] = v


def _convert_resnest(sd, out: Dict[Tuple[str, ...], np.ndarray],
                     layers=(3, 4, 6)):
    """ResNeSt deep-stem + split-attention naming (resnest/resnet.py:27-357,
    splat.py:15-115) -> models/encoders/resnest.py names."""
    e = ("encoder",)
    # deep stem: conv1 = Sequential(conv,bn,relu,conv,bn,relu,conv) + bn1
    for ti, fn, bn in ((0, "stem0", "stem0_bn"), (3, "stem1", "stem1_bn"),
                       (6, "stem2", "bn1")):
        out[e + (fn, "kernel")] = _conv(sd[f"encoder.conv1.{ti}.weight"])
        bkey = "encoder.bn1" if bn == "bn1" else f"encoder.conv1.{ti + 1}"
        for k, v in _fold_bn(sd, bkey).items():
            out[e + (bn, k)] = v
    for stage, blocks in enumerate(layers, start=1):
        for i in range(blocks):
            tp = f"encoder.layer{stage}.{i}"
            fp = e + (f"layer{stage}_{i}",)
            for c in ("conv1", "conv3"):
                out[fp + (c, "kernel")] = _conv(sd[f"{tp}.{c}.weight"])
            for b in ("bn1", "bn3"):
                for k, v in _fold_bn(sd, f"{tp}.{b}").items():
                    out[fp + (b, k)] = v
            sp = fp + ("conv2",)
            out[sp + ("conv", "kernel")] = _conv(sd[f"{tp}.conv2.conv.weight"])
            for k, v in _fold_bn(sd, f"{tp}.conv2.bn0").items():
                out[sp + ("bn0", k)] = v
            out[sp + ("fc1", "kernel")] = _conv(sd[f"{tp}.conv2.fc1.weight"])
            out[sp + ("fc1", "bias")] = sd[f"{tp}.conv2.fc1.bias"]
            for k, v in _fold_bn(sd, f"{tp}.conv2.bn1").items():
                out[sp + ("bn1", k)] = v
            out[sp + ("fc2", "kernel")] = _conv(sd[f"{tp}.conv2.fc2.weight"])
            out[sp + ("fc2", "bias")] = sd[f"{tp}.conv2.fc2.bias"]
            # avg_down shortcut: Sequential(AvgPool, Conv, BN) -> indices 1,2
            if f"{tp}.downsample.1.weight" in sd:
                out[fp + ("downsample_conv", "kernel")] = _conv(
                    sd[f"{tp}.downsample.1.weight"])
                for k, v in _fold_bn(sd, f"{tp}.downsample.2").items():
                    out[fp + ("downsample_bn", k)] = v


def _convert_topdown(sd, out: Dict[Tuple[str, ...], np.ndarray]):
    """ResNet_TopDown (resnet.py:216-300): the ResNet trunk plus feedback
    decoders, prompt, and top-down transform."""
    _convert_resnet(sd, out)
    e = ("encoder",)
    # decoders.0 = Sequential(ConvTranspose(bias), Decode_Block(k7 s2))
    out[e + ("dec0", "unpool", "kernel")] = _conv_t(
        sd["encoder.decoders.0.0.weight"])
    out[e + ("dec0", "unpool", "bias")] = sd["encoder.decoders.0.0.bias"]
    out[e + ("dec0", "linear", "kernel")] = _conv_t(
        sd["encoder.decoders.0.1.linear.weight"])
    out[e + ("dec0", "linear2", "kernel")] = _conv(
        sd["encoder.decoders.0.1.linear2.weight"])
    for i in (1, 2, 3):
        out[e + (f"dec{i}", "linear", "kernel")] = _conv_t(
            sd[f"encoder.decoders.{i}.linear.weight"])
        out[e + (f"dec{i}", "linear2", "kernel")] = _conv(
            sd[f"encoder.decoders.{i}.linear2.weight"])
    out[e + ("prompt",)] = sd["encoder.prompt"]
    out[e + ("top_down_transform",)] = sd["encoder.top_down_transform"]


def _put_dense(sd, out, tname: str, fpath: Tuple[str, ...],
               required: bool = True):
    wkey = f"{tname}.weight"
    if wkey not in sd:
        if required:
            raise KeyError(wkey)
        return
    out[fpath + ("kernel",)] = _dense(sd[wkey])
    if f"{tname}.bias" in sd:
        out[fpath + ("bias",)] = sd[f"{tname}.bias"]


def _put_norm(sd, out, tname: str, fpath: Tuple[str, ...]):
    out[fpath + ("scale",)] = sd[f"{tname}.weight"]
    out[fpath + ("bias",)] = sd[f"{tname}.bias"]


def _convert_lstt_block(sd, out, i: int):
    t = f"LSTT.layers.{i}"
    f = ("lstt", f"block{i}")
    _put_norm(sd, out, f"{t}.norm1", f + ("norm1",))
    for q in ("linear_Q", "linear_K", "linear_V"):
        _put_dense(sd, out, f"{t}.self_attn.{q}", f + ("self_attn", q))
    _put_dense(sd, out, f"{t}.self_attn.projection",
               f + ("self_attn", "projection"))
    _put_norm(sd, out, f"{t}.norm2", f + ("norm2",))
    for q in ("linear_Q", "linear_V", "linear_QMem", "linear_VMem"):
        _put_dense(sd, out, f"{t}.{q}", f + (q,))
    if f"{t}.norm4.weight" in sd:
        _put_norm(sd, out, f"{t}.norm4", f + ("norm4",))
    _put_dense(sd, out, f"{t}.long_term_attn.projection", f + ("long_proj",))
    _put_dense(sd, out, f"{t}.short_term_attn.projection",
               f + ("short_proj",))
    _put_norm(sd, out, f"{t}.norm3", f + ("norm3",))
    _put_dense(sd, out, f"{t}.linear1", f + ("linear1",))
    _put_dense(sd, out, f"{t}.linear2", f + ("linear2",))
    _put_norm(sd, out, f"{t}.activation.gn", f + ("activation", "gn"))
    out[f + ("activation", "conv", "kernel")] = _conv(
        sd[f"{t}.activation.conv.weight"])
    # GRU_MEMORY compressed-eviction cells: memory_grus[0] compresses the K
    # plane (kernel 2x2), memory_grus[1] the V plane (kernel 1x1)
    # (transformer.py:529-545,420-430)
    for gi, gname in ((0, "memory_gru_k"), (1, "memory_gru_v")):
        tg = f"{t}.memory_grus.{gi}"
        if f"{tg}.conv_gru_cell.conv_gates.weight" not in sd:
            continue
        fg = f + (gname,)
        for c in ("conv_gates", "conv_can"):
            out[fg + ("cell", c, "kernel")] = _conv(
                sd[f"{tg}.conv_gru_cell.{c}.weight"])
            out[fg + ("cell", c, "bias")] = sd[f"{tg}.conv_gru_cell.{c}.bias"]
        out[fg + ("output_conv", "kernel")] = _conv(
            sd[f"{tg}.output_conv.weight"])
        out[fg + ("output_conv", "bias")] = sd[f"{tg}.output_conv.bias"]


def _convert_gpm_block(sd, out, i: int):
    t = f"LSTT.layers.{i}"
    f = ("lstt", f"block{i}")
    _put_norm(sd, out, f"{t}.norm1", f + ("norm1",))
    _put_dense(sd, out, f"{t}.linear_QV", f + ("linear_QV",))
    _put_dense(sd, out, f"{t}.linear_U", f + ("linear_U",))
    _put_dense(sd, out, f"{t}.linear_ID_V", f + ("linear_ID_V",))
    if f"{t}.linear_ID_U.weight" in sd:
        _put_dense(sd, out, f"{t}.linear_ID_U", f + ("linear_ID_U",))
        _put_norm(sd, out, f"{t}.id_norm1", f + ("id_norm1",))
    # long/short gated tails
    out[f + ("long_tail", "dw_conv", "conv", "kernel")] = _conv(
        sd[f"{t}.long_term_attn.dw_conv.conv.weight"])
    _put_dense(sd, out, f"{t}.long_term_attn.projection",
               f + ("long_tail", "projection"))
    _put_dense(sd, out, f"{t}.short_term_attn.relative_emb_k",
               f + ("relative_emb_k",))
    out[f + ("short_tail", "dw_conv", "conv", "kernel")] = _conv(
        sd[f"{t}.short_term_attn.dw_conv.conv.weight"])
    _put_dense(sd, out, f"{t}.short_term_attn.projection",
               f + ("short_tail", "projection"))
    _put_norm(sd, out, f"{t}.norm2", f + ("norm2",))
    _put_norm(sd, out, f"{t}.id_norm2", f + ("id_norm2",))
    sa = f + ("self_attn",)
    for q in ("linear_QK", "linear_V1", "linear_V2", "linear_U1",
              "linear_U2"):
        _put_dense(sd, out, f"{t}.self_attn.{q}", sa + (q,))
    out[sa + ("tail", "dw_conv", "conv", "kernel")] = _conv(
        sd[f"{t}.self_attn.dw_conv.conv.weight"])
    _put_dense(sd, out, f"{t}.self_attn.projection",
               sa + ("tail", "projection"))


def _convert_fpn(sd, out):
    f = ("decoder",)
    for name in ("conv_in", "conv_16x", "conv_8x", "conv_4x"):
        out[f + (name, "conv", "kernel")] = _conv(
            sd[f"decoder.{name}.conv.weight"])
        out[f + (name, "conv", "bias")] = sd[f"decoder.{name}.conv.bias"]
        _put_norm(sd, out, f"decoder.{name}.gn", f + (name, "gn"))
    for name in ("adapter_16x", "adapter_8x", "adapter_4x", "conv_out"):
        out[f + (name, "kernel")] = _conv(sd[f"decoder.{name}.weight"])
        out[f + (name, "bias")] = sd[f"decoder.{name}.bias"]


def convert_torch_checkpoint(sd: Dict[str, np.ndarray], model_vos: str,
                             num_layers: int = 3,
                             id_channels: int = 12,
                             report: Optional[dict] = None
                             ) -> Dict[str, Any]:
    """Torch state_dict -> nested flax param dict for AOT/DeAOT (r50).

    If `report` is a dict, it is filled with `dead_keys` (source keys that
    are dead in the reference itself, e.g. TIME_ENCODE MLPs — see
    _KNOWN_DEAD_PATTERNS) and `unexpected_keys` (source content the
    converter does not understand; should be empty for reference models)."""
    sd = _RecordingDict(sd)
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    if "encoder.patch_embed.proj.weight" in sd:
        _convert_swin(sd, out)
    elif "encoder.conv.0.weight" in sd:  # MNv3's final 1x1 expansion
        _convert_mobilenetv3(sd, out)
    elif "encoder.features.0.0.weight" in sd:
        _convert_mobilenetv2(sd, out)
    elif "encoder.conv1.0.weight" in sd:  # ResNeSt deep stem
        _convert_resnest(sd, out)
    elif "encoder.prompt" in sd:
        _convert_topdown(sd, out)
    else:
        _convert_resnet(sd, out)
    out[("encoder_projector", "kernel")] = _conv(
        sd["encoder_projector.weight"])
    out[("encoder_projector", "bias")] = sd["encoder_projector.bias"]

    # id bank; pad 11 -> 12 input channels for the ignore token
    # (utils/checkpoint.py:86-97)
    w = _conv(sd["patch_wise_id_bank.weight"])  # [k,k,in,out]
    if w.shape[2] < id_channels:
        pad = np.zeros(w.shape[:2] + (id_channels - w.shape[2], w.shape[3]),
                       w.dtype)
        w = np.concatenate([w, pad], axis=2)
    out[("patch_wise_id_bank", "kernel")] = w
    out[("patch_wise_id_bank", "bias")] = sd["patch_wise_id_bank.bias"]

    if "cur_pos_emb" in sd:
        out[("cur_pos_emb",)] = sd["cur_pos_emb"]
        out[("mem_pos_emb",)] = sd["mem_pos_emb"]

    for i in range(num_layers):
        if model_vos == "aot":
            _convert_lstt_block(sd, out, i)
        else:
            _convert_gpm_block(sd, out, i)
    n_norms = len([k for k in sd if k.startswith("LSTT.decoder_norms.")
                   and k.endswith(".weight")])
    for i in range(n_norms):
        t = f"LSTT.decoder_norms.{i}"
        if f"{t}.gn.weight" in sd:
            # DeAOT: GroupNorm1D wraps an nn.GroupNorm under `.gn`
            # (basic.py:6-12; transformer.py:755-758)
            _put_norm(sd, out, f"{t}.gn", ("lstt", f"decoder_norm{i}"))
        else:
            _put_norm(sd, out, t, ("lstt", f"decoder_norm{i}"))
    _convert_fpn(sd, out)
    if model_vos == "deaot":
        _put_norm(sd, out, "id_norm", ("id_norm",))
    if report is not None:
        dead, unexpected = classify_unconsumed(sd)
        report["dead_keys"] = dead
        report["unexpected_keys"] = unexpected
    return trav.unflatten_dict(out)


def load_pretrained(params, pth_path: str, model_vos: str,
                    id_channels: int = 12, strict: bool = False):
    """Shape-tolerant merge of a torch checkpoint into an init param tree
    (utils/checkpoint.py:75-102)."""
    sd = load_torch_state_dict(pth_path)
    num_layers = len({k.split(".")[2] for k in sd
                      if k.startswith("LSTT.layers.")})
    report: dict = {}
    conv = convert_torch_checkpoint(sd, model_vos, num_layers, id_channels,
                                    report=report)
    if report.get("dead_keys"):
        print(f"converter: dropped {len(report['dead_keys'])} "
              "reference-dead params (TIME_ENCODE MLPs / BN counters)")
    if report.get("unexpected_keys"):
        print("converter: UNCONSUMED source keys "
              f"{report['unexpected_keys'][:10]}"
              f"{' ...' if len(report['unexpected_keys']) > 10 else ''}")
    flat_new = trav.flatten_dict(conv)
    flat_old = trav.flatten_dict(params)
    merged, skipped = {}, []
    for k, v in flat_old.items():
        if k in flat_new and flat_new[k].shape == v.shape:
            merged[k] = jnp.asarray(flat_new[k], v.dtype)
        else:
            if k in flat_new:
                skipped.append(("shape", k, flat_new[k].shape, v.shape))
            else:
                skipped.append(("missing", k))
            merged[k] = v
    if strict and skipped:
        raise ValueError(f"unmerged params: {skipped}")
    extra = [k for k in flat_new if k not in flat_old]
    return trav.unflatten_dict(merged), skipped, extra
