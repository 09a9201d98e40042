"""Config system: model x stage x CLI composition, as frozen-ish dataclasses.

Mirrors the reference's three-axis config composition (aot_plus/configs/
default.py:5-119, configs/models/*.py, tools/get_config.py:4-6) but with
snake_case dataclasses instead of ad-hoc class-dict merging. `save/load`
preserve the reference's "result dir is self-describing" contract
(aot_plus/configs/default.py:154-164).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class Config:
    """Merged model+stage config.

    Field groups follow the reference: model architecture
    (aot_plus/configs/models/default.py:1-26, r50_aotl.py:7-45), RMem knobs
    (r50_aotl.py:7-32), data (configs/default.py:15-40), train
    (configs/default.py:42-100), test (configs/default.py:102-114).
    """

    # ---- identity ----
    exp_name: str = "default"
    stage_name: str = "default"
    model_name: str = "AOTDefault"

    # ---- model architecture ----
    model_vos: str = "aot"                    # 'aot' | 'deaot'
    model_engine: str = "aotengine"           # 'aotengine' | 'deaotengine'
    model_align_corners: bool = True
    model_encoder: str = "mobilenetv2"
    model_encoder_pretrain: str = ""
    model_encoder_dim: Tuple[int, ...] = (24, 32, 96, 1280)  # 4x, 8x, 16x, 16x
    model_encoder_embedding_dim: int = 256
    model_decoder_intermediate_lstt: bool = True
    model_linear_q: bool = False              # pre_vost sets False (pre_vost.py:19)
    model_norm_inp: bool = True
    model_freeze_bn: bool = True
    model_freeze_backbone: bool = False
    # top-down encoder reconstruction regularizer
    # (configs/models/r50_topdown_aotl.py:9 VAR_LOSS_WEIGHT)
    var_loss_weight: float = 0.0
    model_max_obj_num: int = 10
    model_ignore_token: bool = True
    model_self_heads: int = 8
    model_att_heads: int = 8
    model_lstt_num: int = 3
    model_epsilon: float = 1e-5

    # ---- RMem knobs (configs/models/r50_aotl.py:7-32) ----
    former_mem_len: int = 1
    latter_mem_len: int = 8
    use_temporal_positional_embedding: bool = True
    temporal_positional_embedding_slot_4: bool = True
    gru_memory: bool = False
    time_encode: bool = False
    time_encode_norm: bool = False
    no_long_memory: bool = False
    no_memory_gap: bool = False
    reverse_infer: bool = False
    reverse_loss: float = 0.4
    use_mask: bool = False

    # ---- memory cadence ----
    train_long_term_mem_gap: int = 9999
    test_long_term_mem_gap: int = 9999
    short_term_mem_skip: int = 1

    # ---- data ----
    datasets: Tuple[str, ...] = ("youtubevos",)
    data_workers: int = 8
    # decode/augment in spawned subprocesses instead of GIL-bound threads
    data_loader_processes: bool = True
    data_randomcrop: Tuple[int, int] = (465, 465)
    data_randomflip: float = 0.5
    data_max_crop_steps: int = 10
    data_short_edge_len: int = 480
    data_min_scale_factor: float = 0.7
    data_max_scale_factor: float = 1.3
    data_random_reverse_seq: bool = True
    data_seq_len: int = 5
    data_davis_repeat: int = 5
    data_vost_repeat: int = 1
    data_vost_ignore_thresh: float = 0.2
    data_random_gap_davis: int = 12
    data_random_gap_ytb: int = 3
    data_random_gap_vost: int = 3
    data_random_gap_visor: int = 1
    data_visor_repeat: int = 1
    data_visor_ignore_thresh: float = 0.2
    data_dynamic_merge_prob: float = 0.2
    ignore_in_merge: bool = True

    # ---- pretrain / resume ----
    pretrain: bool = True
    pretrain_full: bool = False
    pretrain_model: str = ""

    # ---- train ----
    train_total_steps: int = 100_000
    train_start_step: int = 0
    train_weight_decay: float = 0.07
    train_weight_decay_exemption: Tuple[str, ...] = (
        "absolute_pos_embed", "relative_position_bias_table",
        "relative_emb_v", "conv_out",
    )
    train_lr: float = 2e-4
    train_lr_min: float = 1e-5
    train_lr_power: float = 0.9
    train_lr_encoder_ratio: float = 0.1
    train_lr_warm_up_ratio: float = 0.05
    train_lr_cosine_decay: bool = False
    train_lr_restart: int = 1
    train_aux_loss_weight: float = 1.0
    train_aux_loss_ratio: float = 1.0
    train_opt: str = "adamw"
    train_sgd_momentum: float = 0.9
    train_batch_size: int = 16
    train_log_step: int = 20
    # overlay-image dumps every N steps, 0 = off (the reference's
    # TRAIN_TBLOG/TRAIN_TBLOG_STEP, configs/default.py + trainer.py:745-862;
    # off by default there too)
    train_tblog_step: int = 0
    train_top_k_percent_pixels: float = 0.15
    train_seq_training_freeze_params: Tuple[str, ...] = ("patch_wise_id_bank",)
    train_seq_training_start_ratio: float = 0.5
    train_hard_mining_ratio: float = 0.5
    train_ema_ratio: float = 0.1
    train_clip_grad_norm: float = 5.0
    train_save_step: int = 500
    train_max_keep_ckpt: int = 8
    train_auto_resume: bool = True
    train_encoder_freeze_at: int = 2
    train_lstt_emb_dropout: float = 0.0
    train_lstt_id_dropout: float = 0.0
    train_lstt_droppath: float = 0.1
    train_lstt_droppath_scaling: bool = False
    train_lstt_droppath_lst: bool = False
    train_lstt_lt_dropout: float = 0.0
    train_lstt_st_dropout: float = 0.0

    # ---- test ----
    test_dataset: str = "youtubevos"
    test_dataset_split: str = "val"
    test_ckpt_path: Optional[str] = None
    test_ckpt_step: Optional[int] = None
    test_ema: bool = True
    test_flip: bool = False
    test_multiscale: Tuple[float, ...] = (1.0,)
    test_min_size: Optional[int] = None
    test_max_size: float = 800 * 1.3
    test_workers: int = 4

    # ---- TPU-specific (new; no reference equivalent) ----
    compute_dtype: str = "bfloat16"      # activations dtype under jit
    param_dtype: str = "float32"
    use_pallas_bank_attention: bool = True
    # fused VMEM-resident tile-halo local attention (DeAOT short-term path,
    # kernels/local_attention.py); inference-only — the XLA tile-halo form
    # spends ~1 ms/frame on halo-patch materialization (ROUND_NOTES r3
    # ablation budget)
    use_pallas_local_attention: bool = True
    # fused conv7x7s2+BN+relu+maxpool stem kernel (kernels/stem.py) for the
    # ResNet encoders: the plain XLA conv runs the Cin=3 contraction at ~3%
    # effective MXU and costs 0.36 ms/frame at 481x849 (r4 ablation);
    # measured 204.7 -> 241.3 FPS on the 480p bench (r5). None = AUTO:
    # enabled on TPU backends for the bf16 path. Inference-only (no VJP):
    # the ResNet module falls back to the plain stem for batch>1 — which
    # covers every training call (B*T frames at once) — and for f32, so
    # the parity path is untouched.
    use_pallas_stem: Optional[bool] = None
    # also route the TRAINING batches (B*T frames) through the fused stem,
    # with gradients from the XLA-transposed VJP
    # (kernels/stem.pallas_stem_trainable). Default OFF pending the train
    # A/B; requires use_pallas_stem resolved on.
    use_pallas_stem_train: bool = False
    # fused gate-multiply + depthwise-5x5 kernel (kernels/dwconv.py).
    # Default OFF: measured 139.0 vs 149.4 FPS on the 480p bench — the
    # in-kernel unaligned sublane shifts and per-band DMA waits cost more
    # than the XLA form's HBM re-reads. Kept for future tuning. Only takes
    # effect together with use_pallas_local_attention=True (it rides the
    # same "all+dw" dispatch mode).
    use_pallas_dwconv: bool = False
    # merge sibling GPM projections that read the same activation into one
    # MXU dot with a trace-time kernel concat (linear_QV+linear_U per block;
    # V1+U1 / V2+U2 in the gated self-attention): per-column matmul results
    # are unchanged (exact-equality tested) and the param tree is identical
    # (DenseParams declares the same paths/shapes), so checkpoints and the
    # converter are untouched (VERDICT r3 Next #3 "merge adjacent
    # projections"). Default OFF: measured SLOWER on the 480p bench —
    # 175.4/176.0 FPS merged vs 181.4/183.1 separate (two A/B pairs,
    # back-to-back) — XLA's per-dot fusion beats the halved activation
    # reads at these shapes. Kept for wider-model configs where the
    # arithmetic-intensity argument may win.
    merged_projections: bool = False
    # frames per eval dispatch on unlabeled stretches: one lax.scan chunk
    # amortizes the per-dispatch host/tunnel latency across K frames
    # (ROUND_NOTES: ~120 ms RTT on the tunneled backend). The last partial
    # chunk is padded with repeats of the final frame (state is per-sequence
    # so the extra updates are discarded with it).
    eval_scan_chunk: int = 16
    # >0: record per-window FPS every N frames inside each sequence (one
    # cheap state-scalar sync per window) — the long-video flatness
    # diagnostic (RMem Table 2 scenario). 0 = off (no extra syncs).
    eval_fps_window: int = 0
    # upload raw uint8 frames and run cubic resize + ImageNet normalization
    # on device (ops/resize.py:resize_cubic matches cv2 INTER_CUBIC to fp32
    # noise): 4x less H2D traffic and no per-frame host resize. Float-frame
    # synthetic datasets (determinism probes) auto-fall-back to host prep.
    eval_device_prep: bool = True
    # LOSSY reduced-bytes upload: pack frames as planar YUV 4:2:0 on the
    # host (cv2) and reconstruct on device (ops/color.py) — halves H2D
    # bytes/frame (1.5 vs 3 B/px), which is the binding resource on the
    # tunneled rig (VERDICT r3 Weak #1). Chroma is 2x2-subsampled: masks
    # may differ by isolated argmax-tie pixels, so keep OFF for parity
    # runs. Requires eval_device_prep and even frame dims (auto-falls-back
    # to RGB otherwise).
    eval_yuv420_upload: bool = False
    # training fwd+bwd through the fused kernel (flash-style custom VJP,
    # kernels/bank_attention.py): 1.9x faster batch-4 train step on chip
    # (benchmarks/train_bench.py). Auto-falls-back to the XLA path on the
    # CPU backend (interpret mode would be needed there).
    use_pallas_bank_attention_train: bool = True
    # training local attention through the Pallas kernel forward with an
    # XLA-VJP backward (kernels/local_attention.py:
    # pallas_local_attention_trainable). Default OFF: measured 0.294 vs
    # 0.286 s/it (batch-1 465x465 seq-17, dots remat) — at the train grid
    # (59x59) the kernel's fwd win does not cover the bwd's extra XLA
    # forward recompute, unlike eval (61x107) where the kernel is +8 FPS.
    # DeAOT only (AOT's short-term attention is global); same backend gate
    # as the bank-attention train kernel.
    use_pallas_local_attention_train: bool = False
    # depthwise-conv formulation: unrolled 25 shift-adds (fast inference)
    # vs grouped conv (smaller training graph). The trainer overrides this
    # to False when building its model; params are interchangeable.
    dwconv_unrolled: bool = True
    # frame-scan remat policy: "full" | "dots" (save matmul outputs) |
    # "none". dots is fastest wherever it fits in HBM (1.52 vs 1.94 s/it at
    # batch 1, 5.58 vs 6.00 at batch 4, benchmarks/train_bench.py); drop to
    # "full" for memory-limited configs.
    train_remat: str = "dots"
    # frame-scan unroll factor: >1 duplicates the (rematted) body so XLA can
    # overlap adjacent frames' independent work and halve loop overhead.
    # Semantics-free (lax.scan unroll). Measured A/B in train_bench.
    train_scan_unroll: int = 1
    mesh_shape: Tuple[int, ...] = (1,)   # data-parallel axis sizes
    mesh_axes: Tuple[str, ...] = ("data",)

    # ---- dirs ----
    dir_root: str = "./results"
    dir_data: str = "./datasets"

    # ------------------------------------------------------------------
    @property
    def max_mem_slots(self) -> int:
        """Static bank capacity: steady state former+latter, +1 transient slot
        for append-then-evict (aot_plus/networks/layers/transformer.py:319,
        332-334)."""
        return self.former_mem_len + self.latter_mem_len + 1

    @property
    def id_channels(self) -> int:
        return self.model_max_obj_num + (2 if self.model_ignore_token else 1)

    @property
    def gru_memory_active(self) -> bool:
        """GRU-compressed memory only exists on the AOT/LSTT path: the
        reference's DualBranchGPM hard-codes gru_memory=False
        (transformer.py:728), so DeAOT silently ignores the flag."""
        return self.gru_memory and self.model_vos == "aot"

    @property
    def dir_result(self) -> str:
        return os.path.join(self.dir_root, f"{self.exp_name}_{self.model_name}",
                            self.stage_name)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    # -- persistence (reference save_self contract, default.py:154-164) --
    def save(self, path: Optional[str] = None) -> str:
        path = path or os.path.join(self.dir_result, "config.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        d = dataclasses.asdict(self)
        with open(path, "w") as f:
            json.dump(d, f, indent=2, default=str)
        return path

    @staticmethod
    def load(path: str) -> "Config":
        with open(path) as f:
            d = json.load(f)
        fields = {f.name for f in dataclasses.fields(Config)}
        clean: Dict[str, Any] = {}
        for k, v in d.items():
            if k in fields:
                if isinstance(v, list):
                    v = tuple(v)
                clean[k] = v
        return Config(**clean)


# ---------------------------------------------------------------------------
# Model presets (aot_plus/configs/models/*.py)
# ---------------------------------------------------------------------------

def _rmem_name(base: str, cfg_kw: Dict[str, Any]) -> str:
    """Assemble MODEL_NAME from feature flags (r50_aotl.py:30-32)."""
    name = base
    if cfg_kw.get("time_encode"):
        name += "_Time_encode"
    if cfg_kw.get("no_long_memory"):
        name += "_No_long_mem"
    if cfg_kw.get("no_memory_gap"):
        name += "_No_mem_gap"
    if cfg_kw.get("use_temporal_positional_embedding", True):
        name += "_Temp_pe"
        if cfg_kw.get("temporal_positional_embedding_slot_4", True):
            name += "_Slot_4"
    return name


def _r50_common(**kw) -> Dict[str, Any]:
    d = dict(
        model_encoder="resnet50",
        model_encoder_dim=(256, 512, 1024, 1024),
        model_lstt_num=3,
        train_long_term_mem_gap=2,
        test_long_term_mem_gap=5,
    )
    d.update(kw)
    return d


MODEL_PRESETS: Dict[str, Dict[str, Any]] = {
    # AOT family
    "aott": dict(model_vos="aot", model_engine="aotengine", model_lstt_num=1),
    "aots": dict(model_vos="aot", model_engine="aotengine", model_lstt_num=2),
    "aotb": dict(model_vos="aot", model_engine="aotengine", model_lstt_num=3),
    "aotl": dict(model_vos="aot", model_engine="aotengine", model_lstt_num=3,
                 train_long_term_mem_gap=2, test_long_term_mem_gap=5),
    "r50_aotl": _r50_common(model_vos="aot", model_engine="aotengine"),
    # configs/models/r50_topdown_aotl.py: feedback encoder + var loss 0.01
    "r50_topdown_aotl": _r50_common(
        model_vos="aot", model_engine="aotengine",
        model_encoder="resnet50_topdown",
        model_encoder_dim=(256, 512, 1024, 1024), var_loss_weight=0.01),
    "aotl_v3": dict(model_vos="aot", model_engine="aotengine",
                    model_encoder="mobilenetv3",
                    model_encoder_dim=(24, 40, 112, 960), model_lstt_num=3,
                    train_long_term_mem_gap=2, test_long_term_mem_gap=5),
    "swinb_aotl": _r50_common(
        model_vos="aot", model_engine="aotengine", model_encoder="swin_base",
        model_encoder_dim=(128, 256, 512, 512)),
    # DeAOT family (configs/models/default_deaot.py: 1 head, no intermediate)
    "deaott": dict(model_vos="deaot", model_engine="deaotengine",
                   model_lstt_num=1, model_self_heads=1, model_att_heads=1,
                   model_decoder_intermediate_lstt=False),
    # CI-only tiny variants (no reference equivalent): full graph structure,
    # toy encoder + narrow embedding
    "tiny_aotl": dict(model_vos="aot", model_engine="aotengine",
                      model_encoder="tiny", model_encoder_dim=(32, 48, 64, 64),
                      model_encoder_embedding_dim=64, model_lstt_num=2,
                      train_long_term_mem_gap=2, test_long_term_mem_gap=2),
    "tiny_deaotl": dict(model_vos="deaot", model_engine="deaotengine",
                        model_encoder="tiny",
                        model_encoder_dim=(32, 48, 64, 64),
                        model_encoder_embedding_dim=64,
                        model_self_heads=1, model_att_heads=1,
                        model_decoder_intermediate_lstt=False,
                        model_lstt_num=2, train_long_term_mem_gap=2,
                        test_long_term_mem_gap=2),
    "r50_deaotl": _r50_common(
        model_vos="deaot", model_engine="deaotengine",
        model_self_heads=1, model_att_heads=1,
        model_decoder_intermediate_lstt=False),
    # configs/models/r101_aotl.py (fixed MODEL_NAME, no RMem-flag suffixes)
    "r101_aotl": _r50_common(model_vos="aot", model_engine="aotengine",
                             model_encoder="resnet101",
                             model_name="R101_AOTL"),
    # configs/models/rs101_aotl.py (ResNeSt-101; the reference keeps
    # MODEL_NAME = 'R101_AOTL' for it too, rs101_aotl.py:7 — mirrored)
    "rs101_aotl": _r50_common(model_vos="aot", model_engine="aotengine",
                              model_encoder="resnest101",
                              model_name="R101_AOTL"),
}


# ---------------------------------------------------------------------------
# Stage presets (aot_plus/configs/pre_vost.py etc.)
# ---------------------------------------------------------------------------

STAGE_PRESETS: Dict[str, Dict[str, Any]] = {
    "default": {},
    "pre": dict(datasets=("static",), data_seq_len=5,
                train_total_steps=100_000),
    "pre_ytb_dav": dict(datasets=("youtubevos", "davis2017"), data_seq_len=5,
                        pretrain_full=True),
    "ytb": dict(datasets=("youtubevos",), data_seq_len=5, pretrain_full=True),
    # pre_ytb.py:8-22: YTB fine-tune from the static-image PRE stage
    "pre_ytb": dict(datasets=("youtubevos",), data_seq_len=10,
                    train_long_term_mem_gap=4, train_total_steps=80_000,
                    model_linear_q=True, pretrain_full=True),
    # pre_dav.py:8-22: DAVIS fine-tune from the static-image PRE stage
    "pre_dav": dict(datasets=("davis2017",), train_total_steps=50_000,
                    pretrain_full=True),
    # pre_vost.py:8-26
    "pre_vost": dict(datasets=("vost",), train_total_steps=20_000,
                     data_seq_len=15, train_long_term_mem_gap=4,
                     model_linear_q=False, model_ignore_token=True,
                     train_auto_resume=False, pretrain_full=True),
    # pre_vost_2.py:14
    "pre_vost_2": dict(datasets=("vost",), train_total_steps=20_000,
                       data_seq_len=17, train_long_term_mem_gap=4,
                       model_linear_q=False, model_ignore_token=True,
                       train_auto_resume=False, pretrain_full=True),
    # pre_vost_25q.py:13-16: seq_len 25 variant
    "pre_vost_25q": dict(datasets=("vost",), train_total_steps=20_000,
                         data_seq_len=25, train_long_term_mem_gap=4,
                         model_linear_q=False, model_ignore_token=True,
                         train_auto_resume=False, pretrain_full=True),
    # synthetic smoke stage (reference TEST dataset path,
    # dataloaders/train_datasets.py:821-854); small crops for fast compiles
    "test": dict(datasets=("test",), train_total_steps=100, data_seq_len=3,
                 train_batch_size=2, pretrain=False, train_auto_resume=False,
                 data_randomcrop=(129, 129)),
}


def get_config(stage: str = "default", exp_name: str = "default",
               model: str = "r50_deaotl", **overrides) -> Config:
    """Compose model preset + stage preset + explicit overrides.

    Mirrors aot_plus/tools/get_config.py:4-6.
    """
    if model not in MODEL_PRESETS:
        raise ValueError(f"unknown model {model!r}; have {list(MODEL_PRESETS)}")
    if stage not in STAGE_PRESETS:
        raise ValueError(f"unknown stage {stage!r}; have {list(STAGE_PRESETS)}")
    kw: Dict[str, Any] = {}
    kw.update(MODEL_PRESETS[model])
    kw.update(STAGE_PRESETS[stage])
    kw.update(overrides)
    base = {"aot": "AOTL", "deaot": "DeAOTL"}[kw.get("model_vos", "aot")]
    if kw.get("model_encoder", "mobilenetv2") == "resnet50":
        base = "R50_" + base
    kw.setdefault("model_name", _rmem_name(base, kw))
    kw.setdefault("exp_name", exp_name)
    kw.setdefault("stage_name", stage)
    if kw.get("no_memory_gap"):
        kw["model_att_heads"] = 2
        kw["train_long_term_mem_gap"] = 1
        # REVERSE_LOSS = REVERSE_LOSS / 4 under NO_MEMORY_GAP
        # (r50_aotl.py:26-27, r50_deaotl.py:26-27)
        kw["reverse_loss"] = kw.get("reverse_loss", 0.4) / 4
    return Config(**kw)
