"""Config composition: every reference stage x model preset name resolves
(aot_plus/configs/pre*.py, configs/models/*.py)."""

import itertools

import pytest

from rmem_tpu.config import Config, get_config

# every stage the reference ships (aot_plus/configs/): pre, pre_ytb, pre_dav,
# pre_ytb_dav, ytb, pre_vost, pre_vost_2, pre_vost_25q
REF_STAGES = ["pre", "pre_ytb", "pre_dav", "pre_ytb_dav", "ytb",
              "pre_vost", "pre_vost_2", "pre_vost_25q"]
# every model preset the reference ships (aot_plus/configs/models/)
REF_MODELS = ["aott", "aots", "aotb", "aotl", "r50_aotl", "r50_deaotl",
              "r101_aotl", "rs101_aotl", "swinb_aotl", "r50_topdown_aotl",
              "deaott"]


@pytest.mark.parametrize("stage,model",
                         list(itertools.product(REF_STAGES, REF_MODELS)))
def test_reference_stage_model_grid(stage, model):
    cfg = get_config(stage, model=model)
    assert isinstance(cfg, Config)
    assert cfg.stage_name == stage


def test_pre_ytb_stage_fields():
    # pre_ytb.py:14-17
    cfg = get_config("pre_ytb", model="r50_aotl")
    assert cfg.data_seq_len == 10
    assert cfg.train_long_term_mem_gap == 4
    assert cfg.train_total_steps == 80_000
    assert cfg.model_linear_q is True
    assert cfg.pretrain_full is True


def test_pre_dav_stage_fields():
    # pre_dav.py:12-14
    cfg = get_config("pre_dav", model="r50_aotl")
    assert cfg.datasets == ("davis2017",)
    assert cfg.train_total_steps == 50_000


def test_pre_vost_25q_stage_fields():
    # pre_vost_25q.py:12-16
    cfg = get_config("pre_vost_25q", model="r50_deaotl")
    assert cfg.datasets == ("vost",)
    assert cfg.data_seq_len == 25
    assert cfg.train_long_term_mem_gap == 4
    assert cfg.model_linear_q is False
    assert cfg.model_ignore_token is True
    assert cfg.train_auto_resume is False


def test_r101_and_rs101_presets():
    # r101_aotl.py / rs101_aotl.py — both carry MODEL_NAME 'R101_AOTL'
    # (the reference's rs101_aotl.py:7 keeps the R101 name; mirrored here)
    c1 = get_config("pre_vost", model="r101_aotl")
    c2 = get_config("pre_vost", model="rs101_aotl")
    assert c1.model_encoder == "resnet101"
    assert c2.model_encoder == "resnest101"
    assert c1.model_name == "R101_AOTL"
    assert c2.model_name == "R101_AOTL"
    assert c1.model_encoder_dim == (256, 512, 1024, 1024)
    # both build real encoders
    from rmem_tpu.models.encoders import build_encoder
    assert build_encoder("resnet101") is not None
    assert build_encoder("resnest101") is not None


def test_no_memory_gap_adjustments():
    cfg = get_config("pre_vost", model="r50_deaotl", no_memory_gap=True)
    assert cfg.model_att_heads == 2
    assert cfg.train_long_term_mem_gap == 1
    assert cfg.reverse_loss == pytest.approx(0.1)
