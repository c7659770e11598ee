"""Field-by-field preset verification against the reference's shipped
configs + run scripts (VERDICT.md weak-7).

Effective reference config = JSON (configs/cityscapes/H_48_D_4[_MEM].json)
with the run-script CLI overrides applied
(scripts/cityscapes/hrnet/run_h_48_d_4_contrast[_mem].sh: BATCH_SIZE=8,
MAX_ITERS=40000, BASE_LR=0.01, model/backbone/loss_type vars).
"""

import json
import re

import pytest

from contrastiveseg_tpu.presets import get_preset

REF = "/root/reference"


def _script_vars(path):
    txt = open(path).read()
    out = {}
    for key in ("MAX_ITERS", "BATCH_SIZE", "BASE_LR", "MODEL_NAME",
                "LOSS_TYPE", "BACKBONE", "CONFIGS"):
        m = re.search(rf'^{key}=["\']?([^"\'\n]+)', txt, re.M)
        if m:
            out[key] = m.group(1)
    return out


def _ref_json(name):
    with open(f"{REF}/configs/cityscapes/{name}") as f:
        return json.load(f)


CASES = [
    ("cityscapes_hrnet_w48_contrast",
     f"{REF}/scripts/cityscapes/hrnet/run_h_48_d_4_contrast.sh"),
    ("cityscapes_hrnet_w48_mem",
     f"{REF}/scripts/cityscapes/hrnet/run_h_48_d_4_contrast_mem.sh"),
]


@pytest.mark.parametrize("preset_name,script", CASES)
def test_preset_matches_reference_run(preset_name, script):
    sv = _script_vars(script)
    ref = _ref_json(sv["CONFIGS"].split("/")[-1])
    cfg = get_preset(preset_name)

    # Script CLI overrides.
    assert cfg.get("solver.max_iters") == int(sv["MAX_ITERS"])
    assert cfg.get("train.batch_size") == int(sv["BATCH_SIZE"])
    assert cfg.get("lr.base_lr") == float(sv["BASE_LR"])
    assert cfg.get("network.model_name") == sv["MODEL_NAME"]
    assert cfg.get("network.backbone") == sv["BACKBONE"]
    assert cfg.get("loss.loss_type") == sv["LOSS_TYPE"]

    # JSON hyperparameters.
    for key in ("proj_dim", "temperature", "base_temperature",
                "max_samples", "max_views", "warmup_iters", "loss_weight"):
        assert cfg.get(f"contrast.{key}") == ref["contrast"][key], key
    if ref["contrast"].get("with_memory"):
        assert cfg.get("contrast.with_memory") is True
        assert cfg.get("contrast.memory_size") == ref["contrast"]["memory_size"]
        assert (cfg.get("contrast.pixel_update_freq")
                == ref["contrast"]["pixel_update_freq"])
    # Documented divergence: the reference enqueues with
    # labels[::network.stride] where network.stride stays 8 from the JSON
    # even though HRNet embeddings are stride 4
    # (trainer_contrastive.py:83,108 + H_48_D_4_MEM.json network block) —
    # a silent misalignment.  We align labels to the embedding stride.
    assert cfg.get("contrast.stride") == cfg.get("network.stride") == 4

    assert cfg.get("lr.lr_policy") == ref["lr"]["lr_policy"]
    assert cfg.get("optim.optim_method") == ref["optim"]["optim_method"]
    for k, v in ref["optim"]["sgd"].items():
        assert cfg.get(f"optim.sgd.{k}") == v, k
    assert cfg.get("solver.display_iter") == ref["solver"]["display_iter"]
    assert cfg.get("solver.test_interval") == ref["solver"]["test_interval"]

    assert cfg.get("loss.params.ce_weight") == ref["loss"]["params"]["ce_weight"]
    assert cfg.get("loss.params.ce_ignore_index") == -1

    td = ref["train"]["data_transformer"]
    assert cfg.get("train.data_transformer.input_size") == td["input_size"]
    assert cfg.get("train.data_transformer.size_mode") == td["size_mode"]
    assert cfg.get("train.data_transformer.align_method") == td["align_method"]
    assert cfg.get("train.data_transformer.pad_mode") == td["pad_mode"]
    assert cfg.get("data.num_classes") == ref["data"]["num_classes"]
    assert cfg.get("data.label_list") == ref["data"]["label_list"]
    vd = ref["val"]["data_transformer"]
    assert cfg.get("val.data_transformer.input_size") == vd["input_size"]
