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


# ---------------------------------------------------------------------------
# VERDICT r2 weak #3: every preset with a reference counterpart verified
# field-by-field.  Effective reference config = dataset JSON + run-script
# CLI overrides where a script exists (scripts override model/loss/iters/
# bs/lr; JSONs own transforms/contrast blocks).

JSON_CASES = [
    # (preset, json path, script path or None, documented divergences)
    ("cityscapes_hrnet_w48", "cityscapes/H_48_D_4.json",
     f"{REF}/scripts/cityscapes/hrnet/run_h_48_d_4.sh", {}),
    ("cityscapes_deeplab_v3", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/deeplab/run_r_101_d_8_deeplabv3_train.sh",
     {}),
    ("cityscapes_deeplab_v3_contrast", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/deeplab/"
     "run_r_101_d_8_deeplabv3_contrast_train.sh", {}),
    ("ade20k_hrnet_w48", "ade20k/H_48_D_4.json", None,
     {"model": "hrnet_w48"}),
    ("ade20k_hrnet_w48_contrast", "ade20k/H_48_D_4.json", None,
     {"model": "hrnet_w48_contrast"}),
    ("coco_stuff_hrnet_w48_contrast", "coco_stuff/H_48_D_4.json", None,
     {"model": "hrnet_w48_contrast"}),
    ("pascal_context_hrnet_w48_contrast", "pascal_context/H_48_D_4.json",
     None, {"model": "hrnet_w48_contrast"}),
    ("lip_ce2p_ocrnet", "lip/R_101_D_16.json",
     f"{REF}/scripts/lip/run_r_101_d_16_ce2p_ocr_train.sh",
     # ce2p_auxce_loss is absent from the reference's own SEG_LOSS_DICT
     # (loss_manager.py:27-42); fs_auxce_loss is the nearest key.
     {"loss": "fs_auxce_loss"}),
    ("camvid_hrnet_w48_contrast", "camvid/H_48_D_4.json", None,
     {"model": "hrnet_w48_contrast"}),
    ("mapillary_hrnet_w48", "mapillary/H_48_D_4_1024x1024.json",
     f"{REF}/scripts/mapillary/run_h_48_d_4_ocr_b.sh", {}),
    ("celeba_hrnet_w48", "celeba/H_48_D_4.json",
     f"{REF}/scripts/celeba/run_h_48_d_4_train.sh", {}),
    ("cityscapes_segfix_hrnet", "cityscapes/H_SEGFIX.json",
     f"{REF}/scripts/cityscapes/segfix/run_h_48_d_4_segfix.sh", {}),
    ("cityscapes_hrnet_w48_ocr", "cityscapes/H_48_D_4.json",
     f"{REF}/scripts/cityscapes/hrnet/run_h_48_d_4_ocr.sh", {}),
    ("cityscapes_hrnet_w48_ocr_contrast", "cityscapes/H_48_D_4.json",
     f"{REF}/scripts/cityscapes/hrnet/run_h_48_d_4_ocr_contrast.sh", {}),
    ("cityscapes_hrnet_w48_ocr_b", "cityscapes/H_48_D_4.json",
     f"{REF}/scripts/cityscapes/hrnet/run_h_48_d_4_ocr_b.sh", {}),
    ("cityscapes_hrnet_w48_ocr_ohem", "cityscapes/H_48_D_4.json",
     f"{REF}/scripts/cityscapes/hrnet/run_h_48_d_4_ocr_ohem.sh", {}),
    ("cityscapes_base_ocnet", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocnet/run_r_101_d_8_baseoc_train.sh", {}),
    ("cityscapes_asp_ocnet", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocnet/run_r_101_d_8_aspoc_train.sh", {}),
    ("cityscapes_isanet", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/isa/run_r_101_d_8_isa_train.sh", {}),
    ("coco_stuff_hrnet_w48", "coco_stuff/H_48_D_4.json",
     f"{REF}/scripts/coco_stuff/run_h_48_d_4_train.sh", {}),
    ("coco_stuff_hrnet_w48_ocr", "coco_stuff/H_48_D_4.json",
     f"{REF}/scripts/coco_stuff/run_h_48_d_4_ocr_train.sh", {}),
    ("coco_stuff_spatial_ocrnet", "coco_stuff/R_101_D_8.json",
     f"{REF}/scripts/coco_stuff/run_r_101_d_8_ocr_train.sh", {}),
    ("pascal_context_hrnet_w48_ocr", "pascal_context/H_48_D_4.json",
     f"{REF}/scripts/pascal_context/run_h_48_d_4_ocr_train.sh", {}),
    # The reference script points CONFIGS at the *cityscapes* JSON while
    # training pascal-context (data overridden via CLI); we keep the
    # pascal data block, so skip the JSON data comparison.
    ("pascal_context_deeplab_v3", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/pascal_context/run_r_101_d_8_deeplabv3_train.sh",
     {"skip_data": True}),
    ("lip_hrnet_w48_ocr", "lip/H_48_D_4.json",
     f"{REF}/scripts/lip/run_h_48_d_4_ocr_train.sh", {}),
    # --- full script-zoo closure (round 3).
    ("cityscapes_fcnet", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/fcn/run_r_101_d_8_fcn_train.sh", {}),
    ("cityscapes_fcnet_wo_dsn", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/fcn/run_r_101_d_8_fcn_wo_dsn_train.sh", {}),
    ("cityscapes_pyramid_ocnet", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocnet/run_r_101_d_8_pyramidoc_train.sh", {}),
    ("cityscapes_spatial_ocrnet", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/run_r_101_d_8_ocrnet_train.sh", {}),
    ("cityscapes_spatial_asp_ocrnet", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/run_r_101_d_8_asp_ocrnet_train.sh",
     {}),
    ("cityscapes_ideal_spatial_ocrnet", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/run_ideal_spatial_ocrnet.sh", {}),
    ("cityscapes_ideal_spatial_ocrnet_b", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/run_ideal_spatial_ocrnet_b.sh", {}),
    ("cityscapes_ideal_spatial_ocrnet_c", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/run_ideal_spatial_ocrnet_c.sh", {}),
    ("cityscapes_ideal_gather_ocrnet", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/run_ideal_gather_ocrnet.sh", {}),
    ("cityscapes_ideal_distribute_ocrnet", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/run_ideal_distribute_ocrnet.sh", {}),
    ("cityscapes_resnest_fcn", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/resnest/run_r_101_d_8_fcn.sh", {}),
    ("cityscapes_spatial_ocrnet_trainval", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/run_r_101_d_8_ocrnet_trainval.sh",
     {"extra": {"include_val": True}}),
    ("cityscapes_spatial_ocrnet_coarse", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/run_spatial_ocrnet_trainval_coarse.sh",
     {"extra": {"only_coarse": True}}),
    ("cityscapes_spatial_ocrnet_coarse_trainval",
     "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/"
     "run_spatial_ocrnet_trainval_coarse_trainval.sh",
     {"extra": {"include_val": True}}),
    ("cityscapes_spatial_ocrnet_mapillary", "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/"
     "run_spatial_ocrnet_trainval_mapillary.sh",
     {"extra": {"only_mapillary": True}}),
    ("cityscapes_spatial_ocrnet_mapillary_coarse",
     "cityscapes/R_101_D_8.json",
     f"{REF}/scripts/cityscapes/ocrnet/"
     "run_spatial_ocrnet_trainval_mapillary_coarse.sh",
     {"extra": {"only_coarse": True}}),
    ("cityscapes_hrnet_w48_ocr_trainval", "cityscapes/H_48_D_4.json",
     f"{REF}/scripts/cityscapes/hrnet/run_h_48_d_4_ocr_trainval.sh",
     {"extra": {"include_val": True}}),
    ("cityscapes_hrnet_w48_ocr_b_trainval_ohem", "cityscapes/H_48_D_4.json",
     f"{REF}/scripts/cityscapes/hrnet/"
     "run_h_48_d_4_ocr_b_mapillary_trainval_ohem.sh",
     {"extra": {"include_val": True}}),
    ("cityscapes_hrnet_w48_ocr_b_coarse_ohem", "cityscapes/H_48_D_4.json",
     f"{REF}/scripts/cityscapes/hrnet/"
     "run_h_48_d_4_ocr_b_mapillary_trainval_coarse_ohem.sh",
     {"extra": {"only_coarse": True}}),
    ("cityscapes_hrnet_w48_ocr_b_coarse_trainval_ohem",
     "cityscapes/H_48_D_4.json",
     f"{REF}/scripts/cityscapes/hrnet/"
     "run_h_48_d_4_ocr_b_mapillary_trainval_coarse_trainval_ohem.sh",
     {"extra": {"include_val": True}}),
    ("cityscapes_segfix_hrnet_inst", "cityscapes/H_SEGFIX.json",
     f"{REF}/scripts/cityscapes/segfix/run_h_48_d_4_segfix_inst.sh", {}),
    ("cityscapes_segfix_hrnet_trainval", "cityscapes/H_SEGFIX.json",
     f"{REF}/scripts/cityscapes/segfix/run_h_48_d_4_segfix_trainval.sh",
     {"extra": {"include_val": True}}),
    ("cityscapes_segfix_hrnet2x", "cityscapes/H_SEGFIX.json",
     f"{REF}/scripts/cityscapes/segfix/run_hx_20_d_2_segfix.sh", {}),
    ("cityscapes_segfix_hrnet2x_inst", "cityscapes/H_SEGFIX.json",
     f"{REF}/scripts/cityscapes/segfix/run_hx_20_d_2_segfix_inst.sh", {}),
    ("cityscapes_segfix_hrnet2x_trainval", "cityscapes/H_SEGFIX.json",
     f"{REF}/scripts/cityscapes/segfix/run_hx_20_d_2_segfix_trainval.sh",
     {"extra": {"include_val": True}}),
    ("segfix_cityscapes_ade20k", "cityscapes/H_SEGFIX.json",
     f"{REF}/scripts/segfix/run_hx_20_d_2_cityscapes_ade20k.sh", {}),
    ("celeba_hrnet_w48_ocr", "celeba/H_48_D_4.json",
     f"{REF}/scripts/celeba/run_h_48_d_4_ocr_train.sh", {}),
    ("coco_stuff_hrnet48_isa", "coco_stuff/H_48_D_4.json",
     f"{REF}/scripts/coco_stuff/run_h_48_d_4_isa_train.sh", {}),
    ("coco_stuff_hrnet_w48_ocr_ohem", "coco_stuff/H_48_D_4.json",
     f"{REF}/scripts/coco_stuff/run_h_48_d_4_ocr_ohem_train.sh", {}),
    ("coco_stuff_hrnet_w48_ocr_rmi", "coco_stuff/H_48_D_4_RMI.json",
     f"{REF}/scripts/coco_stuff/run_h_48_d_4_ocr_ohem_train_rmi_paddle.sh",
     {}),
    ("coco_stuff_ideal_spatial_ocrnet", "coco_stuff/R_101_D_8.json",
     f"{REF}/scripts/coco_stuff/run_r_101_d_8_gt_ocr_train.sh", {}),
    ("coco_stuff_fcnet", "coco_stuff/R_101_D_8.json",
     f"{REF}/scripts/coco_stuff/run_r_101_d_8_train.sh", {}),
    ("lip_hrnet_w48", "lip/H_48_D_4.json",
     f"{REF}/scripts/lip/run_h_48_d_4_train.sh", {}),
    ("lip_hrnet_w48_isa", "lip/H_48_D_4.json",
     f"{REF}/scripts/lip/run_h_48_d_4_isa_train.sh", {}),
    ("lip_hrnet_w48_ocr_b", "lip/H_48_D_4.json",
     f"{REF}/scripts/lip/run_h_48_d_4_ocr_b_train.sh", {}),
    ("lip_ce2p_ideal_ocrnet", "lip/R_101_D_16.json",
     f"{REF}/scripts/lip/run_r_101_d_16_ce2p_gt_ocrnet_train.sh",
     # same ce2p_auxce_loss bitrot as lip_ce2p_ocrnet.
     {"loss": "fs_auxce_loss"}),
    ("pascal_context_hrnet_w48", "pascal_context/H_48_D_4.json",
     f"{REF}/scripts/pascal_context/run_h_48_d_4_train.sh",
     # script names fs_auxce_loss for the single-output hrnet_w48 —
     # inexecutable upstream; fs_ce is the runnable intent.
     {"loss": "fs_ce_loss"}),
    ("pascal_context_hrnet_w48_isa", "pascal_context/H_48_D_4.json",
     f"{REF}/scripts/pascal_context/run_h_48_d_4_isa_train.sh", {}),
    ("pascal_context_hrnet_w48_ocr_b", "pascal_context/H_48_D_4.json",
     f"{REF}/scripts/pascal_context/run_h_48_d_4_ocr_b_train.sh", {}),
    ("pascal_context_hrnet_w48_ocr_rmi", "pascal_context/H_48_D_4_RMI.json",
     f"{REF}/scripts/pascal_context/run_h_48_d_4_ocr_train_rmi_paddle.sh",
     {}),
    ("pascal_context_spatial_ocrnet", "pascal_context/R_101_D_8.json",
     f"{REF}/scripts/pascal_context/run_r_101_d_8_ocr_train.sh", {}),
    ("pascal_context_spatial_asp_ocrnet", "pascal_context/R_101_D_8.json",
     f"{REF}/scripts/pascal_context/run_r_101_d_8_aspocr_train.sh", {}),
    ("pascal_context_base_ocnet", "pascal_context/R_101_D_8.json",
     f"{REF}/scripts/pascal_context/run_r_101_d_8_baseoc_train.sh", {}),
    ("pascal_context_ideal_spatial_ocrnet", "pascal_context/R_101_D_8.json",
     f"{REF}/scripts/pascal_context/run_r_101_d_8_gt_ocr_train.sh", {}),
    ("pascal_context_fcnet", "pascal_context/R_101_D_8.json",
     f"{REF}/scripts/pascal_context/run_r_101_d_8_train.sh", {}),
]


def _ref_json_path(rel):
    with open(f"{REF}/configs/{rel}") as f:
        return json.load(f)


@pytest.mark.parametrize("preset_name,json_rel,script,diverge", JSON_CASES)
def test_preset_matches_reference_json(preset_name, json_rel, script,
                                       diverge):
    ref = _ref_json_path(json_rel)
    cfg = get_preset(preset_name)

    if not diverge.get("skip_data"):
        # data block.
        assert cfg.get("data.num_classes") == ref["data"]["num_classes"]
        if ref["data"].get("reduce_zero_label") is not None:
            assert (cfg.get("data.reduce_zero_label", default=False)
                    == ref["data"]["reduce_zero_label"])

        # transforms.
        td = ref["train"]["data_transformer"]
        assert (cfg.get("train.data_transformer.input_size")
                == td["input_size"])
        assert cfg.get("train.data_transformer.size_mode") == td["size_mode"]
        assert (cfg.get("train.data_transformer.align_method")
                == td["align_method"])
        tt = ref.get("train_trans", {})
        if "random_crop" in tt:
            assert (cfg.get("train_trans.random_crop.crop_size")
                    == tt["random_crop"]["crop_size"])
        if "random_resize" in tt:
            assert (cfg.get("train_trans.random_resize.scale_range")
                    == tt["random_resize"]["scale_range"])
    if preset_name == "lip_ce2p_ocrnet":
        assert cfg.get("train_trans.trans_seq") == tt["trans_seq"]
        assert (cfg.get("train_trans.resize.target_size")
                == tt["resize"]["target_size"])
        assert (cfg.get("train_trans.random_hflip.swap_pair")
                == tt["random_hflip"]["swap_pair"])

    # optimizer family.
    assert cfg.get("lr.lr_policy") == ref["lr"]["lr_policy"]
    assert cfg.get("optim.optim_method") == ref["optim"]["optim_method"]
    for k, v in ref["optim"]["sgd"].items():
        assert cfg.get(f"optim.sgd.{k}") == v, k

    # contrast block, where the reference JSON carries one and the preset
    # trains a contrast model.
    if "contrast" in ref and "contrast" in cfg.get(
            "loss.loss_type", default=""):
        rc = ref["contrast"]
        for key in ("proj_dim", "temperature", "base_temperature",
                    "max_samples", "max_views", "warmup_iters",
                    "loss_weight"):
            assert cfg.get(f"contrast.{key}") == rc[key], key

    # extra-set recipe flags (the scripts' include_val/only_coarse/
    # only_mapillary exports -> data.* flags).
    for k, v in diverge.get("extra", {}).items():
        assert cfg.get(f"data.{k}", default=False) == v, k

    # script overrides (authoritative over the JSON where present).
    if script:
        sv = _script_vars(script)
        assert cfg.get("solver.max_iters") == int(sv["MAX_ITERS"])
        if "BATCH_SIZE" in sv:
            assert cfg.get("train.batch_size") == int(sv["BATCH_SIZE"])
        if "BASE_LR" in sv:
            assert cfg.get("lr.base_lr") == float(sv["BASE_LR"])
        assert cfg.get("network.model_name") == sv["MODEL_NAME"]
        assert cfg.get("network.backbone") == sv["BACKBONE"]
        expect_loss = diverge.get("loss", sv["LOSS_TYPE"])
        assert cfg.get("loss.loss_type") == expect_loss
    else:
        # JSON-only cases: lr/iters from the JSON; model from the preset's
        # stated purpose (the reference JSONs carry stale model defaults
        # the scripts always override).
        assert cfg.get("lr.base_lr") == ref["lr"]["base_lr"]
        assert cfg.get("solver.max_iters") == ref["solver"]["max_iters"]
        if "model" in diverge:
            assert cfg.get("network.model_name") == diverge["model"]
