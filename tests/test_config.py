import glob
import os

import numpy as np
import pytest

from cim_tpu.config import (
    assert_and_infer_cfg,
    cfg_from_list,
    clone_cfg,
    get_default_cfg,
    load_cfg,
)

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.parametrize(
    "name", sorted(os.path.basename(p) for p in glob.glob(f"{CONFIG_DIR}/*.yaml"))
)
def test_all_shipped_configs_load(name):
    cfg = load_cfg(os.path.join(CONFIG_DIR, name))
    cfg = assert_and_infer_cfg(cfg)
    assert cfg.REFINE_TIMES == 3
    assert cfg.FAST_RCNN.ROI_XFORM_RESOLUTION == 7
    assert cfg.is_immutable()
    with pytest.raises(AttributeError):
        cfg.REFINE_TIMES = 5


def test_resnet50_voc_values():
    cfg = load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml"))
    assert cfg.MODEL.CONV_BODY == "resnet50.torch_resnet50"
    assert cfg.SOLVER.MAX_ITER == 90000
    assert cfg.SOLVER.STEPS == [0, 60000]
    assert cfg.SOLVER.BASE_LR == 0.0005
    assert cfg.TRAIN.SCALES == (480, 576, 688, 864, 1200)
    assert cfg.TRAIN.BATCH_SIZE_PER_IM == 4096
    assert cfg.TEST.BBOX_AUG.ENABLED is True
    assert cfg.TEST.BBOX_AUG.SCALES == (576, 688, 864, 1200)
    assert cfg.step_rate == 0.1
    assert cfg.Anti_noise_sampling is True
    assert cfg.transform_mode == "ToTensor"
    assert cfg.DEDUP_BOXES == 0.0


def test_hrnet_extra_stages():
    cfg = load_cfg(os.path.join(CONFIG_DIR, "hrnet48_voc.yaml"))
    assert cfg.MODEL.EXTRA.STAGE4.NUM_BRANCHES == 4
    assert cfg.MODEL.EXTRA.STAGE4.NUM_CHANNELS == [48, 96, 192, 384]
    assert cfg.MODEL.EXTRA.STAGE1.BLOCK == "BOTTLENECK"


def test_cfg_from_list_type_coercion():
    cfg = get_default_cfg()
    cfg_from_list(cfg, ["SOLVER.BASE_LR", "0.01", "TRAIN.SCALES", "(500,)"])
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.TRAIN.SCALES == (500,)


def test_unknown_key_rejected():
    cfg = get_default_cfg()
    with pytest.raises(KeyError):
        from cim_tpu.config import merge_dict_into_cfg

        merge_dict_into_cfg({"NOT_A_KEY": 1}, cfg)


def test_clone_is_mutable_and_independent():
    cfg = assert_and_infer_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    c2 = clone_cfg(cfg)
    c2.SOLVER.BASE_LR = 1.0
    assert cfg.SOLVER.BASE_LR == 0.0005
    assert isinstance(c2.PIXEL_MEANS, np.ndarray)
