from cim_tpu.models.builder import (
    BACKBONES,
    CIMModel,
    build_model,
    frozen_paths_for,
    register_backbone,
)
from cim_tpu.models.heads import ClsIouHead
from cim_tpu.models.mask_fuse import MaskFuse
from cim_tpu.models.resnet import ResNet50C4
from cim_tpu.models.vgg import DilatedVGG16

__all__ = [
    "BACKBONES",
    "CIMModel",
    "build_model",
    "frozen_paths_for",
    "register_backbone",
    "ClsIouHead",
    "MaskFuse",
    "ResNet50C4",
    "DilatedVGG16",
]
