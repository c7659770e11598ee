from contrastiveseg_tpu.models.nets import MODELS, DeepLabV3, HRNetSeg, build_model
from contrastiveseg_tpu.models.hrnet import HRNET_SPECS, HRNet
from contrastiveseg_tpu.models.resnet import RESNET_SPECS, ResNet

__all__ = [
    "MODELS",
    "build_model",
    "HRNet",
    "HRNetSeg",
    "HRNET_SPECS",
    "ResNet",
    "RESNET_SPECS",
    "DeepLabV3",
]
