from lanetpu.models.unet import UNet
from lanetpu.models.resnet import ResNetRegressor, ResNet
from lanetpu.models.yolo import YoloDetector

__all__ = ["UNet", "ResNet", "ResNetRegressor", "YoloDetector"]
