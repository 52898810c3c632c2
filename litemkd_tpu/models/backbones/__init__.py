from .resnet import ResNetBackbone, ResNetTrunk, FeatureBackbone, adaptive_max_pool_2d
from .mobilenet import MobileNetV3Backbone, MobileNetV3Trunk

__all__ = ["ResNetBackbone", "ResNetTrunk", "FeatureBackbone",
           "adaptive_max_pool_2d", "MobileNetV3Backbone", "MobileNetV3Trunk"]
