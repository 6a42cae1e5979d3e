from .audio_projection import AudioProjection
from .unet_2d import ReferenceUNet2D
from .unet_3d import DenoisingUNet3D, UNetConfig
from .vkps_guider import VKpsGuider

__all__ = [
    "AudioProjection",
    "ReferenceUNet2D",
    "DenoisingUNet3D",
    "UNetConfig",
    "VKpsGuider",
]
