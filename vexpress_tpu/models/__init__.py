from .audio_projection import AudioProjection
from .motion_module import TemporalMotionModule
from .unet_2d import ReferenceUNet2D
from .unet_3d import DenoisingUNet3D, UNetConfig
from .vae import AutoencoderKL, VAEConfig
from .vkps_guider import VKpsGuider
from .wav2vec2 import Wav2Vec2Config, Wav2Vec2Model

__all__ = [
    "AudioProjection",
    "AutoencoderKL",
    "DenoisingUNet3D",
    "ReferenceUNet2D",
    "TemporalMotionModule",
    "UNetConfig",
    "VAEConfig",
    "VKpsGuider",
    "Wav2Vec2Config",
    "Wav2Vec2Model",
]
