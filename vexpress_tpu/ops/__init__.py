from .attention import Attention, sdpa
from .layers import (
    FeedForward,
    TimestepEmbedding,
    get_sinusoidal_positional_encoding,
    get_timestep_embedding,
)

__all__ = [
    "Attention",
    "sdpa",
    "FeedForward",
    "TimestepEmbedding",
    "get_timestep_embedding",
    "get_sinusoidal_positional_encoding",
]
