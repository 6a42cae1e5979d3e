from .context import compute_context_windows, compute_video_length, uniform_context_windows
from .pipeline import VExpressPipeline

__all__ = [
    "VExpressPipeline",
    "compute_context_windows",
    "compute_video_length",
    "uniform_context_windows",
]
