from .context import compute_context_windows, compute_video_length, uniform_context_windows
from .pipeline import PipelineModels, VExpressPipeline

__all__ = [
    "PipelineModels",
    "VExpressPipeline",
    "compute_context_windows",
    "compute_video_length",
    "uniform_context_windows",
]
