from .ddim import DDIMScheduler, SchedulerConfig

__all__ = ["DDIMScheduler", "SchedulerConfig"]
