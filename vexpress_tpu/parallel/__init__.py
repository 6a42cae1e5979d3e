from .mesh import create_mesh, shard_opt_state_zero2, window_parallel_step

__all__ = ["create_mesh", "shard_opt_state_zero2", "window_parallel_step"]
