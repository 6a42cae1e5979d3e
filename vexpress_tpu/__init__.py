"""V-Express TPU: a TPU-native (JAX/XLA/Pallas/pjit) audio-driven portrait video
generation framework with the capabilities of tencent-ailab/V-Express.

This is a ground-up rebuild, not a port: the compute path is functional JAX
(flax.linen modules, static shapes, jit-compiled denoise steps), reference-net
KV injection is explicit feature plumbing instead of runtime monkey-patching
(reference: modules/mutual_self_attention.py), and long-video generation maps
overlapping context windows onto batched/sharded device axes
(reference: pipelines/context.py + pipelines/v_express_pipeline.py:409-589).
"""

__version__ = "0.1.0"
