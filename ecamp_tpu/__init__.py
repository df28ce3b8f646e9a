"""ecamp_tpu — a TPU-native (JAX/XLA/Pallas/pjit) medical vision-language
pre-training + fine-tuning framework.

Re-implements, TPU-first, the full capability surface of the ECAMP reference
(entity-centered context-aware medical VLP: MAE-style masked image modeling +
super-resolution branch + entity-weighted MLM over LLM-distilled reports,
plus classification / segmentation / detection fine-tuning and attention
visualization).

Design notes (vs. the CUDA/PyTorch reference):
  * compute path is pure functional JAX; one jitted train step per workload
  * data parallelism is a `jax.sharding.Mesh(('data',))` + NamedSharding —
    gradient all-reduce is emitted by XLA over ICI (not NCCL)
  * bf16 compute / fp32 params replaces apex O2 fp16 loss scaling
  * hot attention/LayerNorm ops have Pallas TPU kernels with XLA fallbacks
  * a single ViT trunk serves MAE-encoder / cls / seg / det heads (the
    reference keeps 5 divergent copies)
"""

__version__ = "0.1.0"
