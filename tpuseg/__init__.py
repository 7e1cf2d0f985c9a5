"""tpuseg — TPU-native hierarchical multi-scale attention semantic segmentation.

A brand-new JAX/XLA/Pallas framework with the capabilities of NVIDIA's
hierarchical-multi-scale-attention stack (reference: NVIDIA/semantic-segmentation,
"Hierarchical Multi-Scale Attention for Semantic Segmentation",
arXiv:2005.10821), redesigned TPU-first:

- models are pure flax modules (NHWC, bf16 compute / f32 params),
- the loss lives *outside* the model (`jax.value_and_grad` over pure fns),
- data parallelism is GSPMD over a `jax.sharding.Mesh` (no DDP wrapper),
- cross-replica batch norm is a `lax.pmean` inside the norm,
- multi-scale attention inference is a pure fusion function over an apply_fn.
"""

__version__ = "0.1.0"
