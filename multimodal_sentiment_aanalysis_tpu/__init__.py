"""TPU-native multimodal sentiment/emotion framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``zhouyuchenzyccccc/Multimodal-Sentiment-Aanalysis`` (PyTorch, single GPU),
re-designed TPU-first:

- device-resident fused input pipeline (the full MAHNOB-HCI-style dataset is
  ~36 MB; it lives in HBM and batches are gathered with ``jnp.take`` inside
  jit — no per-batch host->device copies, unlike the reference's per-batch
  ``.to(device)`` loop, cf. reference ``dataLoader/MultiTaskTrainer.py:187-195``)
- pure-functional flax.linen models with PyTorch-parity numerics
  (erf-GELU, post-norm transformer encoder, torch LSTM gate order)
- whole-epoch jitted training steps (``lax.scan`` over batches)
- phased curriculum as masked optax optimizers
- data parallelism via ``shard_map`` over a ``jax.sharding.Mesh`` with
  ``psum`` gradient all-reduce over ICI
- Pallas TPU kernels for the fused hot blocks (attention, conv-BN-GELU-pool,
  contrastive loss)
"""

__version__ = "0.1.0"
