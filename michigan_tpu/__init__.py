"""MichiGAN-TPU: a TPU-native (JAX/XLA/Flax/Pallas) hair-editing GAN framework.

A from-scratch rebuild of the capabilities of tzt101/MichiGAN (SIGGRAPH 2020)
designed for TPU hardware: NHWC layouts, jit-compiled pure functions instead of
mode-dispatched nn.Module forwards, cross-replica batch-norm via one `psum`
collective instead of thread/queue sync-BN, and SPMD data parallelism via
`shard_map` over a `jax.sharding.Mesh`.

Layer map (mirrors reference /root/reference layering, re-designed TPU-first):
  config    — typed Options dataclass + argparse shims (reference options/*)
  ops       — numerics: torch-semantics resize/pools, filter banks, color,
              noise pyramid, masked stats, norms (+ Pallas kernels)
  models    — Flax modules: SPADE generator, encoders, inpainters, discriminator
  losses    — GAN/feature/VGG/style/orientation/Lab losses
  data      — host-side pipeline (PIL/cv2), named-array batches
  parallel  — mesh + sharded train/infer steps
  training  — train state, optimizers, checkpointing, weight conversion
"""

__version__ = "0.1.0"
