"""maskcyclegan_vc_tpu — a TPU-native voice-conversion framework.

A from-scratch JAX/XLA/Pallas implementation of the MaskCycleGAN-VC
(Kaneko et al., 2021, arXiv:2102.12841) non-parallel voice-conversion
pipeline: on-device mel frontend, mask-guided CycleGAN generators /
PatchGAN discriminators, a fused two-sided jitted training step, mesh
data-parallelism via ``jax.sharding``, and a MelGAN vocoder for decode.

Capability parity target: GANtastic3/MaskCycleGAN-VC (PyTorch reference).
Architecture here is TPU-first — NHWC layouts feeding the MXU, fused
instance-norm/gate epilogues, static-shape bucketing, pjit sharding —
not a translation of the reference's CUDA/torch patterns.
"""

__version__ = "0.1.0"
