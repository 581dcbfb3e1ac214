"""lkgd_tpu — TPU-native rebuild of the LKGD latent-knowledge-guided video diffusion stack.

A from-scratch JAX/Flax/Pallas framework with the capabilities of caoql98/LKGD
(image-to-video Stable Video Diffusion + CogVideoX with quaternion latent-knowledge fusion,
joint-attention frame transition, ControlNet-SDV, optical-flow conditioning, LoRA training),
designed for TPU: SPMD over `jax.sharding.Mesh`, functional weights, `lax.scan` sampling
loops, and Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"
