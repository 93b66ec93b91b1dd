"""LDMSeg-TPU: a TPU-native latent-diffusion panoptic segmentation framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
segments-ai/latent-diffusion-segmentation (LDMSeg): a two-stage pipeline of

  1. a shallow panoptic auto-encoder compressing bit-encoded instance maps
     into 4-channel latents, and
  2. a conditional latent diffusion model denoising those latents,
     conditioned on frozen SD-VAE RGB latents via channel concatenation.

Design principles (TPU-first, not a port):
  * NHWC layouts everywhere (channels ride the 128-wide lane dimension).
  * Pure-functional models (flax.linen) + jitted train/sample steps.
  * DDIM math as pure functions over precomputed fp32 tables.
  * SPMD via jax.sharding.Mesh ('data', 'fsdp', 'sp') axes; gradient all-reduce,
    ZeRO-1 optimizer sharding and metric reductions fall out of shardings
    instead of explicit NCCL calls.
  * Pallas kernels for the hot ops (flash attention over latent grids,
    fused GroupNorm+SiLU).
"""

__version__ = "0.1.0"
