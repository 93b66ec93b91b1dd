"""Latent bottleneck parametrizations for the seg auto-encoder.

Pure functions over encoder moments (NHWC, channels last), mirroring the
four reference parametrizations (ldmseg/models/vae.py:325-569):

  * ``gaussian``                — diagonal Gaussian, KL to N(0, I)
  * ``discrete_gumbel_softmax`` — gumbel-softmax codebook assignment
  * ``discrete_codebook``       — straight-through argmax codebook assignment
  * ``auto``                    — identity bottleneck, L2 'KL'

Each returns (sample, mode, kl) where kl is per-example [B].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def to_range(x: jnp.ndarray, act_fn: str, clip_range: float = 1.0) -> jnp.ndarray:
    """Range activation on the bottleneck mean (vae.py:339-351)."""
    if act_fn == "sigmoid":
        return 2.0 * jax.nn.sigmoid(x) - 1.0
    if act_fn == "tanh":
        return jnp.tanh(x)
    if act_fn == "clip":
        return jnp.clip(x, -clip_range, clip_range)
    if act_fn == "l2":
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)
    if act_fn == "none":
        return x
    raise NotImplementedError(f"act_fn '{act_fn}'")


def gaussian_bottleneck(
    moments: jnp.ndarray,
    rng: Optional[jax.Array],
    *,
    sample_posterior: bool = True,
    clamp_output: bool = False,
    act_fn: str = "none",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Diagonal Gaussian (vae.py:370-424). moments: [..., 2*C] -> [..., C]."""
    m = moments.astype(jnp.float32)
    if clamp_output:
        m = jnp.clip(m, -5.0, 5.0)
    mean, logvar = jnp.split(m, 2, axis=-1)
    mean = to_range(mean, act_fn)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    if sample_posterior:
        assert rng is not None
        z = mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
    else:
        z = mean
    kl = 0.5 * jnp.sum(
        jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar,
        axis=tuple(range(1, mean.ndim)),
    )
    return z, mean, kl


def _uniform_kl(logits: jnp.ndarray) -> jnp.ndarray:
    """KL(q || uniform) summed over positions, per batch element.

    Matches torch F.kl_div(log_uniform, log_q, log_target=True,
    reduction='batchmean') on [B, HW, N] logits (vae.py:483-489): the
    'batchmean' divisor is the batch size only, so the value sums over HW.
    """
    b = logits.shape[0]
    n = logits.shape[-1]
    logq = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    q = jnp.exp(logq)
    log_u = -jnp.log(jnp.float32(n))
    kl = jnp.sum(q * (logq - log_u), axis=tuple(range(1, logits.ndim)))
    # reference returns a scalar (batchmean); keep per-example then mean later
    return kl * (b / b)


def codebook_lookup(one_hot: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """[..., N] assignment x [N, D] codebook -> [..., D]."""
    return jnp.einsum(
        "...n,nd->...d", one_hot, codebook, preferred_element_type=jnp.float32
    )


def gumbel_softmax_bottleneck(
    logits: jnp.ndarray,
    codebook: jnp.ndarray,
    rng: Optional[jax.Array],
    *,
    sample_posterior: bool = True,
    temperature: float = 0.2,
    clamp_output: bool = False,
    act_fn: str = "none",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gumbel-softmax codebook assignment (vae.py:427-496).

    logits: [B, H, W, N]; codebook: [N, D]. Hard straight-through sampling.
    """
    del act_fn  # the reference never applies it to discrete parametrizations
    x = logits.astype(jnp.float32)
    if clamp_output:
        x = jnp.clip(x, -5.0, 5.0)
    n = x.shape[-1]

    # mode: hard argmax lookup
    idx = jnp.argmax(x, axis=-1)
    hard = jax.nn.one_hot(idx, n, dtype=jnp.float32)
    mode = codebook_lookup(hard, codebook)

    if sample_posterior:
        assert rng is not None
        g = jax.random.gumbel(rng, x.shape, dtype=jnp.float32)
        y_soft = jax.nn.softmax((x + g) / temperature, axis=-1)
        idx_s = jnp.argmax(y_soft, axis=-1)
        y_hard = jax.nn.one_hot(idx_s, n, dtype=jnp.float32)
        # straight-through: forward hard, gradient through soft
        y = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        z = codebook_lookup(y, codebook)
    else:
        z = mode

    kl = _uniform_kl(x)
    return z, mode, kl


def discrete_codebook_bottleneck(
    logits: jnp.ndarray,
    codebook: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    sample_posterior: bool = True,
    clamp_output: bool = False,
    act_fn: str = "none",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Straight-through argmax assignment (vae.py:499-569)."""
    del rng, act_fn
    x = logits.astype(jnp.float32)
    if clamp_output:
        x = jnp.clip(x, -5.0, 5.0)
    n = x.shape[-1]
    idx = jnp.argmax(x, axis=-1)
    y_hard = jax.nn.one_hot(idx, n, dtype=jnp.float32)
    mode = codebook_lookup(y_hard, codebook)
    if sample_posterior:
        # y = (hard - logits).detach() + logits  (vae.py:549-553)
        y = jax.lax.stop_gradient(y_hard - x) + x
        z = codebook_lookup(y, codebook)
    else:
        z = mode
    kl = _uniform_kl(x)
    return z, mode, kl


def auto_bottleneck(
    moments: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    sample_posterior: bool = True,
    act_fn: str = "none",
    clamp_range: float = 5.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Plain AE bottleneck; 'kl' is the latent L2 energy (vae.py:325-367)."""
    del rng, sample_posterior
    mean = to_range(moments.astype(jnp.float32), act_fn, clip_range=clamp_range)
    kl = jnp.sum(jnp.square(mean), axis=tuple(range(1, mean.ndim)))
    return mean, mean, kl


def orthogonal_codebook_init(num_embeddings: int, dim: int, seed: int = 42) -> jnp.ndarray:
    """Frozen-codebook init: QR of a fixed Gaussian (vae.py:76-79)."""
    rng = jax.random.PRNGKey(seed)
    g = jax.random.normal(rng, (num_embeddings, dim), dtype=jnp.float32)
    q, _ = jnp.linalg.qr(g)
    return q
