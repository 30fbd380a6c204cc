"""1-D Gaussian mixture (distance head of the covariant agent).

Functional replacement for the reference's torch MixtureSameFamily wrapper
(molgym/agents/covariant/gmm.py): log_prob via logsumexp, sampling via
component-categorical + normal, argmax by best-of-`count` samples exactly as
the reference does (gmm.py:20-27).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gmm_log_prob(log_weights: jnp.ndarray, means: jnp.ndarray,
                 stds: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """log_weights/means: [..., K]; stds: [K] or [..., K]; x: [...]."""
    log_w = jax.nn.log_softmax(log_weights, axis=-1)
    var = stds * stds
    comp = -0.5 * (jnp.square(x[..., None] - means) / var +
                   jnp.log(2.0 * jnp.pi * var))
    return jax.nn.logsumexp(log_w + comp, axis=-1)


def gmm_sample(rng: jnp.ndarray, log_weights: jnp.ndarray, means: jnp.ndarray,
               stds: jnp.ndarray) -> jnp.ndarray:
    k_comp, k_norm = jax.random.split(rng)
    comp = jax.random.categorical(k_comp, log_weights, axis=-1)  # [...]
    mean = jnp.take_along_axis(means, comp[..., None], axis=-1)[..., 0]
    std = jnp.broadcast_to(stds, means.shape)
    std = jnp.take_along_axis(std, comp[..., None], axis=-1)[..., 0]
    return mean + std * jax.random.normal(k_norm, mean.shape)


def gmm_argmax(rng: jnp.ndarray, log_weights: jnp.ndarray, means: jnp.ndarray,
               stds: jnp.ndarray, count: int = 128) -> jnp.ndarray:
    """Sample-based mode estimate (reference gmm.py:20-27)."""
    keys = jax.random.split(rng, count)
    samples = jax.vmap(lambda k: gmm_sample(k, log_weights, means, stds))(keys)
    logp = jax.vmap(lambda s: gmm_log_prob(log_weights, means, stds, s))(samples)
    best = jnp.argmax(logp, axis=0)  # [...]
    return jnp.take_along_axis(samples, best[None], axis=0)[0]
