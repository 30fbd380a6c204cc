"""Masked categorical distribution as pure functions (no dist objects under jit).

Replaces torch.distributions.Categorical over masked probs (reference
agents/internal/agent.py:203-219, agents/covariant/agent.py:222-253).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from molgym_tpu.ops.masked import masked_softmax

_EPS = 1e-10


def masked_categorical_probs(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return masked_softmax(logits, mask)


def categorical_sample(rng: jnp.ndarray, probs: jnp.ndarray) -> jnp.ndarray:
    """Gumbel-max sampling over the last axis; zero-prob entries never win."""
    logits = jnp.log(jnp.maximum(probs, _EPS)) + jnp.where(probs > 0, 0.0, -1e9)
    g = jax.random.gumbel(rng, probs.shape)
    return jnp.argmax(logits + g, axis=-1).astype(jnp.int32)


def categorical_log_prob(probs: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    p = jnp.take_along_axis(probs, index[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.log(jnp.maximum(p, _EPS))


def categorical_entropy(probs: jnp.ndarray) -> jnp.ndarray:
    plogp = jnp.where(probs > 0, probs * jnp.log(jnp.maximum(probs, _EPS)), 0.0)
    return -jnp.sum(plogp, axis=-1)


def categorical_argmax(probs: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(probs, axis=-1).astype(jnp.int32)


def normal_log_prob(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    var = std * std
    return -0.5 * (jnp.square(x - mean) / var + jnp.log(2.0 * jnp.pi * var))


def normal_entropy(std: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * jnp.log(2.0 * jnp.pi * jnp.e * std * std)


def normal_sample(rng: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    return mean + std * jax.random.normal(rng, mean.shape)
