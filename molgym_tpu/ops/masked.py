"""Masked primitives for canvas-sized tensors.

TPU-first replacements for the reference's torch-scatter based helpers
(reference molgym/modules.py:8-27): everything is expressed as dense masked
ops that XLA fuses into surrounding compute — no scatter kernels needed at
these canvas sizes (N <= ~128).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def to_one_hot(indices: jnp.ndarray, num_classes: int, dtype=jnp.float32) -> jnp.ndarray:
    """One-hot along a new trailing axis (reference modules.py:8-23)."""
    return jax.nn.one_hot(indices, num_classes, dtype=dtype)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax over entries where mask is true; exact zeros elsewhere.

    Matches reference `masked_softmax` semantics (modules.py:26-27): the
    normalization runs only over unmasked entries. If a row is fully masked,
    returns all zeros instead of NaN.
    """
    mask = mask.astype(bool)
    masked_logits = jnp.where(mask, logits, _NEG_INF)
    # Stabilize: subtract row max (at least one real entry assumed; if none,
    # the uniform result is zeroed by the final multiply).
    z = masked_logits - jax.lax.stop_gradient(jnp.max(masked_logits, axis=-1, keepdims=True))
    exp = jnp.exp(z) * mask
    denom = jnp.sum(exp, axis=-1, keepdims=True)
    return exp / jnp.maximum(denom, 1e-20)


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Sum feature vectors over a masked axis (critic poolings, reference
    agents/internal/agent.py:311-315, agents/covariant/agent.py:313-316)."""
    return jnp.sum(x * mask[..., None].astype(x.dtype), axis=axis)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    total = masked_sum(x, mask, axis=axis)
    count = jnp.sum(mask.astype(x.dtype), axis=-1, keepdims=True)
    return total / jnp.maximum(count, 1.0)
