"""Shared NN building blocks (flax).

Orthogonally-initialized MLP matching the reference's layer init scheme
(reference molgym/modules.py:30-50): orthogonal weights, zero biases, relu
gates between layers, linear output.
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    output_dims: Sequence[int]
    gate: Callable = nn.relu
    w_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, dim in enumerate(self.output_dims):
            x = nn.Dense(
                dim,
                kernel_init=nn.initializers.orthogonal(scale=self.w_scale),
                bias_init=nn.initializers.zeros,
            )(x)
            if i < len(self.output_dims) - 1:
                x = self.gate(x)
        return x
