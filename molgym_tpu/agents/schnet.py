"""SchNet atom encoder in flax.

Replaces schnetpack 0.3's `spk.representation.SchNet` used by the reference's
internal agent (reference molgym/agents/internal/agent.py:37-38,128): element
embeddings + continuous-filter convolutions (cfconv) with Gaussian RBF
distance expansion and a cosine cutoff, run fully batched over the padded
canvas with masks — the reference calls schnetpack once per observation in a
Python loop (agent.py:124-143); here one vmapped pass covers the batch, which
is what makes the kappa surrogate (two more passes) affordable.

All pairwise work is dense [B, N, N] — canvases are tiny (N <= ~128), so
dense masked tensors beat neighbor lists on TPU and keep the MXU busy via the
feature-dimension matmuls.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    return nn.softplus(x) - float(np.log(2.0))


class GaussianRBF(nn.Module):
    n_rbf: int = 25
    cutoff: float = 5.0

    @nn.compact
    def __call__(self, distances: jnp.ndarray) -> jnp.ndarray:
        centers = jnp.linspace(0.0, self.cutoff, self.n_rbf)
        width = centers[1] - centers[0]
        gamma = 0.5 / (width * width)
        diff = distances[..., None] - centers
        return jnp.exp(-gamma * diff * diff)


def cosine_cutoff(distances: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    f = 0.5 * (jnp.cos(jnp.pi * jnp.minimum(distances, cutoff) / cutoff) + 1.0)
    return jnp.where(distances < cutoff, f, 0.0)


class SchNetInteraction(nn.Module):
    n_atom_basis: int
    n_filters: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, rbf: jnp.ndarray,
                 pair_mask: jnp.ndarray) -> jnp.ndarray:
        # x: [B, N, F]; rbf: [B, N, N, G]; pair_mask: [B, N, N]
        w = nn.Dense(self.n_filters)(rbf)
        w = shifted_softplus(w)
        w = nn.Dense(self.n_filters)(w)  # filter network
        w = w * pair_mask[..., None]

        y = nn.Dense(self.n_filters, use_bias=False)(x)  # in2f
        # continuous-filter convolution: sum_j W(r_ij) * y_j
        messages = jnp.einsum('bijf,bjf->bif', w, y)
        v = nn.Dense(self.n_atom_basis)(messages)  # f2out
        v = shifted_softplus(v)
        v = nn.Dense(self.n_atom_basis)(v)
        return v


class SchNetEncoder(nn.Module):
    """Maps (elements[B,N], positions[B,N,3], bag[B,Z]) -> feats[B,N,F]."""
    num_zs: int
    n_atom_basis: int = 64
    n_filters: int = 64
    n_interactions: int = 3
    n_rbf: int = 25
    cutoff: float = 5.0

    @nn.compact
    def __call__(self, elements: jnp.ndarray, positions: jnp.ndarray,
                 bag: jnp.ndarray) -> jnp.ndarray:
        B, N = elements.shape
        occupied = elements != 0  # [B, N]

        x = nn.Embed(self.num_zs, self.n_atom_basis)(elements)  # [B, N, F]

        diff = positions[:, :, None, :] - positions[:, None, :, :]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-12))

        eye = jnp.eye(N, dtype=bool)[None]
        pair_mask = (occupied[:, :, None] & occupied[:, None, :] & ~eye)
        pair_mask = pair_mask.astype(x.dtype) * cosine_cutoff(dist, self.cutoff)

        rbf = GaussianRBF(n_rbf=self.n_rbf, cutoff=self.cutoff)(dist)

        for _ in range(self.n_interactions):
            x = x + SchNetInteraction(self.n_atom_basis, self.n_filters)(
                x, rbf, pair_mask)

        return x * occupied[..., None].astype(x.dtype)


def make_schnet_agent(num_zs: int, canvas_size: int, network_width: int = 128,
                      min_max_distance=(0.8, 1.8), n_interactions: int = 3):
    """SchNet actor-critic (reference SchNetAC: n_atom_basis = width // 2,
    agent.py:33-38)."""
    from molgym_tpu.agents.internal import InternalAC
    num_afeats = network_width // 2
    encoder = SchNetEncoder(num_zs=num_zs, n_atom_basis=num_afeats,
                            n_filters=num_afeats, n_interactions=n_interactions)
    return InternalAC(num_zs=num_zs, canvas_size=canvas_size,
                      network_width=network_width,
                      min_max_distance=min_max_distance,
                      num_afeats=num_afeats, encoder=encoder)
