"""Reward functions.

The reference computes r = -(E(canvas+new) - E(canvas) - E(atom alone)) with
Sparrow PM6 (reference molgym/reward.py:36-55). Two families here:

* Device rewards (Lennard-Jones / Morse pair potentials): pure JAX, run inside
  the jitted rollout scan. For a pairwise potential the interaction energy
  difference reduces to the sum of pair terms between the new atom and the
  canvas, so no separate "E(atoms)" evaluation is needed. These are the fast
  path for CI, benchmarks, and algorithm development.

* Host rewards (quantum chemistry): batched `io_callback` into a host-side
  evaluator pool (see molgym_tpu/calculators/). Same batched signature, so
  environments are agnostic.

Batched reward contract:
    reward_fn(positions[B,N,3], zs[B,N], new_pos[B,3], new_z[B], valid[B])
        -> rewards[B] float32
where `zs` are atomic numbers (0 = padding) and `valid` marks envs whose
reward is actually needed (invalid / stop actions are masked out by the env).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from molgym_tpu.periodic import covalent_radius

RewardFn = Callable[..., jnp.ndarray]

_MAX_Z = 36  # table size covers H..Kr; enough for the molecular design envs


def _sigma_table() -> np.ndarray:
    # LJ minimum at the sum of covalent radii: r_min = 2^(1/6) * sigma.
    r = np.array([2.0 * covalent_radius(z) for z in range(_MAX_Z)], dtype=np.float32)
    return (r / 2.0 ** (1.0 / 6.0)).astype(np.float32)


def make_lennard_jones_reward(epsilon: float = 0.15) -> RewardFn:
    """Batched LJ interaction reward.

    epsilon is in 'Hartree-like' units so reward magnitudes resemble the
    PM6 interaction energies the reference environments are tuned around
    (min_reward = -0.6, reference tools/arg_parser.py:46).
    """
    sigma = jnp.asarray(_sigma_table())

    def reward_fn(positions, zs, new_pos, new_z, valid):
        # pairwise distances from the new atom to every canvas slot
        diff = positions - new_pos[:, None, :]  # [B, N, 3]
        r2 = jnp.sum(diff * diff, axis=-1)  # [B, N]
        mask = zs > 0  # occupied slots
        r2 = jnp.maximum(r2, 1e-4)

        sig_ij = 0.5 * (sigma[jnp.clip(zs, 0, _MAX_Z - 1)] +
                        sigma[jnp.clip(new_z, 0, _MAX_Z - 1)][:, None])  # [B, N]
        s6 = (sig_ij * sig_ij / r2) ** 3
        pair_e = 4.0 * epsilon * (s6 * s6 - s6)  # [B, N]
        interaction = jnp.sum(jnp.where(mask, pair_e, 0.0), axis=-1)  # [B]
        reward = -interaction
        return jnp.where(valid, reward, 0.0).astype(jnp.float32)

    return reward_fn


def make_morse_reward(depth: float = 0.15, a: float = 1.7) -> RewardFn:
    """Batched Morse-potential interaction reward; smoother well than LJ,
    better behaved for RL exploration."""
    r_cov = jnp.asarray(
        np.array([covalent_radius(z) for z in range(_MAX_Z)], dtype=np.float32))

    def reward_fn(positions, zs, new_pos, new_z, valid):
        diff = positions - new_pos[:, None, :]
        r = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-8))
        mask = zs > 0
        r_eq = (r_cov[jnp.clip(zs, 0, _MAX_Z - 1)] +
                r_cov[jnp.clip(new_z, 0, _MAX_Z - 1)][:, None])
        x = jnp.exp(-a * (r - r_eq))
        pair_e = depth * (x * x - 2.0 * x)
        interaction = jnp.sum(jnp.where(mask, pair_e, 0.0), axis=-1)
        return jnp.where(valid, -interaction, 0.0).astype(jnp.float32)

    return reward_fn


def with_solvation_penalty(reward_fn: RewardFn, distance_penalty: float = 0.01) -> RewardFn:
    """Adds the solvation distance penalty -penalty * ||new_pos|| (reference
    SolvationReward, molgym/reward.py:75-100)."""

    def wrapped(positions, zs, new_pos, new_z, valid):
        base = reward_fn(positions, zs, new_pos, new_z, valid)
        dist = jnp.linalg.norm(new_pos, axis=-1)
        return jnp.where(valid, base - distance_penalty * dist, base).astype(jnp.float32)

    return wrapped


def get_minimum_spin_multiplicity(zs: Sequence[int]) -> int:
    """(sum of Z) mod 2 + 1 (reference molgym/reward.py:17-19)."""
    return int(sum(int(z) for z in zs)) % 2 + 1
