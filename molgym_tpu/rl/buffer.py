"""Trajectory storage and PPO data preparation.

The reference keeps ragged per-env Python lists (reference molgym/buffer.py)
merged across envs before training (buffer_container.py:67-75). Here a rollout
is a fixed [T, B] pytree written by `lax.scan`; GAE with per-step terminal
resets reproduces the per-trajectory `finish_path` semantics exactly
(validated in tests/test_ops.py against a reference port), and `get_data`
flattens to [T*B] with advantage standardization (buffer.py:97-116).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from molgym_tpu.ops.scan_math import gae_advantages
from molgym_tpu.spaces import Observation


@struct.dataclass
class Trajectory:
    obs: Observation  # [T, B, ...]
    next_obs: Observation  # [T, B, ...] post-step, pre-reset (buffer.py:16-18)
    actions: jnp.ndarray  # float32[T, B, A]
    rewards: jnp.ndarray  # float32[T, B]
    terminals: jnp.ndarray  # bool[T, B]
    values: jnp.ndarray  # float32[T, B]
    logps: jnp.ndarray  # float32[T, B]
    bootstrap_value: jnp.ndarray  # float32[B]

    @property
    def num_steps(self) -> int:
        return self.rewards.shape[0] * self.rewards.shape[1]


def compute_ppo_data(traj: Trajectory, gamma: float, lam: float) -> Dict[str, jnp.ndarray]:
    """GAE + returns + flatten + advantage standardization (jit-safe)."""
    adv, ret = gae_advantages(traj.rewards, traj.values, traj.terminals,
                              traj.bootstrap_value, gamma, lam)
    adv_flat = adv.reshape(-1)
    adv_std = (adv_flat - jnp.mean(adv_flat)) / jnp.maximum(jnp.std(adv_flat), 1e-8)

    flat_obs = jax.tree.map(lambda x: x.reshape((-1, ) + x.shape[2:]), traj.obs)
    return dict(
        obs=flat_obs,
        act=traj.actions.reshape((-1, ) + traj.actions.shape[2:]),
        ret=ret.reshape(-1),
        adv=adv_std,
        logp=traj.logps.reshape(-1),
    )


def buffer_stats(traj: Trajectory) -> Dict[str, float]:
    """Value/logp statistics (reference ppo.py:221-227)."""
    values = np.asarray(traj.values)
    logps = np.asarray(traj.logps)
    return {
        'value_mean': float(values.mean()),
        'value_std': float(values.std()),
        'logp_mean': float(logps.mean()),
        'logp_std': float(logps.std()),
    }


def episode_stats(rewards: np.ndarray, terminals: np.ndarray,
                  gamma: float) -> Tuple[List[float], List[int]]:
    """Episodic (discounted) returns and lengths for episodes that TERMINATE
    inside the rollout — the reference records returns only at terminals
    (buffer_container.py:52-56); truncated episodes are excluded.

    Vectorized with segment sums (no per-element Python loop): episodes are
    the terminal-delimited segments of each env column; a segment's return is
    sum_t gamma^(t - segment_start) * r_t over the segment. Output order
    matches the loop formulation: env-major, then time.
    """
    rewards = np.asarray(rewards, dtype=np.float64)
    terminals = np.asarray(terminals, dtype=bool)
    T, B = rewards.shape
    if T == 0 or B == 0:
        return [], []
    t_idx = np.arange(T)[:, None]
    # segment id within each column: exclusive cumulative terminal count
    seg = np.zeros((T, B), dtype=np.int64)
    seg[1:] = np.cumsum(terminals[:-1], axis=0)
    # segment start row: last row at-or-before t that begins a segment
    is_start = np.zeros((T, B), dtype=bool)
    is_start[0] = True
    is_start[1:] = terminals[:-1]
    start_t = np.maximum.accumulate(np.where(is_start, t_idx, -1), axis=0)
    contrib = rewards * np.power(gamma, t_idx - start_t)
    # global segment id: env-major so bincount order matches the reference
    gseg = (seg + np.arange(B)[None, :] * (T + 1)).ravel()
    n_bins = B * (T + 1)
    seg_return = np.bincount(gseg, weights=contrib.ravel(), minlength=n_bins)
    seg_length = np.bincount(gseg, minlength=n_bins)
    seg_done = np.bincount(gseg, weights=terminals.ravel(),
                           minlength=n_bins) > 0
    return (seg_return[seg_done].tolist(),
            seg_length[seg_done].astype(int).tolist())
