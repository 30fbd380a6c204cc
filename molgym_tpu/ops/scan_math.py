"""Sequence math as XLA scans.

Replaces the reference's scipy.signal.lfilter discounted cumulative sum
(reference molgym/tools/util.py:72-87) with a reverse `lax.scan`, and adds a
terminal-aware GAE that reproduces the per-trajectory `finish_path` semantics
(reference molgym/buffer.py:54-95, molgym/buffer_container.py:41-65) on fixed
[T, B] arrays.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def discount_cumsum(x: jnp.ndarray, discount: float) -> jnp.ndarray:
    """y_t = sum_{k>=t} discount^(k-t) x_k along axis 0."""

    def step(carry, xt):
        carry = xt + discount * carry
        return carry, carry

    init = jnp.zeros_like(x[0])
    _, ys = jax.lax.scan(step, init, x, reverse=True)
    return ys


def gae_advantages(
    rewards: jnp.ndarray,  # [T, B]
    values: jnp.ndarray,  # [T, B]
    terminals: jnp.ndarray,  # [T, B] bool: episode ended at step t
    bootstrap_value: jnp.ndarray,  # [B] V(s_T) at rollout cutoff
    gamma: float,
    lam: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GAE(lambda) advantages and discounted returns with per-step resets.

    Semantics match the reference exactly: a terminal at step t closes the
    trajectory with bootstrap 0 (buffer_container.py:52-56); the rollout
    cutoff closes open trajectories with V(s_T) (ppo.py:203-206). Returns are
    the gamma-discounted reward-to-go with the same bootstraps
    (buffer.py:73-88).
    """
    terminals = terminals.astype(rewards.dtype)
    not_term = 1.0 - terminals

    # v_{t+1} per step: next value inside the segment, bootstrap at cutoff,
    # zero across terminals.
    next_values = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    next_values = next_values * not_term

    deltas = rewards + gamma * next_values - values

    def adv_step(carry, inp):
        delta_t, nt = inp
        carry = delta_t + gamma * lam * nt * carry
        return carry, carry

    _, adv = jax.lax.scan(adv_step, jnp.zeros_like(bootstrap_value),
                          (deltas, not_term), reverse=True)

    # Discounted reward-to-go with bootstrap_value at the cutoff only: seed
    # the reverse scan with bootstrap_value; terminals cut the recursion.
    def ret_step2(carry, inp):
        r_t, nt = inp
        carry = r_t + gamma * nt * carry
        return carry, carry

    _, ret = jax.lax.scan(ret_step2, bootstrap_value, (rewards, not_term),
                          reverse=True)

    return adv, ret
