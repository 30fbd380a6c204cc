"""Actor-critic interface.

The reference exposes one `step(observations, actions=None)` method whose
behavior depends on `self.training` and whether actions are given (reference
molgym/agents/base.py:10-19, used at ppo.py:188 and ppo.py:28). Under jit that
dynamic dispatch becomes two statically compiled paths:

  * act(params, obs, rng, deterministic)  — sampling (rollout / greedy eval)
  * evaluate(params, obs, action_flat)    — log-prob/entropy/value re-eval
                                            for the PPO ratio

Agents are flax.linen modules; `action_flat` is the agent's flat sub-action
array (the reference's `a`), and `element`/`position` are the environment
action derived on device (the reference's `actions` list, converted per-obs on
host at agents/internal/agent.py:91-110 — here it never leaves the device).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AgentOutput:
    action_flat: jnp.ndarray  # float32[B, A] flat sub-actions
    element: jnp.ndarray  # int32[B] element index (into zs)
    position: jnp.ndarray  # float32[B, 3] Cartesian placement
    logp: jnp.ndarray  # float32[B]
    ent: jnp.ndarray  # float32[B]
    v: jnp.ndarray  # float32[B]


class ActorCritic:
    """Protocol — agents implement (as flax modules with method= dispatch):

    .init_params(rng, example_obs) -> params
    .act(params, obs, rng, deterministic) -> AgentOutput
    .evaluate(params, obs, action_flat) -> (logp, ent, v)
    .num_subactions: int
    """
