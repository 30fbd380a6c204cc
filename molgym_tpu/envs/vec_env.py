"""Host-facing vectorized environment wrapper.

Mirrors the reference's VecEnv API surface (reference molgym/env_container.py:
reset / step / step_async / step_wait / reset_if_terminal / get_size) on top
of the pure batched `MolecularEnv` functions. The PPO hot loop does NOT go
through this class — it composes the pure functions directly inside
`lax.scan`; this wrapper exists for drivers, notebooks, and tests.
"""
from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from molgym_tpu.envs.environment import EnvState, MolecularEnv
from molgym_tpu.spaces import Observation


class VecEnv:
    def __init__(self, env: MolecularEnv, num_envs: int, seed: int = 0) -> None:
        self.env = env
        self.num_envs = num_envs
        self._states: Optional[EnvState] = None
        self._rng = jax.random.PRNGKey(seed)
        self._actions = None

        self._step = jax.jit(env.step)
        self._reset_if_terminal = jax.jit(env.reset_if_terminal)
        self._init_states = jax.jit(env.init_states, static_argnums=1)

    def get_size(self) -> int:
        return self.num_envs

    @property
    def states(self) -> EnvState:
        assert self._states is not None, 'call reset() first'
        return self._states

    def reset(self) -> Observation:
        self._rng, sub = jax.random.split(self._rng)
        self._states = self._init_states(sub, self.num_envs)
        return self._states.observation()

    def step_async(self, actions) -> None:
        self._actions = actions

    def step_wait(self):
        assert self._actions is not None
        return self.step(self._actions)

    def step(self, actions) -> Tuple[Observation, np.ndarray, np.ndarray, dict]:
        """actions: (element_index int32[B], position float32[B,3]) tuple or
        an object with .element/.position."""
        if hasattr(actions, 'element'):
            element, position = actions.element, actions.position
        else:
            element, position = actions
        start = time.perf_counter()
        result = self._step(self.states, jnp.asarray(element, jnp.int32),
                            jnp.asarray(position, jnp.float32))
        result = jax.block_until_ready(result)
        self._states = result.state
        # wall time of the whole step incl. the reward (reference parity:
        # the info dict's elapsed_time, molgym/reward.py:51-53)
        info = {'elapsed_time': time.perf_counter() - start}
        return (result.observation, np.asarray(result.reward),
                np.asarray(result.done), info)

    def reset_if_terminal(self, dones) -> Observation:
        states, obs = self._reset_if_terminal(self.states, jnp.asarray(dones))
        self._states = states
        return obs
