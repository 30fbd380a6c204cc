"""Data-parallel scale-out over a jax.sharding.Mesh.

The reference has no distributed backend at all (SURVEY.md §2.2); the TPU-
native scaling story is SPMD data parallelism: env states and rollout batch
sharded along a 'dp' mesh axis, parameters and optimizer state replicated,
gradient reduction compiled into the update by XLA (psum over ICI). One
jitted function runs the WHOLE PPO iteration — rollout scan, GAE, and the
multi-epoch clipped update — so cross-device traffic is only what the
compiler decides it needs (gradient all-reduce + the minibatch gather).

Multi-host extension: the same program runs per host via
jax.distributed.initialize(); the mesh then spans all hosts' devices and the
collectives ride ICI within a slice / DCN across slices. Artifact naming
stays rank-aware (tools/util.py RolloutSaver rank tag).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from molgym_tpu.envs.environment import MolecularEnv
from molgym_tpu.rl.buffer import compute_ppo_data
from molgym_tpu.rl.ppo import PPOConfig, make_optimizer, make_train_fn
from molgym_tpu.rl.rollout import make_rollout_fn


def make_mesh(num_devices: int = 0, axis_name: str = 'dp') -> Mesh:
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name, ))


def make_dp_ppo_iteration(
    env: MolecularEnv,
    agent,
    config: PPOConfig,
    num_envs: int,
    num_steps_per_iter: int,
    mesh: Optional[Mesh] = None,
    axis_name: str = 'dp',
) -> Tuple[Callable, Callable]:
    """Returns (init_fn, iteration_fn):

      init_fn(rng, params) -> (states, opt_state) with device placement
      iteration_fn(params, opt_state, states, rng)
          -> (params, opt_state, states, traj, info)

    iteration_fn is ONE compiled XLA program over the mesh: sharded rollout
    (envs split along dp), GAE + advantage standardization (global), and the
    grad-accumulated clipped update with KL early stop. When mesh is None the
    single-device path is returned (same program, no sharding constraints).
    """
    assert num_steps_per_iter % num_envs == 0
    steps_per_env = num_steps_per_iter // num_envs
    if mesh is not None:
        assert num_envs % mesh.shape[axis_name] == 0, \
            'num_envs must divide evenly across the dp mesh axis'

    optimizer = make_optimizer(config)
    rollout = make_rollout_fn(env, agent, steps_per_env, deterministic=False,
                              jit=False)
    train = make_train_fn(agent, optimizer, config, num_steps_per_iter)

    def shard_env(tree):
        if mesh is None:
            return tree
        return jax.lax.with_sharding_constraint(
            tree, NamedSharding(mesh, P(axis_name)))

    def replicated(tree):
        if mesh is None:
            return tree
        return jax.lax.with_sharding_constraint(tree, NamedSharding(mesh, P()))

    def iteration(params, opt_state, states, rng):
        params = replicated(params)
        states = shard_env(states)
        rng, k_roll, k_train = jax.random.split(rng, 3)
        states, traj = rollout(params, states, k_roll)
        data = compute_ppo_data(traj, config.gamma, config.lam)
        params, opt_state, info = train(params, opt_state, data, k_train)
        return params, opt_state, states, traj, info

    def init_fn(rng, params):
        states = env.init_states(rng, num_envs)
        states = jax.device_put(
            states, NamedSharding(mesh, P(axis_name))) if mesh is not None else states
        opt_state = optimizer.init(params)
        if mesh is not None:
            params_sharding = NamedSharding(mesh, P())
            params = jax.device_put(params, params_sharding)
            opt_state = jax.device_put(opt_state, params_sharding)
        return states, opt_state

    return init_fn, jax.jit(iteration)
