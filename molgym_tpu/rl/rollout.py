"""Rollout as a single jitted scan.

Replaces the reference's synchronous Python actor loop (reference
molgym/ppo.py:164-218): policy forward, env step, buffer store and auto-reset
all live inside one `lax.scan` compiled once per (T, B) shape. The bootstrap
value at the cutoff is the value head on the post-rollout observation
(ppo.py:203-206).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax

from molgym_tpu.envs.environment import EnvState, MolecularEnv
from molgym_tpu.rl.buffer import Trajectory


def make_rollout_fn(env: MolecularEnv, agent, num_steps_per_env: int,
                    deterministic: bool = False, jit: bool = True) -> Callable:
    """Returns jitted rollout(params, states, rng) -> (states, Trajectory).

    Matches reference batch_rollout semantics: all envs are reset at rollout
    start (ppo.py:186), stepped T times with auto-reset at terminals.
    """

    def rollout(params, states: EnvState, rng) -> Tuple[EnvState, Trajectory]:
        states, obs = jax.vmap(env.reset)(states)

        def body(carry, _):
            states, obs, rng = carry
            rng, key = jax.random.split(rng)
            out = agent.apply(params, obs, key, deterministic, method=agent.act)
            result = env.step(states, out.element, out.position)
            transition = (obs, result.observation, out.action_flat,
                          result.reward, result.done, out.v, out.logp)
            next_states, next_obs = env.reset_if_terminal(result.state, result.done)
            return (next_states, next_obs, rng), transition

        (states, final_obs, rng), (obs_seq, next_obs_seq, act_seq, rew_seq,
                                   term_seq, val_seq, logp_seq) = jax.lax.scan(
                                       body, (states, obs, rng), None,
                                       length=num_steps_per_env)

        # Bootstrap value of the state after the last step (ppo.py:203-206).
        rng, key = jax.random.split(rng)
        final_out = agent.apply(params, final_obs, key, True, method=agent.act)

        traj = Trajectory(obs=obs_seq, next_obs=next_obs_seq, actions=act_seq,
                          rewards=rew_seq,
                          terminals=term_seq, values=val_seq, logps=logp_seq,
                          bootstrap_value=final_out.v)
        return states, traj

    return jax.jit(rollout) if jit else rollout
