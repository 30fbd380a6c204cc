"""Rollout as a single jitted scan.

Replaces the reference's synchronous Python actor loop (reference
molgym/ppo.py:164-218): policy forward, env step, buffer store and auto-reset
all live inside one `lax.scan` compiled once per (T, B) shape. The bootstrap
value at the cutoff is the value head on the post-rollout observation
(ppo.py:203-206).

Three transports for the reward:
  * make_rollout_fn           — reward inline in the scan (device reward or
                                io_callback bridge)
  * make_host_loop_rollout_fn — serial host-orchestrated loop (policy forward,
                                host reward, state update strictly in order)
  * make_pipelined_host_rollout_fn — host-orchestrated loop that OVERLAPS the
                                host QM reward batch with the next policy
                                forward (SURVEY §7 hard-part 3). Exactness:
                                the next env state depends on the reward only
                                through the `reward < min_reward` termination
                                bit, so the next forward is computed
                                speculatively under the no-low-reward
                                assumption and recomputed (same RNG key) on
                                the rare steps where a low-reward termination
                                actually fired — trajectories are bitwise
                                identical to the serial loop.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

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


def make_host_loop_rollout_fn(env: MolecularEnv, agent,
                              batch_calculator,
                              num_steps_per_env: int,
                              deterministic: bool = False,
                              distance_penalty: float = 0.0) -> Callable:
    """Host-orchestrated rollout for backends without host-callback support
    (e.g. PJRT plugins that reject io_callback): the per-step loop runs in
    Python, with three jitted device phases per step — policy forward,
    validity/reward-input extraction, and the state update — and the batched
    host reward evaluated between them. Same (params, states, rng) ->
    (states, Trajectory) contract as make_rollout_fn.

    With QM rewards costing 10-100 ms per molecule, the extra per-step
    dispatch overhead (~1 ms) is negligible; device-reward configs should use
    the scan rollout instead.
    """
    import numpy as np

    from molgym_tpu.spaces import Observation

    # One jitted call per device phase — each dispatch through a remote/
    # tunneled PJRT backend costs an RTT, so act + reward-input extraction
    # are fused, as are finalize + auto-reset, and all host-bound arrays
    # leave the device in a single transfer.
    def _act_and_inputs(p, states, o, k):
        out = agent.apply(p, o, k, deterministic, method=agent.act)
        stop, valid, needs, zs_atomic, new_z = env.reward_inputs(
            states, out.element, out.position)
        return out, stop, valid, needs, zs_atomic, new_z

    def _finalize_and_reset(states, element, position, stop, valid, rewards):
        result = env.finalize_step(states, element, position, stop, valid,
                                   rewards)
        next_states, next_obs = env.reset_if_terminal(result.state, result.done)
        return result, next_states, next_obs

    act_and_inputs = jax.jit(_act_and_inputs)
    finalize_and_reset = jax.jit(_finalize_and_reset)
    reset_all = jax.jit(lambda s: jax.vmap(env.reset)(s))

    def rollout(params, states, rng):
        states, obs = reset_all(states)
        obs_seq, next_obs_seq, act_seq = [], [], []
        rew_seq, term_seq, val_seq, logp_seq = [], [], [], []
        for _t in range(num_steps_per_env):
            rng, key = jax.random.split(rng)
            out, stop, valid, needs, zs_atomic, new_z = act_and_inputs(
                params, states, obs, key)
            zs_np, pos_np, n_np, newz_np, newpos_np, needs_np = jax.device_get(
                (zs_atomic, states.positions, states.n_atoms, new_z,
                 out.position, needs))
            rewards = batch_calculator.batch_reward(
                zs_np, np.asarray(pos_np, np.float64), n_np, newz_np,
                np.asarray(newpos_np, np.float64), needs_np)
            if distance_penalty:
                dist = np.linalg.norm(np.asarray(newpos_np, np.float64), axis=-1)
                rewards = rewards - distance_penalty * dist * needs_np
            result, next_states, next_obs = finalize_and_reset(
                states, out.element, out.position, stop, valid,
                jnp.asarray(rewards, jnp.float32))
            obs_seq.append(obs)
            next_obs_seq.append(result.observation)
            act_seq.append(out.action_flat)
            rew_seq.append(result.reward)
            term_seq.append(result.done)
            val_seq.append(out.v)
            logp_seq.append(out.logp)
            states, obs = next_states, next_obs

        rng, key = jax.random.split(rng)
        final_out = act_and_inputs(params, states, obs, key)[0]

        stack = lambda xs: jnp.stack(xs, axis=0)
        obs_stacked = Observation(
            elements=stack([o.elements for o in obs_seq]),
            positions=stack([o.positions for o in obs_seq]),
            bag=stack([o.bag for o in obs_seq]))
        next_obs_stacked = Observation(
            elements=stack([o.elements for o in next_obs_seq]),
            positions=stack([o.positions for o in next_obs_seq]),
            bag=stack([o.bag for o in next_obs_seq]))
        traj = Trajectory(obs=obs_stacked, next_obs=next_obs_stacked,
                          actions=stack(act_seq), rewards=stack(rew_seq),
                          terminals=stack(term_seq), values=stack(val_seq),
                          logps=stack(logp_seq),
                          bootstrap_value=final_out.v)
        return states, traj

    return rollout


def make_pipelined_host_rollout_fn(env: MolecularEnv, agent,
                                   batch_calculator,
                                   num_steps_per_env: int,
                                   deterministic: bool = False,
                                   distance_penalty: float = 0.0) -> Callable:
    """Host rollout with the QM reward batch overlapped against the next
    policy forward (see module docstring for the exactness argument).

    Per step: submit the reward batch to a worker thread (the ctypes call
    releases the GIL; the C++ pool fans out over cores), then enqueue the
    speculative next-state update and the next policy forward on the device,
    then join the reward and finalize. The device works while the host
    computes; the critical path is max(forward, reward) instead of their sum.
    A recompute (one extra forward, same RNG key) happens only on steps where
    some env terminated via `reward < min_reward` — exact-parity fixup.
    """
    import numpy as np

    from molgym_tpu.spaces import Observation

    # Device phases are fused to minimize per-step dispatches (each one costs
    # an RTT on remote/tunneled PJRT backends): reward-input extraction stays
    # its own small call (the host reward must start before the big forward
    # finishes), the speculative advance + next policy forward are one call,
    # and finalize + auto-reset are one call. All host-bound arrays leave the
    # device in a single transfer.
    act = jax.jit(lambda p, o, k: agent.apply(p, o, k, deterministic,
                                              method=agent.act))
    reward_inputs = jax.jit(env.reward_inputs)
    reset_all = jax.jit(lambda s: jax.vmap(env.reset)(s))

    def _spec_advance_act(p, states, element, position, stop, valid, k):
        # reward=0 never trips `reward < min_reward` (min_reward < 0), so this
        # is exactly finalize+reset under the no-low-termination assumption —
        # bitwise equal to the real next observation whenever no env went low.
        result = env.finalize_step(states, element, position, stop, valid,
                                   jnp.zeros_like(stop, jnp.float32))
        _prov_states, prov_obs = env.reset_if_terminal(result.state,
                                                       result.done)
        return agent.apply(p, prov_obs, k, deterministic, method=agent.act)

    def _finalize_and_reset(states, element, position, stop, valid, rewards):
        result = env.finalize_step(states, element, position, stop, valid,
                                   rewards)
        next_states, next_obs = env.reset_if_terminal(result.state, result.done)
        return result, next_states, next_obs

    spec_advance_act = jax.jit(_spec_advance_act)
    finalize_and_reset = jax.jit(_finalize_and_reset)

    executor = ThreadPoolExecutor(max_workers=1,
                                  thread_name_prefix='mg_reward')

    def compute_reward(zs_atomic, positions, n_atoms, new_z, new_pos, needs):
        rewards = batch_calculator.batch_reward(zs_atomic, positions, n_atoms,
                                                new_z, new_pos, needs)
        if distance_penalty:
            dist = np.linalg.norm(new_pos, axis=-1)
            rewards = rewards - distance_penalty * dist * needs
        return rewards

    def rollout(params, states, rng):
        states, obs = reset_all(states)
        obs_seq, next_obs_seq, act_seq = [], [], []
        rew_seq, term_seq, val_seq, logp_seq = [], [], [], []

        rng, key = jax.random.split(rng)
        out = act(params, obs, key)
        for t in range(num_steps_per_env):
            stop, valid, needs, zs_atomic, new_z = reward_inputs(
                states, out.element, out.position)
            # materialize host inputs (one transfer), hand off to the worker
            zs_np, pos_np, n_np, newz_np, newpos_np, needs_np = jax.device_get(
                (zs_atomic, states.positions, states.n_atoms, new_z,
                 out.position, needs))
            future = executor.submit(
                compute_reward, zs_np, np.asarray(pos_np, np.float64), n_np,
                newz_np, np.asarray(newpos_np, np.float64), needs_np)
            last = t + 1 == num_steps_per_env
            if not last:
                # speculative device work, overlapped with the host reward
                rng, next_key = jax.random.split(rng)
                out_next = spec_advance_act(params, states, out.element,
                                            out.position, stop, valid,
                                            next_key)
            rewards = future.result()
            result, next_states, next_obs = finalize_and_reset(
                states, out.element, out.position, stop, valid,
                jnp.asarray(rewards, jnp.float32))
            obs_seq.append(obs)
            next_obs_seq.append(result.observation)
            act_seq.append(out.action_flat)
            rew_seq.append(result.reward)
            term_seq.append(result.done)
            val_seq.append(out.v)
            logp_seq.append(out.logp)
            if not last:
                if bool(((rewards < env.min_reward) & (needs_np > 0)).any()):
                    # a low-reward termination fired: the speculative forward
                    # saw the wrong observation for those envs — recompute
                    # with the SAME key (trajectory stays seeded-identical)
                    out_next = act(params, next_obs, next_key)
                out = out_next
            states, obs = next_states, next_obs

        rng, key = jax.random.split(rng)
        final_out = act(params, obs, key)

        stack = lambda xs: jnp.stack(xs, axis=0)
        obs_stacked = Observation(
            elements=stack([o.elements for o in obs_seq]),
            positions=stack([o.positions for o in obs_seq]),
            bag=stack([o.bag for o in obs_seq]))
        next_obs_stacked = Observation(
            elements=stack([o.elements for o in next_obs_seq]),
            positions=stack([o.positions for o in next_obs_seq]),
            bag=stack([o.bag for o in next_obs_seq]))
        traj = Trajectory(obs=obs_stacked, next_obs=next_obs_stacked,
                          actions=stack(act_seq), rewards=stack(rew_seq),
                          terminals=stack(term_seq), values=stack(val_seq),
                          logps=stack(logp_seq),
                          bootstrap_value=final_out.v)
        return states, traj

    return rollout


class AutoTransportRollout:
    """Measured A/B selection between host-loop transports.

    With the geometry-keyed host energy cache, cheap rewards (EHT) make the
    SERIAL loop faster (fewer device dispatches per step) while expensive
    rewards (PM6 SCF) favor the PIPELINED loop (QM batch overlaps the next
    policy forward) — so a static default picks the loser for one of them.
    This wrapper runs each transport once to compile (calls 0-1), once warm
    to time it (calls 2-3), then locks in the faster transport for the rest
    of training. Both transports produce bitwise-identical trajectories
    (make_pipelined_host_rollout_fn docstring), so switching mid-training is
    semantics-free.

    `fns` maps transport name -> rollout fn with the (params, states, rng)
    -> (states, Trajectory) contract; insertion order sets the probe order.
    """

    def __init__(self, fns):
        import collections
        self._fns = collections.OrderedDict(fns)
        assert len(self._fns) >= 2
        self._order = list(self._fns)
        self._calls = 0
        self._times = {}
        self.choice = None

    def current_transport(self) -> str:
        if self.choice is not None:
            return self.choice
        return self._order[self._calls % len(self._order)]

    def __call__(self, params, states, rng):
        import logging
        import time as _time

        if self.choice is not None:
            return self._fns[self.choice](params, states, rng)
        name = self.current_transport()
        warm = self._calls >= len(self._order)
        t0 = _time.perf_counter()
        out_states, traj = self._fns[name](params, states, rng)
        traj = jax.block_until_ready(traj)
        if warm:  # first pass per transport is compile+run; don't score it
            self._times[name] = _time.perf_counter() - t0
        self._calls += 1
        if len(self._times) == len(self._order):
            self.choice = min(self._times, key=self._times.__getitem__)
            timing = ', '.join(f'{n}: {t * 1e3:.0f} ms'
                               for n, t in self._times.items())
            logging.info(f'host-reward transport auto-selected '
                         f'{self.choice!r} ({timing})')
        return out_states, traj


def make_auto_host_rollout_fn(env: MolecularEnv, agent, batch_calculator,
                              num_steps_per_env: int,
                              deterministic: bool = False,
                              distance_penalty: float = 0.0
                              ) -> AutoTransportRollout:
    """Auto-selecting host-loop rollout: measures pipelined vs serial on the
    first warm iterations and keeps the winner (VERDICT r02 item 6)."""
    common = dict(deterministic=deterministic,
                  distance_penalty=distance_penalty)
    return AutoTransportRollout({
        'pipelined': make_pipelined_host_rollout_fn(
            env, agent, batch_calculator, num_steps_per_env, **common),
        'serial': make_host_loop_rollout_fn(
            env, agent, batch_calculator, num_steps_per_env, **common),
    })
