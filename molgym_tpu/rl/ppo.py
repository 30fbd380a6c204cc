"""Proximal Policy Optimization, fully jitted update.

Faithful to the reference's training semantics (reference molgym/ppo.py):

  * clipped surrogate + value MSE + entropy bonus (ppo.py:18-63)
  * gradients ACCUMULATE across all minibatches of an epoch, with ONE
    clipped optimizer step per epoch (ppo.py:117-148) — a reference quirk
    preserved deliberately for learning-curve parity
  * epoch loop early-stops when mean approx-KL > 1.5 * target_kl, checked
    BEFORE the step (ppo.py:137-140)
  * minibatches are a fresh permutation each epoch; the remainder forms a
    smaller final batch (ppo.py:66-74) — here realized as a padded batch
    with zero sample weights so shapes stay static

but runs as one compiled XLA program: epochs = lax.scan with an `active`
flag instead of `break`, minibatches = inner lax.scan with grad accumulation.
"""
from __future__ import annotations

import logging
import time
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from molgym_tpu.envs.environment import MolecularEnv
from molgym_tpu.rl.buffer import buffer_stats, compute_ppo_data, episode_stats
from molgym_tpu.rl.rollout import (make_auto_host_rollout_fn,
                                   make_host_loop_rollout_fn,
                                   make_pipelined_host_rollout_fn,
                                   make_rollout_fn)


class PPOConfig(NamedTuple):
    gamma: float = 0.99
    lam: float = 0.97
    clip_ratio: float = 0.2
    vf_coef: float = 0.5
    entropy_coef: float = 0.0
    target_kl: float = 0.01
    gradient_clip: float = 0.5
    learning_rate: float = 3e-4
    max_num_train_iters: int = 80
    mini_batch_size: int = 64
    amsgrad: bool = False


def make_optimizer(config: PPOConfig) -> optax.GradientTransformation:
    """clip-by-global-norm + (ams)adam (reference tools/util.py:197-205 +
    ppo.py:144)."""
    adam = optax.amsgrad(config.learning_rate) if config.amsgrad else optax.adam(
        config.learning_rate)
    return optax.chain(optax.clip_by_global_norm(config.gradient_clip), adam)


def host_fetch(tree):
    """Pytree of jax arrays -> host numpy. Under multi-process SPMD
    (--multihost) rollout arrays are sharded over a global mesh and span
    devices other processes own — np.asarray/device_get on them raises;
    process_allgather(tiled=True) reassembles the full global value on every
    host instead (each process contributes its addressable shards)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return multihost_utils.process_allgather(tree, tiled=True)
    return jax.device_get(tree)


def make_loss_fn(agent, config: PPOConfig) -> Callable:
    def loss_fn(params, obs, act, old_logp, adv, ret, weights):
        logp, ent, v = agent.apply(params, obs, act, method=agent.evaluate)

        w = weights / jnp.maximum(jnp.sum(weights), 1.0)
        ratio = jnp.exp(logp - old_logp)
        obj = ratio * adv
        clipped_obj = jnp.clip(ratio, 1 - config.clip_ratio,
                               1 + config.clip_ratio) * adv
        policy_loss = -jnp.sum(w * jnp.minimum(obj, clipped_obj))
        entropy_loss = -config.entropy_coef * jnp.sum(w * ent)
        vf_loss = config.vf_coef * jnp.sum(w * jnp.square(v - ret))
        loss = policy_loss + entropy_loss + vf_loss

        approx_kl = jnp.sum(w * (old_logp - logp))
        clipped = jnp.logical_or(ratio < 1 - config.clip_ratio,
                                 ratio > 1 + config.clip_ratio)
        clip_fraction = jnp.sum(w * clipped.astype(jnp.float32))
        info = dict(policy_loss=policy_loss, entropy_loss=entropy_loss,
                    vf_loss=vf_loss, total_loss=loss, approx_kl=approx_kl,
                    clip_fraction=clip_fraction)
        return loss, info

    return loss_fn


def make_train_fn(agent, optimizer: optax.GradientTransformation,
                  config: PPOConfig, num_samples: int) -> Callable:
    """Returns jitted train(params, opt_state, data, rng) ->
    (params, opt_state, info). num_samples = T * B (static)."""
    loss_fn = make_loss_fn(agent, config)
    grad_fn = jax.grad(loss_fn, has_aux=True)

    mb = min(config.mini_batch_size, num_samples)
    num_full = num_samples // mb
    remainder = num_samples % mb
    num_batches = num_full + (1 if remainder else 0)
    pad = num_batches * mb - num_samples

    def epoch_grads(params, data, rng):
        perm = jax.random.permutation(rng, num_samples)
        # Pad with arbitrary (weight-0) indices so every batch has size mb.
        idx = jnp.concatenate([perm, perm[:pad]]) if pad else perm
        idx = idx.reshape(num_batches, mb)
        weights = jnp.ones((num_batches, mb), jnp.float32)
        if pad:
            weights = weights.at[-1, mb - pad:].set(0.0)

        def mb_step(acc, inp):
            batch_idx, w = inp
            batch = jax.tree.map(lambda x: x[batch_idx], data)
            grads, info = grad_fn(params, batch['obs'], batch['act'],
                                  batch['logp'], batch['adv'], batch['ret'], w)
            acc_grads, acc_info = acc
            acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
            acc_info = jax.tree.map(jnp.add, acc_info, info)
            return (acc_grads, acc_info), None

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        zero_info = dict(policy_loss=0.0, entropy_loss=0.0, vf_loss=0.0,
                         total_loss=0.0, approx_kl=0.0, clip_fraction=0.0)
        zero_info = jax.tree.map(jnp.float32, zero_info)
        (grads, info_sum), _ = jax.lax.scan(mb_step, (zero_grads, zero_info),
                                            (idx, weights))
        info = jax.tree.map(lambda x: x / num_batches, info_sum)
        return grads, info

    def train(params, opt_state, data, rng):
        def run_epoch(carry, epoch_rng):
            params, opt_state, active, num_opt_steps, last_info = carry
            grads, info = epoch_grads(params, data, epoch_rng)
            info['grad_norm'] = optax.global_norm(grads)

            kl_ok = info['approx_kl'] <= 1.5 * config.target_kl

            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)

            params = jax.tree.map(
                lambda new, old: jnp.where(kl_ok, new, old), new_params, params)
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(kl_ok, new, old), new_opt_state,
                opt_state)
            num_opt_steps = num_opt_steps + kl_ok.astype(jnp.int32)
            # Record metrics only for epochs that actually stepped — the
            # reference breaks before logging the violating epoch
            # (ppo.py:138-152).
            last_info = jax.tree.map(
                lambda new, old: jnp.where(kl_ok, new, old), info, last_info)
            return params, opt_state, kl_ok, num_opt_steps, last_info

        def epoch(carry, epoch_rng):
            # After the KL early stop the remaining epochs are true no-ops
            # (reference `break`); lax.cond skips the dead gradient work.
            active = carry[2]
            new_carry = jax.lax.cond(
                active, lambda c: run_epoch(c, epoch_rng), lambda c: c, carry)
            return new_carry, None

        zero_info = dict(policy_loss=0.0, entropy_loss=0.0, vf_loss=0.0,
                         total_loss=0.0, approx_kl=0.0, clip_fraction=0.0,
                         grad_norm=0.0)
        zero_info = jax.tree.map(jnp.float32, zero_info)
        epoch_rngs = jax.random.split(rng, config.max_num_train_iters)
        (params, opt_state, _active, num_opt_steps, info), _ = jax.lax.scan(
            epoch, (params, opt_state, jnp.bool_(True), jnp.int32(0), zero_info),
            epoch_rngs)
        info = dict(info)
        info['num_opt_steps'] = num_opt_steps
        return params, opt_state, info

    # NOTE: no buffer donation — callers (tests, notebooks) legitimately keep
    # the pre-update params to compare against, and the copies are only a few
    # MB for these model sizes.
    return jax.jit(train)


def batch_ppo(
    envs: MolecularEnv,
    eval_envs: Optional[MolecularEnv],
    agent,
    params,
    *,
    opt_state=None,
    num_envs: int,
    num_eval_envs: int = 1,
    config: PPOConfig = PPOConfig(),
    start_num_steps: int = 0,
    max_num_steps: int = 4096,
    num_steps_per_iter: int = 200,
    save_freq: int = 5,
    eval_freq: int = 10,
    num_eval_episodes: int = 1,
    model_handler=None,
    rollout_saver=None,
    save_train_rollout: bool = False,
    save_eval_rollout: bool = True,
    info_saver=None,
    seed: int = 0,
    profile_dir: Optional[str] = None,
    mesh=None,
    host_loop_calculator=None,
    host_distance_penalty: float = 0.0,
    host_loop_pipelined: bool = True,
    host_reward_timer=None,
    eval_sample_k: int = 0,
) -> Any:
    """Top-level PPO loop (reference batch_ppo, ppo.py:230-379): alternate
    jitted rollout and jitted multi-epoch update, with JSONL metrics, periodic
    greedy evaluation and checkpointing on the host.

    eval_sample_k = 0 (default) keeps the reference's greedy (deterministic)
    evaluation protocol. K > 0 opts into SAMPLED evaluation with K episodes
    per eval formula: return_mean/std then describe the sampled-episode
    distribution and an extra `return_best_mean` records the mean over
    formulas of the per-formula best — the mitigation for the greedy-mode
    pathology diagnosed in experiments/stochastic_pm6 (a healthy stochastic
    policy whose argmax at one state is geometrically degenerate scores
    arbitrarily badly under mode decoding)."""
    assert num_steps_per_iter % num_envs == 0, \
        'num_steps_per_iter must be divisible by num_envs (reference ppo.py:172)'
    steps_per_env = num_steps_per_iter // num_envs

    optimizer = make_optimizer(config)
    if opt_state is None:
        opt_state = optimizer.init(params)

    if host_loop_calculator is not None:
        # Host-orchestrated stepping: required on backends without
        # io_callback support. The pipelined variant overlaps the host QM
        # reward batch with the next policy forward, with an exact fixup
        # (rl/rollout.py make_pipelined_host_rollout_fn). 'auto' measures
        # both transports on the first warm iterations and keeps the winner.
        if host_loop_pipelined == 'auto':
            rollout_fn = make_auto_host_rollout_fn(
                envs, agent, host_loop_calculator, steps_per_env,
                deterministic=False, distance_penalty=host_distance_penalty)
        else:
            make_loop = (make_pipelined_host_rollout_fn if host_loop_pipelined
                         else make_host_loop_rollout_fn)
            rollout_fn = make_loop(
                envs, agent, host_loop_calculator, steps_per_env,
                deterministic=False, distance_penalty=host_distance_penalty)
    else:
        rollout_fn = make_rollout_fn(envs, agent, steps_per_env,
                                     deterministic=False)
    data_fn = jax.jit(lambda traj: compute_ppo_data(traj, config.gamma, config.lam))
    train_fn = make_train_fn(agent, optimizer, config, num_steps_per_iter)

    eval_rollout_fn = None
    if eval_envs is not None:
        # Static-shape equivalent of the reference's "roll until num_episodes
        # episodes finish" eval loop (reference ppo.py:164-218): every episode
        # terminates within canvas_size + 1 steps by construction (each step
        # either places an atom — at most canvas_size of them — or terminates
        # the episode), so a scan of this many steps with auto-reset always
        # completes at least the required episodes, of which the first
        # total_eval_episodes are kept (asserted below at use).
        total_eval_episodes = num_eval_episodes * max(1, eval_sample_k)
        eval_deterministic = eval_sample_k == 0
        eval_steps = total_eval_episodes * (eval_envs.canvas_size + 1)
        if host_loop_calculator is not None:
            # Under 'auto' the eval rollout follows whichever transport the
            # training selector picked (or pipelined until it has); the two
            # transports are trajectory-identical, so this is a perf knob.
            if host_loop_pipelined == 'auto':
                def eval_rollout_fn(p, s, k, _cache={}):
                    name = getattr(rollout_fn, 'choice', None) or 'pipelined'
                    if name not in _cache:
                        make_loop = (make_pipelined_host_rollout_fn
                                     if name == 'pipelined'
                                     else make_host_loop_rollout_fn)
                        _cache[name] = make_loop(
                            eval_envs, agent, host_loop_calculator, eval_steps,
                            deterministic=eval_deterministic,
                            distance_penalty=host_distance_penalty)
                    return _cache[name](p, s, k)
            else:
                make_loop = (make_pipelined_host_rollout_fn
                             if host_loop_pipelined
                             else make_host_loop_rollout_fn)
                eval_rollout_fn = make_loop(
                    eval_envs, agent, host_loop_calculator, eval_steps,
                    deterministic=eval_deterministic,
                    distance_penalty=host_distance_penalty)
        else:
            eval_rollout_fn = make_rollout_fn(eval_envs, agent, eval_steps,
                                              deterministic=eval_deterministic)

    rng = jax.random.PRNGKey(seed)
    rng, env_key, eval_key = jax.random.split(rng, 3)
    states = envs.init_states(env_key, num_envs)
    eval_states = (eval_envs.init_states(eval_key, num_eval_envs)
                   if eval_envs is not None else None)

    if mesh is not None:
        # Data-parallel placement: env batch sharded along 'dp', params and
        # optimizer state replicated. The jitted rollout/update programs
        # follow their input shardings, so XLA compiles the gradient
        # all-reduce in (parallel/mesh.py documents the layout).
        from jax.sharding import NamedSharding, PartitionSpec as P
        assert num_envs % mesh.shape['dp'] == 0
        states = jax.device_put(states, NamedSharding(mesh, P('dp')))
        params = jax.device_put(params, NamedSharding(mesh, P()))
        opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))

    total_num_steps = start_num_steps
    num_iterations = (max_num_steps - total_num_steps) // num_steps_per_iter
    logging.info('Starting PPO')

    for iteration in range(num_iterations):
        logging.info(f'Iteration: {iteration}/{num_iterations - 1}, '
                     f'steps: {total_num_steps}')

        # Profile the second iteration (post-compile) when requested
        # (SURVEY.md §5: the reference has no tracing at all).
        if profile_dir and iteration == 1:
            jax.profiler.start_trace(profile_dir)

        # -- training rollout
        t0 = time.time()
        reward_t0 = (host_reward_timer.total_time
                     if host_reward_timer is not None
                     and hasattr(host_reward_timer, 'total_time') else None)
        rng, key = jax.random.split(rng)
        transport = (rollout_fn.current_transport()
                     if hasattr(rollout_fn, 'current_transport') else None)
        states, traj = rollout_fn(params, states, key)
        traj = jax.block_until_ready(traj)
        traj_host = host_fetch(traj)  # global value on every process
        returns, lengths = episode_stats(np.asarray(traj_host.rewards),
                                         np.asarray(traj_host.terminals),
                                         config.gamma)
        train_info = {
            'time': time.time() - t0,
            # wall time spent inside the host reward evaluator this rollout
            # (reference parity: per-reward elapsed_time, reward.py:51-53).
            # Under the pipelined rollout this time overlaps device compute.
            **({'reward_time': host_reward_timer.total_time - reward_t0}
               if reward_t0 is not None else {}),
            'return_mean': float(np.mean(returns)) if returns else float('nan'),
            'return_std': float(np.std(returns)) if returns else float('nan'),
            'episode_length_mean': float(np.mean(lengths)) if lengths else float('nan'),
            'episode_length_std': float(np.std(lengths)) if lengths else float('nan'),
            **({'transport': transport} if transport is not None else {}),
        }
        logging.info(f'Training rollout: return={train_info["return_mean"]:.3f} '
                     f'({train_info["return_std"]:.1f}), episode '
                     f'length={train_info["episode_length_mean"]:.1f}')

        if info_saver:
            train_info['total_num_steps'] = total_num_steps
            train_info.update(buffer_stats(traj_host))
            info_saver.save(train_info, name='train')
        if rollout_saver and save_train_rollout:
            rollout_saver.save(traj_host, num_steps=total_num_steps,
                               info='train')

        # -- optimize
        t0 = time.time()
        data = data_fn(traj)
        rng, key = jax.random.split(rng)
        params, opt_state, opt_info = train_fn(params, opt_state, data, key)
        opt_info = {k: float(np.asarray(v)) for k, v in opt_info.items()}
        opt_info['num_opt_steps'] = int(opt_info['num_opt_steps'])
        opt_info['time'] = time.time() - t0
        logging.info(
            f'Optimization: policy loss={opt_info["policy_loss"]:.3f}, '
            f'vf loss={opt_info["vf_loss"]:.3f}, total loss={opt_info["total_loss"]:.3f}, '
            f'num steps={opt_info["num_opt_steps"]}')
        if info_saver:
            opt_info['total_num_steps'] = total_num_steps
            info_saver.save(opt_info, name='opt')

        if profile_dir and iteration == 1:
            jax.profiler.stop_trace()
            logging.info(f'Wrote profiler trace to {profile_dir}')

        total_num_steps += num_steps_per_iter

        # -- evaluation (greedy)
        if eval_rollout_fn is not None and (
                iteration % eval_freq == 0 or iteration == num_iterations - 1):
            rng, key = jax.random.split(rng)
            eval_params = params
            if mesh is not None and jax.process_count() > 1:
                # eval states/programs are process-local, but params live on
                # the global mesh — pull the (replicated) values to host and
                # rehome them locally so the eval jit stays single-process.
                eval_params = jax.device_put(jax.device_get(params),
                                             jax.local_devices()[0])
            eval_states, eval_traj = eval_rollout_fn(eval_params, eval_states,
                                                     key)
            e_returns, e_lengths = episode_stats(
                np.asarray(eval_traj.rewards), np.asarray(eval_traj.terminals),
                config.gamma)
            assert len(e_returns) >= total_eval_episodes, (
                f'eval scan of {eval_steps} steps completed only '
                f'{len(e_returns)} episodes — the canvas_size+1 episode-length '
                f'bound was violated')
            e_returns = e_returns[:total_eval_episodes]
            e_lengths = e_lengths[:total_eval_episodes]
            eval_info = {
                'return_mean': float(np.mean(e_returns)) if e_returns else float('nan'),
                'return_std': float(np.std(e_returns)) if e_returns else float('nan'),
                'episode_length_mean': float(np.mean(e_lengths)) if e_lengths else float('nan'),
                'episode_length_std': float(np.std(e_lengths)) if e_lengths else float('nan'),
            }
            if eval_sample_k > 0:
                # episodes cycle the eval formulas in order (auto-reset
                # advances formula_cursor), so episode i belongs to formula
                # i % num_eval_episodes; best-of-K per formula, then mean
                per_formula = np.asarray(e_returns).reshape(
                    eval_sample_k, num_eval_episodes)
                eval_info['return_best_mean'] = float(
                    np.mean(per_formula.max(axis=0)))
            logging.info(f'Evaluation rollout: return={eval_info["return_mean"]:.3f} '
                         f'({eval_info["return_std"]:.1f})')
            if info_saver:
                eval_info['total_num_steps'] = total_num_steps
                eval_info.update(buffer_stats(eval_traj))
                info_saver.save(eval_info, name='eval')
            if rollout_saver and save_eval_rollout:
                rollout_saver.save(jax.device_get(eval_traj),
                                   num_steps=total_num_steps, info='eval')

        # -- checkpoint
        if model_handler and (iteration % save_freq == 0
                              or iteration == num_iterations - 1):
            model_handler.save(params, opt_state, num_steps=total_num_steps)

    logging.info('Finished PPO')
    return params, opt_state
