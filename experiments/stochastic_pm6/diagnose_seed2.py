"""Diagnose the seed-2 greedy-eval collapse (VERDICT r04 next #7).

Observation from the committed logs (results/stochpm6_run-2_*.txt): seed 2's
TRAINING is healthy through all 50 iterations — episode length ~5 on the
random 4-9 bags, positive returns, entropy/KL/clip in the same band as seeds
1/3 — but its GREEDY eval on the fixed 9-atom C2H6O bag terminates at 3-4
atoms from the FIRST eval (step 140) onward. That rules out a training-time
collapse at some point; the question is what the greedy (deterministic)
policy does differently from the sampled one at the eval states.

This script loads the committed seed checkpoints and, per seed, rolls the
eval episode on the fixed C2H6O bag both greedily and with sampling
(N keys), on CPU with the device LJ surrogate reward (termination is
geometry/bag-driven and identical across reward backends; only the reward
VALUES differ). For the greedy episode it prints the per-step action
decomposition — element chosen, focus atom, distance, resulting done flag —
so the terminating action is visible.

Run: python experiments/stochastic_pm6/diagnose_seed2.py [--seeds 1 2 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def load_agent_and_params(config, seed):
    from molgym_tpu.envs.environment import MolecularEnv
    from molgym_tpu.formula import string_to_formula
    from molgym_tpu.rl.ppo import PPOConfig, make_optimizer
    from molgym_tpu.spaces import (ActionSpace, ObservationSpace,
                                   symbols_to_zs)
    from molgym_tpu.tools.model_io import ModelIO
    from molgym_tpu.tools.model_util import build_model

    zs = symbols_to_zs(config['symbols'])
    space = ObservationSpace(canvas_size=config['canvas_size'], zs=zs)
    ActionSpace(zs=zs)
    # TRUE PM6 reward through the io_callback bridge (CPU supports host
    # callbacks): episode termination depends on the reward VALUE (the
    # reward < min_reward clamp terminates), so an LJ surrogate changes
    # which actions terminate — the diagnosis must run the real surface.
    from molgym_tpu.tools.driver import make_reward_fn
    reward_fn, _, _ = make_reward_fn({'reward': 'pm6'})
    env = MolecularEnv(
        reward_fn=reward_fn,
        observation_space=space,
        formulas=np.stack([space.bag_from_formula(
            string_to_formula(config['formulas']))]))
    agent = build_model(config, space, ActionSpace(zs=zs))
    rng = jax.random.PRNGKey(config['seed'])
    example_obs = env.init_states(rng, 1).observation()
    params = agent.init(rng, example_obs, rng, method=agent.act)

    ppo_config = PPOConfig(
        gamma=config['discount'], lam=config['lam'],
        clip_ratio=config['clip_ratio'], vf_coef=config['vf_coef'],
        entropy_coef=config['entropy_coef'], target_kl=config['target_kl'],
        gradient_clip=config['gradient_clip'],
        learning_rate=config['learning_rate'],
        max_num_train_iters=config['max_num_train_iters'],
        mini_batch_size=config['mini_batch_size'])
    optimizer = make_optimizer(ppo_config)
    handler = ModelIO(directory=os.path.join(HERE, 'models'),
                      tag=f'stochpm6_run-{seed}')
    template = {'params': params, 'opt_state': optimizer.init(params)}
    state, steps = handler.load_latest(template=template)
    return env, agent, state['params'], steps


def rollout_episode(env, agent, params, key, deterministic):
    """One auto-reset-free episode; returns (length, ret, step rows)."""
    states = env.init_states(key, 1)
    rows = []
    total = 0.0
    act = jax.jit(lambda p, o, k, det: agent.apply(
        p, o, k, det, method=agent.act), static_argnums=3)
    for t in range(env.canvas_size + 1):
        key, akey = jax.random.split(key)
        obs = states.observation()
        out = act(params, obs, akey, deterministic)
        result = env.step(states, out.element, out.position)
        r = float(result.reward[0])
        done = bool(result.done[0])
        # distance from the placed atom to its nearest existing atom — the
        # geometric validity driver (env rejects < min_atomic_distance)
        pos = np.asarray(states.positions[0])
        els = np.asarray(states.elements[0])
        placed = np.asarray(out.position[0])
        if (els != 0).any():
            dmin = float(np.min(np.linalg.norm(
                pos[els != 0] - placed, axis=-1)))
        else:
            dmin = float('nan')
        rows.append({
            't': t,
            'element_index': int(out.element[0]),
            'min_dist_to_canvas': round(dmin, 3),
            'reward': round(r, 3),
            'done': done,
        })
        total += r
        states = result.state
        if done:
            break
    return len(rows), total, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seeds', type=int, nargs='*', default=[1, 2, 3])
    ap.add_argument('--samples', type=int, default=20)
    args = ap.parse_args()

    for seed in args.seeds:
        with open(os.path.join(HERE, 'logs', f'stochpm6_run-{seed}.json')) as f:
            config = json.load(f)
        env, agent, params, steps = load_agent_and_params(config, seed)
        print(f'\n=== seed {seed} (checkpoint at {steps} steps) ===')

        length, ret, rows = rollout_episode(
            env, agent, params, jax.random.PRNGKey(0), deterministic=True)
        print(f'greedy: length={length} return={ret:.3f}')
        for row in rows:
            print('   ', row)

        lengths, rets = [], []
        for i in range(args.samples):
            l, r, _ = rollout_episode(
                env, agent, params, jax.random.PRNGKey(100 + i),
                deterministic=False)
            lengths.append(l)
            rets.append(r)
        print(f'sampled (n={args.samples}): '
              f'length mean={np.mean(lengths):.2f} '
              f'min={min(lengths)} max={max(lengths)}  '
              f'full-episode fraction={np.mean(np.array(lengths) >= 9):.2f}')


if __name__ == '__main__':
    main()
