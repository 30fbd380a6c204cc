"""End-to-end RL slice tests: agent consistency, rollout, PPO update, learning
smoke on the device LJ reward (the integration coverage the reference lacks,
SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molgym_tpu.agents.internal import make_mlp_internal_agent
from molgym_tpu.envs.environment import MolecularEnv
from molgym_tpu.envs.reward import make_lennard_jones_reward
from molgym_tpu.formula import string_to_formula
from molgym_tpu.rl.buffer import compute_ppo_data, episode_stats
from molgym_tpu.rl.ppo import PPOConfig, batch_ppo, make_optimizer, make_train_fn
from molgym_tpu.rl.rollout import make_rollout_fn
from molgym_tpu.spaces import ObservationSpace


def build(formula='H2O', zs=(0, 1, 8), canvas_size=4, width=32):
    space = ObservationSpace(canvas_size=canvas_size, zs=list(zs))
    formulas = np.stack([space.bag_from_formula(string_to_formula(formula))])
    env = MolecularEnv(reward_fn=make_lennard_jones_reward(),
                       observation_space=space, formulas=formulas)
    agent = make_mlp_internal_agent(num_zs=len(zs), canvas_size=canvas_size,
                                    network_width=width)
    rng = jax.random.PRNGKey(0)
    states = env.init_states(rng, 2)
    obs = states.observation()
    params = agent.init(rng, obs, rng, method=agent.act)
    return env, agent, params, space


class TestAgent:
    @pytest.mark.slow
    def test_act_shapes(self):
        env, agent, params, _ = build()
        states = env.init_states(jax.random.PRNGKey(0), 3)
        obs = states.observation()
        out = agent.apply(params, obs, jax.random.PRNGKey(1), False, method=agent.act)
        assert out.action_flat.shape == (3, 7)
        assert out.element.shape == (3, )
        assert out.position.shape == (3, 3)
        assert out.logp.shape == out.ent.shape == out.v.shape == (3, )

    @pytest.mark.slow
    def test_evaluate_consistent_with_act(self):
        """logp/v from evaluate(actions) must equal those from act."""
        env, agent, params, _ = build()
        states = env.init_states(jax.random.PRNGKey(0), 4)
        # take a step so the canvas is non-trivial
        out = agent.apply(params, states.observation(), jax.random.PRNGKey(1),
                          False, method=agent.act)
        result = env.step(states, out.element, out.position)
        obs = result.state.observation()
        out2 = agent.apply(params, obs, jax.random.PRNGKey(2), False, method=agent.act)
        logp, ent, v = agent.apply(params, obs, out2.action_flat, method=agent.evaluate)
        np.testing.assert_allclose(logp, out2.logp, atol=1e-5)
        np.testing.assert_allclose(ent, out2.ent, atol=1e-5)
        np.testing.assert_allclose(v, out2.v, atol=1e-5)

    @pytest.mark.slow
    def test_element_respects_bag(self):
        env, agent, params, space = build('H2O')
        states = env.init_states(jax.random.PRNGKey(0), 16)
        obs = states.observation()
        out = agent.apply(params, obs, jax.random.PRNGKey(3), False, method=agent.act)
        elements = np.asarray(out.element)
        bags = np.asarray(obs.bag)
        for i, e in enumerate(elements):
            assert bags[i, e] > 0

    def test_greedy_deterministic(self):
        env, agent, params, _ = build()
        states = env.init_states(jax.random.PRNGKey(0), 2)
        obs = states.observation()
        o1 = agent.apply(params, obs, jax.random.PRNGKey(1), True, method=agent.act)
        o2 = agent.apply(params, obs, jax.random.PRNGKey(2), True, method=agent.act)
        np.testing.assert_allclose(o1.action_flat[:, 1:3], o2.action_flat[:, 1:3])
        np.testing.assert_allclose(o1.position, o2.position, atol=1e-6)


class TestRollout:
    def test_rollout_shapes_and_autoreset(self):
        env, agent, params, _ = build()
        rollout = make_rollout_fn(env, agent, num_steps_per_env=8)
        states = env.init_states(jax.random.PRNGKey(0), 2)
        states, traj = rollout(params, states, jax.random.PRNGKey(1))
        assert traj.rewards.shape == (8, 2)
        assert traj.actions.shape == (8, 2, 7)
        assert traj.bootstrap_value.shape == (2, )
        # with canvas 4 and bag of 3 atoms, episodes must terminate within 8 steps
        assert np.asarray(traj.terminals).any()

    def test_ppo_data(self):
        env, agent, params, _ = build()
        rollout = make_rollout_fn(env, agent, num_steps_per_env=8)
        states = env.init_states(jax.random.PRNGKey(0), 2)
        _, traj = rollout(params, states, jax.random.PRNGKey(1))
        data = compute_ppo_data(traj, gamma=1.0, lam=0.97)
        assert data['act'].shape == (16, 7)
        assert data['adv'].shape == (16, )
        np.testing.assert_allclose(float(jnp.mean(data['adv'])), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(jnp.std(data['adv'])), 1.0, atol=1e-4)


class TestEpisodeStats:
    def test_discounted_returns(self):
        rewards = np.array([[1.0], [1.0], [1.0], [2.0]])
        terminals = np.array([[False], [True], [False], [False]])
        returns, lengths = episode_stats(rewards, terminals, gamma=0.5)
        assert returns == [1.5]
        assert lengths == [2]

    def test_matches_loop_oracle(self):
        """Vectorized segment-sum implementation vs the straightforward
        per-element loop (the reference's buffer_container.py:52-56 shape)."""

        def loop_oracle(rewards, terminals, gamma):
            T, B = rewards.shape
            returns, lengths = [], []
            for b in range(B):
                acc, disc, length = 0.0, 1.0, 0
                for t in range(T):
                    acc += disc * float(rewards[t, b])
                    disc *= gamma
                    length += 1
                    if terminals[t, b]:
                        returns.append(acc)
                        lengths.append(length)
                        acc, disc, length = 0.0, 1.0, 0
            return returns, lengths

        rng = np.random.default_rng(0)
        for gamma in (1.0, 0.9):
            for _ in range(5):
                T, B = int(rng.integers(1, 12)), int(rng.integers(1, 6))
                rewards = rng.normal(size=(T, B))
                terminals = rng.random((T, B)) < 0.3
                got_r, got_l = episode_stats(rewards, terminals, gamma)
                exp_r, exp_l = loop_oracle(rewards, terminals, gamma)
                np.testing.assert_allclose(got_r, exp_r, atol=1e-12)
                assert got_l == exp_l

    def test_empty(self):
        returns, lengths = episode_stats(np.zeros((0, 3)), np.zeros((0, 3), bool), 1.0)
        assert returns == [] and lengths == []


class TestTrain:
    @pytest.mark.slow
    def test_update_changes_params_and_stops_on_kl(self):
        env, agent, params, _ = build()
        config = PPOConfig(mini_batch_size=6, max_num_train_iters=3,
                           learning_rate=1e-3, gamma=1.0)
        rollout = make_rollout_fn(env, agent, num_steps_per_env=8)
        states = env.init_states(jax.random.PRNGKey(0), 2)
        _, traj = rollout(params, states, jax.random.PRNGKey(1))
        data = compute_ppo_data(traj, config.gamma, config.lam)
        optimizer = make_optimizer(config)
        opt_state = optimizer.init(params)
        train_fn = make_train_fn(agent, optimizer, config, num_samples=16)
        new_params, _, info = train_fn(params, opt_state, data, jax.random.PRNGKey(2))
        assert int(info['num_opt_steps']) >= 1
        # params changed
        diff = sum(float(jnp.sum(jnp.abs(x))) for x in
                   jax.tree.leaves(jax.tree.map(jnp.subtract, new_params, params)))
        assert diff > 0
        assert np.isfinite(info['total_loss'])

    @pytest.mark.slow
    def test_minibatch_remainder_handled(self):
        # num_samples=16, mb=5 -> 3 full + remainder 1 (padded, weight-masked)
        env, agent, params, _ = build()
        config = PPOConfig(mini_batch_size=5, max_num_train_iters=1, gamma=1.0)
        rollout = make_rollout_fn(env, agent, num_steps_per_env=8)
        states = env.init_states(jax.random.PRNGKey(0), 2)
        _, traj = rollout(params, states, jax.random.PRNGKey(1))
        data = compute_ppo_data(traj, config.gamma, config.lam)
        optimizer = make_optimizer(config)
        train_fn = make_train_fn(agent, optimizer, config, num_samples=16)
        _, _, info = train_fn(params, optimizer.init(params), data,
                              jax.random.PRNGKey(2))
        assert np.isfinite(info['total_loss'])


@pytest.mark.slow
class TestLearningSmoke:
    def test_return_improves_on_lj(self, tmp_path):
        """Mini end-to-end training run: H2 on the LJ surrogate; the mean
        return over the last iterations must beat the first iterations."""
        space = ObservationSpace(canvas_size=3, zs=[0, 8])
        formulas = np.stack([space.bag_from_formula(string_to_formula('O2'))])
        env = MolecularEnv(reward_fn=make_lennard_jones_reward(),
                           observation_space=space, formulas=formulas)
        agent = make_mlp_internal_agent(num_zs=2, canvas_size=3,
                                        network_width=32,
                                        min_max_distance=(1.0, 1.8))
        rng = jax.random.PRNGKey(0)
        states = env.init_states(rng, 8)
        params = agent.init(rng, states.observation(), rng, method=agent.act)

        from molgym_tpu.tools.util import InfoSaver
        saver = InfoSaver(directory=str(tmp_path), tag='smoke_run-0')
        config = PPOConfig(gamma=1.0, lam=0.97, learning_rate=3e-3,
                           entropy_coef=0.01, mini_batch_size=64,
                           max_num_train_iters=7)
        batch_ppo(env, None, agent, params, num_envs=8, config=config,
                  max_num_steps=1280, num_steps_per_iter=128,
                  info_saver=saver, seed=0)

        import json
        rows = [json.loads(line) for line in
                open(tmp_path / 'smoke_run-0_train.txt')]
        returns = [r['return_mean'] for r in rows]
        assert len(returns) == 10
        assert np.mean(returns[-3:]) > np.mean(returns[:3]) - 0.05


class TestSampledEval:
    def test_eval_sample_k_reports_per_formula_best(self, tmp_path):
        """eval_sample_k > 0 opts into sampled evaluation (K episodes per
        eval formula) with a return_best_mean field — the documented
        mitigation for the greedy-mode pathology (experiments/
        stochastic_pm6/README.md). Best-of-K must dominate the sample mean
        by construction."""
        import json

        space = ObservationSpace(canvas_size=3, zs=[0, 8])
        formulas = np.stack([space.bag_from_formula(string_to_formula('O2'))])
        env = MolecularEnv(reward_fn=make_lennard_jones_reward(),
                           observation_space=space, formulas=formulas)
        agent = make_mlp_internal_agent(num_zs=2, canvas_size=3,
                                        network_width=16,
                                        min_max_distance=(1.0, 1.8))
        rng = jax.random.PRNGKey(0)
        states = env.init_states(rng, 4)
        params = agent.init(rng, states.observation(), rng, method=agent.act)

        from molgym_tpu.tools.util import InfoSaver
        saver = InfoSaver(directory=str(tmp_path), tag='sk_run-0')
        config = PPOConfig(mini_batch_size=32, max_num_train_iters=2)
        batch_ppo(env, env, agent, params, num_envs=4, config=config,
                  max_num_steps=128, num_steps_per_iter=64, eval_freq=1,
                  num_eval_episodes=1, eval_sample_k=4,
                  info_saver=saver, seed=0)

        rows = [json.loads(line) for line in open(tmp_path / 'sk_run-0_eval.txt')]
        assert rows, 'no eval records written'
        for r in rows:
            assert 'return_best_mean' in r
            assert r['return_best_mean'] >= r['return_mean'] - 1e-9
