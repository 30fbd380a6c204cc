"""Host-loop rollout: equivalence with the scan rollout (same calculator, same
rng) — the fallback path for backends without io_callback support."""
import jax
import numpy as np

from molgym_tpu.agents.internal import make_mlp_internal_agent
from molgym_tpu.calculators.native import METHOD_LJ, NativeBatchCalculator
from molgym_tpu.calculators.reward_host import make_host_reward
from molgym_tpu.envs.environment import MolecularEnv
from molgym_tpu.formula import string_to_formula
from molgym_tpu.rl.rollout import make_host_loop_rollout_fn, make_rollout_fn
from molgym_tpu.spaces import ObservationSpace


def build(reward_fn):
    space = ObservationSpace(canvas_size=3, zs=[0, 8])
    formulas = np.stack([space.bag_from_formula(string_to_formula('O2'))])
    return MolecularEnv(reward_fn=reward_fn, observation_space=space,
                        formulas=formulas)


class TestHostLoopRollout:
    def test_matches_io_callback_rollout(self):
        calc = NativeBatchCalculator(method=METHOD_LJ, epsilon=0.15)
        env_cb = build(make_host_reward(calc))
        env_loop = build(make_host_reward(calc))  # reward_fn unused in loop mode

        agent = make_mlp_internal_agent(num_zs=2, canvas_size=3, network_width=16)
        rng = jax.random.PRNGKey(0)
        states = env_cb.init_states(rng, 4)
        params = agent.init(rng, states.observation(), rng, method=agent.act)

        roll_cb = make_rollout_fn(env_cb, agent, num_steps_per_env=6)
        roll_loop = make_host_loop_rollout_fn(env_loop, agent, calc,
                                              num_steps_per_env=6)

        key = jax.random.PRNGKey(7)
        _, traj_cb = roll_cb(params, states, key)
        _, traj_loop = roll_loop(params, states, key)

        np.testing.assert_allclose(np.asarray(traj_cb.rewards),
                                   np.asarray(traj_loop.rewards), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(traj_cb.terminals),
                                      np.asarray(traj_loop.terminals))
        np.testing.assert_allclose(np.asarray(traj_cb.actions),
                                   np.asarray(traj_loop.actions), atol=1e-5)
        np.testing.assert_allclose(np.asarray(traj_cb.logps),
                                   np.asarray(traj_loop.logps), atol=1e-5)
        np.testing.assert_allclose(np.asarray(traj_cb.bootstrap_value),
                                   np.asarray(traj_loop.bootstrap_value),
                                   atol=1e-5)

    def test_solvation_penalty_in_loop(self):
        calc = NativeBatchCalculator(method=METHOD_LJ, epsilon=0.15)
        env = build(make_host_reward(calc))
        agent = make_mlp_internal_agent(num_zs=2, canvas_size=3, network_width=16)
        rng = jax.random.PRNGKey(0)
        states = env.init_states(rng, 4)
        params = agent.init(rng, states.observation(), rng, method=agent.act)
        roll0 = make_host_loop_rollout_fn(env, agent, calc, 3)
        roll1 = make_host_loop_rollout_fn(env, agent, calc, 3,
                                          distance_penalty=0.05)
        key = jax.random.PRNGKey(3)
        _, t0 = roll0(params, states, key)
        _, t1 = roll1(params, states, key)
        r0 = np.asarray(t0.rewards)
        r1 = np.asarray(t1.rewards)
        # penalized rewards are <= unpenalized wherever an atom was placed
        assert np.all(r1 <= r0 + 1e-6)
        assert np.any(r1 < r0 - 1e-6)


class TestDriverProbes:
    def test_supports_host_callbacks_on_cpu(self):
        from molgym_tpu.tools.driver import supports_host_callbacks
        assert supports_host_callbacks()  # CPU backend supports io_callback
