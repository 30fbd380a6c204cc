"""Host-loop rollout: equivalence with the scan rollout (same calculator, same
rng) — the fallback path for backends without io_callback support."""
import pytest
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

    @pytest.mark.slow
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


class TestPipelinedRollout:
    """The pipelined host rollout (QM reward overlapped with the next policy
    forward) must be bitwise identical to the serial loop — including on
    rollouts where the low-reward speculation fixup fires."""

    def _run_pair(self, num_envs, num_steps, seed, epsilon):
        from molgym_tpu.rl.rollout import make_pipelined_host_rollout_fn
        calc = NativeBatchCalculator(method=METHOD_LJ, epsilon=epsilon)
        env = build(make_host_reward(calc))
        agent = make_mlp_internal_agent(num_zs=2, canvas_size=3,
                                        network_width=16)
        rng = jax.random.PRNGKey(seed)
        states = env.init_states(rng, num_envs)
        params = agent.init(rng, states.observation(), rng, method=agent.act)
        roll_serial = make_host_loop_rollout_fn(env, agent, calc, num_steps)
        roll_pipe = make_pipelined_host_rollout_fn(env, agent, calc, num_steps)
        key = jax.random.PRNGKey(seed + 1)
        _, t_serial = roll_serial(params, states, key)
        _, t_pipe = roll_pipe(params, states, key)
        return t_serial, t_pipe, env

    def _assert_identical(self, t_serial, t_pipe):
        for field in ('rewards', 'terminals', 'actions', 'logps', 'values',
                      'bootstrap_value'):
            np.testing.assert_array_equal(
                np.asarray(getattr(t_serial, field)),
                np.asarray(getattr(t_pipe, field)), err_msg=field)
        np.testing.assert_array_equal(np.asarray(t_serial.obs.positions),
                                      np.asarray(t_pipe.obs.positions))
        np.testing.assert_array_equal(np.asarray(t_serial.next_obs.elements),
                                      np.asarray(t_pipe.next_obs.elements))

    @pytest.mark.slow
    def test_bitwise_identical_to_serial(self):
        t_serial, t_pipe, _ = self._run_pair(4, 8, seed=0, epsilon=0.15)
        self._assert_identical(t_serial, t_pipe)

    @pytest.mark.slow
    def test_identical_with_low_reward_fixup(self):
        """A large epsilon makes the untrained policy trip the
        reward < min_reward clamp, exercising the recompute path."""
        t_serial, t_pipe, env = self._run_pair(6, 10, seed=2, epsilon=40.0)
        rewards = np.asarray(t_serial.rewards)
        # precondition: the clamp actually fired somewhere in this rollout
        assert (rewards <= env.min_reward + 1e-6).any(), \
            'fixture no longer exercises the low-reward fixup'
        self._assert_identical(t_serial, t_pipe)

    @pytest.mark.slow
    def test_solvation_penalty_pipelined(self):
        from molgym_tpu.rl.rollout import make_pipelined_host_rollout_fn
        calc = NativeBatchCalculator(method=METHOD_LJ, epsilon=0.15)
        env = build(make_host_reward(calc))
        agent = make_mlp_internal_agent(num_zs=2, canvas_size=3,
                                        network_width=16)
        rng = jax.random.PRNGKey(0)
        states = env.init_states(rng, 4)
        params = agent.init(rng, states.observation(), rng, method=agent.act)
        key = jax.random.PRNGKey(3)
        _, t_serial = make_host_loop_rollout_fn(
            env, agent, calc, 3, distance_penalty=0.05)(params, states, key)
        _, t_pipe = make_pipelined_host_rollout_fn(
            env, agent, calc, 3, distance_penalty=0.05)(params, states, key)
        np.testing.assert_array_equal(np.asarray(t_serial.rewards),
                                      np.asarray(t_pipe.rewards))


class TestTimedCalculator:
    def test_accumulates_time_and_calls(self):
        from molgym_tpu.calculators.reward_host import TimedBatchCalculator
        calc = TimedBatchCalculator(
            NativeBatchCalculator(method=METHOD_LJ, epsilon=0.15))
        zs = np.array([[8, 0]], np.int32)
        calc.batch_reward(zs, np.zeros((1, 2, 3)), np.array([1], np.int32),
                          np.array([8], np.int32), np.array([[1.2, 0, 0]]),
                          np.ones(1, np.uint8))
        assert calc.total_calls == 1
        assert calc.total_time > 0.0
        assert calc.pool_stats()[0] >= 3


class TestAutoTransportRollout:
    """'auto' host-reward transport: measured A/B between the pipelined and
    serial loops on the first warm iterations, winner locked in after
    (VERDICT r02 item 6 — the static pipelined default picked the loser for
    cheap cached rewards)."""

    def test_selects_faster_stub_and_locks_in(self):
        import time

        from molgym_tpu.rl.rollout import AutoTransportRollout

        calls = []

        def make_stub(name, delay):
            def fn(params, states, rng):
                calls.append(name)
                time.sleep(delay)
                return states, {'rewards': np.zeros(3)}
            return fn

        auto = AutoTransportRollout({'pipelined': make_stub('pipelined', 0.08),
                                     'serial': make_stub('serial', 0.002)})
        for _ in range(6):
            auto(None, None, None)
        # probe order: compile pass + warm timed pass for each, then winner
        assert calls[:4] == ['pipelined', 'serial', 'pipelined', 'serial']
        assert auto.choice == 'serial'
        assert calls[4:] == ['serial', 'serial']
        assert auto.current_transport() == 'serial'

    @pytest.mark.slow
    def test_trajectories_identical_across_selection(self):
        from molgym_tpu.rl.rollout import (make_auto_host_rollout_fn,
                                           make_host_loop_rollout_fn)

        calc = NativeBatchCalculator(method=METHOD_LJ, epsilon=0.15)
        env = build(make_host_reward(calc))
        agent = make_mlp_internal_agent(num_zs=2, canvas_size=3,
                                        network_width=16)
        rng = jax.random.PRNGKey(0)
        states = env.init_states(rng, 4)
        params = agent.init(rng, states.observation(), rng, method=agent.act)

        auto = make_auto_host_rollout_fn(env, agent, calc, num_steps_per_env=6)
        serial = make_host_loop_rollout_fn(env, agent, calc,
                                           num_steps_per_env=6)
        for i in range(5):
            key = jax.random.PRNGKey(100 + i)
            _, traj_auto = auto(params, states, key)
            _, traj_serial = serial(params, states, key)
            np.testing.assert_array_equal(np.asarray(traj_auto.rewards),
                                          np.asarray(traj_serial.rewards))
            np.testing.assert_array_equal(np.asarray(traj_auto.actions),
                                          np.asarray(traj_serial.actions))
        assert auto.choice in ('pipelined', 'serial')
