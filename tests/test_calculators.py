"""Native host bridge, host reward pipeline, Sparrow gating, minimizer tests
(parity targets: reference tests/test_sparrow.py, test_reward.py,
test_minimizer.py — golden PM6 values gated on scine availability)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molgym_tpu.atoms import Atom, Atoms
from molgym_tpu.calculators.native import (METHOD_LJ, NativeBatchCalculator,
                                           NativeCalc)
from molgym_tpu.calculators.reward_host import (InteractionReward,
                                                SolvationReward,
                                                make_host_reward)
from molgym_tpu.calculators.sparrow import SPARROW_AVAILABLE
from molgym_tpu.envs.reward import make_lennard_jones_reward
from molgym_tpu.minimizer import minimize


class TestNativeBridge:
    def test_batch_reward_matches_device_lj(self):
        """The C++ LJ evaluator and the device LJ reward must agree."""
        rng = np.random.RandomState(0)
        B, N = 8, 5
        zs = rng.randint(0, 3, size=(B, N)).astype(np.int32)
        zs = np.where(zs == 2, 8, zs)  # 0, 1(H), 8(O)
        # compact occupied slots to the front (env invariant)
        zs = -np.sort(-zs, axis=1)
        positions = rng.randn(B, N, 3).astype(np.float64) * 2.0
        n_atoms = (zs > 0).sum(-1).astype(np.int32)
        new_z = np.full(B, 8, np.int32)
        new_pos = rng.randn(B, 3).astype(np.float64) * 2.0
        valid = np.ones(B, np.uint8)

        calc = NativeBatchCalculator(method=METHOD_LJ, epsilon=0.15)
        native = calc.batch_reward(zs, positions, n_atoms, new_z, new_pos, valid)

        device_fn = make_lennard_jones_reward(epsilon=0.15)
        mask = np.arange(N)[None, :] < n_atoms[:, None]
        device = device_fn(jnp.asarray(positions, jnp.float32),
                           jnp.asarray(zs * mask), jnp.asarray(new_pos, jnp.float32),
                           jnp.asarray(new_z), jnp.asarray(valid, bool))
        np.testing.assert_allclose(native, np.asarray(device), atol=1e-3)

    def test_invalid_skipped(self):
        calc = NativeBatchCalculator()
        zs = np.array([[1, 0]], np.int32)
        r = calc.batch_reward(zs, np.zeros((1, 2, 3)), np.array([1], np.int32),
                              np.array([1], np.int32),
                              np.array([[0.01, 0, 0]]), np.array([0], np.uint8))
        assert r[0] == 0.0

    def test_pool_stats_increment(self):
        calc = NativeBatchCalculator()
        before = calc.pool_stats()
        calc.batch_reward(np.array([[1]], np.int32), np.zeros((1, 1, 3)),
                          np.array([1], np.int32), np.array([1], np.int32),
                          np.array([[1.0, 0, 0]]), np.array([1], np.uint8))
        after = calc.pool_stats()
        assert after[0] > before[0] and after[1] > before[1]

    def test_gradients_match_finite_difference(self):
        calc = NativeCalc(method='MORSE')
        calc.set_elements(['O', 'H', 'H'])
        pos = np.array([[0, 0, 0], [0.9, 0, 0], [0, 0.9, 0]], np.float64)
        calc.set_positions(pos)
        grad = calc.calculate_gradients()
        eps = 1e-6
        for i in range(3):
            for c in range(3):
                p1, p2 = pos.copy(), pos.copy()
                p1[i, c] += eps
                p2[i, c] -= eps
                calc.set_positions(p1)
                e1 = calc.calculate_energy()
                calc.set_positions(p2)
                e2 = calc.calculate_energy()
                assert grad[i, c] == pytest.approx((e1 - e2) / (2 * eps), abs=1e-4)


class TestHostRewardPipeline:
    def test_io_callback_reward_in_jit(self):
        """The host reward must work inside jit (the rollout path)."""
        calc = NativeBatchCalculator(method=METHOD_LJ, epsilon=0.15)
        reward_fn = make_host_reward(calc)

        @jax.jit
        def step(positions, zs, new_pos, new_z, valid):
            return reward_fn(positions, zs, new_pos, new_z, valid)

        positions = jnp.zeros((2, 3, 3))
        zs = jnp.array([[8, 0, 0], [8, 8, 0]], jnp.int32)
        new_pos = jnp.array([[1.32, 0, 0], [5.0, 0, 0]])
        r = step(positions, zs, new_pos, jnp.array([8, 8]), jnp.array([True, True]))
        assert r.shape == (2, )
        assert float(r[0]) == pytest.approx(0.15, rel=1e-2)  # at LJ optimum

    @pytest.mark.slow
    def test_host_reward_in_env_rollout(self):
        """Full env + host reward under the scan-based rollout."""
        from molgym_tpu.agents.internal import make_mlp_internal_agent
        from molgym_tpu.envs.environment import MolecularEnv
        from molgym_tpu.formula import string_to_formula
        from molgym_tpu.rl.rollout import make_rollout_fn
        from molgym_tpu.spaces import ObservationSpace

        space = ObservationSpace(canvas_size=3, zs=[0, 8])
        formulas = np.stack([space.bag_from_formula(string_to_formula('O2'))])
        calc = NativeBatchCalculator(method=METHOD_LJ, epsilon=0.15)
        env = MolecularEnv(reward_fn=make_host_reward(calc),
                           observation_space=space, formulas=formulas)
        agent = make_mlp_internal_agent(num_zs=2, canvas_size=3,
                                        network_width=16)
        rng = jax.random.PRNGKey(0)
        states = env.init_states(rng, 4)
        params = agent.init(rng, states.observation(), rng, method=agent.act)
        rollout = make_rollout_fn(env, agent, num_steps_per_env=4)
        _, traj = rollout(params, states, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(traj.rewards)).all()


class TestRewardObjects:
    def test_interaction_reward_first_atom_zero(self):
        reward = InteractionReward(backend='lj')
        r, info = reward.calculate(Atoms(), Atom('O', (0, 0, 0)))
        assert r == pytest.approx(0.0)
        assert 'elapsed_time' in info

    def test_interaction_reward_additivity(self):
        """Reward telescopes: r1 + r2 = -(E_final - sum E_atoms) (the
        reference checks this with PM6 golden numbers, test_reward.py:206-220)."""
        reward = InteractionReward(backend='morse')
        a1 = Atom('O', (0.0, 0.0, 0.0))
        a2 = Atom('O', (1.32, 0.0, 0.0))
        a3 = Atom('O', (2.64, 0.0, 0.0))
        r1, _ = reward.calculate(Atoms(), a1)
        r2, _ = reward.calculate(Atoms(['O'], [a1.position]), a2)
        r3, _ = reward.calculate(Atoms(['O', 'O'], [a1.position, a2.position]), a3)
        calc = NativeCalc(method='MORSE')
        calc.set_elements(['O', 'O', 'O'])
        calc.set_positions(np.stack([a1.position, a2.position, a3.position]))
        e_total = calc.calculate_energy()
        assert r1 + r2 + r3 == pytest.approx(-e_total, abs=1e-9)

    def test_solvation_penalty(self):
        base = InteractionReward(backend='lj')
        solv = SolvationReward(distance_penalty=0.01, backend='lj')
        atom = Atom('O', (3.0, 0.0, 0.0))
        r0, _ = base.calculate(Atoms(), atom)
        r1, _ = solv.calculate(Atoms(), atom)
        assert r0 - r1 == pytest.approx(0.03)

    def test_sparrow_unavailable_raises(self):
        if SPARROW_AVAILABLE:
            pytest.skip('scine installed')
        with pytest.raises(RuntimeError):
            InteractionReward(backend='sparrow')


@pytest.mark.skipif(not SPARROW_AVAILABLE, reason='scine_sparrow not installed')
class TestSparrowGolden:
    """Golden PM6 values (reference tests/test_sparrow.py:22-66,
    test_reward.py:191-220). Only runs where scine_sparrow is installed."""

    def test_h2_energy(self):
        from molgym_tpu.calculators.sparrow import Sparrow
        calc = Sparrow('PM6')
        calc.set_elements(['H', 'H'])
        calc.set_positions(np.array([[0, 0, 0], [1.2, 0, 0]]))
        calc.set_settings({'molecular_charge': 0, 'spin_multiplicity': 1,
                           'unrestricted_calculation': 1})
        assert calc.calculate_energy() == pytest.approx(-0.9379853016, abs=1e-6)

    def test_reward_h2(self):
        reward = InteractionReward(backend='sparrow')
        r, _ = reward.calculate(Atoms(['H'], [[0, 0, 0]]), Atom('H', (1.0, 0, 0)))
        assert r == pytest.approx(0.1696435, abs=1e-5)


class TestMinimizer:
    def test_energy_decreases_and_converges(self):
        calc = NativeCalc(method='MORSE')
        atoms = Atoms(['O', 'O'], [[0, 0, 0], [1.9, 0, 0]])
        calc.set_elements(atoms.symbols)
        calc.set_positions(atoms.positions)
        e0 = calc.calculate_energy()
        relaxed, success = minimize(calc, atoms)
        calc.set_positions(relaxed.positions)
        e1 = calc.calculate_energy()
        assert success
        assert e1 < e0
        # O-O Morse optimum at sum of covalent radii
        d = np.linalg.norm(relaxed.positions[1] - relaxed.positions[0])
        assert d == pytest.approx(1.32, abs=1e-2)
        grad = calc.calculate_gradients()
        assert np.abs(grad).max() < 3e-4

    def test_max_iter_failure_flag(self):
        calc = NativeCalc(method='MORSE')
        atoms = Atoms(['O', 'O'], [[0, 0, 0], [1.9, 0, 0]])
        _, success = minimize(calc, atoms, max_iter=1)
        assert not success

    def test_fixed_atoms_do_not_move(self):
        calc = NativeCalc(method='MORSE')
        atoms = Atoms(['O', 'O', 'O'], [[0, 0, 0], [1.6, 0, 0], [3.2, 0, 0]])
        relaxed, _ = minimize(calc, atoms, fixed_indices=[0])
        np.testing.assert_allclose(relaxed.positions[0], [0, 0, 0], atol=1e-12)
