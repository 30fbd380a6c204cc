"""Environment semantics tests (parity with reference tests/test_environment.py,
plus vectorization invariants the reference lacks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molgym_tpu.envs.environment import MolecularEnv, scaffold_halfspaces
from molgym_tpu.envs.reward import (make_lennard_jones_reward, make_morse_reward,
                                    with_solvation_penalty)
from molgym_tpu.envs.vec_env import VecEnv
from molgym_tpu.formula import string_to_formula
from molgym_tpu.spaces import ObservationSpace


def make_env(formula='H2O', zs=(0, 1, 8), canvas_size=5, reward=None, **kwargs):
    space = ObservationSpace(canvas_size=canvas_size, zs=list(zs))
    formulas = np.stack([space.bag_from_formula(string_to_formula(formula))])
    reward_fn = reward if reward is not None else make_lennard_jones_reward()
    return MolecularEnv(reward_fn=reward_fn, observation_space=space,
                        formulas=formulas, **kwargs), space


class TestStep:
    def test_reset_builds_bag(self):
        env, space = make_env('H2O')
        vec = VecEnv(env, num_envs=2)
        obs = vec.reset()
        np.testing.assert_array_equal(np.asarray(obs.bag), [[0, 2, 1], [0, 2, 1]])
        np.testing.assert_array_equal(np.asarray(obs.elements), 0)

    def test_first_atom_zero_interaction(self):
        env, _ = make_env('H2O')
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        obs, reward, done, _ = vec.step((np.array([2]), np.zeros((1, 3), np.float32)))
        # First atom placed alone: pairwise interaction reward is 0.
        assert reward[0] == pytest.approx(0.0, abs=1e-6)
        assert not done[0]
        assert np.asarray(obs.bag)[0, 2] == 0  # O removed from bag

    def test_bag_decrement_and_episode_end(self):
        env, _ = make_env('H2O')
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        vec.step((np.array([2]), np.zeros((1, 3), np.float32)))  # O
        vec.step((np.array([1]), np.array([[0.96, 0, 0]], np.float32)))  # H
        obs, reward, done, _ = vec.step((np.array([1]), np.array([[-0.96, 0, 0]], np.float32)))
        assert done[0]  # bag empty
        assert np.asarray(obs.bag).sum() == 0
        assert reward[0] > 0  # bonding is rewarded by the LJ surrogate

    def test_stop_action(self):
        env, _ = make_env('H2O')
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        obs, reward, done, _ = vec.step((np.array([0]), np.zeros((1, 3), np.float32)))
        assert done[0] and reward[0] == 0.0
        assert np.asarray(obs.elements).sum() == 0  # nothing placed

    def test_too_close_invalid(self):
        env, _ = make_env('H2O', min_reward=-0.6)
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        vec.step((np.array([2]), np.zeros((1, 3), np.float32)))
        obs, reward, done, _ = vec.step((np.array([1]), np.array([[0.1, 0, 0]], np.float32)))
        assert done[0]
        assert reward[0] == pytest.approx(-0.6)
        assert int(np.asarray(vec.states.n_atoms)[0]) == 1  # not placed

    def test_solo_distance_invalid(self):
        # H placed > max_solo_distance from the only heavy atom -> invalid.
        env, _ = make_env('H2O', max_solo_distance=2.0)
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        vec.step((np.array([2]), np.zeros((1, 3), np.float32)))  # O at origin
        obs, reward, done, _ = vec.step((np.array([1]), np.array([[3.0, 0, 0]], np.float32)))
        assert done[0] and reward[0] == pytest.approx(-0.6)

    def test_solo_distance_chlorine(self):
        # Cl is a solo-candidate element (reference environment.py:103-118
        # names H/F/Cl/Br): placed > max_solo_distance from any heavy atom
        # it is invalid, while within range it is accepted.
        env, _ = make_env('CCl2', zs=(0, 6, 17), canvas_size=4,
                          max_solo_distance=2.0)
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        vec.step((np.array([1]), np.zeros((1, 3), np.float32)))  # C at origin
        obs, reward, done, _ = vec.step(
            (np.array([2]), np.array([[4.0, 0, 0]], np.float32)))
        assert done[0] and reward[0] == pytest.approx(-0.6)
        vec.reset()
        vec.step((np.array([1]), np.zeros((1, 3), np.float32)))
        obs, reward, done, _ = vec.step(
            (np.array([2]), np.array([[1.75, 0, 0]], np.float32)))
        assert not done[0]

    def test_solo_distance_bromine(self):
        # Br completes the reference's solo-candidate set (H/F/Cl/Br,
        # environment.py:103-118); same accept/reject geometry as Cl.
        env, _ = make_env('CBr2', zs=(0, 6, 35), canvas_size=4,
                          max_solo_distance=2.0)
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        vec.step((np.array([1]), np.zeros((1, 3), np.float32)))  # C at origin
        obs, reward, done, _ = vec.step(
            (np.array([2]), np.array([[4.0, 0, 0]], np.float32)))
        assert done[0] and reward[0] == pytest.approx(-0.6)
        vec.reset()
        vec.step((np.array([1]), np.zeros((1, 3), np.float32)))
        obs, reward, done, _ = vec.step(
            (np.array([2]), np.array([[1.9, 0, 0]], np.float32)))
        assert not done[0]

    def test_heavy_far_is_valid(self):
        # A heavy atom (O) placed far from another heavy atom is fine.
        env, _ = make_env('O2', zs=(0, 8), canvas_size=4)
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        vec.step((np.array([1]), np.zeros((1, 3), np.float32)))
        obs, reward, done, _ = vec.step((np.array([1]), np.array([[4.0, 0, 0]], np.float32)))
        assert not done[0] or np.asarray(obs.bag).sum() == 0

    def test_empty_bag_element_invalid(self):
        env, _ = make_env('H2O')
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        vec.step((np.array([2]), np.zeros((1, 3), np.float32)))  # O; bag O now 0
        obs, reward, done, _ = vec.step((np.array([2]), np.array([[1.5, 0, 0]], np.float32)))
        assert done[0] and reward[0] == pytest.approx(-0.6)

    def test_canvas_full_terminates(self):
        env, _ = make_env('H4', zs=(0, 1), canvas_size=2)
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        _, _, done, _ = vec.step((np.array([1]), np.zeros((1, 3), np.float32)))
        assert not done[0]
        _, _, done, _ = vec.step((np.array([1]), np.array([[1.0, 0, 0]], np.float32)))
        assert done[0]

    def test_min_reward_clamp_places_atom(self):
        # Atom placed at a strongly repulsive (but > min_atomic_distance)
        # position: reward clamps to min_reward, episode ends, atom IS placed
        # (reference environment.py:66-73).
        env, _ = make_env('H2O', min_atomic_distance=0.3)
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        vec.step((np.array([2]), np.zeros((1, 3), np.float32)))
        obs, reward, done, _ = vec.step((np.array([1]), np.array([[0.35, 0, 0]], np.float32)))
        assert done[0] and reward[0] == pytest.approx(-0.6)
        assert int(np.asarray(vec.states.n_atoms)[0]) == 2


class TestVecEnvAPI:
    def test_step_async_wait(self):
        """Baselines-style async API surface (reference env_container.py:31-54)."""
        env, _ = make_env('H2O')
        vec = VecEnv(env, num_envs=2)
        vec.reset()
        vec.step_async((np.array([2, 2]), np.zeros((2, 3), np.float32)))
        obs, rewards, dones, info = vec.step_wait()
        assert rewards.shape == (2, )
        assert 'elapsed_time' in info
        assert vec.get_size() == 2


class TestFormulaCycle:
    def test_multibag_cycles_on_reset(self):
        space = ObservationSpace(canvas_size=4, zs=[0, 1, 8])
        formulas = np.stack([
            space.bag_from_formula(string_to_formula('H2')),
            space.bag_from_formula(string_to_formula('O2')),
        ])
        env = MolecularEnv(reward_fn=make_lennard_jones_reward(),
                           observation_space=space, formulas=formulas)
        vec = VecEnv(env, num_envs=1)
        obs = vec.reset()
        np.testing.assert_array_equal(np.asarray(obs.bag)[0], [0, 2, 0])
        obs = vec.reset_if_terminal(np.array([True]))
        np.testing.assert_array_equal(np.asarray(obs.bag)[0], [0, 0, 2])
        obs = vec.reset_if_terminal(np.array([True]))
        np.testing.assert_array_equal(np.asarray(obs.bag)[0], [0, 2, 0])

    def test_reset_if_terminal_keeps_live_envs(self):
        env, _ = make_env('H2O')
        vec = VecEnv(env, num_envs=2)
        vec.reset()
        vec.step((np.array([2, 2]), np.zeros((2, 3), np.float32)))
        before = np.asarray(vec.states.n_atoms).copy()
        vec.reset_if_terminal(np.array([True, False]))
        after = np.asarray(vec.states.n_atoms)
        assert after[0] == 0 and after[1] == before[1]


class TestRefillable:
    def test_refills_until_budget(self):
        space = ObservationSpace(canvas_size=6, zs=[0, 8])
        formulas = np.stack([space.bag_from_formula(string_to_formula('O1'))])
        env = MolecularEnv(reward_fn=make_lennard_jones_reward(),
                           observation_space=space, formulas=formulas,
                           num_refills=2)
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        # bag has one O; refills twice -> 3 placements before termination
        _, _, done, _ = vec.step((np.array([1]), np.zeros((1, 3), np.float32)))
        assert not done[0]
        _, _, done, _ = vec.step((np.array([1]), np.array([[1.4, 0, 0]], np.float32)))
        assert not done[0]
        _, _, done, _ = vec.step((np.array([1]), np.array([[2.8, 0, 0]], np.float32)))
        assert done[0]


class TestStochastic:
    def test_sampled_bags_have_even_valence(self):
        space = ObservationSpace(canvas_size=10, zs=[0, 1, 6, 8])
        base = np.stack([space.bag_from_formula(string_to_formula('C2H6O'))])
        env = MolecularEnv(reward_fn=make_lennard_jones_reward(),
                           observation_space=space, formulas=base,
                           stochastic_size_range=(4, 9))
        vec = VecEnv(env, num_envs=8, seed=3)
        obs = vec.reset()
        bags = np.asarray(obs.bag)
        bond_counts = np.array([0, 1, 4, 2])
        sizes = bags.sum(-1)
        assert np.all(sizes >= 4) and np.all(sizes <= 9)
        assert np.all((bags * bond_counts).sum(-1) % 2 == 0)
        # Different envs should see different bags (stochastic).
        assert len({tuple(b) for b in bags}) > 1


class TestConstrained:
    def test_scaffold_halfspace_containment(self):
        cube = np.array([[x, y, z] for x in (0, 2.0) for y in (0, 2.0)
                         for z in (0, 2.0)], dtype=np.float64)
        a, b = scaffold_halfspaces(cube)
        inside = np.array([1.0, 1.0, 1.0])
        outside = np.array([3.0, 1.0, 1.0])
        assert np.all(a @ inside + b <= 1e-6)
        assert not np.all(a @ outside + b <= 1e-6)

    def test_constrained_env_rejects_outside(self):
        cube = np.array([[x, y, z] for x in (-3, 3.0) for y in (-3, 3.0)
                         for z in (-3, 3.0)], dtype=np.float64)
        a, b = scaffold_halfspaces(cube)
        space = ObservationSpace(canvas_size=12, zs=[0, 1, 8, 18])
        formulas = np.stack([space.bag_from_formula(string_to_formula('H2O'))])
        init_elements = np.zeros(12, np.int32)
        init_positions = np.zeros((12, 3), np.float32)
        init_elements[:8] = 3  # Ar scaffold
        init_positions[:8] = cube
        env = MolecularEnv(reward_fn=make_lennard_jones_reward(),
                           observation_space=space, formulas=formulas,
                           initial_elements=init_elements,
                           initial_positions=init_positions,
                           scaffold_halfspaces=(a, b), n_scaffold=8)
        vec = VecEnv(env, num_envs=1)
        vec.reset()
        _, reward, done, _ = vec.step((np.array([2]), np.array([[5.0, 0, 0]], np.float32)))
        assert done[0] and reward[0] == pytest.approx(-0.6)
        vec.reset()
        _, reward, done, _ = vec.step((np.array([2]), np.array([[0.5, 0.1, 0.2]], np.float32)))
        assert not done[0]


class TestRewards:
    def test_lj_optimum_positive(self):
        reward_fn = make_lennard_jones_reward(epsilon=0.15)
        positions = jnp.zeros((1, 4, 3))
        zs = jnp.zeros((1, 4), jnp.int32).at[0, 0].set(1)
        new_pos = jnp.array([[0.62 * 2 ** 0, 0, 0]])  # ~2*r_cov(H)
        r = reward_fn(positions, zs, new_pos, jnp.array([1]), jnp.array([True]))
        assert float(r[0]) == pytest.approx(0.15, rel=1e-2)

    def test_morse_optimum(self):
        reward_fn = make_morse_reward(depth=0.2)
        positions = jnp.zeros((1, 4, 3))
        zs = jnp.zeros((1, 4), jnp.int32).at[0, 0].set(1)
        new_pos = jnp.array([[0.62, 0, 0]])
        r = reward_fn(positions, zs, new_pos, jnp.array([1]), jnp.array([True]))
        assert float(r[0]) == pytest.approx(0.2, rel=1e-2)

    def test_solvation_penalty(self):
        base = make_lennard_jones_reward()
        wrapped = with_solvation_penalty(base, distance_penalty=0.01)
        positions = jnp.zeros((1, 4, 3))
        zs = jnp.zeros((1, 4), jnp.int32)
        new_pos = jnp.array([[2.0, 0, 0]])
        r0 = base(positions, zs, new_pos, jnp.array([1]), jnp.array([True]))
        r1 = wrapped(positions, zs, new_pos, jnp.array([1]), jnp.array([True]))
        assert float(r0[0] - r1[0]) == pytest.approx(0.02)

    def test_invalid_masked(self):
        reward_fn = make_lennard_jones_reward()
        positions = jnp.zeros((1, 4, 3))
        zs = jnp.zeros((1, 4), jnp.int32).at[0, 0].set(1)
        r = reward_fn(positions, zs, jnp.array([[0.01, 0, 0]]), jnp.array([1]),
                      jnp.array([False]))
        assert float(r[0]) == 0.0


class TestScaffoldDriver:
    def test_scaffold_env_builder(self, tmp_path):
        """scripts/run_scaffold.py builds envs with the scaffold pre-placed,
        a hull constraint, and reward over non-scaffold atoms only."""
        from molgym_tpu.atoms import Atoms, write_xyz
        from scripts.run_scaffold import scaffold_envs

        cube = [(x, y, z) for x in (-3, 3.0) for y in (-3, 3.0)
                for z in (-3, 3.0)]
        scaffold = Atoms(['Ar'] * 8, positions=cube)
        path = tmp_path / 'scaffold.xyz'
        write_xyz(str(path), scaffold)

        config = dict(scaffold=str(path), formulas='H2O', eval_formulas=None,
                      min_atomic_distance=0.6, max_solo_distance=2.0,
                      min_reward=-0.6)
        space = ObservationSpace(canvas_size=12, zs=[0, 1, 8, 18])
        train_env, eval_env = scaffold_envs(config, space,
                                            make_lennard_jones_reward())
        assert train_env.n_scaffold == 8
        assert train_env.hull_a is not None

        vec = VecEnv(train_env, num_envs=1)
        obs = vec.reset()
        assert int(np.sum(np.asarray(obs.elements) != 0)) == 8
        # outside the hull -> invalid, min_reward, done
        _, reward, done, _ = vec.step(
            (np.array([2]), np.array([[5.0, 0, 0]], np.float32)))
        assert done[0] and reward[0] == pytest.approx(-0.6)
        # inside the hull, far from all scaffold atoms -> valid; reward sees
        # only non-scaffold atoms (none yet), so first placement scores 0.
        vec.reset()
        _, reward, done, _ = vec.step(
            (np.array([2]), np.array([[0.2, 0.1, 0.0]], np.float32)))
        assert not done[0]
        assert reward[0] == pytest.approx(0.0, abs=1e-6)

    def test_scaffold_element_must_be_known(self, tmp_path):
        from molgym_tpu.atoms import Atoms, write_xyz
        from scripts.run_scaffold import scaffold_envs

        scaffold = Atoms(['Kr'] * 4,
                         positions=[(float(i), 0, 0) for i in range(4)])
        path = tmp_path / 'scaffold.xyz'
        write_xyz(str(path), scaffold)
        config = dict(scaffold=str(path), formulas='H2O', eval_formulas=None,
                      min_atomic_distance=0.6, max_solo_distance=2.0,
                      min_reward=-0.6)
        space = ObservationSpace(canvas_size=12, zs=[0, 1, 8, 18])
        with pytest.raises(ValueError, match='must be listed'):
            scaffold_envs(config, space, make_lennard_jones_reward())


class TestVectorization:
    def test_batch_matches_loop(self):
        """A batch of envs stepped together must equal per-env stepping."""
        env, _ = make_env('H2O')
        vec = VecEnv(env, num_envs=4, seed=0)
        vec.reset()
        elements = np.array([2, 2, 0, 1])
        positions = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 0], [0, 0, 0]], np.float32)
        obs, rewards, dones, _ = vec.step((elements, positions))

        for i in range(4):
            solo = VecEnv(env, num_envs=1, seed=0)
            solo.reset()
            _, r, d, _ = solo.step((elements[i:i + 1], positions[i:i + 1]))
            assert r[0] == pytest.approx(rewards[i], abs=1e-6)
            assert d[0] == dones[i]
