"""Flagship equivariance tests for the covariant agent (parity with reference
tests/agents/covariant/test_agent.py: a_lms covariance under Wigner-D,
rotation invariance of the S^2 log-prob extrema, AtomicScalars invariance)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from molgym_tpu.agents.covariant import CovariantAC
from molgym_tpu.atoms import Atoms
from molgym_tpu.envs.environment import MolecularEnv
from molgym_tpu.envs.reward import make_lennard_jones_reward
from molgym_tpu.formula import string_to_formula
from molgym_tpu.ops.so3 import (apply_wigner, atomic_scalars, gen_rot,
                                generate_fibonacci_grid)
from molgym_tpu.distributions import spherical
from molgym_tpu.spaces import ObservationSpace

H2O = Atoms(['O', 'H', 'H'],
            [[0.0, 0.0, 0.1191], [0.0, 0.7557, -0.4764],
             [0.0, -0.7557, -0.4764]])
CH3 = Atoms(['C', 'H', 'H', 'H'],
            [[0.0, 0.0, 0.0], [0.0, 1.07, 0.0],
             [0.9266, -0.535, 0.0], [-0.9266, -0.535, 0.0]])
CH4 = Atoms(['C', 'H', 'H', 'H', 'H'],
            [[0.0, 0.0, 0.0], [0.6291, 0.6291, 0.6291],
             [-0.6291, -0.6291, 0.6291], [0.6291, -0.6291, -0.6291],
             [-0.6291, 0.6291, -0.6291]])
MOLECULES = [H2O, CH3, CH4]

MAXL = 3


def make_agent():
    space = ObservationSpace(canvas_size=5, zs=[0, 1, 6, 8])
    agent = CovariantAC(zs=(0, 1, 6, 8), canvas_size=5, network_width=32,
                        maxl=MAXL, num_cg_levels=2, num_channels_hidden=6,
                        num_channels_per_element=3, num_gaussians=3,
                        bag_scale=1, min_max_distance=(0.9, 1.8), beta=100.0)
    formula = ((1, 1), )
    obs0 = space.build(Atoms(), formula)
    obs0 = jax.tree.map(lambda x: jnp.asarray(x)[None], obs0)
    params = agent.init(jax.random.PRNGKey(0), obs0, jax.random.PRNGKey(0),
                        method=agent.act)
    return agent, params, space


AGENT, PARAMS, SPACE = make_agent()
FORMULA = ((1, 1), )


def dist_for(atoms):
    # Sampling path with a FIXED key (the reference reseeds before each step,
    # test_agent.py:45,55): symmetric atoms have identical focus probabilities,
    # so identical keys give identical discrete choices across rotations,
    # whereas argmax tie-breaking would be rotation-dependent.
    obs = SPACE.build(atoms, FORMULA)
    obs = jax.tree.map(lambda x: jnp.asarray(x)[None], obs)
    _out, dists = AGENT.apply(PARAMS, obs, jax.random.PRNGKey(1), False,
                              method=AGENT.act_with_dists)
    return dists['so3_dist']


class TestEquivariance:
    def test_alms_transform_covariantly(self):
        """Rotating the molecule must rotate the orientation-density
        coefficients by Wigner-D to < 1e-5 (reference test_agent.py:43-65).

        Note: the deterministic path is used so focus/element/distance match
        across the two evaluations (invariant heads guarantee identical
        discrete choices)."""
        rng = np.random.RandomState(0)
        for atoms in MOLECULES:
            dist = dist_for(atoms)
            ds, rot, _ = gen_rot(MAXL, rng)
            rotated = atoms.copy()
            rotated.positions = atoms.positions @ rot.T
            dist_rot = dist_for(rotated)

            expected = apply_wigner(dist.coefficients, ds)
            for got, want in zip(dist_rot.coefficients, expected):
                delta = float(jnp.max(jnp.abs(got - want)))
                assert delta < 1e-5, f'max delta {delta}'

    def test_log_prob_extrema_rotation_invariant(self):
        """Max/min of the S^2 log-density over a dense grid are invariant
        under rotation of the molecule (reference test_agent.py:67-101)."""
        grid = jnp.asarray(generate_fibonacci_grid(20000).astype(np.float32))
        pts = grid[:, None, :]
        rng = np.random.RandomState(1)
        for atoms in MOLECULES:
            dist = dist_for(atoms)
            _ds, rot, _ = gen_rot(MAXL, rng)
            rotated = atoms.copy()
            rotated.positions = atoms.positions @ rot.T
            dist_rot = dist_for(rotated)

            lp = np.asarray(spherical.log_prob(dist, pts))
            lp_rot = np.asarray(spherical.log_prob(dist_rot, pts))
            np.testing.assert_allclose(lp.max(0), lp_rot.max(0), atol=5e-3)
            np.testing.assert_allclose(lp.min(0), lp_rot.min(0), atol=5e-3)

    def test_invariants_invariant(self):
        """AtomicScalars of the density coefficients are rotation-invariant
        (reference test_agent.py:103-128)."""
        rng = np.random.RandomState(2)
        for atoms in MOLECULES:
            dist = dist_for(atoms)
            _ds, rot, _ = gen_rot(MAXL, rng)
            rotated = atoms.copy()
            rotated.positions = atoms.positions @ rot.T
            dist_rot = dist_for(rotated)
            s0 = atomic_scalars(list(dist.coefficients))
            s1 = atomic_scalars(list(dist_rot.coefficients))
            np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)


class TestCovariantAgentRL:
    @pytest.mark.slow
    def test_act_evaluate_consistency_and_env_step(self):
        space = ObservationSpace(canvas_size=4, zs=[0, 1, 8])
        formulas = np.stack([space.bag_from_formula(string_to_formula('H2O'))])
        env = MolecularEnv(reward_fn=make_lennard_jones_reward(),
                           observation_space=space, formulas=formulas)
        agent = CovariantAC(zs=(0, 1, 8), canvas_size=4, network_width=32,
                            maxl=2, num_cg_levels=2, num_channels_hidden=4,
                            num_channels_per_element=2, num_gaussians=2,
                            bag_scale=3, beta=-10.0)
        rng = jax.random.PRNGKey(0)
        states = env.init_states(rng, 2)
        obs = states.observation()
        params = agent.init(rng, obs, rng, method=agent.act)

        out = agent.apply(params, obs, rng, False, method=agent.act)
        assert out.action_flat.shape == (2, 6)
        # orientation is a unit vector
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out.action_flat[:, 3:6]), axis=-1), 1.0,
            atol=1e-5)
        # first placement at the origin
        np.testing.assert_allclose(np.asarray(out.position), 0.0, atol=1e-6)

        result = env.step(states, out.element, out.position)
        obs2 = result.state.observation()
        out2 = agent.apply(params, obs2, jax.random.PRNGKey(1), False,
                           method=agent.act)
        logp, ent, v = agent.apply(params, obs2, out2.action_flat,
                                   method=agent.evaluate)
        np.testing.assert_allclose(logp, out2.logp, atol=1e-4)
        np.testing.assert_allclose(v, out2.v, atol=1e-5)
        # placement = focus position + d * n
        focus = np.round(np.asarray(out2.action_flat[:, 0])).astype(int)
        d = np.asarray(out2.action_flat[:, 2])
        n = np.asarray(out2.action_flat[:, 3:6])
        pos = np.asarray(obs2.positions)
        expected = pos[np.arange(2), focus] + d[:, None] * n
        np.testing.assert_allclose(np.asarray(out2.position), expected, atol=1e-5)


class TestBf16Encoder:
    @pytest.mark.slow
    def test_bf16_encoder_close_to_f32(self):
        """encoder_dtype='bfloat16' (TPU HBM-traffic mode) must run and stay
        close to the f32 path — same params, same inputs, loose tolerance."""
        space = ObservationSpace(canvas_size=5, zs=[0, 1, 6, 8])
        kwargs = dict(zs=(0, 1, 6, 8), canvas_size=5, network_width=32,
                      maxl=MAXL, num_cg_levels=2, num_channels_hidden=6,
                      num_channels_per_element=3, num_gaussians=3,
                      bag_scale=1, min_max_distance=(0.9, 1.8), beta=-10.0)
        f32 = CovariantAC(**kwargs)
        bf16 = CovariantAC(encoder_dtype='bfloat16', **kwargs)

        obs = space.build(H2O, ((1, 1), ))
        obs = jax.tree.map(lambda x: jnp.asarray(x)[None], obs)
        params = f32.init(jax.random.PRNGKey(0), obs, jax.random.PRNGKey(0),
                          method=f32.act)

        out32 = f32.apply(params, obs, jax.random.PRNGKey(1), True,
                          method=f32.act)
        out16 = bf16.apply(params, obs, jax.random.PRNGKey(1), True,
                           method=bf16.act)
        assert out16.v.dtype == jnp.float32  # heads stay f32
        np.testing.assert_allclose(np.asarray(out16.v), np.asarray(out32.v),
                                   atol=0.15, rtol=0.15)
        # greedy discrete decisions agree
        np.testing.assert_array_equal(np.asarray(out16.action_flat[:, :2]),
                                      np.asarray(out32.action_flat[:, :2]))

        logp16, ent16, _ = bf16.apply(params, obs, out32.action_flat,
                                      method=bf16.evaluate)
        logp32, ent32, _ = f32.apply(params, obs, out32.action_flat,
                                     method=f32.evaluate)
        np.testing.assert_allclose(np.asarray(logp16), np.asarray(logp32),
                                   atol=0.3, rtol=0.2)
