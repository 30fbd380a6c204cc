"""SchNet encoder + internal agent tests."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from molgym_tpu.agents.schnet import SchNetEncoder, make_schnet_agent
from molgym_tpu.envs.environment import MolecularEnv
from molgym_tpu.envs.reward import make_lennard_jones_reward
from molgym_tpu.formula import string_to_formula
from molgym_tpu.spaces import ObservationSpace


def random_rotation(seed=0):
    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


class TestSchNetEncoder:
    def setup_method(self):
        self.enc = SchNetEncoder(num_zs=3, n_atom_basis=16, n_filters=16,
                                 n_interactions=2)
        self.elements = jnp.array([[1, 2, 1, 0, 0]], jnp.int32)
        self.positions = jnp.array([[[0, 0, 0], [1.0, 0, 0], [0, 1.0, 0],
                                     [0, 0, 0], [0, 0, 0]]], jnp.float32)
        self.bag = jnp.zeros((1, 3), jnp.int32)
        self.params = self.enc.init(jax.random.PRNGKey(0), self.elements,
                                    self.positions, self.bag)

    def feats(self, elements, positions):
        return self.enc.apply(self.params, elements, positions, self.bag)

    def test_shapes_and_padding_zeroed(self):
        f = self.feats(self.elements, self.positions)
        assert f.shape == (1, 5, 16)
        np.testing.assert_allclose(f[0, 3:], 0.0)

    def test_rotation_translation_invariance(self):
        f0 = self.feats(self.elements, self.positions)
        rot = jnp.asarray(random_rotation(1))
        moved = jnp.einsum('ij,bnj->bni', rot, self.positions) + jnp.array([1.0, -2.0, 0.5])
        f1 = self.feats(self.elements, moved)
        np.testing.assert_allclose(f0, f1, atol=1e-4)

    def test_permutation_equivariance(self):
        perm = jnp.array([2, 0, 1, 3, 4])
        f0 = self.feats(self.elements, self.positions)
        f1 = self.feats(self.elements[:, perm], self.positions[:, perm])
        np.testing.assert_allclose(f0[:, perm], f1, atol=1e-4)

    def test_padding_independence(self):
        """Values in padded position slots must not leak into real feats."""
        junk = self.positions.at[0, 3].set(jnp.array([9.0, 9.0, 9.0]))
        f0 = self.feats(self.elements, self.positions)
        f1 = self.feats(self.elements, junk)
        np.testing.assert_allclose(f0[0, :3], f1[0, :3], atol=1e-5)


class TestSchNetAgent:
    @pytest.mark.slow
    def test_act_and_evaluate(self):
        space = ObservationSpace(canvas_size=4, zs=[0, 1, 8])
        formulas = np.stack([space.bag_from_formula(string_to_formula('H2O'))])
        env = MolecularEnv(reward_fn=make_lennard_jones_reward(),
                           observation_space=space, formulas=formulas)
        agent = make_schnet_agent(num_zs=3, canvas_size=4, network_width=32,
                                  n_interactions=2)
        rng = jax.random.PRNGKey(0)
        states = env.init_states(rng, 2)
        obs = states.observation()
        params = agent.init(rng, obs, rng, method=agent.act)
        out = agent.apply(params, obs, rng, False, method=agent.act)
        assert out.action_flat.shape == (2, 7)
        # step env then re-evaluate stored actions
        result = env.step(states, out.element, out.position)
        obs2 = result.state.observation()
        out2 = agent.apply(params, obs2, jax.random.PRNGKey(1), False,
                           method=agent.act)
        logp, ent, v = agent.apply(params, obs2, out2.action_flat,
                                   method=agent.evaluate)
        np.testing.assert_allclose(logp, out2.logp, atol=1e-5)
        np.testing.assert_allclose(v, out2.v, atol=1e-5)
