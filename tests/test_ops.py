"""Tests for masked primitives, z-matrix geometry, and scan math
(parity with reference tests/agents/internal/test_zmat.py, tests/test_modules.py,
tests/test_tools.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from molgym_tpu.ops.masked import masked_mean, masked_softmax, masked_sum, to_one_hot
from molgym_tpu.ops.scan_math import discount_cumsum, gae_advantages
from molgym_tpu.ops.zmat import (get_angle, get_dihedral, get_distance,
                                 position_atom, position_point)


class TestMasked:
    def test_one_hot(self):
        oh = to_one_hot(jnp.array([0, 2]), num_classes=3)
        np.testing.assert_allclose(oh, [[1, 0, 0], [0, 0, 1]])

    def test_masked_softmax_sums_to_one(self):
        logits = jnp.array([[1.0, 2.0, 3.0], [0.5, -1.0, 2.0]])
        mask = jnp.array([[1, 1, 0], [1, 1, 1]], dtype=bool)
        p = masked_softmax(logits, mask)
        np.testing.assert_allclose(p.sum(-1), [1.0, 1.0], atol=1e-6)
        assert p[0, 2] == 0.0

    def test_masked_softmax_matches_plain(self):
        logits = jnp.array([[1.0, 2.0, 3.0]])
        mask = jnp.ones((1, 3), dtype=bool)
        np.testing.assert_allclose(masked_softmax(logits, mask),
                                   jax.nn.softmax(logits), atol=1e-6)

    def test_masked_softmax_all_masked(self):
        p = masked_softmax(jnp.array([[1.0, 2.0]]), jnp.zeros((1, 2), bool))
        np.testing.assert_allclose(p, 0.0)

    def test_masked_sum_mean(self):
        x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
        mask = jnp.array([[1, 1, 0]], dtype=bool)
        np.testing.assert_allclose(masked_sum(x, mask), [[2.0, 4.0]])
        np.testing.assert_allclose(masked_mean(x, mask), [[1.0, 2.0]])


class TestZMat:
    def test_distance(self):
        p1 = jnp.zeros(3)
        p2 = jnp.array([0.0, 1.0, 0.0])
        assert np.isclose(get_distance(p1, p2), 1.0)
        assert np.isclose(get_distance(p1, p1), 0.0)

    def test_angle(self):
        p1 = jnp.array([1.0, 0, 0])
        p2 = jnp.zeros(3)
        p3 = jnp.array([0.0, 1, 0])
        p4 = jnp.array([-1.0, 0, 0])
        assert np.isclose(get_angle(p1, p2, p1), 0.0, atol=1e-6)
        assert np.isclose(get_angle(p1, p2, p3), np.pi / 2, atol=1e-6)
        assert np.isclose(get_angle(p1, p2, p4), np.pi, atol=1e-6)

    def test_dihedral_sweep(self):
        p1 = jnp.array([0.0, 0, 1.5])
        p2 = jnp.zeros(3)
        p3 = jnp.array([0.0, 0.5, 0])
        for psi in np.arange(-np.pi + 1e-4, np.pi - 1e-4, np.pi / 17):
            p4 = jnp.array([np.sin(psi), 0.5, np.cos(psi)])
            assert np.isclose(get_dihedral(p1, p2, p3, p4), psi, atol=1e-5)

    def test_dihedral_sign(self):
        p0 = jnp.array([0.0, 0, 1])
        p1 = jnp.zeros(3)
        p2 = jnp.array([0.0, 1, 0])
        assert np.isclose(get_dihedral(p0, p1, p2, jnp.array([1.0, 0, 0])), np.pi / 2, atol=1e-6)
        assert np.isclose(get_dihedral(p0, p1, p2, jnp.array([-1.0, 0, 0])), -np.pi / 2, atol=1e-6)

    def test_dihedral_collinear_is_finite(self):
        # Design delta vs reference (zmat.py NaN on collinear): clamped norms
        # keep the TPU path NaN-free.
        ps = [jnp.array([x, 0.0, 1.0]) for x in (0.6, -0.6, -1.66, 1.66)]
        assert np.isfinite(float(get_dihedral(*ps)))

    def test_positioning_roundtrip(self):
        p0 = jnp.array([0.0, 0, 1])
        p1 = jnp.zeros(3)
        p2 = jnp.array([0.0, 1, 0])
        distance, angle = 2.5, 2 * np.pi / 3
        for psi in np.arange(-np.pi + 1e-4, np.pi - 1e-4, np.pi / 7):
            p = position_point(p0, p1, p2, distance, angle, psi)
            assert np.isclose(get_distance(p2, p), distance, atol=1e-5)
            assert np.isclose(get_angle(p1, p2, p), angle, atol=1e-5)
            assert np.isclose(get_dihedral(p0, p1, p2, p), psi, atol=1e-5)

    def test_position_atom_empty(self):
        positions = jnp.zeros((5, 3))
        p = position_atom(positions, n_atoms=jnp.int32(0), focus=jnp.int32(0),
                          distance=1.0, angle=0.5, dihedral=0.2)
        np.testing.assert_allclose(p, [0, 0, 0])

    def test_position_atom_single(self):
        positions = jnp.zeros((5, 3)).at[0].set(jnp.array([1.0, 1.0, 1.0]))
        p = position_atom(positions, n_atoms=jnp.int32(1), focus=jnp.int32(0),
                          distance=1.5, angle=0.7, dihedral=0.3)
        assert np.isclose(float(get_distance(p, positions[0])), 1.5, atol=1e-5)

    def test_position_atom_matches_reference_logic(self):
        # >= 3 atoms: p2/p1/p0 are the three atoms nearest the focus.
        rng = np.random.RandomState(0)
        pos_np = rng.randn(4, 3).astype(np.float32)
        positions = jnp.zeros((6, 3)).at[:4].set(pos_np)
        focus = 2
        d, a, psi = 1.2, 1.0, 0.5
        p = position_atom(positions, jnp.int32(4), jnp.int32(focus), d, a, psi)

        order = np.argsort(np.linalg.norm(pos_np - pos_np[focus], axis=-1))
        p2, p1, p0 = pos_np[order[0]], pos_np[order[1]], pos_np[order[2]]
        expected = position_point(jnp.array(p0), jnp.array(p1), jnp.array(p2), d, a, psi)
        np.testing.assert_allclose(p, expected, atol=1e-5)

    def test_position_atom_vmapped(self):
        positions = jnp.array(np.random.RandomState(1).randn(3, 5, 3), dtype=jnp.float32)
        n_atoms = jnp.array([0, 1, 3], dtype=jnp.int32)
        focus = jnp.array([0, 0, 1], dtype=jnp.int32)
        out = jax.vmap(position_atom, in_axes=(0, 0, 0, None, None, None))(
            positions, n_atoms, focus, 1.0, 1.0, 1.0)
        assert out.shape == (3, 3)
        assert np.all(np.isfinite(out))


def _reference_gae(rewards, values, terminals, bootstrap, gamma, lam):
    """Straight port of the reference per-trajectory GAE (buffer.py:54-95)."""
    T, B = rewards.shape
    adv = np.zeros((T, B))
    ret = np.zeros((T, B))
    for b in range(B):
        start = 0
        for t in list(np.where(terminals[:, b])[0]) + ([T - 1] if not terminals[-1, b] else []):
            last_val = 0.0 if terminals[t, b] else bootstrap[b]
            sl = slice(start, t + 1)
            rews = np.append(rewards[sl, b], last_val)
            vals = np.append(values[sl, b], last_val)
            deltas = rews[:-1] + gamma * vals[1:] - vals[:-1]
            # discount cumsum
            out = np.zeros_like(deltas)
            acc = 0.0
            for i in reversed(range(len(deltas))):
                acc = deltas[i] + gamma * lam * acc
                out[i] = acc
            adv[sl, b] = out
            racc = last_val
            routs = np.zeros(t + 1 - start)
            for i in reversed(range(len(routs))):
                racc = rews[i] + gamma * racc
                routs[i] = racc
            ret[sl, b] = routs
            start = t + 1
    return adv, ret


class TestScanMath:
    def test_discount_cumsum(self):
        x = jnp.array([1.0, 1.0, 1.0])
        np.testing.assert_allclose(discount_cumsum(x, 0.5), [1.75, 1.5, 1.0])

    def test_discount_cumsum_matches_closed_form(self):
        rng = np.random.RandomState(0)
        x = rng.randn(10).astype(np.float32)
        gamma = 0.9
        expected = np.array([sum(gamma**(k - t) * x[k] for k in range(t, 10)) for t in range(10)])
        np.testing.assert_allclose(discount_cumsum(jnp.array(x), gamma), expected, atol=1e-5)

    def test_gae_matches_reference_buffer_semantics(self):
        rng = np.random.RandomState(42)
        T, B = 12, 3
        rewards = rng.randn(T, B).astype(np.float32)
        values = rng.randn(T, B).astype(np.float32)
        terminals = rng.rand(T, B) < 0.25
        bootstrap = rng.randn(B).astype(np.float32)
        gamma, lam = 0.99, 0.97

        adv, ret = gae_advantages(jnp.array(rewards), jnp.array(values),
                                  jnp.array(terminals), jnp.array(bootstrap),
                                  gamma, lam)
        adv_ref, ret_ref = _reference_gae(rewards, values, terminals, bootstrap, gamma, lam)
        np.testing.assert_allclose(adv, adv_ref, atol=1e-4)
        np.testing.assert_allclose(ret, ret_ref, atol=1e-4)


class TestPallasSoftmax:
    def test_matches_masked_softmax(self):
        from molgym_tpu.ops.pallas_softmax import masked_softmax_pallas
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(5, 7, 25).astype(np.float32))
        mask = jnp.asarray(rng.rand(5, 7, 25) > 0.4)
        ref = masked_softmax(logits, mask)
        out = masked_softmax_pallas(logits, mask, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_fully_masked_row_zero(self):
        from molgym_tpu.ops.pallas_softmax import masked_softmax_pallas
        logits = jnp.ones((2, 8))
        mask = jnp.zeros((2, 8), bool).at[1, 3].set(True)
        out = masked_softmax_pallas(logits, mask, interpret=True)
        np.testing.assert_allclose(np.asarray(out[0]), 0.0)
        assert float(out[1, 3]) == 1.0
