"""SO(3) math tests: spherical harmonics vs Mathematica constants,
orthonormality, CG equivariance, invariants, Wigner conventions
(parity with reference tests/agents/covariant/test_sphs.py, test_so3_tools.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molgym_tpu.ops.cg import (_cg_aggregate_loops, _cg_product_loops,
                               cg_aggregate, cg_output_taus, cg_product,
                               cg_table)
from molgym_tpu.ops.quadrature import gauss_legendre_sphere
from molgym_tpu.ops.so3 import (apply_wigner, atomic_scalars, atomic_scalars_dim,
                                cartesian_to_spherical, complex_product,
                                gen_rot, generate_fibonacci_grid,
                                get_normalization_constant, normalize_alms,
                                spherical_to_cartesian, sum_product_alms_ylms,
                                wigner_D)
from molgym_tpu.ops.sph import spherical_harmonics


def random_so3vec(rng, maxl, tau, batch=()):  # [..., tau, 2l+1, 2]
    return [jnp.asarray(rng.randn(*batch, tau, 2 * l + 1, 2).astype(np.float32))
            for l in range(maxl + 1)]


class TestSphericalHarmonics:
    def test_l1_mathematica(self):
        pos = jnp.asarray(spherical_to_cartesian(np.array([np.pi / 2, 0.0])),
                          jnp.float32)
        y = spherical_harmonics(1, pos)
        expected = np.array([[0.345494, 0], [0, 0], [-0.345494, 0]], np.float32)
        np.testing.assert_allclose(np.asarray(y[1]), expected, atol=1e-5)

    def test_l2_mathematica(self):
        pos = jnp.asarray(spherical_to_cartesian(np.array([np.pi / 3, np.pi / 4])),
                          jnp.float32)
        y = spherical_harmonics(2, pos, normalize=False)
        expected = np.array([[0, -0.289706], [0.236544, -0.236544],
                             [-0.0788479, 0], [-0.236544, -0.236544],
                             [0, 0.289706]], np.float32)
        np.testing.assert_allclose(np.asarray(y[2]), expected, atol=1e-5)

    def test_orthonormality(self):
        """∫ Y_lm Y*_l'm' dΩ = δ_ll' δ_mm' (qm norm) via Gauss-Legendre grid."""
        maxl = 4
        points, weights = gauss_legendre_sphere(16)
        y = spherical_harmonics(maxl, jnp.asarray(points, jnp.float32))
        flat = np.concatenate([np.asarray(part) for part in y], axis=-2)
        yc = flat[..., 0] + 1j * flat[..., 1]  # [K, sum(2l+1)]
        gram = np.einsum('k,km,kn->mn', weights, yc, yc.conj())
        np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=1e-4)

    def test_rotation_covariance(self):
        """Y(Rx) = conj(D) @ Y(x) — the convention apply_wigner relies on."""
        rng = np.random.RandomState(0)
        ds, rot, _ = gen_rot(3, rng)
        x = rng.randn(6, 3)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        y0 = spherical_harmonics(3, jnp.asarray(x, jnp.float32))
        y1 = spherical_harmonics(3, jnp.asarray(x @ rot.T, jnp.float32))
        for l in range(4):
            c0 = np.asarray(y0[l])[..., 0] + 1j * np.asarray(y0[l])[..., 1]
            c1 = np.asarray(y1[l])[..., 0] + 1j * np.asarray(y1[l])[..., 1]
            np.testing.assert_allclose(c0 @ ds[l].conj().T, c1, atol=1e-5)

    def test_conjugate_flag(self):
        pos = jnp.asarray(np.random.RandomState(1).randn(4, 3), jnp.float32)
        y = spherical_harmonics(2, pos)
        yc = spherical_harmonics(2, pos, conj=True)
        for a, b in zip(y, yc):
            np.testing.assert_allclose(np.asarray(a)[..., 0], np.asarray(b)[..., 0])
            np.testing.assert_allclose(np.asarray(a)[..., 1], -np.asarray(b)[..., 1])


class TestCG:
    def test_cg_table_orthogonality(self):
        """sum_m1m2 C(m1,m2,m) C(m1,m2,m') = delta(m,m') for fixed (l1,l2,l)."""
        for (l1, l2, l) in [(1, 1, 0), (1, 1, 1), (1, 1, 2), (2, 1, 2), (2, 2, 3)]:
            t = cg_table(l1, l2, l).reshape(-1, 2 * l + 1)
            np.testing.assert_allclose(t.T @ t, np.eye(2 * l + 1), atol=1e-12)

    def test_known_value(self):
        # <1 0 1 0 | 2 0> = sqrt(2/3)
        t = cg_table(1, 1, 2)
        assert t[1, 1, 2] == pytest.approx(np.sqrt(2.0 / 3.0))

    def test_output_taus(self):
        taus = cg_output_taus((3, 3), (3, 3), maxl=2)
        # (l1,l2) pairs contributing to each l: l=0: (0,0),(1,1); l=1:
        # (0,1),(1,0),(1,1); l=2: (1,1)
        assert taus == (6, 9, 3)

    def test_product_equivariance(self):
        rng = np.random.RandomState(0)
        maxl = 2
        a = random_so3vec(rng, maxl, tau=2)
        b = random_so3vec(rng, maxl, tau=2)
        ds, _rot, _ = gen_rot(maxl, rng)

        ab = cg_product(a, b, maxl)
        ab_rot = apply_wigner(ab, ds)
        rot_ab = cg_product(apply_wigner(a, ds), apply_wigner(b, ds), maxl)
        for p, q in zip(ab_rot, rot_ab):
            np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=1e-4)

    @pytest.mark.slow
    def test_fused_matches_loops_product(self):
        """The fused single-einsum CG product must be numerically identical
        (layout included) to the per-(l1,l2,l) loop implementation."""
        rng = np.random.RandomState(7)
        for maxl in (1, 2, 4):
            a = random_so3vec(rng, maxl, tau=3, batch=(2, ))
            b = random_so3vec(rng, maxl, tau=3, batch=(2, ))
            fused = cg_product(a, b, maxl)
            loops = _cg_product_loops(a, b, maxl)
            for p, q in zip(fused, loops):
                assert p.shape == q.shape
                np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                           atol=1e-5)

    @pytest.mark.slow
    def test_fused_matches_loops_aggregate(self):
        rng = np.random.RandomState(8)
        maxl = 3
        N, M, tau = 3, 4, 2
        edge = [jnp.asarray(rng.randn(N, M, tau, 2 * l + 1, 2).astype(np.float32))
                for l in range(maxl + 1)]
        atom = random_so3vec(rng, maxl, tau, batch=(M, ))
        fused = cg_aggregate(edge, atom, maxl)
        loops = _cg_aggregate_loops(edge, atom, maxl)
        for p, q in zip(fused, loops):
            assert p.shape == q.shape
            np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=1e-4)

    def test_fused_broadcast_tau(self):
        rng = np.random.RandomState(9)
        maxl = 2
        a = random_so3vec(rng, maxl, tau=1, batch=(2, ))
        b = random_so3vec(rng, maxl, tau=4, batch=(2, ))
        fused = cg_product(a, b, maxl)
        loops = _cg_product_loops(a, b, maxl)
        for p, q in zip(fused, loops):
            np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=1e-5)

    def test_pallas_kernel_matches_einsum(self):
        """The Pallas fused CG kernel (interpret mode on CPU) must match the
        einsum path bit-for-bit-ish."""
        from molgym_tpu.ops.cg import _complex_contract, _fused_cg_table
        from molgym_tpu.ops.pallas_cg import cg_contract_pallas
        rng = np.random.RandomState(11)
        maxl = 4
        m = sum(2 * l + 1 for l in range(maxl + 1))
        table_np, _slices = _fused_cg_table(maxl + 1, maxl + 1, maxl)
        a = jnp.asarray(rng.randn(5, 3, m, 2).astype(np.float32))
        b = jnp.asarray(rng.randn(5, 3, m, 2).astype(np.float32))
        ref = _complex_contract(a, b, jnp.asarray(table_np),
                                '...tm,...tn,mnk->...tk')
        out = cg_contract_pallas(a, b, jnp.asarray(table_np), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_pallas_kernel_gradients_match_einsum(self):
        import jax
        from molgym_tpu.ops.cg import _complex_contract, _fused_cg_table
        from molgym_tpu.ops.pallas_cg import cg_contract_pallas
        rng = np.random.RandomState(13)
        maxl = 3
        m = sum(2 * l + 1 for l in range(maxl + 1))
        table_np, _slices = _fused_cg_table(maxl + 1, maxl + 1, maxl)
        a = jnp.asarray(rng.randn(4, 2, m, 2).astype(np.float32))
        b = jnp.asarray(rng.randn(4, 2, m, 2).astype(np.float32))
        cot_shape = _complex_contract(a, b, jnp.asarray(table_np),
                                      '...tm,...tn,mnk->...tk').shape
        cot = jnp.asarray(rng.randn(*cot_shape).astype(np.float32))
        loss_e = lambda x, y: jnp.sum(_complex_contract(
            x, y, jnp.asarray(table_np), '...tm,...tn,mnk->...tk') * cot)
        loss_p = lambda x, y: jnp.sum(
            cg_contract_pallas(x, y, table_np, interpret=True) * cot)
        ge = jax.grad(loss_e, argnums=(0, 1))(a, b)
        gp = jax.grad(loss_p, argnums=(0, 1))(a, b)
        for u, v in zip(ge, gp):
            np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                       atol=3e-4, rtol=3e-4)

    def test_cg_backend_switch(self):
        from molgym_tpu.ops.cg import set_cg_backend
        rng = np.random.RandomState(12)
        a = random_so3vec(rng, 2, tau=2, batch=(3, ))
        b = random_so3vec(rng, 2, tau=2, batch=(3, ))
        ref = cg_product(a, b, 2)
        set_cg_backend('pallas_interpret')
        try:
            out = cg_product(a, b, 2)
        finally:
            set_cg_backend('einsum')
        for p, q in zip(out, ref):
            np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=2e-5)

    def test_aggregate_matches_manual_sum(self):
        rng = np.random.RandomState(1)
        maxl = 2
        N, M, tau = 2, 3, 2
        edge = [jnp.asarray(rng.randn(N, M, tau, 2 * l + 1, 2).astype(np.float32))
                for l in range(maxl + 1)]
        atom = random_so3vec(rng, maxl, tau, batch=(M, ))
        agg = cg_aggregate(edge, atom, maxl)
        # manual: per i, sum_j cg_product(edge[i,j], atom[j])
        for i in range(N):
            total = None
            for j in range(M):
                e_ij = [part[i, j] for part in edge]
                a_j = [part[j] for part in atom]
                p = cg_product(e_ij, a_j, maxl)
                total = p if total is None else [x + y for x, y in zip(total, p)]
            for l in range(maxl + 1):
                np.testing.assert_allclose(np.asarray(agg[l][i]),
                                           np.asarray(total[l]), atol=1e-4)


class TestSO3Tools:
    def test_fibonacci_grid_on_sphere(self):
        grid = generate_fibonacci_grid(128)
        np.testing.assert_allclose(np.linalg.norm(grid, axis=-1), 1.0, atol=1e-9)
        # roughly uniform: mean should be near 0
        assert np.linalg.norm(grid.mean(0)) < 0.05

    def test_coordinate_roundtrip(self):
        tp = np.array([[0.3, 1.1], [2.0, -2.5]])
        np.testing.assert_allclose(
            cartesian_to_spherical(spherical_to_cartesian(tp)),
            tp, atol=1e-9)

    def test_complex_product(self):
        a = jnp.asarray(np.array([[1.0, 2.0]]))  # 1 + 2i
        b = jnp.asarray(np.array([[3.0, -1.0]]))  # 3 - i
        out = np.asarray(complex_product(a, b))
        np.testing.assert_allclose(out, [[5.0, 5.0]])  # (1+2i)(3-i) = 5 + 5i

    def test_normalize_alms(self):
        rng = np.random.RandomState(0)
        a = random_so3vec(rng, 3, tau=2, batch=(4, ))
        norm = normalize_alms(a)
        k = np.asarray(get_normalization_constant(norm))
        np.testing.assert_allclose(k, 1.0, atol=1e-5)

    def test_normalized_density_integrates_to_one(self):
        """∫ |Σ a_lm Y_lm|² dΩ = 1 for normalized a (the reference checks this
        by MC on a Fibonacci grid, test_spherical_distr.py:252-259)."""
        rng = np.random.RandomState(2)
        a = normalize_alms(random_so3vec(rng, 3, tau=2, batch=(2, )))
        points, weights = gauss_legendre_sphere(12)
        y = spherical_harmonics(3, jnp.asarray(points, jnp.float32))
        # broadcast: a parts [B, tau, m, 2]; y parts [K, m, 2] -> [K, B]
        y_b = [part[:, None, None, :, :] for part in y]
        a_b = [part[None] for part in a]
        s = sum_product_alms_ylms(a_b, y_b)  # [K, B, 2]
        p = np.asarray(jnp.sum(jnp.square(s), axis=-1))
        integral = np.einsum('k,kb->b', weights, p)
        np.testing.assert_allclose(integral, 1.0, atol=1e-4)

    def test_atomic_scalars_invariance(self):
        rng = np.random.RandomState(3)
        maxl = 4
        a = random_so3vec(rng, maxl, tau=3, batch=(2, ))
        ds, _, _ = gen_rot(maxl, rng)
        s0 = atomic_scalars(a)
        s1 = atomic_scalars(apply_wigner(a, ds))
        assert s0.shape[-1] == atomic_scalars_dim(maxl, 3)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=2e-4)

    def test_wigner_unitary(self):
        for l in range(1, 5):
            d = wigner_D(l, 0.3, 1.1, -0.7)
            np.testing.assert_allclose(d @ d.conj().T, np.eye(2 * l + 1),
                                       atol=1e-12)


class TestPackedLevel:
    """The packed CG level (agents/cormorant.py CGLevelPacked) must compute
    exactly what the per-l loop level (CGLevel) computes, for translated
    parameters — it is a layout optimization, not new math."""

    @staticmethod
    def translate_params(old, maxl, tau, tau_out, atom_n_ells):
        from molgym_tpu.ops.cg import cg_output_taus

        ag_taus = cg_output_taus([tau] * (maxl + 1), [tau] * atom_n_ells, maxl)
        sq_taus = cg_output_taus([tau_out] * (maxl + 1), [tau_out] * (maxl + 1),
                                 maxl)
        new = {'ag_mix': {}, 'cat_mix': {}}
        for l in range(maxl + 1):
            for part in ('w_r', 'w_i'):
                w = np.asarray(old[f'ag_mix_l{l}'][part])
                p = ag_taus[l] // tau
                new['ag_mix'][f'{part}_l{l}_s0'] = w.reshape(p, tau, tau_out)
                wc = np.asarray(old['cat_mix'][f'mix_l{l}'][part])
                p_sq = sq_taus[l] // tau_out
                rows = [tau_out, p_sq * tau_out,
                        tau if l < atom_n_ells else 0]
                a, b, c = np.split(wc, np.cumsum(rows)[:-1], axis=0)
                new['cat_mix'][f'{part}_l{l}_s0'] = a.reshape(1, tau_out, tau_out)
                new['cat_mix'][f'{part}_l{l}_s1'] = b.reshape(p_sq, tau_out,
                                                              tau_out)
                if l < atom_n_ells:
                    new['cat_mix'][f'{part}_l{l}_s2'] = c.reshape(1, tau,
                                                                  tau_out)
        return new

    @pytest.mark.parametrize('atom_n_ells', [1, 4])
    @pytest.mark.slow
    def test_packed_level_matches_loop_level(self, atom_n_ells):
        from molgym_tpu.agents.cormorant import CGLevel, CGLevelPacked
        from molgym_tpu.ops.cg import pack_so3, unpack_so3

        maxl, tau, tau_out = 3, 5, 6
        B, N = 2, 4
        rng = np.random.RandomState(0)
        atom = random_so3vec(rng, atom_n_ells - 1, tau, batch=(B, N))
        sph = random_so3vec(rng, maxl, 1, batch=(B, N, N))
        sph = [s[..., 0, :, :] for s in sph]  # [B, N, N, 2l+1, 2]
        rad = [jnp.asarray(rng.randn(B, N, N, tau).astype(np.float32))
               for _ in range(maxl + 1)]
        atom_mask = jnp.asarray(rng.rand(B, N) > 0.3)

        old_level = CGLevel(maxl=maxl, tau_out=tau_out)
        old_params = old_level.init(jax.random.PRNGKey(0), atom, sph, rad,
                                    atom_mask)
        old_out = old_level.apply(old_params, atom, sph, rad, atom_mask)

        new_level = CGLevelPacked(maxl=maxl, tau_out=tau_out,
                                  atom_n_ells=atom_n_ells)
        new_params = {'params': self.translate_params(
            old_params['params'], maxl, tau, tau_out, atom_n_ells)}
        rad_feats = jnp.stack(rad, axis=-1)
        atom_packed = pack_so3(atom)
        out_r, out_i = new_level.apply(new_params, atom_packed[..., 0],
                                       atom_packed[..., 1], pack_so3(sph),
                                       rad_feats, atom_mask)
        new_out = unpack_so3(jnp.stack([out_r, out_i], axis=-1), maxl + 1)

        assert len(old_out) == len(new_out)
        for o, n in zip(old_out, new_out):
            np.testing.assert_allclose(np.asarray(o), np.asarray(n),
                                       atol=2e-5, rtol=2e-5)


class TestFusedAggregateKernel:
    """ops/pallas_agg.py (fused edge-build + CG aggregate) vs the einsum
    oracle, forward and gradients, in interpret mode."""

    @pytest.mark.parametrize('path', ['grouped', 'fallback'])
    @pytest.mark.parametrize('atom_n_ells,tau', [(1, 5), (4, 6)])
    def test_fwd_and_grads_match_einsum(self, atom_n_ells, tau, path,
                                        monkeypatch):
        from molgym_tpu.ops import pallas_agg
        from molgym_tpu.ops.cg import _fused_cg_table, cg_aggregate_packed
        from molgym_tpu.ops.pallas_agg import cg_aggregate_edge_fused
        if path == 'grouped':
            assert pallas_agg._grouped_tile(2, 4, tau) is not None
        else:
            monkeypatch.setattr(pallas_agg, '_grouped_tile',
                                lambda *a: None)

        maxl = 3
        B, N = 2, 4
        n_ells = maxl + 1
        m1 = sum(2 * l + 1 for l in range(n_ells))
        m2 = sum(2 * l + 1 for l in range(atom_n_ells))
        rng = np.random.RandomState(0)
        sph = jnp.asarray(rng.randn(B, N, N, m1, 2).astype(np.float32))
        rad = jnp.asarray(rng.randn(B, N, N, tau, n_ells).astype(np.float32))
        atom = jnp.asarray(rng.randn(B, N, tau, m2, 2).astype(np.float32))
        table3, _slices = _fused_cg_table(n_ells, atom_n_ells, maxl)

        def via_einsum(rad_, atom_):
            reps = np.array([2 * l + 1 for l in range(n_ells)])
            rad_m = jnp.repeat(rad_, repeats=reps, axis=-1,
                               total_repeat_length=m1)
            edge = rad_m[..., None] * sph[..., None, :, :]
            out, _ = cg_aggregate_packed(edge, atom_, n_ells, atom_n_ells,
                                         maxl)
            return out

        def via_pallas(rad_, atom_):
            return cg_aggregate_edge_fused(sph, rad_, atom_, table3,
                                           interpret=True)

        ref = via_einsum(rad, atom)
        out = via_pallas(rad, atom)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

        # gradients wrt radial features and atom rep
        cot = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))
        loss_e = lambda r, a: jnp.sum(via_einsum(r, a) * cot)
        loss_p = lambda r, a: jnp.sum(via_pallas(r, a) * cot)
        ge = jax.grad(loss_e, argnums=(0, 1))(rad, atom)
        gp = jax.grad(loss_p, argnums=(0, 1))(rad, atom)
        for a, b in zip(ge, gp):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-4, rtol=3e-4)

    @pytest.mark.parametrize('path', ['grouped', 'fallback'])
    @pytest.mark.slow
    def test_l1_grouped_contraction_matches_oracle(self, path, monkeypatch):
        """At maxl=4 the kernel contracts z per l1 group against compacted
        sub-tables and emits a PERMUTED K axis (cg.fused_cg_table_grouped);
        forward and gradients must equal the einsum oracle's columns taken
        in that permutation, on both kernel strategies."""
        from molgym_tpu.ops import pallas_agg
        from molgym_tpu.ops.cg import (_fused_cg_table, cg_aggregate_packed,
                                       fused_cg_table_grouped)
        if path == 'fallback':
            monkeypatch.setattr(pallas_agg, '_grouped_tile', lambda *a: None)

        maxl, B, N, tau = 4, 2, 4, 5
        n_ells = maxl + 1
        m1 = m2 = n_ells ** 2
        rng = np.random.RandomState(3)
        sph = jnp.asarray(rng.randn(B, N, N, m1, 2).astype(np.float32))
        rad = jnp.asarray(rng.randn(B, N, N, tau, n_ells).astype(np.float32))
        atom = jnp.asarray(rng.randn(B, N, tau, m2, 2).astype(np.float32))
        table3, _sl = _fused_cg_table(n_ells, n_ells, maxl)
        gtabs, perm, _slices_idx = fused_cg_table_grouped(n_ells, n_ells,
                                                          maxl)
        permj = jnp.asarray(perm)

        def via_einsum(rad_, atom_):
            reps = np.array([2 * l + 1 for l in range(n_ells)])
            rad_m = jnp.repeat(rad_, repeats=reps, axis=-1,
                               total_repeat_length=m1)
            edge = rad_m[..., None] * sph[..., None, :, :]
            out, _ = cg_aggregate_packed(edge, atom_, n_ells, n_ells, maxl)
            return out[..., permj, :]

        def via_pallas(rad_, atom_):
            r, i = pallas_agg.cg_aggregate_edge_fused_ri(
                sph, rad_, atom_[..., 0], atom_[..., 1], table3,
                interpret=True, grouped=(gtabs, perm))
            return jnp.stack([r, i], axis=-1)

        ref = via_einsum(rad, atom)
        out = via_pallas(rad, atom)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)
        cot = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))
        ge = jax.grad(lambda r_, a_: jnp.sum(via_einsum(r_, a_) * cot),
                      argnums=(0, 1))(rad, atom)
        gp = jax.grad(lambda r_, a_: jnp.sum(via_pallas(r_, a_) * cot),
                      argnums=(0, 1))(rad, atom)
        for a, b in zip(ge, gp):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-4, rtol=3e-4)

    @pytest.mark.slow
    def test_grouped_level_matches_einsum_backend(self):
        """Full CGLevelPacked on the pallas_interpret backend at maxl=4 —
        permuted kernel output consumed through PackedCatMix's idx-form
        slices — must equal the einsum-backend level bit-for-math."""
        from molgym_tpu.agents.cormorant import CGLevelPacked
        from molgym_tpu.ops.cg import set_aggregate_backend as set_agg_backend

        maxl, B, N, tau, tau_out = 4, 2, 4, 3, 4
        n_ells = maxl + 1
        m = n_ells ** 2
        rng = np.random.RandomState(7)
        atom_r = jnp.asarray(rng.randn(B, N, tau, m).astype(np.float32))
        atom_i = jnp.asarray(rng.randn(B, N, tau, m).astype(np.float32))
        sph = jnp.asarray(rng.randn(B, N, N, m, 2).astype(np.float32))
        rad = jnp.asarray(rng.randn(B, N, N, tau, n_ells).astype(np.float32))
        mask = jnp.ones((B, N), bool)

        level = CGLevelPacked(maxl=maxl, tau_out=tau_out, atom_n_ells=n_ells)
        params = level.init(jax.random.PRNGKey(0), atom_r, atom_i, sph, rad,
                            mask)
        set_agg_backend('einsum')
        try:
            ref_r, ref_i = level.apply(params, atom_r, atom_i, sph, rad, mask)
        finally:
            set_agg_backend('auto')
        set_agg_backend('pallas_interpret')
        try:
            out_r, out_i = level.apply(params, atom_r, atom_i, sph, rad, mask)
        finally:
            set_agg_backend('auto')
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i),
                                   atol=2e-4, rtol=2e-4)


class TestFusedAggregateBf16:
    """bfloat16 operands through the fused kernels: dot inputs stay bf16
    (MXU native, 2x the f32 rate on v5e) with f32 accumulation — the values
    must match the f32 einsum oracle to bf16 resolution, fwd and grads, on
    both operand-feeding strategies (pallas_agg._mxu_dtype)."""

    @pytest.mark.parametrize('path', ['grouped', 'fallback'])
    def test_bf16_matches_f32_oracle(self, path, monkeypatch):
        from molgym_tpu.ops import pallas_agg
        from molgym_tpu.ops.cg import _fused_cg_table, cg_aggregate_packed
        if path == 'fallback':
            monkeypatch.setattr(pallas_agg, '_grouped_tile', lambda *a: None)

        maxl, B, N, tau = 3, 2, 4, 6
        n_ells = maxl + 1
        m1 = m2 = n_ells ** 2
        rng = np.random.RandomState(5)
        # round the raw data to bf16 resolution first so the comparison
        # isolates the kernel's compute precision from input quantization
        def bfr(x):
            return np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
        sph = jnp.asarray(bfr(rng.randn(B, N, N, m1, 2)))
        rad = jnp.asarray(bfr(rng.randn(B, N, N, tau, n_ells)))
        atom = jnp.asarray(bfr(rng.randn(B, N, tau, m2, 2)))
        table3, _sl = _fused_cg_table(n_ells, n_ells, maxl)

        def via_einsum(rad_, atom_):
            reps = np.array([2 * l + 1 for l in range(n_ells)])
            rad_m = jnp.repeat(rad_, repeats=reps, axis=-1,
                               total_repeat_length=m1)
            edge = rad_m[..., None] * sph[..., None, :, :]
            out, _ = cg_aggregate_packed(edge, atom_, n_ells, n_ells, maxl)
            return out

        def via_pallas_bf16(rad_, atom_):
            r, i = pallas_agg.cg_aggregate_edge_fused_ri(
                sph.astype(jnp.bfloat16), rad_.astype(jnp.bfloat16),
                atom_[..., 0].astype(jnp.bfloat16),
                atom_[..., 1].astype(jnp.bfloat16), table3, interpret=True)
            return jnp.stack([r, i], -1).astype(jnp.float32)

        ref = np.asarray(via_einsum(rad, atom))
        out = np.asarray(via_pallas_bf16(rad, atom))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out, ref, atol=0.03 * scale, rtol=0.05)

        cot = jnp.asarray(bfr(rng.randn(*ref.shape)))
        ge = jax.grad(lambda r_, a_: jnp.sum(via_einsum(r_, a_) * cot),
                      argnums=(0, 1))(rad, atom)
        gp = jax.grad(
            lambda r_, a_: jnp.sum(via_pallas_bf16(r_, a_) * cot),
            argnums=(0, 1))(rad, atom)
        for a, b in zip(ge, gp):
            s = np.abs(np.asarray(a)).max()
            np.testing.assert_allclose(np.asarray(b, np.float32),
                                       np.asarray(a, np.float32),
                                       atol=0.03 * s, rtol=0.05)

    def test_square_tri_bf16_matches_f32_oracle(self):
        from molgym_tpu.ops import pallas_agg
        from molgym_tpu.ops.cg import (_fused_cg_table, cg_product_packed_ri,
                                       fused_cg_table_tri)
        maxl, B, N, tau = 4, 2, 4, 5
        n_ells = maxl + 1
        m = n_ells ** 2
        rng = np.random.RandomState(17)
        def bfr(x):
            return np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
        a_r = jnp.asarray(bfr(rng.randn(B, N, tau, m)))
        a_i = jnp.asarray(bfr(rng.randn(B, N, tau, m)))
        table3, _sl = _fused_cg_table(n_ells, n_ells, maxl)
        pairs, groups, perm, _si = fused_cg_table_tri(n_ells, maxl)

        (rr, ri), _ = cg_product_packed_ri(a_r, a_i, a_r, a_i, n_ells,
                                           n_ells, maxl)
        permj = jnp.asarray(perm)
        ref = np.asarray(jnp.stack([rr[..., permj], ri[..., permj]], -1))
        pr, pi = pallas_agg.cg_square_fused_ri(
            a_r.astype(jnp.bfloat16), a_i.astype(jnp.bfloat16), table3,
            tri=(pairs, groups), interpret=True)
        out = np.asarray(jnp.stack([pr, pi], -1).astype(jnp.float32))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out, ref, atol=0.03 * scale, rtol=0.05)


class TestCGSquarePallas:
    """cg_square_fused_ri (row kernel, n_j=1): the level's CG self-product
    without the HBM outer-product intermediates (VERDICT r03 next #2 —
    fold the CG-square chain into kernels)."""

    @pytest.mark.parametrize('mode', ['dense', 'grouped', 'tri'])
    def test_matches_einsum_square(self, mode):
        from molgym_tpu.ops import pallas_agg
        from molgym_tpu.ops.cg import (_fused_cg_table, cg_product_packed_ri,
                                       fused_cg_table_grouped,
                                       fused_cg_table_tri)
        maxl, B, N, tau = 4, 2, 4, 5
        n_ells = maxl + 1
        m = n_ells ** 2
        rng = np.random.RandomState(11)
        a_r = jnp.asarray(rng.randn(B, N, tau, m).astype(np.float32))
        a_i = jnp.asarray(rng.randn(B, N, tau, m).astype(np.float32))
        table3, _sl = _fused_cg_table(n_ells, n_ells, maxl)
        g = tri = perm = None
        if mode == 'grouped':
            gtabs, perm, _si = fused_cg_table_grouped(n_ells, n_ells, maxl)
            g = (gtabs, perm)
        elif mode == 'tri':
            pairs, groups, perm, _si = fused_cg_table_tri(n_ells, maxl)
            tri = (pairs, groups)

        def via_einsum(ar, ai):
            (r, i), _ = cg_product_packed_ri(ar, ai, ar, ai, n_ells, n_ells,
                                             maxl)
            if perm is not None:
                r, i = r[..., jnp.asarray(perm)], i[..., jnp.asarray(perm)]
            return jnp.stack([r, i], -1)

        def via_pallas(ar, ai):
            r, i = pallas_agg.cg_square_fused_ri(ar, ai, table3, grouped=g,
                                                 tri=tri, interpret=True)
            return jnp.stack([r, i], -1)

        ref = via_einsum(a_r, a_i)
        out = via_pallas(a_r, a_i)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)
        # gradients: the same array enters as both product operands; the
        # custom VJP's de + dq must accumulate exactly like einsum autodiff
        cot = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))
        ge = jax.grad(lambda r_, i_: jnp.sum(via_einsum(r_, i_) * cot),
                      argnums=(0, 1))(a_r, a_i)
        gp = jax.grad(lambda r_, i_: jnp.sum(via_pallas(r_, i_) * cot),
                      argnums=(0, 1))(a_r, a_i)
        for a, b in zip(ge, gp):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-4, rtol=3e-4)
