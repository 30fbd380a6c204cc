"""SO(3)-covariant message-passing network (Cormorant-style), in flax.

Replaces the cormorant library stack the reference wraps
(molgym/agents/covariant/modules.py): input charge-power featurization
(modules.py:116-135), relative spherical harmonics + radial filters, N CG
levels of {edge network, CG aggregation, CG square nonlinearity, concat-mix}
(CormorantCG), and the CormorantMixer used to condition orientation
coefficients on the sampled distance (modules.py:138-190).

Design notes (TPU-first, not a translation):
  * complex arithmetic = trailing (real, imag) axis; all CG contractions are
    dense einsums against static CG tables (ops/cg.py) that XLA maps onto the
    MXU — no per-l Python object graph at runtime.
  * channel counts (taus) are uniform across l within a level, which keeps
    every contraction a single fused einsum. The reference's per-(l1,l2)
    ragged channel bookkeeping collapses into concat-then-mix.
  * radial filters are Gaussian RBF bases mixed per (level, l) by a Dense
    layer, gated by a soft sigmoid cutoff (cormorant's basis_set/soft cutoff
    serve the same role; any fixed radial basis spans the same function space
    after the learned mix).
"""
from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from molgym_tpu.ops.cg import (cg_aggregate, cg_aggregate_packed, cg_product,
                               cg_product_packed, m_slices, pack_so3,
                               unpack_so3)
from molgym_tpu.ops.sph import spherical_harmonics_rel

SO3Vec = List[jnp.ndarray]


def _as_dtype(name):
    """Normalize an optional dtype name ('bfloat16', 'float32', None) to a
    numpy dtype for flax/jnp APIs; None means default (float32)."""
    return None if name is None else jnp.dtype(name)


class ComplexLinear(nn.Module):
    """Per-l complex channel mixing: out_t' = sum_t W_{t t'} a_t."""
    tau_out: int
    gain: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [..., tau, m, 2]
        tau_in = x.shape[-3]
        scale = self.gain / np.sqrt(2.0 * tau_in)
        w_r = self.param('w_r', nn.initializers.normal(scale), (tau_in, self.tau_out))
        w_i = self.param('w_i', nn.initializers.normal(scale), (tau_in, self.tau_out))
        xr, xi = x[..., 0], x[..., 1]
        out_r = jnp.einsum('...tm,ts->...sm', xr, w_r) - jnp.einsum('...tm,ts->...sm', xi, w_i)
        out_i = jnp.einsum('...tm,ts->...sm', xr, w_i) + jnp.einsum('...tm,ts->...sm', xi, w_r)
        return jnp.stack([out_r, out_i], axis=-1)


class CatMixReps(nn.Module):
    """Concatenate SO3Vecs along tau and mix per l to tau_out channels
    (cormorant CatMixReps)."""
    maxl: int
    tau_out: int
    gain: float = 1.0

    @nn.compact
    def __call__(self, reps: Sequence[SO3Vec]) -> SO3Vec:
        out = []
        for l in range(self.maxl + 1):
            parts = [rep[l] for rep in reps if l < len(rep)]
            cat = jnp.concatenate(parts, axis=-3)
            out.append(ComplexLinear(tau_out=self.tau_out, gain=self.gain,
                                     name=f'mix_l{l}')(cat))
        return out


class RadialFilters(nn.Module):
    """Per-l learned radial filters: Gaussian RBF basis -> Dense(tau), gated
    by a soft cutoff (cormorant RadialFilters + soft cutoff_type)."""
    maxl: int
    tau: int
    n_basis: int = 16
    hard_cut: float = 2.1
    soft_cut: float = 2.1
    soft_width: float = 0.2

    @nn.compact
    def __call__(self, norms: jnp.ndarray, edge_mask: jnp.ndarray) -> List[jnp.ndarray]:
        # norms: [B, N, N]; edge_mask: [B, N, N] bool
        centers = jnp.linspace(0.0, self.hard_cut, self.n_basis)
        width = centers[1] - centers[0]
        gamma = 0.5 / (width * width)
        rbf = jnp.exp(-gamma * jnp.square(norms[..., None] - centers))

        soft = nn.sigmoid((self.soft_cut - norms) / self.soft_width)
        gate = (edge_mask.astype(norms.dtype) * soft *
                (norms < self.hard_cut).astype(norms.dtype))

        out = []
        for l in range(self.maxl + 1):
            feats = nn.Dense(self.tau, name=f'rad_l{l}')(rbf)
            out.append(feats * gate[..., None])  # [B, N, N, tau]
        return out


@functools.lru_cache(maxsize=None)
def _catmix_embed_table(slices_key, k_total, maxl):
    """One static 0/1 scatter tensor U [K, 2M, 2C] embedding the
    concatenated per-(part, l) mix weights into the packed-K x duplicated-M
    axes of the dense CatMix weight (see PackedCatMix._dense):

        U[off_l + p*(2l+1) + m,  part*M + moff_l + m,  part*C + c(l, p)] = 1

    where c(l, p) enumerates (l, pair) in l-major order, C = sum_l pairs_l,
    M = (maxl+1)^2, and part 0/1 selects the real/imag weight block.
    BigW then falls out of ONE einsum 'kqc,cts->ktsq' against the
    concatenated weights [2C, tau, s] — the earlier per-l einsum + concat
    chain showed up as ~40 us concatenate fusions per (source, direction)
    in the TPU trace."""
    slices = dict(slices_key)
    m_total = (maxl + 1) ** 2
    c_total = sum(slices[l][1] for l in range(maxl + 1))
    u = np.zeros((k_total, 2 * m_total, 2 * c_total), np.float32)
    moff = 0
    c = 0
    for l in range(maxl + 1):
        off, pairs = slices[l]
        width = 2 * l + 1
        for p in range(pairs):
            for m in range(width):
                # off is either the l block's offset (contiguous layout) or
                # an explicit index tuple over the flattened (pair, m) axis
                # (permuted layout, cg.fused_cg_table_grouped slices_idx)
                k = (off[p * width + m] if isinstance(off, tuple)
                     else off + p * width + m)
                u[k, moff + m, c] = 1.0
                u[k, m_total + moff + m, c_total + c] = 1.0
            c += 1
        moff += width
    return u


class PackedCatMix(nn.Module):
    """Equivariant per-l channel mixing over a list of packed reps — the
    packed-form equivalent of concat-along-tau + per-l ComplexLinear
    (cormorant CatMixReps). Each source arrives as (array, slices):
      * M-form  [..., tau, M, 2] with slices = m_slices(n_ells, maxl)
      * K-form  [..., tau, K, 2] straight out of cg_*_packed with its slices.
    Within an l block of a K-form rep the channel order is pair-major
    ((pair, tau) flattened), matching the unpacked loop semantics; the mix
    weight is therefore kept as [n_pairs, tau, tau_out] per (l, source).
    Output: M-form [..., tau_out, M, 2].

    Two implementations (MOLGYM_CATMIX_IMPL env var, default 'dense'):

    'dense' — per source, the per-l weights W_l [pairs, tau, s] are scattered
    into one block-structured BigW [tau, K, s, M] on device (tiny einsums
    against cached static 0/1 tensors, then an l-ordered concat on the m
    axis), and the WHOLE packed rep is contracted in a single dot_general
    over (tau, K). The per-l path sliced the packed K axis per l, which the
    TPU trace showed as the dominant residual cost: bf16 slice copies
    forward, split + pad-and-add reassembly copies in the VJP (~1.5 ms of
    the 9.0 ms SF6 step). The dense dot wastes ~25x FLOPs on the zero blocks
    (~2 GFLOP, ~10 us on the MXU) but eliminates every packed-axis slice;
    its VJP is two clean dots.

    'per_l' — one deep dot per (l, real/imag), sources and complex parts
    concatenated on the contraction axis. Kept for A/B measurement.

    The parameter tree is identical in both, so checkpoints are unaffected.
    """
    maxl: int
    tau_out: int
    gain: float = 1.0
    pair_output: bool = False  # True: return (out_r, out_i) instead of stacked

    @nn.compact
    def __call__(self, reps):
        # Sources are (arr, slices) with a stacked trailing complex axis, or
        # (arr_r, arr_i, slices) with the complex parts as separate arrays —
        # the hot path uses the latter (no T(2,128) interleave copies).
        norm = []
        for entry in reps:
            if len(entry) == 2:
                arr, sl = entry
                norm.append((arr[..., 0], arr[..., 1], sl))
            else:
                norm.append(entry)
        if os.environ.get('MOLGYM_CATMIX_IMPL', 'dense') == 'dense':
            out_r, out_i = self._dense(norm)
        else:
            out_r, out_i = self._per_l(norm)
        if self.pair_output:
            return out_r, out_i
        return jnp.stack([out_r, out_i], axis=-1)

    def _scale(self, norm, l):
        total_c = sum(sl[l][1] * xr.shape[-2] for xr, _xi, sl in norm)
        return self.gain / np.sqrt(2.0 * max(total_c, 1))

    def _dense(self, norm):
        from jax import lax
        # create params in the same (l-outer, source-inner) order as _per_l:
        # flax folds the param rng by creation order, so this keeps a given
        # seed's init identical across the two implementations
        ws = {}
        for l in range(self.maxl + 1):
            scale = self._scale(norm, l)
            for s, (xr, _xi, sl) in enumerate(norm):
                _off, pairs = sl[l]
                if pairs == 0:
                    continue
                tau = xr.shape[-2]
                ws[(l, s, 'r')] = self.param(f'w_r_l{l}_s{s}',
                                             nn.initializers.normal(scale),
                                             (pairs, tau, self.tau_out))
                ws[(l, s, 'i')] = self.param(f'w_i_l{l}_s{s}',
                                             nn.initializers.normal(scale),
                                             (pairs, tau, self.tau_out))
        m_total = (self.maxl + 1) ** 2
        acc_r = None
        acc_i = None
        for s, (xr, xi, sl) in enumerate(norm):
            tau = xr.shape[-2]
            k_total = xr.shape[-1]
            u = _catmix_embed_table(
                tuple(sorted({l: tuple(sl[l])
                              for l in range(self.maxl + 1)}.items())),
                k_total, self.maxl)
            # weights concatenated l-major, real block then imag block —
            # matching U's c axis; BigW in one einsum, no per-l concat chain
            w_cat = jnp.concatenate(
                [ws[(l, s, 'r')].reshape(-1, tau, self.tau_out)
                 for l in range(self.maxl + 1) if (l, s, 'r') in ws] +
                [ws[(l, s, 'i')].reshape(-1, tau, self.tau_out)
                 for l in range(self.maxl + 1) if (l, s, 'i') in ws],
                axis=0)                                 # [2C, tau, s]
            bw = jnp.einsum('kqc,cts->ktsq', jnp.asarray(u),
                            w_cat).astype(xr.dtype)     # [K, t, s, 2M]
            # contract the whole packed rep over (tau, K); the (r, i) weight
            # halves share the dot so each of xr/xi is read ONCE (the
            # [rows, tau*K] operand is the traffic, the outputs are tiny)
            nd = xr.ndim
            dn = (((nd - 2, nd - 1), (1, 0)), ((), ()))
            y_r = lax.dot_general(xr, bw, dn)           # [..., s, 2M]
            y_i = lax.dot_general(xi, bw, dn)
            o_r = y_r[..., :m_total] - y_i[..., m_total:]
            o_i = y_r[..., m_total:] + y_i[..., :m_total]
            acc_r = o_r if acc_r is None else acc_r + o_r
            acc_i = o_i if acc_i is None else acc_i + o_i
        return acc_r, acc_i

    def _per_l(self, norm):
        parts_r = []
        parts_i = []
        for l in range(self.maxl + 1):
            width_m = 2 * l + 1
            scale = self._scale(norm, l)
            xs = []
            ws_r = []
            ws_i = []
            for s, (xr_full, xi_full, sl) in enumerate(norm):
                off, pairs = sl[l]
                if pairs == 0:
                    continue
                tau = xr_full.shape[-2]
                if isinstance(off, tuple):   # permuted (idx-form) layout
                    idx = jnp.asarray(off)
                    blk_r = jnp.take(xr_full, idx, axis=-1)
                    blk_i = jnp.take(xi_full, idx, axis=-1)
                else:
                    blk_r = xr_full[..., off:off + pairs * width_m]
                    blk_i = xi_full[..., off:off + pairs * width_m]
                shape = blk_r.shape[:-2] + (tau * pairs, width_m)
                w_r = self.param(f'w_r_l{l}_s{s}', nn.initializers.normal(scale),
                                 (pairs, tau, self.tau_out)).astype(blk_r.dtype)
                w_i = self.param(f'w_i_l{l}_s{s}', nn.initializers.normal(scale),
                                 (pairs, tau, self.tau_out)).astype(blk_r.dtype)
                # merge (tau, pairs) into one contraction axis
                xs.append(blk_r.reshape(blk_r.shape[:-1] + (pairs, width_m))
                          .reshape(shape))
                xs.append(blk_i.reshape(blk_i.shape[:-1] + (pairs, width_m))
                          .reshape(shape))
                w = jnp.swapaxes(w_r, 0, 1).reshape(tau * pairs, self.tau_out)
                wi = jnp.swapaxes(w_i, 0, 1).reshape(tau * pairs, self.tau_out)
                ws_r.extend([w, -wi])   # real-part weights for (xr, xi)
                ws_i.extend([wi, w])    # imag-part weights for (xr, xi)
            x2 = jnp.concatenate(xs, axis=-2)           # [..., 2C, m]
            w2r = jnp.concatenate(ws_r, axis=0)         # [2C, s]
            w2i = jnp.concatenate(ws_i, axis=0)
            # complex product via one stacked real contraction of depth 2C:
            # out_r = xr Wr - xi Wi ; out_i = xr Wi + xi Wr
            parts_r.append(jnp.einsum('...cm,cs->...sm', x2, w2r))
            parts_i.append(jnp.einsum('...cm,cs->...sm', x2, w2i))
        return (jnp.concatenate(parts_r, axis=-1),
                jnp.concatenate(parts_i, axis=-1))


class RadialFiltersStacked(nn.Module):
    """RadialFilters with the per-l outputs stacked on a trailing axis
    ([B, N, N, tau, maxl+1]) for the packed CG level. Same parameters
    (per-l Dense from a shared RBF basis) and same gating as RadialFilters."""
    maxl: int
    tau: int
    n_basis: int = 16
    hard_cut: float = 2.1
    soft_cut: float = 2.1
    soft_width: float = 0.2
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, norms: jnp.ndarray, edge_mask: jnp.ndarray) -> jnp.ndarray:
        # RBF/gate in f32 (distances need the precision), features cast after.
        centers = jnp.linspace(0.0, self.hard_cut, self.n_basis)
        width = centers[1] - centers[0]
        gamma = 0.5 / (width * width)
        rbf = jnp.exp(-gamma * jnp.square(norms[..., None] - centers))

        soft = nn.sigmoid((self.soft_cut - norms) / self.soft_width)
        gate = (edge_mask.astype(norms.dtype) * soft *
                (norms < self.hard_cut).astype(norms.dtype))

        feats = [nn.Dense(self.tau, name=f'rad_l{l}',
                          dtype=_as_dtype(self.compute_dtype))(rbf)
                 for l in range(self.maxl + 1)]
        out = jnp.stack(feats, axis=-1) * gate[..., None, None].astype(
            feats[0].dtype)
        return out


class CGLevelPacked(nn.Module):
    """One covariant message-passing level on packed reps — identical math to
    CGLevel (edge reps CG-aggregated over neighbors, mixed, CG-squared, then
    concat-mixed with the identity path) but without per-l concatenates or
    unpack transposes on the B x N^2-sized tensors. TPU profiling showed
    those data-formatting ops dominating the einsum path (experiments/perf/).
    """
    maxl: int
    tau_out: int
    atom_n_ells: int  # number of l blocks the incoming atom rep carries
    gain: float = 1.0

    @nn.compact
    def __call__(self, atom_r: jnp.ndarray, atom_i: jnp.ndarray,
                 sph_packed: jnp.ndarray, rad_feats: jnp.ndarray,
                 atom_mask: jnp.ndarray):
        # atom_r/atom_i [B, N, tau, M_atom] (complex parts as separate
        # arrays — no trailing-2 interleave copies in the hot path);
        # sph_packed [B, N, N, M, 2]; rad_feats [B, N, N, tau, maxl+1]
        # (gated). Returns (out_r, out_i), each [B, N, tau_out, M].
        from molgym_tpu.ops import cg as cg_mod
        from molgym_tpu.ops.cg import cg_product_packed_ri

        n_ells = self.maxl + 1
        backend = cg_mod.aggregate_backend()
        if backend.startswith('pallas'):
            from molgym_tpu.ops.pallas_agg import cg_aggregate_edge_fused_ri
            table3, ag_slices = cg_mod._fused_cg_table(
                n_ells, self.atom_n_ells, self.maxl)
            grouped = cg_mod.fused_cg_table_grouped(
                n_ells, self.atom_n_ells, self.maxl)
            if grouped is not None:
                # l1-grouped contraction: the kernel emits a PERMUTED K axis
                # whose layout the idx-form slices describe; ag_mix's static
                # scatter table absorbs the permutation at zero runtime cost
                gtabs, perm, ag_slices = grouped
                grouped = (gtabs, perm)
            ag_kr, ag_ki = cg_aggregate_edge_fused_ri(
                sph_packed, rad_feats, atom_r, atom_i, table3,
                interpret=backend == 'pallas_interpret', grouped=grouped)
        else:
            reps = np.array([2 * l + 1 for l in range(n_ells)])
            rad_m = jnp.repeat(rad_feats, repeats=reps, axis=-1,
                               total_repeat_length=int(reps.sum()))
            # edge rep, built in one op: [B, N, N, tau, M, 2]
            edge = rad_m[..., None] * sph_packed[..., None, :, :]
            atom_packed = jnp.stack([atom_r, atom_i], axis=-1)
            ag_k, ag_slices = cg_aggregate_packed(edge, atom_packed, n_ells,
                                                  self.atom_n_ells, self.maxl)
            ag_kr, ag_ki = ag_k[..., 0], ag_k[..., 1]
        ag_r, ag_i = PackedCatMix(maxl=self.maxl, tau_out=self.tau_out,
                                  gain=1.0, pair_output=True,
                                  name='ag_mix')([(ag_kr, ag_ki, ag_slices)])
        sq_backend = cg_mod.square_backend()
        if sq_backend.startswith('pallas'):
            # row kernel with n_j=1: the [rows, M*M] outer-product
            # intermediate of the square stays in VMEM (cg_square_fused_ri);
            # grouped tables compact the final contraction and emit the
            # l1-major permuted K axis the idx-form slices describe
            from molgym_tpu.ops.pallas_agg import cg_square_fused_ri
            sq_table3, sq_slices = cg_mod._fused_cg_table(
                n_ells, n_ells, self.maxl)
            # tri fold: the self product's z is symmetric, so the kernel
            # computes only the M(M+1)/2 tri pair lanes (half the expansion
            # width and table rows of the l1-grouped dense-pair form)
            sq_pairs, sq_groups, _sq_perm, sq_slices = (
                cg_mod.fused_cg_table_tri(n_ells, self.maxl))
            sq_r, sq_i = cg_square_fused_ri(
                ag_r, ag_i, sq_table3, tri=(sq_pairs, sq_groups),
                interpret=sq_backend == 'pallas_interpret')
        else:
            (sq_r, sq_i), sq_slices = cg_product_packed_ri(
                ag_r, ag_i, ag_r, ag_i, n_ells, n_ells, self.maxl)
        mm = m_slices(n_ells, self.maxl)
        out_r, out_i = PackedCatMix(
            maxl=self.maxl, tau_out=self.tau_out, gain=self.gain,
            pair_output=True, name='cat_mix')([
                (ag_r, ag_i, mm), (sq_r, sq_i, sq_slices),
                (atom_r, atom_i, m_slices(self.atom_n_ells, self.maxl))])
        mask = atom_mask[..., None, None].astype(out_r.dtype)
        return out_r * mask, out_i * mask


class CGLevel(nn.Module):
    """One covariant message-passing level: edge (radial x Y_lm) reps CG-
    aggregated over neighbors, CG-squared, then concat-mixed with the identity
    path (cormorant CormorantCG level).

    gain defaults to 1.0: cormorant's level_gain=10 with this init blows up
    activation scale ~10^3 over 3 levels, which collapses head entropies and
    makes the value loss dominate the clipped gradient (observed empirically:
    v std ~90 at init, PPO never improves)."""
    maxl: int
    tau_out: int
    gain: float = 1.0

    @nn.compact
    def __call__(self, atom_rep: SO3Vec, sph: SO3Vec, rad: List[jnp.ndarray],
                 atom_mask: jnp.ndarray) -> SO3Vec:
        # edge rep per l: [B, N, N, tau, 2l+1, 2]
        tau = atom_rep[0].shape[-3]
        edge_rep = []
        for l in range(self.maxl + 1):
            r = rad[l]
            if r.shape[-1] != tau:
                r = nn.Dense(tau, name=f'rad_adapt_l{l}')(r)
            edge_rep.append(r[..., :, None, None] * sph[l][..., None, :, :])

        ag = cg_aggregate(edge_rep, atom_rep, self.maxl)
        # Bring the ragged (l1,l2)-pair channels to a uniform tau with an
        # equivariant per-l mix before the CG square — keeps every
        # contraction a single fused einsum (design delta vs cormorant's
        # ragged channel bookkeeping; same function space).
        ag = [ComplexLinear(tau_out=self.tau_out, gain=1.0,
                            name=f'ag_mix_l{l}')(part)
              for l, part in enumerate(ag)]
        sq = cg_product(ag, ag, self.maxl)
        out = CatMixReps(maxl=self.maxl, tau_out=self.tau_out, gain=self.gain,
                         name='cat_mix')([ag, sq, atom_rep])
        mask = atom_mask[..., None, None, None].astype(out[0].dtype)
        return [part * mask for part in out]


class CormorantEncoder(nn.Module):
    """Canvas -> per-atom SO3Vec covariants (the reference's Cormorant model,
    covariant/modules.py:97-135). Output entry l: [B, N, tau_out, 2l+1, 2]."""
    num_zs: int
    maxl: int = 4
    num_cg_levels: int = 3
    num_channels_hidden: int = 10
    num_channels_out: int = 8
    charge_power: int = 2
    charge_scale: float = 9.0
    bag_scale: float = 5.0
    hard_cut: float = 2.1
    soft_cut: float = 2.1
    soft_width: float = 0.2
    level_gain: float = 1.0
    # 'bfloat16' halves the HBM traffic of the CG stack (profiling shows the
    # fwd+bwd step is bandwidth/layout-bound, experiments/perf/); geometry
    # (positions -> norms/SH) stays f32, and the output covariants are cast
    # back to f32 so heads and equivariance-sensitive consumers are unchanged.
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, elements: jnp.ndarray, positions: jnp.ndarray,
                 bag: jnp.ndarray, zs_values: jnp.ndarray) -> SO3Vec:
        # elements: [B, N] element indices; zs_values: [Z] atomic numbers
        B, N = elements.shape
        atom_mask = elements != 0
        edge_mask = (atom_mask[:, :, None] & atom_mask[:, None, :] &
                     ~jnp.eye(N, dtype=bool)[None])

        # Input featurization: one-hot(z) x (z / charge_scale)^p, p = 0..P,
        # concat tiled bag / bag_scale (reference modules.py:116-135).
        charges = zs_values[elements].astype(jnp.float32)  # [B, N]
        one_hot = (elements[..., None] == jnp.arange(self.num_zs)).astype(jnp.float32)
        powers = jnp.stack([(charges / self.charge_scale) ** p
                            for p in range(self.charge_power + 1)], axis=-1)
        charge_feats = (one_hot[..., None] * powers[..., None, :]).reshape(B, N, -1)
        bag_tiled = jnp.broadcast_to(
            (bag.astype(jnp.float32) / self.bag_scale)[:, None, :],
            (B, N, bag.shape[-1]))
        scalars = jnp.concatenate([charge_feats, bag_tiled], axis=-1)

        dtype = _as_dtype(self.compute_dtype) or jnp.float32
        tau0 = self.num_channels_hidden
        x0 = nn.Dense(tau0, name='input_linear',
                      dtype=_as_dtype(self.compute_dtype))(scalars)  # [B, N, tau0]
        # l=0 rep as separate complex parts: [B, N, tau0, 1] each (m axis
        # singleton, imag part zero). The stacked trailing-complex layout is
        # only materialized ONCE, at the encoder output — the per-level
        # stack/slice interleave copies were a top cost in the traced step.
        atom_r = (x0 * atom_mask[..., None].astype(x0.dtype))[..., None]
        atom_i = jnp.zeros_like(atom_r)
        atom_n_ells = 1

        # per l: [B, N, N, 2l+1, 2]; computed in f32, packed once for all
        # levels, then cast to the compute dtype.
        sph, norms = spherical_harmonics_rel(self.maxl, positions, positions,
                                             conj=True)
        sph_packed = pack_so3(sph).astype(dtype)

        channels = [self.num_channels_hidden] * (self.num_cg_levels - 1) + \
            [self.num_channels_out]
        for level, tau_out in enumerate(channels):
            rad = RadialFiltersStacked(
                maxl=self.maxl, tau=atom_r.shape[-2],
                hard_cut=self.hard_cut, soft_cut=self.soft_cut,
                soft_width=self.soft_width, compute_dtype=self.compute_dtype,
                name=f'radial_{level}')(norms, edge_mask)
            atom_r, atom_i = CGLevelPacked(maxl=self.maxl, tau_out=tau_out,
                                           atom_n_ells=atom_n_ells,
                                           gain=self.level_gain,
                                           name=f'cg_level_{level}')(
                                               atom_r, atom_i, sph_packed,
                                               rad, atom_mask)
            atom_n_ells = self.maxl + 1
        atom_packed = jnp.stack([atom_r, atom_i], axis=-1)
        return unpack_so3(atom_packed.astype(jnp.float32), self.maxl + 1)


class CormorantMixer(nn.Module):
    """Condition covariants on another rep: ag = other (x) in; sq = ag (x) ag;
    out = CatMix([ag, sq, in]) (reference CormorantMixer,
    covariant/modules.py:138-190). Packed-form implementation (same math as
    the per-l loop modules; see CGLevelPacked)."""
    maxl: int
    tau_out: int
    gain: float = 1.0

    @nn.compact
    def __call__(self, atom_rep: SO3Vec, other_rep: SO3Vec) -> SO3Vec:
        n_other, n_atom = len(other_rep), len(atom_rep)
        other = pack_so3(other_rep)
        atom = pack_so3(atom_rep)
        ag_k, ag_slices = cg_product_packed(other, atom, n_other, n_atom,
                                            self.maxl)
        ag = PackedCatMix(maxl=self.maxl, tau_out=self.tau_out, gain=1.0,
                          name='ag_mix')([(ag_k, ag_slices)])
        n_ells = self.maxl + 1
        sq_k, sq_slices = cg_product_packed(ag, ag, n_ells, n_ells, self.maxl)
        out = PackedCatMix(maxl=self.maxl, tau_out=self.tau_out, gain=self.gain,
                          name='cat_mix')([
                              (ag, m_slices(n_ells, self.maxl)),
                              (sq_k, sq_slices),
                              (atom, m_slices(n_atom, self.maxl))])
        return unpack_so3(out, n_ells)
