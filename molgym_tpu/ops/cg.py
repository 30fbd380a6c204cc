"""Clebsch-Gordan algebra: coefficient tables and tensor products.

Replaces cormorant's CGDict / CGProduct (used throughout the reference's
covariant stack, molgym/agents/covariant/modules.py:4-8). Coefficients are
computed exactly on the host (float64, explicit Racah formula) and baked into
the compiled program as static arrays; products are dense einsums over the
(2l1+1, 2l2+1, 2l+1) tables — on TPU these contractions map onto the MXU and
XLA fuses the real/imag combination arithmetic.

Complex layout everywhere: trailing axis of size 2 = (real, imag).
SO3Vec = tuple/list of arrays, entry l shaped [..., tau_l, 2l+1, 2].
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _cg_coefficient(l1: int, m1: int, l2: int, m2: int, l: int, m: int) -> float:
    """<l1 m1 l2 m2 | l m> via the Racah closed form (exact, float64)."""
    if m1 + m2 != m or l < abs(l1 - l2) or l > l1 + l2:
        return 0.0
    if abs(m1) > l1 or abs(m2) > l2 or abs(m) > l:
        return 0.0
    f = math.factorial
    prefactor = math.sqrt(
        (2 * l + 1) * f(l + l1 - l2) * f(l - l1 + l2) * f(l1 + l2 - l) /
        f(l1 + l2 + l + 1))
    prefactor *= math.sqrt(
        f(l + m) * f(l - m) * f(l1 - m1) * f(l1 + m1) * f(l2 - m2) * f(l2 + m2))
    total = 0.0
    k_min = max(0, l2 - l - m1, l1 + m2 - l)
    k_max = min(l1 + l2 - l, l1 - m1, l2 + m2)
    for k in range(k_min, k_max + 1):
        denom = (f(k) * f(l1 + l2 - l - k) * f(l1 - m1 - k) * f(l2 + m2 - k) *
                 f(l - l2 + m1 + k) * f(l - l1 - m2 + k))
        total += ((-1.0) ** k) / denom
    return prefactor * total


@lru_cache(maxsize=None)
def cg_table(l1: int, l2: int, l: int) -> np.ndarray:
    """Dense table [2l1+1, 2l2+1, 2l+1] with m indices ascending from -l."""
    table = np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l + 1), dtype=np.float64)
    for i1, m1 in enumerate(range(-l1, l1 + 1)):
        for i2, m2 in enumerate(range(-l2, l2 + 1)):
            m = m1 + m2
            if -l <= m <= l:
                table[i1, i2, m + l] = _cg_coefficient(l1, m1, l2, m2, l, m)
    return table


def _complex_contract(a: jnp.ndarray, b: jnp.ndarray, table: jnp.ndarray,
                      pattern: str) -> jnp.ndarray:
    """einsum with complex (real/imag stacked) operands; `pattern` contracts
    the m indices against the CG table, e.g. '...tm,...tn,mnk->...tk'."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    rr = jnp.einsum(pattern, ar, br, table)
    ii = jnp.einsum(pattern, ai, bi, table)
    ri = jnp.einsum(pattern, ar, bi, table)
    ir = jnp.einsum(pattern, ai, br, table)
    return jnp.stack([rr - ii, ri + ir], axis=-1)


def _pair_taus(t1: int, t2: int) -> int:
    assert t1 == t2 or t1 == 1 or t2 == 1, \
        f'CG product needs matching or broadcastable taus, got {t1}, {t2}'
    return max(t1, t2)


# ---------------------------------------------------------------------------
# Fused path: ONE packed contraction per CG product.
#
# Per-(l1,l2,l) einsums generate hundreds of tiny HLO ops per product (25 l
# pairs x up to 5 outputs at maxl=4), which blows up both XLA compile time
# and MXU utilization. Instead all l blocks are packed along the m axis
# (M = sum_l 2l+1) and contracted against a single combined block table
# C[M1, M2, K_out] built host-side — one big (complex) einsum the MXU tiles
# well. Output layout matches the loop implementation exactly (per l, pairs
# concatenated along tau) — verified in tests/covariant/test_so3_ops.py.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _fused_cg_table(n_ells1: int, n_ells2: int, maxl: int):
    """Combined table [M1, M2, K] + unpack metadata.

    K slots are grouped by output l; within an l, (l1, l2) pairs in loop
    order, each occupying 2l+1 consecutive slots.
    Returns (table float32 [M1, M2, K], slices: list over l of
    (offset, n_pairs)).
    """
    m1_tot = sum(2 * l + 1 for l in range(n_ells1))
    m2_tot = sum(2 * l + 1 for l in range(n_ells2))
    off1 = np.cumsum([0] + [2 * l + 1 for l in range(n_ells1)])
    off2 = np.cumsum([0] + [2 * l + 1 for l in range(n_ells2)])

    blocks = []  # (l, l1, l2)
    for l in range(maxl + 1):
        for l1 in range(n_ells1):
            for l2 in range(n_ells2):
                if abs(l1 - l2) <= l <= l1 + l2:
                    blocks.append((l, l1, l2))
    k_tot = sum(2 * l + 1 for (l, _l1, _l2) in blocks)

    table = np.zeros((m1_tot, m2_tot, k_tot), dtype=np.float32)
    slices = [[0, 0] for _ in range(maxl + 1)]
    k = 0
    for l in range(maxl + 1):
        slices[l][0] = k
        for (lo, l1, l2) in blocks:
            if lo != l:
                continue
            sub = cg_table(l1, l2, l).astype(np.float32)
            table[off1[l1]:off1[l1 + 1], off2[l2]:off2[l2 + 1],
                  k:k + 2 * l + 1] = sub
            slices[l][1] += 1
            k += 2 * l + 1
    return table, tuple((s[0], s[1]) for s in slices)


@lru_cache(maxsize=None)
def fused_cg_table_grouped(n_ells1: int, n_ells2: int, maxl: int):
    """l1-grouped compaction of the fused CG table for the edge kernel.

    The combined table C[(m1, m2), k] is block-sparse: column k belongs to
    exactly one (l1, l2) pair, so its nonzeros live in the single m1 block of
    l1 — contracting the full [M1*M2, K] table wastes >90% of the MXU tile
    passes on structural zeros at maxl=4 (15 passes vs 7 grouped). Grouping
    the contraction by l1 compacts each group's columns: the kernel contracts
    z's contiguous l1 pair-lane range against a dense [w1*M2, K_g] sub-table
    and emits the K axis in l1-major (permuted) order; the permutation is
    absorbed STATICALLY by the consumer's mix-weight scatter table
    (PackedCatMix idx-form slices), so no runtime gather exists anywhere.

    Returns None when grouping does not reduce MXU tile passes (e.g. the
    n_ells2=1 first level, where the dense table is a single tile). Else
    (tables, perm, slices_idx):
      tables      tuple per l1 of float32 [w1 * M2, K_g] (empty groups kept
                  as zero-column arrays so group index == l1)
      perm        int array [K], grouped position -> original column
      slices_idx  per output l: (idx, n_pairs) with idx a tuple of grouped
                  positions for the flattened (pair, m) axis — the idx-form
                  slices contract PackedCatMix consumes.
    """
    table, slices = _fused_cg_table(n_ells1, n_ells2, maxl)
    m1_tot, m2_tot, k_tot = table.shape
    off1 = np.cumsum([0] + [2 * l + 1 for l in range(n_ells1)])

    # column -> l1 group, from the same block enumeration as _fused_cg_table
    col_l1 = np.zeros(k_tot, np.int64)
    k = 0
    for l in range(maxl + 1):
        for l1 in range(n_ells1):
            for l2 in range(n_ells2):
                if abs(l1 - l2) <= l <= l1 + l2:
                    col_l1[k:k + 2 * l + 1] = l1
                    k += 2 * l + 1
    assert k == k_tot

    def ceil128(n):
        return -(-n // 128)

    groups = [np.flatnonzero(col_l1 == l1) for l1 in range(n_ells1)]
    dense_passes = ceil128(m1_tot * m2_tot) * ceil128(k_tot)
    grouped_passes = sum(
        ceil128((2 * l1 + 1) * m2_tot) * ceil128(len(g))
        for l1, g in enumerate(groups) if len(g))
    if grouped_passes >= dense_passes:
        return None

    flat = table.reshape(m1_tot * m2_tot, k_tot)
    tables = tuple(
        np.ascontiguousarray(
            flat[off1[l1] * m2_tot:off1[l1 + 1] * m2_tot, g], np.float32)
        for l1, g in enumerate(groups))
    perm = np.concatenate([g for g in groups if len(g)]).astype(np.int64)
    inv = np.empty(k_tot, np.int64)
    inv[perm] = np.arange(k_tot)

    slices_idx = []
    for l in range(maxl + 1):
        off, pairs = slices[l]
        width = 2 * l + 1
        idx = tuple(int(inv[off + p * width + m])
                    for p in range(pairs) for m in range(width))
        slices_idx.append((idx, pairs))
    return tables, perm, tuple(slices_idx)


@lru_cache(maxsize=None)
def fused_cg_table_tri(n_ells: int, maxl: int):
    """Triangular fold of the SQUARE's fused CG table (self product a⊗a).

    Both parts of z[m, n] = a_m a_n are symmetric in (m, n) for the self
    product (z_r = ar⊗ar − ai⊗ai, z_i = ar⊗ai + ai⊗ar), so the kernel only
    needs the M(M+1)/2 tri pairs m ≤ n instead of all M²:
    C_tri[(m, n), k] = C[m, n, k] + C[n, m, k] for m < n, C[m, m, k] on the
    diagonal — the contraction Σ_{mn} z C is unchanged. Tri pairs in m-major
    order are automatically contiguous per m-block (flat index order respects
    block order), and column k of ordered blocks (l1, l2) folds into group
    min(l1, l2) — the final contraction groups by lmin with compacted columns
    exactly like fused_cg_table_grouped, reusing its permuted-K consumer
    contract (PackedCatMix idx-form slices).

    Returns (pairs, groups, perm, slices_idx):
      pairs       int32 [P, 2] tri (m, n) pairs, m-major
      groups      tuple per lmin of (row_a, row_b, table float32 [P_g, K_g])
                  — empty column groups kept so group index == lmin
      perm        int [K] grouped position -> original column
      slices_idx  per output l: (idx tuple, n_pairs) consumer slices
    """
    table, slices = _fused_cg_table(n_ells, n_ells, maxl)
    m_tot, _, k_tot = table.shape
    off1 = np.cumsum([0] + [2 * l + 1 for l in range(n_ells)])
    block = np.searchsorted(off1, np.arange(m_tot), side='right') - 1

    pairs = np.array([(m, n) for m in range(m_tot) for n in range(m, m_tot)],
                     np.int32)
    folded = table[pairs[:, 0], pairs[:, 1], :].copy()
    off_diag = pairs[:, 0] != pairs[:, 1]
    folded[off_diag] += table[pairs[off_diag, 1], pairs[off_diag, 0], :]

    # column -> lmin group, from the same block enumeration as _fused_cg_table
    col_lmin = np.zeros(k_tot, np.int64)
    k = 0
    for l in range(maxl + 1):
        for l1 in range(n_ells):
            for l2 in range(n_ells):
                if abs(l1 - l2) <= l <= l1 + l2:
                    col_lmin[k:k + 2 * l + 1] = min(l1, l2)
                    k += 2 * l + 1
    assert k == k_tot

    row_block = block[pairs[:, 0]]  # tri rows group by the m block
    groups = []
    for lmin in range(n_ells):
        rows = np.flatnonzero(row_block == lmin)
        a, b = (int(rows[0]), int(rows[-1]) + 1) if len(rows) else (0, 0)
        cols = np.flatnonzero(col_lmin == lmin)
        groups.append((a, b, np.ascontiguousarray(folded[a:b][:, cols],
                                                  np.float32)))
    perm = np.concatenate([np.flatnonzero(col_lmin == g)
                           for g in range(n_ells)]).astype(np.int64)
    inv = np.empty(k_tot, np.int64)
    inv[perm] = np.arange(k_tot)

    slices_idx = []
    for l in range(maxl + 1):
        off, n_pairs = slices[l]
        width = 2 * l + 1
        idx = tuple(int(inv[off + p * width + m])
                    for p in range(n_pairs) for m in range(width))
        slices_idx.append((idx, n_pairs))
    return pairs, tuple(groups), perm, tuple(slices_idx)


def _broadcast_taus(rep1, rep2):
    taus = [max(a.shape[-3] for a in rep1), max(b.shape[-3] for b in rep2)]
    tau = _pair_taus(taus[0], taus[1])

    def expand(rep):
        out = []
        for a in rep:
            t = a.shape[-3]
            assert t == tau or t == 1, f'per-l tau {t} vs {tau}'
            if t != tau:
                a = jnp.broadcast_to(a, a.shape[:-3] + (tau, ) + a.shape[-2:])
            out.append(a)
        return out

    return expand(rep1), expand(rep2), tau


def _pack_m(rep) -> jnp.ndarray:
    return jnp.concatenate(list(rep), axis=-2)  # [..., tau, M, 2]


def _unpack_out(out_flat: jnp.ndarray, slices, maxl: int) -> List[jnp.ndarray]:
    """out_flat [..., tau, K, 2] -> per-l [..., n_pairs*tau, 2l+1, 2] with the
    loop implementation's pair-major tau concat order."""
    outs = []
    for l in range(maxl + 1):
        offset, n_pairs = slices[l]
        width = n_pairs * (2 * l + 1)
        part = out_flat[..., :, offset:offset + width, :]
        shape = part.shape
        tau = shape[-3]
        part = part.reshape(shape[:-2] + (n_pairs, 2 * l + 1, 2))
        part = jnp.moveaxis(part, -3, -4)  # [..., n_pairs, tau, 2l+1, 2]
        part = part.reshape(shape[:-3] + (n_pairs * tau, 2 * l + 1, 2))
        outs.append(part)
    return outs


# Contraction backend for the elementwise CG product: 'einsum' (XLA) or
# 'pallas' (fused outer-product + MXU matmul kernel, ops/pallas_cg.py).
# 'auto' resolves per default backend like the aggregate below.
_CG_BACKEND = 'einsum'


def _cg_backend_resolved() -> str:
    if _CG_BACKEND == 'auto':
        import jax
        return 'pallas' if jax.default_backend() == 'tpu' else 'einsum'
    return _CG_BACKEND

# Backend for the fused edge-build + CG aggregate in the encoder's CG levels:
# 'einsum' (XLA; materializes the edge tensor in HBM) or 'pallas'
# (ops/pallas_agg.py; edge rep and contraction intermediate stay in VMEM).
# 'auto' resolves to the Pallas kernel on TPU — measured 14.6 -> 12.7 ms
# fwd+bwd per SF6 minibatch in f32 and 12.5 -> 10.9 ms in bf16 on v5e
# (experiments/perf/) — and to einsum elsewhere (Pallas is interpret-only on
# the CPU backend).
_AGG_BACKEND = 'auto'


def set_cg_backend(backend: str) -> None:
    global _CG_BACKEND
    assert backend in ('auto', 'einsum', 'pallas', 'pallas_interpret')
    _CG_BACKEND = backend


def set_aggregate_backend(backend: str) -> None:
    global _AGG_BACKEND
    assert backend in ('auto', 'einsum', 'pallas', 'pallas_interpret')
    _AGG_BACKEND = backend


def aggregate_backend() -> str:
    if _AGG_BACKEND == 'auto':
        import jax
        return 'pallas' if jax.default_backend() == 'tpu' else 'einsum'
    return _AGG_BACKEND


# Backend for the level's CG *square* (self product): the Pallas row kernel
# keeps the [rows, M*M] outer-product intermediate in VMEM
# (pallas_agg.cg_square_fused_ri) instead of materializing it in HBM like
# the einsum path. 'auto' follows the aggregate backend.
_SQUARE_BACKEND = 'auto'


def set_square_backend(backend: str) -> None:
    global _SQUARE_BACKEND
    assert backend in ('auto', 'einsum', 'pallas', 'pallas_interpret')
    _SQUARE_BACKEND = backend


def square_backend() -> str:
    if _SQUARE_BACKEND == 'auto':
        return aggregate_backend()
    return _SQUARE_BACKEND


def cg_product(rep1: Sequence[jnp.ndarray], rep2: Sequence[jnp.ndarray],
               maxl: int) -> List[jnp.ndarray]:
    """Channel-wise CG tensor product of two SO3Vecs (cormorant CGProduct with
    aggregate=False): fused single-contraction path. Output entry l
    concatenates, along tau, the (l1, l2) pairs with
    |l1-l2| <= l <= min(l1+l2, maxl)."""
    rep1, rep2, _tau = _broadcast_taus(rep1, rep2)
    out, slices = cg_product_packed(_pack_m(rep1), _pack_m(rep2),
                                    len(rep1), len(rep2), maxl)
    return _unpack_out(out, slices, maxl)


# ---------------------------------------------------------------------------
# Packed-form API. A packed SO3 rep keeps all l blocks concatenated along one
# m axis ([..., tau, M, 2], M = sum_l (2l+1), uniform tau across l). The CG
# level can then run end-to-end without per-l concatenates or the
# tau<->pair unpack transposes on its largest (B x N^2-sized) tensors —
# those data-formatting copies were ~35% of the round-1 fwd+bwd step time
# on TPU (experiments/perf/).
# ---------------------------------------------------------------------------

def pack_so3(rep: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-l SO3Vec -> packed [..., tau, M, 2]."""
    return _pack_m(list(rep))


def unpack_so3(packed: jnp.ndarray, n_ells: int) -> List[jnp.ndarray]:
    """Packed [..., tau, M, 2] -> per-l list (pure slices, no transposes)."""
    outs, off = [], 0
    for l in range(n_ells):
        outs.append(packed[..., off:off + 2 * l + 1, :])
        off += 2 * l + 1
    return outs


def m_slices(n_ells: int, maxl: int) -> Tuple[Tuple[int, int], ...]:
    """Slice table of an M-form packed rep in the (offset, n_pairs) format of
    the fused-product tables: one 'pair' per l the rep carries, zero after."""
    out, off = [], 0
    for l in range(maxl + 1):
        if l < n_ells:
            out.append((off, 1))
            off += 2 * l + 1
        else:
            out.append((off, 0))
    return tuple(out)


def cg_product_packed(a: jnp.ndarray, b: jnp.ndarray, n_ells1: int,
                      n_ells2: int, maxl: int):
    """CG product of two packed reps; returns (packed_out [..., tau, K, 2],
    slices) with K-blocks grouped by output l, (l1, l2) pairs in loop order."""
    table_np, slices = _fused_cg_table(n_ells1, n_ells2, maxl)
    if _cg_backend_resolved().startswith('pallas'):
        from molgym_tpu.ops.pallas_cg import cg_contract_pallas
        out = cg_contract_pallas(a, b, table_np,
                                 interpret=_CG_BACKEND == 'pallas_interpret')
    else:
        # table in the operand dtype: under a bf16 compute path a f32 table
        # would promote every contraction back to f32.
        out = _complex_contract(a, b, jnp.asarray(table_np, dtype=a.dtype),
                                '...tm,...tn,mnk->...tk')
    return out, slices


def cg_product_packed_ri(a_r: jnp.ndarray, a_i: jnp.ndarray,
                         b_r: jnp.ndarray, b_i: jnp.ndarray,
                         n_ells1: int, n_ells2: int, maxl: int):
    """cg_product_packed with complex parts as SEPARATE arrays (no trailing
    complex axis => no T(2,128) interleave copies in the hot path).
    Returns ((out_r, out_i), slices).

    The complex combination happens BEFORE the table contraction: build the
    real/imag outer-product tensors U = ar(x)br - ai(x)bi and
    V = ar(x)bi + ai(x)br (elementwise, XLA-fusable), then contract each
    against the table once. The naive form — four independent einsums
    combined after — materialized four [rows, m1*m2] outer products on TPU
    (~750 us of the traced SF6 step); this form materializes two.
    """
    table_np, slices = _fused_cg_table(n_ells1, n_ells2, maxl)
    table = jnp.asarray(table_np, dtype=a_r.dtype)
    m1, m2, _k = table_np.shape
    u = (a_r[..., :, None] * b_r[..., None, :]
         - a_i[..., :, None] * b_i[..., None, :])    # [..., tau, m1, m2]
    v = (a_r[..., :, None] * b_i[..., None, :]
         + a_i[..., :, None] * b_r[..., None, :])
    tab2 = table.reshape(m1 * m2, -1)
    out_r = jnp.einsum('...tp,pk->...tk',
                       u.reshape(u.shape[:-2] + (m1 * m2,)), tab2)
    out_i = jnp.einsum('...tp,pk->...tk',
                       v.reshape(v.shape[:-2] + (m1 * m2,)), tab2)
    return (out_r, out_i), slices


def cg_aggregate_packed(edge: jnp.ndarray, atom: jnp.ndarray, n_ells_edge: int,
                        n_ells_atom: int, maxl: int):
    """Neighborhood-aggregating CG product on packed reps:
    edge [..., i, j, tau, M1, 2] x atom [..., j, tau, M2, 2]
    -> (out [..., i, tau, K, 2], slices); out_i = sum_j edge_ij (x)_CG atom_j."""
    table_np, slices = _fused_cg_table(n_ells_edge, n_ells_atom, maxl)
    out = _complex_contract(edge, atom, jnp.asarray(table_np, dtype=edge.dtype),
                            '...ijtm,...jtn,mnk->...itk')
    return out, slices


def cg_aggregate(edge_rep: Sequence[jnp.ndarray], atom_rep: Sequence[jnp.ndarray],
                 maxl: int) -> List[jnp.ndarray]:
    """Neighborhood-aggregating CG product (cormorant CGProduct with
    aggregate=True): out_i = sum_j edge_ij (x)_CG atom_j — fused path.

    edge_rep entry l2: [..., N, M, tau, 2*l2+1, 2]
    atom_rep entry l1: [..., M, tau, 2*l1+1, 2]
    output entry l:    [..., N, tau_out, 2*l+1, 2]
    """
    edge_rep, atom_rep, _tau = _broadcast_taus(edge_rep, atom_rep)
    # note argument order: the fused table is built as (edge l2, atom l1) to
    # match the loop implementation's cg_table(l2, l1, l) usage.
    out, slices = cg_aggregate_packed(_pack_m(edge_rep), _pack_m(atom_rep),
                                      len(edge_rep), len(atom_rep), maxl)
    return _unpack_out(out, slices, maxl)


def _cg_product_loops(rep1: Sequence[jnp.ndarray], rep2: Sequence[jnp.ndarray],
                      maxl: int) -> List[jnp.ndarray]:
    """Per-(l1,l2,l) loop implementation — reference semantics oracle for the
    fused path (tests cross-check both)."""
    ells1 = range(len(rep1))
    ells2 = range(len(rep2))
    out_parts: List[List[jnp.ndarray]] = [[] for _ in range(maxl + 1)]
    for l1 in ells1:
        for l2 in ells2:
            a, b = rep1[l1], rep2[l2]
            tau = _pair_taus(a.shape[-3], b.shape[-3])
            if a.shape[-3] != tau:
                a = jnp.broadcast_to(a, a.shape[:-3] + (tau, ) + a.shape[-2:])
            if b.shape[-3] != tau:
                b = jnp.broadcast_to(b, b.shape[:-3] + (tau, ) + b.shape[-2:])
            for l in range(abs(l1 - l2), min(l1 + l2, maxl) + 1):
                table = jnp.asarray(cg_table(l1, l2, l).astype(np.float32))
                out_parts[l].append(
                    _complex_contract(a, b, table, '...tm,...tn,mnk->...tk'))
    return [jnp.concatenate(parts, axis=-3) for parts in out_parts]


def _cg_aggregate_loops(edge_rep: Sequence[jnp.ndarray],
                        atom_rep: Sequence[jnp.ndarray],
                        maxl: int) -> List[jnp.ndarray]:
    """Loop implementation of cg_aggregate — semantics oracle for tests."""
    out_parts: List[List[jnp.ndarray]] = [[] for _ in range(maxl + 1)]
    for l2 in range(len(edge_rep)):
        for l1 in range(len(atom_rep)):
            e, a = edge_rep[l2], atom_rep[l1]
            tau = _pair_taus(e.shape[-3], a.shape[-3])
            if e.shape[-3] != tau:
                e = jnp.broadcast_to(e, e.shape[:-3] + (tau, ) + e.shape[-2:])
            if a.shape[-3] != tau:
                a = jnp.broadcast_to(a, a.shape[:-3] + (tau, ) + a.shape[-2:])
            for l in range(abs(l1 - l2), min(l1 + l2, maxl) + 1):
                table = jnp.asarray(cg_table(l2, l1, l).astype(np.float32))
                out_parts[l].append(
                    _complex_contract(e, a, table, '...ijtm,...jtn,mnk->...itk'))
    return [jnp.concatenate(parts, axis=-3) for parts in out_parts]


def cg_output_taus(taus1: Sequence[int], taus2: Sequence[int],
                   maxl: int) -> Tuple[int, ...]:
    """Channel counts of the cg_product output (cormorant CGProduct.tau)."""
    out = [0] * (maxl + 1)
    for l1, t1 in enumerate(taus1):
        for l2, t2 in enumerate(taus2):
            tau = _pair_taus(t1, t2)
            for l in range(abs(l1 - l2), min(l1 + l2, maxl) + 1):
                out[l] += tau
    return tuple(out)
