"""Pallas TPU kernel for the fused Clebsch-Gordan contraction.

The packed CG product (ops/cg.py) is, per row r (= batch x atom x tau):

    out[r, k] = sum_{m,n} C[m*M2+n, k] * (a[r, m] *complex* b[r, n])

i.e. a complex outer product contracted against the static combined CG
table. The kernel expands a and b onto the (m, n) pair axis with two static
0/1 replication matmuls (MXU), forms the z[r, (m,n)] intermediate with VPU
elementwise complex products — it never exists in HBM — and contracts it
with ONE [R, M1*M2] x [M1*M2, K] matmul. (An earlier variant accumulated M1
small [R, M2] x [M2, K] matmuls from per-m lane slices.) Measured NEUTRAL
vs the XLA einsum path at SF6 shapes (12.77 vs 12.69 ms full fwd+bwd step):
unlike the N^2-sized edge aggregate (ops/pallas_agg.py), the elementwise
product runs on [B, N, tau]-sized tensors and is not layout-bound — so the
einsum path stays the default (ops/cg.py _CG_BACKEND).

TPU layout notes (hard-won):
  * real/imag travel as SEPARATE 2D operands — a trailing complex axis of
    size 2 would be lane-padded 2->128 by Mosaic (64x VMEM blowup);
  * Mosaic cannot reshape [R, M1, M2] -> [R, M1*M2] vectors, so the pair
    axis is produced by the replication matmuls, not a reshape.

Gradients flow through jax.custom_vjp (same loop structure, transposed
tables). Falls back to the XLA einsum path off-TPU; `interpret=True` is used
by the CPU test suite for accuracy checks against the einsum implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_TILE_R = 256


def _fwd_kernel(ar_ref, ai_ref, br_ref, bi_ref, repm_ref, tilem_ref, c_ref,
                or_ref, oi_ref):
    # a* [R, M1]  b* [R, M2]  repm [M1, P]  tilem [M2, P]  c [P, K]
    ar = ar_ref[:].astype(jnp.float32)
    ai = ai_ref[:].astype(jnp.float32)
    br = br_ref[:].astype(jnp.float32)
    bi = bi_ref[:].astype(jnp.float32)
    big_ar = jnp.dot(ar, repm_ref[:], preferred_element_type=jnp.float32)
    big_ai = jnp.dot(ai, repm_ref[:], preferred_element_type=jnp.float32)
    big_br = jnp.dot(br, tilem_ref[:], preferred_element_type=jnp.float32)
    big_bi = jnp.dot(bi, tilem_ref[:], preferred_element_type=jnp.float32)
    z_r = big_ar * big_br - big_ai * big_bi
    z_i = big_ar * big_bi + big_ai * big_br
    c = c_ref[:]
    or_ref[:] = jnp.dot(z_r, c, preferred_element_type=jnp.float32).astype(
        or_ref.dtype)
    oi_ref[:] = jnp.dot(z_i, c, preferred_element_type=jnp.float32).astype(
        oi_ref.dtype)


def _bwd_kernel(ar_ref, ai_ref, br_ref, bi_ref, repm_ref, tilem_ref,
                repm_t_ref, tilem_t_ref, ct_ref, gr_ref, gi_ref,
                dar_ref, dai_ref, dbr_ref, dbi_ref):
    ar = ar_ref[:].astype(jnp.float32)
    ai = ai_ref[:].astype(jnp.float32)
    br = br_ref[:].astype(jnp.float32)
    bi = bi_ref[:].astype(jnp.float32)
    g_r = gr_ref[:].astype(jnp.float32)
    g_i = gi_ref[:].astype(jnp.float32)
    dz_r = jnp.dot(g_r, ct_ref[:], preferred_element_type=jnp.float32)
    dz_i = jnp.dot(g_i, ct_ref[:], preferred_element_type=jnp.float32)
    big_ar = jnp.dot(ar, repm_ref[:], preferred_element_type=jnp.float32)
    big_ai = jnp.dot(ai, repm_ref[:], preferred_element_type=jnp.float32)
    big_br = jnp.dot(br, tilem_ref[:], preferred_element_type=jnp.float32)
    big_bi = jnp.dot(bi, tilem_ref[:], preferred_element_type=jnp.float32)
    # z_r = Ar Br - Ai Bi ; z_i = Ar Bi + Ai Br
    d_ar = dz_r * big_br + dz_i * big_bi
    d_ai = dz_i * big_br - dz_r * big_bi
    d_br = dz_r * big_ar + dz_i * big_ai
    d_bi = dz_i * big_ar - dz_r * big_ai
    dar_ref[:] = jnp.dot(d_ar, repm_t_ref[:],
                         preferred_element_type=jnp.float32).astype(
                             dar_ref.dtype)
    dai_ref[:] = jnp.dot(d_ai, repm_t_ref[:],
                         preferred_element_type=jnp.float32).astype(
                             dai_ref.dtype)
    dbr_ref[:] = jnp.dot(d_br, tilem_t_ref[:],
                         preferred_element_type=jnp.float32).astype(
                             dbr_ref.dtype)
    dbi_ref[:] = jnp.dot(d_bi, tilem_t_ref[:],
                         preferred_element_type=jnp.float32).astype(
                             dbi_ref.dtype)


def _pad_rows(x, pad):
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def _row_spec(width):
    return pl.BlockSpec((_TILE_R, width), lambda i: (i, 0))


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0))


@functools.lru_cache(maxsize=None)
def _make_row_fn(m1: int, m2: int, k: int, table_bytes: bytes,
                 interpret: bool):
    cflat = np.frombuffer(table_bytes, np.float32).reshape(m1 * m2, k)
    repm = np.kron(np.eye(m1, dtype=np.float32),
                   np.ones((1, m2), np.float32))
    tilem = np.kron(np.ones((1, m1), np.float32),
                    np.eye(m2, dtype=np.float32))
    tables_f = (repm, tilem, cflat)
    tables_b = (repm, tilem, repm.T.copy(), tilem.T.copy(), cflat.T.copy())

    def run_fwd(ar, ai, br, bi):
        rows = ar.shape[0]
        pad = (-rows) % _TILE_R
        args = [_pad_rows(x, pad) for x in (ar, ai, br, bi)]
        rp = rows + pad
        out_r, out_i = pl.pallas_call(
            _fwd_kernel,
            out_shape=(jax.ShapeDtypeStruct((rp, k), ar.dtype),
                       jax.ShapeDtypeStruct((rp, k), ar.dtype)),
            grid=(rp // _TILE_R, ),
            in_specs=[_row_spec(m1), _row_spec(m1), _row_spec(m2),
                      _row_spec(m2)] + [_full_spec(t.shape)
                                        for t in tables_f],
            out_specs=(_row_spec(k), _row_spec(k)),
            interpret=interpret,
        )(*args, *(jnp.asarray(t) for t in tables_f))
        return out_r[:rows], out_i[:rows]

    def run_bwd(ar, ai, br, bi, g_r, g_i):
        rows = ar.shape[0]
        pad = (-rows) % _TILE_R
        args = [_pad_rows(x, pad) for x in (ar, ai, br, bi, g_r, g_i)]
        rp = rows + pad
        dar, dai, dbr, dbi = pl.pallas_call(
            _bwd_kernel,
            out_shape=(jax.ShapeDtypeStruct((rp, m1), ar.dtype),
                       jax.ShapeDtypeStruct((rp, m1), ai.dtype),
                       jax.ShapeDtypeStruct((rp, m2), br.dtype),
                       jax.ShapeDtypeStruct((rp, m2), bi.dtype)),
            grid=(rp // _TILE_R, ),
            in_specs=[_row_spec(m1), _row_spec(m1), _row_spec(m2),
                      _row_spec(m2)] + [_full_spec(t.shape)
                                        for t in tables_b] +
                     [_row_spec(k), _row_spec(k)],
            out_specs=(_row_spec(m1), _row_spec(m1), _row_spec(m2),
                       _row_spec(m2)),
            interpret=interpret,
        )(*args[:4], *(jnp.asarray(t) for t in tables_b), *args[4:])
        return dar[:rows], dai[:rows], dbr[:rows], dbi[:rows]

    @jax.custom_vjp
    def fused(ar, ai, br, bi):
        return run_fwd(ar, ai, br, bi)

    def fwd(ar, ai, br, bi):
        return run_fwd(ar, ai, br, bi), (ar, ai, br, bi)

    def bwd(res, grads):
        return run_bwd(*res, *grads)

    fused.defvjp(fwd, bwd)
    return fused


def cg_contract_pallas(a_pack: jnp.ndarray, b_pack: jnp.ndarray,
                       table: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """a_pack: [..., M1, 2]; b_pack: [..., M2, 2]; table: [M1, M2, K]
    -> [..., K, 2]. Leading dims are flattened into the row axis."""
    lead = a_pack.shape[:-2]
    m1 = a_pack.shape[-2]
    m2 = b_pack.shape[-2]
    k = table.shape[-1]

    ar = a_pack[..., 0].reshape(-1, m1)
    ai = a_pack[..., 1].reshape(-1, m1)
    br = b_pack[..., 0].reshape(-1, m2)
    bi = b_pack[..., 1].reshape(-1, m2)

    fused = _make_row_fn(
        m1, m2, k,
        np.ascontiguousarray(np.asarray(table), np.float32).tobytes(),
        interpret)
    out_r, out_i = fused(ar, ai, br, bi)
    out = jnp.stack([out_r, out_i], axis=-1)
    return out.reshape(lead + (k, 2))
