"""Fused Pallas TPU kernel for the covariant edge aggregation.

The hot op of the Cormorant encoder (agents/cormorant.py CGLevelPacked) is

    out[b,i,t,k] = sum_{m,n} C[m,n,k] * sum_j  e[b,i,j,t,m] * q[b,j,t,n]
    e[b,i,j,t,m] = rad[b,i,j,t,l(m)] * Y[b,i,j,m]            (complex e, Y, q)

i.e. edge-rep construction (radial gate x relative spherical harmonics)
followed by the neighborhood CG tensor product (cormorant CGProduct with
aggregate=True; einsum oracle: ops/cg.py::cg_aggregate_packed). The XLA
einsum path materializes the [B,N,N,tau,M] edge tensor and a contraction
intermediate in HBM — both heavily lane-padded under TPU (8,128) tiling, with
layout copies around the convolution custom-calls dominating the profile
(experiments/perf/). Here the edge rep and the z intermediate live only in
VMEM: per (m, j) the kernel forms e on the fly with VPU broadcasts and
accumulates M1 MXU matmuls against per-m slabs of the CG table.

Data layout is strictly 2D (rows x lanes) to stay inside Mosaic's supported
reshape set: rows r = (batch, atom_i, tau) flattened OUTSIDE the kernel by
XLA (leading-dim collapses only), lanes hold (j, m) / (j, n) / (j, l) groups.

Complex numbers travel as separate real/imag operands (a trailing axis of 2
would be lane-padded 2->128). The backward is a second kernel with the same
loop structure, wired through jax.custom_vjp; gradients flow to the radial
features and the atom rep. The spherical harmonics receive no gradient
(positions are inputs, not parameters, in every PPO training path) — enforced
via stop_gradient at the entry point.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_ROW_TILE = 512


def _l_of_m(n_ells: int) -> Tuple[int, ...]:
    out = []
    for l in range(n_ells):
        out.extend([l] * (2 * l + 1))
    return tuple(out)


# ---------------------------------------------------------------------------
# kernels (all operands 2D: [rows, lanes])
# ---------------------------------------------------------------------------

def _fwd_kernel(p_r_ref, p_i_ref, rad_ref, q_r_ref, q_i_ref, c_ref,
                out_r_ref, out_i_ref, *, n_j, m1, m2, ell_of_m, n_l):
    # p_*  [R, n_j*m1] (j-major)   rad [R, n_j*n_l] (j-major)
    # q_*  [R, n_j*m2] (j-major)   c   [m1, m2, K]      out_* [R, K]
    k = c_ref.shape[-1]
    rows = p_r_ref.shape[0]
    p_r, p_i = p_r_ref[:].astype(jnp.float32), p_i_ref[:].astype(jnp.float32)
    rad = rad_ref[:].astype(jnp.float32)
    q_r, q_i = q_r_ref[:].astype(jnp.float32), q_i_ref[:].astype(jnp.float32)

    acc_r = jnp.zeros((rows, k), jnp.float32)
    acc_i = jnp.zeros((rows, k), jnp.float32)
    for m in range(m1):
        l = ell_of_m[m]
        z_r = jnp.zeros((rows, m2), jnp.float32)
        z_i = jnp.zeros((rows, m2), jnp.float32)
        for j in range(n_j):
            e_r = rad[:, j * n_l + l:j * n_l + l + 1] * \
                p_r[:, j * m1 + m:j * m1 + m + 1]          # [R, 1]
            e_i = rad[:, j * n_l + l:j * n_l + l + 1] * \
                p_i[:, j * m1 + m:j * m1 + m + 1]
            qr = q_r[:, j * m2:(j + 1) * m2]               # [R, m2]
            qi = q_i[:, j * m2:(j + 1) * m2]
            z_r = z_r + e_r * qr - e_i * qi
            z_i = z_i + e_r * qi + e_i * qr
        cm = c_ref[m]                                      # [m2, K]
        acc_r = acc_r + jnp.dot(z_r, cm, preferred_element_type=jnp.float32)
        acc_i = acc_i + jnp.dot(z_i, cm, preferred_element_type=jnp.float32)
    out_r_ref[:] = acc_r.astype(out_r_ref.dtype)
    out_i_ref[:] = acc_i.astype(out_i_ref.dtype)


def _bwd_kernel(p_r_ref, p_i_ref, rad_ref, q_r_ref, q_i_ref, ct_ref,
                g_r_ref, g_i_ref, drad_ref, dq_r_ref, dq_i_ref,
                *, n_j, m1, m2, ell_of_m, n_l):
    # ct [m1, K, m2] (per-m transposed slabs); g_* [R, K]
    p_r, p_i = p_r_ref[:].astype(jnp.float32), p_i_ref[:].astype(jnp.float32)
    rad = rad_ref[:].astype(jnp.float32)
    q_r, q_i = q_r_ref[:].astype(jnp.float32), q_i_ref[:].astype(jnp.float32)
    g_r, g_i = g_r_ref[:].astype(jnp.float32), g_i_ref[:].astype(jnp.float32)
    rows = p_r.shape[0]

    dq_r = [jnp.zeros((rows, m2), jnp.float32) for _ in range(n_j)]
    dq_i = [jnp.zeros((rows, m2), jnp.float32) for _ in range(n_j)]
    drad = [jnp.zeros((rows, n_l), jnp.float32) for _ in range(n_j)]
    for m in range(m1):
        l = ell_of_m[m]
        ctm = ct_ref[m]                                    # [K, m2]
        dz_r = jnp.dot(g_r, ctm, preferred_element_type=jnp.float32)
        dz_i = jnp.dot(g_i, ctm, preferred_element_type=jnp.float32)
        for j in range(n_j):
            r_jl = rad[:, j * n_l + l:j * n_l + l + 1]     # [R, 1]
            pr = p_r[:, j * m1 + m:j * m1 + m + 1]
            pi = p_i[:, j * m1 + m:j * m1 + m + 1]
            e_r, e_i = r_jl * pr, r_jl * pi
            qr = q_r[:, j * m2:(j + 1) * m2]
            qi = q_i[:, j * m2:(j + 1) * m2]
            # dq += conj(e) * dz      (per row; host reduces over atom_i)
            dq_r[j] = dq_r[j] + e_r * dz_r + e_i * dz_i
            dq_i[j] = dq_i[j] + e_r * dz_i - e_i * dz_r
            # de = sum_n conj(q) * dz ;  drad = Re(conj(p) * de)
            de_r = jnp.sum(qr * dz_r + qi * dz_i, axis=-1, keepdims=True)
            de_i = jnp.sum(qr * dz_i - qi * dz_r, axis=-1, keepdims=True)
            contrib = pr * de_r + pi * de_i                # [R, 1]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_l), 1)
            drad[j] = drad[j] + jnp.where(lane == l, contrib, 0.0)
    drad_ref[:] = jnp.concatenate(drad, axis=-1).astype(drad_ref.dtype)
    dq_r_ref[:] = jnp.concatenate(dq_r, axis=-1).astype(dq_r_ref.dtype)
    dq_i_ref[:] = jnp.concatenate(dq_i, axis=-1).astype(dq_i_ref.dtype)


# ---------------------------------------------------------------------------
# custom-vjp wrapper over 2D row operands (table closed over per config)
# ---------------------------------------------------------------------------

def _pad_rows(x, pad):
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def _row_spec(width):
    return pl.BlockSpec((_ROW_TILE, width), lambda i: (i, 0))


@functools.lru_cache(maxsize=None)
def _make_row_fn(n_j: int, m1: int, m2: int, n_l: int, k: int,
                 table_bytes: bytes, interpret: bool):
    table3 = np.frombuffer(table_bytes, np.float32).reshape(m1, m2, k)
    ell = _l_of_m(n_l)

    def run_fwd(p_r, p_i, rad, q_r, q_i):
        rows = p_r.shape[0]
        pad = (-rows) % _ROW_TILE
        args = [_pad_rows(x, pad) for x in (p_r, p_i, rad, q_r, q_i)]
        rp = rows + pad
        kernel = functools.partial(_fwd_kernel, n_j=n_j, m1=m1, m2=m2,
                                   ell_of_m=ell, n_l=n_l)
        out_r, out_i = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((rp, k), p_r.dtype),
                       jax.ShapeDtypeStruct((rp, k), p_r.dtype)),
            grid=(rp // _ROW_TILE, ),
            in_specs=[_row_spec(n_j * m1), _row_spec(n_j * m1),
                      _row_spec(n_j * n_l), _row_spec(n_j * m2),
                      _row_spec(n_j * m2),
                      pl.BlockSpec((m1, m2, k), lambda i: (0, 0, 0))],
            out_specs=(_row_spec(k), _row_spec(k)),
            interpret=interpret,
        )(*args, jnp.asarray(table3))
        return out_r[:rows], out_i[:rows]

    def run_bwd(p_r, p_i, rad, q_r, q_i, g_r, g_i):
        rows = p_r.shape[0]
        pad = (-rows) % _ROW_TILE
        args = [_pad_rows(x, pad)
                for x in (p_r, p_i, rad, q_r, q_i, g_r, g_i)]
        rp = rows + pad
        table_t = np.ascontiguousarray(table3.transpose(0, 2, 1))
        kernel = functools.partial(_bwd_kernel, n_j=n_j, m1=m1, m2=m2,
                                   ell_of_m=ell, n_l=n_l)
        drad, dq_r, dq_i = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((rp, n_j * n_l), rad.dtype),
                       jax.ShapeDtypeStruct((rp, n_j * m2), q_r.dtype),
                       jax.ShapeDtypeStruct((rp, n_j * m2), q_i.dtype)),
            grid=(rp // _ROW_TILE, ),
            in_specs=[_row_spec(n_j * m1), _row_spec(n_j * m1),
                      _row_spec(n_j * n_l), _row_spec(n_j * m2),
                      _row_spec(n_j * m2),
                      pl.BlockSpec((m1, k, m2), lambda i: (0, 0, 0)),
                      _row_spec(k), _row_spec(k)],
            out_specs=(_row_spec(n_j * n_l), _row_spec(n_j * m2),
                       _row_spec(n_j * m2)),
            interpret=interpret,
        )(*args[:5], jnp.asarray(table_t), *args[5:])
        return drad[:rows], dq_r[:rows], dq_i[:rows]

    @jax.custom_vjp
    def fused(p_r, p_i, rad, q_r, q_i):
        return run_fwd(p_r, p_i, rad, q_r, q_i)

    def fwd(p_r, p_i, rad, q_r, q_i):
        return run_fwd(p_r, p_i, rad, q_r, q_i), (p_r, p_i, rad, q_r, q_i)

    def bwd(res, grads):
        p_r, p_i, rad, q_r, q_i = res
        g_r, g_i = grads
        drad, dq_r, dq_i = run_bwd(p_r, p_i, rad, q_r, q_i, g_r, g_i)
        zero = jnp.zeros_like(p_r)
        return zero, zero, drad, dq_r, dq_i

    fused.defvjp(fwd, bwd)
    return fused


# ---------------------------------------------------------------------------
# public entry: packed SO3 shapes in, packed K-form out
# ---------------------------------------------------------------------------

def cg_aggregate_edge_fused(sph_packed: jnp.ndarray, rad_feats: jnp.ndarray,
                            atom_packed: jnp.ndarray, table3: np.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    """Fused edge-build + CG aggregate.

    sph_packed  [B, N, N, M1, 2]   conj relative SH (no gradient)
    rad_feats   [B, N, N, tau, L]  gated radial features
    atom_packed [B, N, tau, M2, 2] packed atom rep
    table3      [M1, M2, K] combined CG block table (cg._fused_cg_table)
    returns packed K-form [B, N, tau, K, 2].
    """
    B, N, _, tau, n_l = rad_feats.shape
    m1 = sph_packed.shape[-2]
    m2 = atom_packed.shape[-2]
    k = table3.shape[-1]
    rows = B * N * tau

    sph = jax.lax.stop_gradient(sph_packed)
    # rows r = (b, i, t); lanes j-major. Leading-dim collapses + broadcasts
    # only — XLA fuses these into the producing ops.
    p = jnp.broadcast_to(sph[:, :, None], (B, N, tau, N, m1, 2))
    p = p.reshape(rows, N * m1, 2)
    rad = jnp.swapaxes(rad_feats, 2, 3).reshape(rows, N * n_l)
    q = jnp.broadcast_to(jnp.swapaxes(atom_packed, 1, 2)[:, None],
                         (B, N, tau, N, m2, 2)).reshape(rows, N * m2, 2)

    fused = _make_row_fn(N, m1, m2, n_l, k,
                         np.ascontiguousarray(table3, np.float32).tobytes(),
                         interpret)
    out_r, out_i = fused(p[..., 0], p[..., 1], rad, q[..., 0], q[..., 1])
    out = jnp.stack([out_r, out_i], axis=-1)
    return out.reshape(B, N, tau, k, 2)
