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
(experiments/perf/).

Here the z[r, (m,n)] = sum_j e[r,j,m] q[r,j,n] intermediate — the tensor the
einsum path cannot keep out of HBM — lives only in VMEM. Rows r = (batch,
atom_i, tau) are flattened outside the kernel; lanes hold (j, m) / (j, n)
groups. Per neighbor j the kernel expands the e / q slabs to the (m, n) pair
axis with two static 0/1 replication matmuls (MXU), forms z with VPU
elementwise complex products, and finishes with one [R, m1*m2] x [m1*m2, K]
matmul against the flattened CG table. Everything is slab-granular: no
per-(m, j) lane slicing (an earlier variant fully unrolled that loop and
overflowed Mosaic's 16M scoped-vmem stack with hundreds of live lane-padded
[R, 1] temporaries).

Complex numbers travel as separate real/imag operands (a trailing axis of 2
would be lane-padded 2->128). The edge rep e = rad_m * conj(Y) is built by
XLA *outside* the kernel in compact 2D row layout — XLA fuses the gather and
multiply into the producers, and the VJPs to the radial features and the atom
rep (neighbor-sum) fall out of the surrounding broadcast/reshape ops
automatically. The kernel's own backward is a second Pallas kernel with the
same loop structure wired through jax.custom_vjp. The spherical harmonics
receive no gradient (positions are inputs, not parameters, in every PPO
training path) — enforced via stop_gradient at the entry point.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

def _pick_row_tile(rows: int) -> int:
    """Largest multiple-of-8 divisor of `rows` up to 288 — when one exists
    the kernel needs no row padding and no output slice (the pad/slice
    copies of the m1-wide operands were ~8% of the step in the device
    trace). Falls back to 256 + padding. The cap keeps the kernel's live
    [tile, m1*m2] temporaries inside Mosaic's 16M scoped-vmem stack at
    maxl=4 (a 448-row tile measured 17.2M and failed to compile)."""
    for tile in range(min(288, rows - rows % 8), 7, -8):
        if rows % tile == 0:
            return tile
    return 256


# ---------------------------------------------------------------------------
# kernels (row operands 2D: [rows, lanes]; tables 2D: [in, pairs/K])
# ---------------------------------------------------------------------------

def _fwd_kernel(e_r_ref, e_i_ref, q_r_ref, q_i_ref, repm_ref, tilem_ref,
                c_ref, out_r_ref, out_i_ref, *, n_j, m1, m2):
    # e_* [R, n_j*m1] (j-major)  q_* [R, n_j*m2] (j-major)
    # repm [m1, m1*m2]  tilem [m2, m1*m2]  c [m1*m2, K]  out_* [R, K]
    rows = e_r_ref.shape[0]
    p = m1 * m2
    repm = repm_ref[:]
    tilem = tilem_ref[:]
    z_r = jnp.zeros((rows, p), jnp.float32)
    z_i = jnp.zeros((rows, p), jnp.float32)
    for j in range(n_j):
        er = e_r_ref[:, j * m1:(j + 1) * m1].astype(jnp.float32)
        ei = e_i_ref[:, j * m1:(j + 1) * m1].astype(jnp.float32)
        qr = q_r_ref[:, j * m2:(j + 1) * m2].astype(jnp.float32)
        qi = q_i_ref[:, j * m2:(j + 1) * m2].astype(jnp.float32)
        big_er = jnp.dot(er, repm, preferred_element_type=jnp.float32)
        big_ei = jnp.dot(ei, repm, preferred_element_type=jnp.float32)
        big_qr = jnp.dot(qr, tilem, preferred_element_type=jnp.float32)
        big_qi = jnp.dot(qi, tilem, preferred_element_type=jnp.float32)
        z_r = z_r + big_er * big_qr - big_ei * big_qi
        z_i = z_i + big_er * big_qi + big_ei * big_qr
    c = c_ref[:]
    out_r_ref[:] = jnp.dot(z_r, c, preferred_element_type=jnp.float32).astype(
        out_r_ref.dtype)
    out_i_ref[:] = jnp.dot(z_i, c, preferred_element_type=jnp.float32).astype(
        out_i_ref.dtype)


def _bwd_kernel(e_r_ref, e_i_ref, q_r_ref, q_i_ref, repm_ref, tilem_ref,
                repm_t_ref, tilem_t_ref, ct_ref, g_r_ref, g_i_ref,
                de_r_ref, de_i_ref, dq_r_ref, dq_i_ref, *, n_j, m1, m2):
    # ct [K, m1*m2]  repm_t [m1*m2, m1]  tilem_t [m1*m2, m2]  g_* [R, K]
    repm = repm_ref[:]
    tilem = tilem_ref[:]
    repm_t = repm_t_ref[:]
    tilem_t = tilem_t_ref[:]
    ct = ct_ref[:]
    g_r = g_r_ref[:].astype(jnp.float32)
    g_i = g_i_ref[:].astype(jnp.float32)
    dz_r = jnp.dot(g_r, ct, preferred_element_type=jnp.float32)
    dz_i = jnp.dot(g_i, ct, preferred_element_type=jnp.float32)
    for j in range(n_j):
        er = e_r_ref[:, j * m1:(j + 1) * m1].astype(jnp.float32)
        ei = e_i_ref[:, j * m1:(j + 1) * m1].astype(jnp.float32)
        qr = q_r_ref[:, j * m2:(j + 1) * m2].astype(jnp.float32)
        qi = q_i_ref[:, j * m2:(j + 1) * m2].astype(jnp.float32)
        big_er = jnp.dot(er, repm, preferred_element_type=jnp.float32)
        big_ei = jnp.dot(ei, repm, preferred_element_type=jnp.float32)
        big_qr = jnp.dot(qr, tilem, preferred_element_type=jnp.float32)
        big_qi = jnp.dot(qi, tilem, preferred_element_type=jnp.float32)
        # z_r = Er Qr - Ei Qi ; z_i = Er Qi + Ei Qr
        d_er = dz_r * big_qr + dz_i * big_qi
        d_ei = dz_i * big_qr - dz_r * big_qi
        d_qr = dz_r * big_er + dz_i * big_ei
        d_qi = dz_i * big_er - dz_r * big_ei
        de_r_ref[:, j * m1:(j + 1) * m1] = jnp.dot(
            d_er, repm_t, preferred_element_type=jnp.float32).astype(
                de_r_ref.dtype)
        de_i_ref[:, j * m1:(j + 1) * m1] = jnp.dot(
            d_ei, repm_t, preferred_element_type=jnp.float32).astype(
                de_i_ref.dtype)
        dq_r_ref[:, j * m2:(j + 1) * m2] = jnp.dot(
            d_qr, tilem_t, preferred_element_type=jnp.float32).astype(
                dq_r_ref.dtype)
        dq_i_ref[:, j * m2:(j + 1) * m2] = jnp.dot(
            d_qi, tilem_t, preferred_element_type=jnp.float32).astype(
                dq_i_ref.dtype)


# ---------------------------------------------------------------------------
# custom-vjp wrapper over 2D row operands (tables closed over per config)
# ---------------------------------------------------------------------------

def _pad_rows(x, pad):
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def _row_spec(width, tile):
    return pl.BlockSpec((tile, width), lambda i: (i, 0))


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape))


@functools.lru_cache(maxsize=None)
def _make_row_fn(n_j: int, m1: int, m2: int, k: int, table_bytes: bytes,
                 tile: int, interpret: bool):
    cflat = np.frombuffer(table_bytes, np.float32).reshape(m1 * m2, k)
    # pair index p = m*m2 + n:  repm expands e over n, tilem tiles q over m.
    repm = np.kron(np.eye(m1, dtype=np.float32),
                   np.ones((1, m2), np.float32))
    tilem = np.kron(np.ones((1, m1), np.float32),
                    np.eye(m2, dtype=np.float32))
    tables_f = (repm, tilem, cflat)
    tables_b = (repm, tilem, repm.T.copy(), tilem.T.copy(), cflat.T.copy())

    def run_fwd(e_r, e_i, q_r, q_i):
        rows = e_r.shape[0]
        pad = (-rows) % tile
        args = [_pad_rows(x, pad) for x in (e_r, e_i, q_r, q_i)]
        rp = rows + pad
        kernel = functools.partial(_fwd_kernel, n_j=n_j, m1=m1, m2=m2)
        out_r, out_i = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((rp, k), e_r.dtype),
                       jax.ShapeDtypeStruct((rp, k), e_r.dtype)),
            grid=(rp // tile, ),
            in_specs=[_row_spec(n_j * m1, tile), _row_spec(n_j * m1, tile),
                      _row_spec(n_j * m2, tile), _row_spec(n_j * m2, tile)] +
                     [_full_spec(t.shape) for t in tables_f],
            out_specs=(_row_spec(k, tile), _row_spec(k, tile)),
            interpret=interpret,
        )(*args, *(jnp.asarray(t) for t in tables_f))
        return (out_r, out_i) if pad == 0 else (out_r[:rows], out_i[:rows])

    def run_bwd(e_r, e_i, q_r, q_i, g_r, g_i):
        rows = e_r.shape[0]
        pad = (-rows) % tile
        args = [_pad_rows(x, pad) for x in (e_r, e_i, q_r, q_i, g_r, g_i)]
        rp = rows + pad
        kernel = functools.partial(_bwd_kernel, n_j=n_j, m1=m1, m2=m2)
        outs = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((rp, n_j * m1), e_r.dtype),
                       jax.ShapeDtypeStruct((rp, n_j * m1), e_i.dtype),
                       jax.ShapeDtypeStruct((rp, n_j * m2), q_r.dtype),
                       jax.ShapeDtypeStruct((rp, n_j * m2), q_i.dtype)),
            grid=(rp // tile, ),
            in_specs=[_row_spec(n_j * m1, tile), _row_spec(n_j * m1, tile),
                      _row_spec(n_j * m2, tile), _row_spec(n_j * m2, tile)] +
                     [_full_spec(t.shape) for t in tables_b] +
                     [_row_spec(k, tile), _row_spec(k, tile)],
            out_specs=(_row_spec(n_j * m1, tile), _row_spec(n_j * m1, tile),
                       _row_spec(n_j * m2, tile), _row_spec(n_j * m2, tile)),
            interpret=interpret,
        )(*args[:4], *(jnp.asarray(t) for t in tables_b), *args[4:])
        return outs if pad == 0 else tuple(o[:rows] for o in outs)

    @jax.custom_vjp
    def fused(e_r, e_i, q_r, q_i):
        return run_fwd(e_r, e_i, q_r, q_i)

    def fwd(e_r, e_i, q_r, q_i):
        return run_fwd(e_r, e_i, q_r, q_i), (e_r, e_i, q_r, q_i)

    def bwd(res, grads):
        e_r, e_i, q_r, q_i = res
        g_r, g_i = grads
        return run_bwd(e_r, e_i, q_r, q_i, g_r, g_i)

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
    # Edge rep in XLA, row layout (b, i, t) x lanes (j, m). The j<->tau
    # transpose happens on the SMALL pre-expansion tensors (rad before the
    # m-repeat, atom/sph before their broadcasts) so the m1-wide 2D kernel
    # operands are written once, in-layout, by the fused producers — an
    # earlier variant transposed the expanded [rows, N*m1] tensors and those
    # layout copies were ~30% of the step in the device trace
    # (experiments/perf/). The radial VJP (and the atom rep's neighbor-sum
    # VJP) fall out of the surrounding ops automatically.
    reps = np.array([2 * l + 1 for l in range(n_l)])
    rad_t = jnp.swapaxes(rad_feats, 2, 3)               # [B, N, tau, N, L]
    rad_m = jnp.repeat(rad_t, repeats=reps, axis=-1,
                       total_repeat_length=m1)          # [B, N, tau, N, m1]
    e_r = (rad_m * sph[..., 0][:, :, None, :, :]).reshape(rows, N * m1)
    e_i = (rad_m * sph[..., 1][:, :, None, :, :]).reshape(rows, N * m1)

    qshape = (B, N, tau, N, m2)
    q_rt = jnp.swapaxes(atom_packed, 1, 2)[:, None]     # [B, 1, tau, N, m2, 2]
    q_r = jnp.broadcast_to(q_rt[..., 0], qshape).reshape(rows, N * m2)
    q_i = jnp.broadcast_to(q_rt[..., 1], qshape).reshape(rows, N * m2)

    fused = _make_row_fn(N, m1, m2, k,
                         np.ascontiguousarray(table3, np.float32).tobytes(),
                         _pick_row_tile(rows), interpret)
    out_r, out_i = fused(e_r, e_i, q_r, q_i)
    out = jnp.stack([out_r, out_i], axis=-1)
    return out.reshape(B, N, tau, k, 2)
