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

Two operand-feeding strategies, selected by shape (_grouped_tile):

* GROUPED (production shapes): the row space groups as tau rows per (b, i)
  and N*tau rows per b, so the relative SH and the atom rep enter as SMALL
  unexpanded operands with aligned 3D BlockSpecs; the kernel expands them to
  row form in VMEM with static selection matmuls, builds e = rad_m * Y on
  the fly, and reduces the atom-rep gradient over i in-kernel (transposed
  selection). No [rows, N*m1]-sized tensor ever exists in HBM — this removed
  the producer/layout copies that dominated the traced step (~35%) and took
  the SF6 minibatch from 11.8 to 9.6 ms.
* FALLBACK (row tile incompatible with the (tau, N*tau) grouping): e and q
  are materialized by XLA in compact 2D row layout (transposes on the small
  pre-expansion tensors only) and enter as full row operands.

Complex numbers travel as separate real/imag operands (a trailing complex
axis of 2 would be lane-padded 2->128). Backward is a second Pallas kernel
per strategy wired through jax.custom_vjp. The spherical harmonics receive
no gradient (positions are inputs, not parameters, in every PPO training
path) — enforced via stop_gradient at the entry point.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

def _l_of_m(n_ells):
    out = []
    for l in range(n_ells):
        out.extend([l] * (2 * l + 1))
    return tuple(out)


def _mxu_dtype(dt):
    """Dtype MXU dot INPUTS are fed in. bfloat16 operands stay bfloat16 —
    the v5e MXU runs bf16xbf16->f32 at 2x the f32 rate, and upcasting the
    operands (the previous behavior) paid conversion VPU work only to halve
    the systolic-array throughput; measured: bf16 mode was SLOWER than f32
    (7.94 vs 7.04 ms, BENCH_r03) because no dot ever saw a bf16 input.
    Accumulation stays f32 everywhere via preferred_element_type; the f32
    path is bit-identical (astype(f32) of f32 is a no-op)."""
    return jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32


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
                *c_and_out_refs, n_j, m1, m2, gspec, mxu):
    # e_* [R, n_j*m1] (j-major)  q_* [R, n_j*m2] (j-major)
    # repm [m1, m1*m2]  tilem [m2, m1*m2]  out_* [R, K]
    # c_and_out_refs: the CG table ref(s) — one dense [m1*m2, K] when gspec
    # is None, else one compacted [w1*m2, K_g] per nonempty l1 group — then
    # out_r_ref, out_i_ref.
    # mxu: dot-input dtype (_mxu_dtype); tables arrive pre-cast to it.
    c_refs = c_and_out_refs[:-2]
    out_r_ref, out_i_ref = c_and_out_refs[-2:]
    rows = e_r_ref.shape[0]
    repm = repm_ref[:]
    tilem = tilem_ref[:]
    p = repm.shape[1]  # m1*m2 dense pairs, or the tri fold's M(M+1)/2
    z_r = jnp.zeros((rows, p), jnp.float32)
    z_i = jnp.zeros((rows, p), jnp.float32)
    for j in range(n_j):
        er = e_r_ref[:, j * m1:(j + 1) * m1].astype(mxu)
        ei = e_i_ref[:, j * m1:(j + 1) * m1].astype(mxu)
        qr = q_r_ref[:, j * m2:(j + 1) * m2].astype(mxu)
        qi = q_i_ref[:, j * m2:(j + 1) * m2].astype(mxu)
        big_er = jnp.dot(er, repm, preferred_element_type=jnp.float32)
        big_ei = jnp.dot(ei, repm, preferred_element_type=jnp.float32)
        big_qr = jnp.dot(qr, tilem, preferred_element_type=jnp.float32)
        big_qi = jnp.dot(qi, tilem, preferred_element_type=jnp.float32)
        z_r = z_r + big_er * big_qr - big_ei * big_qi
        z_i = z_i + big_er * big_qi + big_ei * big_qr
    # stacked (r, i) final contraction; per-l1 compacted group dots skip the
    # dense table's structural zeros (same trick as the grouped kernels)
    z_ri = jnp.concatenate([z_r, z_i], axis=0).astype(mxu)
    if gspec is None:
        out = jnp.dot(z_ri, c_refs[0][:], preferred_element_type=jnp.float32)
    else:
        out = jnp.concatenate(
            [jnp.dot(z_ri[:, a:b], c_ref[:],
                     preferred_element_type=jnp.float32)
             for (a, b, _ka, _kb), c_ref in zip(gspec, c_refs)], axis=1)
    out_r_ref[:] = out[:rows].astype(out_r_ref.dtype)
    out_i_ref[:] = out[rows:].astype(out_i_ref.dtype)


def _bwd_kernel(e_r_ref, e_i_ref, q_r_ref, q_i_ref, repm_ref, tilem_ref,
                repm_t_ref, tilem_t_ref, *rest_refs, n_j, m1, m2, gspec,
                mxu):
    # rest_refs: transposed CG table ref(s) — one dense [K, m1*m2] when gspec
    # is None, else one [K_g, w1*m2] per nonempty group — then g_r_ref,
    # g_i_ref, de_r_ref, de_i_ref, dq_r_ref, dq_i_ref.
    # repm_t [m1*m2, m1]  tilem_t [m1*m2, m2]  g_* [R, K]
    ct_refs = rest_refs[:-6]
    (g_r_ref, g_i_ref, de_r_ref, de_i_ref,
     dq_r_ref, dq_i_ref) = rest_refs[-6:]
    repm = repm_ref[:]
    tilem = tilem_ref[:]
    repm_t = repm_t_ref[:]
    tilem_t = tilem_t_ref[:]
    g_r = g_r_ref[:].astype(mxu)
    g_i = g_i_ref[:].astype(mxu)
    rows = g_r.shape[0]
    g_ri = jnp.concatenate([g_r, g_i], axis=0)
    if gspec is None:
        dz_ri = jnp.dot(g_ri, ct_refs[0][:],
                        preferred_element_type=jnp.float32)
    else:
        dz_ri = jnp.concatenate(
            [jnp.dot(g_ri[:, ka:kb], ct_ref[:],
                     preferred_element_type=jnp.float32)
             for (_a, _b, ka, kb), ct_ref in zip(gspec, ct_refs)], axis=1)
    dz_r, dz_i = dz_ri[:rows], dz_ri[rows:]
    for j in range(n_j):
        er = e_r_ref[:, j * m1:(j + 1) * m1].astype(mxu)
        ei = e_i_ref[:, j * m1:(j + 1) * m1].astype(mxu)
        qr = q_r_ref[:, j * m2:(j + 1) * m2].astype(mxu)
        qi = q_i_ref[:, j * m2:(j + 1) * m2].astype(mxu)
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
            d_er.astype(mxu), repm_t,
            preferred_element_type=jnp.float32).astype(de_r_ref.dtype)
        de_i_ref[:, j * m1:(j + 1) * m1] = jnp.dot(
            d_ei.astype(mxu), repm_t,
            preferred_element_type=jnp.float32).astype(de_i_ref.dtype)
        dq_r_ref[:, j * m2:(j + 1) * m2] = jnp.dot(
            d_qr.astype(mxu), tilem_t,
            preferred_element_type=jnp.float32).astype(dq_r_ref.dtype)
        dq_i_ref[:, j * m2:(j + 1) * m2] = jnp.dot(
            d_qi.astype(mxu), tilem_t,
            preferred_element_type=jnp.float32).astype(dq_i_ref.dtype)


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
                 tile: int, interpret: bool, group_key=None, pairs_key=None):
    # group_key: None (dense final contraction) or a tuple of
    # (row_a, row_b, shape, bytes) per group: contract z[:, row_a:row_b]
    # against the compacted sub-table (cg.fused_cg_table_grouped /
    # fused_cg_table_tri) — the output K axis is then PERMUTED group-major,
    # matching the grouped kernels' consumer contract.
    # pairs_key: None (dense m-major pair space p = m*m2 + n) or bytes of an
    # int32 [P, 2] pair list (the tri fold) from which the expansion
    # matrices are built.
    if group_key is None:
        gspec = None
        cgs = (np.frombuffer(table_bytes, np.float32).reshape(-1, k), )
    else:
        gspec, cgs = [], []
        ka = 0
        for row_a, row_b, shape, raw in group_key:
            sub = np.frombuffer(raw, np.float32).reshape(shape)
            gspec.append((row_a, row_b, ka, ka + shape[1]))
            cgs.append(sub)
            ka += shape[1]
        assert ka == k, (ka, k)
        gspec = tuple(gspec)
    if pairs_key is None:
        # pair index p = m*m2 + n: repm expands e over n, tilem tiles q
        # over m.
        repm = np.kron(np.eye(m1, dtype=np.float32),
                       np.ones((1, m2), np.float32))
        tilem = np.kron(np.ones((1, m1), np.float32),
                        np.eye(m2, dtype=np.float32))
    else:
        pairs = np.frombuffer(pairs_key, np.int32).reshape(-1, 2)
        n_p = pairs.shape[0]
        repm = np.zeros((m1, n_p), np.float32)
        tilem = np.zeros((m2, n_p), np.float32)
        repm[pairs[:, 0], np.arange(n_p)] = 1.0
        tilem[pairs[:, 1], np.arange(n_p)] = 1.0
    tables_f = (repm, tilem) + tuple(cgs)
    tables_b = (repm, tilem, repm.T.copy(), tilem.T.copy()) + tuple(
        np.ascontiguousarray(c.T) for c in cgs)

    def run_fwd(e_r, e_i, q_r, q_i):
        rows = e_r.shape[0]
        pad = (-rows) % tile
        args = [_pad_rows(x, pad) for x in (e_r, e_i, q_r, q_i)]
        rp = rows + pad
        mxu = _mxu_dtype(e_r.dtype)
        kernel = functools.partial(_fwd_kernel, n_j=n_j, m1=m1, m2=m2,
                                   gspec=gspec, mxu=mxu)
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
        )(*args, *(jnp.asarray(t, mxu) for t in tables_f))
        return (out_r, out_i) if pad == 0 else (out_r[:rows], out_i[:rows])

    def run_bwd(e_r, e_i, q_r, q_i, g_r, g_i):
        rows = e_r.shape[0]
        pad = (-rows) % tile
        args = [_pad_rows(x, pad) for x in (e_r, e_i, q_r, q_i, g_r, g_i)]
        rp = rows + pad
        mxu = _mxu_dtype(e_r.dtype)
        kernel = functools.partial(_bwd_kernel, n_j=n_j, m1=m1, m2=m2,
                                   gspec=gspec, mxu=mxu)
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
        )(*args[:4], *(jnp.asarray(t, mxu) for t in tables_b), *args[4:])
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
# grouped variant: operands enter UNexpanded and are expanded in VMEM.
#
# The row space (b, i, t) groups naturally: tau consecutive rows share one
# (b, i) — hence one row of the relative-SH operand — and N*tau consecutive
# rows share one b — hence tau rows of the atom-rep operand. When the row
# tile is a multiple of N*tau (and divides the row count), sph and q can be
# passed as SMALL 2D operands with aligned BlockSpecs and expanded to row
# form inside the kernel by static 0/1 selection matmuls (MXU). This removes
# the [rows, N*m1]-sized e/q materializations entirely (~7x less kernel HBM
# traffic; their producer/layout copies were ~20% of the step) and moves the
# atom-rep gradient's reduction over i into the kernel as the transposed
# selection matmul.
# ---------------------------------------------------------------------------

def _grouped_tile(b: int, n: int, tau: int):
    """Row tile k*N*tau (k | B, multiple of 8, <= 288) or None."""
    group = n * tau
    best = None
    k = 1
    while k * group <= 288:
        if (k * group) % 8 == 0 and b % k == 0:
            best = k * group
        k += 1
    return best


def _grouped_fwd_kernel(rad_ref, sphr_ref, sphi_ref, qr_ref, qi_ref,
                        se_ref, sq_ref, gexp_ref, repm_ref, tilem_ref,
                        *table_and_out_refs, n_j, m1, m2, n_l, gspec, mxu):
    # table_and_out_refs: the CG table ref(s) — one dense [m1*m2, K] when
    # gspec is None, else one compacted [w1*m2, K_g] per nonempty l1 group
    # (see cg.fused_cg_table_grouped) — followed by out_r_ref, out_i_ref.
    # mxu: dot-input dtype (_mxu_dtype); tables arrive pre-cast to it.
    c_refs = table_and_out_refs[:-2]
    out_r_ref, out_i_ref = table_and_out_refs[-2:]
    se = se_ref[:]
    sq = sq_ref[:]
    gexp = gexp_ref[:]
    repm = repm_ref[:]
    tilem = tilem_ref[:]
    sph_big_r = jnp.dot(se, sphr_ref[0].astype(mxu),
                        preferred_element_type=jnp.float32)
    sph_big_i = jnp.dot(se, sphi_ref[0].astype(mxu),
                        preferred_element_type=jnp.float32)
    q_big_r = jnp.dot(sq, qr_ref[0].astype(mxu),
                      preferred_element_type=jnp.float32)
    q_big_i = jnp.dot(sq, qi_ref[0].astype(mxu),
                      preferred_element_type=jnp.float32)
    rad = rad_ref[:].astype(mxu)
    rows = rad.shape[0]
    p = m1 * m2
    z_r = jnp.zeros((rows, p), jnp.float32)
    z_i = jnp.zeros((rows, p), jnp.float32)
    for j in range(n_j):
        radx = jnp.dot(rad[:, j * n_l:(j + 1) * n_l], gexp,
                       preferred_element_type=jnp.float32)
        # stacked (r, i) rows: 2 expansion matmuls per j instead of 4
        e_ri = jnp.concatenate([radx * sph_big_r[:, j * m1:(j + 1) * m1],
                                radx * sph_big_i[:, j * m1:(j + 1) * m1]],
                               axis=0).astype(mxu)
        big_e = jnp.dot(e_ri, repm, preferred_element_type=jnp.float32)
        big_er, big_ei = big_e[:rows], big_e[rows:]
        q_ri = jnp.concatenate([q_big_r[:, j * m2:(j + 1) * m2],
                                q_big_i[:, j * m2:(j + 1) * m2]],
                               axis=0).astype(mxu)
        big_q = jnp.dot(q_ri, tilem, preferred_element_type=jnp.float32)
        big_qr, big_qi = big_q[:rows], big_q[rows:]
        z_r = z_r + big_er * big_qr - big_ei * big_qi
        z_i = z_i + big_er * big_qi + big_ei * big_qr
    # one stacked final contraction: dense [2R, p] x [p, K], or per-l1 dots
    # against the compacted group tables (15 -> 7 MXU tile passes at maxl=4;
    # the dense table is >90% structural zeros, cg.fused_cg_table_grouped)
    z_ri = jnp.concatenate([z_r, z_i], axis=0).astype(mxu)
    if gspec is None:
        out = jnp.dot(z_ri, c_refs[0][:], preferred_element_type=jnp.float32)
    else:
        out = jnp.concatenate(
            [jnp.dot(z_ri[:, a:b], c_ref[:],
                     preferred_element_type=jnp.float32)
             for (a, b, _ka, _kb), c_ref in zip(gspec, c_refs)], axis=1)
    out_r_ref[:] = out[:rows].astype(out_r_ref.dtype)
    out_i_ref[:] = out[rows:].astype(out_i_ref.dtype)


def _grouped_bwd_kernel(rad_ref, sphr_ref, sphi_ref, qr_ref, qi_ref,
                        se_ref, sq_ref, sqt_ref, gexp_ref, gexpt_ref,
                        repm_ref, tilem_ref, repm_t_ref, tilem_t_ref,
                        *rest_refs, n_j, m1, m2, n_l, gspec, mxu):
    # rest_refs: transposed CG table ref(s) — one dense [K, m1*m2] when
    # gspec is None, else one [K_g, w1*m2] per nonempty group — then
    # g_r_ref, g_i_ref, drad_ref, dq_r_ref, dq_i_ref.
    ct_refs = rest_refs[:-5]
    g_r_ref, g_i_ref, drad_ref, dq_r_ref, dq_i_ref = rest_refs[-5:]
    se = se_ref[:]
    sq = sq_ref[:]
    gexp = gexp_ref[:]
    repm = repm_ref[:]
    tilem = tilem_ref[:]
    repm_t = repm_t_ref[:]
    tilem_t = tilem_t_ref[:]
    sph_big_r = jnp.dot(se, sphr_ref[0].astype(mxu),
                        preferred_element_type=jnp.float32)
    sph_big_i = jnp.dot(se, sphi_ref[0].astype(mxu),
                        preferred_element_type=jnp.float32)
    q_big_r = jnp.dot(sq, qr_ref[0].astype(mxu),
                      preferred_element_type=jnp.float32)
    q_big_i = jnp.dot(sq, qi_ref[0].astype(mxu),
                      preferred_element_type=jnp.float32)
    rad = rad_ref[:].astype(mxu)
    g_r = g_r_ref[:].astype(mxu)
    g_i = g_i_ref[:].astype(mxu)
    rows = rad.shape[0]
    # one stacked-rows dot for both complex parts: [2R, K] x ct — the
    # narrow-output table matmuls (25 of 128 lanes live) dominate the
    # backward, so halving their COUNT by row-stacking r/i costs nothing
    # in FLOPs and saves per-matmul overhead. With gspec, one dot per l1
    # group against the compacted transposed sub-tables (matches the
    # grouped forward's permuted K axis).
    g_ri = jnp.concatenate([g_r, g_i], axis=0)
    if gspec is None:
        dz_ri = jnp.dot(g_ri, ct_refs[0][:],
                        preferred_element_type=jnp.float32)
    else:
        dz_ri = jnp.concatenate(
            [jnp.dot(g_ri[:, ka:kb], ct_ref[:],
                     preferred_element_type=jnp.float32)
             for (_a, _b, ka, kb), ct_ref in zip(gspec, ct_refs)], axis=1)
    dz_r, dz_i = dz_ri[:rows], dz_ri[rows:]
    dq_slabs_ri = []
    for j in range(n_j):
        radx = jnp.dot(rad[:, j * n_l:(j + 1) * n_l], gexp,
                       preferred_element_type=jnp.float32)
        sr = sph_big_r[:, j * m1:(j + 1) * m1]
        si = sph_big_i[:, j * m1:(j + 1) * m1]
        # stacked expansion of (e_r, e_i) and (q_r, q_i): 2 wide matmuls
        # instead of 4
        e_ri = jnp.concatenate([radx * sr, radx * si], axis=0).astype(mxu)
        big_e = jnp.dot(e_ri, repm, preferred_element_type=jnp.float32)
        big_er, big_ei = big_e[:rows], big_e[rows:]
        q_ri = jnp.concatenate([q_big_r[:, j * m2:(j + 1) * m2],
                                q_big_i[:, j * m2:(j + 1) * m2]],
                               axis=0).astype(mxu)
        big_q = jnp.dot(q_ri, tilem, preferred_element_type=jnp.float32)
        big_qr, big_qi = big_q[:rows], big_q[rows:]
        d_er = dz_r * big_qr + dz_i * big_qi
        d_ei = dz_i * big_qr - dz_r * big_qi
        d_qr = dz_r * big_er + dz_i * big_ei
        d_qi = dz_i * big_er - dz_r * big_ei
        de_ri = jnp.dot(
            jnp.concatenate([d_er, d_ei], axis=0).astype(mxu), repm_t,
            preferred_element_type=jnp.float32)
        dradx = de_ri[:rows] * sr + de_ri[rows:] * si
        drad_ref[:, j * n_l:(j + 1) * n_l] = jnp.dot(
            dradx.astype(mxu), gexpt_ref[:],
            preferred_element_type=jnp.float32).astype(drad_ref.dtype)
        dq_slabs_ri.append(jnp.dot(
            jnp.concatenate([d_qr, d_qi], axis=0).astype(mxu), tilem_t,
            preferred_element_type=jnp.float32))
    # reduce the atom-rep gradient over i inside the kernel; slabs carry
    # stacked (r, i) rows, split once here
    dq_all = jnp.concatenate(dq_slabs_ri, axis=-1).astype(mxu)
    dq_r_ref[0] = jnp.dot(sqt_ref[:], dq_all[:rows],
                          preferred_element_type=jnp.float32).astype(
                              dq_r_ref.dtype)
    dq_i_ref[0] = jnp.dot(sqt_ref[:], dq_all[rows:],
                          preferred_element_type=jnp.float32).astype(
                              dq_i_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_grouped_fn(n_j: int, m1: int, m2: int, n_l: int, k: int,
                     tau: int, tile: int, table_bytes: bytes,
                     interpret: bool, group_key=None):
    # group_key: None (dense final contraction) or a tuple of
    # ((w1*m2, K_g), bytes) per nonempty l1 group with the l1 values —
    # entries (l1, shape, bytes) — from cg.fused_cg_table_grouped.
    repm = np.kron(np.eye(m1, dtype=np.float32),
                   np.ones((1, m2), np.float32))
    tilem = np.kron(np.ones((1, m1), np.float32),
                    np.eye(m2, dtype=np.float32))
    gexp = np.zeros((n_l, m1), np.float32)
    for m, l in enumerate(_l_of_m(n_l)):
        gexp[l, m] = 1.0
    se = np.zeros((tile, tile // tau), np.float32)
    for r in range(tile):
        se[r, r // tau] = 1.0
    sq = np.zeros((tile, tile // n_j), np.float32)
    for r in range(tile):
        sq[r, (r // (n_j * tau)) * tau + r % tau] = 1.0
    if group_key is None:
        gspec = None
        cgs = (np.frombuffer(table_bytes, np.float32).reshape(m1 * m2, k), )
    else:
        gspec, cgs = [], []
        ka = 0
        for l1, shape, raw in group_key:
            sub = np.frombuffer(raw, np.float32).reshape(shape)
            gspec.append((l1 * l1 * m2, (l1 + 1) * (l1 + 1) * m2,
                          ka, ka + shape[1]))
            cgs.append(sub)
            ka += shape[1]
        assert ka == k, (ka, k)
        gspec = tuple(gspec)
    tables_f = (se, sq, gexp, repm, tilem) + tuple(cgs)
    tables_b = (se, sq, sq.T.copy(), gexp, gexp.T.copy(), repm, tilem,
                repm.T.copy(), tilem.T.copy()) + tuple(
                    np.ascontiguousarray(c.T) for c in cgs)

    def _tiled3(width, rows_per_tile):
        # [n_tiles, rows_per_tile, width] operand; the trailing dims equal
        # the block dims, which Mosaic accepts for any sizes
        return pl.BlockSpec((1, rows_per_tile, width), lambda i: (i, 0, 0))

    def run_fwd(rad, sph_r, sph_i, q_r, q_i):
        rows = rad.shape[0]
        grid = rows // tile
        sph3 = (sph_r.reshape(grid, tile // tau, -1),
                sph_i.reshape(grid, tile // tau, -1))
        q3 = (q_r.reshape(grid, tile // n_j, -1),
              q_i.reshape(grid, tile // n_j, -1))
        mxu = _mxu_dtype(rad.dtype)
        out_r, out_i = pl.pallas_call(
            functools.partial(_grouped_fwd_kernel, n_j=n_j, m1=m1, m2=m2,
                              n_l=n_l, gspec=gspec, mxu=mxu),
            out_shape=(jax.ShapeDtypeStruct((rows, k), rad.dtype),
                       jax.ShapeDtypeStruct((rows, k), rad.dtype)),
            grid=(grid, ),
            in_specs=[_row_spec(n_j * n_l, tile),
                      _tiled3(n_j * m1, tile // tau),
                      _tiled3(n_j * m1, tile // tau),
                      _tiled3(n_j * m2, tile // n_j),
                      _tiled3(n_j * m2, tile // n_j)] +
                     [_full_spec(t.shape) for t in tables_f],
            out_specs=(_row_spec(k, tile), _row_spec(k, tile)),
            interpret=interpret,
        )(rad, *sph3, *q3, *(jnp.asarray(t, mxu) for t in tables_f))
        return out_r, out_i

    def run_bwd(rad, sph_r, sph_i, q_r, q_i, g_r, g_i):
        rows = rad.shape[0]
        grid = rows // tile
        sph3 = (sph_r.reshape(grid, tile // tau, -1),
                sph_i.reshape(grid, tile // tau, -1))
        q3 = (q_r.reshape(grid, tile // n_j, -1),
              q_i.reshape(grid, tile // n_j, -1))
        mxu = _mxu_dtype(rad.dtype)
        drad, dq_r, dq_i = pl.pallas_call(
            functools.partial(_grouped_bwd_kernel, n_j=n_j, m1=m1, m2=m2,
                              n_l=n_l, gspec=gspec, mxu=mxu),
            out_shape=(jax.ShapeDtypeStruct((rows, n_j * n_l), rad.dtype),
                       jax.ShapeDtypeStruct((grid, tile // n_j, n_j * m2),
                                            q_r.dtype),
                       jax.ShapeDtypeStruct((grid, tile // n_j, n_j * m2),
                                            q_i.dtype)),
            grid=(grid, ),
            in_specs=[_row_spec(n_j * n_l, tile),
                      _tiled3(n_j * m1, tile // tau),
                      _tiled3(n_j * m1, tile // tau),
                      _tiled3(n_j * m2, tile // n_j),
                      _tiled3(n_j * m2, tile // n_j)] +
                     [_full_spec(t.shape) for t in tables_b] +
                     [_row_spec(k, tile), _row_spec(k, tile)],
            out_specs=(_row_spec(n_j * n_l, tile),
                       _tiled3(n_j * m2, tile // n_j),
                       _tiled3(n_j * m2, tile // n_j)),
            interpret=interpret,
        )(rad, *sph3, *q3, *(jnp.asarray(t, mxu) for t in tables_b),
          g_r, g_i)
        return (drad, dq_r.reshape(rows // n_j, -1),
                dq_i.reshape(rows // n_j, -1))

    @jax.custom_vjp
    def fused(rad, sph_r, sph_i, q_r, q_i):
        return run_fwd(rad, sph_r, sph_i, q_r, q_i)

    def fwd(rad, sph_r, sph_i, q_r, q_i):
        return (run_fwd(rad, sph_r, sph_i, q_r, q_i),
                (rad, sph_r, sph_i, q_r, q_i))

    def bwd(res, grads):
        rad, sph_r, sph_i, q_r, q_i = res
        g_r, g_i = grads
        drad, dq_r, dq_i = run_bwd(rad, sph_r, sph_i, q_r, q_i, g_r, g_i)
        zs = jnp.zeros_like(sph_r)
        return drad, zs, zs, dq_r, dq_i

    fused.defvjp(fwd, bwd)
    return fused


# ---------------------------------------------------------------------------
# public entry: packed SO3 shapes in, packed K-form out
# ---------------------------------------------------------------------------

def cg_aggregate_edge_fused_ri(sph_packed: jnp.ndarray,
                               rad_feats: jnp.ndarray,
                               atom_r: jnp.ndarray, atom_i: jnp.ndarray,
                               table3: np.ndarray,
                               interpret: bool = False,
                               grouped=None):
    """Fused edge-build + CG aggregate, complex parts as SEPARATE arrays.

    sph_packed    [B, N, N, M1, 2]  conj relative SH (no gradient)
    rad_feats     [B, N, N, tau, L] gated radial features
    atom_r/atom_i [B, N, tau, M2]   packed atom rep, real / imag
    table3        [M1, M2, K] combined CG block table (cg._fused_cg_table)
    grouped       optional (tables, perm) from cg.fused_cg_table_grouped:
                  the final contraction runs per l1 group against the
                  compacted sub-tables and the output K axis is PERMUTED to
                  l1-major order — the caller must consume it with the
                  matching idx-form slices (PackedCatMix).
    returns (out_r, out_i), each packed K-form [B, N, tau, K].

    Keeping the complex axis out of the arrays avoids the trailing-2
    T(2,128) interleave copies around the kernel custom-calls that
    dominated the traced SF6 step (~0.5 GB of layout copies per fwd+bwd).
    """
    B, N, _, tau, n_l = rad_feats.shape
    m1 = sph_packed.shape[-2]
    m2 = atom_r.shape[-1]
    k = table3.shape[-1]
    rows = B * N * tau

    sph = jax.lax.stop_gradient(sph_packed)
    table_bytes = np.ascontiguousarray(table3, np.float32).tobytes()
    rad_t = jnp.swapaxes(rad_feats, 2, 3)               # [B, N, tau, N, L]

    group_key = None
    if grouped is not None:
        gtabs, _perm = grouped
        group_key = tuple(
            (l1, t.shape, np.ascontiguousarray(t, np.float32).tobytes())
            for l1, t in enumerate(gtabs) if t.shape[1])

    gtile = _grouped_tile(B, N, tau)
    if gtile is not None:
        # grouped path: operands enter unexpanded; the kernel expands them
        # in VMEM with static selection matmuls (see the section comment)
        rad2d = rad_t.reshape(rows, N * n_l)
        sph_r = sph[..., 0].reshape(B * N, N * m1)
        sph_i = sph[..., 1].reshape(B * N, N * m1)
        q_r = jnp.swapaxes(atom_r, 1, 2).reshape(B * tau, N * m2)
        q_i = jnp.swapaxes(atom_i, 1, 2).reshape(B * tau, N * m2)
        fused = _make_grouped_fn(N, m1, m2, n_l, k, tau, gtile, table_bytes,
                                 interpret, group_key)
        out_r, out_i = fused(rad2d, sph_r, sph_i, q_r, q_i)
        return (out_r.reshape(B, N, tau, k), out_i.reshape(B, N, tau, k))

    # fallback: edge rep built in XLA, row layout (b, i, t) x lanes (j, m).
    # The j<->tau transpose happens on the SMALL pre-expansion tensors so
    # the m1-wide 2D kernel operands are written once, in-layout, by the
    # fused producers. The radial VJP (and the atom rep's neighbor-sum VJP)
    # fall out of the surrounding ops automatically.
    reps = np.array([2 * l + 1 for l in range(n_l)])
    rad_m = jnp.repeat(rad_t, repeats=reps, axis=-1,
                       total_repeat_length=m1)          # [B, N, tau, N, m1]
    e_r = (rad_m * sph[..., 0][:, :, None, :, :]).reshape(rows, N * m1)
    e_i = (rad_m * sph[..., 1][:, :, None, :, :]).reshape(rows, N * m1)

    qshape = (B, N, tau, N, m2)
    q_r = jnp.broadcast_to(jnp.swapaxes(atom_r, 1, 2)[:, None],
                           qshape).reshape(rows, N * m2)
    q_i = jnp.broadcast_to(jnp.swapaxes(atom_i, 1, 2)[:, None],
                           qshape).reshape(rows, N * m2)

    fused = _make_row_fn(N, m1, m2, k, table_bytes, _pick_row_tile(rows),
                         interpret)
    out_r, out_i = fused(e_r, e_i, q_r, q_i)
    out_r = out_r.reshape(B, N, tau, k)
    out_i = out_i.reshape(B, N, tau, k)
    if grouped is not None:
        # the row-fallback kernel emits the original K order; apply the
        # group permutation here so callers see ONE layout either way
        perm = jnp.asarray(grouped[1])
        out_r = jnp.take(out_r, perm, axis=-1)
        out_i = jnp.take(out_i, perm, axis=-1)
    return (out_r, out_i)


def cg_square_fused_ri(a_r: jnp.ndarray, a_i: jnp.ndarray,
                       table3: np.ndarray, grouped=None, tri=None,
                       interpret: bool = False):
    """CG self-product (the level's "CG square", cormorant CGProduct of a rep
    with itself, no neighbor aggregation) as the row kernel with n_j=1.

    The einsum path (ops/cg.py::cg_product_packed_ri) materializes two
    [..., tau, M, M] outer-product tensors in HBM per level (~49 MB per
    direction at SF6 batch-140 shapes) purely as contraction intermediates;
    here z = a (x) a lives only in VMEM and the kernel emits the contracted
    K form directly.

    a_r/a_i  [..., tau, M] packed rep (complex parts separate)
    table3   [M, M, K] combined CG table (cg._fused_cg_table(n, n, maxl))
    grouped  optional (tables, perm) from cg.fused_cg_table_grouped(n, n,
             maxl): per-l1 compacted final contraction, K axis PERMUTED
             l1-major — consume with the matching idx-form slices.
    tri      optional (pairs, groups) from cg.fused_cg_table_tri(n, maxl):
             z is symmetric for the self product, so the kernel computes
             only the M(M+1)/2 tri pairs (half the expansion width and half
             the table rows of `grouped`); K axis PERMUTED lmin-major —
             consume with fused_cg_table_tri's idx-form slices. Takes
             precedence over `grouped`.
    returns (out_r, out_i), each [..., tau, K].
    """
    m1 = a_r.shape[-1]
    k = table3.shape[-1]
    batch = a_r.shape[:-1]
    rows = int(np.prod(batch))
    table_bytes = np.ascontiguousarray(table3, np.float32).tobytes()
    group_key = None
    pairs_key = None
    if tri is not None:
        pairs, groups = tri
        pairs_key = np.ascontiguousarray(pairs, np.int32).tobytes()
        group_key = tuple(
            (a, b, t.shape, np.ascontiguousarray(t, np.float32).tobytes())
            for a, b, t in groups if t.shape[1])
    elif grouped is not None:
        gtabs, _perm = grouped
        m2_tot = m1
        group_key = []
        n_ells = int(round(np.sqrt(m1)))
        off = np.cumsum([0] + [2 * l + 1 for l in range(n_ells)]) * m2_tot
        for l1, t in enumerate(gtabs):
            if t.shape[1]:
                group_key.append(
                    (int(off[l1]), int(off[l1 + 1]), t.shape,
                     np.ascontiguousarray(t, np.float32).tobytes()))
        group_key = tuple(group_key)
    e_r = a_r.reshape(rows, m1)
    e_i = a_i.reshape(rows, m1)
    fused = _make_row_fn(1, m1, m1, k, table_bytes, _pick_row_tile(rows),
                         interpret, group_key, pairs_key)
    # the same array enters as both operands; JAX accumulates the custom
    # VJP's de + dq cotangents automatically
    out_r, out_i = fused(e_r, e_i, e_r, e_i)
    return out_r.reshape(batch + (k, )), out_i.reshape(batch + (k, ))


def cg_aggregate_edge_fused(sph_packed: jnp.ndarray, rad_feats: jnp.ndarray,
                            atom_packed: jnp.ndarray, table3: np.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    """Stacked-complex wrapper over cg_aggregate_edge_fused_ri:
    atom_packed [B, N, tau, M2, 2] in, packed K-form [B, N, tau, K, 2] out.
    Prefer the _ri form in hot paths (no trailing-2 interleave copies)."""
    out_r, out_i = cg_aggregate_edge_fused_ri(
        sph_packed, rad_feats, atom_packed[..., 0], atom_packed[..., 1],
        table3, interpret=interpret)
    return jnp.stack([out_r, out_i], axis=-1)
