"""Pallas TPU kernel for the fused Clebsch-Gordan contraction.

The packed CG product (ops/cg.py) is, per row r (= batch x atom x tau):

    out[r, k] = sum_{m,n} C[m*M2+n, k] * (a[r, m] *complex* b[r, n])

i.e. a complex outer product contracted against the static combined CG table.
The kernel accumulates M1 MXU matmuls per row-tile so the [R, M1*M2]
intermediate never exists in HBM.

TPU layout notes (hard-won):
  * real/imag travel as SEPARATE 2D operands — a trailing complex axis of
    size 2 would be lane-padded 2->128 by Mosaic (64x VMEM blowup);
  * Mosaic cannot reshape [R, M1, M2] -> [R, M1*M2] vectors, so the m axis is
    a static unrolled accumulation of [TILE_R, M2] x [M2, K] matmuls.

Falls back to the XLA einsum path off-TPU; `interpret=True` is used by the
CPU test suite for bit-accuracy checks against the einsum implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 256


def _cg_kernel(ar_ref, ai_ref, br_ref, bi_ref, c_ref, or_ref, oi_ref):
    # a*_ref: [TILE_R, M1]; b*_ref: [TILE_R, M2]; c_ref: [M1*M2, K]
    # o*_ref: [TILE_R, K]
    ar, ai = ar_ref[:], ai_ref[:]
    br, bi = br_ref[:], bi_ref[:]

    m1 = ar.shape[-1]
    m2 = br.shape[-1]
    k = c_ref.shape[-1]
    tile_r = ar.shape[0]

    acc_r = jnp.zeros((tile_r, k), jnp.float32)
    acc_i = jnp.zeros((tile_r, k), jnp.float32)
    for m in range(m1):
        arm = ar[:, m:m + 1]  # [TILE_R, 1]
        aim = ai[:, m:m + 1]
        xr = arm * br - aim * bi  # [TILE_R, M2]
        xi = arm * bi + aim * br
        cm = c_ref[m * m2:(m + 1) * m2, :]  # [M2, K] static row slice
        acc_r = acc_r + jnp.dot(xr, cm, preferred_element_type=jnp.float32)
        acc_i = acc_i + jnp.dot(xi, cm, preferred_element_type=jnp.float32)
    or_ref[:] = acc_r
    oi_ref[:] = acc_i


@functools.partial(jax.jit, static_argnames=('interpret', ))
def cg_contract_pallas(a_pack: jnp.ndarray, b_pack: jnp.ndarray,
                       table: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """a_pack: [..., M1, 2]; b_pack: [..., M2, 2]; table: [M1, M2, K]
    -> [..., K, 2]. Leading dims are flattened into the row axis."""
    lead = a_pack.shape[:-2]
    m1 = a_pack.shape[-2]
    m2 = b_pack.shape[-2]
    k = table.shape[-1]

    ar = a_pack[..., 0].reshape(-1, m1).astype(jnp.float32)
    ai = a_pack[..., 1].reshape(-1, m1).astype(jnp.float32)
    br = b_pack[..., 0].reshape(-1, m2).astype(jnp.float32)
    bi = b_pack[..., 1].reshape(-1, m2).astype(jnp.float32)
    rows = ar.shape[0]
    pad = (-rows) % _TILE_R
    if pad:
        ar, ai, br, bi = (jnp.pad(x, ((0, pad), (0, 0)))
                          for x in (ar, ai, br, bi))
    padded_rows = rows + pad

    mem = pltpu.ANY if interpret else pltpu.VMEM
    row_spec1 = pl.BlockSpec((_TILE_R, m1), lambda i: (i, 0), memory_space=mem)
    row_spec2 = pl.BlockSpec((_TILE_R, m2), lambda i: (i, 0), memory_space=mem)
    out_spec = pl.BlockSpec((_TILE_R, k), lambda i: (i, 0), memory_space=mem)

    out_r, out_i = pl.pallas_call(
        _cg_kernel,
        out_shape=(jax.ShapeDtypeStruct((padded_rows, k), jnp.float32),
                   jax.ShapeDtypeStruct((padded_rows, k), jnp.float32)),
        grid=(padded_rows // _TILE_R, ),
        in_specs=[row_spec1, row_spec1, row_spec2, row_spec2,
                  pl.BlockSpec((m1 * m2, k), lambda i: (0, 0), memory_space=mem)],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(ar, ai, br, bi, table.reshape(m1 * m2, k).astype(jnp.float32))

    out = jnp.stack([out_r[:rows], out_i[:rows]], axis=-1)
    return out.reshape(lead + (k, 2))
