"""Pallas TPU kernel for the fused Clebsch-Gordan contraction.

The packed CG product (ops/cg.py) is, per row r (= batch x atom x tau) :

    out[r, k] = sum_{m,n} C[m*M2+n, k] * (a[r, m] *complex* b[r, n])

i.e. a complex outer product followed by a dense matmul against the static
combined CG table. This kernel fuses the outer-product construction with the
MXU matmul so the [R, M1*M2] intermediate never exists in HBM: per R-tile it
builds the real/imag outer products in VMEM and issues two dot products
against the table (real and imaginary output parts).

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


def _cg_kernel(a_ref, b_ref, c_ref, out_ref):
    # a_ref: [TILE_R, M1, 2]; b_ref: [TILE_R, M2, 2]; c_ref: [M1*M2, K]
    # out_ref: [TILE_R, K, 2]
    ar, ai = a_ref[:, :, 0], a_ref[:, :, 1]
    br, bi = b_ref[:, :, 0], b_ref[:, :, 1]

    tile_r, m1 = ar.shape
    m2 = br.shape[-1]

    # complex outer products in VMEM: [TILE_R, M1*M2]
    xr = (ar[:, :, None] * br[:, None, :] -
          ai[:, :, None] * bi[:, None, :]).reshape(tile_r, m1 * m2)
    xi = (ar[:, :, None] * bi[:, None, :] +
          ai[:, :, None] * br[:, None, :]).reshape(tile_r, m1 * m2)

    c = c_ref[:]
    yr = jnp.dot(xr, c, preferred_element_type=jnp.float32)
    yi = jnp.dot(xi, c, preferred_element_type=jnp.float32)
    out_ref[:, :, 0] = yr
    out_ref[:, :, 1] = yi


@functools.partial(jax.jit, static_argnames=('interpret', ))
def cg_contract_pallas(a_pack: jnp.ndarray, b_pack: jnp.ndarray,
                       table: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """a_pack: [..., M1, 2]; b_pack: [..., M2, 2]; table: [M1, M2, K]
    -> [..., K, 2]. Leading dims are flattened into the row axis."""
    lead = a_pack.shape[:-2]
    m1 = a_pack.shape[-2]
    m2 = b_pack.shape[-2]
    k = table.shape[-1]

    a2 = a_pack.reshape(-1, m1, 2)
    b2 = b_pack.reshape(-1, m2, 2)
    rows = a2.shape[0]
    pad = (-rows) % _TILE_R
    if pad:
        a2 = jnp.pad(a2, ((0, pad), (0, 0), (0, 0)))
        b2 = jnp.pad(b2, ((0, pad), (0, 0), (0, 0)))
    padded_rows = rows + pad
    c2 = table.reshape(m1 * m2, k)

    out = pl.pallas_call(
        _cg_kernel,
        out_shape=jax.ShapeDtypeStruct((padded_rows, k, 2), jnp.float32),
        grid=(padded_rows // _TILE_R, ),
        in_specs=[
            pl.BlockSpec((_TILE_R, m1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((_TILE_R, m2, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((m1 * m2, k), lambda i: (0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_R, k, 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(a2.astype(jnp.float32), b2.astype(jnp.float32), c2.astype(jnp.float32))

    return out[:rows].reshape(lead + (k, 2))
