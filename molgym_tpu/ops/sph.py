"""Complex spherical harmonics with quantum-mechanical normalization.

Replaces cormorant's SphericalHarmonics/SphericalHarmonicsRel (used by the
reference at molgym/agents/covariant/modules.py:52-57 and
molgym/agents/covariant/agent.py:97-102). Conventions:

  * Condon-Shortley phase, m ascending from -l to +l
  * Y_lm normalized so that ∫ |Y_lm|^2 dΩ = 1 ('qm' norm — the reference
    validates this against Mathematica constants, tests/.../test_sphs.py)
  * complex numbers carried as a trailing (real, imag) axis of size 2 —
    TPU-friendly (no complex dtype in the hot path), same layout as the
    reference stack (so3_tools.py:41-44)

Implementation is trig-free: with x = cosθ and u = (px + i·py)/r, the
product sinθ^m · e^{imφ} equals u^m, so the associated-Legendre factors reduce
to polynomials P̃_l^m(x) = P_l^m(x)/sinθ^m obtained by the standard stable
recursion. All loops are over static l, m (unrolled at trace time).
"""
from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def _norm_coeff(l: int, m: int) -> float:
    return math.sqrt((2 * l + 1) / (4.0 * math.pi) *
                     math.factorial(l - m) / math.factorial(l + m))


def spherical_harmonics(maxl: int, pos: jnp.ndarray,
                        normalize: bool = True,
                        conj: bool = False) -> List[jnp.ndarray]:
    """Y_lm for l = 0..maxl at directions `pos` [..., 3].

    Returns a list of arrays, entry l shaped [..., 2l+1, 2] (m ascending,
    trailing axis = real/imag). With normalize=False the input vector is used
    raw, producing r^l-scaled solid harmonics (matching the reference test's
    normalize flag semantics, tests/.../test_sphs.py:42-44 — the test feeds a
    unit vector, so values coincide).
    """
    px, py, pz = pos[..., 0], pos[..., 1], pos[..., 2]
    if normalize:
        r = jnp.sqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-24))
        px, py, pz = px / r, py / r, pz / r

    x = pz  # cos(theta) for unit input
    # u^m as (real, imag); u = px + i*py  (|u| = sin(theta) for unit input)
    u_pows_r = [jnp.ones_like(px)]
    u_pows_i = [jnp.zeros_like(px)]
    for m in range(1, maxl + 1):
        ur, ui = u_pows_r[-1], u_pows_i[-1]
        u_pows_r.append(ur * px - ui * py)
        u_pows_i.append(ur * py + ui * px)

    # P̃_l^m(x) = P_l^m / sin^m theta, stable upward recursion.
    ptilde = {}
    for m in range(0, maxl + 1):
        pmm = ((-1.0) ** m) * float(np.prod(np.arange(1, 2 * m, 2), dtype=np.float64))
        ptilde[(m, m)] = jnp.full_like(x, pmm)
        if m + 1 <= maxl:
            ptilde[(m + 1, m)] = (2 * m + 1) * x * ptilde[(m, m)]
        for l in range(m + 2, maxl + 1):
            ptilde[(l, m)] = ((2 * l - 1) * x * ptilde[(l - 1, m)] -
                              (l + m - 1) * ptilde[(l - 2, m)]) / (l - m)

    out: List[jnp.ndarray] = []
    sign = -1.0 if conj else 1.0
    for l in range(0, maxl + 1):
        comps = []
        for m in range(-l, l + 1):
            am = abs(m)
            base = _norm_coeff(l, am) * ptilde[(l, am)]
            yr = base * u_pows_r[am]
            yi = base * u_pows_i[am]
            if m < 0:
                # Y_{l,-m} = (-1)^m conj(Y_{lm})
                phase = (-1.0) ** am
                yr, yi = phase * yr, -phase * yi
            comps.append(jnp.stack([yr, sign * yi], axis=-1))
        out.append(jnp.stack(comps, axis=-2))  # [..., 2l+1, 2]
    return out


def spherical_harmonics_rel(maxl: int, pos1: jnp.ndarray, pos2: jnp.ndarray,
                            conj: bool = True
                            ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Relative spherical harmonics Y_lm(r_i - r_j) and norms |r_i - r_j|
    (cormorant SphericalHarmonicsRel: reference covariant/modules.py:52-57).

    pos1: [..., N, 3], pos2: [..., M, 3] -> per-l [..., N, M, 2l+1, 2] and
    norms [..., N, M].
    """
    rel = pos1[..., :, None, :] - pos2[..., None, :, :]
    norms = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1), 1e-24))
    sph = spherical_harmonics(maxl, rel, normalize=True, conj=conj)
    return sph, norms
