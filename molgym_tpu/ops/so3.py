"""SO(3) representation utilities.

SO3Vec = list/tuple of arrays, entry l shaped [..., tau_l, 2l+1, 2] (complex
as trailing real/imag). Covers the reference's so3_tools toolbox
(molgym/agents/covariant/so3_tools.py): grids, complex products, a_lm
normalization, selection helpers, AtomicScalars invariants — plus the
Wigner-D machinery cormorant supplied for the equivariance tests
(tests/agents/covariant/test_agent.py:49-65).
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

SO3Vec = List[jnp.ndarray]


# -- grids and coordinates -----------------------------------------------------

def generate_fibonacci_grid(n: int) -> np.ndarray:
    """Quasi-uniform points on S^2 (offset Fibonacci lattice; same scheme as
    reference so3_tools.py:8-19)."""
    golden_ratio = (1 + 5 ** 0.5) / 2
    index = np.arange(0, n)
    theta = np.arccos(1 - 2 * (index + 0.5) / n)
    phi = 2 * np.pi * index / golden_ratio
    return spherical_to_cartesian(np.stack([theta, phi], axis=-1))


def spherical_to_cartesian(theta_phi: np.ndarray) -> np.ndarray:
    theta, phi = theta_phi[..., 0], theta_phi[..., 1]
    return np.stack([np.sin(theta) * np.cos(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(theta)], axis=-1)


def cartesian_to_spherical(pos: np.ndarray) -> np.ndarray:
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    r = np.linalg.norm(pos, axis=-1)
    return np.stack([np.arccos(z / r), np.arctan2(y, x)], axis=-1)


# -- complex helpers ------------------------------------------------------------

def complex_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ai * br + ar * bi], axis=-1)


def sum_product_alms_ylms(a_lms: Sequence[jnp.ndarray],
                          y_lms: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """s = sum_l sum_tau sum_m a_ltm * Y_lm  -> [..., 2] (reference
    so3_tools.py:47-58). Broadcasts leading dims."""
    total = None
    for a, y in zip(a_lms, y_lms):
        prod = complex_product(a, y)
        summand = jnp.sum(prod, axis=(-3, -2))  # over tau and m
        total = summand if total is None else total + summand
    return total


def get_normalization_constant(a_lms: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """k = sum_l sum_m |sum_tau a_ltm|^2 (reference so3_tools.py:61-72)."""
    total = None
    for a in a_lms:
        summed = jnp.sum(a, axis=-3)  # over taus -> [..., 2l+1, 2]
        item = jnp.sum(jnp.square(summed), axis=(-2, -1))
        total = item if total is None else total + item
    return total


def normalize_alms(a_lms: Sequence[jnp.ndarray]) -> SO3Vec:
    k = get_normalization_constant(a_lms)
    inv = 1.0 / jnp.sqrt(jnp.maximum(k, 1e-10))
    return [a * inv[..., None, None, None] for a in a_lms]


# -- selection helpers (reference so3_tools.py:108-144) -------------------------

def select_atomic_covariats(vec: Sequence[jnp.ndarray],
                            focus_oh: jnp.ndarray) -> SO3Vec:
    """[B, N, tau, m, 2] x [B, N] -> [B, tau, m, 2]."""
    return [jnp.einsum('bn,bntmx->btmx', focus_oh, part) for part in vec]


def select_atomic_invariats(invariats: jnp.ndarray,
                            focus_oh: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum('bn,bnf->bf', focus_oh, invariats)


def select_taus(vec: Sequence[jnp.ndarray], indices: jnp.ndarray) -> SO3Vec:
    """Gather tau channels [B, T, m, 2] at indices [B, K] -> [B, K, m, 2]."""
    out = []
    for part in vec:
        gathered = jnp.take_along_axis(
            part, indices[:, :, None, None].astype(jnp.int32), axis=1)
        out.append(gathered)
    return out


# -- invariants (reference AtomicScalars, so3_tools.py:147-192) ------------------

def atomic_scalars(vec: Sequence[jnp.ndarray], full_scalars: bool = True) -> jnp.ndarray:
    """Rotation-invariant features from an SO3Vec: the l=0 part, per-l
    self-products with parity signs, and per-l norms. Output dim
    (maxl+2) * tau * 2 with full_scalars (so3_tools.py:170-173)."""
    scalars = [vec[0]]  # [..., tau, 1, 2]
    if full_scalars:
        parts = []
        for l, part in enumerate(vec):
            m_range = np.arange(-l, l + 1)
            sign_r = jnp.asarray(((-1.0) ** m_range).astype(np.float32))
            signs = jnp.stack([sign_r, -sign_r], axis=-1)  # [2l+1, 2]
            s_prod = jnp.sum(signs * part * jnp.flip(part, axis=-2),
                             axis=(-2, -1), keepdims=True)  # [..., tau, 1, 1]
            s_norm = jnp.sum(part * part, axis=(-2, -1), keepdims=True)
            parts.append(jnp.concatenate([s_prod, s_norm], axis=-1))  # [..., tau, 1, 2]
        scalars += parts
    cat = jnp.concatenate(scalars, axis=-3)  # [..., K*tau, 1, 2]
    return cat.reshape(cat.shape[:-3] + (-1, ))


def atomic_scalars_dim(maxl: int, channels: int, full_scalars: bool = True) -> int:
    return (maxl + 2) * channels * 2 if full_scalars else channels * 2


# -- Wigner rotations (test infra; host-side numpy, float64) ---------------------

def wigner_d_small(l: int, beta: float) -> np.ndarray:
    """d^l_{m'm}(beta), indices ascending from -l."""
    d = np.zeros((2 * l + 1, 2 * l + 1), dtype=np.float64)
    f = math.factorial
    cb, sb = math.cos(beta / 2.0), math.sin(beta / 2.0)
    for i_mp, mp in enumerate(range(-l, l + 1)):
        for i_m, m in enumerate(range(-l, l + 1)):
            pref = math.sqrt(f(l + mp) * f(l - mp) * f(l + m) * f(l - m))
            total = 0.0
            k_min = max(0, m - mp)
            k_max = min(l + m, l - mp)
            for k in range(k_min, k_max + 1):
                denom = f(k) * f(l + m - k) * f(l - mp - k) * f(mp - m + k)
                total += ((-1.0) ** (mp - m + k) *
                          cb ** (2 * l + m - mp - 2 * k) *
                          sb ** (mp - m + 2 * k)) / denom
            d[i_mp, i_m] = pref * total
    return d


def wigner_D(l: int, alpha: float, beta: float, gamma: float) -> np.ndarray:
    """D^l_{m'm}(alpha, beta, gamma) = e^{-i m' alpha} d^l(beta) e^{-i m gamma}
    (zyz convention), complex128 [2l+1, 2l+1]."""
    d = wigner_d_small(l, beta)
    m = np.arange(-l, l + 1)
    return (np.exp(-1j * m[:, None] * alpha) * d * np.exp(-1j * m[None, :] * gamma))


def rotation_matrix(alpha: float, beta: float, gamma: float) -> np.ndarray:
    """R = Rz(alpha) @ Ry(beta) @ Rz(gamma)."""
    def rz(t):
        return np.array([[np.cos(t), -np.sin(t), 0],
                         [np.sin(t), np.cos(t), 0], [0, 0, 1]])

    def ry(t):
        return np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0],
                         [-np.sin(t), 0, np.cos(t)]])

    return rz(alpha) @ ry(beta) @ rz(gamma)


def gen_rot(maxl: int, rng: np.random.RandomState
            ) -> Tuple[List[np.ndarray], np.ndarray, Tuple[float, float, float]]:
    """Random rotation: per-l Wigner-D matrices + the 3x3 rotation matrix
    (cormorant rotations.gen_rot analog used by the reference tests)."""
    alpha = float(rng.uniform(0, 2 * np.pi))
    beta = float(np.arccos(rng.uniform(-1, 1)))
    gamma = float(rng.uniform(0, 2 * np.pi))
    ds = [wigner_D(l, alpha, beta, gamma) for l in range(maxl + 1)]
    return ds, rotation_matrix(alpha, beta, gamma), (alpha, beta, gamma)


def apply_wigner(a_lms: Sequence[jnp.ndarray],
                 wigner: Sequence[np.ndarray]) -> SO3Vec:
    """Rotate coefficients: if f(x) = sum a_lm Y_lm(x), the function rotated
    by R (i.e. g(x) = f(R^-1 x)) has coefficients b = D(R) applied per l:
    b_{l m'} = sum_m D^l_{m' m} a_{l m}.  (Convention fixed by
    tests/covariant/test_so3.py against the SH implementation.)"""
    out = []
    for a, D in zip(a_lms, wigner):
        dr = jnp.asarray(np.real(D).astype(np.float32))
        di = jnp.asarray(np.imag(D).astype(np.float32))
        ar, ai = a[..., 0], a[..., 1]
        br = jnp.einsum('pm,...m->...p', dr, ar) - jnp.einsum('pm,...m->...p', di, ai)
        bi = jnp.einsum('pm,...m->...p', dr, ai) + jnp.einsum('pm,...m->...p', di, ar)
        out.append(jnp.stack([br, bi], axis=-1))
    return out
