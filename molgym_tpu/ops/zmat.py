"""Internal-coordinate (z-matrix) geometry as pure JAX.

Reimplements the reference's numpy z-matrix toolbox
(reference molgym/agents/internal/zmat.py) as jit/vmap-able functions with
static shapes, so atom placement happens on device inside the policy instead
of in a per-observation Python loop.

Conventions follow the reference exactly, including its dihedral sign
convention (zmat.py:34-63) and the auxiliary-axis construction for canvases
with fewer than three atoms (zmat.py:99-133).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-10


def get_distance(p_i: jnp.ndarray, p_j: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.square(p_i - p_j), axis=-1))


def get_angle(p_i: jnp.ndarray, p_j: jnp.ndarray, p_k: jnp.ndarray) -> jnp.ndarray:
    """Angle at vertex j between points i, j, k, in radians."""
    rij = p_i - p_j
    rkj = p_k - p_j
    sin_theta = jnp.linalg.norm(jnp.cross(rij, rkj), axis=-1)
    cos_theta = jnp.sum(rij * rkj, axis=-1)
    return jnp.arctan2(sin_theta, cos_theta)


def get_dihedral(p_i: jnp.ndarray, p_j: jnp.ndarray, p_k: jnp.ndarray,
                 p_l: jnp.ndarray) -> jnp.ndarray:
    """Dihedral between the (i,j,k) and (j,k,l) planes, with the reference's
    sign convention (zmat.py:58-63)."""
    r_ji = p_j - p_i
    r_kj = p_k - p_j
    r_lk = p_l - p_k

    v1 = jnp.cross(r_ji, r_kj)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), _EPS)
    v2 = jnp.cross(r_lk, r_kj)
    v2 = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), _EPS)
    m1 = jnp.cross(v1, r_kj) / jnp.maximum(
        jnp.linalg.norm(r_kj, axis=-1, keepdims=True), _EPS)

    x = jnp.sum(v1 * v2, axis=-1)
    y = jnp.sum(m1 * v2, axis=-1)
    psi = jnp.arctan2(y, x)
    return jnp.where(psi < 0, -psi - jnp.pi, jnp.pi - psi)


def position_point(p0: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray,
                   distance: jnp.ndarray, angle: jnp.ndarray,
                   dihedral: jnp.ndarray) -> jnp.ndarray:
    """Place a point at `distance` from p2, `angle` w.r.t. p1, `dihedral`
    w.r.t. p0 (reference zmat.py:66-96). Broadcasts over leading dims."""
    distance = jnp.asarray(distance)[..., None]
    angle = jnp.asarray(angle)[..., None]
    dihedral = jnp.asarray(dihedral)[..., None]

    x = distance * jnp.cos(angle)
    y = distance * jnp.cos(dihedral) * jnp.sin(angle)
    z = distance * jnp.sin(dihedral) * jnp.sin(angle)

    v_a = p1 - p0
    v_b = p2 - p1
    v_b = v_b / jnp.maximum(jnp.linalg.norm(v_b, axis=-1, keepdims=True), _EPS)

    c_ab = jnp.cross(v_a, v_b)
    c_ab = c_ab / jnp.maximum(jnp.linalg.norm(c_ab, axis=-1, keepdims=True), _EPS)
    c_ab_b = jnp.cross(c_ab, v_b)

    return p2 - v_b * x + c_ab_b * y + c_ab * z


def position_atom(positions: jnp.ndarray, n_atoms: jnp.ndarray, focus: jnp.ndarray,
                  distance: jnp.ndarray, angle: jnp.ndarray,
                  dihedral: jnp.ndarray) -> jnp.ndarray:
    """Static-shape version of the reference's `position_atom_helper`
    (zmat.py:99-133).

    positions: float[N, 3] padded canvas; n_atoms: int scalar (valid count);
    focus: int scalar index. Returns float[3]. vmap over a batch axis for
    vectorized placement.
    """
    n = positions.shape[0]
    idx = jnp.arange(n)
    valid = idx < n_atoms

    focus_pos = positions[jnp.clip(focus, 0, n - 1)]
    dists = get_distance(positions, focus_pos)
    dists = jnp.where(valid, dists, jnp.inf)
    order = jnp.argsort(dists)
    sorted_pos = positions[order]

    p_aux_1 = jnp.array([1.0, 0.0, 0.0], dtype=positions.dtype)
    p_aux_0 = jnp.array([0.0, 1.0, 0.0], dtype=positions.dtype)

    s0, s1, s2 = sorted_pos[0], sorted_pos[1 % n], sorted_pos[2 % n]

    # n_atoms == 1: p2 = nearest; p1, p0 from auxiliary axes.
    p2_1, p1_1, p0_1 = s0, s0 + p_aux_1, s0 + p_aux_0
    # n_atoms == 2.
    p2_2, p1_2, p0_2 = s0, s1, s0 + s1 + p_aux_0 + p_aux_1
    # n_atoms >= 3.
    p2_3, p1_3, p0_3 = s0, s1, s2

    two = (n_atoms == 2)
    many = (n_atoms >= 3)
    p2 = jnp.where(many, p2_3, jnp.where(two, p2_2, p2_1))
    p1 = jnp.where(many, p1_3, jnp.where(two, p1_2, p1_1))
    p0 = jnp.where(many, p0_3, jnp.where(two, p0_2, p0_1))

    placed = position_point(p0, p1, p2, distance, angle, dihedral)
    origin = jnp.zeros(3, dtype=positions.dtype)
    return jnp.where(n_atoms == 0, origin, placed)
