"""Vectorized ray/box geometry for the marcher and shading.

All functions are jnp-based, operate on float32 arrays with a trailing
``(..., 3)`` axis, and are safe under jit (no data-dependent control flow).

Capability parity: reference src/Traverse.cpp:18-32,115-125 (inside test,
escape/enter distance) and shaders/Chunkmarch.glsl:100-149 (degenerate-escape
clamp, hit normal, face UV) — re-derived, branch-free, for lockstep vector
execution.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import BIGEPS, EPS


def is_inside(p, cmin, cmax):
    """True where p lies in the closed box [cmin, cmax]. (...,3) -> (...)."""
    return jnp.all((p >= cmin) & (p <= cmax), axis=-1)


def inv_dir(d):
    """Safe reciprocal of a ray direction; zero components map to huge values."""
    eps = jnp.float32(1e-30)
    safe = jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)
    return 1.0 / safe


def escape_distance(p, g, cmin, cmax):
    """Distance along the ray (direction reciprocal g) from p to exit the box.

    Degenerate results (< EPS, from rays grazing a face) clamp to BIGEPS so a
    marcher never stalls — matching the GPU reference's behavior.
    """
    tmin = (cmin - p) * g
    tmax = (cmax - p) * g
    t = jnp.maximum(tmin, tmax)
    d = jnp.min(t, axis=-1)
    return jnp.where(d < EPS, jnp.float32(BIGEPS), d)


def enter_distance(p, g, cmin, cmax):
    """(t_near, hit) slab test for entering the box from outside.

    ``hit`` is True only when the box is ahead of p (t_near > 0) and the
    interval is non-empty, as in the reference's cubeEnterDistance.
    """
    tmin = (cmin - p) * g
    tmax = (cmax - p) * g
    t1 = jnp.minimum(tmin, tmax)
    t2 = jnp.maximum(tmin, tmax)
    tnear = jnp.max(t1, axis=-1)
    tfar = jnp.min(t2, axis=-1)
    return tnear, (tfar > tnear) & (tnear > 0)


def cube_normal(p, cmin, cmax):
    """Axis-aligned outward face normal of the box face nearest to surface point p."""
    center = (cmin + cmax) * 0.5
    half = (cmax - cmin) * 0.5
    n = (p - center) / jnp.maximum(half, jnp.float32(1e-30))
    # The dominant-magnitude axis (|n| closest to 1) is the face axis; the
    # reference truncates n*(1+EPS) to ints, which keeps only components that
    # reached the face. Do the same branch-free.
    q = (n * (1.0 + EPS)).astype(jnp.int32).astype(jnp.float32)
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, jnp.float32(1e-12))


def cube_uv(p, cmin, cmax):
    """Per-face UV in [0,1]^2 of surface point p on the box, like cubeUV."""
    size = (cmax[..., 0] - cmin[..., 0])[..., None]
    uv = jnp.zeros(p.shape[:-1] + (2,), dtype=p.dtype)

    def face(cond, val, uv):
        return jnp.where(cond[..., None], val, uv)

    uv = face(jnp.abs(p[..., 0] - cmin[..., 0]) <= EPS, p[..., 1:3] - cmin[..., 1:3], uv)
    uv = face(jnp.abs(p[..., 0] - cmax[..., 0]) <= EPS, p[..., 1:3] - cmax[..., 1:3], uv)
    uv = face(jnp.abs(p[..., 1] - cmin[..., 1]) <= EPS, p[..., 0:3:2] - cmin[..., 0:3:2], uv)
    uv = face(jnp.abs(p[..., 1] - cmax[..., 1]) <= EPS, p[..., 0:3:2] - cmax[..., 0:3:2], uv)
    uv = face(jnp.abs(p[..., 2] - cmin[..., 2]) <= EPS, p[..., 0:2] - cmin[..., 0:2], uv)
    uv = face(jnp.abs(p[..., 2] - cmax[..., 2]) <= EPS, p[..., 0:2] - cmax[..., 0:2], uv)
    return jnp.abs(uv) / jnp.maximum(size, jnp.float32(1e-30))


def inverse_depth(dist):
    """Nonlinear inverse-depth encoding used for z-composition (NEAR/FAR)."""
    from .constants import FAR, NEAR

    inv_near = 1.0 / NEAR
    inv_far = 1.0 / FAR
    return (1.0 / jnp.maximum(dist, jnp.float32(1e-6)) - inv_near) / (inv_far - inv_near)


def depth_to_distance(depth):
    """Exact inverse of :func:`inverse_depth` (decode a stored depth code
    back to world-space distance).  Used by the shadow-map compare, which
    must happen in DISTANCE space: at light distances of O(100) units the
    inverse-depth code compresses ~10 units of occluder separation into
    ~1e-5 of code range, so a fixed code-space bias either admits acne or
    rejects every shadow."""
    from .constants import FAR, NEAR

    inv_near = 1.0 / NEAR
    inv_far = 1.0 / FAR
    inv = depth * jnp.float32(inv_far - inv_near) + jnp.float32(inv_near)
    return 1.0 / jnp.maximum(inv, jnp.float32(1.0 / FAR))


__all__ = [
    "is_inside",
    "inv_dir",
    "escape_distance",
    "enter_distance",
    "cube_normal",
    "cube_uv",
    "inverse_depth",
]
