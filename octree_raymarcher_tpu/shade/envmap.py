"""Direction-sampled environment map for ray misses (skybox parity).

Capability parity: the reference renders a cubemap skybox at infinite depth
(src/Skybox.cpp:84-107, shaders/Skybox.Vertex.glsl:13 gl_Position.xyww).
The TPU-native analog is an equirectangular map sampled by ray direction —
one flat gather per channel instead of a cubemap face dispatch (branch-free,
and the same memory layout the marcher's other tables use).  Differentiable:
pixel gradients flow into the map texels (a gather's VJP is a scatter-add),
so environments can be optimized alongside voxel parameters.

Convention: +y is up; u wraps around the y axis from +x toward +z
(u = atan2(z, x) / 2pi + 0.5), v = 0 at the zenith (+y) to 1 at the nadir.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sample_env(envmap, dirs, bilinear: bool = True):
    """Sample an equirect map f32[H, W, 3] by direction f32[N, 3] -> [N, 3].

    Uses per-channel flat 1D gathers (2D gathers serialize on TPU,
    docs/PERF_NOTES.md); bilinear blends 4 taps with wraparound in u and
    clamp in v."""
    e = jnp.asarray(envmap, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    H, W = e.shape[0], e.shape[1]
    n = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)

    u = jnp.arctan2(n[:, 2], n[:, 0]) / (2.0 * jnp.pi) + 0.5   # [0, 1) wrap
    v = jnp.arccos(jnp.clip(n[:, 1], -1.0, 1.0)) / jnp.pi      # 0=zenith

    flat = e.reshape(-1, 3)

    def tap(xi, yi):
        xi = jnp.mod(xi, W)
        yi = jnp.clip(yi, 0, H - 1)
        lin = yi * W + xi
        return jnp.stack(
            [flat[:, 0][lin], flat[:, 1][lin], flat[:, 2][lin]], axis=-1
        )

    if not bilinear:
        xi = jnp.mod((u * W).astype(jnp.int32), W)
        yi = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
        return tap(xi, yi)

    x = u * W - 0.5
    y = v * H - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    c00 = tap(x0, y0)
    c01 = tap(x0 + 1, y0)
    c10 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


def default_envmap(
    height: int = 64,
    width: int = 128,
    zenith=(0.25, 0.45, 0.85),
    horizon=(0.75, 0.82, 0.92),
    ground=(0.35, 0.32, 0.28),
    sun_dir=(0.45, 0.6, 0.2),
    sun_color=(8.0, 7.2, 6.0),
    sun_sharpness: float = 400.0,
) -> np.ndarray:
    """Procedural sky: zenith->horizon gradient, darker ground hemisphere,
    and a smooth sun disc toward ``sun_dir`` (the stand-in for the
    reference's cubemap PNGs)."""
    vs = (np.arange(height) + 0.5) / height
    us = (np.arange(width) + 0.5) / width
    theta = vs * np.pi               # polar angle from zenith
    phi = (us - 0.5) * 2 * np.pi
    st = np.sin(theta)[:, None]
    dirs = np.stack(
        [
            st * np.cos(phi)[None, :],
            np.cos(theta)[:, None] * np.ones_like(phi)[None, :],
            st * np.sin(phi)[None, :],
        ],
        axis=-1,
    )  # [H, W, 3]

    y = dirs[..., 1]
    sky_t = np.clip(y, 0.0, 1.0) ** 0.7
    col = (
        np.asarray(horizon)[None, None] * (1 - sky_t[..., None])
        + np.asarray(zenith)[None, None] * sky_t[..., None]
    )
    ground_t = np.clip(-y, 0.0, 1.0) ** 0.5
    col = col * (1 - ground_t[..., None]) + np.asarray(ground)[
        None, None
    ] * ground_t[..., None]

    s = np.asarray(sun_dir, dtype=np.float64)
    s = s / np.linalg.norm(s)
    cosang = np.clip((dirs * s[None, None]).sum(-1), -1.0, 1.0)
    sun = np.exp(sun_sharpness * (cosang - 1.0))
    col = col + np.asarray(sun_color)[None, None] * sun[..., None]
    return col.astype(np.float32)


__all__ = ["sample_env", "default_envmap"]
