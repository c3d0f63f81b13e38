"""Soft voxel compositing: the differentiable half of the renderer.

Alpha-composites the segments recorded by diff/segments.py under per-voxel
density + albedo parameters:

    sigma_i = softplus(density_raw[slot_i])
    alpha_i = 1 - exp(-sigma_i * (t1_i - t0_i))
    w_i     = alpha_i * prod_{j<i} (1 - alpha_j)
    rgb     = sum_i w_i * sigmoid(albedo_raw[slot_i]) + T_end * sky
    depth   = sum_i w_i * midpoint_i  (+ T_end * far)

Pure jnp over static-shape arrays — reverse-mode differentiable end to end;
pixel gradients flow to every voxel the ray crossed.  This generalizes the
binary hit of the reference renderer (and is the live version of its dead
translucency compositor, ParallaxAlpha.Fragment.glsl:233-353).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .segments import SegmentBatch


@struct.dataclass
class VoxelParams:
    density_raw: Any   # f32[P]    softplus -> density
    albedo_raw: Any    # f32[P,3]  sigmoid -> color

    @property
    def num_slots(self) -> int:
        return self.density_raw.shape[0]


def init_params_from_world(
    world,
    materials=None,
    solid_density: float = 40.0,
    num_materials: int = 8,
) -> VoxelParams:
    """Initialize params so the soft render approximates the hard render:
    solid voxels opaque with their material's diffuse color, empty voxels
    transparent.

    Pure jnp on purpose: the twig pool is usually already ON DEVICE here,
    and a single ``np.asarray(world.twig)`` readback permanently flips an
    axon-tunnel process into synchronous per-kernel dispatch (the readback
    curse, docs/PERF_NOTES.md) — bench_diff measured its geometry pass 600x
    slow from exactly that before this function went device-side."""
    import numpy as np

    from ..shade.materials import MaterialTable

    materials = MaterialTable.default() if materials is None else materials
    # Clip in the twig pool's NATIVE (unsigned) dtype before any signed
    # cast: a word >= 2^31 cast to int32 flips negative and jnp.clip would
    # silently remap it to material 0 instead of the last table row
    # (ADVICE r2).  Material ids fit in 16 bits, so post-clip int32 is safe.
    twig = jnp.asarray(world.twig)
    mats = jnp.concatenate(
        [twig, jnp.arange(num_materials, dtype=twig.dtype)]
    )
    solid = mats != 0

    # softplus^-1 of the scalar target density (host float math only)
    dr_solid = float(np.log(np.expm1(max(float(solid_density), 1e-6))))
    density_raw = jnp.where(
        solid, jnp.float32(dr_solid), jnp.float32(-8.0)
    ).astype(jnp.float32)

    diffuse = jnp.asarray(materials.diffuse, dtype=jnp.float32)
    mc = jnp.minimum(mats, mats.dtype.type(diffuse.shape[0] - 1)).astype(
        jnp.int32
    )
    # channel-wise 1D gathers (2D row gathers serialize on TPU)
    colors = jnp.stack(
        [diffuse[:, 0][mc], diffuse[:, 1][mc], diffuse[:, 2][mc]], axis=-1
    )
    c = jnp.clip(colors, 1e-4, 1 - 1e-4)
    albedo_raw = jnp.log(c / (1 - c)).astype(jnp.float32)

    return VoxelParams(density_raw=density_raw, albedo_raw=albedo_raw)


def composite(
    segments: SegmentBatch,
    params: VoxelParams,
    sky=(0.45, 0.65, 0.95),
    far: float = 8192.0,
    sky_rgb=None,
):
    """Returns dict(rgb f32[N,3], depth f32[N], opacity f32[N]).

    ``sky_rgb`` (f32[N,3], optional) overrides the constant ``sky`` with a
    per-ray background — e.g. an environment map sampled by ray direction
    (shade/envmap.py); gradients flow through it to the map texels."""
    slot = segments.slot
    valid = slot >= 0
    slot_c = jnp.clip(slot, 0, params.num_slots - 1)

    sigma = jnp.logaddexp(params.density_raw[slot_c], 0.0)  # stable softplus
    dl = jnp.maximum(segments.t1 - segments.t0, 0.0)
    tau = jnp.where(valid, sigma * dl, 0.0)

    alpha = 1.0 - jnp.exp(-tau)
    # Transmittance before each segment: exp(-cumsum of previous taus).
    tau_before = jnp.cumsum(tau, axis=1) - tau
    T = jnp.exp(-tau_before)
    w = alpha * T                                       # [N, K]

    # Channel-wise 1D gathers: albedo_raw[slot_c] is a [P,3] row gather,
    # which TPU lowers to one DMA per segment (docs/PERF_NOTES.md); three
    # flat gathers vectorize (and their VJP is three 1D scatter-adds).
    ar = params.albedo_raw
    albedo = jax.nn.sigmoid(
        jnp.stack([ar[:, 0][slot_c], ar[:, 1][slot_c], ar[:, 2][slot_c]], axis=-1)
    )  # [N, K, 3]
    rgb = jnp.sum(w[..., None] * albedo, axis=1)
    T_end = jnp.exp(-jnp.sum(tau, axis=1))
    bg = (
        jnp.asarray(sky, dtype=jnp.float32)
        if sky_rgb is None
        else jnp.asarray(sky_rgb, dtype=jnp.float32)
    )
    rgb = rgb + T_end[:, None] * bg

    mid = 0.5 * (segments.t0 + segments.t1)
    depth = jnp.sum(w * mid, axis=1) + T_end * jnp.float32(far)
    opacity = 1.0 - T_end
    return {"rgb": rgb, "depth": depth, "opacity": opacity, "weights": w}


def render_soft(
    world,
    params: VoxelParams,
    origins,
    dirs,
    max_segments: int = 32,
    max_steps: int = 512,
    sky=(0.45, 0.65, 0.95),
    envmap=None,
):
    """Differentiable render = stop-gradient geometry sampling + compositing.
    ``envmap`` (equirect f32[H,W,3]) replaces the constant sky, sampled by
    ray direction; gradients reach both voxel params and the map."""
    from .segments import sample_segments

    segs = sample_segments(world, origins, dirs, max_segments, max_steps)
    segs = jax.lax.stop_gradient(segs)
    sky_rgb = None
    if envmap is not None:
        from ..shade.envmap import sample_env

        sky_rgb = sample_env(envmap, jnp.asarray(dirs, dtype=jnp.float32))
    return composite(segs, params, sky, sky_rgb=sky_rgb)


__all__ = ["VoxelParams", "init_params_from_world", "composite", "render_soft"]
