"""The forward render pass: march + Blinn-Phong shade + shadow + depth AOVs.

Capability parity with the reference frame (SURVEY.md §3.2): the main pass
(shaders/World.Fragment.glsl) marches the eye rays, computes hit normal,
face UV, optional atlas texture color, three-light Blinn-Phong with a shadow
factor, inverse-depth z, and a sky color for misses; the shadow pass
(shaders/ShadowmapWorld.*) renders an inverse-depth map from the
directional light which the main pass projects against.  Two shadow modes:

  * ``"map"``  — projective shadow map, like the reference;
  * ``"ray"``  — a second march from each hit toward the light (a
    raymarcher-native hard shadow, no projection aliasing);
  * ``"none"``.

Everything after the march is differentiable with respect to lights,
materials, and atlas texels.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import EPS, FAR, NEAR
from ..core.geometry import cube_normal, cube_uv, inverse_depth
from ..ops.march_jnp import march, march_frame, march_tiled
from ..world.device import DeviceWorld
from .lights import LightRig
from .materials import MaterialTable
from .transforms import look_at, ortho


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    shadow: str = "none"            # "none" | "ray" | "map"
    max_steps: int = 512
    sky: tuple = (0.45, 0.65, 0.95)
    gamma: float = 2.2              # atlas decode gamma
    shadow_bias: float = 4.0   # map-shadow bias, in map TEXELS (see map_shadow)
    # Ray-tile size for the march: each tile's loop exits at its own worst
    # ray, so coherent tiles waste fewer lockstep lanes (docs/PERF_NOTES.md;
    # 8192 measured best at 1080p on v5e).  <=0 marches the whole batch.
    tile: int = 8192
    # Static-world fast path: skip the per-step chunk-residency gathers
    # (valid until a shift() makes the chunk table partially stale mid-
    # stream; tested equivalent on static worlds).  ~20% fewer in-loop
    # gathers at 1080p.
    assume_resident: bool = False
    # Per-ray traversal-step debug AOV (the reference's `steps` counters):
    # False (default) returns steps == 0 at full speed; "coarse" counts
    # steps quantized to ~16 via the staged fast loop at ~1x cost (the
    # profiling mode); True counts exactly via the multi-carry loop at
    # ~100x cost.  See ops/march_jnp.py.
    steps_aov: "bool | str" = False


def shade_hits(
    res,
    origins,
    dirs,
    eye,
    lights: LightRig,
    materials: MaterialTable,
    cfg: RenderConfig,
    shadow_factor=None,
    atlas=None,
    envmap=None,
):
    """Shade a MarchResult into RGB + AOVs. Differentiable w.r.t. lights,
    materials, atlas, and the miss environment map."""
    a = jnp.asarray(origins, dtype=jnp.float32)
    b = jnp.asarray(dirs, dtype=jnp.float32)
    t_hit = jnp.where(res.hit, res.t, jnp.float32(0.0))
    p = a + b * (t_hit - jnp.float32(EPS))[:, None]

    cmin = res.cell_bmin
    cmax = cmin + res.cell_size[:, None]
    n = cube_normal(p, cmin, cmax)

    ambient, diffuse, specular, shininess = materials.lookup(res.material)

    if atlas is not None:
        # Material-indexed tile texture: atlas f32[M, R, R, 3], nearest
        # sampled by face UV (TPU-native analog of the reference's 256-tile
        # PNG atlas, World.Fragment.glsl:5-15).
        uv = cube_uv(p, cmin, cmax)
        r = atlas.shape[1]
        ui = jnp.clip((uv[:, 0] * r).astype(jnp.int32), 0, r - 1)
        vi = jnp.clip((uv[:, 1] * r).astype(jnp.int32), 0, r - 1)
        mi = jnp.clip(res.material, 0, atlas.shape[0] - 1)
        # Per-channel 1D gathers: a 3D gather (atlas[mi,vi,ui]) lowers to
        # one DMA per texel on TPU (~2 us/elem); flat 1D gathers vectorize.
        lin = (mi * r + vi) * r + ui
        flat = atlas.reshape(-1, 3)
        tex = jnp.stack(
            [flat[:, 0][lin], flat[:, 1][lin], flat[:, 2][lin]], axis=-1
        )
        tex = jnp.power(jnp.maximum(tex, 1e-6), cfg.gamma)
        diffuse = diffuse * tex
        specular = specular * tex

    shadow = (
        jnp.zeros(p.shape[0], dtype=jnp.float32)
        if shadow_factor is None
        else shadow_factor
    )
    eye_v = jnp.asarray(eye, dtype=jnp.float32)
    rgb = lights.shade(n, p, eye_v, diffuse, specular, shininess, shadow)

    if envmap is not None:
        # Direction-sampled environment for misses (the reference's
        # infinite-depth cubemap skybox, src/Skybox.cpp:84-107).
        from .envmap import sample_env

        sky = sample_env(envmap, b)
    else:
        sky = jnp.asarray(cfg.sky, dtype=jnp.float32)
    hit3 = res.hit[:, None]
    rgb = jnp.where(hit3, rgb, sky)

    dist = jnp.linalg.norm(p - eye_v, axis=-1)
    depth = jnp.where(res.hit, inverse_depth(dist), jnp.float32(1.0))
    return {
        "rgb": rgb,
        "depth": depth,
        "hit": res.hit,
        "material": res.material,
        "steps": res.steps,
        "point": p,
        "normal": n,
    }


def ray_shadow(world: DeviceWorld, res, points, normals, lights: LightRig, cfg):
    """Hard shadow by marching from each hit toward the directional light.
    Miss pixels start their shadow ray dead (live_start=0) — their "start
    point" is garbage at t=0 and would otherwise march max_steps for free."""
    ldir = -lights.directional.direction
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-12)
    start = points + normals * jnp.float32(4 * EPS)
    sres = march_tiled(world, start, jnp.broadcast_to(ldir, start.shape),
                       cfg.max_steps, tile=cfg.tile if cfg.tile > 0 else 1 << 62,
                       live_start=res.hit.astype(jnp.int32))
    return (res.hit & sres.hit).astype(jnp.float32)


# Host-side ray-bundle cache for render_shadowmap: the center-relative
# bundle depends only on (light direction, resolution, world shape, margin)
# — NOT on the world's position — so per frame it is pure reuse.  Before
# this cache + the single-executable device path below, the shadow pass
# cost ~26 ms/frame of host glue (~15 eager dispatches through the axon
# tunnel + rebuilding a 512^2 numpy bundle every frame) for a march that
# itself costs ~1 ms (VERDICT r3 missing #4; breakdown in
# docs/PERF_NOTES.md round 4).  Bounded (ADVICE r4): an animated sun
# never re-hits a key, and each entry holds ~6 MB of device arrays at
# 512^2, so only the most recent few directions are kept.
_SHADOW_CACHE_MAX = 4
_shadow_bundle_cache: dict = {}


def shadow_bundle(ldir64, H, W, dims, cs, margin: float = 1.1):
    """Build the world-center-relative ortho light-ray bundle + projection
    (host numpy): the pure-geometry half of render_shadowmap, factored so
    diagnostics (tools/roofline_march.py's shadow lane accounting) march
    the EXACT bundle the shadow pass marches.  Returns (origins_rel
    f32[H*W,3], dirs f32[H*W,3], pv_rel f32[4,4], extent_half f32[3])."""
    ldir64 = np.asarray(ldir64, dtype=np.float64)
    ldir64 = ldir64 / np.linalg.norm(ldir64)
    w, h, d = dims
    extent = np.array([w, h, d], dtype=np.float64) * cs
    radius = float(np.linalg.norm(extent) * 0.5 * margin)

    # Ortho ray bundle along the light direction in the center-relative
    # frame: the emitter plane sits behind the world so every ray
    # crosses it.
    plane_rel = -ldir64 * (2.0 * radius)
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(ldir64, up)) > 0.99:
        up = np.array([0.0, 0.0, 1.0])
    view_rel = look_at(plane_rel, (0.0, 0.0, 0.0), up)
    proj = ortho(-radius, radius, -radius, radius, 0.0, 8 * radius)
    pv_rel = (proj.astype(np.float64) @ view_rel.astype(np.float64)).astype(
        np.float32
    )

    right = np.cross(ldir64, up)
    right /= np.linalg.norm(right)
    upv = np.cross(right, ldir64)
    xs = ((np.arange(W) + 0.5) / W - 0.5) * 2 * radius
    ys = (0.5 - (np.arange(H) + 0.5) / H) * 2 * radius
    xx, yy = np.meshgrid(xs, ys)
    origins_rel = (
        plane_rel[None, None]
        + xx[..., None] * right[None, None]
        + yy[..., None] * upv[None, None]
    ).reshape(-1, 3).astype(np.float32)
    dirs = np.broadcast_to(
        ldir64.astype(np.float32), origins_rel.shape
    ).copy()
    return origins_rel, dirs, pv_rel, (extent * 0.5).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("H", "W", "tile", "max_steps",
                                             "assume_resident"))
def _shadowmap_device(world, origins_rel, dirs, pv_rel, extent_half,
                      H, W, tile, max_steps, assume_resident=False):
    """The entire device side of the shadow pass as ONE executable: world-
    center translation, the light-bundle march (host-style unrolled tiles —
    each while loop stays top-level in this jit body), and the along-ray
    ndc-z depth resolve."""
    cs = jnp.float32(world.chunksize)
    lo = world.chunkcoordmin.astype(jnp.float32) * cs
    center = lo + extent_half
    origins = origins_rel + center[None, :]
    tmat = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(-center)
    vp = pv_rel @ tmat

    n = origins.shape[0]
    hits, ts = [], []
    for i in range(0, n, tile):
        res = march(world, origins[i:i + tile], dirs[i:i + tile], max_steps,
                    assume_resident=assume_resident)
        hits.append(res.hit)
        ts.append(res.t)
    hit = hits[0] if len(hits) == 1 else jnp.concatenate(hits)
    t = ts[0] if len(ts) == 1 else jnp.concatenate(ts)

    p = origins + dirs * jnp.where(hit, t, jnp.float32(FAR))[:, None]
    ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=-1)
    zndc = (ph @ vp.T)[:, 2]
    depth = jnp.where(hit, zndc, jnp.float32(1.0))
    return depth.reshape(H, W), vp


@jax.jit
def _shadow_origins(world, origins_rel, extent_half):
    """Absolute bundle origins: the center translation of
    _shadowmap_device, as its own tiny executable (the compact shadow
    path marches outside that fused body)."""
    cs = jnp.float32(world.chunksize)
    lo = world.chunkcoordmin.astype(jnp.float32) * cs
    center = lo + extent_half
    return origins_rel + center[None, :]


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _shadow_resolve(world, origins, dirs, hit, t, pv_rel, extent_half, H, W):
    """Along-ray ndc-z depth resolve for a marched bundle — the exact
    post-march math of _shadowmap_device."""
    cs = jnp.float32(world.chunksize)
    lo = world.chunkcoordmin.astype(jnp.float32) * cs
    center = lo + extent_half
    tmat = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(-center)
    vp = pv_rel @ tmat
    p = origins + dirs * jnp.where(hit, t, jnp.float32(FAR))[:, None]
    ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=-1)
    zndc = (ph @ vp.T)[:, 2]
    depth = jnp.where(hit, zndc, jnp.float32(1.0))
    return depth.reshape(H, W), vp


def render_shadowmap(
    world: DeviceWorld, lights: LightRig, resolution=(512, 512),
    margin: float = 1.1, tile: int = 65536, max_steps: int = 512,
    compact: bool = False, compact_tile: int = 8192,
    assume_resident: bool = False,
):
    """Depth-from-the-light pass (reference Main.cpp:190-198): ortho camera at
    the directional light over the world bounds, storing along-ray ortho
    depth (ndc z).  Returns (depth f32[H,W], light_vp f32[4,4]).

    ``max_steps`` defaults to 512 — deliberately aligned with the screen
    pass's RenderConfig.max_steps default rather than the march's own
    MAX_STEPS=640 (ADVICE r4): both passes of a frame share one step
    budget, and render()/render_frame() forward cfg.max_steps here so
    raising the screen budget raises the light pass's reach with it.

    ``compact=True`` marches the bundle with the stage-compacted schedule
    at ``compact_tile`` (shadow rays are short — 1.9M true steps vs 30M
    executed lanes uncompacted at 65536-ray tiles on the bench scene,
    utilization 0.064; compaction + a finer tile attacks exactly that,
    roofline_march.json shadow_pass) and returns (depth, vp,
    executed_lane_iters).  Same depth map (march bit-identical; resolve
    at fma-ulp).

    ``assume_resident`` forwards the static-world fast path to the bundle
    march (~20% fewer in-loop gathers, bit-identical until a mid-shift()
    chunk table; docs/PERF_NOTES.md r2) — render()/render_frame() pass
    cfg.assume_resident, so the frame's two marches share the flag.

    Everything that depends on ``world.chunkcoordmin`` (a device array on a
    resident world) is computed in jnp INSIDE _shadowmap_device: the ray
    bundle and view matrix are built in a world-CENTER-RELATIVE frame from
    static host scalars (cached across frames), then translated by the
    device-resident center.  A host ``np.asarray`` of any pool leaf here
    would be the process's first device readback and would permanently
    degrade dispatch through the axon tunnel (the readback curse,
    docs/PERF_NOTES.md) — this function used to do exactly that."""
    w, h, d = world.dims
    cs = world.chunksize
    H, W = resolution

    direction = lights.directional.direction
    device_dir = isinstance(direction, jax.Array)
    if device_dir:
        # np.asarray of a device array here would be THE process's first
        # device->host readback — through the axon tunnel that permanently
        # degrades dispatch ~50-1000x (docs/PERF_NOTES.md; this exact line
        # was the round-3 "shadow modes are 500x slow" root cause).  Light
        # rigs should carry host leaves (LightRig.default now does).
        import warnings

        warnings.warn(
            "render_shadowmap: device-resident light direction forces a "
            "host readback, which permanently degrades dispatch through "
            "the axon TPU tunnel; build rigs with host (numpy) leaves.",
            stacklevel=2,
        )

    ldir64 = np.asarray(direction, dtype=np.float64)
    ldir64 = ldir64 / np.linalg.norm(ldir64)
    key = (ldir64.tobytes(), H, W, (w, h, d), float(cs), float(margin))
    cached = None if device_dir else _shadow_bundle_cache.get(key)
    if cached is None:
        origins_rel, dirs, pv_rel, extent_half = shadow_bundle(
            ldir64, H, W, (w, h, d), cs, margin
        )
        cached = (
            jnp.asarray(origins_rel),
            jnp.asarray(dirs),
            jnp.asarray(pv_rel),
            jnp.asarray(extent_half),
        )
        if not device_dir:
            while len(_shadow_bundle_cache) >= _SHADOW_CACHE_MAX:
                # drop the oldest entry (insertion order = LRU here: a
                # frame loop re-creates, not re-touches, stale directions)
                _shadow_bundle_cache.pop(next(iter(_shadow_bundle_cache)))
            _shadow_bundle_cache[key] = cached

    origins_rel, dirs, pv_rel, extent_half = cached
    if compact:
        from ..ops.march_compact import march_frame_compact

        origins = _shadow_origins(world, origins_rel, extent_half)
        res, executed = march_frame_compact(
            world, origins, dirs, max_steps,
            tile=min(compact_tile, H * W),
            assume_resident=assume_resident,
        )
        depth, vp = _shadow_resolve(world, origins, dirs, res.hit, res.t,
                                    pv_rel, extent_half, H, W)
        return depth, vp, executed
    return _shadowmap_device(world, origins_rel, dirs, pv_rel, extent_half,
                             H, W, min(tile, H * W), max_steps,
                             assume_resident)


def map_shadow(points, shadow_depth, light_vp, bias_texels: float = 4.0):
    """Project hit points into the light and compare along-ray depths
    (reference computeShadow, World.Fragment.glsl:140-155).

    The compare happens in ortho ndc z (what render_shadowmap stores), NOT
    the reference's inverse-distance-to-light-position code: that code is
    monotonic along the light rays only while the rig's position/direction
    stay coupled (Main.cpp:168 re-derives direction from position every
    frame), and it compresses ~10 world units of occluder separation at
    light distance ~100 into ~1e-5 of code range, so no fixed bias works
    across a scene.  ``bias_texels`` is in units of the map's own texel
    footprint: one texel spans 2*radius/W world units laterally and
    (2*radius/W) * (2/(8*radius)) = 1/(2W) of ndc z along the ray —
    independent of the scene radius, so the default 2.0 covers ~45-degree
    slope acne at every resolution."""
    H, W = shadow_depth.shape
    vp = jnp.asarray(light_vp)
    ph = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1)
    clip = ph @ vp.T
    ndc = clip[:, :3] / jnp.maximum(jnp.abs(clip[:, 3:4]), 1e-12) * jnp.sign(
        clip[:, 3:4]
    )
    uv = ndc[:, :2] * 0.5 + 0.5
    xi = jnp.clip((uv[:, 0] * W).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(((1.0 - uv[:, 1]) * H).astype(jnp.int32), 0, H - 1)
    # flat 1D gather (2D gathers serialize on TPU; docs/PERF_NOTES.md)
    pixel_z = shadow_depth.reshape(-1)[yi * W + xi]

    bias = jnp.float32(bias_texels / (2.0 * W))
    inside = jnp.all((uv >= 0.0) & (uv <= 1.0), axis=-1)
    return (inside & (ndc[:, 2] > pixel_z + bias)).astype(jnp.float32)


def render(
    world: DeviceWorld,
    origins,
    dirs,
    eye,
    lights: LightRig | None = None,
    materials: MaterialTable | None = None,
    cfg: RenderConfig = RenderConfig(),
    atlas=None,
    shadowmap=None,
    envmap=None,
):
    """Full forward pass over a ray batch. Returns dict of AOVs (rgb, depth,
    hit, material, steps, point, normal)."""
    lights = LightRig.default() if lights is None else lights
    materials = MaterialTable.default() if materials is None else materials

    res = march_tiled(world, origins, dirs, cfg.max_steps,
                      tile=cfg.tile if cfg.tile > 0 else 1 << 62,
                      steps_aov=cfg.steps_aov,
                      assume_resident=cfg.assume_resident)

    shadow_factor = None
    if cfg.shadow == "ray":
        a = jnp.asarray(origins, dtype=jnp.float32)
        b = jnp.asarray(dirs, dtype=jnp.float32)
        t_hit = jnp.where(res.hit, res.t, jnp.float32(0.0))
        p = a + b * (t_hit - jnp.float32(EPS))[:, None]
        n = cube_normal(p, res.cell_bmin, res.cell_bmin + res.cell_size[:, None])
        shadow_factor = ray_shadow(world, res, p, n, lights, cfg)
    elif cfg.shadow == "map":
        if shadowmap is None:
            shadowmap = render_shadowmap(
                world, lights, max_steps=cfg.max_steps,
                assume_resident=cfg.assume_resident)
        depth_map, vp = shadowmap
        a = jnp.asarray(origins, dtype=jnp.float32)
        b = jnp.asarray(dirs, dtype=jnp.float32)
        t_hit = jnp.where(res.hit, res.t, jnp.float32(0.0))
        p = a + b * (t_hit - jnp.float32(EPS))[:, None]
        shadow_factor = map_shadow(
            p, depth_map, vp, cfg.shadow_bias
        ) * res.hit.astype(jnp.float32)

    return shade_hits(
        res, origins, dirs, eye, lights, materials, cfg, shadow_factor, atlas,
        envmap,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_tile(world, o, d, eye, lights, materials, cfg, atlas, shadowmap,
                 envmap):
    return render(world, o, d, eye, lights, materials, cfg, atlas, shadowmap,
                  envmap)


@jax.jit
def _compact_shadow_prep(res, origins, dirs, lights):
    """Hit points + outward offset + liveness for the compact shadow-ray
    march (the same formulas render()'s ray path uses)."""
    a = jnp.asarray(origins, dtype=jnp.float32)
    b = jnp.asarray(dirs, dtype=jnp.float32)
    t_hit = jnp.where(res.hit, res.t, jnp.float32(0.0))
    p = a + b * (t_hit - jnp.float32(EPS))[:, None]
    n = cube_normal(p, res.cell_bmin, res.cell_bmin + res.cell_size[:, None])
    ldir = -lights.directional.direction
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-12)
    start = p + n * jnp.float32(4 * EPS)
    return start, jnp.broadcast_to(ldir, start.shape), res.hit.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "shadow_kind"))
def _shade_frame(world, res, o, d, eye, lights, materials, cfg, atlas,
                 shadowmap, envmap, shadow_hit, shadow_kind):
    """Shade a full-frame MarchResult in ONE executable (the compact
    schedule's loop-free epilogue): shadow factor + shade_hits.
    ``shadow_kind``: "none" | "map" (project against the shadowmap here) |
    "ray" (``shadow_hit`` carries the shadow march's hit mask)."""
    shadow_factor = None
    if shadow_kind == "map":
        depth_map, vp = shadowmap
        a = jnp.asarray(o, dtype=jnp.float32)
        b = jnp.asarray(d, dtype=jnp.float32)
        t_hit = jnp.where(res.hit, res.t, jnp.float32(0.0))
        p = a + b * (t_hit - jnp.float32(EPS))[:, None]
        shadow_factor = map_shadow(
            p, depth_map, vp, cfg.shadow_bias
        ) * res.hit.astype(jnp.float32)
    elif shadow_kind == "ray":
        shadow_factor = (res.hit & shadow_hit).astype(jnp.float32)
    return shade_hits(res, o, d, eye, lights, materials, cfg, shadow_factor,
                      atlas, envmap)


@functools.partial(jax.jit, static_argnames=("cfg", "tile"))
def _render_frame_fused(world, o, d, eye, lights, materials, cfg, tile,
                        atlas, shadowmap, envmap):
    """The whole frame as ONE executable: an unrolled Python loop over
    ``tile``-ray slices (each tile's march while-loop stays top-level in
    this jit body, so pool gathers remain vectorized) plus one concat per
    AOV.  One launch per frame instead of ~2 per tile — on this
    environment that is the difference between ~24 ms and ~1 ms of
    per-frame dispatch cost (docs/PERF_NOTES.md r4), and on any directly-
    attached device it removes per-launch overhead and lets XLA schedule
    the tiles back to back."""
    n = o.shape[0]
    outs = [
        render(world, o[i:i + tile], d[i:i + tile], eye, lights, materials,
               cfg, atlas, shadowmap, envmap)
        for i in range(0, n, tile)
    ]
    keys = outs[0].keys()
    if len(outs) == 1:
        return outs[0]
    return {k: jnp.concatenate([t[k] for t in outs]) for k in keys}


def render_frame(
    world: DeviceWorld,
    origins,
    dirs,
    eye,
    lights: LightRig | None = None,
    materials: MaterialTable | None = None,
    cfg: RenderConfig = RenderConfig(),
    atlas=None,
    tile: int = 65536,
    envmap=None,
    fused: bool = False,
    compact: bool = False,
    compact_stride: int = 16,
    compact_schedule=None,
):
    """Full-frame render, host-tiled: per-tile executables dispatched
    asynchronously from the host over the ray batch (``fused=False``), or
    the whole frame as ONE executable with the same internally-unrolled
    tiling (``fused=True`` — one launch per frame; first call compiles a
    bigger program), or the stage-compacted march schedule
    (``compact=True`` — ~len(schedule)+3 launches per frame, ~3x fewer
    executed march lanes at 1080p; ops/march_compact.py).  The compact
    path returns the identical AOV dict (goldens assert it) plus a
    ``"lane_iters"`` device-scalar entry with its executed-lane cost; its
    ``steps`` AOV carries coarse (stage-quantized) counts.

    The compact path compacts EVERY march of the frame: with
    ``cfg.shadow == "map"`` the light-depth pass runs through
    ``render_shadowmap(compact=True)`` at its finer shipped tile (shadow
    rays are short — 0.064 lane utilization uncompacted at 65536-ray
    tiles, roofline_march.json shadow_pass), and with ``"ray"`` the
    per-hit shadow march is stage-compacted too; ``"lane_iters"`` is
    therefore the WHOLE frame's march cost (camera + shadow), matching
    roofline_march.json's frame_total_lane_iters accounting.

    This is the fast path for big frames.  `render()` under jit tiles with
    lax.map, but nesting the march while_loop inside a scan re-serializes
    every pool gather (~90x on 1080p; docs/PERF_NOTES.md "the single-carry
    cliff") — both paths here keep each tile's loop top-level.  Returns
    the same AOV dict as render(), on device.
    """
    lights = LightRig.default() if lights is None else lights
    materials = MaterialTable.default() if materials is None else materials
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    n = o.shape[0]
    eye = jnp.asarray(eye, dtype=jnp.float32)

    shadowmap = None
    shadow_lanes = None
    if cfg.shadow == "map":
        if compact:
            depth_map, light_vp, shadow_lanes = render_shadowmap(
                world, lights, max_steps=cfg.max_steps, compact=True,
                assume_resident=cfg.assume_resident,
            )
            shadowmap = (depth_map, light_vp)
        else:
            shadowmap = render_shadowmap(
                world, lights, max_steps=cfg.max_steps,
                assume_resident=cfg.assume_resident)

    if compact:
        from ..ops.march_compact import march_frame_compact

        res, lane_iters = march_frame_compact(
            world, o, d, cfg.max_steps, tile=tile, stride=compact_stride,
            assume_resident=cfg.assume_resident, schedule=compact_schedule,
        )
        shadow_hit = res.hit  # placeholder; only read by the "ray" branch
        if cfg.shadow == "ray":
            start, ldirs, live = _compact_shadow_prep(res, o, d, lights)
            sres, shadow_iters = march_frame_compact(
                world, start, ldirs, cfg.max_steps, tile=tile,
                stride=compact_stride,
                assume_resident=cfg.assume_resident, live_start=live,
                schedule=compact_schedule,
            )
            shadow_hit = sres.hit
            lane_iters = lane_iters + shadow_iters
        if shadow_lanes is not None:
            lane_iters = lane_iters + shadow_lanes
        out = _shade_frame(world, res, o, d, eye, lights, materials, cfg,
                           atlas, shadowmap, envmap, shadow_hit, cfg.shadow)
        out = {k: v for k, v in out.items()}
        out["lane_iters"] = lane_iters
        return out

    # Tiles march their whole batch in one while loop (tile=0) — the frame
    # is already split here, and an inner lax.map would hit the slow path.
    tile_cfg = dataclasses.replace(cfg, tile=0)

    pad = (-n) % tile
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e9, dtype=jnp.float32)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (pad, 3))]
        )
    if fused:
        out = _render_frame_fused(world, o, d, eye, lights, materials,
                                  tile_cfg, tile, atlas, shadowmap, envmap)
        return {k: v[:n] for k, v in out.items()}
    outs = []
    for i in range(0, o.shape[0], tile):
        outs.append(
            _render_tile(world, o[i:i + tile], d[i:i + tile], eye,
                         lights, materials, tile_cfg, atlas, shadowmap,
                         envmap)
        )
    keys = outs[0].keys()
    return {k: jnp.concatenate([t[k] for t in outs])[:n] for k in keys}


__all__ = [
    "RenderConfig",
    "render",
    "render_frame",
    "render_shadowmap",
    "shadow_bundle",
    "map_shadow",
    "ray_shadow",
    "shade_hits",
]
