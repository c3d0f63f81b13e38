"""Runtime NaN/OOB guards for the march and composite kernels (debug mode).

SURVEY §5: the reference's closest analogs are its dense assert()s and the
abort-on-GL-error callback (src/Main.cpp:486-500); jit purity makes data
races structurally absent here, and these checkify guards cover the
remaining class — poisoned inputs (NaN/zero-length rays), corrupt pools
(out-of-range offsets), and non-finite outputs — at dispatch-visible cost,
so they live behind an explicit debug entry point / RenderConfig flag
rather than on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from .march_jnp import march_tiled


def _ray_checks(origins, dirs):
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    checkify.check(jnp.all(jnp.isfinite(o)), "march: non-finite ray origin")
    checkify.check(jnp.all(jnp.isfinite(d)), "march: non-finite ray direction")
    nrm = jnp.linalg.norm(d, axis=-1)
    checkify.check(
        jnp.all(nrm > 1e-12), "march: zero-length ray direction"
    )


def march_checked(world, origins, dirs, **kwargs):
    """march_tiled with input/output validation; raises
    jax.experimental.checkify.JaxRuntimeError on the first violated check.

    Checks: finite origins/dirs, non-degenerate directions, hit t finite and
    non-negative, hit materials non-zero, texel indices within the twig
    pool."""
    twig_cap = int(jnp.asarray(world.twig).shape[0])

    def f(world_, o, d):
        _ray_checks(o, d)
        r = march_tiled(world_, o, d, **kwargs)
        t_hit = jnp.where(r.hit, r.t, 0.0)
        checkify.check(
            jnp.all(jnp.isfinite(t_hit) & (t_hit >= 0)),
            "march: non-finite or negative hit distance",
        )
        checkify.check(
            jnp.all(jnp.where(r.hit, r.material, 1) != 0),
            "march: hit reported material 0 (void)",
        )
        checkify.check(
            jnp.all((r.texel >= -1) & (r.texel < twig_cap)),
            "march: texel index outside the twig pool",
        )
        return r

    err, res = checkify.checkify(f)(world, origins, dirs)
    err.throw()
    return res


def composite_checked(segments, params, **kwargs):
    """diff.composite with validation: segment slots within the parameter
    table, ordered non-negative extents, finite outputs."""
    from ..diff.composite import composite

    P = int(jnp.asarray(params.density_raw).shape[0])

    def f(segs, p):
        checkify.check(
            jnp.all(segs.slot < P), "composite: segment slot out of range"
        )
        valid = segs.slot >= 0
        checkify.check(
            jnp.all(jnp.where(valid, segs.t1 - segs.t0, 0.0) >= 0),
            "composite: segment with t1 < t0",
        )
        checkify.check(
            jnp.all(jnp.where(valid, segs.t0, 0.0) >= 0),
            "composite: negative segment start",
        )
        out = composite(segs, p, **kwargs)
        checkify.check(
            jnp.all(jnp.isfinite(out["rgb"])), "composite: non-finite rgb"
        )
        checkify.check(
            jnp.all(jnp.isfinite(out["depth"])), "composite: non-finite depth"
        )
        return out

    err, res = checkify.checkify(f)(segments, params)
    err.throw()
    return res


__all__ = ["march_checked", "composite_checked"]
