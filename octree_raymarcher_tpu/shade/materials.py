"""Material table: per-material-id ambient/diffuse/specular/shininess.

Capability parity: the reference's hardcoded 8-entry GLSL material table
(shaders/World.Fragment.glsl:63-73 — void/stone/dirt/sand/grass/shroom/
water/void).  Here it is a jnp array pytree so shading can differentiate
with respect to material parameters, and worlds may carry custom tables.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Distinct base colors per material so unlit/albedo renders are informative
# (the reference gets color variety from a PNG texture atlas instead).
_DEFAULT_TABLE = [
    # name      ambient        diffuse                  specular          shininess
    ("void",   (0, 0, 0),     (0.0, 0.0, 0.0),         (0.0, 0.0, 0.0),  1.0),
    ("stone",  (0.8,) * 3,    (0.55, 0.55, 0.58),      (0.5,) * 3,       8.0),
    ("dirt",   (0.8,) * 3,    (0.45, 0.32, 0.18),      (0.1,) * 3,       16.0),
    ("sand",   (0.8,) * 3,    (0.86, 0.78, 0.55),      (0.15,) * 3,      32.0),
    ("grass",  (0.8,) * 3,    (0.25, 0.60, 0.20),      (0.7,) * 3,       1000.0),
    ("shroom", (0.8,) * 3,    (0.62, 0.30, 0.45),      (0.0,) * 3,       1.0),
    ("water",  (0.8,) * 3,    (0.15, 0.35, 0.70),      (1.0,) * 3,       100.0),
    ("void2",  (0, 0, 0),     (0.0, 0.0, 0.0),         (0.0, 0.0, 0.0),  1.0),
]

MATERIAL_NAMES = [row[0] for row in _DEFAULT_TABLE]
NUM_MATERIALS = len(_DEFAULT_TABLE)


@struct.dataclass
class MaterialTable:
    ambient: Any      # f32[M, 3]
    diffuse: Any      # f32[M, 3]
    specular: Any     # f32[M, 3]
    shininess: Any    # f32[M]

    @staticmethod
    def default() -> "MaterialTable":
        return MaterialTable(
            ambient=jnp.asarray(np.array([r[1] for r in _DEFAULT_TABLE], np.float32)),
            diffuse=jnp.asarray(np.array([r[2] for r in _DEFAULT_TABLE], np.float32)),
            specular=jnp.asarray(np.array([r[3] for r in _DEFAULT_TABLE], np.float32)),
            shininess=jnp.asarray(np.array([r[4] for r in _DEFAULT_TABLE], np.float32)),
        )

    def lookup(self, material_id):
        """Per-ray material params via one-hot matmul; id 0 (and misses)
        give black.

        One-hot @ table instead of `table[m]`: XLA:TPU lowers 2D row
        gathers to one DMA per index (~2 us/element measured — 283 ms for
        a 32k-ray tile), while a [N,M]x[M,3] matmul is microseconds on the
        MXU and exact (each row sums one x*1.0 term).  Differentiable
        w.r.t. the tables either way.  docs/PERF_NOTES.md.

        Precision HIGHEST: the default TPU matmul precision is bf16, which
        would quantize the table values (~0.4% rel error) and silently
        diverge from the CPU oracle; at M=8 full precision is free."""
        m = jnp.clip(material_id, 0, self.ambient.shape[0] - 1)
        oh = (m[:, None] == jnp.arange(self.ambient.shape[0])).astype(jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        return (
            jnp.matmul(oh, self.ambient, precision=hi),
            jnp.matmul(oh, self.diffuse, precision=hi),
            jnp.matmul(oh, self.specular, precision=hi),
            jnp.matmul(oh, self.shininess, precision=hi),
        )


__all__ = ["MaterialTable", "MATERIAL_NAMES", "NUM_MATERIALS"]
