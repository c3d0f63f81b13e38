"""Light models and Blinn-Phong shading, differentiable and batched.

Capability parity: reference src/Light.{h,cpp} (PointLight / DirectionalLight
/ Spotlight parameter structs) and shaders/World.Fragment.glsl:75-138 (the
three Blinn-Phong accumulators with distance attenuation and the spotlight
cone falloff).  All functions map over ray batches; lights are pytrees so a
scene's lighting is jit-traceable and optimizable.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct


def _norm(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), 1e-12)


def _np(v):
    """Default light parameters are HOST (numpy) arrays: the shadow pass
    reads the rig's direction on the host to build its ray grid, and
    through the axon tunnel the first device->host readback permanently
    degrades the process's dispatch (docs/PERF_NOTES.md).  Tiny host
    leaves cost nothing as jit arguments; pass device arrays only for
    rigs you are differentiating."""
    return np.asarray(v, dtype=np.float32)


def _np_norm(v):
    a = np.asarray(v, dtype=np.float64)
    return (a / max(float(np.linalg.norm(a)), 1e-12)).astype(np.float32)


@struct.dataclass
class PointLight:
    position: Any
    ambient: Any
    diffuse: Any
    specular: Any
    constant: Any = 1.0
    linear: Any = 0.14
    quadratic: Any = 0.09

    @staticmethod
    def default() -> "PointLight":
        return PointLight(
            position=_np([50.0, 8.0, 65.0]),
            ambient=_np([0.1, 0.1, 0.1]),
            diffuse=_np([0.5, 0.5, 0.5]),
            specular=_np([1.0, 1.0, 1.0]),
        )


@struct.dataclass
class DirectionalLight:
    position: Any    # used only by the shadow pass / depth encoding
    direction: Any
    ambient: Any
    diffuse: Any
    specular: Any

    @staticmethod
    def default() -> "DirectionalLight":
        return DirectionalLight(
            position=_np([250.0, 125.0, 250.0]),
            direction=_np_norm([1.0, -1.0, 0.0]),
            ambient=_np([0.2, 0.3, 0.4]),
            diffuse=_np([0.3, 0.3, 0.6]),
            specular=_np([0.0, 0.0, 0.0]),
        )


@struct.dataclass
class Spotlight:
    position: Any
    direction: Any
    ambient: Any
    diffuse: Any
    specular: Any
    cos_phi: Any      # inner cone cosine
    cos_gamma: Any    # outer cone cosine
    constant: Any = 1.0
    linear: Any = 0.045
    quadratic: Any = 0.0075

    @staticmethod
    def default() -> "Spotlight":
        return Spotlight(
            position=_np([50.0, 20.0, 70.0]),
            direction=_np_norm([-0.1, -1.0, -0.1]),
            ambient=_np([0.2, 0.8, 0.3]),
            diffuse=_np([0.2, 0.8, 0.3]),
            specular=_np([1.0, 1.0, 1.0]),
            cos_phi=np.float32(np.cos(np.deg2rad(25.0))),
            cos_gamma=np.float32(np.cos(np.deg2rad(35.0))),
        )


def _attenuation(kc, kl, kq, dist):
    return 1.0 / (kc + kl * dist + kq * dist * dist)


def _blinn_terms(n, l, v, shininess):
    h = _norm(l + v)
    d = jnp.maximum(jnp.sum(n * l, axis=-1), 0.0)
    s = jnp.power(jnp.maximum(jnp.sum(v * h, axis=-1), 1e-6), shininess)
    return d, s


def shade_point_light(light: PointLight, n, p, eye, diffuse, specular, shininess, shadow):
    l = _norm(light.position - p)
    v = _norm(eye - p)
    d, s = _blinn_terms(n, l, v, shininess)
    dist = jnp.linalg.norm(p - light.position, axis=-1)
    att = _attenuation(light.constant, light.linear, light.quadratic, dist)
    lit = 1.0 - shadow
    amb = light.ambient * diffuse
    diff = light.diffuse * d[..., None] * diffuse * lit[..., None]
    spec = light.specular * s[..., None] * specular * lit[..., None]
    return (amb + diff + spec) * att[..., None]


def shade_directional_light(
    light: DirectionalLight, n, p, eye, diffuse, specular, shininess, shadow
):
    l = _norm(-light.direction)
    v = _norm(eye - p)
    d, s = _blinn_terms(n, l, v, shininess)
    lit = 1.0 - shadow
    amb = light.ambient * diffuse
    diff = light.diffuse * d[..., None] * diffuse * lit[..., None]
    spec = light.specular * s[..., None] * specular * lit[..., None]
    return amb + diff + spec


def shade_spotlight(light: Spotlight, n, p, eye, diffuse, specular, shininess, shadow):
    l = _norm(light.position - p)
    v = _norm(eye - p)
    d, s = _blinn_terms(n, l, v, shininess)
    dist = jnp.linalg.norm(p - light.position, axis=-1)
    att = _attenuation(light.constant, light.linear, light.quadratic, dist)
    theta = jnp.sum(l * _norm(-light.direction), axis=-1)
    intensity = jnp.clip(
        (theta - light.cos_gamma) / jnp.maximum(light.cos_phi - light.cos_gamma, 1e-6),
        0.0,
        1.0,
    )
    lit = 1.0 - shadow
    amb = light.ambient * diffuse
    diff = light.diffuse * d[..., None] * diffuse * lit[..., None]
    spec = light.specular * s[..., None] * specular * lit[..., None]
    return (amb + (diff + spec) * intensity[..., None]) * att[..., None]


@struct.dataclass
class LightRig:
    """The reference scene's standard three-light setup (Main.cpp:101-131)."""

    point: PointLight
    directional: DirectionalLight
    spot: Spotlight

    @staticmethod
    def default() -> "LightRig":
        return LightRig(
            point=PointLight.default(),
            directional=DirectionalLight.default(),
            spot=Spotlight.default(),
        )

    def shade(self, n, p, eye, diffuse, specular, shininess, shadow):
        c = shade_point_light(self.point, n, p, eye, diffuse, specular, shininess, shadow)
        c += shade_directional_light(
            self.directional, n, p, eye, diffuse, specular, shininess, shadow
        )
        c += shade_spotlight(self.spot, n, p, eye, diffuse, specular, shininess, shadow)
        return c


__all__ = [
    "PointLight",
    "DirectionalLight",
    "Spotlight",
    "LightRig",
    "shade_point_light",
    "shade_directional_light",
    "shade_spotlight",
]
