"""Engine configuration: one dataclass tree consumed as jit-static values.

The reference's configuration surface is compile-time constants scattered
across translation units (world dims at the callsite src/Main.cpp:80,
TREE_MAX_DEPTH/PYRAMID_RESOLUTION src/World.cpp:11-12, march caps and EPS
shaders/Chunkmarch.glsl:2-21, NEAR/FAR src/Main.cpp:32-33).  Here the same
knobs are a frozen dataclass: hashable, so jitted functions specialize on it
as a static argument, and serializable for reproducibility.
"""

from __future__ import annotations

import dataclasses
import json

from .core import constants


@dataclasses.dataclass(frozen=True)
class WorldConfig:
    dims: tuple = (4, 4, 4)
    chunksize: float = 128.0
    depth: int = 8
    seed: int = 0
    water_level: float = 6.0
    amplitude: float = 64.0
    pyramid_resolution: int = 256


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    max_steps: int = constants.MAX_STEPS
    unroll: int = 4
    tile: int = 32768
    eps: float = constants.EPS
    bigeps: float = constants.BIGEPS


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    width: int = 1920
    height: int = 1080
    fov_deg: float = 80.0
    near: float = constants.NEAR
    far: float = constants.FAR


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes for the sharded renderer/trainer (SURVEY.md 2.8):
    rays is the DP axis; 1 chip falls back to single-device paths."""
    rays: int = 1


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    world: WorldConfig = WorldConfig()
    march: MarchConfig = MarchConfig()
    camera: CameraConfig = CameraConfig()
    mesh: MeshConfig = MeshConfig()

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "EngineConfig":
        d = json.loads(text)
        return EngineConfig(
            world=WorldConfig(**{**d.get("world", {}),
                                 "dims": tuple(d.get("world", {}).get("dims", (4, 4, 4)))}),
            march=MarchConfig(**d.get("march", {})),
            camera=CameraConfig(**d.get("camera", {})),
            mesh=MeshConfig(**d.get("mesh", {})),
        )


__all__ = ["EngineConfig", "WorldConfig", "MarchConfig", "CameraConfig", "MeshConfig"]
