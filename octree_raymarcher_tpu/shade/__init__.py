from .camera import OrthoCamera, PerspectiveCamera
from .lights import DirectionalLight, LightRig, PointLight, Spotlight
from .materials import MaterialTable
from .render import RenderConfig, render, render_shadowmap
