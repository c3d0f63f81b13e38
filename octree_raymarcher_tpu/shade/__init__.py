from .atlas import (
    atlas_from_sheet,
    default_atlas,
    load_atlas_png,
    save_atlas_png,
    sheet_from_atlas,
)
from .camera import OrthoCamera, PerspectiveCamera
from .lights import DirectionalLight, LightRig, PointLight, Spotlight
from .materials import MaterialTable
from .render import RenderConfig, render, render_frame, render_shadowmap
