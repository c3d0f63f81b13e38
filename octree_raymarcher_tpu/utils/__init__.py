from .metrics import Counter, MetricsLogger, rays_per_second
from . import native
