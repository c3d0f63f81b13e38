from .march_jnp import MarchResult, march
