from .multihost import global_mesh_shape, init_distributed, make_global_mesh
from .sharding import (
    make_mesh,
    pathtrace_multichip,
    render_whitted_multichip,
    untile_multichip,
)

__all__ = [
    "make_mesh",
    "render_whitted_multichip",
    "pathtrace_multichip",
    "untile_multichip",
    "init_distributed",
    "global_mesh_shape",
    "make_global_mesh",
]
