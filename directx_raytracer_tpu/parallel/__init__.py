from .sharding import make_mesh, render_whitted_multichip

__all__ = ["make_mesh", "render_whitted_multichip"]
