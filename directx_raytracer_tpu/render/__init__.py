from .debug import render_debug
from .whitted import render_whitted

__all__ = ["render_debug", "render_whitted"]
