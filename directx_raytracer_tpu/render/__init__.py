from .debug import render_debug
from .whitted import render_whitted, render_whitted_checked

__all__ = ["render_debug", "render_whitted", "render_whitted_checked"]
