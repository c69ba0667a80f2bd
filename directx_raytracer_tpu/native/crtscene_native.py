"""ctypes bindings for the native .crtscene parser (see parser.cpp).

Returns ``None`` from ``load`` when the shared library is unavailable so the
caller can fall back to the pure-Python parser.
"""

from __future__ import annotations


def load(path: str):
    from . import build

    lib = build.get_library()
    if lib is None:
        return None
    return build.parse_scene(lib, path)
