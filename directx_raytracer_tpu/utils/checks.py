"""Debug-build instrumentation (the D3D12 debug-layer analog).

The reference enables the D3D12 debug layer in ``_DEBUG`` builds
(DXRTRenderer.cpp:24-32) to catch API hazards at runtime.  The JAX analog
is ``jax.experimental.checkify``: setting ``DXRT_CHECK=1`` arms explicit
``checkify.check`` guards inside the render passes (non-finite framebuffer
contributions = the NaN class of bug; out-of-range pixel scatter ids = the
OOB class) and the ``*_checked`` entry points functionalize + raise them.

The guards are EXPLICIT rather than ``checkify.float_checks`` automatic
instrumentation: masked wavefront lanes legitimately carry inf/NaN (parked
rays at 1e30, miss distances at inf), so auto-NaN-checking every
intermediate would fire on healthy frames.  The checks sit exactly where
garbage would become user-visible — the values added to the framebuffer.
"""

from __future__ import annotations

import os


def enabled() -> bool:
    """True when the DXRT_CHECK debug build is armed (env, read per call so
    tests can toggle it)."""
    return os.environ.get("DXRT_CHECK", "") not in ("", "0")


def check(pred, msg: str) -> None:
    """``checkify.check`` that compiles to nothing unless DXRT_CHECK=1.

    Callers must run under ``checkify.checkify`` when enabled (the
    ``*_checked`` render entry points do this); with the flag off this is a
    no-op and the regular jitted paths stay check-free.
    """
    if enabled():
        from jax.experimental import checkify

        checkify.check(pred, msg)
