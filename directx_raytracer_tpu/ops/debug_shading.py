"""The reference's 7 procedural debug shading modes, vectorized.

Formula-equivalent port of the ``closestHit`` shader's mode switch
(HLSL/ray_tracing_shaders.hlsl:78-169) and the ``miss`` shader's constant
cyan (hlsl:72-76).  The DXR intrinsics map to hit-record fields:

* ``PrimitiveIndex()``  -> geometry.local_id[tri]  (triangle index in mesh)
* ``InstanceID()``      -> geometry.mesh_id[tri]   (instance ID = mesh index,
                           DXRTRenderer.cpp:700)
* ``WorldRayOrigin() + WorldRayDirection() * RayTCurrent()`` -> o + d*t
* ``attr.barycentrics`` -> (u, v)

Mode names follow the UI combo box (DXRTMainWindow.cpp:98-121).

Precision note: the hash family ``frac(sin(k * id) * 43758.5453)`` is
evaluated in f32 with arguments up to ~1e10 (mode 1 hashes a uint32 into
``sin``).  GPU HLSL ``sin`` and TPU/XLA ``sin`` disagree in ULPs at such
magnitudes, so hash-colored pixels are deterministic per backend but not
bit-equal across backends; the geometric modes (3 barycentric, 4 height,
5 distance, 6 world checker) are directly comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MISS_COLOR = (0.0, 1.0, 1.0)  # hlsl:75 — ignores the scene's background_color

MODE_NAMES = (
    "Triangle Random Colors",
    "Object Spatial Shading",
    "Object Triangle Shades",
    "Barycentric Heatmap",
    "World-Space Height Gradient",
    "Distance to Camera Debug",
    "Checker Pattern",
)
NUM_MODES = len(MODE_NAMES)


def _frac(x):
    return x - jnp.floor(x)


def _hash_sin(k, mul):
    return _frac(jnp.sin(k * jnp.float32(mul)) * jnp.float32(43758.5453))


def _object_base_color(obj_id_f):
    """hlsl:97-101 / 115-120 — hashed per-object base color."""
    r = _frac(jnp.sin(obj_id_f * 12.9898) * 43758.5453)
    g = _frac(jnp.sin(obj_id_f * 78.233) * 12345.6789)
    b = _frac(jnp.sin(obj_id_f * 39.425) * 34567.8901)
    return jnp.stack([r, g, b], axis=-1)


def shade_debug(mode, origins, dirs, t, u, v, local_id, mesh_id):
    """Per-ray debug color for hits; caller overlays the miss color.

    Args:
      mode: traced i32 scalar — shading mode 0..6 (values > 6 behave like 6,
        matching the shader's trailing ``else``).
      origins, dirs: (N, 3); t, u, v: (N,); local_id, mesh_id: (N,) i32.
    Returns (N, 3) f32 colors.
    """
    tri_f = local_id.astype(jnp.float32)
    obj_f = mesh_id.astype(jnp.float32)
    world = origins + dirs * t[:, None]

    def mode0(_):
        r = _hash_sin(tri_f, 12.9898)
        g = _hash_sin(tri_f, 78.233)
        b = _hash_sin(tri_f, 45.164)
        return jnp.stack([r, g, b], axis=-1)

    def mode1(_):
        base = _object_base_color(obj_f)
        cell = jnp.floor(world / 2.0).astype(jnp.int32)
        hx = (cell[:, 0] * jnp.int32(73856093)).astype(jnp.uint32)
        hy = (cell[:, 1] * jnp.int32(19349663)).astype(jnp.uint32)
        hz = (cell[:, 2] * jnp.int32(83492791)).astype(jnp.uint32)
        h = (hx ^ hy ^ hz).astype(jnp.float32)
        variation = _hash_sin(h, 12.9898)[:, None]
        return base * 0.7 * (1.0 - variation) + base * 1.3 * variation

    def mode2(_):
        base = _object_base_color(obj_f)
        shade = _hash_sin(tri_f, 12.9898)[:, None]
        return base * (0.6 * (1.0 - shade) + 1.0 * shade)

    def mode3(_):
        return jnp.stack([1.0 - u - v, u, v], axis=-1)

    def mode4(_):
        h = jnp.clip((world[:, 1] + 10.0) / 20.0, 0.0, 1.0)[:, None]
        lo = jnp.array([0.1, 0.2, 0.6], jnp.float32)
        hi = jnp.array([0.9, 0.9, 0.9], jnp.float32)
        return lo * (1.0 - h) + hi * h

    def mode5(_):
        c = jnp.clip(t * 0.05, 0.0, 1.0)
        return jnp.stack([c, c, c], axis=-1)

    def mode6(_):
        checker = (jnp.floor(world[:, 0]).astype(jnp.int32)
                   ^ jnp.floor(world[:, 2]).astype(jnp.int32)) & 1
        c = jnp.where(checker != 0, jnp.float32(0.9), jnp.float32(0.2))
        return jnp.stack([c, c, c], axis=-1)

    mode = jnp.clip(mode, 0, NUM_MODES - 1)
    return jax.lax.switch(mode, [mode0, mode1, mode2, mode3, mode4, mode5, mode6], None)
