"""Debug-mode frame renderer — the TPU analog of the reference's DXR
dispatch path (``renderFrame``, DXRTRenderer.cpp:1370-1408): one primary ray
per pixel, closest hit, 7-mode procedural shade, miss = constant cyan.

Instead of a swapchain/UAV pipeline the whole frame is one jitted pure
function of (scene buffers, camera snapshot, mode) returning an (H, W, 3)
f32 image; resolution is static (compiled per size), the shading mode is a
traced int so switching modes never recompiles (the reference's equivalent
knob is a constant-buffer write, DXRTRenderer.cpp:272-300).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.scene import DeviceScene
from ..ops.debug_shading import MISS_COLOR, shade_debug
from ..ops.intersect import intersect_bruteforce, refine_hit
from ..ops.rays import generate_rays, tile_perm


@partial(jax.jit, static_argnames=("width", "height", "intersect_fn"))
def render_debug(
    dscene: DeviceScene,
    cam_position,
    cam_rotation,
    mode,
    width: int,
    height: int,
    intersect_fn=None,
):
    """Render one debug-shaded frame.

    Args:
      dscene: device scene pytree.
      cam_position, cam_rotation: camera snapshot ((3,), (3,3)).
      mode: i32 scalar 0..6 (traced — no recompile on change).
      intersect_fn: optional override (e.g. a BVH-backed intersector) with the
        signature (origins, dirs, geometry) -> Hit; defaults to brute force.

    Returns:
      (H, W, 3) f32 image in [0, 1].
    """
    geo = dscene.geometry
    origins, dirs = generate_rays(cam_position, cam_rotation, width, height)
    perm = tile_perm(height, width)
    if perm is not None:  # coherent tiles for the binned intersector
        origins = origins[perm]
        dirs = dirs[perm]
    if intersect_fn is None:
        hit = intersect_bruteforce(origins, dirs, geo.woop)
    else:
        hit = intersect_fn(origins, dirs, geo)
    hit = refine_hit(origins, dirs, geo.v0, geo.e1, geo.e2, hit)

    tri = jnp.maximum(hit.tri, 0)
    local_id = geo.local_id[tri]
    mesh_id = geo.mesh_id[tri]
    color = shade_debug(mode, origins, dirs, hit.t, hit.u, hit.v, local_id, mesh_id)
    miss = jnp.array(MISS_COLOR, jnp.float32)
    color = jnp.where(hit.mask[:, None], color, miss)
    if perm is not None:
        color = jnp.zeros_like(color).at[perm].set(color)
    return color.reshape(height, width, 3)
