"""Camera ray generation — batched counterpart of the DXR raygen shader.

Reproduces HLSL/ray_tracing_shaders.hlsl:21-70 exactly, but vectorized over
the whole pixel grid instead of one GPU thread per pixel:

* pixel center offset +0.5, normalize by width/height,
* NDC mapping x -> 2x-1, y -> 1-2y (y flip),
* aspect scaling of x by width/height,
* camera-space direction normalize((x, y, -1)),
* world direction = normalize(R @ dir) with the camera rotation applied as a
  column-vector product (``mul(cameraRotation, v)`` on a row_major-uploaded
  matrix, hlsl:47 + DXRTRenderer.cpp:258-265),
* TMin = 0.001, TMax = 10000 (hlsl:51-52).

Unlike the reference, width/height are parameters (the reference hard-codes
1920x1080 in the shader, hlsl:24-25).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

T_MIN = 0.001
T_MAX = 10000.0


def pick_schedule(rows: int, width: int):
    """(pixel tile, kernel ray-chunk tile_r) for PRIMARY passes.

    r5 sweep (tools/r5_ab.py, TPU v5e): SQUARE-ISH pixel tiles with 2-3x
    larger kernel chunks win ~15-21% over the legacy 8x32/256 at both
    scales (fewer fixed-cost grid steps AND tighter hulls -> fewer
    scheduled pairs/ray); wide tiles (8x64, 4x128) LOSE outright — aspect
    ratio is the variable that matters, not chunk size (tile_r=1024 buys
    nothing over 512 at equal aspect).  1080p measured with the production
    bary6r scheme: 24x32/768 165.8 Mrays/s at 100k tris and 56.2 at 1M
    (vs 121.0 / 41.9 for the 8x32/256 control on bary6); the r3/r4 sweeps
    stopped at tile_r in {128, 256} and did not extrapolate.  Preference:
    24x32, 20x32, 16x32, 12x32; odd sizes fall back to ``pick_tile``'s
    divisibility search with 256-ray chunks.

    Sorted secondary wavefronts (bounce/shadow batches) are NOT screen
    tiles — callers keep the default 256-ray chunking there.
    """
    for th, tw in ((24, 32), (20, 32), (16, 32), (12, 32)):
        if rows % th == 0 and width % tw == 0:
            return (th, tw), th * tw
    return pick_tile(rows, width), 256


def pick_tile(rows: int, width: int, tile_h: int = 8, tile_w: int = 32):
    """Largest (th, tw) <= (tile_h, tile_w) dividing the image, or None.

    8x32 pixel tiles (256 rays, = pallas_intersect.TILE_R): measured ~1.5x
    fewer ray-triangle pairs than 24x32 at 1080p/100k (tighter frusta cut
    silhouette overlap), ~1.7x fewer at 1M tris; 8 and 32 divide common
    resolutions (1080 is not divisible by 16)."""

    def pick(total, want):
        for c in (want, 32, 24, 16, 12, 8, 6, 4, 3, 2):
            if c <= want and total % c == 0:
                return c
        return 1

    th = pick(rows, tile_h)
    tw = pick(width, tile_w)
    if th * tw < 16:  # degenerate tiling buys nothing
        return None
    return th, tw


def generate_rays_tiled(position, rotation, width: int, height: int,
                        tile_h: int, tile_w: int, offset=(0.5, 0.5),
                        row_start=0, rows: int | None = None):
    """Primary rays in TILE-MAJOR order, computed arithmetically.

    Equivalent to ``generate_rays(...)[tile_perm(...)]`` but with zero
    gathers — a (2M, 3) permutation gather costs ~35 ms on TPU, more than
    the BVH intersection it feeds.  Pixel (px, py) lands at flat index
    ((ty*tiles_x + tx) * tile_h + ry) * tile_w + rx.
    """
    position = jnp.asarray(position, jnp.float32)
    rotation = jnp.asarray(rotation, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    rows = height if rows is None else rows
    ty_n, tx_n = rows // tile_h, width // tile_w
    n = ty_n * tx_n * tile_h * tile_w

    # FLAT (N,) arithmetic throughout: 4D (ty, tx, th, tw) broadcasts keep
    # the minor dim at tile_w (< 128 lanes) and measured ~6 ms of layout
    # waste at 2M rays; decomposing the tile-major flat index with integer
    # div/mod runs every op at full lane width (~1 ms).
    i = jnp.arange(n, dtype=jnp.int32)
    rx = i % tile_w
    t1 = i // tile_w
    ry = t1 % tile_h
    t2 = t1 // tile_h
    tx = t2 % tx_n
    ty = t2 // tx_n
    px = (tx * tile_w + rx).astype(jnp.float32)
    py = (ty * tile_h + ry).astype(jnp.float32) + row_start

    x = (2.0 * ((px + offset[0]) / width) - 1.0) * (width / height)
    y = 1.0 - 2.0 * ((py + offset[1]) / height)
    # Rotation as unrolled component math: a (2M, 3) @ (3, 3) einsum pads
    # the 3-wide operand onto 128 MXU lanes and measures ~8 ms/frame; nine
    # scalar-broadcast FMAs on the VPU are exact f32 and ~free.
    inv_len = jax.lax.rsqrt(x * x + y * y + 1.0)
    dx, dy, dz = x * inv_len, y * inv_len, -inv_len
    wx = rotation[0, 0] * dx + rotation[0, 1] * dy + rotation[0, 2] * dz
    wy = rotation[1, 0] * dx + rotation[1, 1] * dy + rotation[1, 2] * dz
    wz = rotation[2, 0] * dx + rotation[2, 1] * dy + rotation[2, 2] * dz
    wlen = jax.lax.rsqrt(wx * wx + wy * wy + wz * wz)
    dir_world = jnp.stack([wx * wlen, wy * wlen, wz * wlen], axis=-1)
    origins = jnp.broadcast_to(position, (n, 3))
    return origins, dir_world


def tile_frustum_bounds(position, rotation, width: int, height: int,
                        tile_h: int, tile_w: int, row_start=0,
                        rows: int | None = None):
    """Analytic per-tile ray bounds for primary pinhole tiles.

    The binned intersector needs per-tile origin/direction intervals; for
    arbitrary rays that is a (T, R, 3) min/max reduce costing ~34 ms/frame
    at 2M rays.  For pinhole primaries the UNNORMALIZED camera-space
    direction (x, y, -1) is linear in the pixel coordinate, so its world
    components are extremal at the tile's four corners — a (T, 4, 3)
    computation.  Returns a dict for bin_clusters' ``bounds`` argument:

      o_lo == o_hi = camera position (replicated),
      d_lo/d_hi    = componentwise hull of the corner directions
                     (UNNORMALIZED — slab tests are scale-invariant),
      len_hi       = max |d| over the tile, to conservatively lower-bound
                     normalized-parameter entry distances.

    Corners span the full pixel footprint [0, tile] (not pixel centers), so
    the bounds also cover every subpixel AA/jitter offset.
    """
    position = jnp.asarray(position, jnp.float32)
    rotation = jnp.asarray(rotation, jnp.float32)
    rows = height if rows is None else rows
    ty_n, tx_n = rows // tile_h, width // tile_w
    n_tiles = ty_n * tx_n

    ty = jnp.arange(ty_n, dtype=jnp.float32).reshape(ty_n, 1, 1)
    tx = jnp.arange(tx_n, dtype=jnp.float32).reshape(1, tx_n, 1)
    cy = jnp.asarray([0.0, float(tile_h)]).reshape(1, 1, 2)
    cx = jnp.asarray([0.0, float(tile_w)]).reshape(1, 1, 2)
    py = ty * tile_h + cy + row_start  # (ty_n, 1, 2)
    px = tx * tile_w + cx  # (1, tx_n, 2)

    x = (2.0 * (px / width) - 1.0) * (width / height)  # (1, tx_n, 2)
    y = 1.0 - 2.0 * (py / height)  # (ty_n, 1, 2)
    x = jnp.broadcast_to(x[:, :, None, :], (ty_n, tx_n, 2, 2))  # [..., yc, xc]
    y = jnp.broadcast_to(y[:, :, :, None], (ty_n, tx_n, 2, 2))
    corners = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)  # (ty_n,tx_n,2,2,3)
    world = jnp.einsum("ij,abcdj->abcdi", rotation, corners,
                       precision=jax.lax.Precision.HIGHEST)
    world = world.reshape(n_tiles, 4, 3)
    len_hi = jnp.sqrt(
        1.0 + jnp.max(x.reshape(n_tiles, 4) ** 2, axis=1)
        + jnp.max(y.reshape(n_tiles, 4) ** 2, axis=1)
    )
    o = jnp.broadcast_to(position, (n_tiles, 3))
    return {
        "o_lo": o,
        "o_hi": o,
        "d_lo": world.min(axis=1),
        "d_hi": world.max(axis=1),
        "len_hi": len_hi,
    }


def tile_perm(rows: int, width: int, tile_h: int = 8, tile_w: int = 32):
    """Permutation regrouping row-major pixels into (tile_h x tile_w) tiles.

    Coherent square-ish ray tiles overlap ~10-30x fewer BVH clusters than
    row strips of the same size (measured on the 100k-tri bench scene), which
    directly scales the binned intersector's work.  Returns an (rows*width,)
    i32 permutation p such that rays[p] is tile-major, or None if no
    reasonable tile size divides the image (callers then keep row order).
    """
    import numpy as np

    t = pick_tile(rows, width, tile_h, tile_w)
    if t is None:
        return None
    th, tw = t
    idx = np.arange(rows * width, dtype=np.int32).reshape(rows, width)
    return (
        idx.reshape(rows // th, th, width // tw, tw)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )


# 4x rotated-grid supersampling offsets (BASELINE config 4); spp=1 uses the
# reference's pixel-center +0.5 (hlsl:35-36).
RGSS_OFFSETS = ((0.375, 0.125), (0.875, 0.375), (0.125, 0.625), (0.625, 0.875))


def generate_rays(position, rotation, width: int, height: int, offset=(0.5, 0.5),
                  row_start=0, rows: int | None = None):
    """Primary rays for every pixel of a (full-width) row tile.

    Args:
      position: (3,) f32 camera position.
      rotation: (3, 3) f32 camera rotation (columns = right/up/forward).
      width, height: static FULL image size (the projection frustum).
      offset: subpixel sample offset; (0.5, 0.5) = pixel center (reference).
        May be a traced (2,) array (sample-sharded rendering).
      row_start: first pixel row of the tile (traced OK — multi-chip tiles).
      rows: tile height (static); None = full image.

    Returns:
      origins (rows*W, 3), directions (rows*W, 3) — row-major pixel order
      (pixel (px, py) at tile index (py-row_start)*width + px, matching the
      reference's UAV layout when the tile is the whole image).
    """
    position = jnp.asarray(position, jnp.float32)
    rotation = jnp.asarray(rotation, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    rows = height if rows is None else rows

    px = jnp.arange(width, dtype=jnp.float32)[None, :]  # (1, W)
    py = (jnp.arange(rows, dtype=jnp.float32) + row_start)[:, None]  # (rows, 1)

    x = (px + offset[0]) / width
    y = (py + offset[1]) / height
    x = 2.0 * x - 1.0
    y = 1.0 - 2.0 * y
    x = x * (width / height)

    x = jnp.broadcast_to(x, (rows, width))
    y = jnp.broadcast_to(y, (rows, width))
    # Unrolled rotation on the VPU — see generate_rays_tiled (a 3-wide
    # einsum pads onto 128 MXU lanes and costs ~8 ms/frame at 1080p).
    inv_len = jax.lax.rsqrt(x * x + y * y + 1.0)
    dx, dy, dz = x * inv_len, y * inv_len, -inv_len
    wx = rotation[0, 0] * dx + rotation[0, 1] * dy + rotation[0, 2] * dz
    wy = rotation[1, 0] * dx + rotation[1, 1] * dy + rotation[1, 2] * dz
    wz = rotation[2, 0] * dx + rotation[2, 1] * dy + rotation[2, 2] * dz
    wlen = jax.lax.rsqrt(wx * wx + wy * wy + wz * wz)
    dir_world = jnp.stack([wx * wlen, wy * wlen, wz * wlen], axis=-1)

    origins = jnp.broadcast_to(position, (rows, width, 3))
    return origins.reshape(-1, 3), dir_world.reshape(-1, 3)
