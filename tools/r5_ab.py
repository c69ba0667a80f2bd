"""Round-5 A/Bs: tile_r=512 sweep point + ray-tile geometry (VERDICT r4 #1b).

The r3/r4 sweeps measured tile_r in {128, 256} only; 512 halves the
per-step fixed machinery share AND the binning/rank-table row count at the
cost of a wider per-chunk hull (more scheduled pairs).  Variants:

  t256    control: 8x32 pixel tiles, kernel tile_r=256
  t512    8x32 pixel tiles, kernel tile_r=512 (two consecutive tiles/chunk)
  t512sq  16x32 pixel tiles, kernel tile_r=512 (square-ish hull)

Usage: python -m tools.r5_ab [ntris ...] [variants ...]
Defaults: 100000 1000000, all variants.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import build_bvh
from directx_raytracer_tpu.bvh.pallas_intersect import _search, bin_clusters_bits
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.rays import T_MAX, generate_rays_tiled

WIDTH, HEIGHT = 1920, 1080
VARIANTS = {
    "t256": (8, 32, 256),
    "t512": (8, 32, 512),
    "t512sq": (16, 32, 512),   # NB 16 !| 1080: floor-tiles to 2.058M rays
    "t512w": (8, 64, 512),     # 1080p-compatible
    "t512c": (4, 128, 512),    # 1080p-compatible, extreme aspect
    "t1024sq": (32, 32, 1024),  # probe only (32 !| 1080)
    "t1024w": (16, 64, 1024),   # probe only
    "t1024ww": (8, 128, 1024),  # 1080p-compatible
    "t384sq": (12, 32, 384),    # 1080p-compatible, square-ish
    "t768sq": (24, 32, 768),    # 1080p-compatible, square
    "t640sq": (20, 32, 640),    # 1080p-compatible, square-ish
}


def run_variant(name, d, bvh, pos, rot, n_frames=10):
    th, tw, tile_r = VARIANTS[name]
    p = jnp.asarray(pos, jnp.float32)
    r = jnp.asarray(rot, jnp.float32)

    @jax.jit
    def run(ds, p):
        b = ds.geometry.accel

        def body(i, carry):
            pp, acc = carry
            o, dd = generate_rays_tiled(pp, r, WIDTH, HEIGHT, th, tw)
            t_init = jnp.full((o.shape[0],), T_MAX, jnp.float32)
            bt, _ = _search(o, dd, t_init, b.clusters, b.wplanar,
                            tile_r, 10240, scheme=b.scheme)
            v = jnp.where(jnp.isfinite(bt[0]), bt[0], 0.0)
            return pp + v * 0.0, acc + bt[0]
        _, acc = jax.lax.fori_loop(0, n_frames, body, (p, jnp.float32(0)))
        return acc

    @jax.jit
    def empty(p):
        def body(i, carry):
            pp, acc = carry
            return pp, acc + pp[0] * 0.0
        _, acc = jax.lax.fori_loop(0, n_frames, body, (p, jnp.float32(0)))
        return acc

    print(f"  [{name}] compiling...", file=sys.stderr, flush=True)
    float(run(d, p))
    float(empty(p))
    t0 = time.perf_counter(); float(empty(p))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(d, p))
    dt = (time.perf_counter() - t0 - ovh) / n_frames

    # scheduled pairs/ray at this chunking
    o, dd = generate_rays_tiled(p, r, WIDTH, HEIGHT, th, tw)
    tiles = o.shape[0] // tile_r
    *_, counts = jax.jit(bin_clusters_bits)(
        o.reshape(tiles, tile_r, 3), dd.reshape(tiles, tile_r, 3),
        bvh.clusters)
    ppr = float(np.asarray(counts).sum()) * bvh.clusters.k / o.shape[0]
    mrays = WIDTH * HEIGHT / dt / 1e6
    print(f"  {name}: {dt*1e3:7.2f} ms  {mrays:6.1f} Mrays/s  "
          f"pairs/ray {ppr:6.1f}", flush=True)
    return dt, mrays, ppr


def main():
    ntris_list = [int(a) for a in sys.argv[1:] if a.isdigit()] or [100_000, 1_000_000]
    variants = [a for a in sys.argv[1:] if a in VARIANTS] or list(VARIANTS)
    scheme = "bary6"
    if "--scheme" in sys.argv:
        scheme = sys.argv[sys.argv.index("--scheme") + 1]
    for ntris in ntris_list:
        print(f"scene {ntris} tris (scheme={scheme}):", flush=True)
        scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
        d = build_device_scene(scene)
        bvh = build_bvh(d.geometry, scheme=scheme)
        d.geometry.accel = bvh
        pos, rot = scene.camera.snapshot()
        for name in variants:
            try:
                run_variant(name, d, bvh, pos, rot)
            except Exception as e:
                print(f"  {name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
