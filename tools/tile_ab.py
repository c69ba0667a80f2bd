"""A/B timing of the production _search across scheduling configurations.

Each combo times the FULL production search (binning + scheduling +
kernel) in a frame loop inside one jit (tunnel-safe).  Usage:

  python -m tools.tile_ab ntris tile_r:g:bounds [tile_r:g:bounds ...]

bounds: e (empirical hull inside the binner) | a (analytic tile frustum).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import build_bvh
from directx_raytracer_tpu.bvh import pallas_intersect as pi
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.rays import generate_rays_tiled, tile_frustum_bounds

WIDTH, HEIGHT = 1920, 1080


def main():
    ntris = int(sys.argv[1])
    combos = []
    for a in sys.argv[2:]:
        tr, g, b = a.split(":")
        combos.append((int(tr), int(g), b))

    scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
    d = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    bvh = build_bvh(d.geometry)
    d.geometry.accel = bvh
    p = jnp.asarray(pos, jnp.float32)
    r = jnp.asarray(rot, jnp.float32)
    o, dd = generate_rays_tiled(p, r, WIDTH, HEIGHT, 8, 32)
    n = o.shape[0]
    print(f"ntris={ntris} C={bvh.clusters.aabb_min.shape[0]} rays={n}",
          flush=True)

    for tile_r, g, bmode in combos:
        bounds = (tile_frustum_bounds(p, r, WIDTH, HEIGHT, 8, 32)
                  if bmode == "a" else None)

        def f_search(ds, o, dd, bounds=bounds, tile_r=tile_r, g=g):
            b = ds.geometry.accel
            t0 = jnp.full((o.shape[0],), 10000.0, jnp.float32)
            bt, _ = pi._search(o, dd, t0, b.clusters, b.wplanar, tile_r,
                               pi.VISIT_BUDGET, bounds=bounds, g=g)
            return bt

        @jax.jit
        def loop(ds, o, dd):
            def body(i, acc):
                bt = f_search(ds, o, dd)
                return acc + bt[0]
            return jax.lax.fori_loop(0, 5, body, jnp.float32(0))

        print(f"  tile_r={tile_r} g={g} bounds={bmode}: compiling...",
              file=sys.stderr, flush=True)
        x = loop(d, o, dd); float(x)
        t0 = time.perf_counter()
        float(loop(d, o, dd))
        dt = (time.perf_counter() - t0) / 5
        print(f"  tile_r={tile_r} g={g} bounds={bmode}: {dt*1e3:7.2f} ms "
              f"= {n/dt/1e6:6.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
