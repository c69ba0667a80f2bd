"""A/B timing of the production _search across scheduling configurations.

Each combo times the FULL production search (binning + scheduling +
kernel) in a frame loop inside one jit (tunnel-safe).  Usage:

  python -m tools.tile_ab ntris tile_r:g:bounds[:k[:budget]] [...]

bounds: e (empirical hull inside the binner) | a (analytic tile frustum).
k (cluster size) and budget (visit window) default to 128 / VISIT_BUDGET;
a distinct k rebuilds the BVH for that combo.
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
        parts = a.split(":")
        tr, g, b = int(parts[0]), int(parts[1]), parts[2]
        kk = int(parts[3]) if len(parts) > 3 else 128
        bud = int(parts[4]) if len(parts) > 4 else pi.VISIT_BUDGET
        combos.append((tr, g, b, kk, bud))

    scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
    d = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    bvhs = {}
    for *_, kk, _b in combos:
        if kk not in bvhs:
            bvhs[kk] = build_bvh(d.geometry, k=kk)
    p = jnp.asarray(pos, jnp.float32)
    r = jnp.asarray(rot, jnp.float32)
    o, dd = generate_rays_tiled(p, r, WIDTH, HEIGHT, 8, 32)
    n = o.shape[0]
    print(f"ntris={ntris} C={bvhs[combos[0][3]].clusters.aabb_min.shape[0]} "
          f"rays={n}", flush=True)

    for tile_r, g, bmode, kk, bud in combos:
        bounds = (tile_frustum_bounds(p, r, WIDTH, HEIGHT, 8, 32)
                  if bmode == "a" else None)
        d.geometry.accel = bvhs[kk]

        def f_search(ds, o, dd, bounds=bounds, tile_r=tile_r, g=g, bud=bud):
            b = ds.geometry.accel
            t0 = jnp.full((o.shape[0],), 10000.0, jnp.float32)
            bt, _ = pi._search(o, dd, t0, b.clusters, b.wplanar, tile_r,
                               bud, bounds=bounds, g=g)
            return bt

        nfr = 20

        @jax.jit
        def loop(ds, o, dd):
            # Perturb origins by a data-dependent epsilon each frame so no
            # iteration can be elided, and subtract the empty-dispatch cost
            # (the axon tunnel adds ~40 ms per dispatch).
            def body(i, carry):
                o2, acc = carry
                bt = f_search(ds, o2, dd)
                eps = bt[0] * 1e-12
                return o2 + eps, acc + bt[0]
            _, acc = jax.lax.fori_loop(0, nfr, body, (o, jnp.float32(0)))
            return acc

        @jax.jit
        def empty(ds, o, dd):
            return o[0, 0]

        print(f"  tile_r={tile_r} g={g} bounds={bmode} k={kk} bud={bud}: compiling...",
              file=sys.stderr, flush=True)
        x = loop(d, o, dd); float(x)
        float(empty(d, o, dd))
        t0 = time.perf_counter()
        float(empty(d, o, dd))
        ovh = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(d, o, dd))
        dt = (time.perf_counter() - t0 - ovh) / nfr
        print(f"  tile_r={tile_r} g={g} bounds={bmode} k={kk} bud={bud}: {dt*1e3:7.2f} ms "
              f"= {n/dt/1e6:6.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
