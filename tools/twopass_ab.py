"""A/B: production one-shot _search vs its t-capped two-phase schedule.

``_search(phase_cap=N)`` runs each tile's nearest N binned clusters
first, then reculls the rest against the achieved per-tile max best_t at
re-binning time (see pallas_intersect._search).  This measures both
schedules end-to-end on the bench scene and reports the visit reduction.

  python -m tools.twopass_ab ntris [cap1 ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import build_bvh, _auto_tile_r
from directx_raytracer_tpu.bvh import pallas_intersect as pi
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.rays import generate_rays_tiled

WIDTH, HEIGHT = 1920, 1080


def main():
    ntris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    caps = [int(a) for a in sys.argv[2:]] or [4, 8]
    scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
    d = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    bvh = build_bvh(d.geometry)
    d.geometry.accel = bvh
    tile_r = _auto_tile_r(bvh)
    o, dd = generate_rays_tiled(jnp.asarray(pos, jnp.float32),
                                jnp.asarray(rot, jnp.float32),
                                WIDTH, HEIGHT, 8, 32)
    n = o.shape[0]
    print(f"ntris={ntris} tile_r={tile_r}", flush=True)

    nfr = 20

    def f_search(ds, o, dd, phase_cap=0):
        b = ds.geometry.accel
        t0 = jnp.full((o.shape[0],), 10000.0, jnp.float32)
        bt, bs = pi._search(o, dd, t0, b.clusters, b.wplanar, tile_r,
                            pi.VISIT_BUDGET, phase_cap=phase_cap)
        return bt, bs

    def timeit(label, phase_cap):
        @jax.jit
        def loop(ds, o, dd):
            def body(i, carry):
                o2, acc = carry
                bt, _ = f_search(ds, o2, dd, phase_cap)
                return o2 + bt[0] * 1e-12, acc + bt[0]
            _, acc = jax.lax.fori_loop(0, nfr, body, (o, jnp.float32(0)))
            return acc

        @jax.jit
        def empty(ds, o, dd):
            return o[0, 0]

        print(f"  {label}: compiling...", file=sys.stderr, flush=True)
        float(loop(d, o, dd)); float(empty(d, o, dd))
        t0 = time.perf_counter(); float(empty(d, o, dd))
        ovh = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(d, o, dd))
        dt = (time.perf_counter() - t0 - ovh) / nfr
        print(f"  {label}: {dt*1e3:7.2f} ms = {n/dt/1e6:6.1f} Mrays/s",
              flush=True)

    timeit("one-shot (production)", 0)
    bt1, bs1 = jax.jit(f_search, static_argnames=("phase_cap",))(d, o, dd)
    for cap1 in caps:
        bt2, bs2 = jax.jit(f_search, static_argnames=("phase_cap",))(
            d, o, dd, phase_cap=cap1)
        agree = float(jnp.mean(bs1 == bs2))
        print(f"  cap1={cap1}: slot agreement {agree*100:.3f}%", flush=True)
        timeit(f"two-phase cap1={cap1}", cap1)


if __name__ == "__main__":
    main()
