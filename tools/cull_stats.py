"""Culling-granularity curve: scheduled pairs/ray vs ray-tile size.

Pure binning statistics — runs on CPU (chunked over tiles so the (T, C)
slab intermediates stay small).  Answers: how much does per-tile culling
improve as tiles shrink, and what step count does each configuration pay?

python -m tools.cull_stats [ntris ...]
"""

from __future__ import annotations

import sys

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import build_bvh
from directx_raytracer_tpu.bvh import pallas_intersect as pi
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.rays import generate_rays_tiled

WIDTH, HEIGHT = 1920, 1080


def counts_at(o, d, cs, tile_r, chunk=2048):
    n = o.shape[0]
    tiles = n // tile_r
    ot = np.asarray(o).reshape(tiles, tile_r, 3)
    dt = np.asarray(d).reshape(tiles, tile_r, 3)
    f = jax.jit(lambda a, b: pi.bin_clusters_bits(a, b, cs, impl="xla")[3])
    out = []
    for s in range(0, tiles, chunk):
        out.append(np.asarray(f(jnp.asarray(ot[s:s + chunk]),
                                jnp.asarray(dt[s:s + chunk]))))
    return np.concatenate(out)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    for ntris in sizes:
        scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
        dscene = build_device_scene(scene)
        pos, rot = scene.camera.snapshot()
        bvh = build_bvh(dscene.geometry)
        cs = bvh.clusters
        k = cs.k
        c = cs.aabb_min.shape[0]
        o, d = generate_rays_tiled(jnp.asarray(pos, jnp.float32),
                                   jnp.asarray(rot, jnp.float32),
                                   WIDTH, HEIGHT, 8, 32)
        n = o.shape[0]
        print(f"ntris={ntris} C={c} k={k} rays={n}", flush=True)
        for tile_r in (64, 128, 256, 768):
            cnt = counts_at(o, d, cs, tile_r)
            ppr = cnt.mean() * k
            p99 = np.percentile(cnt, 99)
            for g in (4, 8):
                steps = int(((cnt + g - 1) // g).sum())
                print(f"  tile_r={tile_r:4d} g={g}: pairs/ray={ppr:7.0f} "
                      f"clusters/tile mean={cnt.mean():6.2f} p99={p99:5.0f} "
                      f"max={cnt.max():5d} steps={steps}", flush=True)


if __name__ == "__main__":
    main()
