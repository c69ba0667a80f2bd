"""Stage breakdown of the intersection pipeline at scene scale.

Times, each inside one jit frame-loop (tunnel-safe):
  bin    : bin_clusters_bits alone
  sched  : binning + rank table + first visit-group build
  search : the full production _search (binning + scheduling + kernel)

python -m tools.scale_micro [ntris]
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


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed(fn, ds, args, n=20):
    # Chain a data-dependent epsilon into the first ray argument so no
    # iteration can be elided, and subtract the empty-dispatch round trip
    # (~40 ms through the axon tunnel — at n=5 that biased +8 ms/frame).
    @jax.jit
    def loop(ds, a0, *rest):
        def body(i, carry):
            a0c, acc = carry
            out = fn(ds, a0c, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            v = leaf.reshape(-1)[0].astype(jnp.float32)
            v = jnp.where(jnp.isfinite(v), v, 0.0)
            return a0c + v * 1e-12, acc + v
        _, acc = jax.lax.fori_loop(0, n, body, (a0, jnp.float32(0)))
        return acc

    @jax.jit
    def empty(ds, a0, *rest):
        return jax.tree_util.tree_leaves(a0)[0].reshape(-1)[0]

    x = loop(ds, *args); jax.block_until_ready(x); float(x)
    float(empty(ds, *args))
    t0 = time.perf_counter()
    float(empty(ds, *args))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(ds, *args))
    return (time.perf_counter() - t0 - ovh) / n


def main():
    ntris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
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
    tiles = n // tile_r
    ot = o.reshape(tiles, tile_r, 3)
    dt = dd.reshape(tiles, tile_r, 3)
    k = bvh.clusters.k
    g = max(1, 512 // k)
    budget = pi.VISIT_BUDGET

    def f_bin(ds, ot, dt):
        b = ds.geometry.accel
        return pi.bin_clusters_bits(ot, dt, b.clusters)

    def f_sched(ds, ot, dt):
        b = ds.geometry.accel
        words, cum, entry, counts = pi.bin_clusters_bits(ot, dt, b.clusters)
        cap = min(pi.RANK_CAP, words.shape[1] * 32)
        counts_lo = jnp.minimum(counts, cap)
        table = pi.rank_table_bits(words, cum, cap)
        return pi.build_visit_groups_table(table, entry, counts_lo, budget, g)

    def f_search(ds, o, dd):
        b = ds.geometry.accel
        t0 = jnp.full((o.shape[0],), 10000.0, jnp.float32)
        return pi._search(o, dd, t0, b.clusters, b.wplanar, tile_r, budget)

    _log("scene+bvh built; timing bin...")
    t_bin = timed(f_bin, d, (ot, dt))
    _log(f"bin    {t_bin*1e3:8.2f} ms")
    t_sched = timed(f_sched, d, (ot, dt))
    _log(f"sched  {t_sched*1e3:8.2f} ms  (bin + rank table + visit build)")
    t_search = timed(f_search, d, (o, dd))
    _log(f"search {t_search*1e3:8.2f} ms  (full: sched + kernel)")

    *_, counts = jax.jit(f_bin)(d, ot, dt)
    ppr = float(np.asarray(counts).mean()) * k
    tot = int(np.asarray(counts).sum())
    print(f"ntris={ntris} C={bvh.clusters.aabb_min.shape[0]} tile_r={tile_r} "
          f"tiles={tiles} pairs/ray={ppr:.0f} visits={tot} "
          f"launches~{int(np.ceil(((np.asarray(counts)+g-1)//g).sum()/budget))}")
    print(f"bin    {t_bin*1e3:8.2f} ms")
    print(f"sched  {t_sched*1e3:8.2f} ms  (bin + rank table + visit build)")
    print(f"search {t_search*1e3:8.2f} ms  (full: sched + kernel)")


if __name__ == "__main__":
    main()
