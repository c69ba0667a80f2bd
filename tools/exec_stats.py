"""Executed-vs-scheduled visit accounting for the production kernel.

Rebuilds _search's exact schedule (empirical hull binning, rank-table
visit groups, scene-exit t seeds) and launches the kernel with its
diagnostic executed-sub-visit counter, answering: how much of the
scheduled work does the near-to-far group early-out actually skip?

python -m tools.exec_stats [ntris ...]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import build_bvh, _auto_tile_r
from directx_raytracer_tpu.bvh import pallas_intersect as pi
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.rays import generate_rays_tiled

WIDTH, HEIGHT = 1920, 1080


def run(ntris: int):
    scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
    d = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    bvh = build_bvh(d.geometry)
    cs, w = bvh.clusters, bvh.wplanar
    k = cs.k
    g = max(1, 512 // k)
    tile_r = _auto_tile_r(bvh)
    o, dd = generate_rays_tiled(jnp.asarray(pos, jnp.float32),
                                jnp.asarray(rot, jnp.float32),
                                WIDTH, HEIGHT, 8, 32)
    n = o.shape[0]
    tiles = n // tile_r

    @jax.jit
    def schedule(o, dirs, cs):
        # mirror of _search's seeding + lo-phase scheduling
        lo = jnp.min(jnp.where(cs.valid[:, None], cs.aabb_min, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(cs.valid[:, None], cs.aabb_max, -jnp.inf), axis=0)
        tn, tf = jnp.float32(-3e38), jnp.float32(3e38)
        for ax in range(3):
            inv = 1.0 / jnp.where(jnp.abs(dirs[:, ax]) < 1e-12,
                                  jnp.where(dirs[:, ax] < 0, -1e-12, 1e-12),
                                  dirs[:, ax])
            a = (lo[ax] - o[:, ax]) * inv
            b = (hi[ax] - o[:, ax]) * inv
            tn = jnp.maximum(tn, jnp.minimum(a, b))
            tf = jnp.minimum(tf, jnp.maximum(a, b))
        exit_t = jnp.where((tn <= tf) & (tf > 0), tf, pi.T_MIN)
        t_init = jnp.minimum(10000.0, exit_t * 1.001 + 1e-2)

        ot = o.reshape(tiles, tile_r, 3)
        dt = dirs.reshape(tiles, tile_r, 3)
        words, cum, entry, counts = pi.bin_clusters_bits(ot, dt, cs)
        cap = min(pi.RANK_CAP, words.shape[1] * 32)
        counts_lo = jnp.minimum(counts, cap)
        table = pi.rank_table_bits(words, cum, cap)
        return t_init, table, entry, counts_lo, counts

    budget = 1 << int(np.ceil(np.log2(max(
        int(np.asarray(jax.jit(schedule)(o, dd, cs)[3] // g + 1).sum()), 1))))
    budget = max(budget, 1024)

    t_init, table, entry, counts_lo, counts = jax.jit(schedule)(o, dd, cs)
    vt, vcs, vf, ve, rem = jax.jit(
        pi.build_visit_groups_table, static_argnames=("budget", "g"))(
        table, entry, counts_lo, budget, g)
    assert int(rem) == 0, f"budget {budget} too small ({int(rem)} remaining)"

    rays8 = jnp.concatenate(
        [o, jnp.ones((n, 1), jnp.float32), dd, jnp.zeros((n, 1), jnp.float32)],
        axis=1).reshape(tiles, tile_r, 8).swapaxes(1, 2)
    rays8 = jnp.concatenate([rays8, jnp.zeros((1, 8, tile_r), jnp.float32)])
    rays8 = jax.jit(pi.rays_split)(rays8)
    init_t = jnp.concatenate([t_init.reshape(tiles, 1, tile_r),
                              jnp.zeros((1, 1, tile_r), jnp.float32)])
    init_slot = jnp.full((tiles + 1, 1, tile_r), -1, jnp.int32)

    f = jax.jit(pi._launch, static_argnames=("k", "tile_r", "budget",
                                             "count_exec"))
    _, _, exec_ct = f(rays8, init_t, init_slot, vt, vcs, vf, ve, w,
                      k=k, tile_r=tile_r, budget=budget, count_exec=True)
    executed = int(np.asarray(exec_ct).sum())
    scheduled = int(np.asarray(counts_lo).sum())
    print(f"ntris={ntris} tile_r={tile_r} k={k} g={g} budget={budget}: "
          f"scheduled visits={scheduled} executed={executed} "
          f"({executed / max(scheduled, 1) * 100:.1f}%) "
          f"pairs/ray sched={scheduled * k / n:.0f} "
          f"exec={executed * k / n:.0f}", flush=True)


def main():
    for a in (sys.argv[1:] or ["100000", "1000000"]):
        run(int(a))


if __name__ == "__main__":
    main()
