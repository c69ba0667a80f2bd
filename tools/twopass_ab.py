"""Prototype: two-phase t-capped search vs the production one-shot.

Phase 1 runs only each tile's nearest ``cap1`` binned clusters; the
resulting per-tile max best_t then CULLS the remaining clusters at
re-binning time (entry > t_cap never gets scheduled), instead of relying
on the kernel's per-step early-out to skip them at launch cost.

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


def twopass(o, dirs, cs, w, tile_r: int, budget: int, cap1: int):
    """Mirror of _search with a t-capped second phase."""
    g = max(1, 512 // cs.k)
    n = o.shape[0]
    tiles = n // tile_r

    # scene-exit seeding (as _search)
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
    t_init = jnp.minimum(jnp.full((n,), 10000.0, jnp.float32),
                         exit_t * 1.001 + 1e-2)

    ot = o.reshape(tiles, tile_r, 3)
    dt = dirs.reshape(tiles, tile_r, 3)
    words, cum, entry, counts = pi.bin_clusters_bits(ot, dt, cs)
    cap = min(pi.RANK_CAP, words.shape[1] * 32)
    table = pi.rank_table_bits(words, cum, cap)

    rays8 = jnp.concatenate(
        [o, jnp.ones((n, 1), jnp.float32), dirs,
         jnp.zeros((n, 1), jnp.float32)], axis=1,
    ).reshape(tiles, tile_r, 8).swapaxes(1, 2)
    rays8 = jnp.concatenate([rays8, jnp.zeros((1, 8, tile_r), jnp.float32)])
    rays8 = pi.rays_split(rays8)
    best_t = jnp.concatenate(
        [t_init.reshape(tiles, 1, tile_r), jnp.zeros((1, 1, tile_r), jnp.float32)])
    best_slot = jnp.full((tiles + 1, 1, tile_r), -1, jnp.int32)

    # ---- phase 1: nearest cap1 ranks of every tile ----
    counts1 = jnp.minimum(counts, cap1)
    total1 = jnp.sum((counts1 + g - 1) // g)

    def body1(state):
        start, bt, bs = state
        vt1, vcs1, vf1, ve1, _ = pi.build_visit_groups_table(
            table, entry, counts1, budget, g, start=start)
        bt2, bs2 = pi._launch(rays8, bt, bs, vt1, vcs1, vf1, ve1, w,
                              cs.k, tile_r, budget)
        return start + budget, bt2, bs2

    _, best_t, best_slot = jax.lax.while_loop(
        lambda s: s[0] < total1, body1, (jnp.int32(0), best_t, best_slot))

    # ---- phase 2: re-cull ranks >= cap1 by the achieved best_t ----
    t_cap = jnp.max(best_t[:tiles, 0, :], axis=1)  # (T,)
    c = entry.shape[1]
    keep = entry <= t_cap[:, None]  # (T, C) conservative: entry < best
    # drop the rank-< cap1 bits (already visited) from the word mask
    first = table[:, :cap1]  # cluster ids of ranks 0..cap1-1 (clamped)
    rankpos = jnp.arange(cap1, dtype=jnp.int32)[None, :]
    valid_first = rankpos < counts1[:, None]
    drop = jnp.zeros((tiles, c), bool).at[
        jnp.arange(tiles)[:, None], jnp.clip(first, 0, c - 1)].max(
        valid_first, mode="drop")
    keep = keep & ~drop
    wbits = words.shape[1]
    kb = keep[:, : wbits * 32].reshape(tiles, wbits, 32).astype(jnp.int32)
    words2 = (kb << jnp.arange(32, dtype=jnp.int32)[None, None, :]).sum(-1)
    words2 = words2 & words  # only originally-binned clusters
    cnt_w = jax.lax.population_count(words2)
    cum2 = jnp.cumsum(cnt_w, axis=1)
    counts2 = cnt_w.sum(axis=1)

    total2 = jnp.sum((counts2 + g - 1) // g)

    def body(state):
        start, bt, bs = state
        vt2, vcs2, vf2, ve2, _ = pi.build_visit_groups_bits(
            words2, cum2, entry, counts2, budget, g, start=start)
        bt2, bs2 = pi._launch(rays8, bt, bs, vt2, vcs2, vf2, ve2, w,
                              cs.k, tile_r, budget)
        return start + budget, bt2, bs2

    _, best_t, best_slot = jax.lax.while_loop(
        lambda s: s[0] < total2, body, (jnp.int32(0), best_t, best_slot))
    return (best_t[:tiles].reshape(-1)[:n], best_slot[:tiles].reshape(-1)[:n],
            counts, counts1, counts2)


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

    def timeit(fn, label, *args):
        @jax.jit
        def loop(ds, o, dd):
            def body(i, carry):
                o2, acc = carry
                bt = fn(ds, o2, dd, *args)
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
        return dt

    def f_base(ds, o, dd):
        b = ds.geometry.accel
        t0 = jnp.full((o.shape[0],), 10000.0, jnp.float32)
        bt, _ = pi._search(o, dd, t0, b.clusters, b.wplanar, tile_r,
                           pi.VISIT_BUDGET)
        return bt

    timeit(f_base, "one-shot (production)")

    for cap1 in caps:
        def f_two(ds, o, dd, cap1=cap1):
            b = ds.geometry.accel
            bt, _, *_ = twopass(o, dd, b.clusters, b.wplanar, tile_r,
                                pi.VISIT_BUDGET, cap1)
            return bt

        # correctness + schedule stats once
        bt1 = jax.jit(f_base)(d, o, dd)
        bt2, bs2, counts, c1, c2 = jax.jit(
            lambda ds, o, dd, cap1=cap1: twopass(
                o, dd, ds.geometry.accel.clusters, ds.geometry.accel.wplanar,
                tile_r, pi.VISIT_BUDGET, cap1))(d, o, dd)
        same = float(jnp.mean((jnp.abs(bt1 - bt2) < 1e-3) |
                              ((bt1 >= 9999) & (bt2 >= 9999))))
        sched1 = int(np.asarray(jnp.minimum(counts, cap1)).sum())
        sched2 = int(np.asarray(c2).sum())
        sched0 = int(np.asarray(counts).sum())
        print(f"  cap1={cap1}: visits {sched0} -> {sched1}+{sched2} "
              f"({(sched1+sched2)/sched0*100:.0f}%), t agreement {same*100:.2f}%",
              flush=True)
        timeit(f_two, f"two-pass cap1={cap1}")


if __name__ == "__main__":
    main()
