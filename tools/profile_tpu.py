"""Per-phase TPU timing + binning statistics for the production path.

Run manually on the TPU (NOT part of the test suite), from the repo root:

    python -m tools.profile_tpu [--tris 100000] [--sweep]

Timing methodology: the axon tunnel makes per-dispatch host timings lie
(~30-40 ms round trip), so every phase is timed by looping it N times inside
ONE jit with a data-dependent epsilon chaining iterations (same trick as
bench.py).  Numbers are device time per iteration.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import build_bvh
from directx_raytracer_tpu.bvh.clustered import build_clusters
from directx_raytracer_tpu.bvh.pallas_intersect import (
    TILE_R, VISIT_GROUP, bin_clusters_bits, build_visit_groups_bits,
    planar_mats, _search,
)
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.intersect import hit_record
from directx_raytracer_tpu.ops.rays import (
    generate_rays_tiled, tile_frustum_bounds,
)
from directx_raytracer_tpu.render.debug import render_debug

WIDTH, HEIGHT = 1920, 1080


def timed(fn, *arrays, n=5, label=""):
    """Device time per iteration of fn(eps, *arrays) chained in one jit.

    Big operands must ride ``arrays`` (jit parameters): a closed-over
    device array becomes an HLO literal, and the axon remote compiler
    rejects requests past ~200 MB (HTTP 413)."""

    @jax.jit
    def run(eps, *arrs):
        def body(i, carry):
            e, acc = carry
            out = fn(e, *arrs)
            v = jnp.asarray(out).reshape(-1)[0].astype(jnp.float32)
            return jnp.where(jnp.isfinite(v), v, 0.0) * 0.0, acc + v
        _, acc = jax.lax.fori_loop(0, n, body, (eps, jnp.float32(0)))
        return acc

    float(run(jnp.float32(0), *arrays))  # compile + warm
    t0 = time.perf_counter()
    float(run(jnp.float32(0), *arrays))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def bin_stats(geo, pos, rot, k, th, tw, g):
    cs = build_clusters(geo, k=k)
    o, d = generate_rays_tiled(pos, rot, WIDTH, HEIGHT, th, tw)
    tile_r = th * tw
    tiles = o.shape[0] // tile_r
    bounds = tile_frustum_bounds(pos, rot, WIDTH, HEIGHT, th, tw)
    *_, counts = jax.jit(bin_clusters_bits)(
        o.reshape(tiles, tile_r, 3), d.reshape(tiles, tile_r, 3), cs,
        bounds=bounds)
    c = np.asarray(counts)
    gr = (c + g - 1) // g
    print(
        f"K={k:4d} G={g:3d} tile={th}x{tw}  C={cs.aabb_min.shape[0]:6d}  "
        f"clus/tile mean={c.mean():7.1f} p50={np.percentile(c,50):5.0f} "
        f"p99={np.percentile(c,99):6.0f} max={c.max():6d}  "
        f"groups={gr.sum():8d}  tris/ray={c.mean()*k:8.0f}",
        flush=True,
    )
    return cs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=100_000)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--sweep", action="store_true",
                    help="sweep (K, G, tile) configs through _search")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    scene = testscenes.bench_scene(n_tris=args.tris, width=WIDTH, height=HEIGHT)
    dscene = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    pos = jnp.asarray(pos, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)
    geo = dscene.geometry
    nfr = args.frames

    if args.sweep:
        # (k, g, tile_h, tile_w): per-step work k*g tris x th*tw rays
        configs = [
            (128, 4, 24, 32),   # round-1 production config
            (128, 4, 16, 32),
            (128, 4, 8, 32),
            (128, 4, 16, 16),
            (128, 4, 8, 16),
            (128, 8, 8, 32),
        ]
        for (k, g, th, tw) in configs:
            cs = bin_stats(geo, pos, rot, k, th, tw, g)
            w = planar_mats(cs)
            tile_r = th * tw
            o, d = generate_rays_tiled(pos, rot, WIDTH, HEIGHT, th, tw)
            bounds = tile_frustum_bounds(pos, rot, WIDTH, HEIGHT, th, tw)
            t_init = jnp.full((o.shape[0],), 10000.0, jnp.float32)

            def ph_search(eps, *a, o=o, d=d, t_init=t_init, cs=cs, w=w,
                          tile_r=tile_r, bounds=bounds, g=g):
                bt, bs = _search(o + eps, d, t_init, cs, w, tile_r, 16384,
                                 bounds=bounds, g=g)
                return bt[0]

            dt = timed(ph_search, n=nfr,
                       label=f"  _search K={k} G={g} tile={th}x{tw}")
            print(f"    => {WIDTH*HEIGHT/dt/1e6:7.1f} Mrays/s (search only)",
                  flush=True)
        return

    # ---- per-phase timings (production config) -----------------------------
    for k in (128, 64, 32):
        bin_stats(geo, pos, rot, k, 8, 32, VISIT_GROUP)

    bvh = build_bvh(geo)
    cs, w = bvh.clusters, bvh.wplanar
    o, d = generate_rays_tiled(pos, rot, WIDTH, HEIGHT, 8, 32)
    tiles = o.shape[0] // TILE_R
    ot = o.reshape(tiles, TILE_R, 3)
    dt_ = d.reshape(tiles, TILE_R, 3)
    bounds = tile_frustum_bounds(pos, rot, WIDTH, HEIGHT, 8, 32)
    n = o.shape[0]
    t_init = jnp.full((n,), 10000.0, jnp.float32)
    packed = jnp.asarray(geo.packed)

    def ph_raygen(eps, *a):
        oo, dd = generate_rays_tiled(pos + eps, rot, WIDTH, HEIGHT, 24, 32)
        return oo[0, 0] + dd[0, 0]

    def ph_bin(eps, *a):
        *_, counts = bin_clusters_bits(ot + eps, dt_, cs, bounds=None)
        return counts[0]

    def ph_bin_bounds(eps, *a):
        b2 = {k2: v + eps if k2 != "len_hi" else v for k2, v in bounds.items()}
        *_, counts = bin_clusters_bits(ot, dt_, cs, bounds=b2)
        return counts[0]

    def ph_groups(eps, *a):
        words, cum, entry, counts = bin_clusters_bits(ot, dt_, cs, bounds=bounds)
        vt, vcs, vf, ve, rem = build_visit_groups_bits(
            words, cum, entry + eps, counts, 16384, VISIT_GROUP)
        return ve[0]

    def ph_search(eps, *a):
        bt, bs = _search(o + eps, d, t_init, cs, w, TILE_R, 10240,
                         bounds=bounds)
        return bt[0]

    def ph_hitrec(eps, packed):
        from directx_raytracer_tpu.ops.intersect import Hit
        fake = Hit(t=t_init, tri=jnp.arange(n, dtype=jnp.int32) % geo.n_tris,
                   u=t_init, v=t_init)
        h2, li, mi, ma, rec = hit_record(o + eps, d, packed, fake)
        return h2.t[0]

    def ph_shade(eps, *a):
        from directx_raytracer_tpu.ops.debug_shading import shade_debug
        color = shade_debug(jnp.int32(5), o + eps, d, t_init, t_init, t_init,
                            jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))
        return color[0, 0]

    def ph_frame(eps, *a):
        from directx_raytracer_tpu.bvh import make_bvh_intersect_fn
        img = render_debug(dscene, pos + eps, rot, jnp.int32(5), WIDTH,
                           HEIGHT, intersect_fn=make_bvh_intersect_fn(bvh))
        return img[0, 0, 0]

    timed(ph_raygen, n=nfr, label="raygen (tiled)")
    timed(ph_bin, n=nfr, label="bin_clusters (reduced bounds)")
    timed(ph_bin_bounds, n=nfr, label="bin_clusters (analytic bounds)")
    timed(ph_groups, n=nfr, label="bin + build_visit_groups")
    timed(ph_search, n=nfr, label="_search full (bin+groups+kernel)")
    timed(ph_hitrec, packed, n=nfr, label="hit_record (gather+MT refine)")
    timed(ph_shade, n=nfr, label="shade_debug (mode 5)")
    dt = timed(ph_frame, n=nfr, label="render_debug full frame")
    print(f"=> {WIDTH*HEIGHT/dt/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
