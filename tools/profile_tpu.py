"""Per-phase TPU timing + binning statistics for the production path.

Run manually on the TPU (NOT part of the test suite):

    python tools/profile_tpu.py [--tris 100000] [--k 128 64 32]

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
    TILE_R, VISIT_GROUP, bin_clusters, build_visit_groups, planar_mats,
    _launch, _search,
)
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.intersect import hit_record
from directx_raytracer_tpu.ops.rays import (
    generate_rays_tiled, tile_frustum_bounds,
)
from directx_raytracer_tpu.render.debug import render_debug

WIDTH, HEIGHT = 1920, 1080


def timed(fn, *args, n=5, label=""):
    """Device time per iteration of fn(*args) chained inside one jit."""

    @jax.jit
    def run(eps):
        def body(i, carry):
            e, acc = carry
            out = fn(*args, eps=e)
            v = jnp.asarray(out).reshape(-1)[0].astype(jnp.float32)
            return jnp.where(jnp.isfinite(v), v, 0.0) * 0.0, acc + v
        _, acc = jax.lax.fori_loop(0, n, body, (eps, jnp.float32(0)))
        return acc

    float(run(jnp.float32(0)))  # compile + warm
    t0 = time.perf_counter()
    float(run(jnp.float32(0)))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:34s} {dt*1e3:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=100_000)
    ap.add_argument("--k", type=int, nargs="*", default=[128, 64, 32])
    ap.add_argument("--frames", type=int, default=5)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    scene = testscenes.bench_scene(n_tris=args.tris, width=WIDTH, height=HEIGHT)
    dscene = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    pos = jnp.asarray(pos, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)
    geo = dscene.geometry

    # ---- binning statistics per cluster granularity ----------------------
    o, d = generate_rays_tiled(pos, rot, WIDTH, HEIGHT, 24, 32)
    tiles = o.shape[0] // TILE_R
    ot = o.reshape(tiles, TILE_R, 3)
    dt_ = d.reshape(tiles, TILE_R, 3)
    bounds = tile_frustum_bounds(pos, rot, WIDTH, HEIGHT, 24, 32)

    for k in args.k:
        cs = build_clusters(geo, k=k)
        ids, entry, counts = jax.jit(bin_clusters, static_argnames=())(
            ot, dt_, cs, bounds=bounds)
        c = np.asarray(counts)
        g = (c + VISIT_GROUP - 1) // VISIT_GROUP
        print(
            f"K={k:4d}  C={cs.aabb_min.shape[0]:6d}  "
            f"clusters/tile mean={c.mean():7.1f} p50={np.percentile(c,50):6.0f} "
            f"p99={np.percentile(c,99):7.0f} max={c.max():6d}  "
            f"groups total={g.sum():8d}  "
            f"tris-tested/ray={(c.mean()*k/1):8.0f}"
        )

    # ---- per-phase timings (K=128 production path) ------------------------
    bvh = build_bvh(geo)
    cs, w = bvh.clusters, bvh.wplanar
    n = o.shape[0]
    t_init = jnp.full((n,), 10000.0, jnp.float32)

    def ph_raygen(eps):
        oo, dd = generate_rays_tiled(pos + eps, rot, WIDTH, HEIGHT, 24, 32)
        return oo[0, 0] + dd[0, 0]

    def ph_bin(eps):
        ids, entry, counts = bin_clusters(ot + eps, dt_, cs, bounds=None)
        return counts[0]

    def ph_bin_bounds(eps):
        b2 = {k2: v + eps if k2 != "len_hi" else v for k2, v in bounds.items()}
        ids, entry, counts = bin_clusters(ot, dt_, cs, bounds=b2)
        return counts[0]

    def ph_groups(eps):
        ids, entry, counts = bin_clusters(ot, dt_, cs, bounds=bounds)
        vt, vcs, vf, ve, rem = build_visit_groups(
            ids, entry + eps, counts, 16384, VISIT_GROUP)
        return ve[0]

    def ph_search(eps):
        bt, bs = _search(o + eps, d, t_init, cs, w, TILE_R, 16384,
                         bounds=bounds)
        return bt[0]

    def ph_search_nobounds(eps):
        bt, bs = _search(o + eps, d, t_init, cs, w, TILE_R, 16384)
        return bt[0]

    def ph_hitrec(eps):
        from directx_raytracer_tpu.ops.intersect import Hit
        fake = Hit(t=t_init, tri=jnp.arange(n, dtype=jnp.int32) % geo.n_tris,
                   u=t_init, v=t_init)
        h2, li, mi, ma = hit_record(o + eps, d, geo.packed_a, fake)
        return h2.t[0]

    def ph_frame(eps):
        from directx_raytracer_tpu.bvh import make_bvh_intersect_fn
        img = render_debug(dscene, pos + eps, rot, jnp.int32(5), WIDTH,
                           HEIGHT, intersect_fn=make_bvh_intersect_fn(bvh))
        return img[0, 0, 0]

    nfr = args.frames
    timed(ph_raygen, n=nfr, label="raygen (tiled)")
    timed(ph_bin, n=nfr, label="bin_clusters (reduced bounds)")
    timed(ph_bin_bounds, n=nfr, label="bin_clusters (analytic bounds)")
    timed(ph_groups, n=nfr, label="bin + build_visit_groups")
    timed(ph_search, n=nfr, label="_search full (bin+groups+kernel)")
    timed(ph_search_nobounds, n=nfr, label="_search full (no bounds)")
    timed(ph_hitrec, n=nfr, label="hit_record (gather+MT refine)")
    dt = timed(ph_frame, n=nfr, label="render_debug full frame")
    print(f"=> {WIDTH*HEIGHT/dt/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
