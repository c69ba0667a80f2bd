"""Whitted frame timing on the TPU — tracks VERDICT r1 next-step #4
(1080p, depth 3, 4 lights, 100k tris; target < 150 ms/frame).

python -m tools.whitted_bench [--width 1920 --height 1080 --depth 3]
"""
import argparse
import time

import jax
import jax.numpy as jnp

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import (build_bvh, make_bvh_intersect_fn,
                                        make_bvh_occluder_factory)
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.render import render_whitted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--tris", type=int, default=100_000)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--occ-tile-r", type=int, default=None,
                    help="occluder ray-chunk (default: kernel TILE_R)")
    ap.add_argument("--isect-tile-r", type=int, default=None,
                    help="secondary-batch closest-hit ray-chunk")
    ap.add_argument("--occ-budget", type=int, default=None,
                    help="any-hit schedule window override")
    ap.add_argument("--chunk-div", type=int, default=16,
                    help="bounce chunk = queue // chunk_div")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    scene = testscenes.bench_scene(n_tris=args.tris, width=args.width,
                                   height=args.height)
    d = build_device_scene(scene)
    bvh = build_bvh(d.geometry)
    d.geometry.accel = bvh  # ride jit as an argument, not closure constant
    isect = make_bvh_intersect_fn(bvh, tile_r=args.isect_tile_r)
    occf = make_bvh_occluder_factory(bvh, tile_r=args.occ_tile_r,
                                     budget=args.occ_budget)
    pos, rot = scene.camera.snapshot()
    pos = jnp.asarray(pos, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)

    n = args.frames

    @jax.jit
    def run(d, p):
        # scene as jit ARG — closure bakes wplanar into the HLO (413 at 1M)
        def body(i, carry):
            pp, acc = carry
            img, stats = render_whitted(
                d, pp, rot, args.width, args.height, max_depth=args.depth,
                spp=args.spp, intersect_fn=isect, occluder_factory=occf,
                chunk_div=args.chunk_div)
            v = img[0, 0, 0]
            return pp + jnp.where(jnp.isfinite(v), v, 0.0) * 0.0, acc + v
        _, acc = jax.lax.fori_loop(0, n, body, (p, jnp.float32(0)))
        return acc

    @jax.jit
    def empty(p):
        def body(i, carry):
            pp, acc = carry
            return pp, acc + pp[0] * 0.0
        _, acc = jax.lax.fori_loop(0, n, body, (p, jnp.float32(0)))
        return acc

    float(run(d, pos))
    float(empty(pos))
    t0 = time.perf_counter()
    float(empty(pos))
    overhead = time.perf_counter() - t0  # fixed dispatch cost (tunnel)
    t0 = time.perf_counter()
    float(run(d, pos))
    dt = (time.perf_counter() - t0 - overhead) / n
    rays = args.width * args.height * args.spp
    print(f"whitted {args.width}x{args.height} depth={args.depth} "
          f"spp={args.spp} tris={args.tris}: {dt*1e3:.1f} ms/frame "
          f"({1/dt:.2f} FPS, {rays/dt/1e6:.1f} Mprimary/s)")


if __name__ == "__main__":
    main()
