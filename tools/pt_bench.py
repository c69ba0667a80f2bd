"""Path-tracer hardware timing: ms per 1080p sample (VERDICT r4 #4).

r4 baseline (unchunked full-capacity bounces): 2323 ms/sample on the 100k
bench scene, 710 ms on Dragon, depth 4.  Bar: <= 1200 ms on the 100k scene.

python -m tools.pt_bench [--tris N | --dragon] [--depth 4] [--samples 3]
"""
import argparse
import time

import jax
import jax.numpy as jnp

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import (build_bvh, make_bvh_intersect_fn,
                                        make_bvh_occluder_factory)
from directx_raytracer_tpu.io import crtscene
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.render.pathtrace import pathtrace_tile

DRAGON = "/root/reference/DirectX-RayTracer/DirectX-RayTracer/Scenes/Dragon.crtscene"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--tris", type=int, default=100_000)
    ap.add_argument("--dragon", action="store_true")
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()

    if args.dragon:
        scene = crtscene.load(DRAGON)
        label = "dragon"
    else:
        scene = testscenes.bench_scene(n_tris=args.tris, width=args.width,
                                       height=args.height)
        label = f"{args.tris}tris"
    d = build_device_scene(scene)
    bvh = build_bvh(d.geometry)
    d.geometry.accel = bvh
    isect = make_bvh_intersect_fn(bvh)
    occf = make_bvh_occluder_factory(bvh)
    pos, rot = scene.camera.snapshot()
    pos = jnp.asarray(pos, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)
    n = args.samples

    @jax.jit
    def run(ds, p, key):
        def body(i, carry):
            pp, k, acc = carry
            k, ks = jax.random.split(k)
            rad = pathtrace_tile(ds, pp, rot, ks, args.width, args.height,
                                 max_depth=args.depth, intersect_fn=isect,
                                 occluder_factory=occf)
            v = rad[0, 0]
            return pp + jnp.where(jnp.isfinite(v), v, 0.0) * 0.0, k, acc + v
        _, _, acc = jax.lax.fori_loop(
            0, n, body, (p, key, jnp.float32(0)))
        return acc

    @jax.jit
    def empty(p):
        def body(i, carry):
            return carry[0], carry[1] + carry[0][0] * 0.0
        _, acc = jax.lax.fori_loop(0, n, body, (p, jnp.float32(0)))
        return acc

    key = jax.random.PRNGKey(1)
    print("compiling...", flush=True)
    float(run(d, pos, key))
    float(empty(pos))
    t0 = time.perf_counter(); float(empty(pos))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(d, pos, key))
    dt = (time.perf_counter() - t0 - ovh) / n
    print(f"pt {label} {args.width}x{args.height} depth={args.depth}: "
          f"{dt*1e3:.0f} ms/sample", flush=True)


if __name__ == "__main__":
    main()
