"""A/B the 1080p debug-frame time under controlled variants (no gates).

Usage:  python -m tools.frame_ab [median] [ntris]

``median`` forces the round-2 longest-axis median treelet split (monkey-
patched) so the SAH builder's frame-time effect can be isolated in the
CURRENT compiler environment (the remote service updated mid-round-3, so
historical numbers don't compare).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.models import scene as scene_mod
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.render.debug import render_debug

WIDTH, HEIGHT = 1920, 1080


def median_leaves(v0, e1, e2, k=scene_mod.CLUSTER_K):
    p1, p2 = v0 + e1, v0 + e2
    lo = np.minimum(np.minimum(v0, p1), p2)
    hi = np.maximum(np.maximum(v0, p1), p2)
    cent = (lo + hi) * 0.5
    leaves = []
    stack = [np.arange(len(v0), dtype=np.int64)]
    while stack:
        s = stack.pop()
        if len(s) <= k:
            leaves.append(s)
            continue
        c = cent[s]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        m = len(s) // 2
        part = np.argpartition(c[:, ax], m)
        stack.append(s[part[m:]])
        stack.append(s[part[:m]])
    return leaves


def main():
    variant = "median" if "median" in sys.argv[1:] else "sah"
    ntris = 100_000
    for a in sys.argv[1:]:
        if a.isdigit():
            ntris = int(a)
    if variant == "median":
        scene_mod._np_treelet_leaves = median_leaves
    if "dense" in sys.argv[1:]:
        from directx_raytracer_tpu.bvh import pallas_intersect as pi
        pi.SUPER_MIN_C = 1 << 30  # force the dense binning kernel

    from directx_raytracer_tpu.bvh import build_bvh, make_bvh_intersect_fn

    scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
    d = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    bvh = build_bvh(d.geometry)
    d.geometry.accel = bvh
    ifn = make_bvh_intersect_fn(bvh)
    n_clusters = int(bvh.clusters.aabb_min.shape[0])
    mode = jnp.int32(5)
    n = 10

    @jax.jit
    def run(d, p):
        # the scene rides as a jit ARGUMENT: closing over it would bake
        # wplanar into the HLO as a literal (HTTP 413 past ~200 MB at 1M)
        def body(i, carry):
            p, acc = carry
            img = render_debug(d, p, rot, mode, WIDTH, HEIGHT,
                               intersect_fn=ifn, fetch_record=False)
            v = img[0, 0, 0]
            return p + jnp.where(jnp.isfinite(v), v, 0.0) * 0.0, acc + v
        _, acc = jax.lax.fori_loop(0, n, body, (p, jnp.float32(0)))
        return acc

    @jax.jit
    def empty(p):
        def body(i, carry):
            p, acc = carry
            return p, acc + p[0] * 0.0
        _, acc = jax.lax.fori_loop(0, n, body, (p, jnp.float32(0)))
        return acc

    import sys as _sys
    print("compiling...", file=_sys.stderr, flush=True)
    p = jnp.asarray(pos, jnp.float32)
    float(run(d, p))
    print("compiled", file=_sys.stderr, flush=True)
    float(empty(p))
    t0 = time.perf_counter(); float(empty(p))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(d, p))
    dt = (time.perf_counter() - t0 - ovh) / n
    mrays = WIDTH * HEIGHT / dt / 1e6
    from directx_raytracer_tpu.bvh import _auto_tile_r
    from directx_raytracer_tpu.bvh.pallas_intersect import bin_clusters_bits
    from directx_raytracer_tpu.ops.rays import generate_rays_tiled
    tr = _auto_tile_r(bvh)
    o, dd = generate_rays_tiled(p, jnp.asarray(rot, jnp.float32),
                                WIDTH, HEIGHT, 8, 32)
    tiles = o.shape[0] // tr
    *_, counts = jax.jit(bin_clusters_bits, static_argnames=())(
        o.reshape(tiles, tr, 3), dd.reshape(tiles, tr, 3), bvh.clusters)
    ppr = float(np.asarray(counts).mean()) * bvh.clusters.k
    print(f"{variant} ntris={ntris} C={n_clusters} tile_r={tr}: "
          f"{dt*1e3:.2f} ms/frame = {mrays:.1f} Mrays/s "
          f"pairs/ray={ppr:.0f}", flush=True)


if __name__ == "__main__":
    main()
