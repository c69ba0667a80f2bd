"""Headline benchmark: Mrays/sec/chip on the 100k-triangle scene at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured Mrays/s divided by the BASELINE.json north-star
target of 500 Mrays/sec/chip (so 1.0 == target met).

The workload mirrors the reference's fixed dispatch (1920x1080 primary rays,
DXRTRenderer.cpp:1348-1350) on the BASELINE bench scene (~100k tris), using
the fastest available intersector (LBVH/Pallas when present, else the MXU
brute-force path).
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.render.debug import render_debug

NORTH_STAR_MRAYS = 500.0
WIDTH, HEIGHT = 1920, 1080


def best_intersect_fn():
    """Fastest intersector available in this build (None = brute force)."""
    try:
        from directx_raytracer_tpu.bvh import build_bvh, make_bvh_intersect_fn
    except ImportError:
        return None, None
    return build_bvh, make_bvh_intersect_fn


def main():
    scene = testscenes.bench_scene(n_tris=100_000, width=WIDTH, height=HEIGHT)
    dscene = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    mode = jax.numpy.int32(5)  # distance debug shade: pure intersect + trivial shade

    intersect_fn = None
    builder, fn_factory = best_intersect_fn()
    if builder is not None:
        bvh = builder(dscene.geometry)
        intersect_fn = fn_factory(bvh)

    import jax.numpy as jnp
    import numpy as _np

    n_frames = 5

    @jax.jit
    def run(pos_in):
        # Frame loop INSIDE one jit: a remote-device tunnel adds 100s of ms
        # of per-dispatch latency, so per-call host timing measures the
        # tunnel, not the chip.  Each frame perturbs the camera with a
        # data-dependent epsilon so no frame can be elided or overlapped.
        def body(i, carry):
            p, acc = carry
            img = render_debug(dscene, p, rot, mode, WIDTH, HEIGHT,
                               intersect_fn=intersect_fn)
            v = img[0, 0, 0]
            eps = jnp.where(jnp.isfinite(v), v, 0.0) * 0.0
            return p + eps, acc + v
        _, acc = jax.lax.fori_loop(0, n_frames, body, (pos_in, jnp.float32(0)))
        return acc

    float(run(jnp.asarray(pos, jnp.float32)))  # compile + warm
    t0 = time.perf_counter()
    float(run(jnp.asarray(pos, jnp.float32)))
    dt = (time.perf_counter() - t0) / n_frames

    n_rays = WIDTH * HEIGHT
    mrays = n_rays / dt / 1e6
    print(json.dumps({
        "metric": "primary_rays_1080p_100k_tris",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
