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


def kernel_smoke() -> None:
    """Correctness gate: the REAL compiled kernel vs brute force on a small
    scene, run before timing.  A wrong-pixel regression in the Pallas path
    flips this benchmark's exit code (VERDICT r1 next-step #7) instead of
    silently reporting a fast-but-wrong number."""
    import jax.numpy as jnp

    from directx_raytracer_tpu.bvh import build_bvh
    from directx_raytracer_tpu.bvh.pallas_intersect import (
        intersect_pallas, occluded_pallas)
    from directx_raytracer_tpu.ops.intersect import (
        intersect_bruteforce, occluded_bruteforce)
    from directx_raytracer_tpu.ops.rays import generate_rays_tiled

    scene = testscenes.bench_scene(n_tris=3_000, width=64, height=32)
    d = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    o, dd = generate_rays_tiled(jnp.asarray(pos, jnp.float32),
                                jnp.asarray(rot, jnp.float32), 64, 32, 8, 8)
    bvh = build_bvh(d.geometry)
    hp = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, tile_r=256,
                          refine=True)
    hb = intersect_bruteforce(o, dd, d.geometry.woop)
    mp, mb = np.asarray(hp.tri >= 0), np.asarray(hb.tri >= 0)
    # Tolerances match tests_tpu: different f32 evaluation orders disagree
    # on a ~0.2% sliver-edge fringe on real hardware; a real kernel
    # regression (wrong binning, lost hits) mismatches at whole-percent
    # scale and still trips these.
    if (mp == mb).mean() < 0.995:
        raise SystemExit("kernel smoke FAILED: hit/miss mismatch vs brute force")
    both = mp & mb
    if both.any():
        tri_ok = (np.asarray(hp.tri)[both] == np.asarray(hb.tri)[both])
        terr = np.abs(np.asarray(hp.t)[both] - np.asarray(hb.t)[both])
        rel = terr / np.maximum(np.asarray(hb.t)[both], 1.0)
        if tri_ok.mean() < 0.99 or (rel[tri_ok] > 1e-3).mean() > 0.005:
            raise SystemExit("kernel smoke FAILED: winner/t mismatch")
    tmax = np.full(o.shape[0], 25.0, np.float32)
    ob = np.asarray(occluded_bruteforce(o, dd, d.geometry.woop, tmax))
    op = np.asarray(occluded_pallas(o, dd, bvh.clusters, bvh.wplanar,
                                    jnp.asarray(tmax), tile_r=256))
    if (ob == op).mean() < 0.995:
        raise SystemExit("kernel smoke FAILED: occlusion mismatch")


def main():
    kernel_smoke()
    scene = testscenes.bench_scene(n_tris=100_000, width=WIDTH, height=HEIGHT)
    dscene = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    mode = jax.numpy.int32(5)  # distance debug shade: pure intersect + trivial shade

    intersect_fn = None
    builder, fn_factory = best_intersect_fn()
    if builder is not None:
        bvh = builder(dscene.geometry)
        dscene.geometry.accel = bvh  # jit argument, not closure constant
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
                               intersect_fn=intersect_fn,
                               fetch_record=False)  # mode 5: distance only
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
