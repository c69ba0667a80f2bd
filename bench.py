"""Headline benchmark: Mrays/sec/chip on the 100k-triangle scene at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", plus the
honesty instrumentation of VERDICT r2 #4: "pairs_per_ray", "est_mfu",
"breakdown_ms"}.  vs_baseline is measured Mrays/s divided by the
BASELINE.json north-star target of 500 Mrays/sec/chip (1.0 == target met).

The workload mirrors the reference's fixed dispatch (1920x1080 primary rays,
DXRTRenderer.cpp:1348-1350) on the BASELINE bench scene (~100k tris), using
the fastest available intersector (LBVH/Pallas when present, else the MXU
brute-force path).

Timing methodology: frames loop inside ONE jit (the axon tunnel adds a
~30-40 ms dispatch round trip which block_until_ready does not see), and the
fixed per-dispatch overhead is measured with an empty chained loop of the
same shape and subtracted — round 2's numbers silently included overhead/n
(~7 ms/frame at n=5), understating real throughput.

Correctness gates run BEFORE timing and flip the exit code on failure:
  * kernel vs brute force on a random scene (hit/miss, winner, t);
  * occlusion kernel vs brute force;
  * a TPU-rendered 192x108 Dragon golden tile (geometric modes 3-6, which
    are cross-backend deterministic) against the CPU-pinned golden — wrong-
    PIXEL kernel drift fails the bench, not just wrong hit stats.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np


def _stage(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


PROBE_TIMEOUT_S = int(os.environ.get("DXRT_BENCH_PROBE_TIMEOUT", "150"))
PROBE_RETRIES = 3
RUN_DEADLINE_S = int(os.environ.get("DXRT_BENCH_DEADLINE", "3000"))


def _fail_line(reason: str) -> None:
    """A machine-parseable failure line (the driver records stdout): value
    None + an explicit error beats a hung process with empty output."""
    print(json.dumps({
        "metric": "primary_rays_1080p_100k_tris", "value": None,
        "unit": "Mrays/s/chip", "error": reason,
    }), flush=True)


def probe_device_or_die() -> None:
    """Wedge-proofing (round 3 lost its headline to a hung axon tunnel):
    backend init is attempted in a SUBPROCESS with a hard timeout and
    bounded retries, so a wedged tunnel yields a clear non-zero exit with
    a "TPU unavailable" line instead of an unbounded hang.

    Must run BEFORE anything initializes the backend in this process —
    package imports touch the backend, so main() imports lazily after this.
    """
    import subprocess
    code = "import jax; print(jax.devices())"
    delay = 20.0
    for attempt in range(1, PROBE_RETRIES + 1):
        _stage(f"device probe (attempt {attempt}/{PROBE_RETRIES}, "
               f"timeout {PROBE_TIMEOUT_S}s)")
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=PROBE_TIMEOUT_S)
            if r.returncode == 0 and r.stdout.strip():
                _stage(f"device probe ok: {r.stdout.strip().splitlines()[-1]}")
                return
            tail = (r.stderr or "").strip().splitlines()
            _stage("device probe failed: "
                   + (tail[-1] if tail else f"rc={r.returncode}"))
        except subprocess.TimeoutExpired:
            _stage(f"device probe TIMED OUT after {PROBE_TIMEOUT_S}s "
                   "(tunnel wedged?)")
        if attempt < PROBE_RETRIES:
            time.sleep(delay)
            delay *= 2
    _fail_line("TPU unavailable: device probe failed "
               f"({PROBE_RETRIES} attempts x {PROBE_TIMEOUT_S}s)")
    raise SystemExit(2)


def _arm_watchdog() -> None:
    """Belt-and-suspenders: if the run itself wedges past the probe (e.g. a
    hung remote compile), emit the failure line and hard-exit instead of
    hanging the driver's capture window."""
    import threading

    def boom():
        _fail_line(f"bench exceeded {RUN_DEADLINE_S}s deadline "
                   "(hung compile or wedged tunnel)")
        os._exit(3)

    t = threading.Timer(RUN_DEADLINE_S, boom)
    t.daemon = True
    t.start()


NORTH_STAR_MRAYS = 500.0
WIDTH, HEIGHT = 1920, 1080
MXU_PEAK_FLOPS = 197e12  # v5e bf16 peak; the kernel's matmuls run f32(HIGH)
VPU_TAIL_OPS_PER_PAIR = 13  # divide + 2 fma + w' + min tree + packed fold
DRAGON = "/root/reference/DirectX-RayTracer/DirectX-RayTracer/Scenes/Dragon.crtscene"
GOLDENS = os.path.join(os.path.dirname(__file__), "tests", "goldens",
                       "dragon_192x108.npz")


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

    from directx_raytracer_tpu import testscenes
    from directx_raytracer_tpu.bvh import build_bvh
    from directx_raytracer_tpu.bvh.pallas_intersect import (
        intersect_pallas, occluded_pallas)
    from directx_raytracer_tpu.models.scene import build_device_scene
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


def golden_tile_gate() -> None:
    """Render the 192x108 Dragon debug tile with the PRODUCTION intersector
    on this backend and compare the cross-backend-deterministic geometric
    modes (3-6, debug_shading.py precision note) to the CPU-pinned golden
    (VERDICT r2 next-step #6).  Skips quietly if the reference asset or the
    golden file is missing."""
    if not (os.path.exists(DRAGON) and os.path.exists(GOLDENS)):
        return
    import jax.numpy as jnp

    from directx_raytracer_tpu.bvh import build_bvh, make_bvh_intersect_fn
    from directx_raytracer_tpu.io import crtscene
    from directx_raytracer_tpu.models.scene import build_device_scene
    from directx_raytracer_tpu.render.debug import render_debug
    from directx_raytracer_tpu.utils.image import to_u8

    scene = crtscene.load(DRAGON)
    d = build_device_scene(scene)
    bvh = build_bvh(d.geometry)
    d.geometry.accel = bvh
    ifn = make_bvh_intersect_fn(bvh)
    pos, rot = scene.camera.snapshot()
    gold = np.load(GOLDENS)
    for mode in (3, 4, 5, 6):
        img = to_u8(np.asarray(render_debug(
            d, pos, rot, jnp.int32(mode), 192, 108, intersect_fn=ifn,
            fetch_record=(mode <= 3))))
        bad = (np.abs(img.astype(int) - gold[f"debug{mode}"].astype(int))
               > 2).any(axis=-1).mean()
        # Kernel-vs-XLA fringe on sliver edges stays well under 1%; a
        # wrong-image regression (bad binning, broken raygen) is 10-100x.
        if bad > 0.01:
            raise SystemExit(
                f"golden tile gate FAILED: mode {mode} differs on "
                f"{bad:.2%} of pixels")


def main():
    probe_device_or_die()
    _arm_watchdog()
    # Imports AFTER the probe: importing package modules initializes the
    # backend, which is exactly the call that hangs on a wedged tunnel.
    from directx_raytracer_tpu import testscenes
    from directx_raytracer_tpu.models.scene import build_device_scene
    from directx_raytracer_tpu.render.debug import render_debug

    _stage("kernel smoke")
    kernel_smoke()
    _stage("golden tile gate")
    golden_tile_gate()
    _stage("building 100k scene")
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

    n_frames = 20

    @jax.jit
    def run(ds, pos_in):
        # Frame loop INSIDE one jit: a remote-device tunnel adds 100s of ms
        # of per-dispatch latency, so per-call host timing measures the
        # tunnel, not the chip.  Each frame perturbs the camera with a
        # data-dependent epsilon so no frame can be elided or overlapped.
        # The scene rides as a jit ARGUMENT — a closure would bake wplanar
        # into the HLO as a literal (remote compile rejects ~200 MB bodies).
        def body(i, carry):
            p, acc = carry
            img = render_debug(ds, p, rot, mode, WIDTH, HEIGHT,
                               intersect_fn=intersect_fn,
                               fetch_record=False)  # mode 5: distance only
            v = img[0, 0, 0]
            eps = jnp.where(jnp.isfinite(v), v, 0.0) * 0.0
            return p + eps, acc + v
        _, acc = jax.lax.fori_loop(0, n_frames, body, (pos_in, jnp.float32(0)))
        return acc

    @jax.jit
    def empty(pos_in):
        # Same dispatch shape, trivial body: measures the fixed per-dispatch
        # overhead (tunnel round trip + launch) to subtract from frame time.
        def body(i, carry):
            p, acc = carry
            return p, acc + p[0] * 0.0
        _, acc = jax.lax.fori_loop(0, n_frames, body, (pos_in, jnp.float32(0)))
        return acc

    p = jnp.asarray(pos, jnp.float32)
    _stage("compiling frame loop")
    float(run(dscene, p))  # compile + warm
    _stage("timing")
    float(empty(p))
    t0 = time.perf_counter()
    float(empty(p))
    overhead = time.perf_counter() - t0  # whole-dispatch fixed cost
    t0 = time.perf_counter()
    float(run(dscene, p))
    dt = (time.perf_counter() - t0 - overhead) / n_frames

    # Honesty instrumentation: scheduled pairs/ray from the production
    # binner, and the MFU those pairs' Woop matmuls represent.
    pairs_per_ray = mfu = mfu_useful = vpu_tail_gops = None
    breakdown = {"dispatch_overhead_ms": round(overhead * 1e3, 2)}
    try:
        from directx_raytracer_tpu.bvh.pallas_intersect import bin_clusters_bits
        from directx_raytracer_tpu.ops.rays import (generate_rays_tiled,
                                                    pick_schedule)

        (th, tw), tile_r = pick_schedule(HEIGHT, WIDTH)
        o, dd = generate_rays_tiled(p, jnp.asarray(rot, jnp.float32),
                                    WIDTH, HEIGHT, th, tw)
        tiles = o.shape[0] // tile_r
        cs = bvh.clusters
        # bounds=None: the production path uses the binner's empirical hull
        # (the analytic corner frustum binned +44% pairs — tools/tile_ab.py)
        *_, counts = jax.jit(bin_clusters_bits)(
            o.reshape(tiles, tile_r, 3), dd.reshape(tiles, tile_r, 3), cs)
        pairs_per_ray = float(np.asarray(counts).mean()) * cs.k
        # physical MXU work per pair: 8 planar output rows x K=48 bf16-split
        # contraction x 2 flops/MAC (see planar_mats/planar_split)
        flops_per_frame = pairs_per_ray * WIDTH * HEIGHT * 768.0
        mfu = flops_per_frame / dt / MXU_PEAK_FLOPS
        # USEFUL work is 1/6 of the physical number: the bf16x3 split runs
        # a 48-deep contraction to reconstruct one 8-deep f32-grade Woop
        # product (VERDICT r4 weak #4 — report both so the MFU is honest).
        mfu_useful = mfu / 6.0
        # The frame's dominant cost is the kernel's per-pair VPU tail
        # (~13 elementwise ops/pair: divide, 2x fma barycentrics, w', min
        # tree, packed fold — r4 kernel_micro).  Report its implied issue
        # rate so the ceiling arithmetic is auditable from this line alone.
        vpu_tail_gops = (pairs_per_ray * WIDTH * HEIGHT
                         * VPU_TAIL_OPS_PER_PAIR / dt / 1e9)
        breakdown["frame_ms"] = round(dt * 1e3, 2)
    except Exception:
        pass

    n_rays = WIDTH * HEIGHT
    mrays = n_rays / dt / 1e6
    out = {
        "metric": "primary_rays_1080p_100k_tris",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
    }
    if pairs_per_ray is not None:
        out["pairs_per_ray"] = round(pairs_per_ray, 1)
        out["est_mfu"] = round(mfu, 5)
        out["est_mfu_useful"] = round(mfu_useful, 5)
        out["vpu_tail_gops"] = round(vpu_tail_gops, 1)
        out["breakdown_ms"] = breakdown

    # Second metric of record (VERDICT r3 #8): full Whitted 1080p frame —
    # depth 3, 4 lights, 100k tris, the workload the reference parses for
    # but never executes (SURVEY.md fact #2).  Reuses the same scene, BVH
    # and overhead-subtraction methodology as the primary number.
    try:
        from directx_raytracer_tpu.bvh import make_bvh_occluder_factory
        from directx_raytracer_tpu.render import render_whitted

        occf = make_bvh_occluder_factory(bvh)
        nw = 5

        @jax.jit
        def run_w(ds, pos_in):
            def body(i, carry):
                p2, acc = carry
                img, _ = render_whitted(ds, p2, rot, WIDTH, HEIGHT,
                                        max_depth=3, spp=1,
                                        intersect_fn=intersect_fn,
                                        occluder_factory=occf)
                v = img[0, 0, 0]
                return p2 + jnp.where(jnp.isfinite(v), v, 0.0) * 0.0, acc + v
            _, acc = jax.lax.fori_loop(0, nw, body, (pos_in, jnp.float32(0)))
            return acc

        _stage("compiling whitted loop")
        float(run_w(dscene, p))
        _stage("timing whitted")
        t0 = time.perf_counter()
        float(run_w(dscene, p))
        dt_w = (time.perf_counter() - t0 - overhead) / nw
        out["whitted_1080p_ms"] = round(dt_w * 1e3, 1)
    except Exception as e:  # never lose the headline to the second metric
        out["whitted_1080p_ms"] = None
        out["whitted_error"] = f"{type(e).__name__}: {e}"[:200]

    # Fourth metric: the 1M-triangle primary dispatch (BASELINE config 4's
    # scale; VERDICT r1 bar) — same methodology as the headline.
    try:
        if builder is not None:
            _stage("building 1M scene")
            scene1m = testscenes.bench_scene(n_tris=1_000_000, width=WIDTH,
                                             height=HEIGHT)
            ds1m = build_device_scene(scene1m)
            bvh1m = builder(ds1m.geometry)
            ds1m.geometry.accel = bvh1m
            ifn1m = fn_factory(bvh1m)
            mpos, mrot = scene1m.camera.snapshot()
            mp = jnp.asarray(mpos, jnp.float32)
            nm = 10

            @jax.jit
            def run_m(ds, pos_in):
                def body(i, carry):
                    p2, acc = carry
                    img = render_debug(ds, p2, mrot, mode, WIDTH, HEIGHT,
                                       intersect_fn=ifn1m,
                                       fetch_record=False)
                    v = img[0, 0, 0]
                    return (p2 + jnp.where(jnp.isfinite(v), v, 0.0) * 0.0,
                            acc + v)
                _, acc = jax.lax.fori_loop(0, nm, body,
                                           (pos_in, jnp.float32(0)))
                return acc

            _stage("compiling 1M loop")
            float(run_m(ds1m, mp))
            _stage("timing 1M")
            t0 = time.perf_counter()
            float(run_m(ds1m, mp))
            dt_m = (time.perf_counter() - t0 - overhead) / nm
            out["mrays_1m_tris"] = round(n_rays / dt_m / 1e6, 1)
    except Exception as e:  # never lose the headline to an extra metric
        out["mrays_1m_error"] = f"{type(e).__name__}: {e}"[:200]

    # Third metric: the reference's OWN headline dispatch — the shipped
    # Dragon.crtscene at its native 1920x1080 (DXRTRenderer.cpp:1348-1350,
    # Scenes/Dragon.crtscene) through the production intersector.
    try:
        if os.path.exists(DRAGON) and builder is not None:
            from directx_raytracer_tpu.io import crtscene

            dragon = crtscene.load(DRAGON)
            ddragon = build_device_scene(dragon)
            dbvh = builder(ddragon.geometry)
            ddragon.geometry.accel = dbvh
            d_ifn = fn_factory(dbvh)
            dpos, drot = dragon.camera.snapshot()
            dp = jnp.asarray(dpos, jnp.float32)

            @jax.jit
            def run_d(ds, pos_in):
                def body(i, carry):
                    p2, acc = carry
                    img = render_debug(ds, p2, drot, mode, WIDTH, HEIGHT,
                                       intersect_fn=d_ifn,
                                       fetch_record=False)
                    v = img[0, 0, 0]
                    return (p2 + jnp.where(jnp.isfinite(v), v, 0.0) * 0.0,
                            acc + v)
                _, acc = jax.lax.fori_loop(0, n_frames, body,
                                           (pos_in, jnp.float32(0)))
                return acc

            _stage("compiling dragon loop")
            float(run_d(ddragon, dp))
            _stage("timing dragon")
            t0 = time.perf_counter()
            float(run_d(ddragon, dp))
            dt_d = (time.perf_counter() - t0 - overhead) / n_frames
            out["dragon_1080p_mrays"] = round(n_rays / dt_d / 1e6, 1)
    except Exception as e:
        out["dragon_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
