"""Profile the production debug frame: per-op device time from a
jax.profiler trace (parses the TPU vm.trace.json.gz).

python -m tools.trace_frame [ntris] [--whitted | --pt] [--dragon]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import build_bvh, make_bvh_intersect_fn, make_bvh_occluder_factory
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.render.debug import render_debug
from directx_raytracer_tpu.render.whitted import render_whitted

WIDTH, HEIGHT = 1920, 1080
TRACE_DIR = "/tmp/dxrt_trace"


def main():
    ntris = 100_000
    whitted = "--whitted" in sys.argv[1:]
    pt = "--pt" in sys.argv[1:]
    dragon = "--dragon" in sys.argv[1:]
    for a in sys.argv[1:]:
        if a.isdigit():
            ntris = int(a)
    if dragon:
        from directx_raytracer_tpu.io import crtscene
        scene = crtscene.load(
            "/root/reference/DirectX-RayTracer/DirectX-RayTracer/Scenes/"
            "Dragon.crtscene")
        ntris = scene.total_triangles if hasattr(scene, "total_triangles") else -1
    else:
        scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
    d = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    bvh = build_bvh(d.geometry)
    d.geometry.accel = bvh
    isect = make_bvh_intersect_fn(bvh)
    occf = make_bvh_occluder_factory(bvh)
    p = jnp.asarray(pos, jnp.float32)
    r = jnp.asarray(rot, jnp.float32)
    n = 5

    if pt:
        from directx_raytracer_tpu.render.pathtrace import pathtrace_tile
        key = jax.random.PRNGKey(0)

    @jax.jit
    def run(ds, p):
        def body(i, carry):
            pp, acc = carry
            if pt:
                rad = pathtrace_tile(ds, pp, r, jax.random.fold_in(key, i),
                                     WIDTH, HEIGHT, max_depth=4,
                                     intersect_fn=isect,
                                     occluder_factory=occf)
                img = rad[None]
            elif whitted:
                img, _ = render_whitted(ds, pp, r, WIDTH, HEIGHT, max_depth=3,
                                        intersect_fn=isect,
                                        occluder_factory=occf)
            else:
                img = render_debug(ds, pp, r, 5, WIDTH, HEIGHT,
                                   intersect_fn=isect, fetch_record=False)
            v = img[0, 0, 0]
            eps = jnp.where(jnp.isfinite(v), v, 0.0) * 1e-12
            return pp + eps, acc + v
        _, acc = jax.lax.fori_loop(0, n, body, (p, jnp.float32(0)))
        return acc

    print("compiling...", file=sys.stderr, flush=True)
    float(run(d, p))
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        float(run(d, p))

    # ---- parse ----
    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    agg = defaultdict(float)
    total = 0.0
    for path in paths:
        with gzip.open(path, "rt") as f:
            tr = json.load(f)
        # device-side complete events: pick pids whose process name mentions
        # TPU/device; fall back to all 'X' events with 'dur'.
        pid_name = {}
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_name[ev.get("pid")] = ev.get("args", {}).get("name", "")
        srcs = {}
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pname = pid_name.get(ev.get("pid"), "")
            if "TPU" not in pname and "/device" not in pname.lower():
                continue
            name = ev.get("name", "?")
            dur = ev.get("dur", 0) / 1e3  # us -> ms
            agg[name] += dur
            total += dur
            if name not in srcs:
                a = ev.get("args", {})
                src = a.get("source", "")
                shape = ""
                ln = a.get("long_name", "")
                if "= " in ln:
                    shape = ln.split("= ", 1)[1].split(" ", 1)[0]
                srcs[name] = f"{shape} {src}".strip()
    items = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"ntris={ntris} whitted={whitted} pt={pt} frames={n} "
          f"(durations are totals over {n} frames)")
    for name, ms in items[:30]:
        print(f"  {ms/n:9.3f} ms/frame  {name[:28]:28s} "
              f"{srcs.get(name, '')[:90]}")
    print(f"  {'':9s} total device {total/n:.2f} ms/frame")


if __name__ == "__main__":
    main()
