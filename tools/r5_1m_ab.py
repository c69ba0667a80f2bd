"""1M-scene schedule-knob sweep under the r5 bary6r + 768-chunk regime
(VERDICT r4 #3 follow-up after the prepass was ruled out).

The r4 optima (g=4, RANK_CAP=128, refill 2048) were measured with bary6 +
256-ray chunks; the r5 regime triples the chunk and cheapens the VPU tail,
which may move them.  Sweeps g x rank-cap at 1M (and optionally 100k).

python -m tools.r5_1m_ab [ntris ...] [--g 4,8] [--cap 128,256,512]
"""
import sys
import time

import jax
import jax.numpy as jnp

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import build_bvh
from directx_raytracer_tpu.bvh.pallas_intersect import _search
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.rays import T_MAX, generate_rays_tiled

WIDTH, HEIGHT = 1920, 1080
TH, TW, TILE_R = 24, 32, 768


def main():
    ntris_list = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1_000_000]
    gs = [4, 8]
    caps = [128, 256, 512]
    if "--g" in sys.argv:
        gs = [int(x) for x in sys.argv[sys.argv.index("--g") + 1].split(",")]
    if "--cap" in sys.argv:
        caps = [int(x) for x in sys.argv[sys.argv.index("--cap") + 1].split(",")]
    kk = 128
    if "--k" in sys.argv:
        kk = int(sys.argv[sys.argv.index("--k") + 1])
    n_frames = 10

    if "--dragon" in sys.argv:
        ntris_list = ["dragon"]

    for ntris in ntris_list:
        print(f"scene {ntris} tris (bary6r, {TH}x{TW}/{TILE_R}):", flush=True)
        if ntris == "dragon":
            from directx_raytracer_tpu.io import crtscene
            scene = crtscene.load(
                "/root/reference/DirectX-RayTracer/DirectX-RayTracer/"
                "Scenes/Dragon.crtscene")
        else:
            scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH,
                                           height=HEIGHT)
        d = build_device_scene(scene)
        bvh = build_bvh(d.geometry, k=kk)
        d.geometry.accel = bvh
        pos, rot = scene.camera.snapshot()
        p = jnp.asarray(pos, jnp.float32)
        r = jnp.asarray(rot, jnp.float32)

        @jax.jit
        def empty(pp):
            def body(i, carry):
                return carry[0], carry[1] + carry[0][0] * 0.0
            _, acc = jax.lax.fori_loop(0, n_frames, body, (pp, jnp.float32(0)))
            return acc

        float(empty(p))
        t0 = time.perf_counter(); float(empty(p))
        ovh = time.perf_counter() - t0

        for g in gs:
            for cap in caps:
                @jax.jit
                def run(ds, pp, g=g, cap=cap):
                    b = ds.geometry.accel

                    def body(i, carry):
                        pp, acc = carry
                        o, dd = generate_rays_tiled(pp, r, WIDTH, HEIGHT, TH, TW)
                        seeds = jnp.full((o.shape[0],), T_MAX, jnp.float32)
                        bt, _ = _search(o, dd, seeds, b.clusters, b.wplanar,
                                        TILE_R, 10240, g=g, cap=cap,
                                        scheme=b.scheme)
                        v = jnp.where(jnp.isfinite(bt[0]), bt[0], 0.0)
                        return pp + v * 0.0, acc + bt[0]
                    _, acc = jax.lax.fori_loop(0, n_frames, body,
                                               (pp, jnp.float32(0)))
                    return acc

                print(f"  [g={g} cap={cap}] compiling...", file=sys.stderr,
                      flush=True)
                float(run(d, p))
                reps = []
                for _ in range(3):  # tunnel variance ~5%: report the spread
                    t0 = time.perf_counter(); float(run(d, p))
                    reps.append((time.perf_counter() - t0 - ovh) / n_frames)
                dt = min(reps)
                print(f"  g={g} cap={cap}: "
                      + " ".join(f"{r*1e3:.2f}" for r in reps)
                      + f" ms  best {WIDTH*HEIGHT/dt/1e6:6.1f} Mrays/s",
                      flush=True)


if __name__ == "__main__":
    main()
