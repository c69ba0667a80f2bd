"""Micro-experiments on the fused kernel: machinery vs compute split.

Run on the TPU from the repo root:  python -m tools.kernel_micro

E_all : every scheduled step computes (entry forced to -inf)
E_none: every scheduled step skips   (entry forced to +inf)
E_real: production entries (early-out as deployed)
The difference E_all - E_none is pure compute (matmul + VPU tail); E_none is
step machinery + DMA; E_real shows how much the early-out actually saves.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh.clustered import build_clusters
from directx_raytracer_tpu.bvh.pallas_intersect import (
    TILE_R, VISIT_GROUP, bin_clusters_bits, build_visit_groups_bits,
    planar_mats, planar_mats6, rays_split, _launch,
)
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.rays import generate_rays_tiled, tile_frustum_bounds

WIDTH, HEIGHT = 1920, 1080
BUDGET = 16384


def timed(fn, args, n=5, label=""):
    """fn(eps, *args) — big arrays ride as jit ARGUMENTS (closing over them
    bakes literals into the HLO; the remote compiler 413s past ~200 MB)."""
    @jax.jit
    def run(eps, *args):
        def body(i, carry):
            e, acc = carry
            out = fn(e, *args)
            v = jnp.asarray(out).reshape(-1)[0].astype(jnp.float32)
            return jnp.where(jnp.isfinite(v), v, 0.0) * 0.0, acc + v
        _, acc = jax.lax.fori_loop(0, n, body, (eps, jnp.float32(0)))
        return acc

    float(run(jnp.float32(0), *args))
    t0 = time.perf_counter()
    float(run(jnp.float32(0), *args))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    import sys
    ntris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    print(f"devices: {jax.devices()}", flush=True)
    scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
    dscene = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    pos = jnp.asarray(pos, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)
    geo = dscene.geometry

    cs = build_clusters(geo, k=128)
    w = planar_mats(cs)
    o, d = generate_rays_tiled(pos, rot, WIDTH, HEIGHT, 8, 32)
    bounds = tile_frustum_bounds(pos, rot, WIDTH, HEIGHT, 8, 32)
    n = o.shape[0]
    tiles = n // TILE_R
    g = VISIT_GROUP

    # empirical hull (production since r3: the analytic frustum binned +44%)
    words, cum, entry, counts = jax.jit(bin_clusters_bits)(
        o.reshape(tiles, TILE_R, 3), d.reshape(tiles, TILE_R, 3), cs)
    vt, vcs, vf, ve, rem = jax.jit(build_visit_groups_bits, static_argnames=(
        "budget", "g"))(words, cum, entry, counts, BUDGET, g)
    vt, vf, ve = map(jnp.asarray, (vt, vf, ve))
    print(f"scheduled groups: {int(np.asarray(counts).sum())} clusters "
          f"/ {int(((np.asarray(counts)+g-1)//g).sum())} groups "
          f"(budget {BUDGET})", flush=True)

    rays8 = jnp.concatenate(
        [o, jnp.ones((n, 1), jnp.float32), d, jnp.zeros((n, 1), jnp.float32)],
        axis=1).reshape(tiles, TILE_R, 8).swapaxes(1, 2)  # (T, 8, R)
    rays8 = jnp.concatenate([rays8, jnp.zeros((1, 8, TILE_R), jnp.float32)])
    rays8 = jax.jit(rays_split)(rays8)  # (T+1, 48, R) bf16
    init_t = jnp.concatenate([
        jnp.full((tiles, 1, TILE_R), 10000.0, jnp.float32),
        jnp.zeros((1, 1, TILE_R), jnp.float32)])
    init_slot = jnp.full((tiles + 1, 1, TILE_R), -1, jnp.int32)

    def launch(ve_mode, scheme):
        def f(eps, rays8, init_t, init_slot, vt, vf, ve, w, *vcs):
            if ve_mode == "all":
                vee = jnp.full_like(ve, -1e30)
            elif ve_mode == "none":
                vee = jnp.full_like(ve, 1e30)
            else:
                vee = ve
            bt, bs = _launch(rays8 + eps, init_t, init_slot, vt, list(vcs),
                             vf, vee, w, 128, TILE_R, BUDGET, scheme=scheme)
            return bt[0, 0]
        return f

    n_groups = int(((np.asarray(counts) + g - 1) // g).sum())
    for scheme, ww in [("native", w), ("bary6", jax.jit(planar_mats6)(cs))]:
        args = (rays8, init_t, init_slot, vt, vf, ve, ww) + tuple(vcs)
        t_real = timed(launch("real", scheme), args,
                       label=f"[{scheme}] E_real (production early-out)")
        t_all = timed(launch("all", scheme), args,
                      label=f"[{scheme}] E_all  (every step computes)")
        t_none = timed(launch("none", scheme), args,
                       label=f"[{scheme}] E_none (every step skips)")
        print(f"[{scheme}] machinery/step = {t_none/BUDGET*1e6:8.3f} us")
        print(f"[{scheme}] compute/step (real groups, upper) = "
              f"{(t_all-t_none)/n_groups*1e6:8.3f} us")
        print(f"[{scheme}] early-out saves = "
              f"{(t_all-t_real)/max(t_all,1e-9)*100:6.1f}% of all-compute")


if __name__ == "__main__":
    main()
