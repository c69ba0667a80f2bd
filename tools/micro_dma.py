"""Pin down the kernel's per-step FIXED machinery vs real DMA cost.

All runs force entry = +inf (no compute).  Variants:
  real_ids  — production schedule (every real step fetches new blocks)
  same_ids  — every sub-visit points at cluster 0 and tile 0 (revisit-skip
              should eliminate ALL copies after step 0: pure machinery)
  same_w    — cluster ids constant, tiles real (isolates the rays/output
              block traffic)

python -m tools.micro_dma [ntris]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh.clustered import build_clusters
from directx_raytracer_tpu.bvh.pallas_intersect import (
    TILE_R, VISIT_GROUP, bin_clusters_bits, build_visit_groups_bits,
    planar_mats, rays_split, _launch,
)
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.rays import generate_rays_tiled

WIDTH, HEIGHT = 1920, 1080
BUDGET = 16384


def timed(fn, args, n=10, label=""):
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
    print(f"{label:44s} {dt*1e3:9.2f} ms = {dt/BUDGET*1e6:6.3f} us/step",
          flush=True)
    return dt


def main():
    ntris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    print(f"devices: {jax.devices()}", flush=True)
    scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
    dscene = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    geo = dscene.geometry

    cs = build_clusters(geo, k=128)
    w = jax.jit(planar_mats)(cs)
    o, d = generate_rays_tiled(jnp.asarray(pos, jnp.float32),
                               jnp.asarray(rot, jnp.float32),
                               WIDTH, HEIGHT, 8, 32)
    n = o.shape[0]
    tiles = n // TILE_R
    g = VISIT_GROUP

    words, cum, entry, counts = jax.jit(bin_clusters_bits)(
        o.reshape(tiles, TILE_R, 3), d.reshape(tiles, TILE_R, 3), cs)
    vt, vcs, vf, ve, _ = jax.jit(build_visit_groups_bits, static_argnames=(
        "budget", "g"))(words, cum, entry, counts, BUDGET, g)
    vt, vf = jnp.asarray(vt), jnp.asarray(vf)
    ve_none = jnp.full_like(jnp.asarray(ve), 1e30)

    rays8 = jnp.concatenate(
        [o, jnp.ones((n, 1), jnp.float32), d, jnp.zeros((n, 1), jnp.float32)],
        axis=1).reshape(tiles, TILE_R, 8).swapaxes(1, 2)
    rays8 = jnp.concatenate([rays8, jnp.zeros((1, 8, TILE_R), jnp.float32)])
    rays8 = jax.jit(rays_split)(rays8)
    init_t = jnp.concatenate([
        jnp.full((tiles, 1, TILE_R), 10000.0, jnp.float32),
        jnp.zeros((1, 1, TILE_R), jnp.float32)])
    init_slot = jnp.full((tiles + 1, 1, TILE_R), -1, jnp.int32)

    def f(eps, rays8, init_t, init_slot, vt, vf, ve, w, *vcs):
        bt, _ = _launch(rays8 + eps, init_t, init_slot, vt, list(vcs),
                        vf, ve, w, 128, TILE_R, BUDGET)
        return bt[0, 0]

    zero_ids = [jnp.zeros((BUDGET,), jnp.int32) for _ in range(g)]
    zero_t = jnp.zeros((BUDGET,), jnp.int32)

    t_real = timed(f, (rays8, init_t, init_slot, vt, vf, ve_none, w)
                   + tuple(vcs), label="real_ids (DMA + machinery)")
    t_same = timed(f, (rays8, init_t, init_slot, zero_t, vf, ve_none, w)
                   + tuple(zero_ids), label="same_ids (pure machinery)")
    t_same_w = timed(f, (rays8, init_t, init_slot, vt, vf, ve_none, w)
                     + tuple(zero_ids), label="same_w (machinery + ray DMA)")
    print(f"cluster DMA/step   = {(t_real-t_same_w)/BUDGET*1e6:7.3f} us")
    print(f"ray+out DMA/step   = {(t_same_w-t_same)/BUDGET*1e6:7.3f} us")
    print(f"fixed machinery    = {t_same/BUDGET*1e6:7.3f} us")


if __name__ == "__main__":
    main()
