"""A/B the kernel's MXU operand schemes (DMA vs pass-count trade).

The production "native" scheme fetches a 48-row bf16 split stack per
cluster (98 KB DMA, one MXU pass, exact).  The f32 schemes fetch the raw
(8, 8k) f32 operand (32 KB — 3x less DMA) and pay MXU passes instead:
Precision.HIGH = 3-pass bf16x3 (~2-split accuracy), HIGHEST = 6-pass
(exact), DEFAULT = 1-pass bf16 (accuracy-leaky; pure DMA-ceiling probe).

Run on the TPU from the repo root:  python -m tools.dma_ab [ntris]
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
    planar_mats, planar_mats6, planar_mats_f32, rays_split, _launch,
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
    print(f"{label:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    ntris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    print(f"devices: {jax.devices()}", flush=True)
    scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
    dscene = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    geo = dscene.geometry

    cs = build_clusters(geo, k=128)
    w_split = jax.jit(planar_mats)(cs)
    w_b6 = jax.jit(planar_mats6)(cs)
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
    vt, vf, ve = map(jnp.asarray, (vt, vf, ve))
    groups = int(((np.asarray(counts) + g - 1) // g).sum())
    print(f"scheduled: {groups} groups (budget {BUDGET})", flush=True)

    rays8_f32 = jnp.concatenate(
        [o, jnp.ones((n, 1), jnp.float32), d, jnp.zeros((n, 1), jnp.float32)],
        axis=1).reshape(tiles, TILE_R, 8).swapaxes(1, 2)
    rays8_f32 = jnp.concatenate(
        [rays8_f32, jnp.zeros((1, 8, TILE_R), jnp.float32)])
    rays48 = jax.jit(rays_split)(rays8_f32)
    init_t = jnp.concatenate([
        jnp.full((tiles, 1, TILE_R), 10000.0, jnp.float32),
        jnp.zeros((1, 1, TILE_R), jnp.float32)])
    init_slot = jnp.full((tiles + 1, 1, TILE_R), -1, jnp.int32)

    def launch(scheme):
        def f(eps, rays, init_t, init_slot, vt, vf, ve, w, *vcs):
            bt, bs = _launch(rays + eps, init_t, init_slot, vt, list(vcs),
                             vf, ve, w, 128, TILE_R, BUDGET, scheme=scheme)
            return bt[0, 0]
        return f

    def full(scheme, rays, w):
        return jax.jit(_launch, static_argnames=(
            "k", "tile_r", "budget", "scheme"))(
            rays, init_t, init_slot, vt, vcs, vf, ve, w,
            128, TILE_R, BUDGET, scheme=scheme)

    bt0, bs0 = full("native", rays48, w_split)
    bt0, bs0 = np.asarray(bt0[:tiles]), np.asarray(bs0[:tiles])
    results = {}
    # "depth24" is a TIMING-ONLY probe (wrong values: the truncated stacks
    # drop the mid/lo cross terms): it answers VERDICT r4 #6 — does a
    # bf16x2-style 24-row contraction beat the 48-row split, or is depth
    # <= 128 free through the systolic array as the planar_split docstring
    # claims?  Row slices keep the (8k, R) output/tail identical.
    for scheme, rays, w in [("native", rays48, w_split),
                            ("bary6", rays48, w_b6),
                            ("depth24", rays48[:, :24], w_split[:, :24]),
                            ("depth32", rays48[:, :32], w_split[:, :32]),
                            ("depth16", rays48[:, :16], w_split[:, :16]),
                            ("depth8", rays8_f32.astype(jnp.bfloat16),
                             w_split[:, :8])]:
        kernel_scheme = "native" if scheme.startswith("depth") else scheme
        args = (rays, init_t, init_slot, vt, vf, ve, w) + tuple(vcs)
        dt = timed(launch(kernel_scheme), args, label=f"{scheme}")
        bt, bs = full(kernel_scheme, rays, w)
        bt, bs = np.asarray(bt[:tiles]), np.asarray(bs[:tiles])
        mism = float((bs != bs0).mean())
        terr = float(np.nanmax(np.abs(np.where(np.isfinite(bt0),
                                               bt - bt0, 0.0))))
        results[scheme] = dt
        print(f"    vs native: slot mismatch {mism*100:.4f}%  "
              f"max |dt| {terr:.3e}", flush=True)
    base = results["native"]
    for s, dt in results.items():
        print(f"  {s}: {base/dt:.3f}x of native", flush=True)


if __name__ == "__main__":
    main()
