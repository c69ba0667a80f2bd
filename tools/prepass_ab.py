"""Round-5 depth-prepass A/B (VERDICT r4 #3): attack 1M depth complexity.

At 1M tris the schedule bins ~800 pairs/ray and 85% of visits execute —
depth complexity, not binning slack (r4 subtile_ab / exec_stats).  The
untried lever: a cheap low-res primary pass whose carried best_t (hit t,
or scene-exit t on miss — ALWAYS a per-ray upper bound for that ray) is
dilated into per-tile caps for the full-res pass, feeding

  (a) per-ray ``t_init`` seeds (sharpens the kernel's per-step early-out
      with zero schedule change), and
  (b) the scheduler-level ``bin_clusters_bits`` ``t_cap`` (clusters whose
      conservative entry exceeds the cap are never scheduled at all).

The caps are APPROXIMATE for rays between prepass samples (a full-res ray
can slip through a crack the 4x4-strided samples covered): the A/B reports
exact slot agreement alongside the timing so the accuracy cost is ruled in
or out with the speed.

Variants:
  ctl      production one-shot _search (scene-exit seeds only)
  seed     + per-ray t_init from the dilated prepass caps
  seedcap  + per-tile schedule t_cap as well

Usage: python -m tools.prepass_ab [ntris ...] [--stride N] [--slack S]
Defaults: 1000000 (also try 100000), stride 4, slack = *1.01 + 0.05.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import build_bvh
from directx_raytracer_tpu.bvh.pallas_intersect import _search, bin_clusters_bits
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.rays import T_MAX

WIDTH, HEIGHT = 1920, 1080
# The production primary schedule (ops.rays.pick_schedule at 1080p).
TILE_H, TILE_W, TILE_R = 24, 32, 768


def lowres_rays(pos, rot, stride: int):
    """Stride-subsampled primary rays in 8x32 tile-major order over the
    low-res grid (rows clamp-padded to a multiple of 8), + the grid shape.

    Same camera math as ops.rays.generate_rays_tiled, with the sample at
    the center of each stride x stride block of the FULL-res pixel grid.
    """
    lw, lh = WIDTH // stride, HEIGHT // stride
    ty_n, tx_n = -(-lh // TILE_H), lw // TILE_W
    n = ty_n * tx_n * TILE_H * TILE_W
    i = jnp.arange(n, dtype=jnp.int32)
    rx = i % TILE_W
    t1 = i // TILE_W
    ry = t1 % TILE_H
    t2 = t1 // TILE_H
    tx = t2 % tx_n
    ty = t2 // tx_n
    lx = tx * TILE_W + rx
    ly = jnp.minimum(ty * TILE_H + ry, lh - 1)  # clamp the padded rows
    px = lx.astype(jnp.float32) * stride + (stride - 1) * 0.5
    py = ly.astype(jnp.float32) * stride + (stride - 1) * 0.5

    x = (2.0 * ((px + 0.5) / WIDTH) - 1.0) * (WIDTH / HEIGHT)
    y = 1.0 - 2.0 * ((py + 0.5) / HEIGHT)
    inv_len = jax.lax.rsqrt(x * x + y * y + 1.0)
    dx, dy, dz = x * inv_len, y * inv_len, -inv_len
    wx = rot[0, 0] * dx + rot[0, 1] * dy + rot[0, 2] * dz
    wy = rot[1, 0] * dx + rot[1, 1] * dy + rot[1, 2] * dz
    wz = rot[2, 0] * dx + rot[2, 1] * dy + rot[2, 2] * dz
    o = jnp.broadcast_to(pos[None, :], (n, 3))
    d = jnp.stack([wx, wy, wz], axis=1)
    return o, d, (lh, lw, ty_n, tx_n)


def tile_caps(low_t, grid, stride: int, slack_mul: float, slack_add: float):
    """Dilated per-full-res-tile caps from the low-res carried best_t."""
    lh, lw, ty_n, tx_n = grid
    raster = low_t.reshape(ty_n, tx_n, TILE_H, TILE_W).transpose(
        0, 2, 1, 3).reshape(ty_n * TILE_H, tx_n * TILE_W)[:lh, :lw]
    # Full tile (ty, tx) covers low rows [th/stride * ty, ...), cols
    # likewise; dilate one low-res pixel on every side.
    bh, bw = TILE_H // stride, TILE_W // stride
    assert bh >= 1 and bw >= 1, (TILE_H, TILE_W, stride)
    padded = jnp.pad(raster, 1, mode="edge")
    pooled = jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max,
        window_dimensions=(bh + 2, bw + 2),
        window_strides=(bh, bw), padding="VALID")
    fty, ftx = HEIGHT // TILE_H, WIDTH // TILE_W
    pooled = pooled[:fty, :ftx]
    return (pooled * slack_mul + slack_add).reshape(-1)


def main():
    ntris_list = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1_000_000]
    stride = 4
    slack_mul, slack_add = 1.01, 0.05
    if "--stride" in sys.argv:
        stride = int(sys.argv[sys.argv.index("--stride") + 1])
    n_frames = 10

    for ntris in ntris_list:
        print(f"scene {ntris} tris:", flush=True)
        scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
        d = build_device_scene(scene)
        bvh = build_bvh(d.geometry)
        d.geometry.accel = bvh
        pos, rot = scene.camera.snapshot()
        p = jnp.asarray(pos, jnp.float32)
        r = jnp.asarray(rot, jnp.float32)

        from directx_raytracer_tpu.ops.rays import generate_rays_tiled

        def full_rays(pp):
            return generate_rays_tiled(pp, r, WIDTH, HEIGHT, TILE_H, TILE_W)

        def prepass_caps(pp, ds):
            b = ds.geometry.accel
            lo, ld, grid = lowres_rays(pp, r, stride)
            lt = jnp.full((lo.shape[0],), T_MAX, jnp.float32)
            low_t, _ = _search(lo, ld, lt, b.clusters, b.wplanar, TILE_R,
                               10240, scheme=b.scheme)
            return tile_caps(low_t, grid, stride, slack_mul, slack_add)

        def make_run(variant):
            @jax.jit
            def run(ds, pp):
                b = ds.geometry.accel

                def body(i, carry):
                    pp, acc = carry
                    o, dd = full_rays(pp)
                    if variant == "ctl":
                        seeds = jnp.full((o.shape[0],), T_MAX, jnp.float32)
                        cap = None
                    else:
                        caps = prepass_caps(pp, ds)
                        seeds = jnp.repeat(caps, TILE_R)
                        cap = caps if variant == "seedcap" else None
                    bt, _ = _search(o, dd, seeds, b.clusters, b.wplanar,
                                    TILE_R, 10240, scheme=b.scheme,
                                    t_cap=cap)
                    v = jnp.where(jnp.isfinite(bt[0]), bt[0], 0.0)
                    return pp + v * 0.0, acc + bt[0]
                _, acc = jax.lax.fori_loop(0, n_frames, body,
                                           (pp, jnp.float32(0)))
                return acc
            return run

        @jax.jit
        def empty(pp):
            def body(i, carry):
                return carry[0], carry[1] + carry[0][0] * 0.0
            _, acc = jax.lax.fori_loop(0, n_frames, body,
                                       (pp, jnp.float32(0)))
            return acc

        float(empty(p))
        t0 = time.perf_counter(); float(empty(p))
        ovh = time.perf_counter() - t0

        times = {}
        for variant in ("ctl", "seed", "seedcap"):
            run = make_run(variant)
            print(f"  [{variant}] compiling...", file=sys.stderr, flush=True)
            float(run(d, p))
            t0 = time.perf_counter(); float(run(d, p))
            dt = (time.perf_counter() - t0 - ovh) / n_frames
            times[variant] = dt
            print(f"  {variant}: {dt*1e3:7.2f} ms  "
                  f"{WIDTH*HEIGHT/dt/1e6:6.1f} Mrays/s", flush=True)

        # Exactness + schedule-size audit (one frame, uncached host side).
        o, dd = full_rays(p)
        seeds0 = jnp.full((o.shape[0],), T_MAX, jnp.float32)
        bt0, bs0 = jax.jit(_search, static_argnames=(
            "tile_r", "budget", "scheme"))(
            o, dd, seeds0, bvh.clusters, bvh.wplanar, TILE_R, 10240,
            scheme=bvh.scheme)
        caps = jax.jit(prepass_caps)(p, d)
        seeds = jnp.repeat(caps, TILE_R)
        for variant, cap in (("seed", None), ("seedcap", caps)):
            bt1, bs1 = jax.jit(_search, static_argnames=(
                "tile_r", "budget", "scheme"))(
                o, dd, seeds, bvh.clusters, bvh.wplanar, TILE_R, 10240,
                scheme=bvh.scheme, t_cap=cap)
            agree = float(jnp.mean(bs0 == bs1))
            miss_flip = int(jnp.sum((bs0 >= 0) & (bs1 < 0)))
            print(f"  {variant}: slot agreement {agree:.6f}  "
                  f"hits lost {miss_flip}", flush=True)

        tiles = o.shape[0] // TILE_R
        ot = o.reshape(tiles, TILE_R, 3)
        dt_ = dd.reshape(tiles, TILE_R, 3)
        *_, n_free = jax.jit(bin_clusters_bits)(ot, dt_, bvh.clusters)
        *_, n_cap = jax.jit(bin_clusters_bits)(ot, dt_, bvh.clusters,
                                               t_cap=caps)
        k = bvh.clusters.k
        print(f"  pairs/ray: free {float(np.asarray(n_free).sum())*k/o.shape[0]:.1f}"
              f" -> capped {float(np.asarray(n_cap).sum())*k/o.shape[0]:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
