"""Round-3 kernel/XLA-glue micro-experiments (run on the TPU).

    python -m tools.r3_micro [--tris 100000]

Measures, with the production bits binner feeding the kernel:
  * per-phase XLA glue: bits binning, visit build, raygen, shade;
  * kernel machinery vs compute (E_none / E_all) at G in {4, 8};
  * visit-group padding stats at G in {4, 8, 16} x K in {128, 64, 32};
all with the same loop-in-one-jit timing bench.py uses.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh.clustered import build_clusters
from directx_raytracer_tpu.bvh.pallas_intersect import (
    TILE_R, bin_clusters_bits, build_visit_groups_bits, planar_mats, _launch,
    _search,
)
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.rays import generate_rays_tiled, tile_frustum_bounds

WIDTH, HEIGHT = 1920, 1080


def timed(fn, *arrays, n=5, label=""):
    @jax.jit
    def run(eps, *arrs):
        def body(i, carry):
            e, acc = carry
            out = fn(e, *arrs)
            v = jnp.asarray(out).reshape(-1)[0].astype(jnp.float32)
            return jnp.where(jnp.isfinite(v), v, 0.0) * 0.0, acc + v
        _, acc = jax.lax.fori_loop(0, n, body, (eps, jnp.float32(0)))
        return acc

    float(run(jnp.float32(0), *arrays))
    t0 = time.perf_counter()
    float(run(jnp.float32(0), *arrays))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=100_000)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    scene = testscenes.bench_scene(n_tris=args.tris, width=WIDTH, height=HEIGHT)
    dscene = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    pos = jnp.asarray(pos, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)
    geo = dscene.geometry

    o, d = generate_rays_tiled(pos, rot, WIDTH, HEIGHT, 8, 32)
    bounds = tile_frustum_bounds(pos, rot, WIDTH, HEIGHT, 8, 32)
    n = o.shape[0]
    tiles = n // TILE_R
    ot = o.reshape(tiles, TILE_R, 3)
    dt_ = d.reshape(tiles, TILE_R, 3)

    # ---- visit/padding stats across (K, G) --------------------------------
    for k in (128, 64, 32):
        cs = build_clusters(geo, k=k)
        words, cum, entry, counts = jax.jit(bin_clusters_bits)(
            ot, dt_, cs, bounds=bounds)
        c = np.asarray(counts)
        for g in (4, 8, 16):
            groups = int(((c + g - 1) // g).sum())
            slots = groups * g
            real = int(c.sum())
            print(f"K={k:4d} G={g:3d}: C={cs.aabb_min.shape[0]:5d} "
                  f"clusters={real:7d} groups={groups:7d} slots={slots:7d} "
                  f"pad={100*(slots-real)/max(slots,1):5.1f}% "
                  f"pairs/ray={real*k*TILE_R/n:7.0f}", flush=True)

    # ---- XLA glue phases ---------------------------------------------------
    cs = build_clusters(geo, k=128)
    w = planar_mats(cs)

    def ph_bin_bits(eps, *a):
        b2 = {k2: v + eps if k2 != "len_hi" else v for k2, v in bounds.items()}
        *_, counts = bin_clusters_bits(ot, dt_, cs, bounds=b2)
        return counts[0]

    def ph_bin_bits_nobounds(eps, *a):
        *_, counts = bin_clusters_bits(ot + eps, dt_, cs, bounds=None)
        return counts[0]

    BUDGET = 16384
    g = 4

    def ph_groups_bits(eps, *a):
        words, cum, entry, counts = bin_clusters_bits(ot, dt_, cs, bounds=bounds)
        vt, vcs, vf, ve, rem = build_visit_groups_bits(
            words, cum, entry + eps, counts, BUDGET, g)
        return ve[0]

    timed(ph_bin_bits, label="bin_clusters_bits (analytic bounds)")
    timed(ph_bin_bits_nobounds, label="bin_clusters_bits (reduced bounds)")
    timed(ph_groups_bits, label="bits bin + visit build (G=4)")

    # ---- raygen / repack / shade decomposition ----------------------------
    def ph_raygen_n3(eps, *a):
        oo, dd = generate_rays_tiled(pos + eps, rot, WIDTH, HEIGHT, 8, 32)
        return oo[0, 0] + dd[0, 0]

    def _components(p):
        i = jnp.arange(n, dtype=jnp.int32)
        rx = i % 32
        t1 = i // 32
        ry = t1 % 8
        t2 = t1 // 8
        tx = t2 % (WIDTH // 32)
        ty = t2 // (WIDTH // 32)
        px = (tx * 32 + rx).astype(jnp.float32)
        py = (ty * 8 + ry).astype(jnp.float32)
        x = (2.0 * ((px + 0.5) / WIDTH) - 1.0) * (WIDTH / HEIGHT)
        y = 1.0 - 2.0 * ((py + 0.5) / HEIGHT)
        inv_len = jax.lax.rsqrt(x * x + y * y + 1.0)
        dx, dy, dz = x * inv_len, y * inv_len, -inv_len
        wx = rot[0, 0] * dx + rot[0, 1] * dy + rot[0, 2] * dz + p * 0
        wy = rot[1, 0] * dx + rot[1, 1] * dy + rot[1, 2] * dz
        wz = rot[2, 0] * dx + rot[2, 1] * dy + rot[2, 2] * dz
        wlen = jax.lax.rsqrt(wx * wx + wy * wy + wz * wz)
        return wx * wlen, wy * wlen, wz * wlen

    def ph_raygen_comp(eps, *a):
        wx, wy, wz = _components(eps)
        return wx[0] + wy[0] + wz[0]

    def ph_raygen_rays8(eps, *a):
        wx, wy, wz = _components(eps)
        r = lambda c: c.reshape(tiles, 1, TILE_R)
        full = lambda s: jnp.full((tiles, 1, TILE_R), s, jnp.float32)
        r8 = jnp.concatenate(
            [full(pos[0]), full(pos[1]), full(pos[2]), full(1.0),
             r(wx), r(wy), r(wz), full(0.0)], axis=1)
        return r8[0, 0, 0]

    def ph_repack_n3(eps, *a):
        r8 = jnp.concatenate(
            [o + eps, jnp.ones((n, 1), jnp.float32), d,
             jnp.zeros((n, 1), jnp.float32)], axis=1,
        ).reshape(tiles, TILE_R, 8).swapaxes(1, 2)
        return r8[0, 0, 0]

    def ph_shade5(eps, *a):
        from directx_raytracer_tpu.ops.debug_shading import shade_debug
        t0_ = jnp.full((n,), 10.0, jnp.float32) + eps
        z = jnp.zeros((n,), jnp.int32)
        c = shade_debug(jnp.int32(5), o, d, t0_, t0_, t0_, z, z)
        return c[0, 0]

    def ph_untile(eps, *a):
        from directx_raytracer_tpu.render.debug import untile
        c = jnp.zeros((n, 3), jnp.float32) + eps
        img = untile(c, WIDTH, HEIGHT, (8, 32))
        return img[0, 0, 0]

    timed(ph_raygen_n3, label="raygen tiled (N,3) as deployed")
    timed(ph_raygen_comp, label="raygen components only (N,)")
    timed(ph_raygen_rays8, label="raygen -> rays8 (T,8,R) direct")
    timed(ph_repack_n3, label="repack (N,3) -> rays8 (as in _search)")
    timed(ph_shade5, label="shade_debug mode 5 (traced switch)")
    timed(ph_untile, label="untile transpose")

    # ---- kernel machinery vs compute at G in {4, 8} -----------------------
    words, cum, entry, counts = jax.jit(bin_clusters_bits)(
        ot, dt_, cs, bounds=bounds)

    rays8 = jnp.concatenate(
        [o, jnp.ones((n, 1), jnp.float32), d, jnp.zeros((n, 1), jnp.float32)],
        axis=1).reshape(tiles, TILE_R, 8).swapaxes(1, 2)
    rays8 = jnp.concatenate([rays8, jnp.zeros((1, 8, TILE_R), jnp.float32)])
    init_t = jnp.concatenate([
        jnp.full((tiles, 1, TILE_R), 10000.0, jnp.float32),
        jnp.zeros((1, 1, TILE_R), jnp.float32)])
    init_slot = jnp.full((tiles + 1, 1, TILE_R), -1, jnp.int32)

    for g in (4, 8):
        vt, vcs, vf, ve, rem = jax.jit(
            build_visit_groups_bits, static_argnames=("budget", "g"))(
            words, cum, entry, counts, BUDGET, g)
        vt, vf, ve = map(jnp.asarray, (vt, vf, ve))
        n_groups = int(((np.asarray(counts) + g - 1) // g).sum())

        def launch(eps, ve_mode, vcs=vcs, vt=vt, vf=vf, ve=ve, g=g):
            if ve_mode == "all":
                vee = jnp.full_like(ve, -1e30)
            elif ve_mode == "none":
                vee = jnp.full_like(ve, 1e30)
            else:
                vee = ve
            bt, bs = _launch(rays8 + eps, init_t, init_slot, vt, vcs, vf, vee,
                             w, 128, TILE_R, BUDGET)
            return bt[0, 0]

        t_real = timed(lambda eps, g=g, launch=launch: launch(eps, "real"),
                       label=f"G={g} E_real")
        t_all = timed(lambda eps, g=g, launch=launch: launch(eps, "all"),
                      label=f"G={g} E_all")
        t_none = timed(lambda eps, g=g, launch=launch: launch(eps, "none"),
                       label=f"G={g} E_none")
        print(f"  G={g}: machinery/step = {t_none/BUDGET*1e6:6.3f} us, "
              f"compute/group = {(t_all-t_none)/n_groups*1e6:6.3f} us "
              f"({n_groups} real groups)", flush=True)

    # ---- full search at G in {4, 8} ---------------------------------------
    t_init = jnp.full((n,), 10000.0, jnp.float32)
    for g in (4, 8):
        def ph_search(eps, *a, g=g):
            bt, bs = _search(o + eps, d, t_init, cs, w, TILE_R, 10240,
                             bounds=bounds, g=g)
            return bt[0]
        dt3 = timed(ph_search, label=f"_search full G={g}")
        print(f"  => {n/dt3/1e6:7.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
