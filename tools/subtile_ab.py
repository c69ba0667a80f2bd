"""Measure the culling headroom of SUB-TILE hulls (VERDICT r4 #3).

The binner culls clusters against the empirical hull of a 256-ray tile;
at 1M tris the hull union keeps 804 pairs/ray vs 285 at 100k.  This tool
re-bins the same rays at 128- and 64-ray granularity and reports

  * exec@G    — pairs if tiles were EXECUTED at granularity G (lower
                bound; tile_r=64 is below the Mosaic envelope);
  * keep2/4   — pairs if 256-ray visits are kept only when >= 1 of the
                2x128 / 4x64 sub-hulls overlaps (the implementable
                rank-table refinement: execution stays at 256).

Run on the TPU:  python -m tools.subtile_ab [ntris]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh.clustered import build_clusters
from directx_raytracer_tpu.bvh.pallas_intersect import TILE_R, bin_clusters_bits
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.rays import generate_rays_tiled

WIDTH, HEIGHT = 1920, 1080


def main():
    ntris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    print(f"devices: {jax.devices()}", flush=True)
    scene = testscenes.bench_scene(n_tris=ntris, width=WIDTH, height=HEIGHT)
    dscene = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    cs = build_clusters(dscene.geometry, k=128)
    o, d = generate_rays_tiled(jnp.asarray(pos, jnp.float32),
                               jnp.asarray(rot, jnp.float32),
                               WIDTH, HEIGHT, 8, 32)
    n = o.shape[0]
    bins = {}
    for sub in (256, 128, 64):
        t = n // sub
        words, _, _, counts = jax.jit(bin_clusters_bits)(
            o.reshape(t, sub, 3), d.reshape(t, sub, 3), cs)
        bins[sub] = (np.asarray(words), np.asarray(counts))
        pairs = bins[sub][1].sum() * sub * cs.k / n
        print(f"exec@{sub:3d}: {pairs:8.1f} pairs/ray "
              f"({bins[sub][1].sum()} visits)", flush=True)

    w256 = bins[256][0]
    for sub in (128, 64):
        f = 256 // sub
        wsub = bins[sub][0].reshape(w256.shape[0], f, -1)
        kept = w256 & np.bitwise_or.reduce(wsub, axis=1)
        n_kept = int(np.unpackbits(
            np.ascontiguousarray(kept).astype(">u4").view(np.uint8)).sum())
        pairs = n_kept * 256 * cs.k / n
        print(f"keep{f} (256-exec, {sub}-ray sub-hull gate): "
              f"{pairs:8.1f} pairs/ray ({n_kept} visits)", flush=True)


if __name__ == "__main__":
    main()
