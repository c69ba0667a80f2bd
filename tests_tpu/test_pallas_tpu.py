"""TPU-hardware tests for the fused Pallas kernel (run manually:
``python -m pytest tests_tpu/ -q`` — the main suite in tests/ forces the
CPU platform, where Pallas TPU kernels cannot compile)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() == "cpu":
    pytest.skip("requires a TPU backend", allow_module_level=True)

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import build_bvh
from directx_raytracer_tpu.bvh.pallas_intersect import intersect_pallas, occluded_pallas
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.intersect import intersect_bruteforce, occluded_bruteforce
from directx_raytracer_tpu.ops.rays import (
    generate_rays_tiled,
    tile_frustum_bounds,
)


@pytest.fixture(scope="module")
def scene_geo():
    scene = testscenes.bench_scene(n_tris=20_000, width=192, height=96)
    d = build_device_scene(scene)
    return scene, d, build_bvh(d.geometry)


def _rays(scene, w=192, h=96):
    pos, rot = scene.camera.snapshot()
    return generate_rays_tiled(pos, rot, w, h, 24, 32)


def test_closest_matches_bruteforce(scene_geo):
    scene, d, bvh = scene_geo
    o, dd = _rays(scene)
    ref = intersect_bruteforce(o, dd, d.geometry.woop)
    got = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, refine=True)
    # Different f32 evaluation orders disagree on a sliver-edge fringe.
    hm = np.asarray(got.tri >= 0) == np.asarray(ref.tri >= 0)
    assert hm.mean() > 0.998
    hits = np.asarray(ref.tri >= 0) & np.asarray(got.tri >= 0)
    same = (np.asarray(got.tri) == np.asarray(ref.tri))[hits]
    close = np.isclose(np.asarray(got.t)[hits], np.asarray(ref.t)[hits], rtol=1e-3)
    # Hit distances agree except on a sliver/silhouette fringe (~0.4% on
    # this dense sphere tessellation) where the two approximate f32
    # evaluation orders legitimately pick different grazing triangles; the
    # winning triangle may additionally flip on exact-tie shared edges.
    assert close.mean() > 0.995
    assert same.mean() > 0.98


def test_coarse_t_within_packing_tolerance(scene_geo):
    scene, d, bvh = scene_geo
    o, dd = _rays(scene)
    coarse = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar)
    exact = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, refine=True)
    hits = np.asarray(exact.tri >= 0)
    # coarse t = Woop-matmul value (cancellation error up to ~1e-2 on
    # slivers; see ops/intersect.py SEARCH_PRECISION) + 11 truncated
    # mantissa bits.  hit_record re-derives exact t for shading.
    np.testing.assert_allclose(
        np.asarray(coarse.t)[hits], np.asarray(exact.t)[hits], rtol=1e-2
    )


def test_frustum_bounds_bit_identical(scene_geo):
    scene, d, bvh = scene_geo
    pos, rot = scene.camera.snapshot()
    o, dd = _rays(scene)
    bounds = tile_frustum_bounds(pos, rot, 192, 96, 24, 32)
    h1 = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar)
    h2 = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, bounds=bounds)
    np.testing.assert_array_equal(np.asarray(h1.tri), np.asarray(h2.tri))


def test_occlusion_matches_bruteforce(scene_geo):
    scene, d, bvh = scene_geo
    o, dd = _rays(scene)
    t_max = jnp.full((o.shape[0],), 25.0)
    ref = occluded_bruteforce(o, dd, d.geometry.woop, t_max)
    got = occluded_pallas(o, dd, bvh.clusters, bvh.wplanar, t_max)
    assert (np.asarray(got) == np.asarray(ref)).mean() > 0.998


def test_visit_budget_overflow_loop(scene_geo):
    scene, d, bvh = scene_geo
    o, dd = _rays(scene)
    budget = 64

    # The tiny budget must actually overflow, or the relaunch while_loop
    # never runs and this test is vacuous: count the real visit groups.
    from directx_raytracer_tpu.bvh.pallas_intersect import (
        TILE_R, VISIT_GROUP, bin_clusters_bits, build_visit_groups_bits,
    )

    tiles = o.shape[0] // TILE_R
    words, cum, entry, counts = bin_clusters_bits(
        o.reshape(tiles, TILE_R, 3), dd.reshape(tiles, TILE_R, 3), bvh.clusters
    )
    *_, remaining = build_visit_groups_bits(
        words, cum, entry, counts, budget, VISIT_GROUP)
    assert int(remaining) > budget, "budget too large: overflow loop untested"

    full = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar)
    tiny = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, budget=budget)
    np.testing.assert_array_equal(np.asarray(full.tri), np.asarray(tiny.tri))
    np.testing.assert_array_equal(np.asarray(full.t), np.asarray(tiny.t))
