"""LBVH invariants + traversal == brute force (SURVEY.md §4 test strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import (
    build_bvh,
    build_clusters,
    build_lbvh,
    intersect_clustered,
    make_bvh_intersect_fn,
    make_bvh_occluder_factory,
    occluded_clustered,
    traverse_closest,
    traverse_occluded,
)
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.intersect import intersect_bruteforce, occluded_bruteforce
from directx_raytracer_tpu.ops.rays import generate_rays


def _scene_geo(scene):
    return build_device_scene(scene).geometry


def _rays(scene, w=48, h=36):
    return generate_rays(scene.camera.position, scene.camera.rotation, w, h)


class TestInvariants:
    @pytest.mark.parametrize("n_tris", [1, 2, 7, 100, 1000])
    def test_structure(self, n_tris):
        geo = _scene_geo(testscenes.random_soup(n_tris, seed=n_tris))
        bvh = build_lbvh(geo)
        t = bvh.n_tris
        # device slots: treelet leaves padded to CLUSTER_K (sentinels never hit)
        assert t == geo.n_tris and geo.n_real_tris == n_tris
        left = np.asarray(bvh.left)
        skip = np.asarray(bvh.skip)

        # Every triangle appears exactly once in the sorted order.
        assert sorted(np.asarray(bvh.order).tolist()) == list(range(t))

        if t == 1:
            return
        n_nodes = 2 * t - 1
        # Walk the skip-threaded tree from the root; every node must be
        # visited exactly once when we always descend.
        visited = np.zeros(n_nodes, bool)
        cur = bvh.root
        steps = 0
        while cur != -1 and steps <= n_nodes + 1:
            assert not visited[cur]
            visited[cur] = True
            cur = left[cur] if left[cur] != -1 else skip[cur]
            steps += 1
        assert visited.all()

    @pytest.mark.parametrize("n_tris", [2, 50, 500])
    def test_parent_aabbs_contain_children(self, n_tris):
        geo = _scene_geo(testscenes.random_soup(n_tris, seed=7 * n_tris + 1))
        bvh = build_lbvh(geo)
        t = bvh.n_tris
        amin = np.asarray(bvh.aabb_min)
        amax = np.asarray(bvh.aabb_max)
        left = np.asarray(bvh.left)[: t - 1]
        skip = np.asarray(bvh.skip)
        # For internal node i: children are left[i] and its sibling skip[left[i]].
        right = skip[left]
        for i in range(t - 1):
            for c in (left[i], right[i]):
                assert (amin[i] <= amin[c] + 1e-6).all()
                assert (amax[i] >= amax[c] - 1e-6).all()

    def test_leaf_aabbs_are_triangle_bounds(self):
        geo = _scene_geo(testscenes.random_soup(64, seed=3))
        bvh = build_lbvh(geo)
        t = bvh.n_tris
        p0 = np.asarray(bvh.v0)
        p1 = p0 + np.asarray(bvh.e1)
        p2 = p0 + np.asarray(bvh.e2)
        lo = np.minimum(np.minimum(p0, p1), p2)
        hi = np.maximum(np.maximum(p0, p1), p2)
        np.testing.assert_allclose(np.asarray(bvh.aabb_min)[t - 1 :], lo, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bvh.aabb_max)[t - 1 :], hi, atol=1e-6)


class TestTraversalEqualsBruteForce:
    @pytest.mark.parametrize("n_tris,seed", [(1, 0), (13, 1), (300, 2), (2000, 3)])
    def test_closest_hit_matches(self, n_tris, seed):
        scene = testscenes.random_soup(n_tris, seed=seed)
        geo = _scene_geo(scene)
        o, d = _rays(scene)
        ref = intersect_bruteforce(o, d, geo.woop)
        bvh = build_lbvh(geo)
        got = traverse_closest(o, d, bvh)
        ref_hit = np.asarray(ref.tri >= 0)
        got_hit = np.asarray(got.tri >= 0)
        np.testing.assert_array_equal(got_hit, ref_hit)
        # Same triangle except near-exact ties; t always matches.
        np.testing.assert_allclose(
            np.asarray(got.t)[got_hit], np.asarray(ref.t)[ref_hit], rtol=1e-3
        )
        same_tri = np.asarray(got.tri) == np.asarray(ref.tri)
        if got_hit.any():
            assert same_tri[got_hit].mean() > 0.99

    def test_structured_scene_matches(self):
        scene = testscenes.bench_scene(n_tris=5000, width=64, height=36)
        geo = _scene_geo(scene)
        o, d = generate_rays(scene.camera.position, scene.camera.rotation, 64, 36)
        ref = intersect_bruteforce(o, d, geo.woop)
        got = traverse_closest(o, d, build_lbvh(geo))
        np.testing.assert_array_equal(np.asarray(got.tri >= 0), np.asarray(ref.tri >= 0))
        hits = np.asarray(ref.tri >= 0)
        np.testing.assert_allclose(
            np.asarray(got.t)[hits], np.asarray(ref.t)[hits], rtol=1e-3
        )

    def test_occlusion_matches(self):
        scene = testscenes.random_soup(200, seed=11)
        geo = _scene_geo(scene)
        o, d = _rays(scene, 32, 24)
        t_max = jnp.full((o.shape[0],), 40.0)
        ref = occluded_bruteforce(o, d, geo.woop, t_max)
        got = traverse_occluded(o, d, build_lbvh(geo), t_max)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestClusteredEqualsBruteForce:
    @pytest.mark.parametrize("n_tris,seed,k", [(13, 1, 128), (300, 2, 64), (2000, 3, 128)])
    def test_closest_hit_matches(self, n_tris, seed, k):
        scene = testscenes.random_soup(n_tris, seed=seed)
        geo = _scene_geo(scene)
        o, d = _rays(scene)
        ref = intersect_bruteforce(o, d, geo.woop)
        cs = build_clusters(geo, k=k)
        got = intersect_clustered(o, d, cs)
        np.testing.assert_array_equal(np.asarray(got.tri >= 0), np.asarray(ref.tri >= 0))
        hits = np.asarray(ref.tri >= 0)
        np.testing.assert_allclose(
            np.asarray(got.t)[hits], np.asarray(ref.t)[hits], rtol=1e-3
        )

    def test_occlusion_matches(self):
        scene = testscenes.random_soup(200, seed=11)
        geo = _scene_geo(scene)
        o, d = _rays(scene, 32, 24)
        t_max = jnp.full((o.shape[0],), 40.0)
        ref = occluded_bruteforce(o, d, geo.woop, t_max)
        got = occluded_clustered(o, d, build_clusters(geo), t_max)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_per_ray_t_max_respected(self):
        # Rays with a short t_max must miss geometry beyond it.
        scene = testscenes.random_soup(100, seed=5)
        geo = _scene_geo(scene)
        o, d = _rays(scene, 16, 12)
        cs = build_clusters(geo)
        far = intersect_clustered(o, d, cs)
        near = intersect_clustered(
            o, d, cs, t_max=jnp.full((o.shape[0],), 1.0)
        )
        np.testing.assert_array_equal(
            np.asarray(near.tri >= 0),
            np.asarray((far.tri >= 0) & (far.t < 1.0)),
        )


class TestRendererIntegration:
    def test_whitted_with_bvh_matches_bruteforce(self):
        from directx_raytracer_tpu.render import render_whitted

        scene = testscenes.cornell_box(48, 32)
        d = build_device_scene(scene)
        bvh = build_bvh(d.geometry)
        # XLA clustered path: Pallas needs a TPU (or interpret mode).
        img_bvh, _ = render_whitted(
            d, scene.camera.position, scene.camera.rotation, 48, 32, max_depth=2,
            intersect_fn=make_bvh_intersect_fn(bvh, use_pallas=False),
            occluder_factory=make_bvh_occluder_factory(bvh, use_pallas=False),
        )
        img_ref, _ = render_whitted(
            d, scene.camera.position, scene.camera.rotation, 48, 32, max_depth=2
        )
        a, b = np.asarray(img_bvh), np.asarray(img_ref)
        # Shared-edge hits may resolve to either coincident triangle
        # (different winner between intersectors); allow a handful of pixels.
        mismatch = (np.abs(a - b) > 1e-4).any(axis=-1)
        assert mismatch.mean() < 0.002, f"{mismatch.sum()} mismatched pixels"


class TestBinnerOracleEquivalence:
    """The production sort-free bit-walk binner must schedule exactly the
    visit set of the independently-derived sorted oracle (VERDICT r2 weak
    #4: no untested shadow implementation in the hot module)."""

    def test_bits_visit_sets_match_sorted_oracle(self):
        from directx_raytracer_tpu.bvh.binning_oracle import bin_clusters
        from directx_raytracer_tpu.bvh.pallas_intersect import (
            bin_clusters_bits,
        )
        from directx_raytracer_tpu.ops.rays import generate_rays_tiled

        scene = testscenes.bench_scene(n_tris=5_000, width=96, height=48)
        d = build_device_scene(scene)
        bvh = build_bvh(d.geometry)
        pos, rot = scene.camera.snapshot()
        o, dd = generate_rays_tiled(jnp.asarray(pos), jnp.asarray(rot),
                                    96, 48, 8, 8)
        tiles = o.shape[0] // 64
        ot = o.reshape(tiles, 64, 3)
        dt = dd.reshape(tiles, 64, 3)

        ids, _, counts_s = bin_clusters(ot, dt, bvh.clusters)
        words, cum, entry, counts_b = bin_clusters_bits(ot, dt, bvh.clusters)

        np.testing.assert_array_equal(np.asarray(counts_s),
                                      np.asarray(counts_b))
        ids_n = np.asarray(ids)
        counts_n = np.asarray(counts_s)
        words_n = np.asarray(words)
        c = bvh.clusters.aabb_min.shape[0]
        assert counts_n.sum() > 0, "vacuous: no overlaps binned"
        for t in range(tiles):
            sorted_set = set(ids_n[t, : counts_n[t]].tolist())
            bit_set = {
                w * 32 + b
                for w in range(words_n.shape[1])
                for b in range(32)
                if (words_n[t, w] >> b) & 1
            }
            assert bit_set == sorted_set, f"tile {t} visit sets differ"
            assert all(cl < c for cl in bit_set)

    def test_pallas_bin_matches_xla(self):
        """The fused binning kernel must reproduce the XLA slab pass:
        same overlap words/counts, conservative entries close."""
        import jax.numpy as jnp

        from directx_raytracer_tpu.bvh.pallas_intersect import (
            bin_clusters_bits,
        )
        from directx_raytracer_tpu.ops.rays import (
            generate_rays_tiled, tile_frustum_bounds,
        )

        scene = testscenes.bench_scene(n_tris=5_000, width=96, height=48)
        d = build_device_scene(scene)
        bvh = build_bvh(d.geometry)
        pos, rot = scene.camera.snapshot()
        o, dd = generate_rays_tiled(jnp.asarray(pos), jnp.asarray(rot),
                                    96, 48, 8, 32)
        tiles = o.shape[0] // 256
        ot, dt = o.reshape(tiles, 256, 3), dd.reshape(tiles, 256, 3)
        for bounds in (None, tile_frustum_bounds(
                jnp.asarray(pos), jnp.asarray(rot), 96, 48, 8, 32)):
            wp, cp, ep, np_ = bin_clusters_bits(ot, dt, bvh.clusters,
                                                bounds=bounds, impl="pallas")
            wx, cx, ex, nx = bin_clusters_bits(ot, dt, bvh.clusters,
                                               bounds=bounds, impl="xla")
            np.testing.assert_array_equal(np.asarray(np_), np.asarray(nx))
            # pallas words may have extra all-zero columns (128-lane pad)
            w_min = min(wp.shape[1], wx.shape[1])
            np.testing.assert_array_equal(np.asarray(wp)[:, :w_min],
                                          np.asarray(wx)[:, :w_min])
            assert (np.asarray(wp)[:, w_min:] == 0).all()
            ovl = np.asarray(wx)[:, :w_min] != 0
            c = bvh.clusters.aabb_min.shape[0]
            mask = np.zeros((tiles, c), bool)
            for t in range(tiles):
                for w in range(w_min):
                    for b in range(32):
                        if w * 32 + b < c and (int(np.asarray(wx)[t, w]) >> b) & 1:
                            mask[t, w * 32 + b] = True
            ep_n, ex_n = np.asarray(ep)[:, :c], np.asarray(ex)[:, :c]
            np.testing.assert_allclose(ep_n[mask], ex_n[mask], rtol=1e-5,
                                       atol=1e-5)

    def test_pallas_bin_t_cap_matches_xla(self):
        """The kernel-side per-tile t_cap (tp row 14, the any-hit schedule
        cull) must drop exactly the clusters the XLA formulation drops:
        same words and counts at a finite cap (ADVICE r4 #2 — before this
        the cap's parity was only covered via the 99.9% brute-force
        tolerance)."""
        import jax.numpy as jnp

        from directx_raytracer_tpu.bvh.pallas_intersect import (
            bin_clusters_bits,
        )
        from directx_raytracer_tpu.ops.rays import generate_rays_tiled

        scene = testscenes.bench_scene(n_tris=5_000, width=96, height=48)
        d = build_device_scene(scene)
        bvh = build_bvh(d.geometry)
        pos, rot = scene.camera.snapshot()
        o, dd = generate_rays_tiled(jnp.asarray(pos), jnp.asarray(rot),
                                    96, 48, 8, 32)
        tiles = o.shape[0] // 256
        ot, dt = o.reshape(tiles, 256, 3), dd.reshape(tiles, 256, 3)
        # Mixed caps: some tiles cull most clusters, some none, one culls
        # everything (t_cap below t_min).
        rng = np.random.default_rng(7)
        t_cap = jnp.asarray(rng.uniform(0.0, 60.0, size=(tiles,)),
                            jnp.float32)
        t_cap = t_cap.at[0].set(0.0)
        wp, cp, _, np_ = bin_clusters_bits(ot, dt, bvh.clusters,
                                           impl="pallas", t_cap=t_cap)
        wx, cx, _, nx = bin_clusters_bits(ot, dt, bvh.clusters,
                                          impl="xla", t_cap=t_cap)
        np.testing.assert_array_equal(np.asarray(np_), np.asarray(nx))
        w_min = min(wp.shape[1], wx.shape[1])
        np.testing.assert_array_equal(np.asarray(wp)[:, :w_min],
                                      np.asarray(wx)[:, :w_min])
        assert (np.asarray(wp)[:, w_min:] == 0).all()
        # The cap must actually bite vs the uncapped schedule.
        *_, n_free = bin_clusters_bits(ot, dt, bvh.clusters, impl="xla")
        assert int(np.asarray(np_).sum()) < int(np.asarray(n_free).sum())


class TestAutoSchedule:
    def test_auto_g_by_scene_size(self):
        """g=1 for tiny scenes (machinery-floor-bound: Dragon 362 -> 403
        Mrays/s), 512-triangle steps above (TPU_RUNS_r5.md)."""
        from directx_raytracer_tpu.bvh.pallas_intersect import _auto_g

        assert _auto_g(32, 128) == 1     # Dragon-sized
        assert _auto_g(256, 128) == 1
        assert _auto_g(782, 128) == 4    # 100k bench scene
        assert _auto_g(8192, 256) == 2   # 512 // k

    def test_auto_rank_cap_by_depth(self):
        """Rank table widens to 256 past 2048 clusters (1M: 35.4 vs 37.0
        ms, repeated x3 — TPU_RUNS_r5.md)."""
        from directx_raytracer_tpu.bvh.pallas_intersect import (
            _auto_rank_cap)

        assert _auto_rank_cap(782) == 128
        assert _auto_rank_cap(2048) == 128
        assert _auto_rank_cap(8192) == 256
