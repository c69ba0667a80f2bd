"""The fused Pallas kernel under the interpreter — CPU-suite gate.

tests_tpu/ runs the compiled kernel on real hardware but only manually;
this module executes the SAME kernel code (packed t|slot fold, overflow
relaunch seeding, parked-tile handling) through ``interpret=True`` on every
CI run, so kernel-logic regressions fail the main suite instead of rotting
until the next hardware session.  Scenes are kept tiny: the interpreter
executes grid steps serially in Python.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.bvh import build_bvh
from directx_raytracer_tpu.bvh.pallas_intersect import (
    TILE_R,
    VISIT_GROUP,
    bin_clusters_bits,
    build_visit_groups_bits,
    intersect_pallas,
    occluded_pallas,
)
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.ops.intersect import (
    intersect_bruteforce,
    occluded_bruteforce,
)
from directx_raytracer_tpu.ops.rays import generate_rays_tiled


@pytest.fixture(scope="module")
def scene_geo():
    scene = testscenes.bench_scene(n_tris=3_000, width=96, height=48)
    d = build_device_scene(scene)
    return scene, d, build_bvh(d.geometry)


@pytest.fixture(scope="module")
def rays(scene_geo):
    scene, _, _ = scene_geo
    pos, rot = scene.camera.snapshot()
    return generate_rays_tiled(pos, rot, 96, 48, 24, 32)


def _groups(o, dd, bvh, budget):
    tiles = o.shape[0] // TILE_R
    words, cum, entry, counts = bin_clusters_bits(
        o.reshape(tiles, TILE_R, 3), dd.reshape(tiles, TILE_R, 3), bvh.clusters
    )
    *_, remaining = build_visit_groups_bits(
        words, cum, entry, counts, budget, VISIT_GROUP)
    return int(remaining)


def test_closest_matches_bruteforce(scene_geo, rays):
    scene, d, bvh = scene_geo
    o, dd = rays
    ref = intersect_bruteforce(o, dd, d.geometry.woop)
    got = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, refine=True,
                           budget=128)
    hm = np.asarray(got.tri >= 0) == np.asarray(ref.tri >= 0)
    assert hm.mean() > 0.999
    hits = np.asarray(ref.tri >= 0) & np.asarray(got.tri >= 0)
    close = np.isclose(np.asarray(got.t)[hits], np.asarray(ref.t)[hits],
                       rtol=1e-3)
    assert close.mean() > 0.999


def test_occlusion_matches_bruteforce(scene_geo, rays):
    scene, d, bvh = scene_geo
    o, dd = rays
    t_max = jnp.full((o.shape[0],), 25.0)
    ref = occluded_bruteforce(o, dd, d.geometry.woop, t_max)
    got = occluded_pallas(o, dd, bvh.clusters, bvh.wplanar, t_max, budget=128)
    assert (np.asarray(got) == np.asarray(ref)).mean() > 0.999


def test_occlusion_tcap_short_rays(scene_geo, rays):
    """Schedule-time t-cap: clusters whose conservative entry lies beyond a
    tile's max t_max are never scheduled.  Short shadow rays (the cap
    biting hard) must still agree with brute force, and mixed per-lane
    t_max (the cap is a tile-level MAX) must stay conservative."""
    scene, d, bvh = scene_geo
    o, dd = rays
    for dist in (2.0, 8.0):
        t_max = jnp.full((o.shape[0],), dist)
        ref = occluded_bruteforce(o, dd, d.geometry.woop, t_max)
        got = occluded_pallas(o, dd, bvh.clusters, bvh.wplanar, t_max,
                              budget=128)
        assert (np.asarray(got) == np.asarray(ref)).mean() > 0.999, dist
    # Mixed lanes: half the rays short, half long, interleaved.
    t_mix = jnp.where(jnp.arange(o.shape[0]) % 2 == 0, 3.0, 30.0)
    ref = occluded_bruteforce(o, dd, d.geometry.woop, t_mix)
    got = occluded_pallas(o, dd, bvh.clusters, bvh.wplanar, t_mix, budget=128)
    assert (np.asarray(got) == np.asarray(ref)).mean() > 0.999
    # Fully-disarmed batch (t_max <= 0) schedules nothing and blocks nothing.
    zero = occluded_pallas(o, dd, bvh.clusters, bvh.wplanar,
                           jnp.zeros((o.shape[0],)), budget=128)
    assert not np.asarray(zero).any()


def test_visit_budget_overflow_keeps_hits(scene_geo, rays):
    """Regression: relaunches seed out_slot from the carried best — hits won
    in an earlier launch must survive redone visits (strict-< fold cannot
    re-register the same truncated winner)."""
    scene, d, bvh = scene_geo
    o, dd = rays
    budget = 4
    assert _groups(o, dd, bvh, budget) > budget, "overflow loop untested"
    full = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, budget=128)
    tiny = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, budget=budget)
    np.testing.assert_array_equal(np.asarray(full.tri), np.asarray(tiny.tri))
    np.testing.assert_array_equal(np.asarray(full.t), np.asarray(tiny.t))


def test_bitwalk_binning_matches_xla_walker():
    """The production (sort-free bit-walk) binning path produces the same
    hits as the independent XLA clustered walker, including through the
    budget-overflow relaunch loop."""
    import jax.numpy as jnp
    import numpy as np

    from directx_raytracer_tpu import testscenes
    from directx_raytracer_tpu.bvh import build_bvh
    from directx_raytracer_tpu.bvh import pallas_intersect as pi
    from directx_raytracer_tpu.bvh.clustered import intersect_clustered, occluded_clustered
    from directx_raytracer_tpu.models.scene import build_device_scene
    from directx_raytracer_tpu.ops.rays import generate_rays_tiled

    scene = testscenes.bench_scene(n_tris=3_000, width=48, height=32)
    d = build_device_scene(scene)
    pos, rot = scene.camera.snapshot()
    o, dd = generate_rays_tiled(jnp.asarray(pos), jnp.asarray(rot), 48, 32,
                                8, 8)
    bvh = build_bvh(d.geometry)
    ref = intersect_clustered(o, dd, bvh.clusters)
    got = pi.intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, tile_r=128,
                              budget=8, refine=True)  # forces overflow too
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(got.t),
                               rtol=1e-5)
    tmax = jnp.full((o.shape[0],), 25.0)
    occ_ref = np.asarray(occluded_clustered(o, dd, bvh.clusters, tmax))
    occ = np.asarray(pi.occluded_pallas(o, dd, bvh.clusters, bvh.wplanar,
                                        tmax, tile_r=128, budget=8))
    np.testing.assert_array_equal(occ, occ_ref)


def test_coarsened_bounds_at_768_chunks(scene_geo):
    """ADVICE r2 #1: analytic tile bounds built at 256-ray tiles must
    survive (hull-coarsened, still conservative) when the kernel runs at
    768-ray chunks instead of being silently dropped."""
    from directx_raytracer_tpu.bvh.pallas_intersect import _coarsen_bounds
    from directx_raytracer_tpu.ops.rays import tile_frustum_bounds

    scene, d, bvh = scene_geo
    pos, rot = scene.camera.snapshot()
    o, dd = generate_rays_tiled(pos, rot, 96, 48, 8, 32)
    bounds = tile_frustum_bounds(pos, rot, 96, 48, 8, 32)
    assert bounds["d_lo"].shape[0] == o.shape[0] // 256

    coarse = _coarsen_bounds(bounds, o.shape[0] // 768)
    assert coarse["d_lo"].shape[0] == o.shape[0] // 768
    # hull property: every fine box is inside its coarse box
    f = np.asarray(bounds["d_lo"]).reshape(-1, 3, 3)
    assert (np.asarray(coarse["d_lo"]) <= f.min(axis=1) + 1e-6).all()

    with_b = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, tile_r=768,
                              budget=256, bounds=bounds)
    without = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, tile_r=768,
                               budget=256)
    np.testing.assert_array_equal(np.asarray(with_b.tri),
                                  np.asarray(without.tri))


def test_rank_table_matches_oracle_walk(scene_geo, rays):
    """rank_table_bits[t, j] must equal the j-th set bit of tile t's words."""
    from directx_raytracer_tpu.bvh.pallas_intersect import (
        bin_clusters_bits, rank_table_bits)

    scene, d, bvh = scene_geo
    o, dd = rays
    tiles = o.shape[0] // TILE_R
    words, cum, entry, counts = bin_clusters_bits(
        o.reshape(tiles, TILE_R, 3), dd.reshape(tiles, TILE_R, 3),
        bvh.clusters)
    cap = 16
    table = np.asarray(rank_table_bits(words, cum, cap))
    wn = np.asarray(words)
    cn = np.asarray(counts)
    assert cn.max() > 0
    for t in range(tiles):
        bits = [w * 32 + b for w in range(wn.shape[1]) for b in range(32)
                if (wn[t, w] >> b) & 1]
        for j in range(min(len(bits), cap)):
            assert table[t, j] == bits[j], (t, j)


def test_small_cap_forces_hi_phase(scene_geo, rays):
    """cap=4 pushes most ranks through the overflow (v1) phase — results
    must be identical to the full-cap table path."""
    from directx_raytracer_tpu.bvh.pallas_intersect import _search

    scene, d, bvh = scene_geo
    o, dd = rays
    t_init = jnp.full((o.shape[0],), 10000.0, jnp.float32)
    bt_a, bs_a = _search(o, dd, t_init, bvh.clusters, bvh.wplanar, TILE_R,
                         128, cap=128)
    bt_b, bs_b = _search(o, dd, t_init, bvh.clusters, bvh.wplanar, TILE_R,
                         128, cap=4)
    np.testing.assert_array_equal(np.asarray(bs_a), np.asarray(bs_b))
    np.testing.assert_array_equal(np.asarray(bt_a), np.asarray(bt_b))


def test_hier_rank_table_matches_flat():
    """The two-level (wide-C) rank table must equal the flat build and the
    plain bit walk on synthetic word rows."""
    import numpy as np

    from directx_raytracer_tpu.bvh.pallas_intersect import (
        _rank_table_bits_hier, rank_table_bits)

    rng = np.random.default_rng(7)
    t, w = 13, 96  # forces the hier path (w > 64)
    words = rng.integers(0, 2**32, size=(t, w), dtype=np.uint32)
    words[rng.random((t, w)) < 0.5] = 0  # sprinkle empty words
    wn = jnp.asarray(words.view("int32"))
    cnt = np.zeros((t, w), np.int32)
    for ti in range(t):
        for wi in range(w):
            cnt[ti, wi] = bin(int(words[ti, wi])).count("1")
    cum = jnp.asarray(np.cumsum(cnt, axis=1).astype(np.int32))
    cap = 64
    got = np.asarray(_rank_table_bits_hier(wn, cum, cap))
    assert got.shape == (t, cap)
    for ti in range(t):
        bits = [wi * 32 + b for wi in range(w) for b in range(32)
                if (int(words[ti, wi]) >> b) & 1]
        for j in range(min(len(bits), cap)):
            assert got[ti, j] == bits[j], (ti, j, got[ti, j], bits[j])


def test_superblock_binning_matches_dense(scene_geo, rays, monkeypatch):
    """The superblock-skipped binning kernel (large-C path) must produce
    the same overlap words and entries as the dense kernel."""
    from directx_raytracer_tpu.bvh import pallas_intersect as pi

    scene, d, bvh = scene_geo
    o, dd = rays
    tiles = o.shape[0] // TILE_R
    ot = o.reshape(tiles, TILE_R, 3)
    dt = dd.reshape(tiles, TILE_R, 3)
    ref = pi.bin_clusters_bits(ot, dt, bvh.clusters)
    monkeypatch.setattr(pi, "SUPER_MIN_C", 1)
    monkeypatch.setattr(pi, "SUPER_BLOCK", 32)
    got = pi.bin_clusters_bits(ot, dt, bvh.clusters)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
    # entries agree on overlapping clusters
    wn = np.asarray(ref[0])
    for t in range(tiles):
        for w in range(wn.shape[1]):
            for b in range(32):
                if (wn[t, w] >> b) & 1:
                    cl = w * 32 + b
                    np.testing.assert_allclose(
                        np.asarray(ref[2])[t, cl], np.asarray(got[2])[t, cl],
                        rtol=1e-6)


def test_exec_counter_is_diagnostic_only(scene_geo, rays):
    """count_exec=True must leave (best_t, best_slot) bit-identical and
    report executed sub-visits <= scheduled (the early-out only skips)."""
    from directx_raytracer_tpu.bvh.pallas_intersect import (
        RANK_CAP, _launch, rank_table_bits, build_visit_groups_table,
        rays_split)

    scene, d, bvh = scene_geo
    o, dd = rays
    cs, w = bvh.clusters, bvh.wplanar
    n = o.shape[0]
    tiles = n // TILE_R
    budget = 128
    g = VISIT_GROUP
    words, cum, entry, counts = bin_clusters_bits(
        o.reshape(tiles, TILE_R, 3), dd.reshape(tiles, TILE_R, 3), cs)
    cap = min(RANK_CAP, words.shape[1] * 32)
    counts_lo = jnp.minimum(counts, cap)
    table = rank_table_bits(words, cum, cap)
    vt, vcs, vf, ve, rem = build_visit_groups_table(
        table, entry, counts_lo, budget, g)
    assert int(rem) == 0, "test scene must fit one budget window"

    rays8 = jnp.concatenate(
        [o, jnp.ones((n, 1), jnp.float32), dd, jnp.zeros((n, 1), jnp.float32)],
        axis=1).reshape(tiles, TILE_R, 8).swapaxes(1, 2)
    rays8 = jnp.concatenate([rays8, jnp.zeros((1, 8, TILE_R), jnp.float32)])
    rays8 = rays_split(rays8)
    init_t = jnp.full((tiles + 1, 1, TILE_R), 10000.0, jnp.float32)
    init_slot = jnp.full((tiles + 1, 1, TILE_R), -1, jnp.int32)

    bt, bs = _launch(rays8, init_t, init_slot, vt, vcs, vf, ve, w,
                     k=cs.k, tile_r=TILE_R, budget=budget)
    bt2, bs2, ec = _launch(rays8, init_t, init_slot, vt, vcs, vf, ve, w,
                           k=cs.k, tile_r=TILE_R, budget=budget,
                           count_exec=True)
    # compare REAL tiles only: the trailing dummy tile is scratch for
    # padding visits (holds NaN garbage that NaN != NaN would flag)
    assert bool(jnp.all(bt[:tiles] == bt2[:tiles]))
    assert bool(jnp.all(bs[:tiles] == bs2[:tiles]))
    executed = int(np.asarray(ec).sum())
    scheduled = int(np.asarray(counts_lo).sum())
    assert 0 < executed <= scheduled


def test_phase_cap_schedule_equivalent(scene_geo, rays):
    """The t-capped two-phase schedule must produce the same winners as
    the one-shot schedule: the recull criterion (entry > max best_t over
    the tile) can only drop clusters no ray could still accept."""
    from directx_raytracer_tpu.bvh.pallas_intersect import _search

    scene, d, bvh = scene_geo
    o, dd = rays
    t0 = jnp.full((o.shape[0],), 10000.0, jnp.float32)
    bt1, bs1 = _search(o, dd, t0, bvh.clusters, bvh.wplanar, TILE_R, 128)
    for cap1 in (2, 4):
        bt2, bs2 = _search(o, dd, t0, bvh.clusters, bvh.wplanar, TILE_R,
                           128, phase_cap=cap1)
        assert bool(jnp.all(bs1 == bs2)), f"cap1={cap1}"
        assert bool(jnp.all(bt1 == bt2)), f"cap1={cap1}"
    # tiny rank-table cap forces phase 2's hi (bits-builder) overflow path
    bt3, bs3 = _search(o, dd, t0, bvh.clusters, bvh.wplanar, TILE_R, 128,
                       cap=4, phase_cap=2)
    assert bool(jnp.all(bs1 == bs3))
    assert bool(jnp.all(bt1 == bt3))


def test_tile_r_mosaic_envelope_guard(scene_geo, rays):
    """tile_r below 128 lanes hangs the REMOTE Mosaic compile/run silently
    (r2 weak #5); both launch paths must reject it loudly instead."""
    scene, d, bvh = scene_geo
    o, dd = rays
    with pytest.raises(ValueError, match="Mosaic safe envelope"):
        intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, tile_r=64)
    with pytest.raises(ValueError, match="Mosaic safe envelope"):
        occluded_pallas(o, dd, bvh.clusters, bvh.wplanar,
                        jnp.full((o.shape[0],), 25.0, jnp.float32), tile_r=64)
    with pytest.raises(ValueError, match="multiple of 128"):
        intersect_pallas(o, dd, bvh.clusters, bvh.wplanar, tile_r=192)


def test_operand_schemes_agree(scene_geo, rays):
    """bary6 (the default: no third-barycentric rows, w' = 1 - u - v on
    the VPU) and the full 8-group native operand pick the same winners;
    the scheme rides the BVH so this pins the r4 plumbing."""
    from directx_raytracer_tpu.bvh.pallas_intersect import planar_mats

    scene, d, bvh = scene_geo
    o, dd = rays
    w_native = planar_mats(bvh.clusters)
    h6 = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar)
    h8 = intersect_pallas(o, dd, bvh.clusters, w_native, scheme="native")
    agree = np.mean(np.asarray(h6.tri) == np.asarray(h8.tri))
    assert agree > 0.999, f"bary6 vs native winner agreement {agree}"
    both = np.asarray(h6.tri >= 0) & np.asarray(h8.tri >= 0)
    assert np.allclose(np.asarray(h6.t)[both], np.asarray(h8.t)[both],
                       rtol=1e-3)


def test_scheme_inferred_from_operand_shape(scene_geo, rays):
    """The operand LAYOUT is determined by wplanar's column count — a
    bary6 wplanar passed with the default scheme flag must not slice
    empty mm rows (r4 regression: direct intersect_pallas callers)."""
    scene, d, bvh = scene_geo
    o, dd = rays
    assert bvh.scheme == "bary6r"  # the production default (r5)
    # default scheme flag ("native") + bary6-shaped operand: shape wins
    h_flag = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar)
    h_expl = intersect_pallas(o, dd, bvh.clusters, bvh.wplanar,
                              scheme="bary6")
    assert bool(jnp.all(h_flag.tri == h_expl.tri))
    assert bool(jnp.all(h_flag.t == h_expl.t))
    tmax = jnp.full((o.shape[0],), 25.0, jnp.float32)
    b_flag = occluded_pallas(o, dd, bvh.clusters, bvh.wplanar, tmax)
    b_expl = occluded_pallas(o, dd, bvh.clusters, bvh.wplanar, tmax,
                             scheme="bary6")
    assert bool(jnp.all(b_flag == b_expl))


def test_fill_pad_reuses_previous_block():
    """_fill_pad re-encodes padding sub-visits (-1) as -(prev_id + 2):
    the index map resolves them to the previous step's block (no DMA)
    while the >= 0 compute predicate still sees padding."""
    from directx_raytracer_tpu.bvh.pallas_intersect import (_fill_pad,
                                                            _pad_block)

    vcg = jnp.asarray([[3, -1, 5, -1, -1, 7],
                       [-1, 2, -1, -1, 4, -1]], jnp.int32)
    filled = np.asarray(_fill_pad(vcg))
    blocks = np.asarray(_pad_block(jnp.asarray(filled)))
    # real entries unchanged; each pad resolves to its row's previous id
    assert (filled[0] == [3, -(3 + 2), 5, -(5 + 2), -(5 + 2), 7]).all()
    assert (blocks[0] == [3, 3, 5, 5, 5, 7]).all()
    # a pad BEFORE any real entry stays -1 -> block 0
    assert filled[1, 0] == -1 and blocks[1, 0] == 0
    assert (blocks[1] == [0, 2, 2, 2, 4, 4]).all()
    # the compute predicate (>= 0) still classifies every pad as padding
    assert ((filled >= 0) == (np.asarray(vcg) >= 0)).all()
