"""Acceleration structures: LBVH build + stackless traversal.

``build_bvh`` / ``make_bvh_intersect_fn`` / ``make_bvh_occluder_factory``
are the renderer-facing API (drop-in for the brute-force defaults in
render/whitted.py and render/debug.py).
"""

import jax

from .clustered import (
    ClusterSet,
    build_clusters,
    intersect_clustered,
    occluded_clustered,
)
from .lbvh import LBVH, build_lbvh
from .pallas_intersect import (
    intersect_pallas,
    occluded_pallas,
    planar_mats,
)
from .traverse import traverse_closest, traverse_occluded


class BVH:
    """Production acceleration structure: treelet clusters + the planar
    Woop operand consumed by the fused Pallas kernel.  (The per-node LBVH
    in lbvh.py is the correctness oracle — per-ray pointer chasing is
    gather-bound on TPU.)

    Registered as a pytree so it can ride ``Geometry.accel`` through jit
    as an argument (see models/scene.py)."""

    def __init__(self, clusters: ClusterSet, wplanar, scheme: str = "native"):
        self.clusters = clusters
        self.wplanar = wplanar
        # MXU operand/precision scheme matching wplanar's layout (STATIC
        # pytree aux: it selects kernel code, not data).
        self.scheme = scheme


jax.tree_util.register_pytree_node(
    BVH,
    lambda b: ((b.clusters, b.wplanar), b.scheme),
    lambda aux, children: BVH(*children, scheme=aux),
)


def build_bvh(geometry, k: int = 128, scheme: str = "bary6r") -> BVH:
    # scheme="bary6r" (bary6 operands + the VPU's approximate reciprocal in
    # place of the per-pair divide) is the r5 measured default: +10-15% on
    # top of bary6 at both 100k and 1M (tools/r5_ab.py --scheme), slot
    # agreement 1 - 1.3e-4 with hit counts matched to 1e-5 and t drift at
    # the packed-truncation scale (the exact hit_record MT pass
    # re-adjudicates t anyway).  "bary6" keeps the exact divide; "native"
    # keeps the full 8-group operand; see pallas_intersect._DOT_SCHEMES.
    # k=128 balances cluster-level culling cost (binning/sort scale with C)
    # against per-visit triangle waste; measured best on 100k-tri scenes.
    from .pallas_intersect import planar_mats6

    cs = build_clusters(geometry, k=k)
    w = (planar_mats6(cs) if scheme in ("bary6", "bary6r")
         else planar_mats(cs))
    return BVH(cs, w, scheme=scheme)


def _auto_tile_r(bvh: BVH) -> int:
    """Ray-chunk size: one 8x32 pixel tile per chunk at EVERY scene scale.

    The 768-ray chunk this used to pick for >=4096-cluster scenes traded
    frustum tightness for fewer chunks — remeasured with the fused binning
    kernel + rank-table scheduler that trade inverts: at 1M tris the wider
    frustum binned 2.3x the pairs/ray (1876 vs 804, tools/cull_stats.py)
    and the full search ran 70.3 vs 62.9 ms (tools/tile_ab.py), so tight
    256-ray tiles win at every scale measured."""
    from .pallas_intersect import TILE_R

    return TILE_R


def _auto_phase_cap(bvh: BVH) -> int:
    """Default phase-1 width for the t-capped two-phase schedule: 0 — the
    ONE-SHOT schedule is the measured winner at every scene scale.

    r4 A/B with the right-sized grid (tools/twopass_ab.py, 1080p primaries):
    100k tris one-shot 117.4 >= caps {2: 114.0, 4: 114.1, 8: 117.4}; 1M tris
    one-shot 44.2 > caps {4: 40.3, 8: 42.2, 16: 41.6} Mrays/s.  The recull's
    re-binning + second rank table cost more than the steps it drops — the
    kernel's own per-step early-out already skips their compute, and step
    cost is dominated by the unconditional operand DMA, which phase 2
    re-pays for every surviving cluster."""
    return 0


def make_bvh_intersect_fn(bvh: BVH, use_pallas: bool = True, block: int = 1536,
                          tile_r: int | None = None,
                          phase_cap: int | None = None):
    """(origins, dirs, geometry) -> Hit, closing over a prebuilt BVH.

    ``use_pallas=False`` selects the pure-XLA clustered path (slower but
    runs everywhere, e.g. CPU tests without interpret mode).
    ``phase_cap=None`` auto-selects the t-capped two-phase schedule
    (see pallas_intersect._search) by scene depth; pass 0 to force the
    one-shot schedule or N to force a phase-1 width."""
    tile_r = tile_r or _auto_tile_r(bvh)
    if phase_cap is None:
        phase_cap = _auto_phase_cap(bvh)

    if use_pallas:
        def intersect(origins, dirs, geometry, tile_bounds=None, tile_r=tile_r):
            # Prefer the geometry-bound accel (a jit ARGUMENT); the closure
            # fallback embeds the arrays as compile-time constants, which
            # breaks past ~200 MB of operand (see Geometry.accel).
            # ``tile_r``: per-call ray-chunk override — renderers pass their
            # primary schedule's chunk (ops.rays.pick_schedule) so the
            # kernel chunking matches the pixel tiling; sorted secondary
            # batches leave the default.
            b = geometry.accel if getattr(geometry, "accel", None) is not None else bvh
            return intersect_pallas(origins, dirs, b.clusters, b.wplanar,
                                    bounds=tile_bounds,
                                    tile_r=tile_r or _auto_tile_r(bvh),
                                    phase_cap=phase_cap,
                                    scheme=getattr(b, "scheme", "native"))
    else:
        def intersect(origins, dirs, geometry, tile_bounds=None, tile_r=None):
            b = geometry.accel if getattr(geometry, "accel", None) is not None else bvh
            return intersect_clustered(origins, dirs, b.clusters, block=block)

    return intersect


def make_bvh_occluder_factory(bvh: BVH, use_pallas: bool = True, block: int = 1536,
                              tile_r: int | None = None,
                              budget: int | None = None):
    """geometry -> (origins, dirs, max_t) -> bool occluder for shadow rays.

    ``budget``: any-hit schedule window override (see pallas_intersect
    VISIT_BUDGET); None = the kernel default."""
    tile_r = tile_r or _auto_tile_r(bvh)

    def factory(geometry):
        b = geometry.accel if getattr(geometry, "accel", None) is not None else bvh
        if use_pallas:
            def occluded(origins, dirs, max_t):
                kw = {} if budget is None else {"budget": budget}
                return occluded_pallas(origins, dirs, b.clusters,
                                       b.wplanar, max_t, tile_r=tile_r,
                                       scheme=getattr(b, "scheme", "native"),
                                       **kw)
        else:
            def occluded(origins, dirs, max_t):
                return occluded_clustered(origins, dirs, b.clusters, max_t, block=block)

        return occluded

    return factory


__all__ = [
    "BVH",
    "LBVH",
    "build_lbvh",
    "ClusterSet",
    "build_clusters",
    "intersect_clustered",
    "occluded_clustered",
    "intersect_pallas",
    "occluded_pallas",
    "planar_mats",
    "build_bvh",
    "traverse_closest",
    "traverse_occluded",
    "make_bvh_intersect_fn",
    "make_bvh_occluder_factory",
]
