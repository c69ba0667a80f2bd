"""Acceleration structures: LBVH build + stackless traversal.

``build_bvh`` / ``make_bvh_intersect_fn`` / ``make_bvh_occluder_factory``
are the renderer-facing API (drop-in for the brute-force defaults in
render/whitted.py and render/debug.py).
"""

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
    """Production acceleration structure: Morton clusters + the planar Woop
    operand consumed by the fused Pallas kernel.  (The per-node LBVH in
    lbvh.py is the correctness oracle — per-ray pointer chasing is
    gather-bound on TPU.)"""

    def __init__(self, clusters: ClusterSet, wplanar):
        self.clusters = clusters
        self.wplanar = wplanar


def build_bvh(geometry, k: int = 128) -> BVH:
    # k=128 balances cluster-level culling cost (binning/sort scale with C)
    # against per-visit triangle waste; measured best on 100k-tri scenes.
    cs = build_clusters(geometry, k=k)
    return BVH(cs, planar_mats(cs))


def make_bvh_intersect_fn(bvh: BVH, use_pallas: bool = True, block: int = 1536):
    """(origins, dirs, geometry) -> Hit, closing over a prebuilt BVH.

    ``use_pallas=False`` selects the pure-XLA clustered path (slower but
    runs everywhere, e.g. CPU tests without interpret mode)."""

    if use_pallas:
        def intersect(origins, dirs, geometry, tile_bounds=None):
            return intersect_pallas(origins, dirs, bvh.clusters, bvh.wplanar,
                                    bounds=tile_bounds)
    else:
        def intersect(origins, dirs, geometry, tile_bounds=None):
            return intersect_clustered(origins, dirs, bvh.clusters, block=block)

    return intersect


def make_bvh_occluder_factory(bvh: BVH, use_pallas: bool = True, block: int = 1536):
    """geometry -> (origins, dirs, max_t) -> bool occluder for shadow rays."""

    def factory(geometry):
        if use_pallas:
            def occluded(origins, dirs, max_t):
                return occluded_pallas(origins, dirs, bvh.clusters, bvh.wplanar, max_t)
        else:
            def occluded(origins, dirs, max_t):
                return occluded_clustered(origins, dirs, bvh.clusters, max_t, block=block)

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
