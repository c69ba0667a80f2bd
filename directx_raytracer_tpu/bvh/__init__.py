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
from .traverse import traverse_closest, traverse_occluded


def build_bvh(geometry, k: int = 128) -> ClusterSet:
    """Build the production acceleration structure (Morton clusters; the
    per-node LBVH in lbvh.py is the correctness oracle — per-ray pointer
    chasing is gather-bound on TPU)."""
    return build_clusters(geometry, k=k)


def make_bvh_intersect_fn(cs: ClusterSet, block: int = 1536):
    """(origins, dirs, geometry) -> Hit, closing over a prebuilt ClusterSet."""

    def intersect(origins, dirs, geometry):
        return intersect_clustered(origins, dirs, cs, block=block)

    return intersect


def make_bvh_occluder_factory(cs: ClusterSet, block: int = 1536):
    """geometry -> (origins, dirs, max_t) -> bool occluder for shadow rays."""

    def factory(geometry):
        def occluded(origins, dirs, max_t):
            return occluded_clustered(origins, dirs, cs, max_t, block=block)

        return occluded

    return factory


__all__ = [
    "LBVH",
    "build_lbvh",
    "ClusterSet",
    "build_clusters",
    "intersect_clustered",
    "occluded_clustered",
    "build_bvh",
    "traverse_closest",
    "traverse_occluded",
    "make_bvh_intersect_fn",
    "make_bvh_occluder_factory",
]
