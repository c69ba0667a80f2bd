"""Pallas fused cluster-intersection kernel — the production ``TraceRay``.

The XLA clustered path (clustered.py) is bandwidth-bound: every cluster
visit materializes (B, 3K) Woop-matmul intermediates in HBM, and its
``lax.map`` over ray blocks serializes tile dispatch.  This kernel keeps
each visit entirely in VMEM and runs one grid step per *actual* work item:

* **binning (XLA, conservative frustum):** each 768-ray tile is reduced to
  an origin/direction interval box; interval-arithmetic slab tests against
  all cluster AABBs yield per-tile overlapping cluster ids (near-to-far)
  and counts.
* **visit list (XLA):** the ragged (tile, cluster) pairs are compacted into
  flat arrays ``visit_tile / visit_cluster / visit_first`` of static budget
  V (exclusive-cumsum offsets + scatter).  Padding visits point at a dummy
  tile slot, so they burn one grid step and nothing else.  If a frame
  needs more than V visits the helper loops whole extra kernel launches
  (``jax.lax.while_loop``) over V-sized chunks, seeding each launch with
  the previous best — never silently dropping clusters.
* **kernel (one grid step per visit):** rays enter as a (48, R) bf16
  hi/mid/lo split block built from ``[o | 1 | d | 0]`` rows (rays_split),
  selected by ``visit_tile``; the cluster's split planar Woop operand
  W (48, 8K) bf16 (planar_split) is selected by ``visit_cluster`` — both
  via scalar-prefetched index maps, so Pallas pipelines the HBM->VMEM
  copies (dynamic *manual* DMA hangs this TPU stack; index-map DMA is the
  supported path).  One native-precision MXU matmul per group produces
  planar [op_x op_y op_z dp_x dp_y dp_z]; a short VPU tail computes
  t = -op_z/dp_z, barycentrics, validity, and folds the running
  (best_t, best_slot) held in the output VMEM block, which consecutive
  visits of the same tile revisit without leaving the chip.

Slot -> original triangle id via the Morton ``order``; exact (t, u, v) are
re-evaluated outside by one batched Möller-Trumbore on the winners.
Occlusion reuses the same kernel with best_t initialized to the shadow
distance.

Reference parity: this replaces the driver-built BLAS/TLAS + hardware
traversal the reference leans on (DXRTRenderer.cpp:548-806,
HLSL/ray_tracing_shaders.hlsl:57-66).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.intersect import Hit
from ..ops.rays import T_MAX, T_MIN
from .clustered import ClusterSet

INF = float("inf")
BIG = 1e30
# XLA-side dots (the rank-table one-hot selections) carry exact integer
# values < 2^24 in f32 and MUST run at fp32 precision — the TPU default
# rounds operands to bf16.  (The Pallas kernels avoid the issue by taking
# pre-split bf16 hi/lo operands instead; see planar_split.)
_DOT_PRECISION = jax.lax.Precision.HIGHEST
TILE_R = 256  # rays per tile (16x16 pixels — matches ops.rays.pick_tile)
# Visit GROUPS (of VISIT_GROUP clusters) per launch.  The grid is always
# exactly this size (padding steps cost ~0.9 us machinery each), so the
# budget is sized just above the typical primary-frame group count (~10k
# at 16x16 tiles after treelet clustering); larger frames walk the group
# list in budget-sized windows via the overflow loop, wasting < one
# budget of padding total.
VISIT_BUDGET = 10240


def _interpret() -> bool:
    """Run the kernel via the Pallas interpreter off-TPU.

    Lets the main CPU test suite execute the REAL kernel logic (packed
    t|slot fold, overflow relaunch seeding, parked-tile binning) instead of
    only the XLA clustered path — slow, so CPU tests keep scenes small."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Planar Woop operand
# ---------------------------------------------------------------------------


def planar_mats(cs: ClusterSet) -> jax.Array:
    """(C, 48, 8K) bf16 split combined matmul operand (the production
    "native" scheme; see :func:`planar_mats_f32` for the raw f32 form)."""
    return planar_split(planar_mats_f32(cs))


def planar_mats6(cs: ClusterSet) -> jax.Array:
    """(C, 48, 6K) bf16 split operand for the "bary6" scheme: column
    groups [u_o | v_o | -z_o | du | dv | dz] with NO third-barycentric
    rows — the kernel computes w' = 1 - u - v on the VPU instead.  25%
    less per-cluster DMA and 25% fewer MXU output tiles than the 8-group
    operand, for one extra VPU op per pair (see _DOT_SCHEMES)."""
    c, k = cs.woop.shape[0], cs.k
    woop = cs.woop  # (C, K, 3, 4)
    w = jnp.zeros((c, 8, 6 * k), jnp.float32)
    for axis in range(3):
        o_part = jnp.swapaxes(woop[:, :, axis, :], 1, 2)
        if axis == 2:
            o_part = -o_part
        w = w.at[:, 0:4, axis * k : (axis + 1) * k].set(o_part)
        w = w.at[:, 4:7, (3 + axis) * k : (4 + axis) * k].set(
            jnp.swapaxes(woop[:, :, axis, :3], 1, 2)
        )
    return planar_split(w)


def planar_mats_f32(cs: ClusterSet) -> jax.Array:
    """(C, 8, 8K) f32 combined matmul operand.

    ``rays32 @ W[c]`` (see :func:`planar_split` / :func:`rays_split`)
    produces planar columns [u_o | v_o | -z_o | w_o | du | dv | dz | wd],
    each K wide.  Two tail-golf tricks ride the layout (the kernel's
    per-pair VPU tail is the frame's dominant cost, so columns are cheaper
    than ops — the MXU absorbs extra rows at ~18% of the tail's cost/pair):

    * the z-row ORIGIN part is stored NEGATED, so t = mm[-z_o]/mm[dz]
      without a per-pair negate;
    * the THIRD barycentric w' = 1 - u - v gets its own rows
      (w_o = 1 - u_o - v_o, wd = -(du + dv)), so the kernel evaluates it
      with one fma instead of two subtracts.
    """
    c, k = cs.woop.shape[0], cs.k
    woop = cs.woop  # (C, K, 3, 4)
    w = jnp.zeros((c, 8, 8 * k), jnp.float32)
    for axis in range(3):
        o_part = jnp.swapaxes(woop[:, :, axis, :], 1, 2)
        if axis == 2:
            o_part = -o_part
        w = w.at[:, 0:4, axis * k : (axis + 1) * k].set(o_part)
        w = w.at[:, 4:7, (4 + axis) * k : (5 + axis) * k].set(
            jnp.swapaxes(woop[:, :, axis, :3], 1, 2)
        )
    wo = -(woop[:, :, 0, :] + woop[:, :, 1, :])  # (C, K, 4)
    wo = wo.at[:, :, 3].add(1.0)
    w = w.at[:, 0:4, 3 * k : 4 * k].set(jnp.swapaxes(wo, 1, 2))
    wd = -(woop[:, :, 0, :3] + woop[:, :, 1, :3])
    w = w.at[:, 4:7, 7 * k : 8 * k].set(jnp.swapaxes(wd, 1, 2))
    return w


SPLIT_ROWS = 48  # contraction depth of the bf16x3 split operands (6 x 8)


def _split3(x):
    """f32 -> (hi, mid, lo) bf16 triple with hi + mid + lo == x exactly.

    BIT-twiddled (an f32's top 16 bits ARE a bf16 pattern; each residual
    subtraction is then exact), NOT ``x - f32(bf16(x))`` arithmetic: XLA's
    algebraic simplifier cancels the arithmetic form inside jit (measured
    p50 error collapsing from 4e-8 to 2e-3 — plain-bf16 grade) and bit ops
    are opaque to it.  f32's 24 significand bits land 8+8+8 in the three
    parts, so the sum is exact (lo may underflow only near FLT_MIN)."""
    def top16(v):
        b = jax.lax.bitcast_convert_type(v, jnp.uint32) & jnp.uint32(0xFFFF0000)
        return jax.lax.bitcast_convert_type(b, jnp.float32)

    def as_bf16(v):
        b = (jax.lax.bitcast_convert_type(v, jnp.uint32) >> 16).astype(jnp.uint16)
        return jax.lax.bitcast_convert_type(b, jnp.bfloat16)

    hi = top16(x)
    r1 = x - hi
    mid = top16(r1)
    lo = r1 - mid  # == top16 of itself: 24 bits fit in 3 x 8
    return as_bf16(hi), as_bf16(mid), as_bf16(lo)


def planar_split(w: jax.Array) -> jax.Array:
    """(C, 8, nK) f32 -> (C, 48, nK) bf16 split operand (bf16x3 scheme).

    The kernel's dot runs at the MXU's native 1-pass bf16 precision: the
    remote Mosaic's fp32 contract precision measured ~2x on the frame, and
    its DEFAULT became plain bf16 (~1e-2 relative — loses edge hits; a
    2-way bf16 split still flipped sliver-edge winners on the Dragon
    golden at 2.3% of pixels).  Each f32 operand splits into three bf16
    parts (hi + mid + lo ~ exact) and the six significant cross products
    ride ONE K=48 contraction:
      W48   = [W_hi; W_mid; W_lo; W_hi; W_mid; W_hi]
      r48   = [r_hi; r_hi;  r_hi; r_mid; r_mid; r_lo]
      sum   = W_hi(r_hi+r_mid+r_lo) + W_mid(r_hi+r_mid) + W_lo r_hi
            = W r  -  O(2^-24) residual terms.
    Contraction depths 8 and 48 cost the same through the 128-deep
    systolic array, so full f32-grade accuracy is a single MXU pass."""
    hi, mid, lo = _split3(w)
    return jnp.concatenate([hi, mid, lo, hi, mid, hi], axis=1)


def rays_split(rays8: jax.Array) -> jax.Array:
    """(T, 8, R) f32 ray blocks -> (T, 48, R) bf16 — the rays-side operand
    matching :func:`planar_split`'s row order."""
    hi, mid, lo = _split3(rays8)
    return jnp.concatenate([hi, hi, hi, mid, mid, lo], axis=1)


# ---------------------------------------------------------------------------
# Conservative frustum binning (XLA side)
# ---------------------------------------------------------------------------


def _interval_inv(d_lo, d_hi):
    """Interval reciprocal; spans of zero go conservatively infinite."""
    same_sign = (d_lo > 0) | (d_hi < 0)
    i_lo = jnp.where(same_sign, 1.0 / d_hi, -BIG)
    i_hi = jnp.where(same_sign, 1.0 / d_lo, BIG)
    return i_lo, i_hi


def bin_clusters_bits(origins, dirs, cs: ClusterSet, t_min=T_MIN, bounds=None,
                      impl: str = "pallas", t_cap=None):
    """Sort-free binning: per-tile overlap as 32-bit occupancy WORDS.

    The sorted binner's near-to-far order was measured to save ~1% (the
    group early-out almost never fires on tiles containing miss rays), so
    culling stays a pure elementwise slab pass; overlap packs into
    (T, C/32) i32 words with per-word popcounts, and the visit builder
    walks (word, set bit) in Morton order.  One binner for ALL scene
    sizes — costs scale with T x C elementwise plus budget-sized gathers.

    ``impl="pallas"`` (default) runs the slab pass in the fused binning
    kernel (the XLA formulation materializes ~30 (T, C) intermediates in
    HBM — measured 4.4 ms vs ~1 ms at 8100 x 1024); ``impl="xla"`` keeps
    the reference formulation (used by the equivalence tests).

    ``t_cap``: optional (T,) f32 per-tile upper bound in RAW ray-t units
    (pre ``len_hi`` normalization) — a cluster whose conservative entry
    exceeds it is dropped from the schedule entirely, inside the fused
    kernel (tp row 14).  Used by the any-hit path, whose rays END at a
    known t (the light): the kernel's per-step gate would skip such a
    group's compute anyway, but every scheduled group still pays fixed
    step machinery + a budget slot.

    Returns (words (T, W) i32, cum (T, W) i32 running popcounts,
    entry (T, >=C) f32 conservative entries (for the group early-out),
    counts (T,)).
    """
    if bounds is not None:
        o_lo, o_hi = bounds["o_lo"], bounds["o_hi"]
        d_lo, d_hi = bounds["d_lo"], bounds["d_hi"]
        t_min = 0.0
    else:
        o_lo = origins.min(axis=1)
        o_hi = origins.max(axis=1)
        d_lo = dirs.min(axis=1)
        d_hi = dirs.max(axis=1)

    tiles = origins.shape[0]
    c = cs.aabb_min.shape[0]

    if impl == "pallas":
        len_hi = None
        if bounds is not None and "len_hi" in bounds:
            len_hi = bounds["len_hi"]
        tp = jnp.zeros((tiles, 16), jnp.float32)
        tp = tp.at[:, 0:3].set(o_lo).at[:, 3:6].set(o_hi)
        tp = tp.at[:, 6:9].set(d_lo).at[:, 9:12].set(d_hi)
        tp = tp.at[:, 12].set(1.0 if len_hi is None else len_hi)
        tp = tp.at[:, 13].set(t_min)
        tp = tp.at[:, 14].set(BIG if t_cap is None else t_cap)
        pad_t = (-tiles) % 8
        if pad_t:  # parked rows: zero-span rays far outside -> no overlap
            park = jnp.zeros((pad_t, 16), jnp.float32)
            park = park.at[:, 0:6].set(1e30).at[:, 6:12].set(1.0)
            park = park.at[:, 12].set(1.0)
            tp = jnp.concatenate([tp, park])
        cb = planar_cluster_rows(cs)
        sb = planar_super_rows(cb) if cb.shape[1] >= SUPER_MIN_C else None
        entry, ovl = _bin_pallas(tp, cb, sb)
        entry = entry[:tiles]
        overlap = ovl[:tiles] != 0
    else:
        entry = jnp.full((tiles, c), -BIG)
        exit_ = jnp.full_like(entry, BIG)
        for ax in range(3):
            n_lo = cs.aabb_min[None, :, ax] - o_hi[:, None, ax]
            n_hi = cs.aabb_max[None, :, ax] - o_lo[:, None, ax]
            i_lo, i_hi = _interval_inv(d_lo[:, None, ax], d_hi[:, None, ax])
            prods = jnp.stack(
                [n_lo * i_lo, n_lo * i_hi, n_hi * i_lo, n_hi * i_hi], axis=0)
            prods = jnp.clip(prods, -BIG, BIG)
            entry = jnp.maximum(entry, prods.min(axis=0))
            exit_ = jnp.minimum(exit_, prods.max(axis=0))

        overlap = (entry <= exit_) & (exit_ >= t_min) & cs.valid[None, :]
        entry = jnp.maximum(entry, t_min)
        if t_cap is not None:
            overlap = overlap & (entry <= t_cap[:, None])
        if bounds is not None and "len_hi" in bounds:
            entry = entry / bounds["len_hi"][:, None]
        pad = (-c) % 32
        if pad:
            overlap = jnp.concatenate(
                [overlap, jnp.zeros((tiles, pad), bool)], axis=1)

    w = overlap.shape[1] // 32
    bits = overlap.reshape(tiles, w, 32).astype(jnp.int32)
    words = (bits << jnp.arange(32, dtype=jnp.int32)[None, None, :]).sum(-1)
    cnt_w = jax.lax.population_count(words)
    cum = jnp.cumsum(cnt_w, axis=1)
    counts = cnt_w.sum(axis=1)
    return words, cum, entry, counts


def _bin_kernel_body(tp_ref, cb_ref, entry_ref, ovl_ref):
    """Slab-test 8 tiles x C clusters per grid step, entirely in VMEM.

    tp_ref: (8, 16) per-tile interval params
      [o_lo xyz | o_hi xyz | d_lo xyz | d_hi xyz | len_hi | t_min | t_cap | pad]
    cb_ref: (8, C) planar cluster rows
      [lo_x lo_y lo_z hi_x hi_y hi_z valid pad] — fetched once (constant map).
    Writes conservative entry distances and 0/1 overlap flags.

    The XLA formulation of the same math materializes ~30 (T, C) f32
    intermediates in HBM (measured 4.4 ms at 8100 x 1024 after subtracting
    dispatch overhead); here the whole test runs on registers/VMEM.
    """
    cb = cb_ref[...]
    tp = tp_ref[...]
    entry, ovl = _slab_block(
        tp, tuple(cb[ax : ax + 1, :] for ax in range(3)),
        tuple(cb[3 + ax : 4 + ax, :] for ax in range(3)), cb[6:7, :])
    ovl_ref[...] = ovl.astype(jnp.int32)
    entry_ref[...] = entry


SUPER_BLOCK = 128  # clusters per superblock in the skip-binned kernel
SUPER_MIN_C = 2048  # below this the dense pass is cheap enough


def _slab_block(tp, lo_rows, hi_rows, valid_row):
    """Shared slab math: (1, n) cluster rows vs 8 tiles' interval params.
    Returns (entry, ovl) each (8, n)."""
    n = lo_rows[0].shape[1]
    entry = jnp.full((8, n), -BIG, jnp.float32)
    exit_ = jnp.full((8, n), BIG, jnp.float32)
    for ax in range(3):
        n_lo = lo_rows[ax] - tp[:, 3 + ax : 4 + ax]
        n_hi = hi_rows[ax] - tp[:, ax : ax + 1]
        d_lo = tp[:, 6 + ax : 7 + ax]
        d_hi = tp[:, 9 + ax : 10 + ax]
        same = (d_lo > 0) | (d_hi < 0)
        i_lo = jnp.where(same, 1.0 / d_hi, -BIG)
        i_hi = jnp.where(same, 1.0 / d_lo, BIG)
        a = jnp.clip(n_lo * i_lo, -BIG, BIG)
        b = jnp.clip(n_lo * i_hi, -BIG, BIG)
        cc = jnp.clip(n_hi * i_lo, -BIG, BIG)
        d2 = jnp.clip(n_hi * i_hi, -BIG, BIG)
        entry = jnp.maximum(entry, jnp.minimum(jnp.minimum(a, b),
                                               jnp.minimum(cc, d2)))
        exit_ = jnp.minimum(exit_, jnp.maximum(jnp.maximum(a, b),
                                               jnp.maximum(cc, d2)))
    t_min = tp[:, 13:14]
    entry = jnp.maximum(entry, t_min)
    # Per-tile schedule cap (tp[:, 14], raw ray-t units, BIG = no cap): the
    # any-hit path culls clusters past every lane's t_max here, INSIDE the
    # kernel — an XLA-level (T, C) mask materializes ~100 MB at the primary
    # shadow pass and evicted the Whitted bounce loop's framebuffer VMEM
    # staging (+30 ms, r4 A/B).
    ovl = (entry <= exit_) & (exit_ >= t_min) & (valid_row > 0.5) \
        & (entry <= tp[:, 14:15])
    return entry / tp[:, 12:13], ovl


def _bin_kernel_super_body(tp_ref, cb_ref, sb_ref, entry_ref, ovl_ref):
    """Superblock-skipped binning for LARGE C (the 1M-tri scaling fix).

    A dense (8, C) slab pass is O(T x C) — ~4 GOps at 1M tris.  Here the
    8 tiles first test the S = C/128 superblock hulls (cheap), then only
    overlapping superblocks compute their (8, 128) cluster slice; whole
    missed superblocks skip at the cost of one scalar cond each.
    """
    tp = tp_ref[...]
    c = ovl_ref.shape[1]
    entry_ref[...] = jnp.full((8, c), BIG, jnp.float32)
    ovl_ref[...] = jnp.zeros((8, c), jnp.int32)
    sb = sb_ref[...]
    _, sovl = _slab_block(
        tp, tuple(sb[ax : ax + 1, :] for ax in range(3)),
        tuple(sb[3 + ax : 4 + ax, :] for ax in range(3)), sb[6:7, :])
    for sbi in range(c // SUPER_BLOCK):
        sl = slice(sbi * SUPER_BLOCK, (sbi + 1) * SUPER_BLOCK)

        @pl.when(jnp.any(sovl[:, sbi]))
        def _(sl=sl):
            cb = cb_ref[:, sl]
            e, o = _slab_block(
                tp, tuple(cb[ax : ax + 1, :] for ax in range(3)),
                tuple(cb[3 + ax : 4 + ax, :] for ax in range(3)), cb[6:7, :])
            entry_ref[:, sl] = e
            ovl_ref[:, sl] = o.astype(jnp.int32)


def _bin_pallas(tp, cb, sb=None):
    """(T8, 16) params x (8, C) clusters -> (T8, C) entry, (T8, C) i32 ovl.

    ``sb``: optional (8, S) superblock hull rows — switches to the
    superblock-skipped kernel (used when C >= SUPER_MIN_C)."""
    t8 = tp.shape[0]
    c = cb.shape[1]
    in_specs = [
        pl.BlockSpec((8, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = (tp, cb)
    body = _bin_kernel_body
    if sb is not None:
        s = sb.shape[1]
        in_specs.append(
            pl.BlockSpec((8, s), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args = (tp, cb, sb)
        body = _bin_kernel_super_body
    grid_spec = pl.GridSpec(
        grid=(t8 // 8,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((8, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        body,
        out_shape=[
            jax.ShapeDtypeStruct((t8, c), jnp.float32),
            jax.ShapeDtypeStruct((t8, c), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(*args)


def planar_cluster_rows(cs: ClusterSet) -> jax.Array:
    """(8, Cp) planar AABB rows for the binning kernel (lanes padded to 128
    with invalid clusters).  Precompute once per BVH build."""
    c = cs.aabb_min.shape[0]
    cp = c + ((-c) % 128)
    cb = jnp.zeros((8, cp), jnp.float32)
    cb = cb.at[0:3, :c].set(cs.aabb_min.T)
    cb = cb.at[3:6, :c].set(cs.aabb_max.T)
    cb = cb.at[6, :c].set(cs.valid.astype(jnp.float32))
    return cb


def planar_super_rows(cb: jax.Array) -> jax.Array:
    """(8, Sp) superblock hull rows (hulls of SUPER_BLOCK-cluster runs of
    ``cb``) for the skip-binned kernel, lanes padded to 128."""
    cp = cb.shape[1]
    s = cp // SUPER_BLOCK
    r = cb[:, : s * SUPER_BLOCK].reshape(8, s, SUPER_BLOCK)
    # per-LANE valid mask: pad lanes and invalid clusters carry zeros in cb,
    # which would otherwise drag hulls toward the origin
    lane_ok = r[6:7] > 0.5  # (1, S, B)
    valid = r[6].max(axis=-1)
    lo = jnp.where(lane_ok, r[0:3], BIG).min(axis=-1)
    hi = jnp.where(lane_ok, r[3:6], -BIG).max(axis=-1)
    lo = jnp.where(valid[None, :] > 0.5, lo, BIG)
    hi = jnp.where(valid[None, :] > 0.5, hi, -BIG)
    sp = s + ((-s) % 128)
    sb = jnp.zeros((8, sp), jnp.float32)
    sb = sb.at[0:3, :s].set(lo).at[3:6, :s].set(hi).at[6, :s].set(valid)
    return sb


def _coarsen_bounds(bounds, tiles: int):
    """Adapt precomputed per-tile frustum bounds to the kernel's chunking.

    ``tile_frustum_bounds`` is built at pick_tile's 256-ray pixel tiles, but
    large scenes run the kernel at 768-ray chunks (bvh._auto_tile_r) — three
    CONSECUTIVE tile-major tiles, so a chunk's conservative box is just the
    hull of its tiles' boxes.  Without this the bounds were silently dropped
    on exactly the big scenes the adaptive chunk targets (ADVICE r2 #1),
    re-paying the ~34 ms of (T, R, 3) reduces they exist to skip.

    Returns bounds at ``tiles`` granularity, or None if the shapes don't
    divide evenly (caller falls back to reducing the rays).
    """
    if bounds is None:
        return None
    t0 = bounds["d_lo"].shape[0]
    if t0 == tiles:
        return bounds
    if t0 % tiles:
        return None
    f = t0 // tiles

    def mn(x):
        return x.reshape(tiles, f, 3).min(axis=1)

    def mx(x):
        return x.reshape(tiles, f, 3).max(axis=1)

    out = {"o_lo": mn(bounds["o_lo"]), "o_hi": mx(bounds["o_hi"]),
           "d_lo": mn(bounds["d_lo"]), "d_hi": mx(bounds["d_hi"])}
    if "len_hi" in bounds:
        out["len_hi"] = bounds["len_hi"].reshape(tiles, f).max(axis=1)
    return out


def _nth_set_bit(word, n):
    """Index of the n-th (0-based) set bit of each 32-bit word (vectorized
    popcount binary descent)."""
    bit = jnp.zeros_like(n)
    rem = n
    cur = word
    for width in (16, 8, 4, 2, 1):
        low = cur & jnp.int32((1 << width) - 1)
        c_low = jax.lax.population_count(low)
        go_high = rem >= c_low
        rem = jnp.where(go_high, rem - c_low, rem)
        bit = jnp.where(go_high, bit + width, bit)
        cur = jnp.where(go_high, cur >> width, low)
    return bit


def rank_table_bits(words, cum, cap: int):
    """(T, cap) table: entry j = cluster id of tile t's j-th set bit.

    Built DENSELY — zero gathers.  The word holding rank j is
    ``p = sum_w [cum[t, w] <= j]`` (one (T, cap, W) elementwise compare),
    the word value and its preceding popcount come from one-hot sums over
    the same axis, and the in-word bit via the vectorized popcount descent.
    ~100M VPU ops at 8100 tiles x 1024 clusters — versus the per-sub-visit
    binary searches of the v1 builder whose ~30 gather passes of budget
    rows cost ~5 ms/frame (gathers are ROW-bound at ~76 Mrows/s).

    Ranks >= the tile's count return garbage (callers clamp); ranks >= cap
    are NOT representable — build_visit_groups_table splits those off to
    the v1 path.
    """
    t, w = words.shape
    if w > 64:
        return _rank_table_bits_hier(words, cum, cap)
    j = jnp.arange(cap, dtype=jnp.int32)
    gt = (cum[:, None, :] > j[None, :, None]).astype(jnp.int32)  # (T, cap, W)
    p = w - gt.sum(-1)  # (T, cap) word index of rank j (first w: cum > j)
    oh = gt - jnp.concatenate(
        [jnp.zeros((t, cap, 1), jnp.int32), gt[:, :, :-1]], axis=2)  # 1 at p
    word_at = (words[:, None, :] * oh).sum(-1)  # (T, cap) == words[t, p]
    before = ((cum[:, None, :] * oh).sum(-1) -
              jax.lax.population_count(word_at))  # cum[t, p-1]
    bit = _nth_set_bit(word_at, j[None, :] - before)
    return jnp.minimum(p, w - 1) * 32 + bit


def _rank_table_bits_hier(words, cum, cap: int):
    """rank_table_bits for wide word rows (big C): two-level descent.

    The flat build materializes (T, cap, W) one-hots — ~1 GB of
    intermediates at 1M tris (W = 256).  Here words group into S = W/sub
    SUPERWORDS: rank -> superword via a (T, cap, S) one-hot, then the
    superword's ``sub`` words are SELECTED with batched f32 matmuls
    ((T, cap, S) @ (T, S, sub) einsums — MXU work, values < 2^24 so f32 is
    exact; 32-bit word PATTERNS split into two 16-bit halves to stay
    exact), and the final word is picked by a second (T, cap, sub)
    one-hot.  Peak intermediate is (T, cap, max(S, sub)) ~ 66 MB.
    """
    t, w = words.shape
    sub = 16
    s = -(-w // sub)
    if w % sub:
        pad = s * sub - w
        words = jnp.concatenate(
            [words, jnp.zeros((t, pad), jnp.int32)], axis=1)
        cum = jnp.concatenate(
            [cum, jnp.broadcast_to(cum[:, -1:], (t, pad))], axis=1)
    j = jnp.arange(cap, dtype=jnp.int32)
    cum_s = cum.reshape(t, s, sub)[:, :, -1]  # (T, S) super cumsums
    gt_s = (cum_s[:, None, :] > j[None, :, None]).astype(jnp.float32)
    sp = s - gt_s.sum(-1).astype(jnp.int32)  # (T, cap) superword of rank j
    oh_s = gt_s - jnp.concatenate(
        [jnp.zeros((t, cap, 1), jnp.float32), gt_s[:, :, :-1]], axis=2)

    def sel(vals_f32):  # (T, S, sub) -> (T, cap, sub) rows at sp
        return jnp.einsum("tjs,tsw->tjw", oh_s, vals_f32,
                          precision=_DOT_PRECISION)

    cum_r = cum.reshape(t, s, sub).astype(jnp.float32)
    cum_sel = sel(cum_r)  # (T, cap, sub) — exact: counts < 2^24
    gt_w = (cum_sel > j[None, :, None].astype(jnp.float32)).astype(jnp.int32)
    pw = sub - gt_w.sum(-1)  # in-super word index
    oh_w = (gt_w - jnp.concatenate(
        [jnp.zeros((t, cap, 1), jnp.int32), gt_w[:, :, :-1]], axis=2)
    ).astype(jnp.float32)
    wr = words.reshape(t, s, sub)
    w_lo = sel((wr & 0xFFFF).astype(jnp.float32))
    w_hi = sel(((wr >> 16) & 0xFFFF).astype(jnp.float32))
    word_at = ((w_lo * oh_w).sum(-1).astype(jnp.int32)
               | ((w_hi * oh_w).sum(-1).astype(jnp.int32) << 16))
    before = ((cum_sel * oh_w).sum(-1).astype(jnp.int32)
              - jax.lax.population_count(word_at))
    bit = _nth_set_bit(word_at, j[None, :] - before)
    p = jnp.minimum(sp * sub + pw, w - 1)
    return p * 32 + bit


def _tile_of_visit(offs, g_counts, budget: int, start):
    """tile id of each visit slot in [start, start+budget) — via one
    T-row scatter + a cummax instead of a 13-pass searchsorted."""
    t = offs.shape[0]
    pos = offs - start  # first slot of each tile's group run, window-local
    tid = jnp.arange(t, dtype=jnp.int32)
    # Only tiles with groups scatter (their offs are strictly increasing);
    # out-of-window and empty tiles drop.
    pos = jnp.where((g_counts > 0) & (pos >= 0) & (pos < budget), pos, budget)
    base = jnp.zeros((budget + 1,), jnp.int32).at[pos].max(
        tid + 1, mode="drop")[:budget]
    # The tile already in progress at `start` (its run began before the
    # window): one scalar search seeds slot 0.
    first = jnp.searchsorted(offs + g_counts, start, side="right")
    base = base.at[0].max(jnp.minimum(first, t - 1).astype(jnp.int32) + 1)
    return jax.lax.cummax(base) - 1


def build_visit_groups_bits(words, cum, entry, counts, budget: int, g: int,
                            start=0, rank_offset=None):
    """Grouped visit arrays from bit-walk binning (the general/slow path —
    same contract as binning_oracle.build_visit_groups).  Gather volume
    scales with the BUDGET (a binary search over each tile's ~C/32 running
    word popcounts per sub-visit), never with C.

    ``rank_offset``: optional (T,) i32 added to every in-tile rank —
    ``counts`` then covers only the ranks PAST the offset.  Used by
    _search's overflow phase: the table builder schedules ranks [0, cap)
    cheaply and this path picks up ranks [cap, counts) for the rare tiles
    that exceed the table.
    """
    t, w = words.shape
    start = jnp.asarray(start, jnp.int32)
    g_counts = (counts + g - 1) // g
    ends = jnp.cumsum(g_counts)
    offs = ends - g_counts
    total = ends[-1]
    remaining = jnp.maximum(total - start - budget, 0)

    v = jnp.arange(budget, dtype=jnp.int32) + start
    in_range = v < total
    tile = jnp.searchsorted(ends, v, side="right").astype(jnp.int32)
    tile_c = jnp.minimum(tile, t - 1)
    j = v - offs[tile_c]
    base = j * g
    last = jnp.maximum(counts[tile_c] - 1, 0)
    if rank_offset is not None:
        roff = rank_offset[tile_c]
        base = base + roff
        last = last + roff

    nbits = max((w - 1).bit_length(), 1)

    def word_of(r):
        """Smallest p with cum[tile, p] > r."""
        lo = jnp.zeros_like(r)
        for b in reversed(range(nbits)):
            cand = lo + (1 << b)
            val = cum[tile_c, jnp.minimum(cand, w) - 1]
            lo = jnp.where((cand <= w) & (val <= r), cand, lo)
        return jnp.minimum(lo, w - 1)

    vcs = []
    ve = None
    for kk in range(g):
        r = jnp.minimum(base + kk, last)
        p = word_of(r)
        before = jnp.where(p > 0, cum[tile_c, jnp.maximum(p - 1, 0)], 0)
        cl = p * 32 + _nth_set_bit(words[tile_c, p], r - before)
        valid_kk = in_range & (base + kk <= last)
        vcs.append(jnp.where(valid_kk, cl, -1))
        e = entry[tile_c, jnp.minimum(cl, entry.shape[1] - 1)]
        # Unordered groups: the early-out needs the MIN entry over the
        # group's clusters to stay conservative.
        e = jnp.where(valid_kk, e, BIG)
        ve = e if ve is None else jnp.minimum(ve, e)

    ve = jnp.where(in_range, jnp.where(jnp.isfinite(ve), ve, 0.0), 0.0)
    visit_tile = jnp.where(in_range, tile_c, t)
    visit_first = (in_range & ((j == 0) | (v == start))).astype(jnp.int32)
    return visit_tile, vcs, visit_first, ve, remaining


def build_visit_groups_table(table, entry, counts, budget: int, g: int,
                             start=0):
    """Grouped visit arrays via the precomputed rank table — the FAST path.

    Same contract as build_visit_groups_bits but ``counts`` must already be
    clamped to the table's cap.  Per sub-visit this costs ONE table gather
    and ONE entry gather (vs the v1 path's 5-gather binary search per
    sub-visit), and the visit->tile map costs one T-row scatter + cummax
    (vs a 13-pass searchsorted).
    """
    t, cap = table.shape
    start = jnp.asarray(start, jnp.int32)
    g_counts = (counts + g - 1) // g
    ends = jnp.cumsum(g_counts)
    offs = ends - g_counts
    total = ends[-1]
    remaining = jnp.maximum(total - start - budget, 0)

    v = jnp.arange(budget, dtype=jnp.int32) + start
    in_range = v < total
    tile_c = jnp.minimum(_tile_of_visit(offs, g_counts, budget, start), t - 1)
    tile_c = jnp.maximum(tile_c, 0)
    j = v - offs[tile_c]
    base = j * g
    last = jnp.maximum(counts[tile_c] - 1, 0)

    vcs = []
    ve = None
    for kk in range(g):
        r = jnp.minimum(base + kk, last)
        cl = table[tile_c, jnp.clip(r, 0, cap - 1)]
        valid_kk = in_range & (base + kk <= last)
        vcs.append(jnp.where(valid_kk, cl, -1))
        e = entry[tile_c, jnp.clip(cl, 0, entry.shape[1] - 1)]
        e = jnp.where(valid_kk, e, BIG)
        ve = e if ve is None else jnp.minimum(ve, e)

    ve = jnp.where(in_range, jnp.where(jnp.isfinite(ve), ve, 0.0), 0.0)
    visit_tile = jnp.where(in_range, tile_c, t)
    visit_first = (in_range & ((j == 0) | (v == start))).astype(jnp.int32)
    return visit_tile, vcs, visit_first, ve, remaining


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

VISIT_GROUP = 4  # clusters folded per grid step

# Operand/precision schemes for the per-group MXU dot (tools/dma_ab.py A/Bs
# them; production picks the measured winner):
#   "native"  — pre-split bf16x3 stacks (planar_split/rays_split), ONE
#               native-precision pass; 48 rows -> 98 KB/cluster DMA.
#   "f32_3x"  — raw f32 operands, Precision.HIGH (3-pass bf16x3 in the MXU):
#               8 rows -> 32 KB/cluster DMA, ~2-split accuracy (~1e-5 rel).
#   "f32_6x"  — raw f32 operands, Precision.HIGHEST (6-pass): 32 KB, exact.
#   "f32_1x"  — raw f32, DEFAULT (1-pass bf16): accuracy-leaky DMA ceiling
#               probe only.
#   "bary6"   — like "native" but the operand drops the third-barycentric
#               rows (6 column groups instead of 8: 74 KB/cluster DMA, 25%
#               fewer MXU output tiles) and the kernel computes
#               w' = 1 - u - v on the VPU (+1 op/pair).  The r3 golf that
#               introduced the w rows traded the other way; kernel_micro r4
#               showed the step is MXU/DMA-bound (machinery 0.63 us +
#               compute 1.58 us vs a ~0.1 us VPU op), inverting the trade.
_DOT_SCHEMES = {
    "native": None,
    "bary6": None,
    # bary6 with the per-pair divide replaced by the VPU's approximate
    # reciprocal (r4 measured the exact divide at parity ONCE, 29.16 vs
    # 29.39 ms; VERDICT r5 #1c asks for the retry).  No accept widening:
    # the approx error (~2^-14 rel) sits below the packed-t truncation
    # (2^-12) and the exact hit_record MT pass re-adjudicates t anyway.
    "bary6r": None,
    "f32_1x": jax.lax.Precision.DEFAULT,
    "f32_3x": jax.lax.Precision.HIGH,  # unsupported by Mosaic (kept for doc)
    "f32_6x": jax.lax.Precision.HIGHEST,
}
_BARY6_FAMILY = ("bary6", "bary6r")


def _make_kernel(k: int, tile_r: int, n_real_tiles: int, t_min: float, g: int,
                 count_exec: bool = False, scheme: str = "native"):
    # The group-local column rides the 11 low mantissa bits of packed t;
    # sentinel 2047 marks "carried best wins", so g*k must stay below it.
    if g * k > 2047:
        raise ValueError(f"g*k = {g * k} exceeds the 11-bit column budget")
    kshift = (k - 1).bit_length()  # k is a power of two

    def kernel(vt_ref, vf_ref, ve_ref, vcg_ref, rays_ref, init_t_ref,
               init_slot_ref, *w_out_refs):
        w_refs = w_out_refs[:g]
        out_t_ref, out_slot_ref = w_out_refs[g], w_out_refs[g + 1]
        v = pl.program_id(0)
        tile = vt_ref[v]
        is_real = tile < n_real_tiles
        # First visit of this tile IN THIS LAUNCH: seed the carried outputs
        # from the launch seeds (overflow relaunches pass the previous
        # launch's best).
        is_first = vf_ref[v] == 1

        @pl.when(is_first & is_real)
        def _():
            out_t_ref[0, 0, :] = init_t_ref[0, 0, :]
            out_slot_ref[0, 0, :] = init_slot_ref[0, 0, :]

        executed = is_real & (ve_ref[v] <= jnp.max(out_t_ref[0, 0, :]))
        if count_exec:
            # Diagnostic build (tools/exec_stats.py): per-step count of
            # sub-visits whose fold actually ran, for executed-vs-scheduled
            # pair accounting.  Not compiled in production launches.
            n_valid = sum((vcg_ref[kk, v] >= 0).astype(jnp.int32)
                          for kk in range(g))
            w_out_refs[g + 2][0, 0, :] = jnp.broadcast_to(
                jnp.where(executed, n_valid, 0).astype(jnp.int32), (128,))

        # Early-out: groups are near-to-far per tile, so once this group's
        # conservative entry exceeds every ray's current best the tile's
        # remaining groups cannot improve anything.
        @pl.when(executed)
        def _():
            rays = rays_ref[0]  # (48, R) bf16 — rays on LANES
            best_t = out_t_ref[0, 0, :]
            best_slot = out_slot_ref[0, 0, :]
            # The per-pair VPU tail is the frame's dominant cost, so every
            # op counts:
            # * TRANSPOSED layout: the matmul contracts the shared 8-row
            #   axis (W^T @ raysT), putting triangles on SUBLANES and rays
            #   on LANES — the tail runs at full lane width for ANY k >= 8
            #   (the row-major layout wasted lanes below k=128: measured
            #   2.8x slower at k=64), which is what makes fine-grained
            #   culling affordable — yet fine k still LOSES end-to-end
            #   (k=64: 39-41 ms vs k=128's 29.6 despite 27% fewer pairs;
            #   a pre-gathered contiguous (g, 8, 6k) stream variant that
            #   cut the per-step DMA issues to one was slower still at
            #   34.7 ms from its ~1 GB/frame of gather traffic, so k=128
            #   with per-cluster indexed fetches stays the optimum);
            # * validity is ONE compare via q = min(u, v, 1-u-v) >= 0,
            # * "closer than carried best" is NOT tested per pair — the
            #   carried best rides the packed lane reduce as a (t | 2047)
            #   sentinel entry, moving that compare from per-pair to
            #   per-ray (this also re-registers equal-t winners after an
            #   overflow relaunch for free),
            # * the divide: r4's approx-reciprocal probe measured parity
            #   (29.16 vs 29.39 ms) at 256-ray chunks, but at the r5
            #   768-ray production chunks it is a real cost — scheme
            #   "bary6r" (the default) replaces it with the VPU's approx
            #   reciprocal for +10-15% (see _DOT_SCHEMES / TPU_RUNS_r5.md),
            # * -1 (padding) sub-visits are predicated off entirely.
            # Pack (t | row) into one sortable i32: for t > 0 the f32
            # bit pattern is order-isomorphic to i32; the 11 low mantissa
            # bits carry the group-local triangle index (kk*k + row).
            m = (jax.lax.bitcast_convert_type(best_t, jnp.int32)
                 & jnp.int32(~2047)) | 2047

            def fold(kk, m):
                # Operands are PRE-SPLIT bf16 hi/lo stacks (planar_split /
                # rays_split): one native-precision K=32 pass reconstructs
                # ~16-bit-mantissa f32 products.  Do NOT pass f32 operands
                # here — Mosaic's default dot precision is 1-pass bf16
                # (~1e-2 relative, leaks edge hits) and fp32 contract
                # precision (HIGHEST) measured ~2x on the frame.
                # Column layout (planar_mats): the z origin row arrives
                # NEGATED (t needs no negate) and the third barycentric has
                # its own rows (one fma, not two subtracts); the validity +
                # t_min tests share one min tree, so the whole accept test
                # is a single compare against zero.
                mm = jax.lax.dot_general(
                    w_refs[kk][0], rays, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_DOT_SCHEMES[scheme])  # (8k or 6k, R)
                if scheme in _BARY6_FAMILY:
                    # 6 column groups [u_o v_o -z_o | du dv dz]; w' on VPU
                    if scheme == "bary6r":
                        tt = mm[2 * k : 3 * k] * pl.reciprocal(
                            mm[5 * k : 6 * k], approx=True)
                    else:
                        tt = mm[2 * k : 3 * k] / mm[5 * k : 6 * k]
                    u = mm[0 * k : 1 * k] + tt * mm[3 * k : 4 * k]
                    vv = mm[1 * k : 2 * k] + tt * mm[4 * k : 5 * k]
                    ww = 1.0 - u - vv
                else:
                    tt = mm[2 * k : 3 * k] / mm[6 * k : 7 * k]
                    u = mm[0 * k : 1 * k] + tt * mm[4 * k : 5 * k]
                    vv = mm[1 * k : 2 * k] + tt * mm[5 * k : 6 * k]
                    ww = mm[3 * k : 4 * k] + tt * mm[7 * k : 8 * k]
                q = jnp.minimum(jnp.minimum(u, vv),
                                jnp.minimum(ww, tt - t_min))
                row = jax.lax.broadcasted_iota(jnp.int32, (k, tile_r), 0)
                packed = (pltpu.bitcast(tt, jnp.int32) & jnp.int32(~2047)) | (
                    row + kk * k)
                # NaN/inf t or bary => q NaN/negative => false
                packed = jnp.where(q >= 0.0, packed, jnp.int32(2**31 - 2))
                return jnp.minimum(m, jnp.min(packed, axis=0))

            for kk in range(g):
                m = jax.lax.cond(
                    vcg_ref[kk, v] >= 0,
                    lambda mm_, kk=kk: fold(kk, mm_),
                    lambda mm_: mm_, m)
            sel = m & 2047
            # Decode the winning cluster id among the g candidates (per-ray
            # selects are ~1/k of the per-pair tail — negligible).
            c_sel = jnp.full((tile_r,), vcg_ref[0, v], jnp.int32)
            j = sel >> kshift
            for kk in range(1, g):
                c_sel = jnp.where(j == kk, vcg_ref[kk, v], c_sel)
            changed = sel < 2047
            out_t_ref[0, 0, :] = jax.lax.bitcast_convert_type(
                m & jnp.int32(~2047), jnp.float32)
            out_slot_ref[0, 0, :] = jnp.where(
                changed, c_sel * k + (sel & (k - 1)), best_slot)

    return kernel


def _fill_pad(vcg: jax.Array) -> jax.Array:
    """Re-encode padding sub-visits so they cost NO operand DMA.

    A padding entry (-1) used to map to block 0 — a block-index CHANGE from
    the previous grid step, so the pipeline re-fetched ~98 KB that the
    predicated-off fold never read (measured 28% of sub-visit slots on the
    100k frame, plus every trailing padding step).  Instead each padding
    entry repeats ITS ref's previous step's cluster as ``-(id + 2)``: the
    index map resolves it to the same block (copy skipped by revisiting),
    while the ``>= 0`` compute predicate still sees it as padding.
    """
    g, b = vcg.shape
    valid = vcg >= 0
    idx = jnp.where(valid, jnp.arange(b, dtype=jnp.int32)[None, :], -1)
    last = jax.lax.cummax(idx, axis=1)  # index of last valid entry <= v
    fill = jnp.take_along_axis(vcg, jnp.maximum(last, 0), axis=1)
    fill = jnp.where(last >= 0, -(fill + 2), -1)  # no earlier entry: block 0
    return jnp.where(valid, vcg, fill)


def _pad_block(x):
    """Resolve a (possibly pad-encoded) cluster id to its block index."""
    return jnp.maximum(jnp.where(x < 0, -x - 2, x), 0)


@partial(jax.jit, static_argnames=("k", "tile_r", "budget", "count_exec",
                                   "scheme"))
def _launch(rays8, init_t, init_slot, vt, vcs, vf, ve, w, k: int, tile_r: int,
            budget: int, count_exec: bool = False, scheme: str = "native"):
    """One kernel launch over a grouped visit chunk.

    rays8: (T+1, 48, R) bf16 split stack incl. dummy tile ("native" scheme;
    f32 schemes take (T+1, 8, R) f32 and w (C, 8, 8k) f32 — see
    _DOT_SCHEMES); init_t/init_slot: (T+1, 1, R).
    Returns updated (best_t, best_slot) of the same shape.

    Cluster ids ride SMEM as ONE (g, budget) array (the minor dim is the
    budget, so the 128-lane SMEM padding is amortized — g separate arrays
    hit the 1 MB SMEM cap at large budget x g), and the per-tile "first
    visit" flag is derived from vt in-kernel instead of a second array.
    """
    _check_tile_r(tile_r)
    g = len(vcs)
    n_slots = rays8.shape[0]
    ray_rows = rays8.shape[1]
    w_rows, w_cols = w.shape[1], w.shape[2]
    # The OPERAND LAYOUT is determined by w's column count (6k = bary6,
    # 8k = native/f32) — shape wins over the flag so direct callers can't
    # mispair a bary6 wplanar with the default scheme (the kernel would
    # slice empty row ranges); the flag still selects the dot precision.
    if w_cols == 6 * k:
        scheme = scheme if scheme in _BARY6_FAMILY else "bary6"
    elif scheme in _BARY6_FAMILY:
        scheme = "native"
    vcg = _fill_pad(jnp.stack(vcs, axis=0))  # (g, budget)

    def tile_map(v, vt, vf, ve, vcg):
        return (vt[v], 0, 0)

    def cluster_map(kk):
        def f(v, vt, vf, ve, vcg):
            return (_pad_block(vcg[kk, v]), 0, 0)  # pad -> previous block
        return f

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # tile / first / entry / (g, budget) ids
        grid=(budget,),
        in_specs=[
            pl.BlockSpec((1, ray_rows, tile_r), tile_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_r), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_r), tile_map, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, w_rows, w_cols), cluster_map(kk),
                         memory_space=pltpu.VMEM)
            for kk in range(g)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_r), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_r), tile_map, memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((1, 1, 128), lambda v, vt, vf, ve, vcg: (v, 0, 0),
                           memory_space=pltpu.VMEM)] if count_exec else []),
    )
    out = pl.pallas_call(
        _make_kernel(k, tile_r, n_slots - 1, T_MIN, g, count_exec=count_exec,
                     scheme=scheme),
        out_shape=[
            jax.ShapeDtypeStruct((n_slots, 1, tile_r), jnp.float32),
            jax.ShapeDtypeStruct((n_slots, 1, tile_r), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((budget, 1, 128), jnp.int32)]
             if count_exec else []),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(vt, vf, ve, vcg, rays8, init_t, init_slot, *([w] * g))
    out_t, out_slot = out[0], out[1]
    # Tiles with zero visits never ran: keep their seeds.
    touched_t = jnp.zeros((n_slots,), bool).at[vt].set(True, mode="drop")
    out_t = jnp.where(touched_t[:, None, None], out_t, init_t)
    out_slot = jnp.where(touched_t[:, None, None], out_slot, init_slot)
    if count_exec:
        return out_t, out_slot, out[2][:, 0, 0]
    return out_t, out_slot


def _make_anyhit_kernel(k: int, tile_r: int, n_real_tiles: int, t_min: float,
                        g: int, scheme: str = "native"):
    """Occlusion ("any hit") kernel — hardware shadow rays' cheap path.

    Differences from the closest-hit kernel that make shadow batches cheap:
    * no packed t|slot machinery — per cluster it folds ONE boolean
      ``any(valid & t < t_max)`` into the carried blocked flag;
    * the early-out gate masks BLOCKED rays out of the tile max: a tile
      stops visiting as soon as every armed ray found *some* occluder
      (closest-hit must keep refining until entries pass the closest t).
    """

    def kernel(*refs):
        vt_ref, vf_ref, ve_ref, vcg_ref = refs[0], refs[1], refs[2], refs[3]
        rays_ref, tmax_ref, init_b_ref = refs[4], refs[5], refs[6]
        w_refs = refs[7 : 7 + g]
        out_b_ref = refs[7 + g]

        v = pl.program_id(0)
        tile = vt_ref[v]
        is_real = tile < n_real_tiles
        is_first = vf_ref[v] == 1

        @pl.when(is_first & is_real)
        def _():
            out_b_ref[0, 0, :] = init_b_ref[0, 0, :]

        # 2D shapes throughout: rank-1 where/max mixes trip a Mosaic layout
        # check (layout.h implicit_dim) on sub-lane-width blocks.
        gate = jnp.max(jnp.where(out_b_ref[0] == 1, -BIG, tmax_ref[0]))

        @pl.when(is_real & (ve_ref[v] <= gate))
        def _():
            rays = rays_ref[0]  # (48, R) bf16 — transposed, see _make_kernel
            acc = out_b_ref[0]  # (1, R) — rank-2 through the cond carries
            tmax2 = tmax_ref[0]  # (1, R)

            def fold(kk, acc):
                # pre-split bf16 operands + golfed column layout: see
                # _make_kernel's fold / planar_mats / _DOT_SCHEMES
                mm = jax.lax.dot_general(
                    w_refs[kk][0], rays, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_DOT_SCHEMES[scheme])  # (8k or 6k, R)
                if scheme in _BARY6_FAMILY:
                    if scheme == "bary6r":
                        tt = mm[2 * k : 3 * k] * pl.reciprocal(
                            mm[5 * k : 6 * k], approx=True)
                    else:
                        tt = mm[2 * k : 3 * k] / mm[5 * k : 6 * k]
                    u = mm[0 * k : 1 * k] + tt * mm[3 * k : 4 * k]
                    vv = mm[1 * k : 2 * k] + tt * mm[4 * k : 5 * k]
                    ww = 1.0 - u - vv
                else:
                    tt = mm[2 * k : 3 * k] / mm[6 * k : 7 * k]
                    u = mm[0 * k : 1 * k] + tt * mm[4 * k : 5 * k]
                    vv = mm[1 * k : 2 * k] + tt * mm[5 * k : 6 * k]
                    ww = mm[3 * k : 4 * k] + tt * mm[7 * k : 8 * k]
                q = jnp.minimum(jnp.minimum(u, vv),
                                jnp.minimum(ww, tt - t_min))
                ok = (q >= 0.0) & (tt < tmax2)
                return jnp.where(jnp.any(ok, axis=0, keepdims=True), 1, acc)

            for kk in range(g):
                acc = jax.lax.cond(
                    vcg_ref[kk, v] >= 0,
                    lambda a, kk=kk: fold(kk, a),
                    lambda a: a, acc)
            out_b_ref[0] = acc

    return kernel


def _pick_budget(tiles: int, budget: int) -> tuple[int, int]:
    """Right-size the kernel grid to the (static) tile count (VERDICT r3
    #5: the launch was ALWAYS ``VISIT_BUDGET`` steps, so a 507-tile Whitted
    bounce chunk burned ~9.7k ~0.9 us padding steps ≈ 8 ms per pass).

    The first window is the smallest power of two >= tiles — one group per
    tile is the overwhelmingly common schedule, so most frames finish in
    one launch with < tiles padding steps.  Data-dependent overflow walks
    REFILL-sized windows (bounded waste: < refill steps total, vs < budget
    before), at the cost of one extra cached kernel compilation.
    """
    first = min(budget, max(256, 1 << max(tiles - 1, 1).bit_length()))
    # refill=8192 measured 1% SLOWER at Whitted 1080p (r4): overflow
    # windows run full of real groups, so wider windows only add padding.
    # r5 re-confirmed on the 32k-tile shadow batch: refill first//4 AND
    # an auto-scaled any-hit budget both measured 321 vs 316 ms — the
    # while-loop "machinery" around the any-hit launches is the launches
    # themselves, not schedule-build slack.
    return first, min(first, 2048)


def _check_tile_r(tile_r: int) -> None:
    """Mosaic safe envelope: sub-lane-width ray blocks hang the REMOTE
    compile/run silently (r2 weak #5: tile_r=64 any-hit never returned —
    invalid tilings may hang instead of raising, see CLAUDE.md).  Reject
    them loudly on every launch path."""
    if tile_r < 128:
        raise ValueError(
            f"tile_r={tile_r} is below the Mosaic safe envelope (>=128): "
            "sub-lane-width blocks hang the TPU kernel instead of raising")
    if tile_r % 128:
        raise ValueError(f"tile_r={tile_r} must be a multiple of 128 lanes")


@partial(jax.jit, static_argnames=("k", "tile_r", "budget", "scheme"))
def _launch_anyhit(rays8, tmax, init_b, vt, vcs, vf, ve, w, k: int,
                   tile_r: int, budget: int, scheme: str = "native"):
    """One any-hit launch; returns the updated blocked flags (T+1, 1, R) i32."""
    _check_tile_r(tile_r)
    g = len(vcs)
    n_slots = rays8.shape[0]
    ray_rows = rays8.shape[1]
    w_rows, w_cols = w.shape[1], w.shape[2]
    if w_cols == 6 * k:  # shape wins — see _launch
        scheme = scheme if scheme in _BARY6_FAMILY else "bary6"
    elif scheme in _BARY6_FAMILY:
        scheme = "native"
    vcg = _fill_pad(jnp.stack(vcs, axis=0))  # (g, budget) — see _launch

    def tile_map(v, vt, vf, ve, vcg):
        return (vt[v], 0, 0)

    def cluster_map(kk):
        def f(v, vt, vf, ve, vcg):
            return (_pad_block(vcg[kk, v]), 0, 0)  # pad -> previous block
        return f

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(budget,),
        in_specs=[
            pl.BlockSpec((1, ray_rows, tile_r), tile_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_r), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_r), tile_map, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, w_rows, w_cols), cluster_map(kk),
                         memory_space=pltpu.VMEM)
            for kk in range(g)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_r), tile_map, memory_space=pltpu.VMEM),
        ],
    )
    (out_b,) = pl.pallas_call(
        _make_anyhit_kernel(k, tile_r, n_slots - 1, T_MIN, g, scheme=scheme),
        out_shape=[jax.ShapeDtypeStruct((n_slots, 1, tile_r), jnp.int32)],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(vt, vf, ve, vcg, rays8, tmax, init_b, *([w] * g))
    touched = jnp.zeros((n_slots,), bool).at[vt].set(True, mode="drop")
    return jnp.where(touched[:, None, None], out_b, init_b)


@partial(jax.jit, static_argnames=("tile_r", "budget", "g", "scheme"))
def _search_anyhit(origins, dirs, t_max, cs: ClusterSet, wplanar, tile_r: int,
                   budget: int, bounds=None, g: int | None = None,
                   scheme: str = "native"):
    """(N,) bool — some triangle lies in (t_min, t_max[i])."""
    if g is None:
        g = _auto_g(cs.aabb_min.shape[0], cs.k)
    n = origins.shape[0]
    pad = (-n) % tile_r
    if pad:
        origins = jnp.concatenate([origins, jnp.full((pad, 3), 1e30,
                                                     jnp.float32)])
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), jnp.float32)])
        bounds = None
    m = origins.shape[0]
    tiles = m // tile_r
    bounds = _coarsen_bounds(bounds, tiles)

    ot = origins.reshape(tiles, tile_r, 3)
    dt = dirs.reshape(tiles, tile_r, 3)
    # Shadow rays END at a known t (the light): a cluster whose conservative
    # entry lies beyond every lane's t_max can never occlude, so drop it at
    # SCHEDULING time — the kernel's per-step gate already skips its
    # compute, but each scheduled group still costs fixed step machinery
    # (~0.44 us, r4 kernel_micro) and a budget slot.  Valid only against
    # the empirical hull (bounds None), where entry shares the rays' t
    # units; margin mirrors the phase-2 recull's fp slack.  Fully-disarmed
    # tiles (all t_max <= 0: parked shadow tails) cap at ~0 and schedule
    # nothing at all.
    t_cap = None
    if bounds is None:
        tile_tmax = jnp.max(t_max.reshape(tiles, tile_r), axis=1)
        t_cap = tile_tmax * (1.0 + 2.0 ** -11) + 1e-7
    # Same two-phase scheduling as _search: rank-table fast path for ranks
    # [0, cap), v1 word-search overflow for the rare fat tiles.
    words, cum, entry, counts = bin_clusters_bits(ot, dt, cs, bounds=bounds,
                                                  t_cap=t_cap)
    cap = min(_auto_rank_cap(cs.aabb_min.shape[0]), words.shape[1] * 32)
    counts_lo = jnp.minimum(counts, cap)
    counts_hi = counts - counts_lo
    table = rank_table_bits(words, cum, cap)
    first_b, refill_b = _pick_budget(tiles, budget)

    def make_lo(start, b):
        return build_visit_groups_table(table, entry, counts_lo, b, g,
                                        start=start)

    def make_hi(start, b):
        return build_visit_groups_bits(words, cum, entry, counts_hi, b,
                                       g, start=start, rank_offset=counts_lo)

    rays8 = jnp.concatenate(
        [origins, jnp.ones((m, 1), jnp.float32), dirs,
         jnp.zeros((m, 1), jnp.float32)], axis=1,
    ).reshape(tiles, tile_r, 8).swapaxes(1, 2)  # (T, 8, R)
    rays8 = jnp.concatenate(
        [rays8, jnp.zeros((1, 8, tile_r), jnp.float32)], axis=0
    )
    rays8 = rays_split(rays8)  # (T+1, 48, R) bf16 hi/mid/lo stack
    tmax3 = jnp.concatenate(
        [t_max.reshape(tiles, 1, tile_r),
         jnp.zeros((1, 1, tile_r), jnp.float32)]
    )
    # NOTE: disarmed lanes (t_max <= t_min) are left UNblocked even though
    # seeding them blocked would free the per-tile early-out gate — the
    # seed's extra tmax3 consumer re-shuffled XLA memory assignment and
    # cost the Whitted bounce loop its framebuffer VMEM staging (+32 ms at
    # 1080p, r4 A/B).  Disarmed lanes pin the gate at 0, which only keeps
    # entry<=0 clusters alive; sorted shadow batches segregate them into
    # fully-parked tiles anyway.
    blocked = jnp.zeros((tiles + 1, 1, tile_r), jnp.int32)

    vt, vcs, vf, ve, _ = make_lo(0, first_b)
    blocked = _launch_anyhit(rays8, tmax3, blocked, vt, vcs, vf, ve, wplanar,
                             cs.k, tile_r, first_b, scheme=scheme)

    total_lo = jnp.sum((counts_lo + g - 1) // g)
    total_hi = jnp.sum((counts_hi + g - 1) // g)

    def cond_of(total):
        def cond(state):
            start, b = state
            # Stop early once every armed ray is blocked — the usual case
            # for shadow batches in occluded scenes.
            armed = (tmax3[:tiles] > T_MIN) & (b[:tiles] == 0)
            return (start < total) & jnp.any(armed)
        return cond

    def body_of(make_groups, bw):
        def body(state):
            start, b = state
            vt2, vcs2, vf2, ve2, _ = make_groups(start, bw)
            b2 = _launch_anyhit(rays8, tmax3, b, vt2, vcs2, vf2, ve2, wplanar,
                                cs.k, tile_r, bw, scheme=scheme)
            return start + bw, b2
        return body

    _, blocked = jax.lax.while_loop(cond_of(total_lo),
                                    body_of(make_lo, refill_b),
                                    (jnp.int32(first_b), blocked))
    _, blocked = jax.lax.while_loop(cond_of(total_hi),
                                    body_of(make_hi, refill_b),
                                    (jnp.int32(0), blocked))
    return (blocked[:tiles].reshape(-1) == 1)[:n]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _mt_refine(o, d, slot, cs: ClusterSet):
    """Exact Möller-Trumbore (t, u, v) of each ray's winning sorted slot."""
    s = jnp.maximum(slot, 0)
    a = cs.v0[s]
    e1 = cs.e1[s]
    e2 = cs.e2[s]
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv_det = jnp.where(det != 0, 1.0 / det, 0.0)
    sv = o - a
    u = jnp.sum(sv * p, axis=-1) * inv_det
    q = jnp.cross(sv, e1)
    v = jnp.sum(d * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    return t, u, v


RANK_CAP = 128  # rank-table width: covers p99 tiles; the rest overflow


def _auto_g(n_clusters: int, k: int) -> int:
    """Clusters folded per grid step, by scene size (r5 tools/r5_1m_ab.py).

    Tiny scenes (the reference's shipped Dragon: 32 clusters, ~1-2 binned
    per tile) are FLOOR-bound: most of a g=4 step is padded sub-visit
    slots, and shrinking the step lowers the whole frame's machinery floor
    (Dragon 5.8-6.1 -> 5.1-5.3 ms, 362 -> 403 Mrays/s at g=1, repeated
    x3).  Deeper scenes amortize the per-step fixed cost over real
    sub-visits and want the 512-triangle step (100k: 159.0 at g=4 vs
    148.7 at g=1; 1M: g=2/g=4 parity at cap=256)."""
    if n_clusters <= 256:
        return 1
    return max(1, 512 // k)


def _auto_rank_cap(n_clusters: int) -> int:
    """Scale-dependent rank-table width (r5 tools/r5_1m_ab.py sweep).

    Deep scenes push many tiles past 128 binned clusters into the
    gather-heavier bits-builder overflow path; widening the table to 256
    moves them back (1M: 35.4 vs 37.0 ms, repeated x3).  Shallow scenes
    pay for the wider table instead (100k: 13.0 at 128 vs 13.6 at 256),
    so the width follows the cluster count."""
    return RANK_CAP if n_clusters <= 2048 else 256


@partial(jax.jit, static_argnames=("tile_r", "budget", "g", "cap",
                                   "phase_cap", "scheme"))
def _search(origins, dirs, t_init, cs: ClusterSet, wplanar, tile_r: int,
            budget: int, bounds=None, g: int | None = None,
            cap: int | None = None, phase_cap: int = 0,
            scheme: str = "native", t_cap=None):
    """(best_t, best_slot) over all rays (padded to whole tiles inside).

    ``g`` (clusters folded per grid step) defaults to 512 // k so a step
    always covers 512 triangles regardless of cluster granularity.

    Scheduling is two-phase: ranks [0, cap) of every tile come from the
    dense rank table (gather-light fast path — the overwhelming majority;
    p99 tiles bin < cap clusters), then a while_loop picks up ranks
    [cap, counts) for the rare fat tiles via the general v1 builder.  The
    while body only executes when such tiles exist.

    ``phase_cap`` > 0 switches to the T-CAPPED schedule for deep scenes:
    phase 1 runs only each tile's nearest ``phase_cap`` binned clusters,
    then the achieved per-tile max best_t CULLS the remaining clusters at
    re-binning time (``entry > t_cap`` never gets scheduled) — the same
    criterion as the kernel's per-step early-out, applied before paying
    any per-step cost.  Exact: a cluster is dropped only when no ray in
    the tile can still be improved by it.
    """
    if g is None:
        g = _auto_g(cs.aabb_min.shape[0], cs.k)
    if cap is None:
        cap = _auto_rank_cap(cs.aabb_min.shape[0])
    if phase_cap < 0 or phase_cap > cap:
        raise ValueError(f"phase_cap {phase_cap} must lie in [0, cap={cap}]")
    n = origins.shape[0]
    pad = (-n) % tile_r
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((pad, 3), jnp.float32)])
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])
        t_init = jnp.concatenate([t_init, jnp.zeros((pad,), jnp.float32)])
        bounds = None  # precomputed bounds no longer line up with tiles
    m = origins.shape[0]
    tiles = m // tile_r
    bounds = _coarsen_bounds(bounds, tiles)

    # Seed each ray's carried best with its SCENE-EXIT distance: a ray can
    # have no hit past the point it leaves the scene box, so tiles mixing
    # hit and sky rays (the silhouette p99 tail that dominates visits) can
    # early-out instead of being pinned open by sky rays' t=10000 seeds.
    # The margin covers the packed-t truncation fuzz so boundary hits
    # still register against the seed.
    lo = jnp.min(jnp.where(cs.valid[:, None], cs.aabb_min, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(cs.valid[:, None], cs.aabb_max, -jnp.inf), axis=0)
    tn, tf = jnp.float32(-3e38), jnp.float32(3e38)
    for ax in range(3):
        inv = 1.0 / jnp.where(jnp.abs(dirs[:, ax]) < 1e-12,
                              jnp.where(dirs[:, ax] < 0, -1e-12, 1e-12),
                              dirs[:, ax])
        a = (lo[ax] - origins[:, ax]) * inv
        b = (hi[ax] - origins[:, ax]) * inv
        tn = jnp.maximum(tn, jnp.minimum(a, b))
        tf = jnp.minimum(tf, jnp.maximum(a, b))
    exit_t = jnp.where((tn <= tf) & (tf > 0), tf, T_MIN)
    t_init = jnp.minimum(t_init, exit_t * 1.001 + 1e-2)

    ot = origins.reshape(tiles, tile_r, 3)
    dt = dirs.reshape(tiles, tile_r, 3)
    # ``t_cap``: optional (tiles,) per-tile closest-hit upper bound (raw ray
    # t units, e.g. from a depth prepass) — clusters whose conservative
    # entry exceeds it are never scheduled (cheaper than the per-step
    # early-out, which still pays fixed machinery per skipped group).
    if t_cap is not None and pad:
        t_cap = None  # caller's per-tile caps no longer line up with tiles
    # Sort-free bit-walk binning (see bin_clusters_bits) — one path for
    # all scene sizes.
    words, cum, entry, counts = bin_clusters_bits(ot, dt, cs, bounds=bounds,
                                                  t_cap=t_cap)
    cap = min(cap, words.shape[1] * 32)
    counts_lo = jnp.minimum(counts, cap)
    counts_hi = counts - counts_lo
    table = rank_table_bits(words, cum, cap)

    first_b, refill_b = _pick_budget(tiles, budget)

    def make_lo(start, b):
        return build_visit_groups_table(table, entry, counts_lo, b, g,
                                        start=start)

    def make_hi(start, b):
        return build_visit_groups_bits(words, cum, entry, counts_hi, b,
                                       g, start=start, rank_offset=counts_lo)

    rays8 = jnp.concatenate(
        [origins, jnp.ones((m, 1), jnp.float32), dirs,
         jnp.zeros((m, 1), jnp.float32)], axis=1,
    ).reshape(tiles, tile_r, 8).swapaxes(1, 2)  # (T, 8, R): rays on lanes
    rays8 = jnp.concatenate(  # dummy tile slot for padding visits
        [rays8, jnp.zeros((1, 8, tile_r), jnp.float32)], axis=0
    )
    rays8 = rays_split(rays8)  # (T+1, 48, R) bf16 hi/mid/lo stack
    best_t = jnp.concatenate(
        [t_init.reshape(tiles, 1, tile_r), jnp.zeros((1, 1, tile_r), jnp.float32)]
    )
    best_slot = jnp.full((tiles + 1, 1, tile_r), -1, jnp.int32)

    def body(make_groups, b):
        def f(state):
            start, bt, bs = state
            vt2, vcs2, vf2, ve2, _ = make_groups(start, b)
            bt2, bs2 = _launch(rays8, bt, bs, vt2, vcs2, vf2, ve2, wplanar,
                               cs.k, tile_r, b, scheme=scheme)
            return start + b, bt2, bs2
        return f

    if phase_cap:
        # ---- phase 1: nearest phase_cap ranks of every tile ----
        counts1 = jnp.minimum(counts, phase_cap)
        total1 = jnp.sum((counts1 + g - 1) // g)

        def make_p1(start, b):
            return build_visit_groups_table(table, entry, counts1, b, g,
                                            start=start)

        vt1, vcs1, vf1, ve1, _ = make_p1(0, first_b)
        best_t, best_slot = _launch(rays8, best_t, best_slot, vt1, vcs1,
                                    vf1, ve1, wplanar, cs.k, tile_r, first_b,
                                    scheme=scheme)
        _, best_t, best_slot = jax.lax.while_loop(
            lambda s: s[0] < total1, body(make_p1, refill_b),
            (jnp.int32(first_b), best_t, best_slot))

        # ---- phase 2: recull ranks >= phase_cap by achieved best_t ----
        c = entry.shape[1]
        t_cap = jnp.max(best_t[:tiles, 0, :], axis=1)  # (T,)
        # best_t is packed-TRUNCATED (11 low mantissa bits zeroed); widen the
        # cap by one truncation bucket so a coincident triangle whose true t
        # ties the carried best inside that bucket is never culled — the
        # recull then drops strictly less than the kernel's own early-out.
        t_cap = t_cap * (1.0 + 2.0 ** -11) + 1e-7
        keep = entry <= t_cap[:, None]
        rankpos = jnp.arange(phase_cap, dtype=jnp.int32)[None, :]
        first = table[:, :phase_cap]  # already-visited cluster ids
        drop = jnp.zeros((tiles, c), bool).at[
            jnp.arange(tiles)[:, None], jnp.clip(first, 0, c - 1)].max(
            rankpos < counts1[:, None], mode="drop")
        keep = keep & ~drop
        w_ = words.shape[1]
        kb = keep[:, : w_ * 32].reshape(tiles, w_, 32).astype(jnp.int32)
        words2 = (kb << jnp.arange(32, dtype=jnp.int32)[None, None, :]).sum(-1)
        words2 = words2 & words  # only originally-binned clusters
        cnt_w = jax.lax.population_count(words2)
        cum2 = jnp.cumsum(cnt_w, axis=1)
        counts2 = cnt_w.sum(axis=1)
        # schedule phase 2 through its own rank table (one gather per
        # sub-visit, like phase 1) with the bits builder only for the rare
        # tiles whose survivors exceed the table cap
        counts2_lo = jnp.minimum(counts2, cap)
        counts2_hi = counts2 - counts2_lo
        table2 = rank_table_bits(words2, cum2, cap)
        total2 = jnp.sum((counts2_lo + g - 1) // g)
        total2_hi = jnp.sum((counts2_hi + g - 1) // g)

        def make_p2(start, b):
            return build_visit_groups_table(table2, entry, counts2_lo,
                                            b, g, start=start)

        def make_p2_hi(start, b):
            return build_visit_groups_bits(words2, cum2, entry, counts2_hi,
                                           b, g, start=start,
                                           rank_offset=counts2_lo)

        _, best_t, best_slot = jax.lax.while_loop(
            lambda s: s[0] < total2, body(make_p2, refill_b),
            (jnp.int32(0), best_t, best_slot))
        _, best_t, best_slot = jax.lax.while_loop(
            lambda s: s[0] < total2_hi, body(make_p2_hi, refill_b),
            (jnp.int32(0), best_t, best_slot))

        best_t = best_t[:tiles].reshape(-1)[:n]
        best_slot = best_slot[:tiles].reshape(-1)[:n]
        return best_t, best_slot

    vt, vcs, vf, ve, _ = make_lo(0, first_b)
    best_t, best_slot = _launch(rays8, best_t, best_slot, vt, vcs, vf, ve,
                                wplanar, cs.k, tile_r, first_b, scheme=scheme)

    # Overflow launches walk each phase's group list in refill-sized
    # windows [start, start+b) — strictly new work each launch, so each
    # loop terminates in ceil(total/b) iterations.  A tile resumed mid-way
    # re-seeds its block from the carried (best_t, best_slot) via
    # visit_first.
    total_lo = jnp.sum((counts_lo + g - 1) // g)
    total_hi = jnp.sum((counts_hi + g - 1) // g)

    _, best_t, best_slot = jax.lax.while_loop(
        lambda s: s[0] < total_lo, body(make_lo, refill_b),
        (jnp.int32(first_b), best_t, best_slot)
    )
    _, best_t, best_slot = jax.lax.while_loop(
        lambda s: s[0] < total_hi, body(make_hi, refill_b),
        (jnp.int32(0), best_t, best_slot)
    )

    best_t = best_t[:tiles].reshape(-1)[:n]
    best_slot = best_slot[:tiles].reshape(-1)[:n]
    return best_t, best_slot


@partial(jax.jit, static_argnames=("tile_r", "budget", "refine",
                                   "phase_cap", "scheme"))
def intersect_pallas(origins, dirs, cs: ClusterSet, wplanar, t_max=None,
                     tile_r: int = TILE_R, budget: int = VISIT_BUDGET,
                     refine: bool = False, bounds=None,
                     phase_cap: int = 0, scheme: str = "native") -> Hit:
    """Closest hit via the fused kernel.

    By default returns a COARSE hit: ``t`` carries the kernel's packed value
    (11 low mantissa bits truncated, ~1e-4 relative) and u = v = 0 — the
    render paths re-evaluate exact (t, u, v) plus per-triangle ids with ONE
    wide packed-record gather (ops.intersect.hit_record), so refining here
    would duplicate three narrow ~35 ms gathers.  Pass ``refine=True`` for a
    standalone exact Hit.

    ``t_max`` semantics are FUZZY by the same truncation: the carried-best
    seed rides the packed lane reduce as (trunc(t_max) | 2047), so a
    candidate whose truncated t equals the truncated seed still registers —
    hits up to ~1e-4 relative BEYOND t_max can be reported (ADVICE r2 #2).
    Use ``occluded_pallas`` for occlusion queries: its any-hit kernel
    compares ``t < t_max`` exactly.
    """
    n = origins.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), T_MAX, jnp.float32)
    best_t, best_slot = _search(origins, dirs, t_max, cs, wplanar, tile_r,
                                budget, bounds, phase_cap=phase_cap,
                                scheme=scheme)
    hit = best_slot >= 0
    if cs.identity_order:
        tri = best_slot  # geometry is Morton-sorted: slot == triangle id
    else:
        tri = jnp.where(hit, cs.order[jnp.maximum(best_slot, 0)], -1)
    zero = jnp.zeros_like(best_t)
    if refine:
        rt, ru, rv = _mt_refine(origins, dirs, best_slot, cs)
        return Hit(t=jnp.where(hit, rt, INF), tri=tri,
                   u=jnp.where(hit, ru, 0.0), v=jnp.where(hit, rv, 0.0))
    return Hit(t=jnp.where(hit, best_t, INF), tri=tri, u=zero, v=zero)


@partial(jax.jit, static_argnames=("tile_r", "budget", "scheme"))
def occluded_pallas(origins, dirs, cs: ClusterSet, wplanar, t_max,
                    tile_r: int = TILE_R, budget: int | None = None,
                    scheme: str = "native"):
    """Any-hit: True where a triangle lies in (t_min, t_max[i]).

    Runs the dedicated any-hit kernel (no packed t|slot machinery; a tile
    stops visiting once every armed ray found SOME occluder) — hardware
    occlusion rays terminate on first hit for the same reason (VERDICT r1
    missing #3).

    ``budget=None`` = VISIT_BUDGET.  Auto-scaling the window to the batch's
    tile count and widening refills both measured SLOWER on the 32k-tile
    Whitted shadow batch (321 vs 316 ms, r5) — the overflow loop's cost is
    the launches, not schedule-build slack.
    """
    if budget is None:
        budget = VISIT_BUDGET
    return _search_anyhit(origins, dirs, t_max, cs, wplanar, tile_r, budget,
                          scheme=scheme)
