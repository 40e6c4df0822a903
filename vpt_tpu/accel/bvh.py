"""Host-side BVH construction.

Replaces the reference's hardware acceleration structures
(BLASBuilder::Build/Compact + TLAS, PathTracer.cpp:433-502) with our own
binned-SAH BVH flattened to SoA arrays laid out for TPU traversal:

* nodes are emitted in DFS pre-order, so the left child of inner node `i` is
  `i + 1`;
* every node stores a `skip` link — the node to visit next when its AABB is
  missed (or after a leaf is processed).  Traversal therefore needs no stack:
  `next = hit ? i + 1 : skip[i]` for inner nodes, `next = skip[i]` after a
  leaf (see vpt_tpu.accel.traverse);
* leaf triangles are reordered to be contiguous so device gathers are
  fixed-shape; callers pad the reordered triangle arrays by `LEAF_SIZE`.

The builder is NumPy (build happens once per scene on host, like the
reference's BLAS build on the compute queue).  An optional native C++ builder
with identical output layout accelerates large scenes
(vpt_tpu/accel/cpp).
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np

LEAF_SIZE = 4
N_BINS = 16
SENTINEL = np.int32(2**31 - 1)


@dataclasses.dataclass
class FlatBVH:
    """Flattened skip-link BVH (SoA, device-ready)."""

    aabb_min: np.ndarray  # (n_nodes, 3) f32
    aabb_max: np.ndarray  # (n_nodes, 3) f32
    first_tri: np.ndarray  # (n_nodes,) i32 — start into the *reordered* tri arrays
    tri_count: np.ndarray  # (n_nodes,) i32 — 0 for inner nodes
    skip: np.ndarray  # (n_nodes,) i32 — node on miss / after leaf; SENTINEL = done
    tri_order: np.ndarray  # (n_tris,) i32 — reordered-slot k holds original tri tri_order[k]

    @property
    def n_nodes(self) -> int:
        return int(self.aabb_min.shape[0])


def build_bvh(
    v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, leaf_size: int = LEAF_SIZE,
    use_native: bool = True,
) -> FlatBVH:
    """Binned-SAH top-down build over world-space triangles (T, 3) each.

    Uses the C++ builder (vpt_tpu/accel/cpp) when a toolchain is available —
    the native path is the production one; this NumPy implementation is the
    readable reference and fallback."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    n_tris = v0.shape[0]
    if n_tris == 0:
        raise ValueError("cannot build a BVH over zero triangles")

    if use_native:
        from vpt_tpu.accel.native import build_bvh_native

        result = build_bvh_native(v0, v1, v2, leaf_size)
        if result is not None:
            amin, amax, first, count, skip, order = result
            return FlatBVH(amin, amax, first, count, skip, order)

    centroid = (v0 + v1 + v2) / 3.0
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)

    nodes_min: list[np.ndarray] = []
    nodes_max: list[np.ndarray] = []
    nodes_first: list[int] = []
    nodes_count: list[int] = []
    nodes_right: list[int] = []  # right-child id for inner nodes, -1 for leaves

    tri_order = np.empty(n_tris, dtype=np.int32)
    cursor = [0]

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100_000))

    def emit(idx: np.ndarray) -> int:
        nid = len(nodes_min)
        nmin = tri_min[idx].min(axis=0)
        nmax = tri_max[idx].max(axis=0)
        nodes_min.append(nmin)
        nodes_max.append(nmax)
        nodes_first.append(0)
        nodes_count.append(0)
        nodes_right.append(-1)

        count = idx.shape[0]
        split = _find_split(idx, centroid, tri_min, tri_max, nmin, nmax, count, leaf_size)
        if split is None:
            nodes_first[nid] = cursor[0]
            nodes_count[nid] = count
            tri_order[cursor[0] : cursor[0] + count] = idx
            cursor[0] += count
            return nid

        left_idx, right_idx = split
        lid = emit(left_idx)
        assert lid == nid + 1
        rid = emit(right_idx)
        nodes_right[nid] = rid
        return nid

    emit(np.arange(n_tris, dtype=np.int32))
    sys.setrecursionlimit(old_limit)

    n_nodes = len(nodes_min)
    aabb_min = np.stack(nodes_min).astype(np.float32)
    aabb_max = np.stack(nodes_max).astype(np.float32)
    first_tri = np.asarray(nodes_first, np.int32)
    tri_count = np.asarray(nodes_count, np.int32)
    right = np.asarray(nodes_right, np.int32)

    # Skip links, top-down: skip(left(n)) = right(n); skip(right(n)) = skip(n).
    skip = np.full(n_nodes, SENTINEL, np.int32)
    stack = [0]
    while stack:
        nid = stack.pop()
        rid = right[nid]
        if rid >= 0:
            skip[nid + 1] = rid
            skip[rid] = skip[nid]
            stack.append(nid + 1)
            stack.append(rid)

    return FlatBVH(aabb_min, aabb_max, first_tri, tri_count, skip, tri_order)


def _find_split(idx, centroid, tri_min, tri_max, nmin, nmax, count, leaf_size):
    """Binned SAH split; returns (left_idx, right_idx) or None for a leaf."""
    if count <= leaf_size:
        return None
    c = centroid[idx]
    cmin = c.min(axis=0)
    cmax = c.max(axis=0)
    ext = cmax - cmin

    best_cost = np.inf
    split_axis = -1
    split_pos = 0.0
    for axis in range(3):
        if ext[axis] <= 1e-12:
            continue
        bins = np.minimum(((c[:, axis] - cmin[axis]) / ext[axis] * N_BINS).astype(np.int32), N_BINS - 1)
        bin_counts = np.bincount(bins, minlength=N_BINS)
        bmin = np.full((N_BINS, 3), np.inf, np.float32)
        bmax = np.full((N_BINS, 3), -np.inf, np.float32)
        np.minimum.at(bmin, bins, tri_min[idx])
        np.maximum.at(bmax, bins, tri_max[idx])
        lmin = np.minimum.accumulate(bmin, axis=0)
        lmax = np.maximum.accumulate(bmax, axis=0)
        rmin = np.minimum.accumulate(bmin[::-1], axis=0)[::-1]
        rmax = np.maximum.accumulate(bmax[::-1], axis=0)[::-1]
        lcnt = np.cumsum(bin_counts)
        rcnt = count - lcnt
        la = _aabb_area_vec(lmin[:-1], lmax[:-1])
        ra = _aabb_area_vec(rmin[1:], rmax[1:])
        valid = (lcnt[:-1] > 0) & (rcnt[:-1] > 0)
        cost = np.where(valid, la * lcnt[:-1] + ra * rcnt[:-1], np.inf)
        b = int(np.argmin(cost))
        if cost[b] < best_cost:
            best_cost = cost[b]
            split_axis = axis
            split_pos = cmin[axis] + ext[axis] * (b + 1) / N_BINS

    if split_axis < 0:
        # All centroids coincide: force a median split to bound leaf size.
        half = count // 2
        return idx[:half], idx[half:]

    node_area = _aabb_area(nmin, nmax)
    if best_cost >= node_area * count and count <= 2 * leaf_size:
        return None  # SAH says leaf is cheaper and the leaf stays small

    mask = centroid[idx, split_axis] < split_pos
    left_idx = idx[mask]
    right_idx = idx[~mask]
    if left_idx.shape[0] == 0 or right_idx.shape[0] == 0:
        order = np.argsort(centroid[idx, split_axis], kind="stable")
        half = count // 2
        left_idx = idx[order[:half]]
        right_idx = idx[order[half:]]
    return left_idx, right_idx


def _aabb_area(mn: np.ndarray, mx: np.ndarray) -> float:
    d = np.maximum(mx - mn, 0.0)
    return float(2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0]))


def _aabb_area_vec(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    d = np.maximum(mx - mn, 0.0)
    return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])
