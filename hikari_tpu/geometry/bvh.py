"""Host-side BVH construction (binned SAH) with a skip-link flat layout.

Replaces Raycore.jl's BVH/TLAS build (external dependency of the reference,
re-exported at /root/reference/src/Hikari.jl:22-37). The build runs on host
in numpy at scene-sync time; the flattened node arrays are uploaded once and
traversed by the vectorized device code in traverse.py.

Layout: nodes in DFS pre-order. For node i, its subtree occupies
[i, skip[i]); traversal visits i+1 on an AABB hit and jumps to skip[i] on a
miss — a fully stackless scheme that keeps per-lane state to a single index,
which is what a TPU wavefront wants (no scatter to per-lane stacks).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

import numpy as np

N_BINS = 16
DEFAULT_LEAF_SIZE = 4


@dataclass
class FlatBVH:
    """Flattened BVH. count==0 marks interior nodes."""

    lo: np.ndarray       # (N, 3) float32
    hi: np.ndarray       # (N, 3) float32
    first: np.ndarray    # (N,) int32: first primitive (in reordered space) for leaves
    count: np.ndarray    # (N,) int32: primitive count (0 = interior)
    skip: np.ndarray     # (N,) int32: index of next subtree in DFS order
    prim_order: np.ndarray  # (P,) int32: permutation old->new applied to primitives


def _build_bvh_native(prim_lo, prim_hi, leaf_size) -> FlatBVH | None:
    """C++ builder (native/bvh_builder.cpp) via ctypes; ~50-100x the numpy
    build. Returns None when the native library is unavailable."""
    import ctypes

    from ..native import load_native

    lib = load_native("bvh", "bvh_builder.cpp")
    if lib is None:
        return None
    fn = lib.hikari_build_bvh
    fn.restype = ctypes.c_int64
    n = prim_lo.shape[0]
    lo_c = np.ascontiguousarray(prim_lo, np.float32)
    hi_c = np.ascontiguousarray(prim_hi, np.float32)
    cap = 2 * n + 8
    out_lo = np.empty((cap, 3), np.float32)
    out_hi = np.empty((cap, 3), np.float32)
    out_first = np.empty(cap, np.int32)
    out_count = np.empty(cap, np.int32)
    out_skip = np.empty(cap, np.int32)
    out_order = np.empty(n, np.int32)

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    n_nodes = fn(
        ptr(lo_c), ptr(hi_c), ctypes.c_int64(n), ctypes.c_int32(leaf_size),
        ptr(out_lo), ptr(out_hi), ptr(out_first), ptr(out_count),
        ptr(out_skip), ptr(out_order), ctypes.c_int64(cap),
    )
    if n_nodes <= 0:
        return None
    return FlatBVH(
        lo=out_lo[:n_nodes].copy(), hi=out_hi[:n_nodes].copy(),
        first=out_first[:n_nodes].copy(), count=out_count[:n_nodes].copy(),
        skip=out_skip[:n_nodes].copy(), prim_order=out_order,
    )


def build_bvh(
    prim_lo: np.ndarray, prim_hi: np.ndarray, leaf_size: int = DEFAULT_LEAF_SIZE,
    native: bool = True,
) -> FlatBVH:
    """Binned-SAH BVH over primitive AABBs. Returns the flat skip-link tree.

    Uses the native C++ builder when available; the numpy path below is the
    reference implementation and fallback."""
    n = prim_lo.shape[0]
    assert n > 0
    if native:
        fb = _build_bvh_native(
            np.asarray(prim_lo, np.float32), np.asarray(prim_hi, np.float32),
            leaf_size,
        )
        if fb is not None:
            return fb
    centroids = 0.5 * (prim_lo + prim_hi)

    lo_list: list[np.ndarray] = []
    hi_list: list[np.ndarray] = []
    first_list: list[int] = []
    count_list: list[int] = []
    order: list[np.ndarray] = []

    sys.setrecursionlimit(max(sys.getrecursionlimit(), 10000))

    def emit(idx: np.ndarray, offset: int) -> int:
        """Build subtree for prims `idx`; append nodes; return subtree size."""
        node_lo = prim_lo[idx].min(axis=0)
        node_hi = prim_hi[idx].max(axis=0)
        my = len(lo_list)
        lo_list.append(node_lo)
        hi_list.append(node_hi)
        first_list.append(offset)
        count_list.append(0)

        if len(idx) <= leaf_size:
            count_list[my] = len(idx)
            order.append(idx)
            return 1

        cent = centroids[idx]
        c_lo = cent.min(axis=0)
        c_hi = cent.max(axis=0)
        extent = c_hi - c_lo
        axis = int(np.argmax(extent))

        if extent[axis] < 1e-12:
            # all centroids coincide: median split by index
            half = len(idx) // 2
            left_idx, right_idx = idx[:half], idx[half:]
        else:
            # binned SAH
            scale = N_BINS * (1.0 - 1e-6) / extent[axis]
            bins = ((cent[:, axis] - c_lo[axis]) * scale).astype(np.int32)
            bins = np.clip(bins, 0, N_BINS - 1)
            bin_counts = np.bincount(bins, minlength=N_BINS)
            bin_lo = np.full((N_BINS, 3), np.inf, np.float64)
            bin_hi = np.full((N_BINS, 3), -np.inf, np.float64)
            for b in range(N_BINS):
                m = bins == b
                if bin_counts[b]:
                    bin_lo[b] = prim_lo[idx[m]].min(axis=0)
                    bin_hi[b] = prim_hi[idx[m]].max(axis=0)

            def growing_area(los, his):
                run_lo = np.minimum.accumulate(los, axis=0)
                run_hi = np.maximum.accumulate(his, axis=0)
                d = np.maximum(run_hi - run_lo, 0.0)
                return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])

            area_l = growing_area(bin_lo, bin_hi)[:-1]
            area_r = growing_area(bin_lo[::-1], bin_hi[::-1])[::-1][1:]
            n_l = np.cumsum(bin_counts)[:-1]
            n_r = len(idx) - n_l
            cost = np.where(
                (n_l > 0) & (n_r > 0),
                area_l * n_l + area_r * n_r,
                np.inf,
            )
            split_bin = int(np.argmin(cost))
            if not np.isfinite(cost[split_bin]):
                half = len(idx) // 2
                part = np.argsort(cent[:, axis], kind="stable")
                left_idx, right_idx = idx[part[:half]], idx[part[half:]]
            else:
                go_left = bins <= split_bin
                left_idx, right_idx = idx[go_left], idx[~go_left]

        size_l = emit(left_idx, offset)
        size_r = emit(right_idx, offset + len(left_idx))
        return 1 + size_l + size_r

    emit(np.arange(n, dtype=np.int64), 0)

    n_nodes = len(lo_list)
    lo = np.asarray(lo_list, np.float32)
    hi = np.asarray(hi_list, np.float32)
    first = np.asarray(first_list, np.int32)
    count = np.asarray(count_list, np.int32)

    # skip links: subtree of node i spans [i, i + size_i). Children of an
    # interior node i start at i+1, so sizes satisfy
    # size[i] = 1 + size[i+1] + size[i+1+size[i+1]]; compute right-to-left.
    sizes = np.ones(n_nodes, np.int64)
    for i in range(n_nodes - 1, -1, -1):
        if count[i] == 0:
            l = i + 1
            r = l + sizes[l]
            sizes[i] = 1 + sizes[l] + sizes[r]
    skip = (np.arange(n_nodes, dtype=np.int64) + sizes).astype(np.int32)

    prim_order = np.concatenate(order).astype(np.int32)
    assert prim_order.shape[0] == n
    return FlatBVH(lo, hi, first, count, skip, prim_order)
