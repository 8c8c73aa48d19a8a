"""Sorting & selection utilities, device-batched.

TPU-native equivalent of the reference's core/sorting layer
(ref: core/sorting/*.hpp — bubble/insertion/selection/comb/heap/merge/shell/
quick/intro sorts, consumed by DVP-tree partitioning and reachability sorts,
path_planning/reachability_sort.hpp).

On TPU the nine comparison-sort variants collapse into XLA's fused sort —
hand-written comparison loops cannot beat the hardware sort network, so the
parity surface here is the *operations*, each batched over leading axes:
sort / argsort / rank / top-k / median partition (the DVP-tree split
primitive) / lexicographic multi-key sort (the reachability sort primitive).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sort(x, axis=-1):
    return jnp.sort(x, axis=axis)


def argsort(x, axis=-1):
    return jnp.argsort(x, axis=axis)


def rank(x, axis=-1):
    """Rank of each element in its slice (0 = smallest)."""
    return jnp.argsort(jnp.argsort(x, axis=axis), axis=axis)


def top_k(x, k):
    """Largest k along the last axis: (values, indices)."""
    return jax.lax.top_k(x, k)


def smallest_k(x, k):
    """Smallest k along the last axis: (values, indices) — the k-NN selection
    primitive (ref: dvp_tree_detail.hpp nearest-neighbor queue)."""
    v, i = jax.lax.top_k(-x, k)
    return -v, i


def median_partition(x):
    """(median, below-mask) for the last axis — the vantage-point split of
    the DVP tree (ref: dvp_tree_detail.hpp partitioning)."""
    med = jnp.median(x, axis=-1, keepdims=True)
    return med[..., 0], x <= med


def lexsort_2key(primary, secondary):
    """Indices sorting by ``primary`` then ``secondary`` (the reachability
    dual-key ordering, ref: path_planning/reachability_sort.hpp)."""
    # stable composite: sort by secondary first, then stable-sort by primary
    order2 = jnp.argsort(secondary, axis=-1, stable=True)
    p2 = jnp.take_along_axis(primary, order2, axis=-1)
    order1 = jnp.argsort(p2, axis=-1, stable=True)
    return jnp.take_along_axis(order2, order1, axis=-1)
