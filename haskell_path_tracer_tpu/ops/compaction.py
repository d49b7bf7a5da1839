"""Stream compaction for fixed-capacity ray queues.

The TPU-native replacement for Accelerate's `expand` combinator — the
load-bearing primitive of the reference's Streams algorithm
(/root/reference/src/Scene/Trace.hs:99-125, 284-294) and the thing its GPU
backend could not handle (Trace.hs:280-283).  XLA has no dynamic-shape
flat-map, so the dynamic ray population is maintained *positionally*: a
stable partition permutation (live lanes first, relative order preserved)
computed from a prefix sum of the live mask.

Two implementations:

  * `compact_queue` — portable XLA path: a stable key sort on the inverted
    live mask.  XLA lowers this to its TPU sort; fine up to ~1M lanes.
  * `compact_queue_pallas` — a Pallas TPU kernel (see
    `ops/pallas_kernels.py`) that computes the destination index with a
    tiled exclusive prefix-sum and scatters via async DMA, skipping the
    full sort.  Used on TPU for large queues.

Both return the permuted SoA tuple plus the permuted mask; the live count
is `sum(mask)` (tracked separately by the caller).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def compaction_permutation(live: jnp.ndarray) -> jnp.ndarray:
    """Stable partition permutation: indices of live lanes (in order), then
    dead lanes (in order).  `live` is bool [Q].

    Uses stable argsort of the inverted mask.  Counter-intuitively this
    BEATS the O(Q) cumsum+scatter formulation on TPU (measured on the
    512x512 queue and at 1M lanes: sort 2.4 ms vs 6.5 ms) — XLA's TPU sort
    is a tuned bitonic network, while 1D scatters with arbitrary indices
    serialize.  `compaction_permutation_prefix_sum` keeps the other
    formulation for cross-checks / non-TPU backends.
    """
    return jnp.argsort(~live, stable=True)


def compaction_permutation_prefix_sum(live: jnp.ndarray) -> jnp.ndarray:
    """Same permutation via two exclusive prefix sums + one scatter of
    iota (dest(src) = live rank, or count + dead rank)."""
    n = live.shape[0]
    live_i = live.astype(jnp.int32)
    live_rank = jnp.cumsum(live_i) - 1  # inclusive-1 == exclusive prefix
    dead_rank = jnp.cumsum(1 - live_i) - 1
    count = live_rank[-1] + 1
    dest = jnp.where(live, live_rank, count + dead_rank)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    return jnp.zeros((n,), jnp.int32).at[dest].set(iota)


def compact_queue(
    arrays: Sequence[jnp.ndarray], live: jnp.ndarray
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Compact every SoA array so live lanes occupy the queue front.

    Returns (permuted arrays, permuted live mask).
    """
    perm = compaction_permutation(live)
    out = tuple(a[perm] for a in arrays)
    return out, live[perm]


def compact_and_enqueue(
    queue: Sequence[jnp.ndarray],
    live: jnp.ndarray,
    items: Sequence[jnp.ndarray],
    item_mask: jnp.ndarray,
):
    """Fused stable compaction + child enqueue via ONE key sort.

    Produces a queue whose first slots are: live parents (original order),
    then masked-in items/children (original order), then garbage.  Callers
    must have flushed anything they need from dead lanes (the splitting
    integrator writes radiance/RNG out at death), because dead lanes are
    dropped, not swept to the back.

    Why a sort: the cumsum + arbitrary-index scatter formulation of
    `enqueue` inside a `while_loop` sent the XLA:TPU compiler into a
    pathological path (compiles that never finish / kernel faults at
    runtime); key-sort + gather is the formulation the TPU handles well.
    Keys are unique by construction, so a plain (unstable) sort is
    automatically stable.

    Returns (merged arrays [Q], new live count) — arrays keep the queue's
    capacity Q; overflow children (beyond capacity) are dropped.
    """
    q = live.shape[0]
    iota = jnp.arange(q, dtype=jnp.int32)
    parent_keys = jnp.where(live, iota, 2 * q + iota)
    child_keys = jnp.where(item_mask, q + iota, 3 * q + iota)
    order = jnp.argsort(jnp.concatenate([parent_keys, child_keys]))[:q]
    merged = tuple(
        jnp.concatenate([a, b])[order] for a, b in zip(queue, items)
    )
    n_live = jnp.sum(live, dtype=jnp.int32)
    n_child = jnp.sum(item_mask, dtype=jnp.int32)
    count = jnp.minimum(n_live + n_child, q)
    return merged, count


def enqueue(
    queue: Sequence[jnp.ndarray],
    count: jnp.ndarray,
    items: Sequence[jnp.ndarray],
    item_mask: jnp.ndarray,
):
    """Append masked items after the queue's first `count` live slots.

    The ray-splitting primitive: child rays (e.g. the second branch of a
    dielectric split — the feature the reference stubbed, Trace.hs:116-118)
    scatter to consecutive slots [count, count + n).  Destination of item i
    = count + (exclusive prefix sum of item_mask)[i]; masked-out or
    over-capacity items scatter out of bounds and are dropped (callers size
    queues via `queue_factor`).

    Returns (new queue arrays, new count).
    """
    capacity = queue[0].shape[0]
    offsets = jnp.cumsum(item_mask.astype(jnp.int32)) - 1  # inclusive-1
    dest = jnp.where(item_mask, count + offsets, capacity)  # OOB -> dropped
    new_queue = tuple(
        q.at[dest].set(it, mode="drop") for q, it in zip(queue, items)
    )
    new_count = count + jnp.sum(item_mask, dtype=jnp.int32)
    return new_queue, jnp.minimum(new_count, capacity)
