"""Stream compaction for fixed-capacity ray queues.

The TPU-native replacement for Accelerate's `expand` combinator — the
load-bearing primitive of the reference's Streams algorithm
(/root/reference/src/Scene/Trace.hs:99-125, 284-294) and the thing its GPU
backend could not handle (Trace.hs:280-283).  XLA has no dynamic-shape
flat-map, so the dynamic ray population is maintained *positionally*: a
stable partition permutation (live lanes first, relative order preserved)
computed from a prefix sum of the live mask.

The partition permutation comes from a stable key sort on the inverted
live mask — measured FASTER on TPU than the cumsum+scatter formulation
(XLA's TPU sort is a tuned bitonic network; 1D arbitrary-index scatters
serialize), which is kept as `compaction_permutation_prefix_sum` for
cross-checks and non-TPU backends.

`compact_queue` returns the permuted SoA tuple plus the permuted mask;
the live count is `sum(mask)` (tracked separately by the caller).
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


def _split_columns(arrays: Sequence[jnp.ndarray]):
    """Flatten SoA arrays ([N] or [N, k]) into 1-D columns + a re-stack
    recipe.  Multi-operand `lax.sort` wants same-shape 1-D operands."""
    cols, widths = [], []
    for a in arrays:
        if a.ndim == 1:
            cols.append(a)
            widths.append(0)  # 0 marks "was 1-D"
        else:
            k = a.shape[1]
            cols.extend(a[:, i] for i in range(k))
            widths.append(k)
    return cols, widths


def _join_columns(cols, widths):
    out, i = [], 0
    for k in widths:
        if k == 0:
            out.append(cols[i])
            i += 1
        else:
            out.append(jnp.stack(cols[i : i + k], axis=-1))
            i += k
    return tuple(out)


def _sorted_payload(keys, arrays, take):
    """Sort payload columns by `keys` with ONE multi-operand lax.sort and
    keep the first `take` lanes of each.

    The payload rides the sort network instead of being gathered by an
    argsort permutation afterwards: arbitrary-index gathers serialize on
    TPU, and the operand sort measures ~9x faster at 1M lanes x 15
    columns (11.9 ms vs 111.7 ms on v5e).
    """
    cols, widths = _split_columns(arrays)
    sorted_ = jax.lax.sort((keys, *cols), num_keys=1)
    return _join_columns([c[:take] for c in sorted_[1:]], widths)


def compact_queue(
    arrays: Sequence[jnp.ndarray], live: jnp.ndarray
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Compact every SoA array so live lanes occupy the queue front.

    Returns (permuted arrays, permuted live mask).
    """
    q = live.shape[0]
    iota = jnp.arange(q, dtype=jnp.int32)
    keys = jnp.where(live, iota, q + iota)  # unique -> stable partition
    out = _sorted_payload(keys, tuple(arrays) + (live,), q)
    return out[:-1], out[-1]


def compact_and_enqueue(
    queue: Sequence[jnp.ndarray],
    live: jnp.ndarray,
    items: Sequence[jnp.ndarray],
    item_mask: jnp.ndarray,
):
    """Fused stable compaction + child enqueue via ONE multi-operand sort.

    Produces a queue whose first slots are: live parents (original order),
    then masked-in items/children (original order), then garbage.  Callers
    must have flushed anything they need from dead lanes (the splitting
    integrator writes radiance/RNG out at death), because dead lanes are
    dropped, not swept to the back.

    Why a sort: the cumsum + arbitrary-index scatter formulation of
    `enqueue` inside a `while_loop` sent the XLA:TPU compiler into a
    pathological path (compiles that never finish / kernel faults at
    runtime); the multi-operand sort is the formulation the TPU handles
    well.  Keys are unique by construction, so the unstable operand sort
    is automatically stable.

    Returns (merged arrays [Q], new live count) — arrays keep the queue's
    capacity Q; overflow children (beyond capacity) are dropped.
    """
    q = live.shape[0]
    iota = jnp.arange(q, dtype=jnp.int32)
    parent_keys = jnp.where(live, iota, 2 * q + iota)
    child_keys = jnp.where(item_mask, q + iota, 3 * q + iota)
    keys = jnp.concatenate([parent_keys, child_keys])
    both = tuple(
        jnp.concatenate([a, b]) for a, b in zip(queue, items)
    )
    merged = _sorted_payload(keys, both, q)
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
