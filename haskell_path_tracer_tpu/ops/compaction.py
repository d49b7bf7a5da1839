"""Stream compaction for fixed-capacity ray queues.

The TPU-native replacement for Accelerate's `expand` combinator — the
load-bearing primitive of the reference's Streams algorithm
(/root/reference/src/Scene/Trace.hs:99-125, 284-294) and the thing its GPU
backend could not handle (Trace.hs:280-283).  XLA has no dynamic-shape
flat-map, so the dynamic ray population is maintained *positionally*: a
stable partition permutation (live lanes first, relative order preserved)
computed as a stable key sort on the inverted live mask, with the payload
riding the same multi-operand `lax.sort`.

Formulation notes (all measured on TPU v5e):

  * the payload rides the sort network instead of being gathered by an
    argsort permutation afterwards — arbitrary-index gathers serialize on
    TPU (operand sort ~9x faster at 1M lanes x 15 columns);
  * the O(Q) cumsum + arbitrary-index scatter formulation loses to the
    sort (XLA's TPU sort is a tuned bitonic network; 1D scatters with
    computed indices serialize), and inside a `while_loop` it sent the
    XLA:TPU compiler into a pathological path.  Two earlier enqueue
    primitives built on it (`enqueue`, `compact_and_enqueue`) were
    superseded by the per-lane stack traversal in
    `render/wavefront.py:render_sample_wavefront_split`, which needs no
    queue maintenance at all, and were removed.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


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
    keep the first `take` lanes of each."""
    cols, widths = _split_columns(arrays)
    sorted_ = jax.lax.sort((keys, *cols), num_keys=1)
    return _join_columns([c[:take] for c in sorted_[1:]], widths)


def compact_queue(
    arrays: Sequence[jnp.ndarray], live: jnp.ndarray
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Compact every SoA array so live lanes occupy the queue front.

    Stable partition: live lanes keep their relative order, dead lanes are
    swept to the back (also in order).  Keys are unique by construction, so
    the unstable operand sort is automatically stable.

    Returns (permuted arrays, permuted live mask); the live count is
    `sum(mask)` (tracked separately by the caller).
    """
    q = live.shape[0]
    iota = jnp.arange(q, dtype=jnp.int32)
    keys = jnp.where(live, iota, q + iota)  # unique -> stable partition
    out = _sorted_payload(keys, tuple(arrays) + (live,), q)
    return out[:-1], out[-1]
