"""Sphere-cluster acceleration structure (the reference's declared TODO:
/root/reference/src/Scene/Objects.hs:55-59 plans "acceleration structures"
but never builds one — `checkHit` stays a linear scan, Trace.hs:443-447).

TPU-first design: classic BVHs traverse a per-ray stack — hostile to a
vector machine where control flow is per-block scalar.  Instead we build a
flat TWO-LEVEL hierarchy: spheres are sorted by Morton code of their
centers and grouped into fixed-size clusters; each cluster gets a bounding
sphere enclosing its member spheres.  The Pallas nearest-hit kernel then
tests each cluster's bound against the whole ray block at once (a handful
of VPU ops) and skips the member loop with a *scalar* `lax.cond` when no
lane in the block can hit it — block-coherent culling instead of per-ray
traversal.  Everything is static-shape and jittable, so the build runs
inside the render step (O(P log P) sort — noise next to the ray work) and
the structure needs no host round trip when scene geometry is a traced
argument (e.g. during inverse rendering of sphere positions).

The build is detached (`stop_gradient`): bounds only gate which exact
distances get computed, so they carry no gradient of their own.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_CLUSTER_SIZE = 32


def _spread_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so consecutive bits land 3 apart."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton3(pos: jnp.ndarray) -> jnp.ndarray:
    """Morton (Z-order) codes for points [P, 3] -> uint32 [P].

    Centers are quantized to a 10-bit lattice over their bounding box; the
    interleaved code orders spheres so that index-adjacent spheres are
    spatially adjacent — which is what makes fixed-size index clusters
    spatially tight.
    """
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((pos - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)
    return (
        _spread_bits(q[:, 0])
        | (_spread_bits(q[:, 1]) << 1)
        | (_spread_bits(q[:, 2]) << 2)
    )


def build_clusters(
    pos: jnp.ndarray,
    radius: jnp.ndarray,
    cluster_size: int = DEFAULT_CLUSTER_SIZE,
):
    """Group spheres into Morton-ordered clusters of `cluster_size`.

    Returns `(perm, bounds)`:
      perm   [C * M] int32 — sphere index (into the original arrays) of
             each slot, padded by repeating the last sorted sphere (a
             duplicate slot yields the identical distance, and the
             kernel's strict `<` keeps the first occurrence, so results
             map to the same original index — no masking needed).
      bounds [C, 4] float32 — (cx, cy, cz, r) bounding sphere per cluster,
             enclosing every member sphere (center + its radius).

    All shapes are static in P; the build is jittable and detached.
    """
    pos = jax.lax.stop_gradient(pos)
    radius = jax.lax.stop_gradient(radius)
    n = pos.shape[0]
    m = max(1, min(cluster_size, n))
    order = jnp.argsort(morton3(pos)).astype(jnp.int32)
    pad = (-n) % m
    perm = jnp.concatenate([order, jnp.broadcast_to(order[-1], (pad,))])
    c = perm.shape[0] // m
    cpos = pos[perm].reshape(c, m, 3)
    crad = radius[perm].reshape(c, m)
    center = jnp.mean(cpos, axis=1)  # [C, 3]
    reach = jnp.linalg.norm(cpos - center[:, None, :], axis=-1) + crad
    br = jnp.max(reach, axis=1)  # [C]
    bounds = jnp.concatenate([center, br[:, None]], axis=-1)
    return perm, bounds.astype(jnp.float32)
