"""Wavefront integrator: fixed-capacity ray queues with stream compaction.

TPU-native redesign of the reference's `Streams` algorithm
(/root/reference/src/Scene/Trace.hs:141-191, 272-331).  The reference leans
on Accelerate's `expand` — a dynamic-shape flat-map — for ray
expansion/compaction, which is exactly what broke its GPU backend
(Trace.hs:280-283) and what XLA's static-shape model forbids.  Here the
dynamic ray population lives in a *fixed-capacity queue*:

  * the ray-state SoA (`origin, direction, pixel, throughput, rng`)
    occupies Q = H*W slots; a live count + front-compaction replace dynamic
    shapes — dead rays are swept to the back each bounce by a stable
    compaction permutation (prefix-sum of the live mask), keeping live rays
    dense at the front so tiled kernels can skip dead tiles;
  * the device-resident bounce loop is `lax.while_loop`, the analog of the
    reference's `awhile` (Trace.hs:142-150), terminating when the live
    count hits zero or the bounce cap is reached;
  * per-bounce radiance lands in the image via a deterministic
    `segment_sum` keyed on pixel id — replacing the reference's `permute`
    scatter-add whose seed write-back races are documented at
    Trace.hs:186-191; RNG states are scattered back exactly once, when
    their ray dies, so there are no collisions and runs are reproducible.

Termination semantics match `Inline` exactly (dead = miss or nearZero
throughput, checked before emission with the *previous* bounce's
throughput), so `wavefront == inline` bit-for-bit on split-free scenes —
the cross-check the reference could never make (its Streams variant emits
one extra bounce for rays whose throughput just crossed the nearZero
threshold).  Ray splitting (dielectrics) enqueues child rays into the
queue's spare capacity; see `ops/compaction.py` for the Pallas kernels
behind the queue maintenance on TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import linalg
from ..models.camera import primary_rays
from ..models.objects import Accumulator, Camera, Scene
from ..ops import brdf as brdf_ops
from ..ops import rng as rng_ops
from ..ops.compaction import compact_queue
from ..ops.intersect import nearest_hit


class _QueueState(NamedTuple):
    bounce: jnp.ndarray  # [] i32
    count: jnp.ndarray  # [] i32 — live rays at the queue front
    ray_o: jnp.ndarray  # [Q, 3]
    ray_d: jnp.ndarray  # [Q, 3]
    pixel: jnp.ndarray  # [Q] i32 flat pixel id
    throughput: jnp.ndarray  # [Q, 3]
    rng: jnp.ndarray  # [Q, 4] u32
    live: jnp.ndarray  # [Q] bool
    radiance: jnp.ndarray  # [P, 3] accumulated image (flat)
    rng_out: jnp.ndarray  # [P, 4] written back when a ray dies


def render_sample_wavefront(
    scene: Scene,
    camera: Camera,
    acc: Accumulator,
    num_bounces: int = 15,
    russian_roulette: bool = False,
    rr_start: int = 3,
    compact: bool = True,
) -> Accumulator:
    """One progressive sample via the wavefront queue."""
    height, width = acc.color.shape[:2]
    num_pixels = height * width

    rays = primary_rays(camera, width, height)
    state = _QueueState(
        bounce=jnp.zeros((), jnp.int32),
        count=jnp.asarray(num_pixels, jnp.int32),
        ray_o=rays.origin.reshape(num_pixels, 3),
        ray_d=rays.direction.reshape(num_pixels, 3),
        pixel=jnp.arange(num_pixels, dtype=jnp.int32),
        throughput=jnp.ones((num_pixels, 3), jnp.float32),
        rng=acc.rng.reshape(num_pixels, 4),
        live=jnp.ones((num_pixels,), bool),
        radiance=jnp.zeros((num_pixels, 3), jnp.float32),
        rng_out=acc.rng.reshape(num_pixels, 4),
    )

    def cond(s: _QueueState):
        return (s.bounce < num_bounces) & (s.count > 0)

    def body(s: _QueueState) -> _QueueState:
        hit = nearest_hit(s.ray_o, s.ray_d, scene)
        # Death test uses the stored (previous-bounce) throughput, before
        # emission — Inline semantics (Trace.hs:364-365).
        alive = s.live & hit.hit & ~linalg.near_zero(s.throughput)

        # Deterministic scatter-add of this bounce's emission.
        contrib = jnp.where(
            alive[..., None], brdf_ops.emittance(hit) * s.throughput, 0.0
        )
        radiance = s.radiance.at[s.pixel].add(
            contrib, mode="drop", indices_are_sorted=False
        )

        next_o, next_d, tmod, rng2 = brdf_ops.sample(hit, s.ray_d, s.rng)
        new_thpt = s.throughput * tmod

        if russian_roulette:
            u, rng2 = rng_ops.sfc32_float(rng2)
            p_survive = jnp.clip(jnp.max(new_thpt, axis=-1), 0.05, 1.0)
            active = s.bounce >= rr_start
            killed = active & (u >= p_survive)
            scale = jnp.where(active, 1.0 / p_survive, 1.0)
            new_thpt = jnp.where(
                killed[..., None], 0.0, new_thpt * scale[..., None]
            )

        # Lanes that sampled survive to the next bounce (their possibly
        # near-zero throughput is re-tested there, like Inline); lanes that
        # failed the death test die now with an unadvanced rng.
        next_live = alive
        dying = s.live & ~alive
        wb_idx = jnp.where(dying, s.pixel, num_pixels)  # OOB rows dropped
        rng_out = s.rng_out.at[wb_idx].set(s.rng, mode="drop")

        new = s._replace(
            bounce=s.bounce + 1,
            count=jnp.sum(next_live).astype(jnp.int32),
            ray_o=jnp.where(alive[..., None], next_o, s.ray_o),
            ray_d=jnp.where(alive[..., None], next_d, s.ray_d),
            throughput=jnp.where(alive[..., None], new_thpt, s.throughput),
            rng=jnp.where(alive[..., None], rng2, s.rng),
            live=next_live,
            radiance=radiance,
            rng_out=rng_out,
        )
        if compact:
            (o2, d2, px2, th2, rng3), live2 = compact_queue(
                (new.ray_o, new.ray_d, new.pixel, new.throughput, new.rng),
                new.live,
            )
            new = new._replace(
                ray_o=o2, ray_d=d2, pixel=px2, throughput=th2, rng=rng3,
                live=live2,
            )
        return new

    final = jax.lax.while_loop(cond, body, state)

    # Rays still live at the bounce cap write back their rng now.
    wb_idx = jnp.where(final.live, final.pixel, num_pixels)
    rng_out = final.rng_out.at[wb_idx].set(final.rng, mode="drop")

    return Accumulator(
        color=acc.color + final.radiance.reshape(height, width, 3),
        rng=rng_out.reshape(height, width, 4),
        iterations=acc.iterations + 1,
    )


def render_batch_wavefront(
    scene: Scene,
    camera: Camera,
    acc: Accumulator,
    spp: int,
    num_bounces: int = 15,
    russian_roulette: bool = False,
) -> Accumulator:
    """`spp` wavefront samples in one dispatch (on-device sample loop)."""

    def body(_, a):
        return render_sample_wavefront(
            scene, camera, a, num_bounces, russian_roulette
        )

    return jax.lax.fori_loop(0, spp, body, acc)
