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
from ..models.objects import BRDF_DIELECTRIC, Accumulator, Camera, Scene
from ..ops import brdf as brdf_ops
from ..ops import rng as rng_ops
from ..ops.compaction import compact_queue, enqueue
from ..ops.intersect import EPSILON, nearest_hit


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


def _derive_child_rng(rng: jnp.ndarray) -> jnp.ndarray:
    """Decorrelated SFC32 state for a split-off child ray.

    Perturb the parent's post-sample state with a golden-ratio constant and
    burn 4 rounds, so parent and child streams diverge immediately.  (The
    reference never got here — ray splitting was its unimplemented TODO,
    /root/reference/src/Scene/Trace.hs:116-118.)
    """
    child = rng.at[..., 1].set(rng[..., 1] ^ jnp.uint32(0x9E3779B9))
    for _ in range(4):
        _, child = rng_ops.sfc32_next(child)
    return child


def render_sample_wavefront_split(
    scene: Scene,
    camera: Camera,
    acc: Accumulator,
    num_bounces: int = 15,
    queue_factor: float = 2.0,
) -> Accumulator:
    """One progressive sample with *deterministic dielectric ray splitting*.

    At a glass hit the ray splits into both Fresnel branches — reflection
    continues in the parent's lane with weight F, refraction is enqueued as
    a child ray with weight 1-F (`ops/compaction.py:enqueue` scattering into
    the queue's spare capacity).  This removes all branch-choice variance at
    dielectrics; expectation is identical to the stochastic one-branch
    estimator used by the inline integrator (tests/test_split.py).

    The queue holds `queue_factor * num_pixels` slots; children that would
    overflow are dropped (counted against `queue_factor` sizing, never
    silently biased in practice — size the factor to the scene's dielectric
    depth).  Per-pixel RNG write-back follows the *primary* lane only, so
    the accumulator's RNG contract matches the other integrators.
    """
    height, width = acc.color.shape[:2]
    num_pixels = height * width
    capacity = int(round(queue_factor * num_pixels))

    rays = primary_rays(camera, width, height)

    def pad(a, fill=0):
        shape = (capacity - num_pixels,) + a.shape[1:]
        return jnp.concatenate([a, jnp.full(shape, fill, a.dtype)], axis=0)

    state = _QueueState(
        bounce=jnp.zeros((), jnp.int32),
        count=jnp.asarray(num_pixels, jnp.int32),
        ray_o=pad(rays.origin.reshape(num_pixels, 3)),
        ray_d=pad(rays.direction.reshape(num_pixels, 3)),
        pixel=pad(jnp.arange(num_pixels, dtype=jnp.int32)),
        throughput=pad(jnp.ones((num_pixels, 3), jnp.float32)),
        rng=pad(acc.rng.reshape(num_pixels, 4)),
        live=pad(jnp.ones((num_pixels,), bool), False),
        radiance=jnp.zeros((num_pixels, 3), jnp.float32),
        rng_out=acc.rng.reshape(num_pixels, 4),
    )
    # Primary-lane flag rides along (children never write RNG back).
    primary = pad(jnp.ones((num_pixels,), bool), False)

    def cond(carry):
        s, _ = carry
        return (s.bounce < num_bounces) & (s.count > 0)

    def body(carry):
        s, prim = carry
        hit = nearest_hit(s.ray_o, s.ray_d, scene)
        alive = s.live & hit.hit & ~linalg.near_zero(s.throughput)

        contrib = jnp.where(
            alive[..., None], brdf_ops.emittance(hit) * s.throughput, 0.0
        )
        radiance = s.radiance.at[s.pixel].add(contrib, mode="drop")

        # Stochastic sample for matte/glossy (3 draws, like every other
        # integrator); dielectric lanes are overridden deterministically.
        next_o, next_d, tmod, rng2 = brdf_ops.sample(hit, s.ray_d, s.rng)

        is_diel = alive & (hit.brdf_kind == BRDF_DIELECTRIC)
        refl_dir, refr_dir, f_refl = brdf_ops.dielectric_split(
            s.ray_d, hit.normal, hit.brdf_param
        )
        # Parent lane continues as the reflection branch, weight F.
        next_d = jnp.where(is_diel[..., None], refl_dir, next_d)
        next_o = jnp.where(
            is_diel[..., None], hit.point + refl_dir * EPSILON, next_o
        )
        tmod = jnp.where(
            is_diel[..., None], hit.color * f_refl[..., None], tmod
        )
        new_thpt = s.throughput * tmod

        # Refraction child: weight 1-F, skipped under TIR or negligible
        # throughput (same nearZero cutoff as the death test).
        child_thpt = s.throughput * hit.color * (1.0 - f_refl)[..., None]
        child_mask = is_diel & (f_refl < 1.0) & ~linalg.near_zero(child_thpt)
        child_o = hit.point + refr_dir * EPSILON
        child_rng = _derive_child_rng(rng2)

        dying = s.live & ~alive
        wb_idx = jnp.where(dying & prim, s.pixel, num_pixels)
        rng_out = s.rng_out.at[wb_idx].set(s.rng, mode="drop")

        new = s._replace(
            bounce=s.bounce + 1,
            ray_o=jnp.where(alive[..., None], next_o, s.ray_o),
            ray_d=jnp.where(alive[..., None], next_d, s.ray_d),
            throughput=jnp.where(alive[..., None], new_thpt, s.throughput),
            rng=jnp.where(alive[..., None], rng2, s.rng),
            live=alive,
            radiance=radiance,
            rng_out=rng_out,
        )

        # Compact (live-first, stable), then enqueue children after the
        # live block.
        (o2, d2, px2, th2, rng3, pr2), live2 = compact_queue(
            (new.ray_o, new.ray_d, new.pixel, new.throughput, new.rng, prim),
            new.live,
        )
        count = jnp.sum(live2).astype(jnp.int32)
        (o3, d3_, px3, th3, rng4, pr3), count2 = enqueue(
            (o2, d2, px2, th2, rng3, pr2),
            count,
            (child_o, refr_dir, s.pixel, child_thpt, child_rng,
             jnp.zeros_like(prim)),
            child_mask,
        )
        live3 = (
            jax.lax.broadcasted_iota(jnp.int32, (capacity,), 0) < count2
        )
        new = new._replace(
            count=count2, ray_o=o3, ray_d=d3_, pixel=px3, throughput=th3,
            rng=rng4, live=live3,
        )
        return (new, pr3)

    final, final_prim = jax.lax.while_loop(cond, body, (state, primary))

    # Rays still live at the bounce cap write back now — primary lanes
    # only, so a child sharing the pixel never clobbers the primary's
    # stream.
    wb_idx = jnp.where(final.live & final_prim, final.pixel, num_pixels)
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
