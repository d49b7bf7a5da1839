"""Wavefront integrator: fixed-capacity ray queues with stream compaction.

TPU-native redesign of the reference's `Streams` algorithm
(/root/reference/src/Scene/Trace.hs:141-191, 272-331).  The reference leans
on Accelerate's `expand` — a dynamic-shape flat-map — for ray
expansion/compaction, which is exactly what broke its GPU backend
(Trace.hs:280-283) and what XLA's static-shape model forbids.  Here the
dynamic ray population lives in a *fixed-capacity queue*:

  * the ray-state SoA (`origin, direction, pixel, throughput, accum, rng`)
    occupies Q slots; a live count + front-compaction replace dynamic
    shapes — dead rays are swept to the back by a stable compaction
    permutation, keeping live rays dense at the front (required by the
    splitting integrator's enqueue);
  * the device-resident bounce loop is `lax.while_loop`, the analog of the
    reference's `awhile` (Trace.hs:142-150), terminating when the live
    count hits zero or the bounce cap is reached;
  * **radiance accumulates per-lane** (`accum`), and is scatter-added into
    the image ONCE per sample after the loop.  The reference scatters
    every bounce (`permute`, Trace.hs:179-184) and that is where its GPU
    run died; per-bounce scatters are equally hostile to TPU (XLA
    serializes arbitrary-index scatter) — measured 30x slower than this
    formulation at 512x512.  The final scatter is a deterministic
    `segment-sum-by-pixel`, fixing the reference's seed-collision race
    (Trace.hs:186-191);
  * RNG states write back once at the end: dead lanes never advance their
    generator, so the final per-lane state IS the death-time state the
    reference's semantics require.

Termination matches `Inline` exactly (dead = miss or nearZero throughput,
checked before emission with the *previous* bounce's throughput), so
`wavefront == inline` bit-for-bit on split-free scenes — the cross-check
the reference could never make.  Ray splitting (dielectrics) enqueues
child rays into the queue's spare capacity; see
`render_sample_wavefront_split`.
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
from ..ops.compaction import compact_and_enqueue, compact_queue
from ..ops.intersect import EPSILON, nearest_hit


class _QueueState(NamedTuple):
    bounce: jnp.ndarray  # [] i32
    count: jnp.ndarray  # [] i32 — live rays at the queue front
    ray_o: jnp.ndarray  # [Q, 3]
    ray_d: jnp.ndarray  # [Q, 3]
    pixel: jnp.ndarray  # [Q] i32 flat pixel id
    throughput: jnp.ndarray  # [Q, 3]
    accum: jnp.ndarray  # [Q, 3] per-lane radiance (scattered once at end)
    rng: jnp.ndarray  # [Q, 4] u32
    occupancy: jnp.ndarray  # [num_bounces + 1] i32 — rays entering each bounce


class WavefrontStats(NamedTuple):
    """Per-wavefront-step telemetry (SURVEY.md §5 observability plan).

    ``occupancy[b]`` is the number of rays entering bounce ``b`` — the live
    population the wavefront processed at that step (``occupancy[0]`` is
    the primary-ray count; the final entry is the population still alive
    after the last bounce).  Bounces never reached because the queue
    drained early report 0.  ``capacity`` is the queue size, so
    ``occupancy / capacity`` is lane utilization — the number that tells
    you when compaction or a smaller queue would pay off.
    """

    occupancy: jnp.ndarray  # [num_bounces + 1] i32
    capacity: int


def depth_histogram(stats: WavefrontStats) -> jnp.ndarray:
    """Bounce-depth histogram derived from occupancy.

    Entry ``b`` counts rays whose path performed exactly ``b`` shading
    events: a ray that dies (misses or hits near-zero throughput) during
    bounce ``b`` shaded only bounces ``0..b-1``, so deaths during bounce
    ``b`` = ``occupancy[b] - occupancy[b+1]`` have depth ``b``.  The final
    entry counts rays still alive at the bounce cap.  Length
    ``num_bounces + 1``; sums to the primary-ray count ``occupancy[0]``.
    """
    occ = stats.occupancy
    return jnp.concatenate([occ[:-1] - occ[1:], occ[-1:]])


def render_sample_wavefront(
    scene: Scene,
    camera: Camera,
    acc: Accumulator,
    num_bounces: int = 15,
    russian_roulette: bool = False,
    rr_start: int = 3,
    compact: bool = False,
    return_stats: bool = False,
):
    """One progressive sample via the wavefront queue.

    `compact=False` (default): lanes keep pixel order; right for TPU where
    the whole queue is processed every bounce anyway and the permutation
    gather costs more than it saves (measured: compaction tripled the
    per-sample time at 512x512).  `compact=True` maintains the live-dense
    invariant — needed when a downstream consumer processes only the
    queue front (per-tile Pallas kernels, ray splitting).

    `return_stats=True` additionally returns :class:`WavefrontStats` with
    per-bounce live-ray occupancy (the telemetry that prices compaction).
    """
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
        accum=jnp.zeros((num_pixels, 3), jnp.float32),
        rng=acc.rng.reshape(num_pixels, 4),
        occupancy=jnp.zeros((num_bounces + 1,), jnp.int32),
    )

    def cond(s: _QueueState):
        return (s.bounce < num_bounces) & (s.count > 0)

    def body(s: _QueueState) -> _QueueState:
        occupancy = s.occupancy.at[s.bounce].set(s.count)
        hit = nearest_hit(s.ray_o, s.ray_d, scene)
        # Death test uses the stored (previous-bounce) throughput, before
        # emission — Inline semantics (Trace.hs:364-365).  A lane whose
        # throughput is zero is dead forever, so `live` needs no separate
        # flag.
        alive = hit.hit & ~linalg.near_zero(s.throughput)

        contrib = brdf_ops.emittance(hit) * s.throughput
        accum = jnp.where(alive[..., None], s.accum + contrib, s.accum)

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

        a3 = alive[..., None]
        new = s._replace(
            bounce=s.bounce + 1,
            count=jnp.sum(alive).astype(jnp.int32),
            ray_o=jnp.where(a3, next_o, s.ray_o),
            ray_d=jnp.where(a3, next_d, s.ray_d),
            throughput=jnp.where(a3, new_thpt, jnp.zeros_like(s.throughput)),
            accum=accum,
            rng=jnp.where(alive[..., None], rng2, s.rng),
            occupancy=occupancy,
        )
        if compact:
            live = ~linalg.near_zero(new.throughput)
            (o2, d2, px2, th2, ac2, rng3), _ = compact_queue(
                (new.ray_o, new.ray_d, new.pixel, new.throughput, new.accum,
                 new.rng),
                live,
            )
            new = new._replace(
                ray_o=o2, ray_d=d2, pixel=px2, throughput=th2, accum=ac2,
                rng=rng3,
            )
        return new

    final = jax.lax.while_loop(cond, body, state)

    # One deterministic scatter per sample: per-lane radiance sums into the
    # image, per-lane RNG states write back (each pixel owns exactly one
    # lane; dead lanes stopped advancing at death, so this IS the
    # death-time state).
    color = (
        acc.color.reshape(num_pixels, 3)
        .at[final.pixel]
        .add(final.accum, mode="drop")
    )
    rng_out = (
        acc.rng.reshape(num_pixels, 4)
        .at[final.pixel]
        .set(final.rng, mode="drop")
    )
    out = Accumulator(
        color=color.reshape(height, width, 3),
        rng=rng_out.reshape(height, width, 4),
        iterations=acc.iterations + 1,
    )
    if return_stats:
        # The slot for the bounce the loop stopped at was never written by
        # the body: record the population that carried out of the loop
        # (0 on early drain; cap survivors on a full run).
        occ = final.occupancy.at[final.bounce].set(final.count)
        return out, WavefrontStats(occupancy=occ, capacity=num_pixels)
    return out


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
    return_stats: bool = False,
):
    """One progressive sample with *deterministic dielectric ray splitting*.

    At a glass hit the ray splits into both Fresnel branches — reflection
    continues in the parent's lane with weight F, refraction is enqueued as
    a child ray with weight 1-F (`ops/compaction.py:enqueue` scattering into
    the queue's spare capacity).  This removes all branch-choice variance at
    dielectrics; expectation is identical to the stochastic one-branch
    estimator used by the inline integrator (tests/test_split.py).

    The queue holds `queue_factor * num_pixels` slots; children that would
    overflow are dropped (size the factor to the scene's dielectric depth).
    Because enqueued children overwrite swept-back dead lanes, radiance is
    scattered into the per-pixel image every bounce (the lane's history
    cannot ride in the queue), and RNG states write back at death — the
    per-bounce-scatter design the plain wavefront avoids; splitting buys
    variance elimination at that cost.  Per-pixel RNG write-back follows
    the *primary* lane only, so the accumulator's RNG contract matches the
    other integrators.
    """
    height, width = acc.color.shape[:2]
    num_pixels = height * width
    capacity = int(round(queue_factor * num_pixels))

    rays = primary_rays(camera, width, height)

    def pad(a, fill=0):
        shape = (capacity - num_pixels,) + a.shape[1:]
        return jnp.concatenate([a, jnp.full(shape, fill, a.dtype)], axis=0)

    class _S(NamedTuple):
        bounce: jnp.ndarray
        count: jnp.ndarray
        ray_o: jnp.ndarray
        ray_d: jnp.ndarray
        pixel: jnp.ndarray
        throughput: jnp.ndarray
        rng: jnp.ndarray
        live: jnp.ndarray
        primary: jnp.ndarray
        radiance: jnp.ndarray  # [P, 3] per-pixel
        rng_out: jnp.ndarray  # [P, 4]
        occupancy: jnp.ndarray  # [num_bounces + 1] i32

    state = _S(
        bounce=jnp.zeros((), jnp.int32),
        count=jnp.asarray(num_pixels, jnp.int32),
        ray_o=pad(rays.origin.reshape(num_pixels, 3)),
        ray_d=pad(rays.direction.reshape(num_pixels, 3)),
        pixel=pad(jnp.arange(num_pixels, dtype=jnp.int32)),
        throughput=pad(jnp.ones((num_pixels, 3), jnp.float32)),
        rng=pad(acc.rng.reshape(num_pixels, 4)),
        live=pad(jnp.ones((num_pixels,), bool), False),
        primary=pad(jnp.ones((num_pixels,), bool), False),
        radiance=jnp.zeros((num_pixels, 3), jnp.float32),
        rng_out=acc.rng.reshape(num_pixels, 4),
        occupancy=jnp.zeros((num_bounces + 1,), jnp.int32),
    )

    def cond(s):
        return (s.bounce < num_bounces) & (s.count > 0)

    def body(s):
        occupancy = s.occupancy.at[s.bounce].set(s.count)
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

        # Dying primaries flush their RNG now (children never write back).
        dying = s.live & ~alive
        wb_idx = jnp.where(dying & s.primary, s.pixel, num_pixels)
        rng_out = s.rng_out.at[wb_idx].set(s.rng, mode="drop")

        a3 = alive[..., None]
        new = s._replace(
            bounce=s.bounce + 1,
            ray_o=jnp.where(a3, next_o, s.ray_o),
            ray_d=jnp.where(a3, next_d, s.ray_d),
            throughput=jnp.where(a3, new_thpt, s.throughput),
            rng=jnp.where(alive[..., None], rng2, s.rng),
            live=alive,
            radiance=radiance,
            rng_out=rng_out,
            occupancy=occupancy,
        )

        # Fused stable compaction + child enqueue (one key sort; dead
        # lanes are dropped — their radiance/RNG were flushed above).
        (o3, d3_, px3, th3, rng4, pr3), count2 = compact_and_enqueue(
            (new.ray_o, new.ray_d, new.pixel, new.throughput, new.rng,
             new.primary),
            new.live,
            (child_o, refr_dir, s.pixel, child_thpt, child_rng,
             jnp.zeros_like(s.primary)),
            child_mask,
        )
        live3 = jax.lax.broadcasted_iota(jnp.int32, (capacity,), 0) < count2
        return new._replace(
            count=count2, ray_o=o3, ray_d=d3_, pixel=px3, throughput=th3,
            rng=rng4, live=live3, primary=pr3,
        )

    final = jax.lax.while_loop(cond, body, state)

    # Primaries still live at the bounce cap write their RNG back now.
    wb_idx = jnp.where(final.live & final.primary, final.pixel, num_pixels)
    rng_out = final.rng_out.at[wb_idx].set(final.rng, mode="drop")

    out = Accumulator(
        color=acc.color + final.radiance.reshape(height, width, 3),
        rng=rng_out.reshape(height, width, 4),
        iterations=acc.iterations + 1,
    )
    if return_stats:
        occ = final.occupancy.at[final.bounce].set(final.count)
        return out, WavefrontStats(occupancy=occ, capacity=capacity)
    return out


def render_batch_wavefront(
    scene: Scene,
    camera: Camera,
    acc: Accumulator,
    spp: int,
    num_bounces: int = 15,
    russian_roulette: bool = False,
    return_stats: bool = False,
):
    """`spp` wavefront samples in one dispatch (on-device sample loop).

    With `return_stats=True` also returns :class:`WavefrontStats` whose
    occupancy is summed over the batch's samples (divide by `spp` for the
    mean per-bounce live population).
    """
    if return_stats:

        def body_s(_, carry):
            a, occ = carry
            a, stats = render_sample_wavefront(
                scene, camera, a, num_bounces, russian_roulette,
                return_stats=True,
            )
            return a, occ + stats.occupancy

        occ0 = jnp.zeros((num_bounces + 1,), jnp.int32)
        out, occ = jax.lax.fori_loop(0, spp, body_s, (acc, occ0))
        h, w = acc.color.shape[:2]
        return out, WavefrontStats(occupancy=occ, capacity=h * w)

    def body(_, a):
        return render_sample_wavefront(
            scene, camera, a, num_bounces, russian_roulette
        )

    return jax.lax.fori_loop(0, spp, body, acc)
