"""Benchmark: fwd+bwd rays/sec/chip on the flagship differentiable path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric (BASELINE.md:26) is ray segments traced per second per
chip **forward + backward** at 512x512 / 64 spp: one full gradient
evaluation of the inverse-rendering loss through the differentiable Pallas
megakernel (ops/pallas_megakernel_vjp.py) — the fused forward pass plus
the in-VMEM reverse sweep producing scene-parameter and camera-ray
gradients.  A "ray segment" is one intersect+shade lane-step of the bounce
loop: pixels * spp * bounces (dead lanes still occupy their SIMD lane,
exactly as in the reference's Inline algorithm — the backward sweep
re-walks the same segments).  vs_baseline is measured against the 5e8
rays/s/chip north-star target (the reference publishes no numbers —
SURVEY.md §6).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

WIDTH, HEIGHT = 512, 512
SPP = 64  # BASELINE.md headline config: 512x512 / 64 spp
BOUNCES = 8
TARGET_RAYS_PER_S = 5.0e8


def main() -> None:
    from haskell_path_tracer_tpu.diff.grad import (
        params_to_scene,
        scene_to_params,
    )
    from haskell_path_tracer_tpu.models import world
    from haskell_path_tracer_tpu.models.camera import primary_rays
    from haskell_path_tracer_tpu.ops import rng as rng_ops
    from haskell_path_tracer_tpu.ops.pallas_megakernel_vjp import (
        trace_inline_pallas_diff,
    )
    from haskell_path_tracer_tpu.render.renderer import Renderer

    scene = world.main_scene()
    camera = world.initial_camera()
    rays = primary_rays(camera, WIDTH, HEIGHT)
    rng = rng_ops.gen_seeds((HEIGHT, WIDTH), seed=0)
    params = scene_to_params(scene)

    # Static scene fact computed outside jit: the reference scene has no
    # glass, so the kernels' dielectric block is elided (bit-exact).
    has_diel = Renderer._scene_has_dielectric(scene)

    def loss(p):
        sc = params_to_scene(p, scene)
        rad, _ = trace_inline_pallas_diff(
            sc, rays, rng, num_bounces=BOUNCES, spp=SPP,
            has_dielectric=has_diel,
        )
        return jnp.sum(rad)

    step = jax.jit(jax.grad(loss))

    def barrier(g):
        # A tiny host fetch — unlike jax.block_until_ready, which has been
        # observed to return early on tunneled remote devices, a device_get
        # cannot complete before the computation producing it has.
        return float(jax.device_get(g.sphere_pos[0, 0]))

    # Warmup / compile.
    grads = step(params)
    barrier(grads)

    # Timed: best of 3 rounds of PIPELINE consecutive async dispatches
    # (one data-fetch barrier at the end).  Gradient-descent loops dispatch
    # without per-step blocking, so back-to-back device time is the
    # production number; per-dispatch host/tunnel latency would otherwise
    # dominate on remote-attached chips.
    PIPELINE = 4
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(PIPELINE):
            grads = step(params)
        barrier(grads)
        times.append((time.perf_counter() - t0) / PIPELINE)

    dt = min(times)
    rays_n = WIDTH * HEIGHT * SPP * BOUNCES
    rays_per_s = rays_n / dt
    print(
        json.dumps(
            {
                "metric": (
                    "ray_segments_per_s_chip_fwd+bwd_"
                    f"{WIDTH}x{HEIGHT}x{SPP}sppx{BOUNCES}b"
                ),
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / TARGET_RAYS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
