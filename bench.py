"""Benchmark: rays/sec/chip on the flagship render path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric (BASELINE.md) is ray segments traced per second per
chip at 512x512.  A "ray segment" is one intersect+shade lane-step of the
bounce loop: pixels * spp * bounces for the inline megakernel (dead lanes
still occupy their SIMD lane, exactly as in the reference's Inline
algorithm).  vs_baseline is measured against the 5e8 rays/s/chip
north-star target (the reference publishes no numbers — SURVEY.md §6).
"""

from __future__ import annotations

import json
import time

import jax

WIDTH, HEIGHT = 512, 512
SPP = 64  # BASELINE.md headline config: 512x512 / 64 spp
BOUNCES = 8
TARGET_RAYS_PER_S = 5.0e8


def main() -> None:
    from haskell_path_tracer_tpu.models import world
    from haskell_path_tracer_tpu.render.integrator import (
        make_accumulator,
        render_batch_auto,
    )

    scene = world.main_scene()
    camera = world.initial_camera()
    acc = make_accumulator(WIDTH, HEIGHT, seed=0)

    # Static scene fact computed outside jit: the reference scene has no
    # glass, so the kernel's dielectric block is elided (bit-exact).
    from haskell_path_tracer_tpu.render.renderer import Renderer

    has_diel = Renderer._scene_has_dielectric(scene)
    step = jax.jit(
        lambda s, c, a: render_batch_auto(
            s, c, a, spp=SPP, num_bounces=BOUNCES, has_dielectric=has_diel
        )
    )

    def barrier(a):
        # A tiny host fetch (3 floats) — unlike jax.block_until_ready,
        # which has been observed to return early on tunneled remote
        # devices, a device_get cannot complete before the computation
        # producing the buffer has.
        return float(jax.device_get(a.color[0, 0, 0]))

    # Warmup / compile.
    acc = step(scene, camera, acc)
    barrier(acc)

    # Timed: best of 3 rounds of PIPELINE consecutive async dispatches
    # (one data-fetch barrier at the end).  Progressive rendering
    # dispatches without per-step blocking, so back-to-back device time
    # is the production number; per-dispatch host/tunnel latency would
    # otherwise dominate on remote-attached chips.
    PIPELINE = 4
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(PIPELINE):
            acc = step(scene, camera, acc)
        barrier(acc)
        times.append((time.perf_counter() - t0) / PIPELINE)

    dt = min(times)
    rays = WIDTH * HEIGHT * SPP * BOUNCES
    rays_per_s = rays / dt
    print(
        json.dumps(
            {
                "metric": f"ray_segments_per_s_chip_fwd_{WIDTH}x{HEIGHT}x{SPP}sppx{BOUNCES}b",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / TARGET_RAYS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
