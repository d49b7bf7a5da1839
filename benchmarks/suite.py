"""Benchmark suite over the BASELINE.md configs.

Prints one JSON line per config (bench.py at the repo root remains the
single-line headline the driver scrapes).  Run on the TPU chip:

    python benchmarks/suite.py            # all configs
    python benchmarks/suite.py 1 4        # a subset

Configs (BASELINE.json), all at their specified shapes:
  1. parity scene  — 1 diffuse sphere + plane, 256x256 / 4 spp / 2 bounces
  2. Cornell-ish   — 8 spheres, 512x512 / 16 spp / 4 bounces
  3. dielectric    — glass with ray splitting, 512x512 / 64 spp / 8 bounces
  4. large scene   — 1920x1088, 1000 spheres, NEE, 256 spp / 4 bounces
  5. inverse       — gradient step throughput at 512x512 (multi-host
                     scaling is exercised by __graft_entry__.dryrun_multichip)
  6. physical NEE  — the production estimator on the Cornell scene (the
                     small-scene coverage of the fused NEE megakernel)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def _fetch_barrier(out):
    """Force real completion: device_get of one element cannot finish
    before the producing computation has (block_until_ready has been seen
    returning early on tunneled remote devices — see bench.py)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def _timeit(fn, n=3):
    out = fn()
    _fetch_barrier(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _fetch_barrier(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def _pipeline(step, state, k, n=2):
    """ONE timing methodology for every config (VERDICT r2 item 4): a
    chain of `k` dependent dispatches timed end to end (the production
    dispatch pattern — renderers and trainers enqueue without blocking),
    plus the single-dispatch round-trip latency reported alongside.
    Returns (dt_single, dt_chain)."""

    def chained(s):
        for _ in range(k):
            s = step(s)
        return s

    dt1 = _timeit(lambda: step(state), n=n)
    dtk = _timeit(lambda: chained(state), n=n)
    return dt1, dtk


TARGET_RAYS_PER_S = 5.0e8  # BASELINE.json north star (rays/s/chip)


def _report(config, name, rays, seconds, extra=None):
    rec = {
        "config": config,
        "metric": name,
        "value": rays / seconds,
        "unit": "rays/s",
        "seconds": round(seconds, 4),
        # One methodology + one accounting rule make these ratios
        # comparable across configs (VERDICT r2 item 4).
        "vs_baseline": round(rays / seconds / TARGET_RAYS_PER_S, 4),
    }
    rec.update(extra or {})
    print(json.dumps(rec), flush=True)


def parity_scene():
    from haskell_path_tracer_tpu.models.objects import (
        BRDF_MATTE,
        Scene,
        make_materials,
        make_planes,
        make_spheres,
    )

    s = make_spheres(
        [[0.0, 0.0, -5.0]],
        [1.5],
        make_materials([([0.8, 0.5, 0.4], 1.5, BRDF_MATTE, 1.0)]),
    )
    p = make_planes(
        [[0.0, -3.0, 0.0]],
        [[0.0, 1.0, 0.0]],
        make_materials([([0.6, 0.7, 0.6], 0.0, BRDF_MATTE, 1.2)]),
    )
    return Scene(spheres=s, planes=p)


def cornell_scene():
    from haskell_path_tracer_tpu.models.objects import (
        BRDF_GLOSSY,
        BRDF_MATTE,
        Scene,
        make_materials,
        make_planes,
        make_spheres,
    )

    rng = np.random.default_rng(0)
    pos = rng.uniform([-3, -2, -8], [3, 2, -4], (8, 3))
    mats = make_materials(
        [
            (rng.uniform(0.2, 0.9, 3).tolist(),
             30.0 if i == 0 else 0.0,
             BRDF_GLOSSY if i % 3 == 2 else BRDF_MATTE,
             0.9)
            for i in range(8)
        ]
    )
    s = make_spheres(pos.tolist(), rng.uniform(0.4, 1.0, 8).tolist(), mats)
    p = make_planes(
        [[0, -3, 0], [0, 8, 0]],
        [[0, 1, 0], [0, -1, 0]],
        make_materials(
            [([0.7, 0.7, 0.7], 0.0, BRDF_MATTE, 1.2),
             ([0.8, 0.8, 0.8], 0.0, BRDF_MATTE, 1.0)]
        ),
    )
    return Scene(spheres=s, planes=p)


def glass_scene():
    from haskell_path_tracer_tpu.models.objects import (
        BRDF_DIELECTRIC,
        BRDF_MATTE,
        Scene,
        make_materials,
        make_planes,
        make_spheres,
    )

    s = make_spheres(
        [[0.0, 0.0, -4.0], [1.8, 0.5, -6.0]],
        [1.3, 0.9],
        make_materials(
            [([0.97, 0.98, 1.0], 0.0, BRDF_DIELECTRIC, 1.5),
             ([0.9, 0.95, 1.0], 0.0, BRDF_DIELECTRIC, 1.33)]
        ),
    )
    p = make_planes(
        [[0.0, 0.0, -9.0], [0.0, -3.0, 0.0]],
        [[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]],
        make_materials(
            [([1.0, 0.9, 0.7], 3.0, BRDF_MATTE, 1.0),
             ([0.5, 0.5, 0.6], 0.0, BRDF_MATTE, 1.2)]
        ),
    )
    return Scene(spheres=s, planes=p)


def big_scene(n=1000):
    from haskell_path_tracer_tpu.models.objects import (
        BRDF_MATTE,
        Scene,
        make_materials,
        make_planes,
        make_spheres,
    )

    rng = np.random.default_rng(7)
    pos = rng.uniform([-30, -2.5, -60], [30, 10, -8], (n, 3))
    radius = rng.uniform(0.2, 0.9, n)
    illum = np.where(rng.random(n) < 0.01, 50.0, 0.0)  # ~10 lights
    mats = make_materials(
        [
            (rng.uniform(0.2, 0.9, 3).tolist(), float(illum[i]),
             BRDF_MATTE, 1.0)
            for i in range(n)
        ]
    )
    s = make_spheres(pos.tolist(), radius.tolist(), mats)
    p = make_planes(
        [[0.0, -3.0, 0.0]],
        [[0.0, 1.0, 0.0]],
        make_materials([([0.6, 0.6, 0.6], 0.0, BRDF_MATTE, 1.0)]),
    )
    return Scene(spheres=s, planes=p)


def config1():
    import haskell_path_tracer_tpu as hpt
    from haskell_path_tracer_tpu.render.integrator import render_batch_auto

    w, h, spp, b = 256, 256, 4, 2
    scene, cam = parity_scene(), hpt.initial_camera()
    acc = hpt.make_accumulator(w, h, seed=0)
    step = jax.jit(
        lambda s, c, a: render_batch_auto(
            s, c, a, spp=spp, num_bounces=b, has_dielectric=False
        )
    )
    # 0.5 M segments/dispatch behind a ~25-30 ms tunnel launch floor:
    # the config is floor-dominated at any shallow pipeline (round 3's
    # k=16 scored 0.53x; k=1 is 0.03x).  A deep chain both amortizes the
    # floor AND yields the floor-free device rate as the marginal
    # per-step slope — measured 191.6 us/step between k=256 and k=512
    # = 2.74 Grays/s on-device (VERDICT r3 item 8 decomposition; PERF.md
    # "Config 1").
    k = 256
    dt1, dtk = _pipeline(lambda a: step(scene, cam, a), acc, k, n=3)
    k2, dt2 = 512, None
    dt2 = _pipeline(lambda a: step(scene, cam, a), acc, k2, n=1)[1]
    slope = (dt2 - dtk) / (k2 - k)
    _report(
        1, "parity_256x256x4sppx2b_auto", w * h * spp * b * k, dtk,
        {"pipeline": k, "single_ms": round(dt1 * 1e3, 2),
         "device_rays_per_s": round(w * h * spp * b / slope),
         "note": "device_rays_per_s = floor-free marginal rate from the "
                 "k=256..512 chain slope"},
    )


def config2():
    import haskell_path_tracer_tpu as hpt
    from haskell_path_tracer_tpu.render.integrator import render_batch_auto

    w, h, spp, b = 512, 512, 16, 4
    scene, cam = cornell_scene(), hpt.initial_camera()
    acc = hpt.make_accumulator(w, h, seed=0)
    from haskell_path_tracer_tpu.render.renderer import Renderer

    hd = Renderer._scene_has_dielectric(scene)
    step = jax.jit(
        lambda s, c, a: render_batch_auto(
            s, c, a, spp=spp, num_bounces=b, has_dielectric=hd
        )
    )
    k = 8
    dt1, dtk = _pipeline(lambda a: step(scene, cam, a), acc, k)
    _report(
        2, "cornell8_512x512x16sppx4b_auto", w * h * spp * b * k, dtk,
        {"pipeline": k, "single_ms": round(dt1 * 1e3, 2)},
    )


def config3():
    import haskell_path_tracer_tpu as hpt
    from haskell_path_tracer_tpu.models.objects import Camera

    # The specified BASELINE shape: 512x512 / 64 spp / 8 bounces.
    w, h, spp, b = 512, 512, 64, 8
    scene = glass_scene()
    cam = Camera.create([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 90.0)
    acc = hpt.make_accumulator(w, h, seed=0)

    # Fused Pallas DFS kernel on TPU (ops/pallas_split.py), XLA
    # traversal elsewhere — same estimator.
    step = jax.jit(
        lambda s, c, a: hpt.render_batch_split_auto(
            s, c, a, spp=spp, num_bounces=b, queue_factor=2.0
        )
    )
    k = 4
    dt1, dtk = _pipeline(lambda a: step(scene, cam, a), acc, k, n=1)
    _report(
        3, "glass_split_512x512x64sppx8b_wavefront", w * h * spp * b * k,
        dtk, {"pipeline": k, "single_ms": round(dt1 * 1e3, 2)},
    )


def config4():
    import haskell_path_tracer_tpu as hpt
    from haskell_path_tracer_tpu.models.objects import Camera

    # The specified BASELINE shape: 1080p / 1000 spheres / NEE / 256 spp.
    w, h, spp, b = 1920, 1088, 256, 4
    scene = big_scene(1000)
    cam = Camera.create([0.0, 2.0, 0.0], [0.2, 0.0, 0.0], 90.0)
    acc = hpt.make_accumulator(w, h, seed=0)
    # Static facts computed on the concrete scene OUTSIDE jit: the BRDF
    # kind set (all-matte branch elision) and the emissive-sphere index
    # tuple (the fused NEE megakernel needs a static light count).
    from haskell_path_tracer_tpu.ops.pallas_nee import scene_light_indices
    from haskell_path_tracer_tpu.render.nee import _present_kinds

    kinds = _present_kinds(scene)
    light_idx = scene_light_indices(scene)
    # One 256-spp dispatch: at round-4 speeds the whole frame set runs in
    # ~10 s, inside the tunneled worker's ~60-80 s deadline, and the
    # depth-sort machinery + block-tail imbalance amortize over 8x more
    # samples than the round-3 32-spp chunks did (block work under
    # regeneration concentrates toward the lane mean as spp grows).
    spp_chunk = 256
    assert spp % spp_chunk == 0, (spp, spp_chunk)  # _report credits w*h*spp
    n_chunks = spp // spp_chunk
    step = jax.jit(
        lambda s, c, a: hpt.render_batch_physical(
            s, c, a, spp=spp_chunk, num_bounces=b, nee=True, kinds=kinds,
            light_idx=light_idx,
        )
    )

    dt1, dtk = _pipeline(
        lambda a: step(scene, cam, a), acc, n_chunks, n=1
    )
    # NEE traces 2 rays per bounce (bsdf + shadow).
    _report(
        4, "big1000_nee_1920x1088x256sppx4b_physical",
        w * h * spp * b * 2, dtk,
        {"pipeline": n_chunks, "single_ms": round(dt1 * 1e3, 1),
         "note": "rays counts bsdf+shadow; single 256-spp dispatch"},
    )


def config5():
    """Inverse rendering at BASELINE.json's specified 4K shape
    (3840x2160; multi-host is exercised by dryrun_multichip — one chip
    here), plus the round-3 512x512 shape kept as a latency row.  At 4K
    a step is ~33 M segments, enough to saturate the fused fwd+bwd
    megakernel; 512x512 (1 M segments) is dispatch-floor-bound through
    the ~25 ms tunnel launch and is reported for latency, not
    throughput (VERDICT r3 item 3)."""
    import haskell_path_tracer_tpu as hpt
    from haskell_path_tracer_tpu.diff import grad as G
    from haskell_path_tracer_tpu.ops.rng import gen_seeds

    scene, cam = cornell_scene(), hpt.initial_camera()
    params = G.scene_to_params(scene)
    # The fused differentiable Pallas megakernel on TPU (fwd + in-VMEM bwd
    # sweep, ops/pallas_megakernel_vjp.py); rematerialized XLA elsewhere.
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    lr = 1e-6

    def make_step(w, h, b):
        rng = gen_seeds((h, w), seed=1)
        target = jnp.zeros((h, w, 3), jnp.float32)
        vg = jax.value_and_grad(
            lambda p: G.image_loss(
                p, scene, cam, target, rng, num_bounces=b, backend=backend
            )
        )

        # The WHOLE step under one jit: with the full 21-leaf
        # SceneParams, a python-side tree_map update is 21 tiny
        # launches/step — launch-bound through the tunneled chip.
        @jax.jit
        def sgd_step(p):
            _, g = vg(p)
            return jax.tree_util.tree_map(lambda a, d: a - lr * d, p, g)

        return sgd_step

    # Ray accounting: segments counted ONCE per fwd+bwd step (the
    # backward re-walk is cost, not credit) — same rule as bench.py's
    # headline metric, so the two numbers are directly comparable.
    w, h, b, k = 3840, 2160, 4, 4
    dt1, dtk = _pipeline(make_step(w, h, b), params, k)
    _report(5, f"invrender_grad_4k_3840x2160x1sppx4b_{backend}",
            w * h * b * k, dtk,
            {"pipeline": k, "single_ms": round(dt1 * 1e3, 2),
             "note": "fwd+bwd step; segments counted once (bench.py rule)"})

    w, h, b, k = 512, 512, 4, 16
    dt1, dtk = _pipeline(make_step(w, h, b), params, k)
    _report(5, f"invrender_grad_512x512x1sppx4b_{backend}",
            w * h * b * k, dtk,
            {"pipeline": k, "single_ms": round(dt1 * 1e3, 2),
             "note": "latency row (dispatch-floor-bound); "
                     "segments counted once"})


def config6():
    """Physical/NEE mode on the Cornell-class scene (VERDICT r2 item 5:
    the production estimator gets the megakernel treatment on SMALL
    scenes too — ops/pallas_nee.py covers any sphere+plane count)."""
    import haskell_path_tracer_tpu as hpt
    from haskell_path_tracer_tpu.ops.pallas_nee import scene_light_indices
    from haskell_path_tracer_tpu.render.nee import _present_kinds

    w, h, spp, b = 512, 512, 16, 4
    scene, cam = cornell_scene(), hpt.initial_camera()
    acc = hpt.make_accumulator(w, h, seed=0)
    kinds = _present_kinds(scene)
    light_idx = scene_light_indices(scene)
    step = jax.jit(
        lambda s, c, a: hpt.render_batch_physical(
            s, c, a, spp=spp, num_bounces=b, nee=True, kinds=kinds,
            light_idx=light_idx,
        )
    )
    k = 8
    dt1, dtk = _pipeline(lambda a: step(scene, cam, a), acc, k)
    # NEE traces 2 rays per bounce (bsdf + shadow), same rule as config 4.
    _report(
        6, "cornell8_nee_512x512x16sppx4b_physical",
        w * h * spp * b * 2 * k, dtk,
        {"pipeline": k, "single_ms": round(dt1 * 1e3, 2),
         "note": "rays counts bsdf+shadow; compare config 2 (parity mode)"},
    )


def config7():
    """Physical/NEE gradient step (VERDICT r3 item 2): inverse rendering
    against the PRODUCTION estimator on the config-4 scene class (1000
    spheres); whole SGD step under one jit.

    Round 4: with `light_idx` passed statically this runs the NEE
    megakernel's in-kernel reverse sweep (ops/pallas_nee_vjp.py —
    forward = the production regen/presort kernel, backward = in-VMEM
    replay with the sphere fold detached).  Round-3 context: per-bounce
    dual-query VJP dispatch measured 24.3 (pallas) vs 18.5 (xla)
    Mrays/s at this shape."""
    import haskell_path_tracer_tpu as hpt
    from haskell_path_tracer_tpu.diff import grad as G
    from haskell_path_tracer_tpu.models.objects import Camera
    from haskell_path_tracer_tpu.ops.pallas_nee import scene_light_indices
    from haskell_path_tracer_tpu.ops.rng import gen_seeds
    from haskell_path_tracer_tpu.render.nee import _present_kinds

    scene = big_scene(1000)
    cam = Camera.create([0.0, 2.0, 0.0], [0.2, 0.0, 0.0], 90.0)
    params = G.scene_to_params(scene)
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    light_idx = scene_light_indices(scene) if backend == "pallas" else None
    kinds = _present_kinds(scene)
    lr = 1e-6

    def run_shape(w, h, spp, b, k, tag):
        rng = gen_seeds((h, w), seed=1)
        target = jnp.zeros((h, w, 3), jnp.float32)
        vg = jax.jit(
            jax.value_and_grad(
                lambda p: G.image_loss(
                    p, scene, cam, target, rng, num_bounces=b, spp=spp,
                    backend=backend, estimator="physical",
                    light_idx=light_idx, kinds=kinds,
                )
            )
        )

        @jax.jit
        def sgd_step(p):
            _, g = vg(p)
            return jax.tree_util.tree_map(lambda a, d: a - lr * d, p, g)

        dt1, dtk = _pipeline(sgd_step, params, k)
        extra = {"pipeline": k, "single_ms": round(dt1 * 1e3, 2),
                 "note": "fwd+bwd physical/NEE step; bsdf+shadow "
                         "segments counted once (bench.py rule)"}
        if k >= 8:
            # ADVICE r4 item 4: pipeline depth amortizes the tunnel
            # launch floor, so cross-round comparisons at different k
            # conflate methodology with kernel speed — report the
            # floor-free marginal rate from the k..2k chain slope
            # (config 1's discipline) alongside.
            dt2 = _pipeline(sgd_step, params, 2 * k, n=1)[1]
            slope = (dt2 - dtk) / k
            extra["device_rays_per_s"] = round(w * h * spp * b * 2 / slope)
            extra["note"] += ("; device_rays_per_s = floor-free marginal "
                              f"rate from the k={k}..{2 * k} chain slope")
        _report(
            7,
            f"invrender_phys_nee_grad_big1000_{w}x{h}x{spp}sppx{b}b_"
            f"{backend}{tag}",
            w * h * spp * b * 2 * k, dtk, extra,
        )

    # Latency row (the historical shape; dispatch-floor-bound — kept at
    # the round-4 pipeline depth for cross-round comparability).
    run_shape(512, 512, 1, 4, 8, "")
    # Saturated row (VERDICT r4 item 3 = the config-5 lesson): the
    # config-4 lane count with spp = 8 through the round-5 spp>1
    # fold-residual mode — ONE kernel pair per step, dispatch <10%.
    run_shape(1920, 1088, 8, 4, 2, "_saturated")


def config8():
    """Triangle-emitter NEE (round 5): the fused megakernel folds
    triangle geometry (Möller–Trumbore scalar-SMEM stream) and samples
    triangle area lights — the estimator's flagship feature previously
    forfeited the kernel (VERDICT r4 item 4).  Cornell-style: 8 spheres,
    2 ceiling light triangles, 2 blocker triangles, floor plane."""
    import haskell_path_tracer_tpu as hpt
    from haskell_path_tracer_tpu.models.objects import (
        Camera, Scene, make_materials, make_triangles,
    )
    from haskell_path_tracer_tpu.ops.pallas_nee import scene_light_indices
    from haskell_path_tracer_tpu.render.nee import _present_kinds

    w, h, spp, b = 512, 512, 16, 4
    base = cornell_scene()
    tr = make_triangles(
        [[-2.5, 7.5, -9.0], [2.5, 7.5, -5.0],
         [-1.5, 0.0, -6.0], [1.0, -1.0, -4.5]],
        [[2.5, 7.5, -9.0], [-2.5, 7.5, -5.0],
         [-0.5, 0.0, -6.5], [2.0, -1.0, -5.0]],
        [[0.0, 7.5, -5.0], [0.0, 7.5, -9.0],
         [-1.0, 1.5, -6.2], [1.5, 0.2, -4.7]],
        make_materials(
            [([1.0, 0.95, 0.8], 18.0, 0, 1.0),
             ([0.9, 0.9, 1.0], 12.0, 0, 1.0),
             ([0.5, 0.5, 0.8], 0.0, 0, 1.0),
             ([0.8, 0.6, 0.4], 0.0, 0, 1.0)]
        ),
    )
    scene = Scene(spheres=base.spheres, planes=base.planes, triangles=tr)
    cam = hpt.initial_camera()
    acc = hpt.make_accumulator(w, h, seed=0)
    kinds = _present_kinds(scene)
    light_idx = scene_light_indices(scene)
    step = jax.jit(
        lambda s, c, a: hpt.render_batch_physical(
            s, c, a, spp=spp, num_bounces=b, nee=True, kinds=kinds,
            light_idx=light_idx,
        )
    )
    k = 32
    dt1, dtk = _pipeline(lambda a: step(scene, cam, a), acc, k)
    _report(
        8, "tri_emitters_cornell8+4t_512x512x16sppx4b_physical",
        w * h * spp * b * 2 * k, dtk,
        {"pipeline": k, "single_ms": round(dt1 * 1e3, 1),
         "note": "triangle area lights through the NEE megakernel; "
                 "rays counts bsdf+shadow"},
    )


def main():
    which = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5, 6, 7, 8]
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    for n in which:
        try:
            globals()[f"config{n}"]()
        except Exception as e:  # one config's failure must not sink the run
            print(
                json.dumps(
                    {"config": n, "error": f"{type(e).__name__}: {e}"[:400]}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
