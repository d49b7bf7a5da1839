"""Pallas deterministic-splitting kernel vs the XLA DFS traversal
(interpret mode on CPU — same methodology as tests/test_pallas.py)."""

import numpy as np
import jax

from haskell_path_tracer_tpu.models.objects import (
    BRDF_DIELECTRIC,
    BRDF_MATTE,
    Camera,
    Scene,
    make_materials,
    make_planes,
    make_spheres,
)
from haskell_path_tracer_tpu.models.camera import primary_rays
from haskell_path_tracer_tpu.ops.pallas_split import trace_split_pallas
from haskell_path_tracer_tpu.ops.rng import gen_seeds
from haskell_path_tracer_tpu.render.integrator import make_accumulator
from haskell_path_tracer_tpu.render.wavefront import (
    render_batch_wavefront_split,
)

W, H = 128, 8


def glass_scene():
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


def _compare(scene, spp, bounces, stack_depth=2, min_close=0.99,
             early_exit=True):
    cam = Camera.create([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 90.0)
    acc = make_accumulator(W, H, seed=6)
    ref = render_batch_wavefront_split(
        scene, cam, acc, spp, num_bounces=bounces,
        queue_factor=float(stack_depth),
    )
    rays = primary_rays(cam, W, H)
    rad, rng_out = trace_split_pallas(
        scene, rays, acc.rng, num_bounces=bounces, spp=spp,
        stack_depth=stack_depth, interpret=True, early_exit=early_exit,
    )
    ref_rad = np.asarray(ref.color)
    rng_match = (
        (np.asarray(ref.rng) == np.asarray(rng_out)).all(axis=-1).mean()
    )
    assert rng_match > 0.99, rng_match
    close = np.isclose(
        np.asarray(rad), ref_rad, rtol=1e-4, atol=1e-4
    ).mean()
    assert close > min_close, close


def test_split_kernel_matches_xla_glass():
    _compare(glass_scene(), spp=2, bounces=6)


def test_split_kernel_matches_xla_no_early_exit():
    _compare(glass_scene(), spp=1, bounces=5, early_exit=False)


def test_split_kernel_matches_xla_deep_stack():
    _compare(glass_scene(), spp=1, bounces=8, stack_depth=4)


def test_split_kernel_splitfree_scene():
    # On a split-free scene the DFS degenerates to the plain bounce loop.
    s = make_spheres(
        [[0.0, 1.0, -5.0], [-1.0, -0.5, -4.0]],
        [0.8, 0.9],
        make_materials(
            [([1.0, 0.9, 0.8], 5.0, BRDF_MATTE, 1.0),
             ([0.7, 0.4, 0.4], 0.0, BRDF_MATTE, 1.2)]
        ),
    )
    p = make_planes(
        [[0.0, -3.0, 0.0]],
        [[0.0, 1.0, 0.0]],
        make_materials([([0.5, 0.5, 0.6], 0.0, BRDF_MATTE, 1.5)]),
    )
    _compare(Scene(spheres=s, planes=p), spp=2, bounces=5)


def test_split_kernel_rolled_sample_loop(monkeypatch):
    from haskell_path_tracer_tpu.ops import pallas_megakernel as pmk

    scene = glass_scene()
    cam = Camera.create([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 90.0)
    rays = primary_rays(cam, W, H)
    rng = gen_seeds((H, W), seed=9)
    spp = pmk.SAMPLE_UNROLL_MAX + 4
    rolled = trace_split_pallas(
        scene, rays, rng, num_bounces=4, spp=spp, interpret=True
    )
    monkeypatch.setattr(pmk, "SAMPLE_UNROLL_MAX", spp)
    unrolled = trace_split_pallas(
        scene, rays, rng, num_bounces=4, spp=spp, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(rolled[0]), np.asarray(unrolled[0])
    )
    np.testing.assert_array_equal(
        np.asarray(rolled[1]), np.asarray(unrolled[1])
    )
