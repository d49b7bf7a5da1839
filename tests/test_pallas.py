"""Pallas megakernel vs XLA inline integrator (interpret mode on CPU).

On TPU the kernel is validated statistically (transcendental ulps can flip
rare discrete decisions); in interpret mode the same jnp ops run through
the XLA CPU backend, so agreement is near-exact.
"""

import numpy as np

from haskell_path_tracer_tpu.models import world
from haskell_path_tracer_tpu.render.integrator import (
    make_accumulator,
    render_batch_inline,
    render_batch_pallas,
)

W, H = 128, 16


def _compare(spp, bounces, rr=False, min_close=0.995):
    scene, cam = world.main_scene(), world.initial_camera()
    ref = render_batch_inline(
        scene, cam, make_accumulator(W, H, seed=2), spp,
        num_bounces=bounces, russian_roulette=rr,
    )
    out = render_batch_pallas(
        scene, cam, make_accumulator(W, H, seed=2), spp,
        num_bounces=bounces, russian_roulette=rr,
        interpret=True,
    )
    assert int(out.iterations) == int(ref.iterations) == spp
    rng_match = (np.asarray(ref.rng) == np.asarray(out.rng)).all(axis=-1).mean()
    assert rng_match > 0.995, rng_match
    close = np.isclose(
        np.asarray(ref.color), np.asarray(out.color), rtol=1e-4, atol=1e-4
    ).mean()
    assert close > min_close, close


def test_pallas_matches_xla_single_sample():
    _compare(spp=1, bounces=4)


def test_pallas_matches_xla_multi_sample_deep():
    # Deep bounces amplify ulp-flipped discrete decisions (one flipped
    # bounce diverges that lane's color for all remaining sample-bounces),
    # so lane agreement sits lower than the shallow cases: ~0.993 on this
    # CPU backend at spp=3 x 8 bounces.
    _compare(spp=3, bounces=8, min_close=0.99)


def test_pallas_matches_xla_russian_roulette():
    _compare(spp=2, bounces=6, rr=True)


def test_pallas_tile_shapes():
    scene, cam = world.main_scene(), world.initial_camera()
    out = render_batch_pallas(
        scene, cam, make_accumulator(128, 24, seed=1), 1,
        num_bounces=3, tile_rows=8, interpret=True,
    )
    assert out.color.shape == (24, 128, 3)


def test_dielectric_elision_is_bit_exact():
    """has_dielectric=False must be bit-identical on glass-free scenes
    (the glass block draws no RNG, so eliding it changes nothing)."""
    scene, cam = world.main_scene(), world.initial_camera()
    a = render_batch_pallas(
        scene, cam, make_accumulator(W, H, seed=5), 2,
        num_bounces=6, interpret=True, has_dielectric=True,
    )
    b = render_batch_pallas(
        scene, cam, make_accumulator(W, H, seed=5), 2,
        num_bounces=6, interpret=True, has_dielectric=False,
    )
    np.testing.assert_array_equal(np.asarray(a.color), np.asarray(b.color))
    np.testing.assert_array_equal(np.asarray(a.rng), np.asarray(b.rng))


def test_rolled_sample_loop_is_bit_exact(monkeypatch):
    """Above SAMPLE_UNROLL_MAX spp the kernel's sample loop rolls into a
    fori_loop (unrolled Mosaic compile time blows up superlinearly: 16 spp
    ≈ 8 s, 32 spp > 9 min on v5e).  The RNG draw sequence is identical
    either way, so rolled must be bit-identical to unrolled."""
    from haskell_path_tracer_tpu.ops import pallas_megakernel as pmk

    scene, cam = world.main_scene(), world.initial_camera()
    spp = pmk.SAMPLE_UNROLL_MAX + 4
    rolled = render_batch_pallas(
        scene, cam, make_accumulator(W, H, seed=7), spp,
        num_bounces=3, interpret=True,
    )
    monkeypatch.setattr(pmk, "SAMPLE_UNROLL_MAX", spp)
    unrolled = render_batch_pallas(
        scene, cam, make_accumulator(W, H, seed=7), spp,
        num_bounces=3, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(rolled.color), np.asarray(unrolled.color)
    )
    np.testing.assert_array_equal(
        np.asarray(rolled.rng), np.asarray(unrolled.rng)
    )


def test_auto_detect_dielectric_flag():
    """trace_inline_pallas auto-detects glass-free scenes outside jit and
    the Renderer derives the static flag host-side."""
    from haskell_path_tracer_tpu.render.renderer import Renderer

    assert Renderer._scene_has_dielectric(world.main_scene()) is False


def _mixed_scene():
    """All four primitive kinds, incl. an emissive triangle and a glossy
    box — exercises the 16-column geometry table and the static kind
    dispatch in the kernel's unrolled fold."""
    from haskell_path_tracer_tpu.models.objects import (
        BRDF_GLOSSY,
        BRDF_MATTE,
        Scene,
        make_boxes,
        make_materials,
        make_planes,
        make_spheres,
        make_triangles,
    )

    spheres = make_spheres(
        [[0.0, 0.5, -9.0], [3.0, 4.0, -8.0]],
        [1.0, 0.8],
        make_materials(
            [
                ([0.9, 0.3, 0.3], 0.0, BRDF_MATTE, 1.2),
                ([1.0, 1.0, 0.9], 80.0, BRDF_MATTE, 1.0),
            ]
        ),
    )
    planes = make_planes(
        [[0.0, -3.0, 0.0]],
        [[0.0, 1.0, 0.0]],
        make_materials([([0.4, 0.7, 0.4], 0.0, BRDF_MATTE, 1.5)]),
    )
    boxes = make_boxes(
        [[-3.5, -3.0, -8.0]],
        [[-1.5, -0.5, -6.0]],
        make_materials([([0.3, 0.3, 0.9], 0.0, BRDF_GLOSSY, 0.9)]),
    )
    tris = make_triangles(
        [[1.0, -3.0, -6.0]],
        [[4.0, -3.0, -6.5]],
        [[2.5, 0.5, -7.0]],
        make_materials([([0.9, 0.8, 0.2], 5.0, BRDF_MATTE, 1.0)]),
    )
    return Scene(spheres=spheres, planes=planes, boxes=boxes, triangles=tris)


def test_pallas_matches_xla_mixed_kinds():
    """Boxes/triangles fold inside the megakernel (VERDICT r1 item #5):
    same scene through the XLA inline path and the Pallas kernel."""
    from haskell_path_tracer_tpu.models.objects import Camera

    scene = _mixed_scene()
    cam = Camera.create([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 90.0)
    ref = render_batch_inline(
        scene, cam, make_accumulator(W, H, seed=11), 2, num_bounces=5
    )
    out = render_batch_pallas(
        scene, cam, make_accumulator(W, H, seed=11), 2, num_bounces=5,
        interpret=True,
    )
    rng_match = (
        (np.asarray(ref.rng) == np.asarray(out.rng)).all(axis=-1).mean()
    )
    assert rng_match > 0.995, rng_match
    close = np.isclose(
        np.asarray(ref.color), np.asarray(out.color), rtol=1e-4, atol=1e-4
    ).mean()
    assert close > 0.99, close


def test_pallas_mixed_kinds_hits_every_kind():
    """The mixed scene's kinds are all actually visible from the camera
    (guards the fixture against silently testing nothing)."""
    import jax.numpy as jnp

    from haskell_path_tracer_tpu.models.camera import primary_rays
    from haskell_path_tracer_tpu.models.objects import Camera
    from haskell_path_tracer_tpu.ops.intersect import nearest_hit

    scene = _mixed_scene()
    cam = Camera.create([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 90.0)
    rays = primary_rays(cam, W, H)
    h = nearest_hit(rays.origin, rays.direction, scene)
    prims = np.unique(np.asarray(h.prim)[np.asarray(h.hit)])
    # spheres are prims 0-1, plane 2, box 3, triangle 4
    assert {0, 2, 3, 4}.issubset(set(prims.tolist())), prims
