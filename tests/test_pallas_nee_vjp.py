"""Differentiable fused NEE megakernel (ops/pallas_nee_vjp.py).

Validated in interpret mode on CPU, the tests/test_pallas_vjp.py
methodology:

  1. the custom-VJP forward is BIT-equal to the production fused NEE
     megakernel (same table-level pallas_call, presort + regeneration
     included — callers that never differentiate pay nothing);
  2. gradients match `jax.grad` of the XLA physical/NEE path
     (`trace_physical(..., nee=True, fused=False)`) at matched RNG for
     every continuous sphere/plane leaf AND the primary rays, on a mixed
     matte/glossy/dielectric scene — the backward's detached-fold design
     (winner + occlusion stored, distances re-derived from the gathered
     payload) must reproduce XLA autodiff's detach semantics exactly;
  3. a central finite difference on an emitter's illuminance (linear in
     the objective, so FD is exact to forward rounding);
  4. the zero-light scene (L == 0) keeps the RNG stream and produces
     finite, XLA-matching gradients (ADVICE r3 regression class).
"""

import jax
import jax.numpy as jnp
import numpy as np

from haskell_path_tracer_tpu.diff import grad as G
from haskell_path_tracer_tpu.models.camera import primary_rays
from haskell_path_tracer_tpu.models.objects import (
    BRDF_DIELECTRIC,
    BRDF_GLOSSY,
    BRDF_MATTE,
    Camera,
    Rays,
    Scene,
    make_materials,
    make_planes,
    make_spheres,
)
from haskell_path_tracer_tpu.ops.pallas_nee import (
    scene_light_indices,
    trace_physical_nee_pallas,
)
from haskell_path_tracer_tpu.ops.pallas_nee_vjp import (
    trace_physical_nee_pallas_diff,
)
from haskell_path_tracer_tpu.ops.rng import gen_seeds
from haskell_path_tracer_tpu.render.nee import trace_physical

H, W, B, SPP = 12, 16, 3, 2


def _mixed_scene():
    """Matte floor-lit scene with glossy and dielectric spheres and two
    emitters: every continuous leaf and every BRDF branch of the bounce
    core gets gradient signal."""
    mats = make_materials(
        [
            ([0.8, 0.4, 0.3], 0.0, BRDF_MATTE, 1.0),
            ([0.9, 0.9, 0.9], 0.0, BRDF_GLOSSY, 1.0),
            ([0.95, 0.95, 0.99], 0.0, BRDF_DIELECTRIC, 1.5),
            ([1.0, 0.9, 0.7], 25.0, BRDF_MATTE, 1.0),
            ([0.7, 0.8, 1.0], 12.0, BRDF_MATTE, 1.0),
        ]
    )
    spheres = make_spheres(
        [
            [0.0, -1.0, -6.0],
            [-2.5, 0.0, -7.0],
            [2.3, -0.5, -5.5],
            [0.0, 6.0, -6.0],
            [-4.0, 3.0, -4.0],
        ],
        [1.6, 1.2, 1.0, 1.4, 0.8],
        mats,
    )
    planes = make_planes(
        [[0.0, -3.0, 0.0], [0.0, 12.0, 0.0]],
        [[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]],
        make_materials(
            [
                ([0.6, 0.6, 0.55], 0.0, BRDF_MATTE, 1.0),
                ([0.5, 0.5, 0.5], 0.4, BRDF_MATTE, 1.0),
            ]
        ),
    )
    return Scene(spheres=spheres, planes=planes)


def _no_light_scene():
    """No emissive spheres: L == 0 exercises the light-draw-parity branch
    (plane emission only)."""
    mats = make_materials(
        [
            ([0.8, 0.4, 0.3], 0.0, BRDF_MATTE, 1.0),
            ([0.9, 0.9, 0.9], 0.0, BRDF_GLOSSY, 1.0),
        ]
    )
    spheres = make_spheres(
        [[0.0, -1.0, -6.0], [-2.5, 0.0, -7.0]], [1.6, 1.2], mats
    )
    planes = make_planes(
        [[0.0, -3.0, 0.0], [0.0, 12.0, 0.0]],
        [[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]],
        make_materials(
            [
                ([0.6, 0.6, 0.55], 0.0, BRDF_MATTE, 1.0),
                ([0.8, 0.8, 0.8], 3.0, BRDF_MATTE, 1.0),
            ]
        ),
    )
    return Scene(spheres=spheres, planes=planes)


def _setup(scene):
    cam = Camera.create([0.0, 0.5, 0.0], [-0.25, 0.0, 0.0], 90.0)
    rays = primary_rays(cam, W, H)
    rng = gen_seeds((H, W), seed=5)
    wmat = jnp.arange(H * W * 3.0).reshape(H, W, 3) / (H * W * 3)
    return cam, rays, rng, wmat


def _xla_loss(scene0, rays, rng, wmat):
    def loss(p):
        s = G.params_to_scene(p, scene0)

        def body(carry, _):
            rr, rad = carry
            radiance, rr = trace_physical(s, rays, rr, B, nee=True,
                                          fused=False)
            return (rr, rad + radiance), None

        (_, rad), _ = jax.lax.scan(
            body, (rng, jnp.zeros((H, W, 3))), None, length=SPP
        )
        return jnp.sum(rad * wmat)

    return loss


def _pallas_loss(scene0, rays, rng, wmat, light_idx):
    def loss(p):
        s = G.params_to_scene(p, scene0)
        rad, _ = trace_physical_nee_pallas_diff(
            s, rays, rng, num_bounces=B, spp=SPP, light_idx=light_idx,
            interpret=True,
        )
        return jnp.sum(rad * wmat)

    return loss


def _assert_grads_match(scene, min_nonzero=8):
    _, rays, rng, wmat = _setup(scene)
    light_idx = scene_light_indices(scene)
    params = G.scene_to_params(scene)
    lp_f = _pallas_loss(scene, rays, rng, wmat, light_idx)
    lx_f = _xla_loss(scene, rays, rng, wmat)
    lp, gp = jax.value_and_grad(lp_f)(params)
    lx, gx = jax.value_and_grad(lx_f)(params)
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
    nonzero = 0
    for field in G.SceneParams._fields:
        a = np.asarray(getattr(gx, field), np.float64)
        b = np.asarray(getattr(gp, field), np.float64)
        if a.size == 0:
            continue
        assert np.isfinite(b).all(), field
        # Scale-normalized: last-ulp forward differences on grazing lanes
        # amplify in f32 gradients (tests/test_pallas_vjp.py rationale).
        denom = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 5e-3, (
            field, np.abs(a - b).max(), denom
        )
        nonzero += int(np.abs(a).max() > 0)
    assert nonzero >= min_nonzero  # not vacuous


def test_nee_vjp_forward_bit_equals_production():
    scene = _mixed_scene()
    _, rays, rng, _ = _setup(scene)
    rad0, rng0 = trace_physical_nee_pallas(
        scene, rays, rng, num_bounces=B, spp=SPP, interpret=True
    )
    rad1, rng1 = trace_physical_nee_pallas_diff(
        scene, rays, rng, num_bounces=B, spp=SPP, interpret=True
    )
    assert jnp.array_equal(rad0, rad1)
    assert jnp.array_equal(rng0, rng1)


def test_nee_vjp_all_grads_match_xla():
    _assert_grads_match(_mixed_scene())


def test_nee_vjp_zero_light_scene_grads_match_xla():
    # 4 leaves carry signal here (XLA side agrees): with no sphere
    # emitters and inv_pdf = 0, light reaches the film only via plane
    # emission pickup.
    _assert_grads_match(_no_light_scene(), min_nonzero=4)


def test_nee_vjp_primary_ray_grads_match_xla():
    """Camera derivatives: cotangents reach the primary rays through the
    winner-t recompute and the hit-point chain."""
    scene = _mixed_scene()
    _, rays, rng, wmat = _setup(scene)
    light_idx = scene_light_indices(scene)

    def lp(o, d):
        rad, _ = trace_physical_nee_pallas_diff(
            scene, Rays(origin=o, direction=d), rng, num_bounces=B,
            spp=SPP, light_idx=light_idx, interpret=True,
        )
        return jnp.sum(rad * wmat)

    def lx(o, d):
        def body(carry, _):
            rr, rad = carry
            radiance, rr = trace_physical(
                scene, Rays(origin=o, direction=d), rr, B, nee=True,
                fused=False,
            )
            return (rr, rad + radiance), None

        (_, rad), _ = jax.lax.scan(
            body, (rng, jnp.zeros((H, W, 3))), None, length=SPP
        )
        return jnp.sum(rad * wmat)

    gp_o, gp_d = jax.grad(lp, argnums=(0, 1))(rays.origin, rays.direction)
    gx_o, gx_d = jax.grad(lx, argnums=(0, 1))(rays.origin, rays.direction)
    for a, b in ((gx_o, gp_o), (gx_d, gp_d)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        assert np.isfinite(b).all()
        denom = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 5e-3
        assert np.abs(a).max() > 0


def test_nee_vjp_emission_fd():
    """Central difference on an emitter's illuminance — the objective is
    linear in it, so FD is exact to f32 forward rounding."""
    scene = _mixed_scene()
    _, rays, rng, wmat = _setup(scene)
    light_idx = scene_light_indices(scene)
    params = G.scene_to_params(scene)
    loss = _pallas_loss(scene, rays, rng, wmat, light_idx)
    light = int(np.argmax(np.asarray(params.sphere_illum)))
    ad = float(jax.grad(loss)(params).sphere_illum[light])
    eps = 0.5
    arr = np.asarray(params.sphere_illum)
    hi = arr.copy()
    lo = arr.copy()
    hi[light] += eps
    lo[light] -= eps
    fd = (
        float(loss(params._replace(sphere_illum=jnp.asarray(hi))))
        - float(loss(params._replace(sphere_illum=jnp.asarray(lo))))
    ) / (2 * eps)
    assert ad != 0.0
    np.testing.assert_allclose(ad, fd, rtol=2e-2)


def test_grad_api_routes_to_nee_megakernel():
    """diff/grad.py's estimator="physical", backend="pallas" route with a
    static light_idx lands on the fused NEE VJP and matches the XLA
    estimator's loss/gradients."""
    scene = _mixed_scene()
    cam, _, rng, _ = _setup(scene)
    light_idx = scene_light_indices(scene)
    params = G.scene_to_params(scene)
    target = jnp.zeros((H, W, 3), jnp.float32) + 0.2

    out = {}
    for backend, li in (("xla", None), ("pallas", light_idx)):
        loss = lambda p, b=backend, i=li: G.image_loss(
            p, scene, cam, target, rng, num_bounces=B,
            estimator="physical", backend=b, interpret=True, light_idx=i,
        )
        out[backend] = jax.value_and_grad(loss)(params)

    np.testing.assert_allclose(
        float(out["xla"][0]), float(out["pallas"][0]), rtol=1e-5
    )
    for field in G.SceneParams._fields:
        a = np.asarray(getattr(out["xla"][1], field), np.float64)
        b = np.asarray(getattr(out["pallas"][1], field), np.float64)
        if a.size == 0:
            continue
        denom = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 5e-3, field


def test_camera_gradient_through_nee_vjp_matches_xla():
    """Camera optimization: d loss / d camera position flows through
    `primary_rays` into the kernel's primary-ray cotangents and matches
    the XLA estimator's camera gradient."""
    scene = _mixed_scene()
    cam, _, rng, wmat = _setup(scene)
    light_idx = scene_light_indices(scene)

    def lp(pos):
        c = Camera(position=pos, rotation=cam.rotation, fov=cam.fov)
        rays = primary_rays(c, W, H)
        rad, _ = trace_physical_nee_pallas_diff(
            scene, rays, rng, num_bounces=B, spp=1,
            light_idx=light_idx, interpret=True,
        )
        return jnp.sum(rad * wmat)

    def lx(pos):
        c = Camera(position=pos, rotation=cam.rotation, fov=cam.fov)
        rays = primary_rays(c, W, H)
        rad, _ = trace_physical(scene, rays, rng, B, nee=True, fused=False)
        return jnp.sum(rad * wmat)

    gp = np.asarray(jax.grad(lp)(cam.position), np.float64)
    gx = np.asarray(jax.grad(lx)(cam.position), np.float64)
    assert np.isfinite(gp).all() and np.abs(gx).max() > 0
    assert np.abs(gp - gx).max() / np.abs(gx).max() < 5e-3


def test_nee_vjp_grad_mode_forward_bit_equals_production():
    """ADVICE r4 item 2: the residual-recording forward that actually
    runs under jax.grad (fold_residuals mode) must be bit-equal to the
    production kernel — at spp = 1 AND at spp > 1 (round 5 extended the
    residual mode past single samples)."""
    scene = _mixed_scene()
    _, rays, rng, _ = _setup(scene)
    for spp in (1, 2):
        rad0, rng0 = trace_physical_nee_pallas(
            scene, rays, rng, num_bounces=B, spp=spp, interpret=True
        )

        def f(o, spp=spp):
            return trace_physical_nee_pallas_diff(
                scene, Rays(origin=o, direction=rays.direction), rng,
                num_bounces=B, spp=spp, interpret=True,
            )

        (rad1, rng1), _ = jax.vjp(f, rays.origin)
        assert jnp.array_equal(rad0, rad1), spp
        assert jnp.array_equal(rng0, rng1), spp


def test_nee_vjp_fold_replay_fallback_grads_match_xla(monkeypatch):
    """Above the residual-plane HBM cap the backward replays folds in
    VMEM (the round-4 path).  Force the fallback (cap = 0) and require
    the same XLA gradient agreement as the residual mode."""
    from haskell_path_tracer_tpu.ops import pallas_nee_vjp as V

    monkeypatch.setattr(V, "MAX_RESIDUAL_PLANES", 0)
    V._make_nee_diff_fn.cache_clear()
    try:
        _assert_grads_match(_mixed_scene())
    finally:
        V._make_nee_diff_fn.cache_clear()


def test_nee_vjp_triangle_scene_all_grads_match_xla():
    """Round-5 triangle extension of the VJP: forward bit-equal to the
    production kernel on a triangle-emitter scene, and every continuous
    leaf — INCLUDING tri vertices (via the [16, T] winner-vertex gather
    and the area-light sampling term) — matches XLA autodiff."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_pallas_nee import tri_scene

    scene = tri_scene()
    _, rays, rng, _ = _setup(scene)
    rad0, rng0 = trace_physical_nee_pallas(
        scene, rays, rng, num_bounces=B, spp=SPP, interpret=True
    )
    rad1, rng1 = trace_physical_nee_pallas_diff(
        scene, rays, rng, num_bounces=B, spp=SPP, interpret=True
    )
    assert jnp.array_equal(rad0, rad1)
    assert jnp.array_equal(rng0, rng1)
    _assert_grads_match(scene, min_nonzero=12)


def test_nee_vjp_sorted_gradient_frame_bit_identical():
    """The round-5 sorted gradient frame (external depth-sort of lanes
    into the kernels' block-contiguous layout, residuals sorted
    end-to-end) is a pure layout change: forward radiance/rng and the
    loss are BIT-identical to the unsorted call; gradients agree to
    summation-order ulps (re-blocking changes the backward's partial-sum
    accumulation order only)."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_pallas_nee import big

    scene = big()  # 120 spheres: plenty of sky-dead lanes to sort
    cam = Camera.create([0.0, 2.0, 0.0], [0.2, 0.0, 0.0], 90.0)
    rays = primary_rays(cam, W, H)
    rng = gen_seeds((H, W), seed=5)
    wmat = jnp.arange(H * W * 3.0).reshape(H, W, 3) / (H * W * 3)
    li = scene_light_indices(scene)
    params = G.scene_to_params(scene)

    outs = [
        trace_physical_nee_pallas_diff(
            scene, rays, rng, num_bounces=B, spp=SPP, interpret=True,
            sorted_lanes=sl,
        )
        for sl in (False, True)
    ]
    assert jnp.array_equal(outs[0][0], outs[1][0])
    assert jnp.array_equal(outs[0][1], outs[1][1])

    def loss(p, sl):
        s = G.params_to_scene(p, scene)
        rad, _ = trace_physical_nee_pallas_diff(
            s, rays, rng, num_bounces=B, spp=SPP, light_idx=li,
            interpret=True, sorted_lanes=sl,
        )
        return jnp.sum(rad * wmat)

    v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    assert float(v0) == float(v1)
    for field in G.SceneParams._fields:
        a = np.asarray(getattr(g0, field), np.float64)
        b = np.asarray(getattr(g1, field), np.float64)
        if a.size == 0:
            continue
        denom = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 1e-4, (
            field, np.abs(a - b).max()
        )
