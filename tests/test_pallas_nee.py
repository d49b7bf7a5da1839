"""The fused physical/NEE megakernel (ops/pallas_nee.py) vs the XLA
estimator (render/nee.py:trace_physical) at matched RNG, in interpret
mode on the CPU mesh.

The kernel uses the exact (c - o) fold arithmetic (same f32 op order as
the XLA path), so every scene matches lane-for-lane with bit-equal RNG
states.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import haskell_path_tracer_tpu as hpt
from haskell_path_tracer_tpu.models.objects import (
    BRDF_DIELECTRIC,
    BRDF_GLOSSY,
    BRDF_MATTE,
    Camera,
    Scene,
    make_materials,
    make_planes,
    make_spheres,
    make_triangles,
)
from haskell_path_tracer_tpu.models.camera import primary_rays
from haskell_path_tracer_tpu.ops.pallas_nee import (
    scene_light_indices,
    trace_physical_nee_pallas,
)
from haskell_path_tracer_tpu.ops.rng import gen_seeds
from haskell_path_tracer_tpu.render.nee import trace_physical

H, W = 16, 64


def cornell8():
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


def big(n=120):
    rng = np.random.default_rng(7)
    pos = rng.uniform([-30, -2.5, -60], [30, 10, -8], (n, 3))
    radius = rng.uniform(0.2, 0.9, n)
    illum = np.where(rng.random(n) < 0.05, 50.0, 0.0)
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


def glassy():
    s = make_spheres(
        [[0.0, 0.0, -4.0], [1.8, 0.5, -6.0], [-2.0, 1.0, -5.0]],
        [1.3, 0.9, 0.7],
        make_materials(
            [([0.97, 0.98, 1.0], 0.0, BRDF_DIELECTRIC, 1.5),
             ([0.9, 0.95, 1.0], 0.0, BRDF_DIELECTRIC, 1.33),
             ([1.0, 0.9, 0.7], 8.0, BRDF_MATTE, 1.0)]
        ),
    )
    p = make_planes(
        [[0.0, -3.0, 0.0]],
        [[0.0, 1.0, 0.0]],
        make_materials([([0.5, 0.5, 0.6], 0.0, BRDF_MATTE, 1.2)]),
    )
    return Scene(spheres=s, planes=p)


def assert_lane_parity(rng_ref, rng_k, rad_ref, rad_k,
                       max_diverged=0.005):
    """Per-lane parity with the knife-edge allowance (PARITY.md round 5):
    kernel and estimator run the identical f32 formula sequence, but as
    two different compiled XLA graphs their dot products can differ by
    1 ulp (graph-context-dependent mul+add contraction), and two
    amplifiers turn that into macroscopic per-lane differences —
    (a) an accept/reject decision sitting within the noise of its
    boundary flips, diverging the lane's RNG stream and path; (b) a
    silhouette-grazing sphere hit (thc -> 0) amplifies the d2 = |l|^2 -
    tca^2 cancellation into ~1e-3 relative t/normal error with no
    decision flip (RNG equal, radiance off).  Both are allowed on at
    most `max_diverged` of lanes; everywhere else radiance must agree
    to 1e-3/1e-4."""
    rng_ref, rng_k = np.asarray(rng_ref), np.asarray(rng_k)
    rad_ref, rad_k = np.asarray(rad_ref), np.asarray(rad_k)
    rng_match = (rng_ref == rng_k).all(-1)
    frac_rng = 1.0 - rng_match.mean()
    assert frac_rng <= max_diverged, (
        f"RNG diverged on {frac_rng:.2%} of lanes"
    )
    bad = (
        np.abs(rad_k - rad_ref) > (1e-4 + 1e-3 * np.abs(rad_ref))
    ).any(-1)
    frac_bad = (bad & rng_match).mean()
    assert frac_bad <= max_diverged, (
        f"radiance off on {frac_bad:.2%} of RNG-matching lanes; "
        f"max abs diff {np.abs(rad_k - rad_ref).max()}"
    )


def run_pair(scene, cam, bounces, spp=1, seed=3, block_r=512):
    rng = gen_seeds((H, W), seed=seed)
    rays = primary_rays(cam, W, H)

    def xla_batch(rng0):
        rad_sum = jnp.zeros((H, W, 3), jnp.float32)
        r = rng0
        for _ in range(spp):
            rad, r = trace_physical(
                scene, rays, r, num_bounces=bounces, nee=True, fused=False
            )
            rad_sum = rad_sum + rad
        return rad_sum, r

    rad_ref, rng_ref = xla_batch(rng)
    rad_k, rng_k = trace_physical_nee_pallas(
        scene, rays, rng, num_bounces=bounces, spp=spp, interpret=True,
        block_r=block_r,
    )
    return map(np.asarray, (rad_ref, rng_ref, rad_k, rng_k))


def test_cornell_exact_match():
    rad_ref, rng_ref, rad_k, rng_k = run_pair(
        cornell8(), hpt.initial_camera(), bounces=3
    )
    np.testing.assert_array_equal(rng_ref, rng_k)
    np.testing.assert_allclose(rad_k, rad_ref, rtol=1e-4, atol=1e-4)


def test_cornell_multi_spp_accumulation():
    """spp samples in one kernel call == spp sequential XLA samples
    summed, with the RNG threading through."""
    rad_ref, rng_ref, rad_k, rng_k = run_pair(
        cornell8(), hpt.initial_camera(), bounces=3, spp=3
    )
    np.testing.assert_array_equal(rng_ref, rng_k)
    np.testing.assert_allclose(rad_k, rad_ref, rtol=1e-4, atol=1e-4)


def test_dielectric_scene_matches():
    rad_ref, rng_ref, rad_k, rng_k = run_pair(
        glassy(), Camera.create([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 90.0),
        bounces=4,
    )
    np.testing.assert_array_equal(rng_ref, rng_k)
    np.testing.assert_allclose(rad_k, rad_ref, rtol=1e-4, atol=1e-4)


def test_big_scene_matches():
    """120-sphere scene with emitters: lane-for-lane agreement with
    bit-equal RNG (the exact-form fold reproduces the XLA decisions);
    silhouette-grazing lanes get the knife-edge allowance (this scene
    has 2 of 1024 — see assert_lane_parity)."""
    cam = Camera.create([0.0, 2.0, 0.0], [0.2, 0.0, 0.0], 90.0)
    rad_ref, rng_ref, rad_k, rng_k = run_pair(big(), cam, bounces=3)
    assert np.abs(rad_ref).max() > 0  # emitters actually visible
    np.testing.assert_array_equal(rng_ref, rng_k)
    assert_lane_parity(rng_ref, rng_k, rad_ref, rad_k)


def zero_light():
    """No emissive sphere (L == 0): lit only by an emissive plane.
    scene_light_indices returns (), which still auto-routes to the
    kernel — the kernel must keep drawing the 3 light-sampling uniforms
    per bounce to stay RNG-bit-equal with the XLA path (ADVICE r3)."""
    s = make_spheres(
        [[0.0, 0.0, -5.0], [1.5, 0.8, -4.0]],
        [1.2, 0.6],
        make_materials(
            [([0.8, 0.4, 0.3], 0.0, BRDF_MATTE, 1.0),
             ([0.4, 0.8, 0.5], 0.0, BRDF_GLOSSY, 1.0)]
        ),
    )
    p = make_planes(
        [[0.0, -3.0, 0.0], [0.0, 9.0, 0.0]],
        [[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]],
        make_materials(
            [([0.7, 0.7, 0.7], 0.0, BRDF_MATTE, 1.0),
             ([1.0, 1.0, 0.9], 4.0, BRDF_MATTE, 1.0)]
        ),
    )
    return Scene(spheres=s, planes=p)


def test_zero_light_scene_rng_and_radiance_match():
    scene = zero_light()
    assert scene_light_indices(scene) == ()
    rad_ref, rng_ref, rad_k, rng_k = run_pair(
        scene, hpt.initial_camera(), bounces=3, spp=2
    )
    assert np.abs(rad_ref).max() > 0  # plane light reaches the film
    np.testing.assert_array_equal(rng_ref, rng_k)
    np.testing.assert_allclose(rad_k, rad_ref, rtol=1e-4, atol=1e-4)


def test_block_boundary_independence():
    """Results don't depend on the lane blocking (padding/grid specs)."""
    scene, cam = cornell8(), hpt.initial_camera()
    rng = gen_seeds((H, W), seed=1)
    rays = primary_rays(cam, W, H)
    out = [
        np.asarray(
            trace_physical_nee_pallas(
                scene, rays, rng, num_bounces=2, spp=1, interpret=True,
                block_r=br,
            )[0]
        )
        for br in (256, 512)
    ]
    np.testing.assert_array_equal(out[0], out[1])


def test_presort_bit_identical():
    """Alive-first presort (probe kernel + lane permutation) must be a
    pure layout change: per-pixel radiance AND rng bit-equal to the
    unsorted kernel, on a scene with plenty of sky-dead lanes."""
    cam = Camera.create([0.0, 2.0, 0.0], [0.2, 0.0, 0.0], 90.0)
    scene = big()
    rng = gen_seeds((H, W), seed=5)
    rays = primary_rays(cam, W, H)
    outs = [
        trace_physical_nee_pallas(
            scene, rays, rng, num_bounces=3, spp=2, interpret=True,
            presort=ps,
        )
        for ps in (False, True)
    ]
    # the scene must actually have both alive and sky-dead primaries
    from haskell_path_tracer_tpu.ops.intersect import nearest_hit

    hit = np.asarray(nearest_hit(rays.origin, rays.direction, scene).hit)
    assert 0.05 < hit.mean() < 0.95, hit.mean()
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(outs[1][0]))
    np.testing.assert_array_equal(np.asarray(outs[0][1]),
                                  np.asarray(outs[1][1]))


def tri_scene():
    """Spheres + plane + triangles with BOTH a sphere emitter and a
    triangle area light (the estimator's flagship feature) plus a matte
    blocker triangle that casts shadows."""
    s = make_spheres(
        [[0.0, -1.0, -6.0], [-2.5, 0.0, -7.0], [2.3, -0.5, -5.5]],
        [1.6, 1.2, 1.0],
        make_materials([
            ([0.8, 0.4, 0.3], 0.0, BRDF_MATTE, 1.0),
            ([0.9, 0.9, 0.9], 0.0, BRDF_GLOSSY, 1.0),
            ([0.3, 0.8, 0.5], 6.0, BRDF_MATTE, 1.0),
        ]),
    )
    p = make_planes(
        [[0.0, -3.0, 0.0]], [[0.0, 1.0, 0.0]],
        make_materials([([0.6, 0.6, 0.55], 0.0, BRDF_MATTE, 1.0)]),
    )
    tr = make_triangles(
        [[-2.0, 5.0, -7.5], [-1.0, 0.5, -4.0]],
        [[2.0, 5.0, -7.5], [1.0, 0.5, -4.0]],
        [[0.0, 5.0, -4.5], [0.0, 2.0, -5.0]],
        make_materials([
            ([1.0, 0.95, 0.8], 20.0, BRDF_MATTE, 1.0),
            ([0.4, 0.5, 0.9], 0.0, BRDF_MATTE, 1.0),
        ]),
    )
    return Scene(spheres=s, planes=p, triangles=tr)


def test_triangle_emitter_scene_matches():
    """Round-5 kernel extension: triangle geometry in the fold (MT
    stream) and triangle-area light sampling — lane-exact vs the XLA
    estimator with bit-equal RNG, including the mixed sphere+triangle
    light table (mask-space light_idx)."""
    scene = tri_scene()
    assert scene_light_indices(scene) == (2, 3)  # sphere 2, tri 0
    rad_ref, rng_ref, rad_k, rng_k = run_pair(
        scene, hpt.initial_camera(), bounces=3, spp=2
    )
    assert np.abs(rad_ref).max() > 0
    np.testing.assert_array_equal(rng_ref, rng_k)
    assert_lane_parity(rng_ref, rng_k, rad_ref, rad_k)


def test_triangle_scene_disciplines_bit_identical():
    """Regeneration and presort are pure execution-order/layout changes
    on triangle scenes too."""
    scene = tri_scene()
    rng = gen_seeds((H, W), seed=7)
    rays = primary_rays(hpt.initial_camera(), W, H)
    base = trace_physical_nee_pallas(
        scene, rays, rng, num_bounces=3, spp=2, interpret=True,
        regenerate=False, presort=False,
    )
    for kw in ({"regenerate": True}, {"presort": True},
               {"regenerate": True, "presort": True}):
        out = trace_physical_nee_pallas(
            scene, rays, rng, num_bounces=3, spp=2, interpret=True, **kw
        )
        np.testing.assert_array_equal(np.asarray(base[0]),
                                      np.asarray(out[0]), err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(base[1]),
                                      np.asarray(out[1]), err_msg=str(kw))


def test_light_indices_static_passing():
    """Traced scenes work when light_idx is supplied from outside jit
    (the suite/Renderer pattern)."""
    scene, cam = cornell8(), hpt.initial_camera()
    li = scene_light_indices(scene)
    rng = gen_seeds((H, W), seed=2)
    rays = primary_rays(cam, W, H)

    fn = jax.jit(
        lambda s, r: trace_physical_nee_pallas(
            s, rays, r, num_bounces=2, spp=1, light_idx=li,
            kinds=frozenset({BRDF_MATTE, BRDF_GLOSSY}), interpret=True,
        )
    )
    rad_j, _ = fn(scene, rng)
    rad_e, _ = trace_physical_nee_pallas(
        scene, rays, rng, num_bounces=2, spp=1, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(rad_j), np.asarray(rad_e))


# --- randomized differential fuzzing of the fused kernel -----------------

from hypothesis import example, given, settings, strategies as st


def _f32s(lo, hi):
    lo32 = float(np.nextafter(np.float32(lo), np.float32(np.inf)))
    hi32 = float(np.nextafter(np.float32(hi), np.float32(-np.inf)))
    return st.floats(lo32, hi32, allow_nan=False, allow_infinity=False,
                     width=32, allow_subnormal=False)


@st.composite
def _nee_scenes(draw):
    n_s = draw(st.integers(2, 6))
    n_p = draw(st.integers(0, 2))
    n_t = draw(st.integers(0, 3))
    mats = []
    pos, rad = [], []
    for i in range(n_s):
        pos.append([draw(_f32s(-6, 6)), draw(_f32s(-3, 4)),
                    draw(_f32s(-10, -2))])
        rad.append(draw(_f32s(0.3, 1.5)))
        mats.append((
            [draw(_f32s(0.1, 1.0)) for _ in range(3)],
            draw(st.sampled_from([0.0, 0.0, 5.0, 30.0])),
            draw(st.sampled_from([BRDF_MATTE, BRDF_GLOSSY,
                                  BRDF_DIELECTRIC])),
            draw(_f32s(0.5, 1.6)),
        ))
    # Guarantee at least one NEE-sampled light.
    mats[0] = (mats[0][0], 25.0, BRDF_MATTE, mats[0][3])
    s = make_spheres(pos, rad, make_materials(mats))
    if n_p:
        pp, pn, pm = [], [], []
        for _ in range(n_p):
            pp.append([draw(_f32s(-2, 2)), draw(_f32s(-5, -2)),
                       draw(_f32s(-2, 1))])
            n = np.asarray([draw(_f32s(-0.6, 0.6)), draw(_f32s(0.4, 1)),
                            draw(_f32s(-0.6, 0.6))], np.float32)
            pn.append((n / np.linalg.norm(n)).tolist())
            pm.append(([draw(_f32s(0.2, 1.0))] * 3, 0.0, BRDF_MATTE, 1.0))
        p = make_planes(pp, pn, make_materials(pm))
    else:
        from haskell_path_tracer_tpu.models.objects import empty_materials

        p = make_planes(np.zeros((0, 3)), np.zeros((0, 3)),
                        empty_materials())
    if n_t:
        v0, v1, v2, tm = [], [], [], []
        for i in range(n_t):
            base = [draw(_f32s(-5, 5)), draw(_f32s(-2, 5)),
                    draw(_f32s(-9, -3))]
            v0.append(base)
            v1.append([base[0] + draw(_f32s(0.5, 3)), base[1],
                       base[2] + draw(_f32s(-1, 1))])
            v2.append([base[0] + draw(_f32s(-1, 1)),
                       base[1] + draw(_f32s(0.5, 3)), base[2]])
            tm.append((
                [draw(_f32s(0.2, 1.0)) for _ in range(3)],
                draw(st.sampled_from([0.0, 0.0, 15.0])),
                BRDF_MATTE,
                1.0,
            ))
        from haskell_path_tracer_tpu.models.objects import Triangles

        tr = make_triangles(v0, v1, v2, make_materials(tm))
        return Scene(spheres=s, planes=p, triangles=tr)
    return Scene(spheres=s, planes=p)


def _r4_counterexample_scene():
    """The round-4 hypothesis counterexample (5 spheres / 2 planes,
    seed 0, 4 bounces): one lane's bounce-1 nearest-hit decision sat on
    a knife edge that XLA's graph-context-dependent rounding (see the
    fuzz test docstring) flipped between the two programs.  Pinned as a
    permanent regression example."""
    mats = make_materials([
        ([0.8123548, 0.7659862, 0.33333334], 25.0, BRDF_MATTE, 1.1171001),
        ([0.7261386, 0.7890828, 0.5448212], 0.0, BRDF_MATTE, 1.120997),
        ([0.972488, 0.26363948, 0.70192873], 0.0, BRDF_MATTE, 0.8164589),
        ([0.39199957, 0.90068907, 0.61891806], 0.0, BRDF_MATTE, 1.0289639),
        ([0.65517426, 0.39153147, 0.68147576], 0.0, BRDF_GLOSSY, 0.530379),
    ])
    s = make_spheres(
        [[2.375596, -0.75928634, -4.8884583],
         [-2.2762387, 2.9999998, -9.493987],
         [-5.5114784, -2.6922944, -3.0000002],
         [4.0910616, 1.0134443, -2.160739],
         [-4.071286, -0.23375143, -9.0]],
        [0.9038769, 1.2405735, 0.5, 0.33333334, 0.9405561],
        mats,
    )
    p = make_planes(
        [[0.8650283, -2.05, -0.5110181], [0.0, -3.7517815, 0.0]],
        [[-0.6158722, 0.7878461, 0.0],
         [-0.35262543, 0.7508179, -0.558505]],
        make_materials([([0.20000002] * 3, 0.0, BRDF_MATTE, 1.0),
                        ([0.9812335] * 3, 0.0, BRDF_MATTE, 1.0)]),
    )
    return Scene(spheres=s, planes=p)


@settings(max_examples=25, deadline=None, print_blob=True)
@given(scene=_nee_scenes(), seed=st.integers(0, 2**31 - 1),
       bounces=st.integers(1, 4))
@example(scene=_r4_counterexample_scene(), seed=0, bounces=4)
def test_fuzz_kernel_matches_xla_estimator(scene, seed, bounces):
    """Hypothesis-random NEE scenes (mixed matte/glossy/dielectric,
    random lights/planes/camera seeds): the fused kernel must match the
    XLA estimator lane-for-lane.

    Divergent-lane policy (round-5 root cause, PARITY.md): kernel and
    estimator run the IDENTICAL f32 formula sequence (one shade-frame
    convention, one clamp form — unified in round 5), but they are two
    different compiled XLA graphs, and XLA's mul+add contraction is
    graph-context-dependent: the same dot-product can differ by 1 ulp
    between the two programs.  The geometric form d2 = |l|^2 - tca^2
    catastrophically cancels for shade points ON a sphere (|l| ~ |tca|),
    amplifying that 1 ulp to ~30-70 ulps of the discriminant — so a lane
    whose accept/reject sits within that noise of the boundary can flip,
    diverging its whole path (RNG stream and radiance together).  The
    measured rate is ~1 lane per tens of scene/seed combos (a few per
    million lane-decisions); the policy allows <= 0.5% of lanes, and
    radiance must agree wherever the decision sequence (RNG) agrees —
    the same contract as test_parity_fuzz.assert_three_way."""
    cam = Camera.create([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 90.0)
    rng = gen_seeds((H, W), seed=seed)
    rays = primary_rays(cam, W, H)
    rad_ref, rng_ref = trace_physical(
        scene, rays, rng, num_bounces=bounces, nee=True, fused=False
    )
    rad_k, rng_k = trace_physical_nee_pallas(
        scene, rays, rng, num_bounces=bounces, spp=1, interpret=True
    )
    assert_lane_parity(rng_ref, rng_k, rad_ref, rad_k)


def box_tri_scene():
    """All four primitive kinds with three emitter classes: an NEE
    sphere light, an NEE triangle area light, and an EMISSIVE BOX
    (BSDF-only pickup — the estimator's `is_bsdf_only` rule)."""
    from haskell_path_tracer_tpu.models.objects import make_boxes

    s = make_spheres(
        [[0.0, -1.0, -6.0], [2.5, 0.8, -7.0]], [1.6, 0.9],
        make_materials([
            ([0.8, 0.4, 0.3], 0.0, BRDF_MATTE, 1.0),
            ([0.9, 0.8, 0.2], 12.0, BRDF_MATTE, 1.0),
        ]),
    )
    p = make_planes(
        [[0.0, -3.0, 0.0]], [[0.0, 1.0, 0.0]],
        make_materials([([0.6, 0.6, 0.55], 0.0, BRDF_MATTE, 1.0)]),
    )
    b = make_boxes(
        [[-3.0, -2.0, -7.5], [0.5, 2.0, -5.5]],
        [[-1.5, 0.5, -6.0], [1.5, 3.0, -4.8]],
        make_materials([
            ([0.5, 0.7, 0.9], 0.0, BRDF_GLOSSY, 1.0),
            ([1.0, 0.9, 0.7], 8.0, BRDF_MATTE, 1.0),
        ]),
    )
    tr = make_triangles(
        [[-1.0, 4.0, -7.0]], [[1.0, 4.0, -7.0]], [[0.0, 4.0, -5.0]],
        make_materials([([1.0, 1.0, 0.9], 15.0, BRDF_MATTE, 1.0)]),
    )
    return Scene(spheres=s, planes=p, boxes=b, triangles=tr)


def test_box_scene_matches():
    """Round-5 box extension: slab-fold geometry + BSDF-only box
    emitters in the fused NEE megakernel — lane-exact vs the XLA
    estimator with bit-equal RNG on a scene with ALL FOUR kinds."""
    scene = box_tri_scene()
    assert scene_light_indices(scene) == (1, 2)
    rad_ref, rng_ref, rad_k, rng_k = run_pair(
        scene, Camera.create([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 90.0),
        bounces=3, spp=2,
    )
    assert np.abs(rad_ref).max() > 0
    np.testing.assert_array_equal(rng_ref, rng_k)
    assert_lane_parity(rng_ref, rng_k, rad_ref, rad_k)
