"""Randomized three-way differential parity fuzzing (VERDICT r2 item 6).

The golden Haskell binary is unbuildable in this image (README.md),
so behavioral parity rests on three independently-written
implementations agreeing at matched RNG: the JAX integrator
(render/integrator.py), the vectorized numpy oracle
(parity/oracle_np.py) and the scalar C++ oracle
(runtime/native/ptru_native.cpp).  Fixed-scene tests
(test_parity.py / test_native.py) pin a handful of configurations;
this module drives hypothesis-random scenes, cameras, seeds and bounce
counts through all three per-lane — turning the residual
"shared misreading of the reference" risk into a surface the fuzzer
can hit (any formula one implementation got differently from the
others shows up as a lane mismatch on some draw).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from haskell_path_tracer_tpu.models.objects import (
    BRDF_GLOSSY,
    BRDF_MATTE,
    Camera,
    Scene,
    make_materials,
    make_planes,
    make_spheres,
)
from haskell_path_tracer_tpu.parity import oracle_np
from haskell_path_tracer_tpu.render.integrator import (
    make_accumulator,
    render_sample_inline,
)
from haskell_path_tracer_tpu.runtime import native

W, H = 24, 8  # small grid: each case still checks 192 independent lanes


def f32s(lo, hi):
    lo32 = float(np.nextafter(np.float32(lo), np.float32(np.inf)))
    hi32 = float(np.nextafter(np.float32(hi), np.float32(-np.inf)))
    return st.floats(
        lo32, hi32, allow_nan=False, allow_infinity=False, width=32,
        allow_subnormal=False,
    )


@st.composite
def scenes(draw):
    n_s = draw(st.integers(1, 4))
    n_p = draw(st.integers(0, 2))
    sp_pos = [
        [draw(f32s(-6, 6)), draw(f32s(-4, 4)), draw(f32s(-9, -1))]
        for _ in range(n_s)
    ]
    sp_rad = [draw(f32s(0.3, 2.0)) for _ in range(n_s)]

    def mat(draw):
        return (
            [draw(f32s(0.05, 1.0)) for _ in range(3)],
            draw(st.sampled_from([0.0, 0.0, 1.0, 6.0, 40.0])),
            draw(st.sampled_from([BRDF_MATTE, BRDF_GLOSSY])),
            draw(f32s(0.3, 1.5)),
        )

    s = make_spheres(sp_pos, sp_rad, make_materials([mat(draw) for _ in range(n_s)]))
    if n_p:
        pl_pos, pl_n = [], []
        for _ in range(n_p):
            pl_pos.append(
                [draw(f32s(-2, 2)), draw(f32s(-5, -2)), draw(f32s(-3, 1))]
            )
            n = np.asarray(
                [draw(f32s(-1, 1)), draw(f32s(0.2, 1)), draw(f32s(-1, 1))],
                np.float32,
            )
            pl_n.append((n / np.linalg.norm(n)).tolist())
        p = make_planes(
            pl_pos, pl_n, make_materials([mat(draw) for _ in range(n_p)])
        )
    else:
        from haskell_path_tracer_tpu.models.objects import empty_materials

        p = make_planes(
            np.zeros((0, 3)), np.zeros((0, 3)), empty_materials()
        )
    return Scene(spheres=s, planes=p)


@st.composite
def cameras(draw):
    return Camera.create(
        [draw(f32s(-2, 2)), draw(f32s(-2, 2)), draw(f32s(-1, 3))],
        [draw(f32s(-0.6, 0.6)), draw(f32s(-0.6, 0.6)), draw(f32s(-0.3, 0.3))],
        draw(f32s(60.0, 110.0)),
    )


CASE = dict(max_examples=60, deadline=None, print_blob=True)


def assert_three_way(rng_a, rng_b, col_a, col_b):
    """Per-lane agreement with an allowance for numerically chaotic
    lanes: a ray hitting a plane at near-parallel incidence
    (|d.n| ~ 1e-3, dist ~ 1e3+) amplifies 1-ulp arithmetic differences
    between independently-written implementations into macroscopically
    different paths — the fuzzer found such a lane (two oracles, both
    IEEE-correct, 0.5% of lanes diverging at t ~ 2387).  Parity is
    asserted lane-for-lane on >= 99% of lanes, and radiance must agree
    wherever the RNG (i.e. the decision sequence) agrees."""
    rng_match = (rng_a == rng_b).all(axis=-1)
    frac = rng_match.mean()
    assert frac >= 0.99, f"RNG diverged on {(1 - frac) * 100:.2f}% of lanes"
    np.testing.assert_allclose(
        col_a[rng_match], col_b[rng_match], rtol=2e-3, atol=2e-3
    )


@settings(**CASE)
@given(
    scene=scenes(),
    camera=cameras(),
    seed=st.integers(0, 2**31 - 1),
    bounces=st.integers(1, 5),
)
def test_jax_matches_numpy_oracle(scene, camera, seed, bounces):
    acc = make_accumulator(W, H, seed=seed)
    rng0 = np.asarray(acc.rng)
    jacc = render_sample_inline(scene, camera, acc, num_bounces=bounces)

    ncolor, nrng = oracle_np.render_sample_np(
        scene, camera, np.zeros((H, W, 3), np.float32), rng0.copy(),
        num_bounces=bounces,
    )
    assert_three_way(
        np.asarray(jacc.rng), nrng, np.asarray(jacc.color), ncolor
    )


@pytest.mark.skipif(
    not native.available(),
    reason=f"native runtime unavailable: {native.load_error()}",
)
@settings(**CASE)
@given(
    scene=scenes(),
    camera=cameras(),
    seed=st.integers(0, 2**31 - 1),
    bounces=st.integers(1, 5),
)
def test_cpp_oracle_matches_numpy_oracle(scene, camera, seed, bounces):
    acc = make_accumulator(W, H, seed=seed)
    rng0 = np.asarray(acc.rng)
    c_cpp, r_cpp = native.render_inline(
        scene, camera, np.zeros((H, W, 3), np.float32), rng0.copy(),
        num_bounces=bounces, spp=1,
    )
    c_np, r_np = oracle_np.render_sample_np(
        scene, camera, np.zeros((H, W, 3), np.float32), rng0.copy(),
        num_bounces=bounces,
    )
    assert_three_way(r_cpp, r_np, c_cpp, c_np)


# --- physical/NEE estimator fuzz (VERDICT r3 item 6) ----------------------

from haskell_path_tracer_tpu.models.camera import primary_rays
from haskell_path_tracer_tpu.models.objects import (
    BRDF_DIELECTRIC,
    Triangles,
    empty_materials,
    make_triangles,
)
from haskell_path_tracer_tpu.ops.rng import gen_seeds
from haskell_path_tracer_tpu.parity import oracle_nee_np
from haskell_path_tracer_tpu.render.nee import trace_physical


@st.composite
def nee_scenes(draw):
    """Sphere/plane/triangle scenes with at least one NEE-sampled light
    (guaranteed emissive sphere; optionally an emissive triangle — the
    Cornell-ceiling case)."""
    n_s = draw(st.integers(2, 5))
    n_p = draw(st.integers(0, 2))
    with_tri = draw(st.booleans())

    def mat(draw, emissive_pool=(0.0, 0.0, 5.0, 30.0)):
        return (
            [draw(f32s(0.1, 1.0)) for _ in range(3)],
            draw(st.sampled_from(emissive_pool)),
            draw(st.sampled_from([BRDF_MATTE, BRDF_GLOSSY,
                                  BRDF_DIELECTRIC])),
            draw(f32s(0.5, 1.6)),
        )

    sp_pos = [
        [draw(f32s(-6, 6)), draw(f32s(-3, 4)), draw(f32s(-10, -2))]
        for _ in range(n_s)
    ]
    sp_rad = [draw(f32s(0.3, 1.5)) for _ in range(n_s)]
    mats = [mat(draw) for _ in range(n_s)]
    mats[0] = (mats[0][0], 25.0, BRDF_MATTE, mats[0][3])  # guaranteed light
    s = make_spheres(sp_pos, sp_rad, make_materials(mats))

    if n_p:
        pl_pos, pl_n = [], []
        for _ in range(n_p):
            pl_pos.append(
                [draw(f32s(-2, 2)), draw(f32s(-5, -2)), draw(f32s(-2, 1))]
            )
            n = np.asarray(
                [draw(f32s(-0.6, 0.6)), draw(f32s(0.4, 1)),
                 draw(f32s(-0.6, 0.6))],
                np.float32,
            )
            pl_n.append((n / np.linalg.norm(n)).tolist())
        p = make_planes(
            pl_pos, pl_n,
            make_materials(
                [([draw(f32s(0.2, 1.0))] * 3, 0.0, BRDF_MATTE, 1.0)
                 for _ in range(n_p)]
            ),
        )
    else:
        p = make_planes(np.zeros((0, 3)), np.zeros((0, 3)),
                        empty_materials())

    if with_tri:
        # An emissive ceiling-ish triangle facing downward.
        cx = draw(f32s(-2, 2))
        cz = draw(f32s(-8, -3))
        y = draw(f32s(3, 6))
        sz = draw(f32s(0.8, 2.5))
        t = make_triangles(
            [[cx - sz, y, cz - sz]],
            [[cx + sz, y, cz + sz]],
            [[cx + sz, y, cz - sz]],
            make_materials(
                [([1.0, 0.95, 0.9], draw(st.sampled_from([4.0, 15.0])),
                  BRDF_MATTE, 1.0)]
            ),
        )
        return Scene(spheres=s, planes=p, triangles=t)
    return Scene(spheres=s, planes=p)


@settings(max_examples=40, deadline=None, print_blob=True)
@given(
    scene=nee_scenes(),
    camera=cameras(),
    seed=st.integers(0, 2**31 - 1),
    bounces=st.integers(1, 4),
)
def test_physical_nee_jax_matches_numpy_oracle(scene, camera, seed, bounces):
    """The physical/NEE estimator (corrected BRDFs, cone + triangle-area
    light sampling) agrees per-lane with the independent numpy oracle at
    matched RNG — extending the differential surface to the estimator
    users are told to prefer (VERDICT r3 item 6)."""
    rng0 = np.asarray(gen_seeds((H, W), seed=seed))
    o_np, d_np = oracle_np.primary_rays_np(camera, W, H)
    rays = primary_rays(camera, W, H)

    rad_j, rng_j = trace_physical(
        scene, rays, jnp.asarray(rng0), num_bounces=bounces, nee=True,
        fused=False,
    )
    rad_n, rng_n = oracle_nee_np.trace_physical_np(
        scene, o_np, d_np, rng0.copy(), num_bounces=bounces
    )
    assert_three_way(np.asarray(rng_j), rng_n, np.asarray(rad_j), rad_n)
