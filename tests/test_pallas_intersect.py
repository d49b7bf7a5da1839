"""Pallas sphere nearest-hit kernel (interpret mode on CPU).

The kernel must reproduce `sphere_distances` + first-wins argmin exactly
(it replaces the XLA chunked scan on TPU for large scenes), and its
custom VJP must match differentiating the min-of-distances.
"""

import numpy as np
import jax
import jax.numpy as jnp

from haskell_path_tracer_tpu.models.objects import (
    BRDF_MATTE,
    make_materials,
    make_spheres,
)
from haskell_path_tracer_tpu.ops.intersect import INFINITE, sphere_distances
from haskell_path_tracer_tpu.ops.pallas_intersect import (
    sphere_nearest_pallas,
)


def random_spheres(n, seed=0):
    rng = np.random.default_rng(seed)
    return make_spheres(
        rng.uniform(-6, 6, (n, 3)),
        rng.uniform(0.3, 1.2, n),
        make_materials([([0.5, 0.5, 0.5], 0.0, BRDF_MATTE, 1.0)] * n),
    )


def random_rays(m, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (m, 3)).astype(np.float32)
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def reference_nearest(o, d, spheres):
    ts = sphere_distances(o, d, spheres)  # [R, N]
    t = jnp.min(ts, axis=-1)
    n = ts.shape[-1]
    iota = jnp.arange(n, dtype=jnp.int32)
    prim = jnp.min(jnp.where(ts == t[..., None], iota, n), axis=-1)
    return t, jnp.minimum(prim, n - 1).astype(jnp.int32)


def test_kernel_matches_reference():
    spheres = random_spheres(37)
    o, d = random_rays(1000)
    t_p, p_p = sphere_nearest_pallas(
        o, d, spheres.pos, spheres.radius, interpret=True
    )
    t_r, p_r = reference_nearest(o, d, spheres)
    # Interpret mode on CPU fuses multiplies differently from the compiled
    # XLA reference (1-ulp drift on ~10% of lanes, and the occasional
    # grazing ray whose accept test flips); on real TPU the kernel matches
    # the chunked path bit-for-bit (verified on v5e).
    t_p, p_p, t_r, p_r = map(np.asarray, (t_p, p_p, t_r, p_r))
    agree = np.isclose(t_p, t_r, rtol=1e-5) | (
        (t_p == INFINITE) & (t_r == INFINITE)
    )
    assert agree.mean() > 0.995, agree.mean()
    assert ((p_p == p_r) | ~agree).mean() > 0.995


def test_kernel_non_lane_multiple_ray_count():
    spheres = random_spheres(5, seed=3)
    o, d = random_rays(77, seed=4)  # 77 is not a multiple of 128
    t_p, p_p = sphere_nearest_pallas(
        o, d, spheres.pos, spheres.radius, interpret=True
    )
    t_r, p_r = reference_nearest(o, d, spheres)
    assert t_p.shape == (77,)
    np.testing.assert_array_equal(np.asarray(t_p), np.asarray(t_r))
    np.testing.assert_array_equal(np.asarray(p_p), np.asarray(p_r))


def test_kernel_tie_break_first_sphere():
    # Two identical spheres: the lower index must win.
    pos = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 0.0, -5.0]], jnp.float32)
    rad = jnp.asarray([1.0, 1.0], jnp.float32)
    o = jnp.zeros((4, 3), jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (4, 3))
    t, p = sphere_nearest_pallas(o, d, pos, rad, interpret=True)
    np.testing.assert_allclose(np.asarray(t), 4.0)
    assert (np.asarray(p) == 0).all()


def test_kernel_miss_is_infinite():
    spheres = random_spheres(3, seed=9)
    o = jnp.asarray([[100.0, 100.0, 100.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    t, _ = sphere_nearest_pallas(
        o, d, spheres.pos, spheres.radius, interpret=True
    )
    assert float(t[0]) == INFINITE


def test_custom_vjp_matches_min_gradient():
    spheres = random_spheres(9, seed=5)
    o, d = random_rays(256, seed=6)

    def loss_pallas(pos, radius):
        t, _ = sphere_nearest_pallas(o, d, pos, radius, interpret=True)
        return jnp.sum(jnp.where(t < INFINITE, t, 0.0))

    def loss_ref(pos, radius):
        spheres2 = type(spheres)(pos=pos, radius=radius, material=None)
        ts = sphere_distances(o, d, spheres2)
        t = jnp.min(ts, axis=-1)
        return jnp.sum(jnp.where(t < INFINITE, t, 0.0))

    gp = jax.grad(loss_pallas, argnums=(0, 1))(spheres.pos, spheres.radius)
    gr = jax.grad(loss_ref, argnums=(0, 1))(spheres.pos, spheres.radius)
    np.testing.assert_allclose(
        np.asarray(gp[0]), np.asarray(gr[0]), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gr[1]), rtol=2e-3, atol=1e-4
    )


# --- fused dual query (nearest + NEE shadow occlusion) ----------------------


from haskell_path_tracer_tpu.ops.intersect import EPSILON
from haskell_path_tracer_tpu.ops.pallas_intersect import sphere_dual_query


def dual_inputs(n_rays, n_spheres, seed=0):
    spheres = random_spheres(n_spheres, seed=seed)
    o, d1 = random_rays(n_rays, seed=seed + 1)
    _, d2 = random_rays(n_rays, seed=seed + 2)
    rng = np.random.default_rng(seed + 3)
    t_light = jnp.asarray(rng.uniform(0.5, 15.0, n_rays).astype(np.float32))
    l_idx = jnp.asarray(rng.integers(0, n_spheres, n_rays).astype(np.int32))
    alive = jnp.ones((n_rays,), jnp.int32)
    return spheres, o, d1, d2, t_light, l_idx, alive


def reference_dual(spheres, o, d_bsdf, d_shadow, t_light, l_idx):
    """Brute-force oracle in the eps-shifted frame: the kernel's o-frame
    acceptance is algebraically the same set (kernel docstring)."""
    t_s, p_s = reference_nearest(o + EPSILON * d_bsdf, d_bsdf, spheres)
    t = np.where(np.asarray(t_s) < INFINITE, np.asarray(t_s) + EPSILON,
                 INFINITE)
    ts = np.asarray(sphere_distances(o + EPSILON * d_shadow, d_shadow,
                                     spheres))  # [R, N]
    hits = ts < INFINITE
    before = ts + EPSILON < np.asarray(t_light)[:, None]
    not_light = (
        np.arange(ts.shape[-1])[None, :] != np.asarray(l_idx)[:, None]
    )
    occ = (hits & before & not_light).any(axis=-1)
    return t, np.asarray(p_s), occ


def test_dual_query_matches_reference():
    spheres, o, d1, d2, tl, li, alive = dual_inputs(1500, 41)
    t_p, p_p, occ_p = sphere_dual_query(
        o, d1, d2, tl, li, alive, spheres.pos, spheres.radius,
        interpret=True,
    )
    t_r, p_r, occ_r = reference_dual(spheres, o, d1, d2, tl, li)
    t_p, p_p, occ_p = map(np.asarray, (t_p, p_p, occ_p))
    # o-frame vs shifted-frame arithmetic drifts by ~1 ulp; grazing rays
    # may flip an accept test (same caveat as the nearest-hit kernel).
    agree = np.isclose(t_p, t_r, rtol=1e-4, atol=1e-4) | (
        (t_p == INFINITE) & (t_r == INFINITE)
    )
    assert agree.mean() > 0.995, agree.mean()
    assert ((p_p == p_r) | ~agree).mean() > 0.995
    assert (occ_p == occ_r).mean() > 0.995, (occ_p != occ_r).mean()


def test_dual_query_light_never_occludes_itself():
    # One sphere which IS the light: occlusion must be False even though
    # the shadow ray hits it before t_light.
    pos = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)
    rad = jnp.asarray([1.0], jnp.float32)
    o = jnp.zeros((4, 3), jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (4, 3))
    tl = jnp.full((4,), 10.0, jnp.float32)
    li = jnp.zeros((4,), jnp.int32)
    alive = jnp.ones((4,), jnp.int32)
    t, p, occ = sphere_dual_query(
        o, d, d, tl, li, alive, pos, rad, interpret=True
    )
    assert not np.asarray(occ).any()
    np.testing.assert_allclose(np.asarray(t), 4.0, rtol=1e-6)


def test_dual_query_occluder_behind_light_is_visible():
    pos = jnp.asarray([[0.0, 0.0, -8.0]], jnp.float32)  # behind t_light=4
    rad = jnp.asarray([1.0], jnp.float32)
    o = jnp.zeros((1, 3), jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    tl = jnp.asarray([4.0], jnp.float32)
    li = jnp.asarray([7], jnp.int32)  # not in scene: nothing excluded
    alive = jnp.ones((1,), jnp.int32)
    _, _, occ = sphere_dual_query(
        o, d, d, tl, li, alive, pos, rad, interpret=True
    )
    assert not bool(occ[0])
    tl2 = jnp.asarray([12.0], jnp.float32)  # now the sphere is in front
    _, _, occ2 = sphere_dual_query(
        o, d, d, tl2, li, alive, pos, rad, interpret=True
    )
    assert bool(occ2[0])


def test_dual_query_dead_block_skips_fold():
    spheres, o, d1, d2, tl, li, _ = dual_inputs(256, 9, seed=11)
    alive = jnp.zeros((256,), jnp.int32)
    t, p, occ = sphere_dual_query(
        o, d1, d2, tl, li, alive, spheres.pos, spheres.radius,
        interpret=True,
    )
    # Fully-dead blocks return the fold's init values.
    assert (np.asarray(t) == INFINITE).all()
    assert not np.asarray(occ).any()


def test_dual_query_vjp_matches_winner_gradient():
    spheres, o, d1, d2, tl, li, alive = dual_inputs(256, 9, seed=13)

    def loss_dual(pos, radius):
        t, _, _ = sphere_dual_query(
            o, d1, d2, tl, li, alive, pos, radius, interpret=True
        )
        return jnp.sum(jnp.where(t < INFINITE, t, 0.0))

    def loss_ref(pos, radius):
        spheres2 = type(spheres)(pos=pos, radius=radius, material=None)
        ts = sphere_distances(o + EPSILON * d1, d1, spheres2)
        t = jnp.min(ts, axis=-1)
        return jnp.sum(jnp.where(t < INFINITE, t + EPSILON, 0.0))

    gp = jax.grad(loss_dual, argnums=(0, 1))(spheres.pos, spheres.radius)
    gr = jax.grad(loss_ref, argnums=(0, 1))(spheres.pos, spheres.radius)
    np.testing.assert_allclose(
        np.asarray(gp[0]), np.asarray(gr[0]), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gr[1]), rtol=5e-3, atol=5e-4
    )
