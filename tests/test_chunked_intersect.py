"""Chunked nearest-hit (large scenes) agrees exactly with the direct
formulation: same distances, same winning primitive (first-wins
tie-break), same payload — and gradients still flow.

The chunked path bounds the [rays, prims] intermediate that OOMed HBM at
1920x1088 x 1000 spheres (BASELINE.md config #4)."""

import numpy as np
import jax
import jax.numpy as jnp

from haskell_path_tracer_tpu.models.objects import (
    BRDF_MATTE,
    Scene,
    make_materials,
    make_planes,
    make_spheres,
)
from haskell_path_tracer_tpu.ops import intersect as I


def random_scene(n_spheres, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform([-10, -3, -30], [10, 8, -3], (n_spheres, 3))
    radius = rng.uniform(0.2, 1.2, n_spheres)
    mats = make_materials(
        [
            (rng.uniform(0.1, 1.0, 3).tolist(), float(i % 7 == 0),
             BRDF_MATTE, 1.0)
            for i in range(n_spheres)
        ]
    )
    s = make_spheres(pos.tolist(), radius.tolist(), mats)
    p = make_planes(
        [[0.0, -3.0, 0.0], [0.0, 9.0, 0.0]],
        [[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]],
        make_materials(
            [([0.5, 0.5, 0.5], 0.0, BRDF_MATTE, 1.0)] * 2
        ),
    )
    return Scene(spheres=s, planes=p)


def random_rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d, jnp.float32)


def _assert_same_resolution(scene, o, d):
    """Chunked and direct formulations agree up to XLA fusion ulps (the
    two layouts may or may not emit FMAs for d2 = |l|^2 - tca^2, shifting
    t by ~1e-5 relative); the winning primitive must match wherever the
    nearest hit is unambiguous."""
    t_c, p_c = I._nearest_t_prim_chunked(o, d, scene)
    t_s, p_s = I._nearest_t_prim_small(o, d, scene)
    t_c, p_c = np.asarray(t_c), np.asarray(p_c)
    t_s, p_s = np.asarray(t_s), np.asarray(p_s)
    hit = t_s < I.INFINITE
    np.testing.assert_allclose(
        np.where(hit, t_c, 0.0), np.where(hit, t_s, 0.0), rtol=5e-5
    )
    np.testing.assert_array_equal(hit, t_c < I.INFINITE)
    # Where primitives disagree, the two candidates' distances must be
    # within ulp noise of each other (a genuine near-tie).
    disagree = hit & (p_c != p_s)
    assert (
        np.abs(t_c[disagree] - t_s[disagree])
        <= 5e-5 * np.abs(t_s[disagree]) + 1e-5
    ).all()
    assert disagree.mean() < 0.01


def test_chunked_matches_direct():
    # 300 spheres > CHUNKED_THRESHOLD (and not a multiple of CHUNK_SIZE,
    # exercising the padded tail).
    _assert_same_resolution(random_scene(300), *random_rays(4096))


def test_nearest_hit_dispatches_chunked():
    scene = random_scene(200)
    assert scene.num_primitives > I.CHUNKED_THRESHOLD
    o, d = random_rays(512)
    h = I.nearest_hit(o, d, scene)
    # Payload consistency: color/illum match a direct gather by prim.
    table = np.concatenate(
        [
            np.asarray(scene.spheres.material.color),
            np.asarray(scene.planes.material.color),
        ]
    )
    np.testing.assert_array_equal(
        np.asarray(h.color), table[np.asarray(h.prim)]
    )
    assert np.isfinite(np.asarray(h.normal)[np.asarray(h.hit)]).all()


def test_chunked_exact_chunk_multiple():
    # No padded tail.
    _assert_same_resolution(random_scene(I.CHUNK_SIZE * 2), *random_rays(1024))


def test_chunked_gradients_flow():
    scene = random_scene(150)
    o = jnp.zeros((8, 3), jnp.float32)
    # Aim straight at the first 8 sphere centers so every ray hits.
    centers = np.asarray(scene.spheres.pos)[:8]
    d = jnp.asarray(
        centers / np.linalg.norm(centers, axis=-1, keepdims=True),
        jnp.float32,
    )

    def f(pos):
        s = Scene(
            spheres=scene.spheres.__class__(
                pos=pos, radius=scene.spheres.radius,
                material=scene.spheres.material,
            ),
            planes=scene.planes,
        )
        h = I.nearest_hit(o, d, s)
        return jnp.sum(jnp.where(h.hit, h.t, 0.0))

    g = jax.grad(f)(scene.spheres.pos)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
