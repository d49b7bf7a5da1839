"""Native C++ runtime tests: build, bit-exact SFC32, output fast path, and
the scalar C++ oracle renderer cross-checked against both the numpy oracle
and the JAX renderer.

Three independent implementations of the reference's `render Inline`
semantics (/root/reference/src/Scene/Trace.hs:193-200, 344-383) exist in
this repo — JAX (render/integrator.py), vectorized numpy
(parity/oracle_np.py), and scalar C++ (runtime/native) — sharing only the
spec.  Agreement across all three at matched RNG is the strongest
correctness evidence available without the Haskell toolchain."""

import struct
import zlib

import numpy as np
import pytest

from haskell_path_tracer_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build unavailable: {native.load_error()}"
)


def _states(n, seed=3):
    return (
        np.random.default_rng(seed)
        .integers(0, 2**32, size=(n, 4))
        .astype(np.uint32)
    )


def test_sfc32_advance_bit_exact():
    from haskell_path_tracer_tpu.ops.rng import np_sfc32_next

    st = _states(128)
    ref = st.copy()
    for _ in range(5):
        _, ref = np_sfc32_next(ref)
    out = native.sfc32_advance(st.copy(), rounds=5)
    np.testing.assert_array_equal(out, ref)


def test_sfc32_uniforms_bit_exact_vs_jax_and_numpy():
    from haskell_path_tracer_tpu.ops import rng as R
    import jax.numpy as jnp

    st = _states(64)
    u_native, st_native = native.sfc32_uniforms(st.copy(), draws=3)

    st_np = st.copy()
    st_jax = jnp.asarray(st)
    for i in range(3):
        u_np, st_np = R.np_sfc32_float(st_np)
        u_jax, st_jax = R.sfc32_float(st_jax)
        np.testing.assert_array_equal(u_native[:, i], u_np)
        np.testing.assert_array_equal(u_native[:, i], np.asarray(u_jax))
    np.testing.assert_array_equal(st_native, st_np)
    np.testing.assert_array_equal(st_native, np.asarray(st_jax))


def test_native_tonemap_matches_python():
    from haskell_path_tracer_tpu.utils.image import tonemap

    img = np.random.default_rng(0).uniform(0, 20, (17, 9, 3)).astype(np.float32)
    a = native.tonemap_rgb8(img, exposure=0.7, gamma=2.2)
    b = tonemap(img, exposure=0.7, gamma=2.2)
    # powf vs np.power can differ by one ulp -> at most 1 LSB after quantize.
    assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1


def test_native_png_decodes(tmp_path):
    rgb = (np.arange(11 * 5 * 3) % 251).astype(np.uint8).reshape(11, 5, 3)
    path = str(tmp_path / "n.png")
    native.write_png(path, rgb)
    blob = open(path, "rb").read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", blob[16:24])
    assert (w, h) == (5, 11)
    idat = blob.index(b"IDAT")
    ln = struct.unpack(">I", blob[idat - 4 : idat])[0]
    raw = zlib.decompress(blob[idat + 4 : idat + 4 + ln])
    rows = np.frombuffer(raw, np.uint8).reshape(11, 1 + 5 * 3)
    np.testing.assert_array_equal(rows[:, 1:].reshape(11, 5, 3), rgb)


def _parity_setup(w=32, h=24):
    from haskell_path_tracer_tpu.models import world
    from haskell_path_tracer_tpu.ops.rng import gen_seeds

    scene = world.main_scene()
    camera = world.initial_camera()
    rng = np.asarray(gen_seeds((h, w), seed=11))
    color = np.zeros((h, w, 3), np.float32)
    return scene, camera, color, rng


def _close_fraction(a, b, rtol=1e-3, atol=1e-4):
    ok = np.isclose(a, b, rtol=rtol, atol=atol)
    return ok.mean()


def test_cpp_oracle_matches_numpy_oracle():
    """C++ scalar oracle vs vectorized numpy oracle at matched RNG.

    RNG streams are bit-exact, so bounce decisions agree except where a
    transcendental-ulp difference flips a boundary test; tolerate <0.5%
    divergent lanes (the same budget test_pallas.py uses)."""
    from haskell_path_tracer_tpu.parity.oracle_np import render_sample_np

    scene, camera, color, rng = _parity_setup()
    c_cpp, r_cpp = native.render_inline(
        scene, camera, color, rng, num_bounces=4, spp=2
    )

    c_np, r_np = color.copy(), rng.copy()
    for _ in range(2):
        c_np, r_np = render_sample_np(scene, camera, c_np, r_np, num_bounces=4)

    assert _close_fraction(c_cpp, c_np) > 0.995
    # RNG advance counts match wherever the path decisions agreed.
    assert (r_cpp == r_np).all(axis=-1).mean() > 0.995


def test_cpp_oracle_matches_jax_renderer():
    """The flagship cross-check: JAX megakernel vs native C++ oracle."""
    import jax

    from haskell_path_tracer_tpu.models.objects import Accumulator
    from haskell_path_tracer_tpu.render.integrator import render_batch_inline

    scene, camera, color, rng = _parity_setup()
    import jax.numpy as jnp

    acc = Accumulator(
        color=jnp.asarray(color),
        rng=jnp.asarray(rng),
        iterations=jnp.zeros((), jnp.int32),
    )
    out = jax.jit(
        lambda s, c, a: render_batch_inline(s, c, a, spp=2, num_bounces=4)
    )(scene, camera, acc)

    c_cpp, r_cpp = native.render_inline(
        scene, camera, color, rng, num_bounces=4, spp=2
    )
    # RNG streams (and hence bounce decisions) match essentially everywhere;
    # radiance values differ on a few tenths of a percent of lanes where
    # XLA's transcendental ulps differ from libm's (measured: 99.35% lanes
    # allclose, means within 0.13%).
    assert _close_fraction(np.asarray(out.color), c_cpp) > 0.99
    assert (np.asarray(out.rng) == r_cpp).all(axis=-1).mean() > 0.995
    np.testing.assert_allclose(
        np.asarray(out.color).mean(), c_cpp.mean(), rtol=5e-3
    )


def test_cpp_oracle_threads_deterministic():
    """Row-parallel rendering is deterministic regardless of thread count."""
    scene, camera, color, rng = _parity_setup(16, 16)
    a = native.render_inline(scene, camera, color, rng, 3, 2, n_threads=1)
    b = native.render_inline(scene, camera, color, rng, 3, 2, n_threads=4)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_save_render_uses_native(tmp_path):
    from haskell_path_tracer_tpu.utils.image import save_render

    img = np.random.default_rng(2).uniform(0, 4, (6, 8, 3)).astype(np.float32)
    path = save_render(str(tmp_path / "x.png"), img)
    blob = open(path, "rb").read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"


def test_native_nee_oracle_matches_xla_estimator():
    """Round 5: the scalar C++ NEE oracle (ptru_trace_physical_nee) —
    the THIRD independent implementation of the physical/NEE estimator
    — matches render/nee.py:trace_physical(nee=True, fused=False)
    lane-for-lane with bit-equal RNG streams, on a triangle-area-light
    scene and a sphere Cornell scene."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_pallas_nee import cornell8, tri_scene

    from haskell_path_tracer_tpu.models.camera import primary_rays
    from haskell_path_tracer_tpu.models.objects import Camera
    from haskell_path_tracer_tpu.ops.rng import gen_seeds
    from haskell_path_tracer_tpu.render.nee import trace_physical
    from haskell_path_tracer_tpu.runtime import native

    if not native.available():
        pytest.skip(f"native runtime unavailable: {native.load_error()}")
    H, W = 16, 64
    cam = Camera.create([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 90.0)
    for scene in (tri_scene(), cornell8()):
        rng = gen_seeds((H, W), seed=9)
        rays = primary_rays(cam, W, H)
        rad_x, rng_x = trace_physical(
            scene, rays, rng, num_bounces=3, nee=True, fused=False
        )
        rad_c, rng_c = native.trace_physical_nee(
            scene, np.asarray(rays.origin), np.asarray(rays.direction),
            np.asarray(rng), 3,
        )
        rng_x, rad_x = np.asarray(rng_x), np.asarray(rad_x)
        m = (rng_x == rng_c).all(-1)
        assert m.mean() >= 0.995, m.mean()
        bad = (
            np.abs(rad_c - rad_x) > (1e-3 + 2e-3 * np.abs(rad_x))
        ).any(-1)
        assert (bad & m).mean() <= 0.005
        assert np.abs(rad_x).max() > 0
