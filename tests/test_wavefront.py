"""Wavefront ≡ inline equivalence on split-free scenes.

The cross-check the reference never had (its Streams variant is documented
as buggy on GPU, /root/reference/src/Scene/Trace.hs:280-283): both
integrators implement identical termination/emission semantics, so on
scenes without ray splitting the radiance AND the per-pixel RNG states must
match bit-for-bit.
"""

import numpy as np
import jax.numpy as jnp

from haskell_path_tracer_tpu.models import world
from haskell_path_tracer_tpu.render.integrator import (
    make_accumulator,
    render_sample_inline,
)
from haskell_path_tracer_tpu.render.wavefront import render_sample_wavefront


def _compare(
    scene,
    camera,
    w,
    h,
    bounces,
    samples=2,
    seed=5,
    russian_roulette=False,
    compact=True,
):
    acc_i = make_accumulator(w, h, seed=seed)
    acc_w = make_accumulator(w, h, seed=seed)
    for _ in range(samples):
        acc_i = render_sample_inline(
            scene, camera, acc_i, num_bounces=bounces,
            russian_roulette=russian_roulette,
        )
        acc_w = render_sample_wavefront(
            scene, camera, acc_w, num_bounces=bounces,
            russian_roulette=russian_roulette, compact=compact,
        )
    np.testing.assert_array_equal(
        np.asarray(acc_i.rng), np.asarray(acc_w.rng), err_msg="rng mismatch"
    )
    np.testing.assert_allclose(
        np.asarray(acc_i.color),
        np.asarray(acc_w.color),
        rtol=1e-6,
        atol=1e-6,
        err_msg="radiance mismatch",
    )


def test_wavefront_equals_inline_main_scene():
    _compare(world.main_scene(), world.initial_camera(), 32, 24, bounces=6)


def test_wavefront_equals_inline_no_compaction():
    _compare(
        world.main_scene(),
        world.initial_camera(),
        16,
        12,
        bounces=4,
        compact=False,
    )


def test_wavefront_equals_inline_russian_roulette():
    _compare(
        world.main_scene(),
        world.initial_camera(),
        16,
        12,
        bounces=8,
        samples=1,
        russian_roulette=True,
    )


def test_wavefront_equals_inline_deep_bounces():
    _compare(world.main_scene(), world.initial_camera(), 16, 12, bounces=15, samples=1)
