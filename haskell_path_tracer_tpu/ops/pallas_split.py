"""Pallas TPU kernel for the deterministic-splitting integrator.

`render_sample_wavefront_split` (render/wavefront.py) is already fully
elementwise — each lane walks its own dielectric split tree depth-first
with a private fixed-depth stack, no sorts or scatters — but as an XLA
loop it round-trips the whole traversal state (ray, stack, throughput,
rng: ~35 f32/lane) through HBM every step.  This kernel runs the SAME
traversal with all state resident in VMEM for all samples and steps: HBM
is touched once per dispatch (primary rays + rng in, radiance + rng out),
exactly like the inline megakernel (ops/pallas_megakernel.py).

Semantics match the XLA split integrator step for step (same RNG draw
schedule — three draws per processed segment, consumed only by alive
lanes; same push/pop rules; same death rule), so on split-free scenes it
inherits the wavefront==inline bit-parity chain, and on glass scenes it
is the deterministic both-branches estimator the reference stubbed
(/root/reference/src/Scene/Trace.hs:116-118, 326-328).

The per-block early exit (all lanes drained and stacks empty) is one
scalar `lax.cond` around the step body — dead tiles cost one reduce per
step instead of a full fold, the same trick as the dual-query kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.objects import Scene
from .intersect import EPSILON
from . import pallas_megakernel as _pmk
from .pallas_megakernel import (
    NEAR_ZERO_EPS,
    _brdf_sample_from_vec,
    _draw_vec,
    _nearest_hit_fold,
    _scene_tables,
    _table_rows,
)


def _dielectric_split_planes(dx, dy, dz, nx, ny, nz, ior):
    """`ops/brdf.py:dielectric_split` on [TH, W] planes — identical f32
    op order (frame flip, Schlick Fresnel with TIR, normalize_safe with
    a max(.., 1e-20) norm clamp)."""
    cos_i = -(dx * nx + dy * ny + dz * nz)
    inside = cos_i < 0.0
    fnx = jnp.where(inside, -nx, nx)
    fny = jnp.where(inside, -ny, ny)
    fnz = jnp.where(inside, -nz, nz)
    aci = jnp.abs(cos_i)
    eta = jnp.where(inside, ior, 1.0 / ior)

    sin2 = eta * eta * jnp.maximum(1.0 - aci * aci, 0.0)
    tir = sin2 > 1.0
    cos_t_arg = jnp.where(tir, 1.0, jnp.maximum(1.0 - sin2, 1e-12))
    cos_t = jnp.where(tir, 0.0, jnp.sqrt(cos_t_arg))

    r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    fres = r0 + (1.0 - r0) * (1.0 - aci) ** 5
    f_refl = jnp.where(tir, 1.0, fres)

    ia = dx * fnx + dy * fny + dz * fnz
    rx = dx - 2.0 * ia * fnx
    ry = dy - 2.0 * ia * fny
    rz = dz - 2.0 * ia * fnz

    k = eta * aci - cos_t
    tx = eta * dx + k * fnx
    ty = eta * dy + k * fny
    tz = eta * dz + k * fnz
    tn = jnp.maximum(jnp.sqrt(tx * tx + ty * ty + tz * tz), 1e-20)
    return rx, ry, rz, tx / tn, ty / tn, tz / tn, f_refl


def _split_kernel_body(
    geom_ref, mat_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    ra_ref, rb_ref, rc_ref, rctr_ref,
    out_r_ref, out_g_ref, out_b_ref,
    out_ra_ref, out_rb_ref, out_rc_ref, out_rctr_ref,
    *, spp, num_bounces, stack_depth, num_spheres, num_prims,
    num_boxes=0, num_triangles=0, early_exit=True,
):
    geom = _table_rows(geom_ref[:, :], num_prims,
                       num_cols=geom_ref.shape[1])
    mat = _table_rows(mat_ref[:, :], num_prims)
    pox, poy, poz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
    pdx, pdy, pdz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
    shape = pox.shape
    zeros = jnp.zeros(shape, jnp.float32)
    izeros = jnp.zeros(shape, jnp.int32)
    max_steps = num_bounces * (1 + stack_depth)

    def one_sample(carry):
        ra, rb, rc, rctr, acc_r, acc_g, acc_b = carry

        # Traversal state (all i32/f32 planes — Mosaic cannot carry i1
        # vectors through scf control flow).
        st = (
            pox, poy, poz, pdx, pdy, pdz,              # 0-5 ray
            jnp.ones(shape, jnp.float32),              # 6-8 throughput
            jnp.ones(shape, jnp.float32),
            jnp.ones(shape, jnp.float32),
            zeros, zeros, zeros,                       # 9-11 radiance
            izeros,                                    # 12 depth
            izeros,                                    # 13 sp
            jnp.ones(shape, jnp.int32),                # 14 live
            ra, rb, rc, rctr,                          # 15-18 rng
        ) + tuple(
            p
            for _ in range(stack_depth)
            for p in (zeros, zeros, zeros, zeros, zeros, zeros,
                      zeros, zeros, zeros, izeros)
        )  # per slot: o(3) d(3) t(3) depth(1)

        def do_step(st):
            (ox, oy, oz, dxx, dyy, dzz, th_r, th_g, th_b,
             res_r, res_g, res_b, depth, sp, live,
             ra, rb, rc, rctr) = st[:19]
            stk = list(st[19:])

            h = _nearest_hit_fold(
                geom, mat, num_spheres, num_prims,
                ox, oy, oz, dxx, dyy, dzz,
                num_boxes=num_boxes, num_triangles=num_triangles,
            )
            q = th_r * th_r + th_g * th_g + th_b * th_b
            alive = (
                (live > 0)
                & h["hit"]
                & (q > NEAR_ZERO_EPS)
                & (depth < num_bounces)
            )

            # Emission pickup at the OLD throughput.
            res_r = res_r + jnp.where(alive, h["cr"] * h["il"] * th_r, 0.0)
            res_g = res_g + jnp.where(alive, h["cg"] * h["il"] * th_g, 0.0)
            res_b = res_b + jnp.where(alive, h["cb"] * h["il"] * th_b, 0.0)

            vx, vy, vz, ra2, rb2, rc2, rctr2 = _draw_vec(ra, rb, rc, rctr)
            (no_x, no_y, no_z, nd_x, nd_y, nd_z, tm_r, tm_g, tm_b) = (
                _brdf_sample_from_vec(
                    h, dxx, dyy, dzz, vx, vy, vz, has_dielectric=False
                )
            )

            # Deterministic split: this lane continues as the reflection
            # (weight F); the refraction child (weight 1-F) is pushed.
            rx, ry, rz, tx, ty, tz, f_refl = _dielectric_split_planes(
                dxx, dyy, dzz, h["nx"], h["ny"], h["nz"], h["pr"]
            )
            is_diel = alive & (h["kd"] == 2.0)
            nd_x = jnp.where(is_diel, rx, nd_x)
            nd_y = jnp.where(is_diel, ry, nd_y)
            nd_z = jnp.where(is_diel, rz, nd_z)
            no_x = jnp.where(is_diel, h["hx"] + rx * EPSILON, no_x)
            no_y = jnp.where(is_diel, h["hy"] + ry * EPSILON, no_y)
            no_z = jnp.where(is_diel, h["hz"] + rz * EPSILON, no_z)
            tm_r = jnp.where(is_diel, h["cr"] * f_refl, tm_r)
            tm_g = jnp.where(is_diel, h["cg"] * f_refl, tm_g)
            tm_b = jnp.where(is_diel, h["cb"] * f_refl, tm_b)

            omf = 1.0 - f_refl
            ct_r = th_r * h["cr"] * omf
            ct_g = th_g * h["cg"] * omf
            ct_b = th_b * h["cb"] * omf
            ct_q = ct_r * ct_r + ct_g * ct_g + ct_b * ct_b
            push = (
                is_diel
                & (f_refl < 1.0)
                & (ct_q > NEAR_ZERO_EPS)
                & (depth + 1 < num_bounces)
                & (sp < stack_depth)
            )
            co_x = h["hx"] + tx * EPSILON
            co_y = h["hy"] + ty * EPSILON
            co_z = h["hz"] + tz * EPSILON

            for slot in range(stack_depth):
                w = push & (sp == slot)
                b = slot * 10
                vals = (co_x, co_y, co_z, tx, ty, tz, ct_r, ct_g, ct_b)
                for i, v in enumerate(vals):
                    stk[b + i] = jnp.where(w, v, stk[b + i])
                stk[b + 9] = jnp.where(w, depth + 1, stk[b + 9])
            sp = jnp.where(push, sp + 1, sp)

            # Advance surviving segments.
            sel = lambda c, a, b_: jnp.where(c, a, b_)
            ox = sel(alive, no_x, ox)
            oy = sel(alive, no_y, oy)
            oz = sel(alive, no_z, oz)
            dxx = sel(alive, nd_x, dxx)
            dyy = sel(alive, nd_y, dyy)
            dzz = sel(alive, nd_z, dzz)
            depth = jnp.where(alive, depth + 1, depth)
            th_r = jnp.where(alive, th_r * tm_r, 0.0)
            th_g = jnp.where(alive, th_g * tm_g, 0.0)
            th_b = jnp.where(alive, th_b * tm_b, 0.0)
            ra = sel(alive, ra2, ra)
            rb = sel(alive, rb2, rb)
            rc = sel(alive, rc2, rc)
            rctr = sel(alive, rctr2, rctr)

            # Dead lanes pop their deepest pending child.
            pop = (live > 0) & ~alive & (sp > 0)
            top = sp - 1
            pv = [zeros] * 9
            pdep = izeros
            for slot in range(stack_depth):
                m = top == slot
                b = slot * 10
                for i in range(9):
                    pv[i] = jnp.where(m, stk[b + i], pv[i])
                pdep = jnp.where(m, stk[b + 9], pdep)
            ox = sel(pop, pv[0], ox)
            oy = sel(pop, pv[1], oy)
            oz = sel(pop, pv[2], oz)
            dxx = sel(pop, pv[3], dxx)
            dyy = sel(pop, pv[4], dyy)
            dzz = sel(pop, pv[5], dzz)
            th_r = sel(pop, pv[6], th_r)
            th_g = sel(pop, pv[7], th_g)
            th_b = sel(pop, pv[8], th_b)
            depth = jnp.where(pop, pdep, depth)
            sp = jnp.where(pop, sp - 1, sp)
            live = (alive | pop).astype(jnp.int32)

            return (
                ox, oy, oz, dxx, dyy, dzz, th_r, th_g, th_b,
                res_r, res_g, res_b, depth, sp, live,
                ra, rb, rc, rctr,
            ) + tuple(stk)

        if early_exit:
            def step(_, st):
                return jax.lax.cond(
                    jnp.sum(st[14]) > 0, do_step, lambda s: s, st
                )
        else:
            def step(_, st):
                return do_step(st)

        st = jax.lax.fori_loop(0, max_steps, step, st)
        res_r, res_g, res_b = st[9], st[10], st[11]
        ra, rb, rc, rctr = st[15], st[16], st[17], st[18]
        return (ra, rb, rc, rctr,
                acc_r + res_r, acc_g + res_g, acc_b + res_b)

    carry = (
        ra_ref[:, :], rb_ref[:, :], rc_ref[:, :], rctr_ref[:, :],
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    # Same sample-loop rolling policy as the inline megakernel (Mosaic
    # compile time grows superlinearly in unrolled body size); looked up
    # dynamically so tests can flip the threshold.  Unlike the inline
    # kernel, the rolled loop runs with NO partial unroll: this body is
    # ~4x the inline bounce (fold + split + stack traffic), and a 4-wide
    # unroll pushed the 64-spp Mosaic compile to ~15 min on v5e, while
    # per-sample loop overhead is already amortized over the 24-step
    # traversal inside.
    if spp <= _pmk.SAMPLE_UNROLL_MAX:
        for _ in range(spp):
            carry = one_sample(carry)
    else:
        carry = jax.lax.fori_loop(
            0, spp, lambda _i, c: one_sample(c), carry
        )
    ra, rb, rc, rctr, acc_r, acc_g, acc_b = carry

    out_r_ref[:, :] = acc_r
    out_g_ref[:, :] = acc_g
    out_b_ref[:, :] = acc_b
    out_ra_ref[:, :] = ra
    out_rb_ref[:, :] = rb
    out_rc_ref[:, :] = rc
    out_rctr_ref[:, :] = rctr


def trace_split_pallas(
    scene: Scene,
    rays,
    rng_state: jnp.ndarray,
    num_bounces: int = 15,
    spp: int = 1,
    stack_depth: int = 2,
    tile_rows: int = 16,
    interpret: bool = False,
    early_exit: bool = True,
):
    """Fused multi-sample deterministic-splitting trace.  Returns
    (radiance_sum [H, W, 3] over `spp` samples, final rng [H, W, 4]) —
    drop-in for `spp` iterations of `render_sample_wavefront_split`
    summed (with `queue_factor = stack_depth`).

    Width must be a multiple of 128 (TPU lane count); callers fall back
    to the XLA traversal otherwise.
    """
    H, W = rng_state.shape[:2]
    tile_rows = min(tile_rows, H)
    while H % tile_rows:
        tile_rows //= 2
    stack_depth = max(1, min(num_bounces - 1, stack_depth))
    geom, mat = _scene_tables(scene)
    num_prims = geom.shape[0]

    planes_in = (
        [rays.origin[..., i] for i in range(3)]
        + [rays.direction[..., i] for i in range(3)]
        + [rng_state[..., i] for i in range(4)]
    )
    row_spec = pl.BlockSpec(
        (tile_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    geom_spec = pl.BlockSpec(
        geom.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec(
        mat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _split_kernel_body,
        spp=spp,
        num_bounces=num_bounces,
        stack_depth=stack_depth,
        num_spheres=scene.spheres.count,
        num_prims=num_prims,
        num_boxes=scene.boxes.count,
        num_triangles=scene.triangles.count,
        early_exit=early_exit,
    )
    out = pl.pallas_call(
        kernel,
        grid=(H // tile_rows,),
        in_specs=[geom_spec, mat_spec] + [row_spec] * 10,
        out_specs=[row_spec] * 7,
        out_shape=(
            [jax.ShapeDtypeStruct((H, W), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((H, W), jnp.uint32)] * 4
        ),
        interpret=interpret,
    )(geom, mat, *planes_in)
    radiance = jnp.stack(out[0:3], axis=-1)
    rng_out = jnp.stack(out[3:7], axis=-1)
    return radiance, rng_out
