"""Differentiable fused NEE megakernel: in-VMEM replay + reverse sweep.

Round-3 measured the physical/NEE gradient path at 24.3 Mrays/s (suite
config 7): `diff/grad.py` could differentiate the estimator only through
the per-bounce dual-query kernel (`sphere_dual_query`'s custom VJP), with
all the glue (payload gathers, BRDF/light sampling, emission bookkeeping)
left to XLA autodiff — one HBM round-trip per bounce in each direction.
This module is the NEE analog of `ops/pallas_megakernel_vjp.py`: a
`jax.custom_vjp` whose

  * **forward** is the production fused NEE megakernel
    (`pallas_nee.trace_physical_nee_pallas` at the table level, including
    its presort/regeneration disciplines) — callers that never
    differentiate pay nothing;
  * **backward** is a second Pallas kernel that REPLAYS the bounce loop in
    VMEM (legacy spp x bounce discipline — lane-for-lane bit-identical to
    the regeneration discipline by construction), storing each bounce's
    input state, its 6 SFC32 uniforms and the fold's discrete outcomes
    (winner index, shadow occlusion) in on-chip scratch, then sweeps the
    bounces in reverse pulling the radiance cotangent through `jax.vjp`
    of the *continuous* per-bounce function.

The crucial difference from the parity VJP: at config-4 scale (1000
spheres) the O(P x R) sphere fold CANNOT be differentiated as an unrolled
scalar table (the parity kernel's flat-tuple trick is O(P) scalars).  It
does not need to be: the fold only *selects* — its continuous output (the
winner's distance) is re-derived in closed form from the one-hot-gathered
winner payload, exactly as the forward kernel's `payload()` already does.
So the backward DETACHES the fold (winner `prim` and occlusion `occ` are
stored residuals, the standard detached-decision semantics of
diff/grad.py), and every scene cotangent flows through

    gatT [16, P] --one-hot MXU gather--> winner payload --> t, normal,
    BRDF weights, emission, cone sample --> radiance,

whose transpose is again ONE MXU matmul per bounce (cotangent [16, R] x
one-hot [P, R]^T -> [16, P]).  The replay costs one extra forward; the
reverse sweep costs glue only — no O(P x R) work beyond the replay folds.

Gradient outputs: the gather table gatT [16, P] (sphere color/illuminance/
position/brdf-param/radius — mapped back to Scene leaves by
differentiating `pallas_nee._nee_scene_tables`), the plane table [M, 12],
the light table [L, 8] (light position/radius/emission — note light rows
alias sphere leaves; `_nee_scene_tables` routes both cotangent paths into
the same leaves), and the primary rays (camera derivatives).

Semantics (identical to diff/grad.py's XLA path): decisions — hit masks,
fold winners, occlusion, BRDF branch, RNG draws — are detached; gradients
flow through intersection distances, normals, BRDF weights, throughput
products, emission and the NEE solid-angle term.  Cross-checked against
`jax.grad` of `trace_physical(..., nee=True)` and finite differences in
tests/test_pallas_nee_vjp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.objects import BRDF_DIELECTRIC, BRDF_GLOSSY, BRDF_MATTE
from .intersect import EPSILON, INFINITE
from .pallas_nee import (
    DEFAULT_BLOCK_R,
    INV_PI,
    NEAR_ZERO_EPS,
    TWO_PI,
    _cone_sample,
    _cosine_hemisphere,
    _dot3,
    _draw3,
    _merge_planes_ref,
    _merge_tris_ref,
    _nee_scene_tables,
    _plane_t,
    _sphere_fold,
    _sphere_t_single,
    _trace_nee_from_tables,
)

# Residual-recording forwards emit 2 * spp * num_bounces extra i32
# output planes (winner + flags per (sample, bounce)); cap the HBM cost
# (64 planes = 2.1 GB at 4K) — beyond it the backward replays folds.
MAX_RESIDUAL_PLANES = 64

# Scratch layout per bounce (f32 planes): origin(3) direction(3)
# throughput(3) fold-t(1) brdf-uniforms(3) light-uniforms(3).
_STF_PLANES = 16
# int32 planes: fold winner, shadow occlusion, prev-bounce specular flag.
_STI_PLANES = 3


def _continuous_bounce(
    gatT, plane_flat, tri_gat, light_flat,
    ox, oy, oz, dx, dy, dz, th_r, th_g, th_b,
    *, t_det, prim, prev_spec, dead, u1, u2, u3, us0, us1, us2, occ,
    P, M, T, L, has_glossy, has_diel, want_aux=False,
):
    """One bounce's CONTINUOUS math — everything in
    `pallas_nee._nee_kernel.live_body` except the sphere fold — with every
    decision (t_det, prim, occ, dead, uniforms) detached.  Differentiable
    in (gatT, plane_flat, light_flat, ray, throughput).

    The winner's distance is re-derived differentiably: spheres in the
    exact `ops/intersect.py` op order from the gathered payload (the
    forward kernel's own `payload()` recompute, so primal values are
    bit-equal), planes by re-evaluating `_plane_t` for the winning row.

    Returns the masked next state (origin, direction, throughput) and this
    bounce's radiance contribution; with `want_aux` also the unmasked hit
    point / next direction / shadow ray / is_spec needed by the replay's
    fold.  Dead lanes pass their state through (throughput to zero) and
    contribute nothing — the forward's `masked_step` semantics, expressed
    inside the differentiated function so cotangents route correctly.
    """
    R = ox.shape[1]
    hit = t_det < INFINITE
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (P + T, R), 0)

    def per_group(fn, *args, n_out=1):
        outs = [fn(*[a[g : g + 1] for a in args]) for g in range(8)]
        if n_out == 1:
            return jnp.concatenate(outs, axis=0)
        return tuple(
            jnp.concatenate([o[i] for o in outs], axis=0)
            for i in range(n_out)
        )

    # Gather-column space: spheres 0..P-1, triangles P..P+T-1 (plane
    # winners alias harmlessly — every field they use is overwritten by
    # the plane selects; pallas_nee.payload's convention).
    gcol = jnp.where(prim >= P + M, prim - M, prim) if T else prim

    def gather_g(gcol_, hit_):
        onehot = ((iota_p == gcol_) & hit_).astype(jnp.float32)
        g = jax.lax.dot_general(
            gatT, onehot, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [16, R]
        return tuple(g[v : v + 1] for v in range(10))

    (cr, cg, cb, il, ax, ay, az, param, kind, srad) = per_group(
        gather_g, gcol, hit, n_out=10
    )
    is_plane = ((prim >= P) & (prim < P + M)) if T else prim >= P
    is_tri = (prim >= P + M) if T else jnp.zeros_like(hit)
    is_sphere_hit = hit & (prim < P)

    # Differentiable winner-t.  Planes first (detached base t_det carries
    # the value for lanes no recompute below touches, i.e. misses).
    t = t_det
    for j in range(M):
        prow = [plane_flat[j * 12 + k] for k in range(6)]
        pt = _plane_t(ox, oy, oz, dx, dy, dz, prow, 0.0)
        t = jnp.where((prim == P + j) & hit, pt, t)
    lx_, ly_, lz_ = ax - ox, ay - oy, az - oz
    tca_e = _dot3(lx_, ly_, lz_, dx, dy, dz)
    d2_e = _dot3(lx_, ly_, lz_, lx_, ly_, lz_) - tca_e * tca_e
    r2_e = srad * srad
    outside = d2_e > r2_e
    thc_e = jnp.where(
        outside,
        0.0,
        jnp.sqrt(jnp.where(outside, 1.0, jnp.maximum(r2_e - d2_e, 1e-12))),
    )
    t = jnp.where(is_sphere_hit, tca_e - thc_e, t)

    if T:
        # Triangle winners: gather v0/e1/e2 through a second one-hot
        # matmul ([16, T] tri_gat), recompute the winner's Möller-
        # Trumbore distance (bit-equal to the fold's _mt_row: same
        # scalars, same op order) and the unit normal (bit-equal to the
        # table's n_unit build) — both differentiable in the vertex
        # leaves via the gather's transpose.
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, R), 0)

        def gather_tri(prim_, hit_):
            onehot = (
                (iota_t == (prim_ - (P + M))) & hit_
            ).astype(jnp.float32)
            g = jax.lax.dot_general(
                tri_gat, onehot, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            return tuple(g[v : v + 1] for v in range(9))

        (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = per_group(
            gather_tri, prim, hit & is_tri, n_out=9
        )
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = pvx * e1x + pvy * e1y + pvz * e1z
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        t = jnp.where(is_tri & hit, tt, t)
        # Unit normal (n_unit table expression; backward-safe clamp).
        ncx = e1y * e2z - e1z * e2y
        ncy = e1z * e2x - e1x * e2z
        ncz = e1x * e2y - e1y * e2x
        nnq = jnp.maximum(
            _dot3(ncx, ncy, ncz, ncx, ncy, ncz), 1e-30
        )
        nnorm = jnp.maximum(jnp.sqrt(nnq), 1e-20)
        ax = jnp.where(is_tri, ncx / nnorm, ax)
        ay = jnp.where(is_tri, ncy / nnorm, ay)
        az = jnp.where(is_tri, ncz / nnorm, az)

    # Plane-winner material/normal rows (scalar selects, differentiable
    # w.r.t. the plane scalars).
    for j in range(M):
        m = prim == P + j
        cr = jnp.where(m, plane_flat[j * 12 + 6], cr)
        cg = jnp.where(m, plane_flat[j * 12 + 7], cg)
        cb = jnp.where(m, plane_flat[j * 12 + 8], cb)
        il = jnp.where(m, plane_flat[j * 12 + 9], il)
        param = jnp.where(m, plane_flat[j * 12 + 10], param)
        kind = jnp.where(m, plane_flat[j * 12 + 11], kind)
        ax = jnp.where(m, plane_flat[j * 12 + 3], ax)
        ay = jnp.where(m, plane_flat[j * 12 + 4], ay)
        az = jnp.where(m, plane_flat[j * 12 + 5], az)

    # Hit point + normal (sphere: normalize(point - center); plane: the
    # stored normal).  The extra max(sq, 1e-30) inside the sqrt is a
    # backward-only NaN guard (0-cotangent x sqrt'(0) = NaN): for real
    # sphere winners sq ~ r^2 >> 1e-30 so the primal is bit-identical,
    # and degenerate lanes are dead/masked.
    t_safe = jnp.where(hit, t, 0.0)
    hx = ox + dx * t_safe
    hy = oy + dy * t_safe
    hz = oz + dz * t_safe
    # Divide form (normalize_safe's op sequence, matching the forward
    # kernel bit-for-bit); the inner max is a backward-only NaN guard.
    use_aux = is_plane | is_tri if T else is_plane
    sx, sy, sz = hx - ax, hy - ay, hz - az
    sq = _dot3(sx, sy, sz, sx, sy, sz)
    nrm = jnp.maximum(jnp.sqrt(jnp.maximum(sq, 1e-30)), 1e-20)
    nx = jnp.where(use_aux, ax, sx / nrm)
    ny = jnp.where(use_aux, ay, sy / nrm)
    nz = jnp.where(use_aux, az, sz / nrm)

    # Emission pickup (NEE rule: specular chains + planes).
    take = (prev_spec != 0) | is_plane
    emit = jnp.where(take, il, 0.0)
    contrib_r = emit * cr * th_r
    contrib_g = emit * cg * th_g
    contrib_b = emit * cb * th_b

    # BRDF sampling with detached uniforms.
    ndx, ndy, ndz = _cosine_hemisphere(nx, ny, nz, u1, u2)
    is_spec = jnp.zeros_like(prim, jnp.bool_)
    if has_glossy:
        ia = _dot3(dx, dy, dz, nx, ny, nz)
        gx = dx - 2.0 * ia * nx
        gy = dy - 2.0 * ia * ny
        gz = dz - 2.0 * ia * nz
        is_g = kind == np.float32(BRDF_GLOSSY)
        ndx = jnp.where(is_g, gx, ndx)
        ndy = jnp.where(is_g, gy, ndy)
        ndz = jnp.where(is_g, gz, ndz)
        is_spec = is_spec | is_g
    if has_diel:
        cos_i0 = -_dot3(dx, dy, dz, nx, ny, nz)
        inside = cos_i0 < 0.0
        fnx = jnp.where(inside, -nx, nx)
        fny = jnp.where(inside, -ny, ny)
        fnz = jnp.where(inside, -nz, nz)
        aci = jnp.abs(cos_i0)
        # Backward-only guard: non-dielectric lanes gather param = 0 (or
        # a matte brdf_param), making 1/ior inf and poisoning the vjp's
        # Jacobian even under zero cotangents.  Dielectric lanes keep
        # their exact param, so the primal is bit-identical where used.
        is_d = kind == np.float32(BRDF_DIELECTRIC)
        ior = jnp.where(is_d, jnp.maximum(param, 1e-6), 1.0)
        eta = jnp.where(inside, ior, 1.0 / ior)
        sin2 = eta * eta * jnp.maximum(1.0 - aci * aci, 0.0)
        tir = sin2 > 1.0
        cos_t = jnp.where(
            tir,
            0.0,
            jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(1.0 - sin2, 1e-12))),
        )
        r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
        fres = r0 + (1.0 - r0) * (1.0 - aci) ** 5
        f_refl = jnp.where(tir, 1.0, fres)
        ia2 = _dot3(dx, dy, dz, fnx, fny, fnz)
        rx = dx - 2.0 * ia2 * fnx
        ry = dy - 2.0 * ia2 * fny
        rz = dz - 2.0 * ia2 * fnz
        k2 = eta * aci - cos_t
        tx = eta * dx + k2 * fnx
        ty = eta * dy + k2 * fny
        tz = eta * dz + k2 * fnz
        # max inside the sqrt: backward NaN guard, primal-identical for
        # any non-degenerate refraction vector (see normal above).
        tq = jnp.maximum(
            jnp.sqrt(jnp.maximum(_dot3(tx, ty, tz, tx, ty, tz), 1e-30)),
            1e-20,
        )
        take_r = u3 < f_refl
        ddx = jnp.where(take_r, rx, tx / tq)
        ddy = jnp.where(take_r, ry, ty / tq)
        ddz = jnp.where(take_r, rz, tz / tq)
        is_d = kind == np.float32(BRDF_DIELECTRIC)
        ndx = jnp.where(is_d, ddx, ndx)
        ndy = jnp.where(is_d, ddy, ndy)
        ndz = jnp.where(is_d, ddz, ndz)
        is_spec = is_spec | is_d

    if L:
        k = jnp.clip(
            jnp.floor(us0 * np.float32(L)), 0.0, np.float32(L - 1)
        ).astype(jnp.int32)
        zero = jnp.zeros_like(ox)
        n_sel = 15 if T else 9
        sel = [zero for _ in range(n_sel)]
        for j in range(L):
            m = k == j
            for c in range(n_sel):
                sel[c] = jnp.where(m, light_flat[j * 15 + c], sel[c])
        (lkind, _lgif, ler, leg, leb, lx, ly, lz, lrad) = sel[:9]
        bxs, bys, bzs, solid_angle = _cone_sample(
            lx, ly, lz, lrad, hx, hy, hz, us1, us2
        )
        if T:
            # Triangle-area branch (the forward kernel's exact ops;
            # selection masks detached, geometry differentiable).
            (le1x, le1y, le1z, le2x, le2y, le2z) = sel[9:15]
            ncx = le1y * le2z - le1z * le2y
            ncy = le1z * le2x - le1x * le2z
            ncz = le1x * le2y - le1y * le2x
            nq = jnp.maximum(
                ncx * ncx + ncy * ncy + ncz * ncz, 1e-30
            )
            n_norm_s = jnp.sqrt(jnp.maximum(nq, 1e-20))
            nux = ncx / n_norm_s
            nuy = ncy / n_norm_s
            nuz = ncz / n_norm_s
            area = 0.5 * n_norm_s
            r1s = jnp.sqrt(jnp.maximum(us1, 1e-12))
            bu = 1.0 - r1s
            bv = us2 * r1s
            qx = lx + le1x * bu + le2x * bv
            qy = ly + le1y * bu + le2y * bv
            qz = lz + le1z * bu + le2z * bv
            tqx, tqy, tqz = qx - hx, qy - hy, qz - hz
            d2q = jnp.maximum(
                _dot3(tqx, tqy, tqz, tqx, tqy, tqz), 1e-12
            )
            sdq = jnp.sqrt(d2q)
            btx, bty, btz = tqx / sdq, tqy / sdq, tqz / sdq
            cos_l = -_dot3(btx, bty, btz, nux, nuy, nuz)
            min_d2 = np.float32((2.0 * EPSILON) ** 2)
            ip_t = jnp.where(
                (cos_l > 1e-6) & (d2q >= min_d2),
                area * cos_l / d2q,
                0.0,
            )
            is_tl = lkind != 0.0
            bx = jnp.where(is_tl, btx, bxs)
            by = jnp.where(is_tl, bty, bys)
            bz = jnp.where(is_tl, btz, bzs)
            inv_pdf_dir = jnp.where(is_tl, ip_t, solid_angle)
            t_l_s = _sphere_t_single(
                hx, hy, hz, bx, by, bz, lx, ly, lz, lrad
            )
            # t_l only feeds the detached visibility mask; a closed MT
            # recompute keeps the primal bit-equal to the forward.
            tvx2, tvy2, tvz2 = hx - lx, hy - ly, hz - lz
            pv2x = by * le2z - bz * le2y
            pv2y = bz * le2x - bx * le2z
            pv2z = bx * le2y - by * le2x
            det2 = pv2x * le1x + pv2y * le1y + pv2z * le1z
            inv_det2 = 1.0 / jnp.where(
                jnp.abs(det2) < 1e-30, 1e-30, det2
            )
            u2t = (tvx2 * pv2x + tvy2 * pv2y + tvz2 * pv2z) * inv_det2
            qv2x = tvy2 * le1z - tvz2 * le1y
            qv2y = tvz2 * le1x - tvx2 * le1z
            qv2z = tvx2 * le1y - tvy2 * le1x
            v2t = (bx * qv2x + by * qv2y + bz * qv2z) * inv_det2
            tt2 = (le2x * qv2x + le2y * qv2y + le2z * qv2z) * inv_det2
            en_l = np.float32(1e-6) * jnp.sqrt(nq)
            miss2 = (
                (det2 <= en_l)
                | (u2t < 0.0)
                | (v2t < 0.0)
                | (u2t + v2t > 1.0)
                | (tt2 < EPSILON)
            )
            t_l_t = jnp.where(miss2, INFINITE, tt2)
            t_l = jnp.where(is_tl, t_l_t, t_l_s)
            inv_pdf = jnp.where(
                inv_pdf_dir > 1e-9, inv_pdf_dir * np.float32(L), 0.0
            )
        else:
            bx, by, bz = bxs, bys, bzs
            inv_pdf = jnp.where(
                solid_angle > 1e-9, solid_angle * np.float32(L), 0.0
            )
            t_l = _sphere_t_single(
                hx, hy, hz, bx, by, bz, lx, ly, lz, lrad
            )
        # `occ` (fold + plane shadow tests) is a stored residual.
        visible = (occ == 0) & (t_l < INFINITE)
        cos_i = _dot3(bx, by, bz, nx, ny, nz)
        is_matte = kind == np.float32(BRDF_MATTE)
        w = visible & is_matte & (cos_i > 0.0)
        scale = jnp.where(w, cos_i * inv_pdf * INV_PI, 0.0)
        contrib_r = contrib_r + th_r * cr * ler * scale
        contrib_g = contrib_g + th_g * cg * leg * scale
        contrib_b = contrib_b + th_b * cb * leb * scale
    else:
        bx = by = bz = jnp.zeros_like(ox)
        t_l = jnp.full_like(ox, INFINITE)

    # masked_step semantics inside the differentiated function.
    sel = lambda old, new: jnp.where(dead, old, new)
    outs = (
        sel(ox, hx), sel(oy, hy), sel(oz, hz),
        sel(dx, ndx), sel(dy, ndy), sel(dz, ndz),
        jnp.where(dead, 0.0, th_r * cr),
        jnp.where(dead, 0.0, th_g * cg),
        jnp.where(dead, 0.0, th_b * cb),
        jnp.where(dead, 0.0, contrib_r),
        jnp.where(dead, 0.0, contrib_g),
        jnp.where(dead, 0.0, contrib_b),
    )
    if not want_aux:
        return outs
    aux = (hx, hy, hz, ndx, ndy, ndz, bx, by, bz, t_l, is_spec)
    return outs, aux


def _nee_bwd_kernel(
    geom_ref,    # SMEM [P, 4] — the detached replay fold
    gatT_ref,    # VMEM [16, P+T]
    plane_ref,   # SMEM [M?, 12]
    tri_ref,     # SMEM [T?, 10] — the detached replay MT stream
    tri_gat_ref,  # VMEM [16, T?] — v0/e1/e2 winner gather (cotangents)
    light_ref,   # SMEM [L?, 15]
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    ra_ref, rb_ref, rc_ref, rctr_ref,
    gr_ref, gg_ref, gb_ref,
    *refs,
    # refs: [gr_prim x spp*B, gr_flag x spp*B when fold_residuals]
    #       dgat dplane dtri dlight dox doy doz ddx ddy ddz | stf sti
    spp, num_bounces, P, M, T, L, has_glossy, has_diel, unroll,
    fold_residuals=False,
):
    gr_prim_refs = gr_flag_refs = None
    if fold_residuals:
        # Round 5: per-(sample, bounce) residuals — the backward replay
        # runs ZERO folds at any spp (the sample loop is python-unrolled
        # so residual indices stay static).
        n_gr = spp * num_bounces
        gr_prim_refs = refs[:n_gr]
        gr_flag_refs = refs[n_gr : 2 * n_gr]
        refs = refs[2 * n_gr :]
    (dgat_ref,    # VMEM [16, P+T] — accumulated across the grid
     dplane_ref,  # SMEM [M?, 12] — accumulated
     dtri_ref,    # VMEM [16, T?] — accumulated
     dlight_ref,  # SMEM [L?, 15] — accumulated
     dox_ref, doy_ref, doz_ref, ddx_ref, ddy_ref, ddz_ref,
     stf,         # VMEM scratch (B, _STF_PLANES, 8, R) f32
     sti,         # VMEM scratch (B, _STI_PLANES, 8, R) i32
     ) = refs
    gatT = gatT_ref[:, :]
    tri_gat = tri_gat_ref[:, :]
    plane_flat = tuple(
        plane_ref[j, k] for j in range(M) for k in range(12)
    )
    light_flat = tuple(
        light_ref[j, k] for j in range(L) for k in range(15)
    )

    pox, poy, poz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
    pdx, pdy, pdz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
    g_r, g_g, g_b = gr_ref[:, :], gg_ref[:, :], gb_ref[:, :]
    shape = pox.shape
    zeros = jnp.zeros(shape, jnp.float32)
    ones = jnp.ones(shape, jnp.float32)
    iones = jnp.ones(shape, jnp.int32)

    if fold_residuals:
        # The forward already recorded every bounce's winner + flags
        # (grad_residuals mode): no fold — primary included — runs here.
        t0 = prim0 = None
    else:
        # Primary nearest-hit (eps = 0): detached, shared by every
        # sample — the forward kernel's own spp-invariant hoist.
        t0, prim0, _ = _sphere_fold(
            geom_ref, P, unroll, pox, poy, poz, pdx, pdy, pdz,
            np.float32(0.0),
        )
        t0, prim0 = _merge_planes_ref(
            plane_ref, M, P, t0, prim0, pox, poy, poz, pdx, pdy, pdz, 0.0
        )
        if T:
            t0, prim0, _ = _merge_tris_ref(
                tri_ref, T, P + M, t0, prim0,
                pox, poy, poz, pdx, pdy, pdz, 0.0,
            )

    core = functools.partial(
        _continuous_bounce,
        P=P, M=M, T=T, L=L, has_glossy=has_glossy, has_diel=has_diel,
    )

    def one_sample(s, carry):
        # `s` is the STATIC python sample index in fold_residuals mode
        # (residual-ref indexing); a traced fori_loop index otherwise
        # (unused except as a loop counter).
        (ra, rb, rc, rctr, d_gat, d_plane, d_tri, d_light,
         adox, adoy, adoz, addx, addy, addz) = carry

        # ---- forward replay, storing residuals in VMEM scratch ----
        o3 = (pox, poy, poz)
        d3 = (pdx, pdy, pdz)
        th3 = (ones, ones, ones)
        prev_spec = iones
        if fold_residuals:
            t = prim = None  # read per bounce from the residual refs
        else:
            t, prim = t0, prim0
        izeros = jnp.zeros(shape, jnp.int32)
        for b in range(num_bounces):
            occ_in = None
            if fold_residuals:
                prim = gr_prim_refs[s * num_bounces + b][:, :]
                flags = gr_flag_refs[s * num_bounces + b][:, :]
                occ_in = flags & 1
                # flags bit1 = hit: synthesize the t the masks need (every
                # hit lane's t is re-derived differentiably in the core).
                t = jnp.where((flags >> 1) == 1, 0.0, INFINITE)
            for i in range(3):
                stf[b, i] = o3[i]
                stf[b, 3 + i] = d3[i]
                stf[b, 6 + i] = th3[i]
            stf[b, 9] = t
            sti[b, 0] = prim
            sti[b, 2] = prev_spec
            q = th3[0] * th3[0] + th3[1] * th3[1] + th3[2] * th3[2]
            dead = (q <= NEAR_ZERO_EPS) | ~(t < INFINITE)

            def live_replay(args, dead=dead, b=b, occ_in=occ_in):
                (o3, d3, th3, t, prim, prev_spec,
                 ra, rb, rc, rctr) = args
                u1, u2, u3, rng_a = _draw3((ra, rb, rc, rctr))
                us0, us1, us2, (ra2, rb2, rc2, rctr2) = _draw3(rng_a)
                outs, aux = core(
                    gatT, plane_flat, tri_gat, light_flat, *o3, *d3, *th3,
                    t_det=t, prim=prim, prev_spec=prev_spec, dead=dead,
                    u1=u1, u2=u2, u3=u3, us0=us0, us1=us1, us2=us2,
                    occ=izeros, want_aux=True,
                )
                (hx, hy, hz, ndx, ndy, ndz,
                 bx, by, bz, t_l, is_spec) = aux
                if fold_residuals:
                    # No folds: the next bounce's (t, prim) come from the
                    # residual refs; only the occlusion word is needed.
                    t2, prim2, occ = t, prim, occ_in
                elif L:
                    lgif = jnp.zeros(shape, jnp.float32)
                    k = jnp.clip(
                        jnp.floor(us0 * np.float32(L)),
                        0.0,
                        np.float32(L - 1),
                    ).astype(jnp.int32)
                    for j in range(L):
                        lgif = jnp.where(k == j, light_ref[j, 1], lgif)
                    lgi = lgif.astype(jnp.int32)
                    t2, prim2, occ = _sphere_fold(
                        geom_ref, P, unroll, hx, hy, hz, ndx, ndy, ndz,
                        EPSILON, bx, by, bz, t_l, lgi,
                    )
                else:
                    lgi = None
                    t2, prim2, occ = _sphere_fold(
                        geom_ref, P, unroll, hx, hy, hz, ndx, ndy, ndz,
                        EPSILON,
                    )
                if not fold_residuals:
                    t2, prim2 = _merge_planes_ref(
                        plane_ref, M, P, t2, prim2, hx, hy, hz,
                        ndx, ndy, ndz, EPSILON,
                    )
                    if T and L:
                        t2, prim2, occ = _merge_tris_ref(
                            tri_ref, T, P + M, t2, prim2,
                            hx, hy, hz, ndx, ndy, ndz, EPSILON,
                            bx, by, bz, t_l, lgi, occ,
                        )
                    elif T:
                        t2, prim2, _ = _merge_tris_ref(
                            tri_ref, T, P + M, t2, prim2,
                            hx, hy, hz, ndx, ndy, ndz, EPSILON,
                        )
                    if L:
                        for j in range(M):
                            prow = [plane_ref[j, kk] for kk in range(6)]
                            pd = _plane_t(
                                hx, hy, hz, bx, by, bz, prow, 0.0
                            )
                            occ = occ | (
                                (pd >= EPSILON) & (pd < t_l)
                            ).astype(jnp.int32)
                return (
                    outs[0:3], outs[3:6], outs[6:9],
                    jnp.where(dead, t, t2),
                    jnp.where(dead, prim, prim2),
                    jnp.where(
                        dead, prev_spec, is_spec.astype(jnp.int32)
                    ),
                    jnp.where(dead, ra, ra2),
                    jnp.where(dead, rb, rb2),
                    jnp.where(dead, rc, rc2),
                    jnp.where(dead, rctr, rctr2),
                    occ, u1, u2, u3, us0, us1, us2,
                )

            def dead_replay(args):
                # All lanes dead: no draws, no fold, state unchanged;
                # uniform residuals are zeros the reverse never reads
                # (its own all-dead skip fires on the same mask).
                zf = jnp.zeros(shape, jnp.float32)
                return (*args, izeros, zf, zf, zf, zf, zf, zf)

            # Whole-bounce skip: on config-4-class scenes 42% of lanes
            # die at the primary and paths die fast; a dead block pays
            # neither the 1000-sphere dual fold nor the glue.  At large P
            # the scalar any() sync amortizes against the fold (the
            # PERF.md small-P negative result does not apply).
            (o3, d3, th3, t, prim, prev_spec, ra, rb, rc, rctr,
             occ, u1, u2, u3, us0, us1, us2) = jax.lax.cond(
                jnp.any(~dead), live_replay, dead_replay,
                (o3, d3, th3, t, prim, prev_spec, ra, rb, rc, rctr),
            )
            stf[b, 10], stf[b, 11], stf[b, 12] = u1, u2, u3
            stf[b, 13], stf[b, 14], stf[b, 15] = us0, us1, us2
            sti[b, 1] = occ

        # ---- reverse sweep ----
        c_o = (zeros, zeros, zeros)
        c_d = (zeros, zeros, zeros)
        c_t = (zeros, zeros, zeros)
        for i in range(num_bounces):
            b = num_bounces - 1 - i
            o_b = tuple(stf[b, j] for j in range(3))
            d_b = tuple(stf[b, 3 + j] for j in range(3))
            th_b = tuple(stf[b, 6 + j] for j in range(3))
            t_b = stf[b, 9]
            u_b = tuple(stf[b, 10 + j] for j in range(3))
            us_b = tuple(stf[b, 13 + j] for j in range(3))
            prim_b, occ_b, ps_b = sti[b, 0], sti[b, 1], sti[b, 2]
            q = th_b[0] ** 2 + th_b[1] ** 2 + th_b[2] ** 2
            dead_b = (q <= NEAR_ZERO_EPS) | ~(t_b < INFINITE)

            def live_rev(args, dead_b=dead_b, t_b=t_b, prim_b=prim_b,
                         ps_b=ps_b, occ_b=occ_b, u_b=u_b, us_b=us_b,
                         o_b=o_b, d_b=d_b, th_b=th_b):
                (c_o, c_d, c_t, d_gat, d_plane, d_tri,
                 d_light) = args

                def f(gat, pfl, tg, lfl, a1, a2, a3, b1, b2, b3,
                      c1, c2, c3):
                    return core(
                        gat, pfl, tg, lfl, a1, a2, a3, b1, b2, b3,
                        c1, c2, c3,
                        t_det=t_b, prim=prim_b, prev_spec=ps_b,
                        dead=dead_b,
                        u1=u_b[0], u2=u_b[1], u3=u_b[2],
                        us0=us_b[0], us1=us_b[1], us2=us_b[2],
                        occ=occ_b, want_aux=False,
                    )

                _, vjp_fn = jax.vjp(
                    f, gatT, plane_flat, tri_gat, light_flat,
                    *o_b, *d_b, *th_b
                )
                cts = c_o + c_d + c_t + (g_r, g_g, g_b)
                (dgat_b, dpl_b, dtg_b, dli_b,
                 do1, do2, do3, dd1, dd2, dd3, dt1, dt2, dt3) = vjp_fn(
                    cts
                )
                return (
                    (do1, do2, do3), (dd1, dd2, dd3), (dt1, dt2, dt3),
                    d_gat + dgat_b,
                    tuple(a + bb for a, bb in zip(d_plane, dpl_b)),
                    d_tri + dtg_b,
                    tuple(a + bb for a, bb in zip(d_light, dli_b)),
                )

            def dead_rev(args):
                # All-dead bounce: origin/direction cotangents pass
                # through, throughput's are killed (d th_out / d th_in
                # is the dead-mask zero), tables receive nothing.
                (c_o, c_d, c_t, d_gat, d_plane, d_tri,
                 d_light) = args
                return (
                    c_o, c_d, (zeros, zeros, zeros),
                    d_gat, d_plane, d_tri, d_light,
                )

            (c_o, c_d, c_t, d_gat, d_plane, d_tri,
             d_light) = jax.lax.cond(
                jnp.any(~dead_b), live_rev, dead_rev,
                (c_o, c_d, c_t, d_gat, d_plane, d_tri, d_light),
            )

        return (
            ra, rb, rc, rctr, d_gat, d_plane, d_tri, d_light,
            adox + c_o[0], adoy + c_o[1], adoz + c_o[2],
            addx + c_d[0], addy + c_d[1], addz + c_d[2],
        )

    carry0 = (
        ra_ref[:, :], rb_ref[:, :], rc_ref[:, :], rctr_ref[:, :],
        jnp.zeros(gatT.shape, jnp.float32),
        tuple(jnp.zeros((), jnp.float32) for _ in range(M * 12)),
        jnp.zeros(tri_gat.shape, jnp.float32),
        tuple(jnp.zeros((), jnp.float32) for _ in range(L * 15)),
        zeros, zeros, zeros, zeros, zeros, zeros,
    )
    if fold_residuals:
        # Static residual indices need a python sample loop.
        carry = carry0
        for s in range(spp):
            carry = one_sample(s, carry)
    else:
        carry = jax.lax.fori_loop(0, spp, one_sample, carry0)
    (_, _, _, _, d_gat, d_plane, d_tri, d_light,
     adox, adoy, adoz, addx, addy, addz) = carry

    dox_ref[:, :] = adox
    doy_ref[:, :] = adoy
    doz_ref[:, :] = adoz
    ddx_ref[:, :] = addx
    ddy_ref[:, :] = addy
    ddz_ref[:, :] = addz

    # Table cotangents accumulate across the sequential grid programs in
    # the revisited output blocks (constant index_map).
    @pl.when(pl.program_id(0) == 0)
    def _():
        dgat_ref[:, :] = jnp.zeros(gatT.shape, jnp.float32)
        dtri_ref[:, :] = jnp.zeros(tri_gat.shape, jnp.float32)
        # max(., 1): M == 0 / L == 0 use a dummy [1, .] table whose
        # cotangent row must still be defined (it is discarded upstream).
        for j in range(max(M, 1)):
            for k in range(12):
                dplane_ref[j, k] = 0.0
        for j in range(max(L, 1)):
            for k in range(15):
                dlight_ref[j, k] = 0.0

    dgat_ref[:, :] = dgat_ref[:, :] + d_gat
    dtri_ref[:, :] = dtri_ref[:, :] + d_tri
    for j in range(M):
        for k in range(12):
            dplane_ref[j, k] = dplane_ref[j, k] + d_plane[j * 12 + k]
    for j in range(L):
        for k in range(15):
            dlight_ref[j, k] = dlight_ref[j, k] + d_light[j * 15 + k]


def _nee_bwd_call(
    gatT, plane_tab, tri_tab, light_tab, ray_o, ray_d, rng_state, g_rad,
    *, spp, num_bounces, P, M, T, L, has_glossy, has_diel, block_r,
    unroll, interpret, gr=None,
):
    shape = rng_state.shape[:-1]
    n = int(np.prod(shape))
    geom = jnp.stack(
        [gatT[4, :P], gatT[5, :P], gatT[6, :P],
         gatT[9, :P] * gatT[9, :P]], axis=-1
    )  # detached replay fold table — bit-equal to _nee_scene_tables'
    # [16, T] winner-vertex gather table (rows v0/e1/e2 from tri_tab).
    tri_gat = jnp.concatenate(
        [tri_tab[:, :9].T,
         jnp.zeros((7, tri_tab.shape[0]), jnp.float32)], axis=0
    )

    blocks = -(-n // (8 * block_r))
    pad_n = blocks * 8 * block_r
    pad = pad_n - n
    cols = pad_n // 8

    def plane2d(f, fill=0):
        f = jnp.concatenate([f, jnp.full((pad,), fill, f.dtype)])
        return f.reshape(8, cols)

    flat_ins = (
        [ray_o.reshape(-1, 3)[:, i] for i in range(3)]
        + [ray_d.reshape(-1, 3)[:, i] for i in range(3)]
        + [rng_state.reshape(-1, 4)[:, i] for i in range(4)]
        + [g_rad.reshape(-1, 3)[:, i] for i in range(3)]
    )
    if gr is not None:
        # Forward-recorded per-bounce winners + flags: padding lanes get
        # flags = 0 (miss -> dead) so they never run.
        prims, flags = gr
        flat_ins += [p.reshape(-1) for p in prims]
        flat_ins += [f.reshape(-1) for f in flags]
    # Padding lanes: direction 0 makes the primary fold miss (tca = 0
    # rejects every sphere; plane denom = 0 rejects) -> dead lanes with
    # zero cotangent contribution.
    comp_ins = [plane2d(f) for f in flat_ins]

    table_spec = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    smem_spec = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    col_spec = pl.BlockSpec(
        (8, block_r), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    kernel = functools.partial(
        _nee_bwd_kernel,
        spp=spp, num_bounces=num_bounces, P=P, M=M, T=T, L=L,
        has_glossy=has_glossy, has_diel=has_diel, unroll=unroll,
        fold_residuals=gr is not None,
    )
    out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[
            smem_spec(geom),
            table_spec(gatT),
            smem_spec(plane_tab),
            smem_spec(tri_tab),
            table_spec(tri_gat),
            smem_spec(light_tab),
        ]
        + [col_spec] * len(comp_ins),
        out_specs=[
            table_spec(gatT),
            smem_spec(plane_tab),
            table_spec(tri_gat),
            smem_spec(light_tab),
        ]
        + [col_spec] * 6,
        out_shape=(
            [jax.ShapeDtypeStruct(gatT.shape, jnp.float32)]
            + [jax.ShapeDtypeStruct(plane_tab.shape, jnp.float32)]
            + [jax.ShapeDtypeStruct(tri_gat.shape, jnp.float32)]
            + [jax.ShapeDtypeStruct(light_tab.shape, jnp.float32)]
            + [jax.ShapeDtypeStruct((8, cols), jnp.float32)] * 6
        ),
        scratch_shapes=[
            pltpu.VMEM((num_bounces, _STF_PLANES, 8, block_r), jnp.float32),
            pltpu.VMEM((num_bounces, _STI_PLANES, 8, block_r), jnp.int32),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )(geom, gatT, plane_tab, tri_tab, tri_gat, light_tab, *comp_ins)

    d_gat, d_plane, d_tri_gat, d_light = out[0], out[1], out[2], out[3]
    # tri_gat cotangents map linearly back onto tri_tab rows 0..8.
    d_tri_tab = jnp.concatenate(
        [d_tri_gat[:9].T,
         jnp.zeros((tri_tab.shape[0], 1), jnp.float32)], axis=-1
    )
    flats = [a.reshape(-1)[:n] for a in out[4:10]]
    d_ray_o = jnp.stack(flats[0:3], axis=-1).reshape(ray_o.shape)
    d_ray_d = jnp.stack(flats[3:6], axis=-1).reshape(ray_d.shape)
    return d_gat, d_plane, d_tri_tab, d_light, d_ray_o, d_ray_d


@functools.lru_cache(maxsize=64)
def _make_nee_diff_fn(
    spp, num_bounces, P, M, T, L, has_glossy, has_diel, block_r,
    bwd_block_r, unroll, interpret,
):
    """Build (and cache) the custom-VJP fused NEE trace for one static
    config, at the table level."""

    def _geom(gatT):
        return jnp.stack(
            [gatT[4, :P], gatT[5, :P], gatT[6, :P],
             gatT[9, :P] * gatT[9, :P]], axis=-1
        )

    def _fwd_only(gatT, plane_tab, tri_tab, light_tab, ray_o, ray_d,
                  rng_state):
        return _trace_nee_from_tables(
            _geom(gatT), gatT, plane_tab, tri_tab,
            jnp.zeros((1, 6), jnp.float32),
            light_tab, ray_o, ray_d, rng_state,
            num_spheres=P, num_planes=M, num_tris=T, num_boxes=0,
            num_lights=L,
            has_glossy=has_glossy, has_diel=has_diel,
            num_bounces=num_bounces, spp=spp, block_r=block_r,
            interpret=interpret,
        )

    @jax.custom_vjp
    def f(gatT, plane_tab, tri_tab, light_tab, ray_o, ray_d, rng_state):
        return _fwd_only(gatT, plane_tab, tri_tab, light_tab, ray_o,
                         ray_d, rng_state)

    def fwd(gatT, plane_tab, tri_tab, light_tab, ray_o, ray_d, rng_state):
        if 2 * spp * num_bounces <= MAX_RESIDUAL_PLANES:
            # Gradient-mode forward additionally records each (sample,
            # bounce)'s fold outcome (winner index; occlusion+hit flags)
            # so the backward replay can skip every fold — round 5
            # extended this beyond spp == 1 (the forward runs the legacy
            # discipline, whose (sample, bounce) indices are static, so
            # spp > 1 gradients no longer re-pay the primary fold and a
            # kernel launch per sample).  Radiance/rng are bit-equal to
            # the plain forward on raster-order layouts (tested).
            rad, rng_out, gr = _trace_nee_from_tables(
                _geom(gatT), gatT, plane_tab, tri_tab,
                jnp.zeros((1, 6), jnp.float32),
                light_tab, ray_o, ray_d, rng_state,
                num_spheres=P, num_planes=M, num_tris=T, num_boxes=0,
                num_lights=L,
                has_glossy=has_glossy, has_diel=has_diel,
                num_bounces=num_bounces, spp=spp, block_r=block_r,
                interpret=interpret, grad_residuals=True,
            )
            return (rad, rng_out), (
                gatT, plane_tab, tri_tab, light_tab, ray_o, ray_d,
                rng_state, gr
            )
        out = _fwd_only(gatT, plane_tab, tri_tab, light_tab, ray_o,
                        ray_d, rng_state)
        return out, (
            gatT, plane_tab, tri_tab, light_tab, ray_o, ray_d,
            rng_state, None
        )

    def bwd(res, cts):
        (gatT, plane_tab, tri_tab, light_tab, ray_o, ray_d, rng_state,
         gr) = res
        g_rad, _g_rng = cts  # rng_out is u32: float0 cotangent, unused
        d_gat, d_pl, d_tri, d_li, d_ray_o, d_ray_d = _nee_bwd_call(
            gatT, plane_tab, tri_tab, light_tab, ray_o, ray_d,
            rng_state, g_rad,
            spp=spp, num_bounces=num_bounces, P=P, M=M, T=T, L=L,
            has_glossy=has_glossy, has_diel=has_diel,
            block_r=bwd_block_r, unroll=unroll, interpret=interpret,
            gr=gr,
        )
        d_rng = np.zeros(rng_state.shape, jax.dtypes.float0)
        return d_gat, d_pl, d_tri, d_li, d_ray_o, d_ray_d, d_rng

    f.defvjp(fwd, bwd)
    return f


def trace_physical_nee_pallas_diff(
    scene,
    rays,
    rng_state: jnp.ndarray,
    num_bounces: int = 8,
    spp: int = 1,
    light_idx: tuple | None = None,
    kinds=None,
    block_r: int = DEFAULT_BLOCK_R,
    bwd_block_r: int = 256,  # 256 vs 128 measured 25.5 vs 26.2 ms/step
    unroll: int = 32,
    interpret: bool = False,
    sorted_lanes: bool | None = None,
):
    """Differentiable fused NEE trace: (radiance_sum [H, W, 3], rng_out
    [H, W, 4]) with gradients w.r.t. every continuous sphere/plane/
    triangle leaf (round 5: triangle vertices through the [16, T]
    winner-vertex gather and the area-light sampling term) and the
    primary rays.  Forward = the production fused megakernel
    (presort + regeneration included); backward = the in-VMEM replay +
    reverse sweep (`_nee_bwd_kernel`).  The RNG state is a detached
    constant of the gradient, exactly as in diff/grad.py."""
    from .pallas_nee import scene_light_indices
    from ..render.nee import _present_kinds

    if light_idx is None:
        light_idx = scene_light_indices(scene)
        assert light_idx is not None, (
            "traced scene: pass light_idx (scene_light_indices) from "
            "outside jit"
        )
    if kinds is None:
        kinds = _present_kinds(scene)
    has_glossy = kinds is None or BRDF_GLOSSY in kinds
    has_diel = kinds is None or BRDF_DIELECTRIC in kinds

    assert scene.boxes.count == 0, "boxes take diff/grad.py's XLA path"
    geom, gatT, plane_tab, tri_tab, _box_tab, light_tab = (
        _nee_scene_tables(scene, light_idx)
    )
    P = scene.spheres.count
    shape = rng_state.shape[:-1]
    n = int(np.prod(shape))
    if sorted_lanes is None:
        # The sorted gradient frame pays a probe + argsort + 4 gathers
        # per step to make sky-dead lanes block-contiguous, so BOTH
        # kernels' whole-block dead skips fire (fwd legacy discipline +
        # bwd replay/reverse).  Worth it where the fold dominates and
        # the fixed permute cost amortizes over lane-samples: measured
        # at 1080p/spp 8/1k spheres 93.5 -> 114.5 Mrays/s (+22%), but a
        # NET LOSS at 512x512/spp 1 (76 -> 52: ~60 ms of permutes on a
        # 28 ms step), hence the lane-sample gate.
        sorted_lanes = P >= 64 and n * spp >= (1 << 22)
    f = _make_nee_diff_fn(
        spp, num_bounces, P, scene.planes.count,
        scene.triangles.count, len(light_idx), has_glossy, has_diel,
        block_r, bwd_block_r, unroll, interpret,
    )
    if not sorted_lanes:
        return f(
            gatT, plane_tab, tri_tab, light_tab, rays.origin,
            rays.direction, rng_state,
        )

    # ---- sorted gradient frame (round 5) ------------------------------
    # The permutation lives entirely OUTSIDE the custom-VJP boundary:
    # rays/rng are depth-sorted into the kernel's block-contiguous
    # layout with differentiable gathers (cotangents route back through
    # their transposes automatically), f runs UNCHANGED on (pad_n,)
    # arrays whose residuals stay sorted end-to-end, and only the
    # rad/rng outputs are unsorted.  Per-pixel results are bit-identical
    # to the unsorted call (block layout is semantically inert; tested).
    from .pallas_nee import primary_probe

    blocks = -(-n // (8 * bwd_block_r))
    pad_n = blocks * 8 * bwd_block_r
    cols = pad_n // 8
    R = bwd_block_r
    t0f, _ = primary_probe(
        jax.lax.stop_gradient(geom), jax.lax.stop_gradient(plane_tab),
        jax.lax.stop_gradient(tri_tab), jnp.zeros((1, 6), jnp.float32),
        jax.lax.stop_gradient(rays.origin),
        jax.lax.stop_gradient(rays.direction),
        num_spheres=P, num_planes=scene.planes.count,
        num_tris=scene.triangles.count, num_boxes=0,
        block_r=bwd_block_r, unroll=unroll, interpret=interpret,
    )
    g = jnp.argsort(t0f).astype(jnp.int32)  # ascending depth, sky last
    # rank(slot): the flat index the kernel's [8, cols] blocking reads
    # at a given rank's block-contiguous position (pallas_nee's presort
    # mapping).
    iota_s = jnp.arange(pad_n, dtype=jnp.int32)
    s_, c_ = iota_s // cols, iota_s % cols
    rank = (c_ // R) * (8 * R) + s_ * R + (c_ % R)
    valid = rank < n
    src = jnp.where(valid, g[jnp.minimum(rank, n - 1)], 0)
    vf = valid[:, None]

    ray6 = jnp.concatenate(
        [rays.origin.reshape(-1, 3), rays.direction.reshape(-1, 3)],
        axis=-1,
    )[src]  # differentiable row gather; transpose = scatter of d_rays
    ray6 = jnp.where(vf, ray6, 0.0)  # pad lanes: dir 0 -> dead
    rng_s = jnp.where(vf, rng_state.reshape(-1, 4)[src], 0)

    rad_s, rng_out_s = f(
        gatT, plane_tab, tri_tab, light_tab,
        ray6[:, 0:3], ray6[:, 3:6], rng_s,
    )
    # Unsort: lane i's result sits at the slot of its rank pos[i].
    pos = jnp.zeros((n,), jnp.int32).at[g].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    j = pos
    inv = ((j % (8 * R)) // R) * cols + (j // (8 * R)) * R + (j % R)
    rad = rad_s[inv].reshape(*shape, 3)
    rng_out = rng_out_s[inv].reshape(*shape, 4)
    return rad, rng_out
