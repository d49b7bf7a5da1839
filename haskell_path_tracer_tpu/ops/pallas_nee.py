"""Pallas TPU megakernel for the physical/NEE integrator.

Round-2 profiling (BASELINE config 4: 1080p / 1000 spheres / NEE) showed
the fused dual-query kernel (`pallas_intersect.sphere_dual_query`) was
only ~40% of the per-bounce cost — the other ~60% was XLA "glue": the
per-bounce material gathers, BRDF sampling, light sampling and HBM
round-trips between fusion boundaries.  This kernel fuses the ENTIRE
physical/NEE bounce loop — primary nearest-hit, per-bounce payload
gather, cosine/specular BRDF sampling, cone light sampling, the dual
(BSDF nearest + shadow occlusion) sphere fold, plane merge and emission
bookkeeping — for ALL samples and ALL bounces of a dispatch, so a ray
block's state never leaves VMEM.  Round 5 added triangles: geometry as
a Möller–Trumbore scalar-SMEM stream folded after spheres/planes
(checkHit's ascending-index tie-break), and triangle area lights in the
NEE half (mixed light table; per-lane area sampling in
render/nee.py:_tri_area_sample's exact op order).

Layout: per-lane state lives in [8, R] tiles (8 independent ray groups
in the sublane dim, so per-lane "glue" math runs at full VPU tile
utilization) and the pairwise ray x sphere work in [P, R] matrices —
one per sublane group — built by VPU broadcast arithmetic (cx [P,1]
against a [1,R] group row).  Measured on v5e at
1M rays x 1024 spheres the dual fold runs at 97.1 Gpairs/s in the exact
(c - o) form used here — above the round-2 scalar-SMEM fold (91.6) —
because the per-sphere loop disappears into full-width vector ops.
Rejected variants, measured: hoisted |c|^2 - 2c.o + |o|^2 saves 13
ops/pair (106.9 G) but its cancellation error (~1e-3 absolute) flips
accept decisions on near-tangent rays and shifts hit points past the
EPSILON offset; MXU matmul dots (84.7 G at K=8) lose outright since the
reconstruction still pays the same elementwise tail.  The one matmul
kept is the per-bounce one-hot payload gather ([16, P] @ [P, R] at
HIGHEST precision — exact for one-hot operands), which replaces the
2M-index XLA gathers that dominated the round-2 glue.

Estimator semantics mirror `render/nee.py:_trace_physical_fused` (same
RNG draw order, same light selection rank rule, same emission rule,
same accept/reject sets and f32 op order in the fold) — the tests
assert lane-for-lane radiance agreement with bit-equal RNG states
against `trace_physical(fused=False)`.

Reference parity anchors: BRDF weights are the *corrected* physical
ones (render/nee.py module docstring), not the reference's admittedly
wrong formulas (/root/reference/src/Scene/Trace.hs:393); the SFC32 RNG
is the reference's (/root/reference/src/Util.hs:114-127); ray-sphere
accept rules are Intersection.hs:39-48 re-derived at an offset origin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.objects import (
    BRDF_DIELECTRIC,
    BRDF_GLOSSY,
    BRDF_MATTE,
    Scene,
)
from .intersect import EPSILON, INFINITE, PLANE_DENOM_EPS

TWO_PI = np.float32(2.0 * np.pi)
INV_PI = np.float32(1.0 / np.pi)
NEAR_ZERO_EPS = np.float32(1e-6)
# Measured on v5e at 512x512 x 1000 spheres x 8spp x 4b (see commit log):
# (block_r, unroll) = (256, 16) -> 115.1 Mrays/s; (512, 8) -> 109;
# (128, 16) -> 104; flat around the optimum (fold-bound).
DEFAULT_BLOCK_R = 256


# --- SFC32 on [1, R] u32 rows (same ops as ops/rng.py:sfc32_next) -------

def _sfc32_next(a, b, c, ctr):
    t = a + b + ctr
    ctr = ctr + jnp.uint32(1)
    a = b ^ (b >> 9)
    b = c + (c << 3)
    c = ((c << 21) | (c >> 11)) + t
    return t, a, b, c, ctr


def _uniform01(a, b, c, ctr):
    bits, a, b, c, ctr = _sfc32_next(a, b, c, ctr)
    # Mosaic lacks u32 -> f32; bits >> 8 < 2^24 so the i32 hop is exact.
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32)
    return u * np.float32(1.0 / (1 << 24)), a, b, c, ctr


def _draw3(rng):
    """Three sequential SFC32 uniforms in [0, 1) — the value gen_vec's
    [-1,1] output maps back to under (v+1)*0.5 (exact in fp)."""
    a, b, c, ctr = rng
    u1, a, b, c, ctr = _uniform01(a, b, c, ctr)
    u2, a, b, c, ctr = _uniform01(a, b, c, ctr)
    u3, a, b, c, ctr = _uniform01(a, b, c, ctr)
    return u1, u2, u3, (a, b, c, ctr)


# --- small vector helpers on ([1,R],)*3 triples -------------------------

def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _onb(wx, wy, wz):
    """Branchless ONB (render/nee.py:_orthonormal_basis, Duff et al.)."""
    sign = jnp.where(wz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + wz)
    b = wx * wy * a
    b1 = (1.0 + sign * wx * wx * a, sign * b, -sign * wx)
    b2 = (b, sign + wy * wy * a, -wy)
    return b1, b2


def _cosine_hemisphere(nx, ny, nz, u1, u2):
    """render/nee.py:sample_cosine_hemisphere on rows."""
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 1e-12))
    (b1x, b1y, b1z), (b2x, b2y, b2z) = _onb(nx, ny, nz)
    return (
        b1x * x + b2x * y + nx * z,
        b1y * x + b2y * y + ny * z,
        b1z * x + b2z * y + nz * z,
    )


def _cone_sample(cx, cy, cz, radius, px, py, pz, u1, u2):
    """render/nee.py:_cone_sample on rows: uniform direction in the cone
    subtended by the sphere; returns (dir x3, solid_angle).  Robust
    one-minus forms (omc = sin2/(1 + cos_max), st2 = x*(1 + cos_t)) —
    see the XLA twin's docstring for the cancellation analysis."""
    tx, ty, tz = cx - px, cy - py, cz - pz
    dc2 = _dot3(tx, ty, tz, tx, ty, tz)
    dc = jnp.sqrt(jnp.maximum(dc2, 1e-12))
    sin2_max = jnp.clip(radius * radius / jnp.maximum(dc2, 1e-12), 0.0, 1.0)
    on_sphere = sin2_max >= 1.0
    cos_max = jnp.where(
        on_sphere, 0.0, jnp.sqrt(jnp.where(on_sphere, 1.0, 1.0 - sin2_max))
    )
    omc = jnp.where(on_sphere, 1.0, sin2_max / (1.0 + cos_max))
    x = u1 * omc
    cos_t = 1.0 - x
    st2 = x * (1.0 + cos_t)
    st_ok = st2 > 0.0
    sin_t = jnp.where(st_ok, jnp.sqrt(jnp.where(st_ok, st2, 1.0)), 0.0)
    phi = TWO_PI * u2
    wx, wy, wz = tx / dc, ty / dc, tz / dc
    (b1x, b1y, b1z), (b2x, b2y, b2z) = _onb(wx, wy, wz)
    sc, ss = sin_t * jnp.cos(phi), sin_t * jnp.sin(phi)
    return (
        b1x * sc + b2x * ss + wx * cos_t,
        b1y * sc + b2y * ss + wy * cos_t,
        b1z * sc + b2z * ss + wz * cos_t,
        TWO_PI * omc,
    )


def _sphere_t_single(px, py, pz, dx, dy, dz, cx, cy, cz, radius):
    """render/nee.py:_sphere_t_single on rows: distance to ONE sphere
    with offset-origin acceptance (tca >= eps, t >= eps); INF on miss."""
    lx, ly, lz = cx - px, cy - py, cz - pz
    tca = _dot3(lx, ly, lz, dx, dy, dz)
    d2 = _dot3(lx, ly, lz, lx, ly, lz) - tca * tca
    r2 = radius * radius
    outside = d2 > r2
    thc = jnp.where(
        outside,
        0.0,
        jnp.sqrt(jnp.where(outside, 1.0, jnp.maximum(r2 - d2, 1e-12))),
    )
    t = tca - thc
    miss = (tca < EPSILON) | outside | (t < EPSILON)
    return jnp.where(miss, INFINITE, t)


def _plane_t(ox, oy, oz, dx, dy, dz, prow, reject_below):
    """ops/intersect.py:plane_distances for ONE plane (SMEM scalars):
    one-sided accept (denom <= PLANE_DENOM_EPS), dist >= reject_below
    (0 for camera rays, EPSILON from a shade point); INF on miss."""
    px, py, pz = prow[0], prow[1], prow[2]
    nx, ny, nz = prow[3], prow[4], prow[5]
    denom = dx * nx + dy * ny + dz * nz
    num = (px - ox) * nx + (py - oy) * ny + (pz - oz) * nz
    denom_safe = jnp.where(denom == 0.0, PLANE_DENOM_EPS * 0.5, denom)
    dist = num / denom_safe
    miss = (denom > PLANE_DENOM_EPS) | (dist < reject_below)
    return jnp.where(miss, INFINITE, dist)


def _sphere_fold(
    geom_ref, P, unroll,
    ox, oy, oz, dx, dy, dz, eps, bx=None, by=None, bz=None,
    t_l=None, lgi=None,
):
    """The sphere fold as a register-resident scalar-SMEM loop: the
    [8, R] carries stay in vregs while sphere columns stream from
    SMEM — the round-2 dual kernel's formulation
    (ops/pallas_intersect.py:_dual_fold_kernel, measured 91.6
    Gpairs/s).  A [P, R]-broadcast formulation measured ~3.5x slower
    in situ: every fold op streams 500-vreg [1000, 512] tiles
    through VMEM instead of staying in registers.

    BSDF side: accept tca>=eps, h>=0, t>=eps (reference rules at an
    eps-shifted origin; exact same f32 values as the XLA path).
    Shadow side (when bx is not None): sqrt-free any-hit in
    [EPSILON, t_l) excluding sphere `lgi`.

    Module-level so the primary-probe kernel and the fused bounce-loop
    kernel run the IDENTICAL f32 op sequence (shared-formula parity).
    """
    do_shadow = bx is not None
    shape = ox.shape

    def one(p, carry):
        best_t, best_p, occ = carry
        cx = geom_ref[p, 0]
        cy = geom_ref[p, 1]
        cz = geom_ref[p, 2]
        r2 = geom_ref[p, 3]
        lx, ly, lz = cx - ox, cy - oy, cz - oz
        ll = lx * lx + ly * ly + lz * lz
        tca = lx * dx + ly * dy + lz * dz
        h = r2 - (ll - tca * tca)
        # Clamp form == ops/intersect.py:sphere_distances: `h >= 0` is
        # sign-exact for `d2 <= r2`, and accepted lanes' thc/t run the
        # identical f32 sequence sqrt(max(r2 - d2, 1e-12)) — so the
        # fold's winner t IS sphere_distances' t bit-for-bit and the
        # payload needs no recompute (round-4's grazing-band fuzz
        # finding: the old sqrt(max(h, 0)) differed in h in [0, 1e-12)).
        thc = jnp.sqrt(jnp.maximum(h, 1e-12))
        t = tca - thc
        # (tca >= eps) is implied: t >= eps with thc > 0 forces
        # tca = t + thc >= eps — one fewer compare per pair.
        ok = (h >= 0.0) & (t >= eps) & (t < best_t)
        best_t = jnp.where(ok, t, best_t)
        best_p = jnp.where(ok, p, best_p)
        if do_shadow:
            tca2 = lx * bx + ly * by + lz * bz
            h2 = r2 - (ll - tca2 * tca2)
            a1 = tca2 - EPSILON
            a2 = tca2 - t_l
            occ_p = (
                (h2 >= 0.0)
                & (a1 >= 0.0)
                & (a1 * a1 >= h2)
                & ((a2 < 0.0) | (a2 * a2 < h2))
                & (p != lgi)
            )
            occ = occ | occ_p.astype(jnp.int32)
        return best_t, best_p, occ

    init = (
        jnp.full(shape, INFINITE, jnp.float32),
        jnp.zeros(shape, jnp.int32),
        jnp.zeros(shape, jnp.int32),
    )
    n_main = P // unroll * unroll

    def body(i, c):
        p0 = i * unroll
        for k in range(unroll):
            c = one(p0 + k, c)
        return c

    carry = jax.lax.fori_loop(0, n_main // unroll, body, init)
    for p in range(n_main, P):
        carry = one(p, carry)
    best_t, best_p, occ = carry
    return best_t, jnp.minimum(best_p, P - 1), occ


def _merge_planes_ref(
    plane_ref, num_planes, P, t, prim, ox, oy, oz, dx, dy, dz,
    reject_below,
):
    """Fold planes into the sphere-best; strict < keeps the sphere on
    ties and the lowest plane index among planes (checkHit order)."""
    for j in range(num_planes):
        prow = [plane_ref[j, k] for k in range(6)]
        pt = _plane_t(ox, oy, oz, dx, dy, dz, prow, reject_below)
        better = pt < t
        t = jnp.where(better, pt, t)
        prim = jnp.where(better, P + j, prim)
    return t, prim


def _mt_row(tvx, tvy, tvz, e1x, e1y, e1z, e2x, e2y, e2z, en,
            ddx, ddy, ddz, rej):
    """One triangle's Möller–Trumbore distance on rows, in
    `ops/intersect.py:triangle_distances`' exact f32 op order (one-sided,
    area-scaled front-face test `det <= en` with en = 1e-6 * |e1 x e2|;
    `rej` acceptance floor); INFINITE on miss.  `tv* = origin - v0`."""
    pvx = ddy * e2z - ddz * e2y
    pvy = ddz * e2x - ddx * e2z
    pvz = ddx * e2y - ddy * e2x
    det = pvx * e1x + pvy * e1y + pvz * e1z
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (ddx * qvx + ddy * qvy + ddz * qvz) * inv_det
    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    miss = (
        (det <= en)
        | (u < 0.0)
        | (v < 0.0)
        | (u + v > 1.0)
        | (tt < rej)
    )
    return jnp.where(miss, INFINITE, tt)


def _merge_boxes_ref(
    box_ref, num_boxes, base, t, prim, ox, oy, oz, dx, dy, dz,
    reject_below, bx=None, by=None, bz=None, t_l=None, occ=None,
):
    """Fold axis-aligned boxes into the running best (strict <,
    ascending global index `base + k` — checkHit's spheres < planes <
    boxes < triangles order) in `ops/intersect.py:box_distances`' exact
    f32 branchless-slab op order; with shadow args also any-hit
    occlusion in [EPSILON, t_l) along (bx, by, bz) — boxes are BSDF-only
    emitters so no light exclusion is needed."""
    tiny = jnp.float32(1e-12)

    def slab(lo, hi, o, d):
        d_safe = jnp.where(
            jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d
        )
        inv = 1.0 / d_safe
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    for k in range(num_boxes):
        r = [box_ref[k, i] for i in range(6)]
        (lx, ly, lz, hx_, hy_, hz_) = r

        def box_t(ddx, ddy, ddz, rej):
            n1, f1 = slab(lx, hx_, ox, ddx)
            n2, f2 = slab(ly, hy_, oy, ddy)
            n3, f3 = slab(lz, hz_, oz, ddz)
            t_near = jnp.maximum(jnp.maximum(n1, n2), n3)
            t_far = jnp.minimum(jnp.minimum(f1, f2), f3)
            miss = (
                (t_near > t_far) | (t_near <= 0.0) | (t_near < rej)
            )
            return jnp.where(miss, INFINITE, t_near)

        bd = box_t(dx, dy, dz, reject_below)
        better = bd < t
        t = jnp.where(better, bd, t)
        prim = jnp.where(better, base + k, prim)
        if bx is not None:
            sd = box_t(bx, by, bz, EPSILON)
            occ = occ | (sd < t_l).astype(jnp.int32)
    return t, prim, occ


def _merge_tris_ref(
    tri_ref, num_tris, base, t, prim, ox, oy, oz, dx, dy, dz,
    reject_below, bx=None, by=None, bz=None, t_l=None, lgi=None, occ=None,
):
    """Fold triangles into the running best (strict <, ascending global
    index `base + k` — checkHit's spheres < planes < triangles order);
    with shadow args also any-hit occlusion in [EPSILON, t_l) along
    (bx, by, bz) excluding the sampled light `lgi`
    (ops/intersect.py:shadow_occluded's triangle window).  `tvec` is
    shared between the two directions (same origin)."""
    for k in range(num_tris):
        r = [tri_ref[k, i] for i in range(10)]
        (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, en) = r
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        td = _mt_row(tvx, tvy, tvz, e1x, e1y, e1z, e2x, e2y, e2z, en,
                     dx, dy, dz, reject_below)
        better = td < t
        t = jnp.where(better, td, t)
        prim = jnp.where(better, base + k, prim)
        if bx is not None:
            sd = _mt_row(tvx, tvy, tvz, e1x, e1y, e1z, e2x, e2y, e2z, en,
                         bx, by, bz, EPSILON)
            occ = occ | (
                (sd < t_l) & (base + k != lgi)
            ).astype(jnp.int32)
    return t, prim, occ


def _primary_kernel(
    geom_ref, plane_ref, tri_ref, box_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_ref, prim_ref,
    *, num_spheres, num_planes, num_tris, num_boxes, unroll,
):
    """Camera-ray nearest hit only (eps = 0 acceptance): the presort
    probe.  Runs the identical fold/merge formulas as the bounce loop,
    so its (t, prim) can be fed back into the main kernel verbatim."""
    t, prim, _ = _sphere_fold(
        geom_ref, num_spheres, unroll,
        ox_ref[:, :], oy_ref[:, :], oz_ref[:, :],
        dx_ref[:, :], dy_ref[:, :], dz_ref[:, :], np.float32(0.0),
    )
    t, prim = _merge_planes_ref(
        plane_ref, num_planes, num_spheres, t, prim,
        ox_ref[:, :], oy_ref[:, :], oz_ref[:, :],
        dx_ref[:, :], dy_ref[:, :], dz_ref[:, :], 0.0,
    )
    if num_boxes:
        t, prim, _ = _merge_boxes_ref(
            box_ref, num_boxes, num_spheres + num_planes, t, prim,
            ox_ref[:, :], oy_ref[:, :], oz_ref[:, :],
            dx_ref[:, :], dy_ref[:, :], dz_ref[:, :], 0.0,
        )
    if num_tris:
        t, prim, _ = _merge_tris_ref(
            tri_ref, num_tris, num_spheres + num_planes + num_boxes,
            t, prim,
            ox_ref[:, :], oy_ref[:, :], oz_ref[:, :],
            dx_ref[:, :], dy_ref[:, :], dz_ref[:, :], 0.0,
        )
    t_ref[:, :] = t
    prim_ref[:, :] = prim


def _nee_kernel(
    geom_ref,    # SMEM [P, 4] f32: cx, cy, cz, r2
    gat_ref,     # VMEM [16, P+T+B] f32: cr cg cb il aux(3) param kind
                 # rad | box-hi rows 10-12
    plane_ref,   # SMEM [M?, 12] f32: px py pz nx ny nz cr cg cb il param kind
    tri_ref,     # SMEM [T?, 10] f32: v0(3) e1(3) e2(3) en
    box_ref,     # SMEM [B?, 6] f32: lo(3) hi(3)
    light_ref,   # SMEM [L?, 15] f32: kind gidx er eg eb c|v0(3) rad e1(3) e2(3)
    *refs,
    # refs: ox oy oz dx dy dz ra rb rc rctr [t0 p0] | rad_r rad_g rad_b
    #       ora orb orc orctr
    spp, num_bounces, num_spheres, num_planes, num_tris, num_boxes,
    num_lights, has_glossy, has_diel, block_skip=True, unroll=8,
    primary_inputs=False, regenerate=True, telemetry=False,
    grad_residuals=False,
):
    """Per-lane state is [8, R]: 8 independent ray groups in the SUBLANE
    dim so every glue op runs at full (8, 128) VPU tile utilization (a
    [1, R] formulation measured 3x slower end-to-end — glue rows used
    1/8 of the VPU).  The pairwise [P, R] fold runs once per sublane
    group (free row slices, results re-stacked by sublane concat); total
    pair count is unchanged.

    With `primary_inputs=True` the camera nearest-hit (t0, prim0) comes
    in as two extra refs (the presort probe's output) instead of being
    folded in-kernel — the presorted layout groups sky-dead lanes into
    whole blocks so `block_skip` skips them for every sample and bounce.
    """
    steps_ref = None
    gr_prim_refs = gr_flag_refs = None
    if grad_residuals:
        assert not regenerate and not telemetry, (
            "grad residuals need the legacy discipline "
            "(static sample/bounce indices)"
        )
        n_gr = spp * num_bounces
        k = len(refs) - 2 * n_gr
        refs, gr_prim_refs, gr_flag_refs = (
            refs[:k],
            refs[k : k + n_gr],
            refs[k + n_gr :],
        )
    if telemetry:
        assert regenerate, "steps telemetry is a regeneration-only counter"
        *refs, steps_ref = refs
    if primary_inputs:
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         ra_ref, rb_ref, rc_ref, rctr_ref, t0_ref, p0_ref,
         rad_r_ref, rad_g_ref, rad_b_ref,
         ora_ref, orb_ref, orc_ref, orctr_ref) = refs
    else:
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         ra_ref, rb_ref, rc_ref, rctr_ref,
         rad_r_ref, rad_g_ref, rad_b_ref,
         ora_ref, orb_ref, orc_ref, orctr_ref) = refs
        t0_ref = p0_ref = None
    P = num_spheres
    M = num_planes
    T = num_tris
    Bx = num_boxes
    R = ox_ref.shape[1]
    pox, poy, poz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
    pdx, pdy, pdz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]

    gatT = gat_ref[:, :]  # [16, P+T+B]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (P + T + Bx, R), 0)

    def per_group(fn, *args, n_out=1):
        """Run `fn` on each [1, R] sublane row of the [8, R] args and
        re-stack each output along sublanes (used only by the payload
        gather, whose one-hot contraction needs a [P, R] matrix)."""
        outs = [fn(*[a[g : g + 1] for a in args]) for g in range(8)]
        if n_out == 1:
            return jnp.concatenate(outs, axis=0)
        return tuple(
            jnp.concatenate([o[i] for o in outs], axis=0)
            for i in range(n_out)
        )

    def scalar_dual_fold(*args, **kw):
        return _sphere_fold(geom_ref, P, unroll, *args, **kw)

    def merge_planes(t, prim, ox, oy, oz, dx, dy, dz, reject_below):
        return _merge_planes_ref(
            plane_ref, num_planes, P, t, prim, ox, oy, oz, dx, dy, dz,
            reject_below,
        )

    def payload(t, prim, ox, oy, oz, dx, dy, dz):
        """Hit payload: one-hot MXU gather for spheres AND triangles
        (exact at HIGHEST precision; triangle aux rows carry the unit
        normal where sphere rows carry the center), unrolled SMEM
        selects for planes.

        The fold's winner t needs NO recompute: every fold runs its XLA
        twin's exact clamp/op form, so t is already the XLA path's value
        bit-for-bit (the round-4 grazing-band recompute was removed with
        that fix)."""
        hit = t < INFINITE
        # Gather-column space: spheres 0..P-1, triangles P..P+T-1, boxes
        # P+T..P+T+B-1.  Global prims: spheres [0,P), planes [P,P+M),
        # boxes [P+M,P+M+B), tris [P+M+B,..); plane winners map onto
        # columns that may alias tri/box columns, but every gathered
        # field a plane lane uses is overwritten by the SMEM selects
        # below.
        gcol = prim
        if Bx:
            gcol = jnp.where(
                (prim >= P + M) & (prim < P + M + Bx),
                prim - M + T, gcol,
            )
        if T:
            gcol = jnp.where(prim >= P + M + Bx, prim - M - Bx, gcol)
        n_rows = 12 if Bx else 9

        def gather_g(gcol_, hit_):
            onehot = ((iota_p == gcol_) & hit_).astype(jnp.float32)
            g = jax.lax.dot_general(
                gatT, onehot, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [16, R]
            rows = [g[v : v + 1] for v in range(9)]
            if Bx:
                rows += [g[v : v + 1] for v in (10, 11, 12)]
            return tuple(rows)

        outs = per_group(gather_g, gcol, hit, n_out=n_rows)
        (cr, cg, cb, il, ax, ay, az, param, kind) = outs[:9]
        hi3 = outs[9:12] if Bx else None
        is_plane = (
            (prim >= P) & (prim < P + M) if (T or Bx) else prim >= P
        )
        for j in range(num_planes):
            m = prim == P + j
            cr = jnp.where(m, plane_ref[j, 6], cr)
            cg = jnp.where(m, plane_ref[j, 7], cg)
            cb = jnp.where(m, plane_ref[j, 8], cb)
            il = jnp.where(m, plane_ref[j, 9], il)
            param = jnp.where(m, plane_ref[j, 10], param)
            kind = jnp.where(m, plane_ref[j, 11], kind)
            ax = jnp.where(m, plane_ref[j, 3], ax)
            ay = jnp.where(m, plane_ref[j, 4], ay)
            az = jnp.where(m, plane_ref[j, 5], az)
        return (t, hit, is_plane, cr, cg, cb, il, param, kind,
                ax, ay, az, hi3)

    # Primary hit from the camera: eps = 0 acceptance (nearest_hit).
    # Hoisted OUT of the spp loop — primary rays carry no per-sample
    # jitter (models/camera.py:primary_rays is deterministic) and the
    # fold draws no RNG, so all spp samples share one primary fold.
    # Mosaic does not move loop-invariant folds out of fori_loop itself;
    # at 4 bounces this deletes ~1/5 of all (ray, sphere) pairs.
    # In presort mode the probe kernel already computed it.
    if primary_inputs:
        t0, prim0 = t0_ref[:, :], p0_ref[:, :]
    else:
        t0, prim0, _ = scalar_dual_fold(
            pox, poy, poz, pdx, pdy, pdz, np.float32(0.0)
        )
        t0, prim0 = merge_planes(
            t0, prim0, pox, poy, poz, pdx, pdy, pdz, 0.0
        )
        if Bx:
            t0, prim0, _ = _merge_boxes_ref(
                box_ref, Bx, P + M, t0, prim0,
                pox, poy, poz, pdx, pdy, pdz, 0.0,
            )
        if T:
            t0, prim0, _ = _merge_tris_ref(
                tri_ref, T, P + M + Bx, t0, prim0,
                pox, poy, poz, pdx, pdy, pdz, 0.0,
            )

    def live_body(operands):
        """ONE bounce of the physical/NEE estimator for every lane of
        the block: payload gather, emission pickup, BRDF + light
        sampling, the dual sphere fold, plane merges, NEE resolve.
        Shared by both execution disciplines (the legacy spp x bounce
        loops and the path-regeneration while loop); callers mask dead
        lanes back afterwards."""
        (ox, oy, oz, dx, dy, dz, t, prim, ra, rb, rc, rctr,
         res_r, res_g, res_b, th_r, th_g, th_b, prev_spec) = operands
        hit = t < INFINITE

        # Payload gather runs inside the alive-skip: fully dead
        # blocks pay neither the one-hot contraction nor glue.
        (t, _, is_plane, cr, cg, cb, il, param, kind,
         ax, ay, az, hi3) = payload(t, prim, ox, oy, oz, dx, dy, dz)

        # Hit point + normal (sphere: normalize(point - center);
        # plane/triangle: stored unit normal in aux) —
        # ops/intersect.py:hit_from_t_prim.
        t_safe = jnp.where(hit, t, 0.0)
        hx = ox + dx * t_safe
        hy = oy + dy * t_safe
        hz = oz + dz * t_safe
        # Divide (not reciprocal-multiply): normalize_safe's exact op
        # sequence — a 1-ulp normal difference propagates into every
        # downstream accept/reject comparison of the XLA twin.
        is_box = (
            (prim >= P + M) & (prim < P + M + Bx)
            if Bx else jnp.zeros_like(hit)
        )
        is_tri_w = (prim >= P + M + Bx) if T else jnp.zeros_like(hit)
        use_aux = is_plane | is_tri_w if (T or Bx) else is_plane
        sx, sy, sz = hx - ax, hy - ay, hz - az
        sq = _dot3(sx, sy, sz, sx, sy, sz)
        nrm = jnp.maximum(jnp.sqrt(sq), 1e-20)
        nx = jnp.where(use_aux, ax, sx / nrm)
        ny = jnp.where(use_aux, ay, sy / nrm)
        nz = jnp.where(use_aux, az, sz / nrm)
        if Bx:
            # ops/intersect.py:box_normal — dominant axis of the
            # centered, half-size-normalized hit offset; aux = lo,
            # rows 10-12 = hi.  argmax picks the FIRST maximum.
            hix, hiy, hiz = hi3
            ccx = (ax + hix) * 0.5
            ccy = (ay + hiy) * 0.5
            ccz = (az + hiz) * 0.5
            hfx = jnp.maximum((hix - ax) * 0.5, 1e-12)
            hfy = jnp.maximum((hiy - ay) * 0.5, 1e-12)
            hfz = jnp.maximum((hiz - az) * 0.5, 1e-12)
            qx = (hx - ccx) / hfx
            qy = (hy - ccy) / hfy
            qz = (hz - ccz) / hfz
            aqx, aqy, aqz = jnp.abs(qx), jnp.abs(qy), jnp.abs(qz)
            a0 = (aqx >= aqy) & (aqx >= aqz)
            a1 = ~a0 & (aqy >= aqz)
            a2 = ~a0 & ~a1
            nx = jnp.where(is_box, jnp.where(a0, jnp.sign(qx), 0.0), nx)
            ny = jnp.where(is_box, jnp.where(a1, jnp.sign(qy), 0.0), ny)
            nz = jnp.where(is_box, jnp.where(a2, jnp.sign(qz), 0.0), nz)

        # Emission pickup (NEE rule: specular chains + BSDF-only
        # emitters = planes AND boxes; render/nee.py:is_bsdf_only).
        take = (prev_spec != 0) | is_plane | is_box
        emit = jnp.where(take, il, 0.0)
        nres_r = res_r + emit * cr * th_r
        nres_g = res_g + emit * cg * th_g
        nres_b = res_b + emit * cb * th_b

        # BRDF sampling (render/nee.py:sample_physical): 3 draws.
        u1, u2, u3, (ra2, rb2, rc2, rctr2) = _draw3(
            (ra, rb, rc, rctr)
        )
        ndx, ndy, ndz = _cosine_hemisphere(nx, ny, nz, u1, u2)
        is_spec = jnp.zeros((8, R), jnp.bool_)
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
            # ops/brdf.py:dielectric_split + u3 branch choice.
            cos_i0 = -_dot3(dx, dy, dz, nx, ny, nz)
            inside = cos_i0 < 0.0
            fnx = jnp.where(inside, -nx, nx)
            fny = jnp.where(inside, -ny, ny)
            fnz = jnp.where(inside, -nz, nz)
            aci = jnp.abs(cos_i0)
            ior = param
            eta = jnp.where(inside, ior, 1.0 / ior)
            sin2 = eta * eta * jnp.maximum(1.0 - aci * aci, 0.0)
            tir = sin2 > 1.0
            cos_t = jnp.where(
                tir,
                0.0,
                jnp.sqrt(
                    jnp.where(
                        tir, 1.0, jnp.maximum(1.0 - sin2, 1e-12)
                    )
                ),
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
            tq = jnp.maximum(
                jnp.sqrt(_dot3(tx, ty, tz, tx, ty, tz)), 1e-20
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

        if num_lights:
            # Light draw (3 uniforms) + rank selection + cone/area
            # sample — render/nee.py:sample_light body (the rank rule
            # k = floor(us0 * L) indexes the precomputed light list,
            # which enumerates the mask's set bits — identical
            # selection to the cdf-argmax).
            us0, us1, us2, (ra2, rb2, rc2, rctr2) = _draw3(
                (ra2, rb2, rc2, rctr2)
            )
            k = jnp.clip(
                jnp.floor(us0 * np.float32(num_lights)),
                0.0,
                np.float32(num_lights - 1),
            ).astype(jnp.int32)
            # Row layout: kind gidx er eg eb c|v0(3) rad e1(3) e2(3).
            n_sel = 15 if T else 9
            sel = [jnp.zeros((8, R), jnp.float32) for _ in range(n_sel)]
            for j in range(num_lights):
                m = k == j
                for c in range(n_sel):
                    sel[c] = jnp.where(m, light_ref[j, c], sel[c])
            (lkind, lgif, ler, leg, leb, lx, ly, lz, lrad) = sel[:9]
            lgi = lgif.astype(jnp.int32)
            bxs, bys, bzs, solid_angle = _cone_sample(
                lx, ly, lz, lrad, hx, hy, hz, us1, us2
            )
            if T:
                # Triangle-area branch (render/nee.py:_tri_area_sample
                # op order, computed for every lane and selected by the
                # light row's kind — exactly the XLA where-select).
                (e1x, e1y, e1z, e2x, e2y, e2z) = sel[9:15]
                ncx = e1y * e2z - e1z * e2y
                ncy = e1z * e2x - e1x * e2z
                ncz = e1x * e2y - e1y * e2x
                nq = ncx * ncx + ncy * ncy + ncz * ncz
                n_norm_s = jnp.sqrt(jnp.maximum(nq, 1e-20))
                nux = ncx / n_norm_s
                nuy = ncy / n_norm_s
                nuz = ncz / n_norm_s
                area = 0.5 * n_norm_s
                r1s = jnp.sqrt(jnp.maximum(us1, 1e-12))
                bu = 1.0 - r1s
                bv = us2 * r1s
                qx = lx + e1x * bu + e2x * bv
                qy = ly + e1y * bu + e2y * bv
                qz = lz + e1z * bu + e2z * bv
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
                # t_l: both closed forms from the SELECTED direction
                # (render/nee.py:sample_light); the tri branch is
                # _tri_t_single's per-lane Möller-Trumbore with its
                # UNCLAMPED |e1 x e2| in the front-face test.
                t_l_s = _sphere_t_single(
                    hx, hy, hz, bx, by, bz, lx, ly, lz, lrad
                )
                tvx, tvy, tvz = hx - lx, hy - ly, hz - lz
                en_l = PLANE_DENOM_EPS * jnp.sqrt(nq)
                t_l_t = _mt_row(
                    tvx, tvy, tvz, e1x, e1y, e1z, e2x, e2y, e2z,
                    en_l, bx, by, bz, EPSILON,
                )
                t_l = jnp.where(is_tl, t_l_t, t_l_s)
                inv_pdf = jnp.where(
                    inv_pdf_dir > 1e-9,
                    inv_pdf_dir * np.float32(num_lights),
                    0.0,
                )
            else:
                bx, by, bz = bxs, bys, bzs
                inv_pdf = jnp.where(
                    solid_angle > 1e-9,
                    solid_angle * np.float32(num_lights),
                    0.0,
                )
                t_l = _sphere_t_single(
                    hx, hy, hz, bx, by, bz, lx, ly, lz, lrad
                )
        else:
            # Zero-light scenes still advance the stream by the 3
            # light-sampling draws: both XLA NEE paths
            # (trace_physical and _trace_physical_fused) draw them
            # unconditionally, and render_batch_physical
            # auto-routes L == 0 scenes here — skipping the draws
            # would silently fork the RNG stream vs the documented
            # drop-in XLA fallback (ADVICE r3).
            _, _, _, (ra2, rb2, rc2, rctr2) = _draw3(
                (ra2, rb2, rc2, rctr2)
            )
            bx = by = bz = jnp.zeros((8, R), jnp.float32)
            t_l = jnp.full((8, R), INFINITE)
            inv_pdf = jnp.zeros((8, R), jnp.float32)
            lgi = jnp.full((8, R), -1, jnp.int32)
            ler = leg = leb = jnp.zeros((8, R), jnp.float32)

        # The dual fold: one register-resident pass over
        # the sphere table answers next-BSDF nearest AND shadow
        # occlusion (shared l vector per sphere).
        if num_lights:
            t2, prim2, occ = scalar_dual_fold(
                hx, hy, hz, ndx, ndy, ndz, EPSILON,
                bx, by, bz, t_l, lgi,
            )
        else:
            t2, prim2, occ = scalar_dual_fold(
                hx, hy, hz, ndx, ndy, ndz, EPSILON
            )
        t2, prim2 = merge_planes(
            t2, prim2, hx, hy, hz, ndx, ndy, ndz, EPSILON
        )
        if Bx:
            if num_lights:
                t2, prim2, occ = _merge_boxes_ref(
                    box_ref, Bx, P + M, t2, prim2,
                    hx, hy, hz, ndx, ndy, ndz, EPSILON,
                    bx, by, bz, t_l, occ,
                )
            else:
                t2, prim2, _ = _merge_boxes_ref(
                    box_ref, Bx, P + M, t2, prim2,
                    hx, hy, hz, ndx, ndy, ndz, EPSILON,
                )
        if T:
            if num_lights:
                t2, prim2, occ = _merge_tris_ref(
                    tri_ref, T, P + M + Bx, t2, prim2,
                    hx, hy, hz, ndx, ndy, ndz, EPSILON,
                    bx, by, bz, t_l, lgi, occ,
                )
            else:
                t2, prim2, _ = _merge_tris_ref(
                    tri_ref, T, P + M + Bx, t2, prim2,
                    hx, hy, hz, ndx, ndy, ndz, EPSILON,
                )
        if num_lights:
            for j in range(num_planes):
                prow = [plane_ref[j, kk] for kk in range(6)]
                pd = _plane_t(hx, hy, hz, bx, by, bz, prow, 0.0)
                occ = occ | (
                    (pd >= EPSILON) & (pd < t_l)
                ).astype(jnp.int32)
            visible = (occ == 0) & (t_l < INFINITE)
            cos_i = _dot3(bx, by, bz, nx, ny, nz)
            is_matte = kind == np.float32(BRDF_MATTE)
            w = visible & is_matte & (cos_i > 0.0)
            scale = jnp.where(w, cos_i * inv_pdf * INV_PI, 0.0)
            nres_r = nres_r + th_r * cr * ler * scale
            nres_g = nres_g + th_g * cg * leg * scale
            nres_b = nres_b + th_b * cb * leb * scale

        return (
            hx, hy, hz, ndx, ndy, ndz, t2, prim2,
            ra2, rb2, rc2, rctr2,
            nres_r, nres_g, nres_b,
            th_r * cr, th_g * cg, th_b * cb,
            is_spec.astype(jnp.int32),
            occ,
        )

    def masked_step(dead, operands):
        """Run `live_body` and roll dead lanes back to their old state
        (so they draw no RNG and accumulate nothing).  Returns the new
        state and the bounce's shadow-occlusion word (a grad residual;
        garbage on dead lanes, which the reverse sweep masks)."""
        new = live_body(operands)
        (ox, oy, oz, dx, dy, dz, t, prim, ra, rb, rc, rctr,
         res_r, res_g, res_b, th_r, th_g, th_b, prev_spec) = operands
        (n_ox, n_oy, n_oz, n_dx, n_dy, n_dz, n_t, n_prim,
         n_ra, n_rb, n_rc, n_rctr, n_rr, n_rg, n_rbl,
         n_thr, n_thg, n_thb, n_ps, occ) = new

        sel = lambda old, nw: jnp.where(dead, old, nw)
        return (
            sel(ox, n_ox), sel(oy, n_oy), sel(oz, n_oz),
            sel(dx, n_dx), sel(dy, n_dy), sel(dz, n_dz),
            sel(t, n_t), sel(prim, n_prim),
            sel(ra, n_ra), sel(rb, n_rb), sel(rc, n_rc),
            sel(rctr, n_rctr),
            sel(res_r, n_rr), sel(res_g, n_rg), sel(res_b, n_rbl),
            jnp.where(dead, 0.0, n_thr),
            jnp.where(dead, 0.0, n_thg),
            jnp.where(dead, 0.0, n_thb),
            sel(prev_spec, n_ps),
        ), occ

    zero = jnp.zeros((8, R), jnp.float32)
    one = jnp.ones((8, R), jnp.float32)
    ione = jnp.ones((8, R), jnp.int32)

    if regenerate:
        # --- path-regeneration discipline -----------------------------
        # SIMD lanes waste no folds on dead paths: the moment a lane's
        # path terminates (escape, absorption, or bounce budget) it
        # banks the sample and restarts the NEXT sample from the
        # register-resident primary hit — the classic persistent-threads
        # wavefront, with the "queue" being each lane's own sample
        # counter.  On the BASELINE config-4 scene the per-bounce alive
        # fractions are [.58, .31, .14, .07]: the legacy spp x bounce
        # discipline folds all four bounces for every lane (dead lanes
        # masked but paid), ~3.6x more fold work than the paths need.
        # Lane-for-lane bit-identical to the legacy loops: each lane
        # processes its samples in order, drawing the same RNG stream.
        prim_dead = ~(t0 < INFINITE)
        st0 = (
            pox, poy, poz, pdx, pdy, pdz, t0, prim0,
            ra_ref[:, :], rb_ref[:, :], rc_ref[:, :], rctr_ref[:, :],
            zero, zero, zero, one, one, one, ione,
            # sample index: sky lanes complete all samples instantly —
            # each of their samples adds nothing and draws nothing.
            jnp.where(prim_dead, spp, 0).astype(jnp.int32),
            jnp.zeros((8, R), jnp.int32),  # bounce index
            zero, zero, zero,              # banked radiance
        ) + ((jnp.zeros((8, R), jnp.int32),) if telemetry else ())

        def w_cond(st):
            return jnp.any(st[19] < spp)

        def w_body(st):
            (ox, oy, oz, dx, dy, dz, t, prim, ra, rb, rc, rctr,
             res_r, res_g, res_b, th_r, th_g, th_b, prev_spec,
             s_idx, b_idx, acc_r, acc_g, acc_b) = st[:24]
            in_flight = s_idx < spp
            q = th_r * th_r + th_g * th_g + th_b * th_b
            path_dead = (
                (q <= NEAR_ZERO_EPS)
                | ~(t < INFINITE)
                | (b_idx >= num_bounces)
            )
            # Bank finished samples, restart from the primary hit.
            fin = in_flight & path_dead
            acc_r = jnp.where(fin, acc_r + res_r, acc_r)
            acc_g = jnp.where(fin, acc_g + res_g, acc_g)
            acc_b = jnp.where(fin, acc_b + res_b, acc_b)
            s_idx = s_idx + fin.astype(jnp.int32)
            re = fin & (s_idx < spp)
            rsel = lambda new, old: jnp.where(re, new, old)
            ox, oy, oz = rsel(pox, ox), rsel(poy, oy), rsel(poz, oz)
            dx, dy, dz = rsel(pdx, dx), rsel(pdy, dy), rsel(pdz, dz)
            t, prim = rsel(t0, t), rsel(prim0, prim)
            res_r, res_g, res_b = rsel(zero, res_r), rsel(
                zero, res_g
            ), rsel(zero, res_b)
            th_r, th_g, th_b = rsel(one, th_r), rsel(one, th_g), rsel(
                one, th_b
            )
            prev_spec = rsel(ione, prev_spec)
            b_idx = jnp.where(re, 0, b_idx)
            # Every in-flight lane now carries a live path (a reinit
            # lane's primary is alive by construction: dead-primary
            # lanes completed all samples at init).
            active = s_idx < spp
            operands = (ox, oy, oz, dx, dy, dz, t, prim,
                        ra, rb, rc, rctr, res_r, res_g, res_b,
                        th_r, th_g, th_b, prev_spec)
            merged, _ = masked_step(~active, operands)
            b_idx = b_idx + active.astype(jnp.int32)
            out = (*merged, s_idx, b_idx, acc_r, acc_g, acc_b)
            if telemetry:
                # Realized per-lane work: one count per bounce actually
                # processed (the block's cost is its max over lanes).
                out = out + (st[24] + active.astype(jnp.int32),)
            return out

        stf = jax.lax.while_loop(w_cond, w_body, st0)
        ra, rb, rc, rctr = stf[8], stf[9], stf[10], stf[11]
        acc_r, acc_g, acc_b = stf[21], stf[22], stf[23]
        if telemetry:
            steps_ref[:, :] = stf[24]
    else:
        # --- legacy spp x bounce discipline ---------------------------
        izero = jnp.zeros((8, R), jnp.int32)

        def bounce_step(st):
            """One masked bounce; returns (state', occ, dead)."""
            t, th_r, th_g, th_b = st[6], st[15], st[16], st[17]
            q = th_r * th_r + th_g * th_g + th_b * th_b
            dead = (q <= NEAR_ZERO_EPS) | ~(t < INFINITE)
            # Whole-bounce block skip: a block whose lanes are all
            # dead (sky tiles after bounce 0) skips fold AND glue;
            # dead lanes draw no RNG either way, so this is exact.
            if block_skip:
                alive_any = jnp.any(~dead)
                st2, occ = jax.lax.cond(
                    alive_any,
                    lambda op: masked_step(dead, op),
                    lambda op: (op, izero),
                    st,
                )
            else:
                st2, occ = masked_step(dead, st)
            return st2, occ, dead

        if grad_residuals:
            # Sample AND bounce loops python-unrolled: each (sample,
            # bounce)'s discrete fold outcomes go to residual outputs at
            # a STATIC index, so the gradient kernel's backward replay
            # skips every fold at ANY spp (ops/pallas_nee_vjp.py
            # fold_residuals mode; round 5 extended it beyond spp == 1).
            # flags word: bit0 = shadow occlusion, bit1 = hit.
            ra, rb, rc, rctr = (
                ra_ref[:, :], rb_ref[:, :], rc_ref[:, :], rctr_ref[:, :]
            )
            acc_r = acc_g = acc_b = zero
            for s in range(spp):
                state = (
                    pox, poy, poz, pdx, pdy, pdz, t0, prim0,
                    ra, rb, rc, rctr,
                    zero, zero, zero, one, one, one, ione,
                )
                for b in range(num_bounces):
                    i = s * num_bounces + b
                    gr_prim_refs[i][:, :] = state[7]
                    hit_b = (state[6] < INFINITE).astype(jnp.int32)
                    state, occ, _ = bounce_step(state)
                    gr_flag_refs[i][:, :] = (occ & 1) | (hit_b << 1)
                ra, rb, rc, rctr = state[8], state[9], state[10], state[11]
                acc_r = acc_r + state[12]
                acc_g = acc_g + state[13]
                acc_b = acc_b + state[14]
        else:
            def one_sample(carry):
                ra, rb, rc, rctr, acc_r, acc_g, acc_b = carry
                state = (
                    pox, poy, poz, pdx, pdy, pdz, t0, prim0,
                    ra, rb, rc, rctr,
                    zero, zero, zero, one, one, one, ione,
                )
                state = jax.lax.fori_loop(
                    0, num_bounces, lambda _, st: bounce_step(st)[0],
                    state,
                )
                (_, _, _, _, _, _, _, _, ra, rb, rc, rctr,
                 res_r, res_g, res_b, _, _, _, _) = state
                return (ra, rb, rc, rctr,
                        acc_r + res_r, acc_g + res_g, acc_b + res_b)

            carry = (
                ra_ref[:, :], rb_ref[:, :], rc_ref[:, :], rctr_ref[:, :],
                zero, zero, zero,
            )
            carry = jax.lax.fori_loop(
                0, spp, lambda _, c: one_sample(c), carry
            )
            ra, rb, rc, rctr, acc_r, acc_g, acc_b = carry

    rad_r_ref[:, :] = acc_r
    rad_g_ref[:, :] = acc_g
    rad_b_ref[:, :] = acc_b
    ora_ref[:, :] = ra
    orb_ref[:, :] = rb
    orc_ref[:, :] = rc
    orctr_ref[:, :] = rctr


def primary_probe(
    geom, plane_tab, tri_tab, box_tab, ray_o, ray_d,
    *, num_spheres, num_planes, num_tris, num_boxes,
    block_r=DEFAULT_BLOCK_R, unroll=32, interpret=False,
):
    """Camera-ray nearest hit (t0, prim0) as flat [n] arrays — the
    presort probe exposed standalone (round 5: the sorted gradient frame
    computes its lane permutation OUTSIDE the custom-VJP boundary).
    Identical fold/merge formulas to the bounce kernels."""
    shape = ray_o.shape[:-1]
    n = int(np.prod(shape))
    blocks = -(-n // (8 * block_r))
    pad_n = blocks * 8 * block_r
    pad = pad_n - n
    cols = pad_n // 8

    def plane2d(f):
        f = jnp.concatenate([f, jnp.zeros((pad,), f.dtype)])
        return f.reshape(8, cols)

    flat = (
        [ray_o.reshape(-1, 3)[:, i] for i in range(3)]
        + [ray_d.reshape(-1, 3)[:, i] for i in range(3)]
    )
    smem_spec = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    col_spec = pl.BlockSpec(
        (8, block_r), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    t0f, p0f = pl.pallas_call(
        functools.partial(
            _primary_kernel, num_spheres=num_spheres,
            num_planes=num_planes, num_tris=num_tris,
            num_boxes=num_boxes, unroll=unroll,
        ),
        grid=(blocks,),
        in_specs=[smem_spec(geom), smem_spec(plane_tab),
                  smem_spec(tri_tab), smem_spec(box_tab)]
        + [col_spec] * 6,
        out_specs=[col_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((8, cols), jnp.float32),
            jax.ShapeDtypeStruct((8, cols), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(geom, plane_tab, tri_tab, box_tab, *[plane2d(f) for f in flat])
    return t0f.reshape(-1)[:n], p0f.reshape(-1)[:n]


def scene_light_indices(scene: Scene):
    """STATIC (host-side) NEE-emitter index tuple in `sample_light`'s
    mask space (spheres ++ triangles: idx < n_spheres names a sphere,
    idx >= n_spheres names triangle idx - n_spheres), or None when the
    scene's illuminance is traced (then the caller must fall back to the
    XLA path — the kernel needs a static light count)."""
    il = scene.spheres.material.illuminance
    if isinstance(il, jax.core.Tracer):
        return None
    idx = [int(i) for i in np.nonzero(np.asarray(il) > 0.0)[0]]
    if scene.triangles.count:
        til = scene.triangles.material.illuminance
        if isinstance(til, jax.core.Tracer):
            return None
        ns = scene.spheres.count
        idx += [
            ns + int(i) for i in np.nonzero(np.asarray(til) > 0.0)[0]
        ]
    return tuple(idx)


def supported_backend(backend: str | None = None) -> bool:
    return (backend or jax.default_backend()) == "tpu"


def nee_pallas_eligible(scene: Scene, backend: str | None = None) -> bool:
    """The fused NEE megakernel covers all four primitive kinds on TPU
    (round 5: triangles — MT fold + area lights — and boxes — slab fold,
    BSDF-only emitters) with a static (concrete) material/light
    description."""
    if (backend or jax.default_backend()) != "tpu":
        return False
    if scene.spheres.count == 0 or scene.spheres.count >= (1 << 24):
        return False
    if isinstance(scene.spheres.material.brdf_kind, jax.core.Tracer):
        return False
    if scene.triangles.count and isinstance(
        scene.triangles.material.brdf_kind, jax.core.Tracer
    ):
        return False
    return scene_light_indices(scene) is not None


def trace_physical_nee_pallas(
    scene: Scene,
    rays,
    rng_state: jnp.ndarray,
    num_bounces: int = 8,
    spp: int = 1,
    light_idx: tuple | None = None,
    kinds=None,
    block_r: int = DEFAULT_BLOCK_R,
    interpret: bool = False,
    block_skip: bool = True,
    unroll: int = 32,
    presort: bool | None = None,
    regenerate: bool | None = None,
    telemetry: bool = False,
):
    """Fused physical/NEE trace: (radiance_sum over `spp` samples
    [H, W, 3], final rng [H, W, 4]; with `telemetry` also a per-lane
    realized-step count [H, W] i32 — see `_trace_nee_from_tables`).

    Drop-in for `spp` sequential `trace_physical(..., nee=True)` samples
    summed (the `render_batch_physical` loop), with the whole loop in
    VMEM.  `light_idx` is the static emissive-sphere index tuple
    (`scene_light_indices`); pass it from OUTSIDE jit for traced scenes
    — positions/materials may be traced, counts may not.

    `regenerate` (None = auto: large sphere counts) runs the
    path-regeneration discipline: each lane streams through its samples
    continuously, restarting from the register-resident primary hit the
    moment a path dies, so no fold is spent on dead lanes.  False = the
    legacy spp x bounce loop.  Lane-for-lane bit-identical either way.
    Auto mirrors `presort`: on big scenes (fold-dominated, paths dying
    into sky) it is worth 2x+ (BASELINE config 4: 200 -> 403 Mrays/s
    with the depth sort); on Cornell-class scenes where occupancy stays
    high it costs ~4% of bookkeeping (config 6) — so small scenes keep
    the legacy loops.

    `presort` (None = auto: large sphere counts) runs a primary-probe
    kernel and depth-sorts lanes by primary-hit distance (sky last), so
    regeneration blocks are workload-homogeneous and legacy blocks of
    sky lanes skip whole; per-pixel bit-identical either way.
    """
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

    geom, gatT, plane_tab, tri_tab, box_tab, light_tab = (
        _nee_scene_tables(scene, light_idx)
    )
    return _trace_nee_from_tables(
        geom, gatT, plane_tab, tri_tab, box_tab, light_tab,
        rays.origin, rays.direction, rng_state,
        num_spheres=scene.spheres.count,
        num_planes=scene.planes.count,
        num_tris=scene.triangles.count,
        num_boxes=scene.boxes.count,
        num_lights=len(light_idx),
        has_glossy=has_glossy,
        has_diel=has_diel,
        num_bounces=num_bounces,
        spp=spp,
        block_r=block_r,
        interpret=interpret,
        block_skip=block_skip,
        unroll=unroll,
        presort=presort,
        regenerate=regenerate,
        telemetry=telemetry,
    )


def _nee_scene_tables(scene: Scene, light_idx):
    """Pack the scene into the kernel's five tables.  A differentiable
    function of the continuous Scene leaves — the custom-VJP wrapper
    (ops/pallas_nee_vjp.py) differentiates at the table boundary and lets
    this packing carry cotangents back to sphere/plane/tri/light leaves.

    Tables:
      geom      [P, 4] SMEM    cx cy cz r^2 (the sphere fold stream)
      gatT      [16, P+T] VMEM one-hot payload gather: color(3),
                illuminance, aux(3) = sphere center | tri unit normal,
                brdf_param, brdf_kind, sphere radius (VJP geom)
      plane_tab [M, 12] SMEM
      tri_tab   [T, 10] SMEM   v0(3) e1(3) e2(3) en = 1e-6 * |e1 x e2|
                (the Möller–Trumbore stream; e1/e2/en precomputed with
                the same jnp expressions triangle_distances traces, so
                values are identical)
      box_tab   [B, 6] SMEM    lo(3) hi(3) (the branchless-slab stream;
                boxes are BSDF-only emitters so they never enter the
                light table)
      light_tab [L, 15] SMEM   kind, global prim idx, emission(3),
                center|v0(3), radius(1; tri rows recompute area
                per-lane like _tri_area_sample), e1(3), e2(3)
    """
    P = scene.spheres.count
    M = scene.planes.count
    T = scene.triangles.count
    Bx = scene.boxes.count
    L = len(light_idx)
    pos = scene.spheres.pos
    radius = scene.spheres.radius
    mat = scene.spheres.material
    geom = jnp.stack(
        [pos[:, 0], pos[:, 1], pos[:, 2], radius * radius], axis=-1
    )  # [P, 4] — streamed from SMEM by the scalar fold
    gat_cols = [
        jnp.concatenate(
            [
                mat.color.T,                      # rows 0-2
                mat.illuminance[None, :],         # 3
                pos.T,                            # 4-6
                mat.brdf_param[None, :],          # 7
                mat.brdf_kind.astype(jnp.float32)[None, :],  # 8
                radius[None, :],                  # 9 (VJP geom derivation)
                jnp.zeros((6, P), jnp.float32),
            ],
            axis=0,
        )
    ]
    if T:
        tr = scene.triangles
        tm = tr.material
        e1 = tr.v1 - tr.v0
        e2 = tr.v2 - tr.v0
        n = jnp.cross(e1, e2)
        # hit_from_t_prim's triangle normal: normalize_safe(cross) —
        # identical expression, identical value.
        n_unit = n / jnp.maximum(
            jnp.sqrt(jnp.sum(n * n, axis=-1)), 1e-20
        )[..., None]
        gat_cols.append(
            jnp.concatenate(
                [
                    tm.color.T,
                    tm.illuminance[None, :],
                    n_unit.T,                     # aux = unit normal
                    tm.brdf_param[None, :],
                    tm.brdf_kind.astype(jnp.float32)[None, :],
                    jnp.zeros((7, T), jnp.float32),
                ],
                axis=0,
            )
        )
        n_norm = jnp.sqrt(jnp.sum(n * n, axis=-1))
        tri_tab = jnp.concatenate(
            [
                tr.v0, e1, e2,
                (PLANE_DENOM_EPS * n_norm)[:, None],
            ],
            axis=-1,
        )  # [T, 10]
    else:
        tri_tab = jnp.zeros((1, 10), jnp.float32)
    if Bx:
        bxs = scene.boxes
        bm = bxs.material
        gat_cols.append(
            jnp.concatenate(
                [
                    bm.color.T,
                    bm.illuminance[None, :],
                    bxs.lo.T,                     # aux = lo corner
                    bm.brdf_param[None, :],
                    bm.brdf_kind.astype(jnp.float32)[None, :],
                    jnp.zeros((1, Bx), jnp.float32),
                    bxs.hi.T,                     # rows 10-12 = hi corner
                    jnp.zeros((3, Bx), jnp.float32),
                ],
                axis=0,
            )
        )
        box_tab = jnp.concatenate([bxs.lo, bxs.hi], axis=-1)  # [B, 6]
    else:
        box_tab = jnp.zeros((1, 6), jnp.float32)
    gatT = jnp.concatenate(gat_cols, axis=-1)  # [16, P+T+B]

    if M:
        pm = scene.planes.material
        plane_tab = jnp.concatenate(
            [
                scene.planes.pos,
                scene.planes.normal,
                pm.color,
                pm.illuminance[:, None],
                pm.brdf_param[:, None],
                pm.brdf_kind.astype(jnp.float32)[:, None],
            ],
            axis=-1,
        )  # [M, 12]
    else:
        plane_tab = jnp.zeros((1, 12), jnp.float32)

    if L:
        li = np.asarray(light_idx, np.int64)
        rows = []
        for i in li:
            if i < P:
                s = int(i)
                rows.append(
                    jnp.concatenate(
                        [
                            jnp.zeros((1,), jnp.float32),  # kind = sphere
                            jnp.full((1,), np.float32(s)),  # global prim
                            mat.color[s] * mat.illuminance[s],
                            pos[s],
                            radius[s][None],
                            jnp.zeros((6,), jnp.float32),
                        ]
                    )
                )
            else:
                k = int(i) - P
                tr = scene.triangles
                tm = tr.material
                gidx = P + M + Bx + k  # global prim index space
                rows.append(
                    jnp.concatenate(
                        [
                            jnp.ones((1,), jnp.float32),  # kind = tri
                            jnp.full((1,), np.float32(gidx)),
                            tm.color[k] * tm.illuminance[k],
                            tr.v0[k],
                            jnp.zeros((1,), jnp.float32),
                            tr.v1[k] - tr.v0[k],
                            tr.v2[k] - tr.v0[k],
                        ]
                    )
                )
        light_tab = jnp.stack(rows)  # [L, 15]
    else:
        light_tab = jnp.zeros((1, 15), jnp.float32)
    return geom, gatT, plane_tab, tri_tab, box_tab, light_tab


def _trace_nee_from_tables(
    geom, gatT, plane_tab, tri_tab, box_tab, light_tab, ray_o, ray_d,
    rng_state,
    *, num_spheres, num_planes, num_tris, num_boxes, num_lights,
    has_glossy, has_diel, num_bounces, spp, block_r=DEFAULT_BLOCK_R,
    interpret=False, block_skip=True, unroll=32, presort=None,
    regenerate=None, telemetry=False, grad_residuals=False,
):
    """The fused NEE trace at the table level (everything after the scene
    packing of `trace_physical_nee_pallas`).  With `telemetry` (requires
    the regeneration discipline) a third output [H, W] i32 counts each
    lane's realized work — bounces actually processed across its
    samples."""
    shape = rng_state.shape[:-1]
    n = int(np.prod(shape))
    P, M, L = num_spheres, num_planes, num_lights
    T = num_tris
    Bx = num_boxes
    rays_origin, rays_direction = ray_o, ray_d

    # Rays are laid out [8, N/8]: 8 sublane groups x lane columns; a
    # grid block is a column slice (8, block_r) = 8 * block_r rays.
    blocks = -(-n // (8 * block_r))
    pad_n = blocks * 8 * block_r
    pad = pad_n - n
    cols = pad_n // 8

    def plane2d(f, fill=0):
        f = jnp.concatenate([f, jnp.full((pad,), fill, f.dtype)])
        return f.reshape(8, cols)

    flat_ins = (
        [rays_origin[..., i].reshape(-1) for i in range(3)]
        + [rays_direction[..., i].reshape(-1) for i in range(3)]
        + [rng_state[..., i].reshape(-1) for i in range(4)]
    )

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

    if grad_residuals:
        assert not telemetry, "grad residuals exclude telemetry"
        regenerate = False  # static (sample, bounce) indices required
        # presort is mechanically compatible (the residual planes ride
        # the generic output unpermute, bit-identically) but DISABLED:
        # at 2M lanes x 64 residual planes XLA:TPU's buffer assignment
        # materializes the [lanes, 71]-wide packed unpermute dozens of
        # times and the jitted step OOMs HBM at 71.7 GB (measured,
        # round 5 — PERF.md "sorted gradient mode").  A sorted gradient
        # frame wants the permutation OUTSIDE the kernel boundary with
        # residuals kept sorted; priced but not built this round.
        presort = False
    if telemetry and regenerate is None:
        regenerate = True  # the steps counter lives in the regen loop
    if regenerate is None:
        # Auto: regeneration pays where the fold dominates and paths die
        # early (large scenes); on Cornell-class scenes it costs ~4% of
        # per-step bookkeeping (measured, config 6) with nothing to skip.
        # It also needs samples to regenerate INTO: measured on the
        # config-4 scene at 512x512 (Mrays/s, fwd only) — spp=1: legacy
        # 65.5 vs regen 40.8; spp=4: regen 68.6 vs legacy 66.3; spp=8:
        # regen+sort 87.7.  spp=1 is the gradient-step regime, where the
        # while-loop bookkeeping is pure overhead.
        regenerate = P >= 64 and spp >= 4
    if presort is None:
        # Sort when the fold dominates (large P).  Under regeneration a
        # block's step count is its BUSIEST lane's total path length:
        # depth-sorting by primary-hit distance makes blocks
        # workload-homogeneous (sky lanes — zero work — land together at
        # the end).  Measured on the BASELINE config-4 population: block
        # work 2.81x the lane-mean under raster order, 1.82x under the
        # t0 sort (an oracle sort by realized work reaches 1.00x; t0
        # matches sorting by work measured over 1-4 probe samples).
        # Under the legacy discipline the same sort makes sky-dead lanes
        # contiguous so whole blocks skip.  The probe + argsort + two
        # packed permutes are per-dispatch costs amortized by spp:
        # measured break-even is between 4 and 8 samples (same sweep as
        # the regenerate gate above).
        presort = P >= 64 and spp >= 8
    pos = None
    primary_ins = []

    def bitcast(a, dt):
        return jax.lax.bitcast_convert_type(a, dt)

    def permute_packed(flats, g, n_out):
        """Apply the lane permutation `g` to many same-length f32-width
        arrays with ONE row gather: XLA's per-array 1D gathers measure
        ~44 ms each at 2M lanes on v5e; a packed [n, k] row gather is
        ~78 ms TOTAL."""
        cols_ = [
            a if a.dtype == jnp.float32 else bitcast(a, jnp.float32)
            for a in flats
        ]
        packed = jnp.stack(cols_, axis=-1)[g]
        return [
            packed[:, i]
            if flats[i].dtype == jnp.float32
            else bitcast(packed[:, i], flats[i].dtype)
            for i in range(n_out)
        ]

    if presort:
        # Primary hits are deterministic per pixel, so one probe fold
        # classifies every lane for ALL samples; the kernel consumes the
        # probe's (t0, prim0) directly (primary_inputs) so the fold is
        # not repeated.  Per-pixel results are bit-identical: each lane
        # carries its own RNG/ray state through the permutation.
        t0f, p0f = pl.pallas_call(
            functools.partial(
                _primary_kernel, num_spheres=P, num_planes=M,
                num_tris=T, num_boxes=Bx, unroll=unroll,
            ),
            grid=(blocks,),
            in_specs=[smem_spec(geom), smem_spec(plane_tab),
                      smem_spec(tri_tab), smem_spec(box_tab)]
            + [col_spec] * 6,
            out_specs=[col_spec] * 2,
            out_shape=[
                jax.ShapeDtypeStruct((8, cols), jnp.float32),
                jax.ShapeDtypeStruct((8, cols), jnp.int32),
            ],
            compiler_params=cparams,
            interpret=interpret,
        )(geom, plane_tab, tri_tab, box_tab,
          *[plane2d(f) for f in flat_ins[:6]])
        t0f = t0f.reshape(-1)[:n]
        p0f = p0f.reshape(-1)[:n]
        # Ascending primary depth; INFINITE (sky) sorts last; stable, so
        # equal-depth lanes keep raster adjacency.
        g = jnp.argsort(t0f).astype(jnp.int32)
        pos = jnp.zeros((n,), jnp.int32).at[g].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        # The kernel's lane layout is NOT flat-contiguous: grid block i
        # is the column slice [:, i*R:(i+1)*R] of the [8, cols] plane,
        # i.e. 8 flat segments cols apart.  Sorted ranks must land
        # contiguously IN A BLOCK (that is the whole point of the sort),
        # so rank j maps to block j // 8R, sublane (j % 8R) // R, column
        # offset j % R — and each flat slot therefore reads rank(slot).
        iota_s = jnp.arange(pad_n, dtype=jnp.int32)
        s_, c_ = iota_s // cols, iota_s % cols
        rank = (
            (c_ // block_r) * (8 * block_r)
            + s_ * block_r
            + (c_ % block_r)
        )
        valid = rank < n
        gfull = jnp.where(valid, g[jnp.minimum(rank, n - 1)], 0)

        def lay2d(f, fill=0):
            # Padding slots must be DEAD: t0 fills with INFINITE (a zero
            # fill would run full garbage paths every sample).
            return jnp.where(
                valid, f, jnp.asarray(fill, f.dtype)
            ).reshape(8, cols)

        sorted_all = permute_packed(flat_ins + [t0f, p0f], gfull, 12)
        comp_ins = [lay2d(f) for f in sorted_all[:10]] + [
            lay2d(sorted_all[10], fill=INFINITE),
            lay2d(sorted_all[11]),
        ]
    else:
        comp_ins = [plane2d(f) for f in flat_ins] + primary_ins

    kernel = functools.partial(
        _nee_kernel,
        spp=spp,
        num_bounces=num_bounces,
        num_spheres=P,
        num_planes=M,
        num_tris=T,
        num_boxes=Bx,
        num_lights=L,
        has_glossy=has_glossy,
        has_diel=has_diel,
        block_skip=block_skip,
        unroll=unroll,
        primary_inputs=presort,
        regenerate=regenerate,
        telemetry=telemetry,
        grad_residuals=grad_residuals,
    )
    n_gr = 2 * spp * num_bounces * int(grad_residuals)
    n_out = 7 + int(telemetry) + n_gr
    out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[
            smem_spec(geom),
            table_spec(gatT),
            smem_spec(plane_tab),
            smem_spec(tri_tab),
            smem_spec(box_tab),
            smem_spec(light_tab),
        ]
        + [col_spec] * len(comp_ins),
        out_specs=[col_spec] * n_out,
        out_shape=(
            [jax.ShapeDtypeStruct((8, cols), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((8, cols), jnp.uint32)] * 4
            + [jax.ShapeDtypeStruct((8, cols), jnp.int32)]
            * (int(telemetry) + n_gr)
        ),
        # Large-P folds keep ~6 [P, R] f32 intermediates live (l vector,
        # |l|^2, fold temporaries, one-hot) — ~26 MB at P=1000, R=512,
        # past the compiler's default 16 MB scoped-vmem cap but well
        # inside the chip's physical VMEM.
        compiler_params=cparams,
        interpret=interpret,
    )(geom, gatT, plane_tab, tri_tab, box_tab, light_tab, *comp_ins)

    if pos is not None:
        # Undo the presort: lane i's result sits at rank pos[i], whose
        # [8, cols] slot is block-contiguous (see rank(slot) above); one
        # packed row gather recovers all seven outputs.
        j = pos
        oidx = (
            ((j % (8 * block_r)) // block_r) * cols
            + (j // (8 * block_r)) * block_r
            + (j % block_r)
        )
        flats_out = permute_packed(
            [a.reshape(-1) for a in out], oidx, n_out
        )
    else:
        flats_out = [a.reshape(-1)[:n] for a in out]

    rad = jnp.stack(flats_out[:3], axis=-1).reshape(*shape, 3)
    rng_out = jnp.stack(flats_out[3:7], axis=-1).reshape(*shape, 4)
    if telemetry:
        return rad, rng_out, flats_out[7].reshape(*shape)
    if grad_residuals:
        gr = [f.reshape(*shape) for f in flats_out[7:]]
        nb = spp * num_bounces
        return rad, rng_out, (gr[:nb], gr[nb:])
    return rad, rng_out
