"""Pure-numpy per-lane oracle for the physical/NEE estimator.

The round-3 differential-fuzz triangle (JAX / numpy / C++) covered only
the parity/inline estimator; this module extends the independent-oracle
surface to the estimator users are told to prefer:
`render/nee.py:trace_physical(nee=True, fused=False)` — corrected BRDFs
(true Lambertian cosine sampling, mirror glossy, Fresnel glass) plus
next-event estimation with sphere cone sampling and triangle area
sampling (VERDICT r3 item 6).

Scope: spheres + planes + triangles (the NEE-relevant primitive set;
`_light_fields`' mask spans spheres ++ triangles).  Shares the SFC32 twin
with `oracle_np` but none of the JAX path's code: every formula is
re-implemented from the spec in vectorized float32 numpy, so structural
bugs on either side surface as per-lane mismatches at matched RNG.

Formula anchors (re-derived, not imported):
  * cosine hemisphere over a Duff et al. ONB — render/nee.py:59-84;
  * Fresnel glass — ops/brdf.py:dielectric_split (Schlick, TIR);
  * cone / triangle-area light sampling with the 1/num_lights fold and
    the min_d2 self-sampling guard — render/nee.py:172-294;
  * emission-collection rule (planes are BSDF-only emitters; spheres and
    triangles count only off specular chains) — render/nee.py:560-581;
  * intersection accept/reject sets — ops/intersect.py (sphere, plane,
    one-sided Möller-Trumbore triangle).
"""

from __future__ import annotations

import numpy as np

from .oracle_np import _dot, _gen_vec, _normalize

F = np.float32
PI = F(np.pi)
TWO_PI = F(2.0 * np.pi)
INFINITE = np.finfo(np.float32).max
EPSILON = F(0.002)
BRDF_MATTE, BRDF_GLOSSY, BRDF_DIELECTRIC = 0, 1, 2


def _scene_np(scene):
    """Scene -> numpy SoA; primitive index space: spheres ++ planes ++
    triangles (matching ops/intersect.py:nearest_hit with no boxes)."""
    sp, pl, tr = scene.spheres, scene.planes, scene.triangles
    assert scene.boxes.count == 0, "NEE oracle covers spheres+planes+tris"
    v0 = np.asarray(tr.v0, F).reshape(-1, 3)
    v1 = np.asarray(tr.v1, F).reshape(-1, 3)
    v2 = np.asarray(tr.v2, F).reshape(-1, 3)
    tn = np.cross(v1 - v0, v2 - v0).astype(F)
    tn_norm = np.linalg.norm(tn, axis=-1).astype(F)
    cat = lambda f: np.concatenate(
        [
            np.asarray(getattr(sp.material, f), F),
            np.asarray(getattr(pl.material, f), F),
            np.asarray(getattr(tr.material, f), F),
        ]
    )
    return {
        "s_pos": np.asarray(sp.pos, F).reshape(-1, 3),
        "s_rad": np.asarray(sp.radius, F).reshape(-1),
        "p_pos": np.asarray(pl.pos, F).reshape(-1, 3),
        "p_nor": np.asarray(pl.normal, F).reshape(-1, 3),
        "t_v0": v0,
        "t_e1": v1 - v0,
        "t_e2": v2 - v0,
        "t_n": tn,
        "t_n_norm": tn_norm,
        "t_n_unit": tn / np.maximum(tn_norm, F(1e-20))[:, None],
        "color": cat("color"),
        "illum": cat("illuminance"),
        "kind": np.concatenate(
            [
                np.asarray(sp.material.brdf_kind),
                np.asarray(pl.material.brdf_kind),
                np.asarray(tr.material.brdf_kind),
            ]
        ),
        "param": cat("brdf_param"),
    }


def _nearest(o, d, S, reject=F(0)):
    """checkHit over spheres ++ planes ++ triangles.  `reject` is the
    acceptance floor: 0 for camera rays, EPSILON from a shade point (the
    physical/NEE family's shade-frame convention — queries start AT the
    hit point, matching ops/intersect.py's `reject_below` and the Pallas
    folds' `t >= eps` accept)."""
    ns, npl = S["s_pos"].shape[0], S["p_pos"].shape[0]
    parts = []
    if ns:
        l = S["s_pos"] - o[..., None, :]
        tca = _dot(l, d[..., None, :])
        d2 = _dot(l, l) - tca * tca
        r2 = S["s_rad"] * S["s_rad"]
        with np.errstate(invalid="ignore"):
            thc = np.sqrt(np.maximum(r2 - d2, F(1e-12)))
        t = tca - thc
        parts.append(
            np.where(
                (tca < reject) | (d2 > r2) | (t < reject), INFINITE, t
            )
        )
    if npl:
        denom = _dot(d[..., None, :], S["p_nor"])
        num = _dot(S["p_pos"] - o[..., None, :], S["p_nor"])
        with np.errstate(divide="ignore", invalid="ignore"):
            dist = num / np.where(denom == 0, F(5e-7), denom)
        parts.append(
            np.where((denom > F(1e-6)) | (dist < reject), INFINITE, dist)
        )
    nt = S["t_v0"].shape[0]
    if nt:
        # One-sided Möller-Trumbore (ops/intersect.py:triangle_distances).
        dv = d[..., None, :]
        pvec = np.cross(dv, S["t_e2"]).astype(F)
        det = _dot(S["t_e1"], pvec)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_det = F(1) / np.where(np.abs(det) < F(1e-30), F(1e-30), det)
        tvec = o[..., None, :] - S["t_v0"]
        u = _dot(tvec, pvec) * inv_det
        qvec = np.cross(tvec, S["t_e1"]).astype(F)
        v = _dot(dv, qvec) * inv_det
        t = _dot(S["t_e2"], qvec) * inv_det
        miss = (
            (det <= F(1e-6) * S["t_n_norm"])
            | (u < 0)
            | (v < 0)
            | (u + v > 1)
            | (t < reject)
        )
        parts.append(np.where(miss, INFINITE, t))
    allt = np.concatenate(parts, axis=-1)
    prim = np.argmin(allt, axis=-1)
    t = np.take_along_axis(allt, prim[..., None], axis=-1)[..., 0]
    hit = t < INFINITE
    point = o + d * np.where(hit, t, F(0))[..., None]

    normal = np.zeros_like(point)
    is_s = prim < ns
    if ns:
        s_idx = np.minimum(prim, ns - 1)
        normal = np.where(
            is_s[..., None], _normalize(point - S["s_pos"][s_idx]), normal
        )
    if npl:
        is_p = (prim >= ns) & (prim < ns + npl)
        p_idx = np.clip(prim - ns, 0, npl - 1)
        normal = np.where(is_p[..., None], S["p_nor"][p_idx], normal)
    if nt:
        is_t = prim >= ns + npl
        t_idx = np.clip(prim - ns - npl, 0, nt - 1)
        normal = np.where(is_t[..., None], S["t_n_unit"][t_idx], normal)
    return {
        "t": t,
        "hit": hit,
        "prim": prim,
        "point": point,
        "normal": normal,
        "color": S["color"][prim],
        "illum": S["illum"][prim],
        "kind": S["kind"][prim],
        "param": S["param"][prim],
    }


def _onb(w):
    """Duff et al. branchless ONB (render/nee.py:_orthonormal_basis)."""
    z = w[..., 2]
    sign = np.where(z >= 0, F(1), F(-1))
    a = F(-1) / (sign + z)
    b = w[..., 0] * w[..., 1] * a
    b1 = np.stack(
        [F(1) + sign * w[..., 0] ** 2 * a, sign * b, -sign * w[..., 0]], -1
    ).astype(F)
    b2 = np.stack([b, sign + w[..., 1] ** 2 * a, -w[..., 1]], -1).astype(F)
    return b1, b2


def _cosine_hemisphere(normal, u1, u2):
    r = np.sqrt(u1)
    phi = TWO_PI * u2
    x, y = r * np.cos(phi), r * np.sin(phi)
    z = np.sqrt(np.maximum(F(1) - u1, F(1e-12)))
    b1, b2 = _onb(normal)
    return (
        b1 * x[..., None] + b2 * y[..., None] + normal * z[..., None]
    ).astype(F)


def _reflect(d, n):
    return d - F(2) * _dot(d, n)[..., None] * n


def _physical_bounce(h, d, u1, u2, u3):
    """render/nee.py:_physical_bounce — direction + (origin, tmod, spec)."""
    direction = _cosine_hemisphere(h["normal"], u1, u2)
    is_g = h["kind"] == BRDF_GLOSSY
    is_d = h["kind"] == BRDF_DIELECTRIC
    direction = np.where(is_g[..., None], _reflect(d, h["normal"]), direction)

    # dielectric_split (ops/brdf.py:61-96) + u3 branch choice
    n0 = h["normal"]
    cos_i = -_dot(d, n0)
    inside = cos_i < 0
    n = np.where(inside[..., None], -n0, n0)
    cos_i = np.abs(cos_i)
    ior = h["param"]
    eta = np.where(inside, ior, F(1) / ior)
    sin2 = eta * eta * np.maximum(F(1) - cos_i * cos_i, F(0))
    tir = sin2 > 1
    cos_t = np.where(tir, F(0), np.sqrt(np.where(tir, F(1), np.maximum(F(1) - sin2, F(1e-12)))))
    r0 = ((F(1) - ior) / (F(1) + ior)) ** 2
    fres = r0 + (F(1) - r0) * (F(1) - cos_i) ** 5
    f_refl = np.where(tir, F(1), fres)
    refl = _reflect(d, n)
    refr_raw = eta[..., None] * d + (eta * cos_i - cos_t)[..., None] * n
    rn = np.maximum(
        np.linalg.norm(refr_raw, axis=-1).astype(F), F(1e-20)
    )
    refr = refr_raw / rn[..., None]
    diel_dir = np.where((u3 < f_refl)[..., None], refl, refr)
    direction = np.where(is_d[..., None], diel_dir, direction)

    # Shade-frame convention: the next ray starts AT the hit point.
    is_spec = is_g | is_d
    return h["point"], direction.astype(F), h["color"], is_spec


def _cone_sample(center, radius, point, u1, u2):
    # Robust one-minus forms (render/nee.py:_cone_sample round-5 note):
    # omc = 1 - cos_max = sin2/(1 + cos_max); st2 = x * (1 + cos_t).
    to_c = center - point
    dc2 = _dot(to_c, to_c)
    dc = np.sqrt(np.maximum(dc2, F(1e-12)))
    sin2_max = np.clip(radius * radius / np.maximum(dc2, F(1e-12)), F(0), F(1))
    on = sin2_max >= 1
    cos_max = np.where(on, F(0), np.sqrt(np.where(on, F(1), F(1) - sin2_max)))
    omc = np.where(on, F(1), sin2_max / (F(1) + cos_max))
    x = u1 * omc
    cos_t = F(1) - x
    st2 = x * (F(1) + cos_t)
    ok = st2 > 0
    sin_t = np.where(ok, np.sqrt(np.where(ok, st2, F(1))), F(0))
    phi = TWO_PI * u2
    w = to_c / dc[..., None]
    b1, b2 = _onb(w)
    direction = (
        b1 * (sin_t * np.cos(phi))[..., None]
        + b2 * (sin_t * np.sin(phi))[..., None]
        + w * cos_t[..., None]
    ).astype(F)
    return direction, (TWO_PI * omc).astype(F)


def _tri_area_sample(S, t_idx, point, u1, u2):
    v0 = S["t_v0"][t_idx]
    e1, e2 = S["t_e1"][t_idx], S["t_e2"][t_idx]
    n = np.cross(e1, e2).astype(F)
    n_norm = np.sqrt(np.maximum(_dot(n, n), F(1e-20)))
    n_unit = n / n_norm[..., None]
    area = F(0.5) * n_norm
    r1s = np.sqrt(np.maximum(u1, F(1e-12)))
    bu, bv = F(1) - r1s, u2 * r1s
    q = v0 + e1 * bu[..., None] + e2 * bv[..., None]
    to_q = q - point
    d2 = np.maximum(_dot(to_q, to_q), F(1e-12))
    direction = to_q / np.sqrt(d2)[..., None]
    cos_l = -_dot(direction, n_unit)
    min_d2 = F((2.0 * 0.002) ** 2)
    inv_pdf = np.where(
        (cos_l > F(1e-6)) & (d2 >= min_d2), area * cos_l / d2, F(0)
    )
    return direction.astype(F), inv_pdf


def _sphere_t_single(point, l_dir, center, radius):
    """render/nee.py:_sphere_t_single — distance to ONE sphere per lane
    with shade-frame acceptance (tca >= eps, t >= eps); INFINITE miss."""
    l = center - point
    tca = _dot(l, l_dir)
    d2 = _dot(l, l) - tca * tca
    r2 = radius * radius
    outside = d2 > r2
    with np.errstate(invalid="ignore"):
        thc = np.where(
            outside, F(0),
            np.sqrt(np.where(outside, F(1), np.maximum(r2 - d2, F(1e-12)))),
        )
    t = tca - thc
    miss = (tca < EPSILON) | outside | (t < EPSILON)
    return np.where(miss, INFINITE, t).astype(F)


def _tri_t_single(S, t_idx, point, l_dir):
    """render/nee.py:_tri_t_single — MT distance to the SELECTED triangle
    with t >= EPSILON acceptance."""
    v0 = S["t_v0"][t_idx]
    e1, e2 = S["t_e1"][t_idx], S["t_e2"][t_idx]
    pvec = np.cross(l_dir, e2).astype(F)
    det = _dot(e1, pvec)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_det = F(1) / np.where(np.abs(det) < F(1e-30), F(1e-30), det)
    tvec = point - v0
    u = _dot(tvec, pvec) * inv_det
    qvec = np.cross(tvec, e1).astype(F)
    v = _dot(l_dir, qvec) * inv_det
    t = _dot(e2, qvec) * inv_det
    n_norm = S["t_n_norm"][t_idx]
    miss = (
        (det <= F(1e-6) * n_norm)
        | (u < 0)
        | (v < 0)
        | (u + v > 1)
        | (t < EPSILON)
    )
    return np.where(miss, INFINITE, t).astype(F)


def _shadow_occluded(S, point, l_dir, t_l, exclude_prim):
    """ops/intersect.py:shadow_occluded — any-occluder test in
    [EPSILON, t_l): spheres via the sqrt-free forms (the Pallas dual
    fold's shadow side), planes/triangles via their distance rules."""
    ns, npl = S["s_pos"].shape[0], S["p_pos"].shape[0]
    nt = S["t_v0"].shape[0]
    occ = np.zeros(point.shape[:-1], bool)
    if ns:
        l = S["s_pos"] - point[..., None, :]
        ll = _dot(l, l)
        tca = _dot(l, l_dir[..., None, :])
        r2 = S["s_rad"] * S["s_rad"]
        h = r2 - (ll - tca * tca)
        a1 = tca - EPSILON
        a2 = tca - t_l[..., None]
        iota = np.arange(ns)
        # t_l = INFINITE lanes make a2*a2 overflow to inf (harmless: the
        # a2 < 0 disjunct already decides them); silence the warning.
        with np.errstate(over="ignore"):
            occ = (
                (h >= 0)
                & (a1 >= 0)
                & (a1 * a1 >= h)
                & ((a2 < 0) | (a2 * a2 < h))
                & (iota != exclude_prim[..., None])
            ).any(-1)
    if npl:
        denom = _dot(l_dir[..., None, :], S["p_nor"])
        num = _dot(S["p_pos"] - point[..., None, :], S["p_nor"])
        with np.errstate(divide="ignore", invalid="ignore"):
            dist = num / np.where(denom == 0, F(5e-7), denom)
        pd = np.where((denom > F(1e-6)) | (dist < 0), INFINITE, dist)
        occ = occ | ((pd >= EPSILON) & (pd < t_l[..., None])).any(-1)
    if nt:
        dv = l_dir[..., None, :]
        pvec = np.cross(dv, S["t_e2"]).astype(F)
        det = _dot(S["t_e1"], pvec)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_det = F(1) / np.where(np.abs(det) < F(1e-30), F(1e-30), det)
        tvec = point[..., None, :] - S["t_v0"]
        u = _dot(tvec, pvec) * inv_det
        qvec = np.cross(tvec, S["t_e1"]).astype(F)
        v = _dot(dv, qvec) * inv_det
        t = _dot(S["t_e2"], qvec) * inv_det
        miss = (
            (det <= F(1e-6) * S["t_n_norm"])
            | (u < 0)
            | (v < 0)
            | (u + v > 1)
            | (t < EPSILON)
        )
        td = np.where(miss, INFINITE, t)
        iota = ns + npl + np.arange(nt)
        occ = occ | (
            (td < t_l[..., None]) & (iota != exclude_prim[..., None])
        ).any(-1)
    return occ


def _sample_light(S, point, u_sel, u1, u2):
    """render/nee.py:sample_light — uniform emitter pick over spheres ++
    triangles via the cdf-argmax rank rule, then cone/area sampling.
    Also returns the selected emitter's distance t_l and emission."""
    ns, npl = S["s_pos"].shape[0], S["p_pos"].shape[0]
    nt = S["t_v0"].shape[0]
    mask = np.concatenate(
        [S["illum"][:ns] > 0]
        + ([S["illum"][ns + npl :] > 0] if nt else [])
    )
    count = F(mask.astype(F).sum())
    cdf = np.cumsum(mask.astype(F)).astype(F)
    rank = np.clip(
        np.floor(u_sel * count) + F(1), F(1), max(count, F(1))
    )
    light_idx = np.argmax(cdf[None, ...] >= rank[..., None], axis=-1)

    if nt:
        is_tri = light_idx >= ns
        s_idx = np.clip(light_idx, 0, max(ns - 1, 0))
        t_idx = np.clip(light_idx - ns, 0, nt - 1)
        dir_s, sa_s = _cone_sample(
            S["s_pos"][s_idx], S["s_rad"][s_idx], point, u1, u2
        )
        dir_t, ip_t = _tri_area_sample(S, t_idx, point, u1, u2)
        direction = np.where(is_tri[..., None], dir_t, dir_s)
        inv_pdf_dir = np.where(is_tri, ip_t, sa_s)
        light_prim = np.where(is_tri, ns + npl + t_idx, s_idx)
        t_l = np.where(
            is_tri,
            _tri_t_single(S, t_idx, point, direction),
            _sphere_t_single(
                point, direction, S["s_pos"][s_idx], S["s_rad"][s_idx]
            ),
        )
        l_emit = np.where(
            is_tri[..., None],
            S["color"][ns + npl + t_idx]
            * S["illum"][ns + npl + t_idx][..., None],
            S["color"][s_idx] * S["illum"][s_idx][..., None],
        )
    else:
        direction, inv_pdf_dir = _cone_sample(
            S["s_pos"][light_idx], S["s_rad"][light_idx], point, u1, u2
        )
        light_prim = light_idx
        t_l = _sphere_t_single(
            point, direction, S["s_pos"][light_idx], S["s_rad"][light_idx]
        )
        l_emit = (
            S["color"][light_idx] * S["illum"][light_idx][..., None]
        )
    valid = (count > 0) & (inv_pdf_dir > F(1e-9))
    inv_pdf = np.where(valid, inv_pdf_dir * count, F(0))
    return direction, inv_pdf, light_prim, t_l, l_emit.astype(F)


def trace_physical_np(scene, o, d, rng_state, num_bounces):
    """Per-lane twin of trace_physical(nee=True, fused=False); returns
    (radiance, rng)."""
    S = _scene_np(scene)
    ns, npl = S["s_pos"].shape[0], S["p_pos"].shape[0]
    state = np.asarray(rng_state).copy()
    o = np.asarray(o, F).copy()
    d = np.asarray(d, F).copy()
    result = np.zeros_like(o)
    throughput = np.ones_like(o)
    prev_spec = np.ones(o.shape[:-1], bool)
    # Shade-frame loop (one convention across the family): carry the
    # NEXT bounce's nearest hit, queried from the unshifted hit point
    # with the EPSILON acceptance floor.
    h = _nearest(o, d, S)
    for _ in range(num_bounces):
        dead = (_dot(throughput, throughput) <= F(1e-6)) | ~h["hit"]

        is_bsdf_only = (h["prim"] >= ns) & (h["prim"] < ns + npl)
        take = prev_spec | is_bsdf_only
        emit = h["color"] * h["illum"][..., None] * throughput
        new_result = result + np.where(take[..., None], emit, F(0))

        u, state2 = _gen_vec(state)  # 3 draws in [-1, 1]
        _, next_d, tmod, is_spec = _physical_bounce(
            h, d,
            (u[..., 0] + F(1)) * F(0.5),
            (u[..., 1] + F(1)) * F(0.5),
            (u[..., 2] + F(1)) * F(0.5),
        )

        un, state2 = _gen_vec(state2)
        us = (un + F(1)) * F(0.5)
        l_dir, inv_pdf, l_prim, t_l, l_emit = _sample_light(
            S, h["point"], us[..., 0], us[..., 1], us[..., 2]
        )
        cos_i = _dot(l_dir, h["normal"])
        occ = _shadow_occluded(S, h["point"], l_dir, t_l, l_prim)
        visible = ~occ & (t_l < INFINITE)
        w = visible & (h["kind"] == BRDF_MATTE) & (cos_i > 0)
        contrib = (
            throughput
            * (h["color"] / PI)
            * l_emit
            * (cos_i * inv_pdf)[..., None]
        )
        new_result = new_result + np.where(w[..., None], contrib, F(0))

        h2 = _nearest(h["point"], next_d, S, reject=EPSILON)

        d3 = dead[..., None]
        o = np.where(d3, o, h["point"])
        d = np.where(d3, d, next_d)
        h = {
            k: np.where(
                dead.reshape(dead.shape + (1,) * (h[k].ndim - dead.ndim)),
                h[k], h2[k],
            )
            for k in h
        }
        state = np.where(dead[..., None], state, state2)
        result = np.where(d3, result, new_result)
        throughput = np.where(d3, F(0), throughput * tmod)
        prev_spec = np.where(dead, prev_spec, is_spec)
    return result, state
