"""Differentiable Pallas TPU megakernel: fused forward + backward sweep.

The XLA differentiable integrator (`trace_inline(differentiable=True)`,
render/integrator.py) rematerializes each bounce under `jax.checkpoint`,
which round-trips the full per-pixel state through HBM once per bounce in
each direction — measured ~100 Mrays/s fwd+bwd at 512x512, 5x below the
5e8 north star (BASELINE.md:26).  This module is the speed-of-light
version: a `jax.custom_vjp` whose

  * **forward** is the existing fused megakernel
    (ops/pallas_megakernel.py) — callers that never differentiate pay
    nothing;
  * **backward** is a second Pallas kernel that re-runs the bounce loop
    *entirely in VMEM*, storing each bounce's input state (ray, throughput)
    and its 3 pre-drawn SFC32 uniforms in on-chip scratch, then sweeps the
    bounces in reverse, pulling the radiance cotangent through one
    `jax.vjp` of the pure per-bounce function (`_bounce_core`) at a time.
    Residuals never touch HBM; the only HBM traffic is reading the primary
    rays / RNG / cotangent once and writing the scene-table and primary-ray
    gradients once.

Differentiation semantics match the XLA path (diff/grad.py docstring):
decisions (hit masks, nearest-prim winner, BRDF branch, RNG draws) are
detached — the random vector is a stored constant of the sweep — and
gradients flow through intersection distances, normals, BRDF weights,
throughput products and emission.  Cross-checked against `jax.grad` of the
XLA integrator and against finite differences in tests/test_pallas_vjp.py.

Gradient outputs: scene tables (geom/mat [P, 8] — mapped back to sphere
position/radius, plane position/normal, material color/illuminance/
brdf_param by the differentiable `_scene_tables` packing) and the primary
rays (enabling camera derivatives through `primary_rays`).

The scene-table cotangents are accumulated across the row-tile grid in the
kernel's SMEM outputs (grid programs run sequentially on a TensorCore, so
revisited output blocks act as accumulators), and across bounces/samples
in scalar carries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_megakernel import (
    _bounce_core,
    _draw_vec,
    _scene_tables,
    _table_rows,
    trace_inline_pallas,
)

# Scratch layout per bounce: 9 state planes (origin, direction, throughput)
# + 3 uniform planes (the bounce's random vector).
_ST_PLANES = 12


def _bwd_kernel(
    geom_ref, mat_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    ra_ref, rb_ref, rc_ref, rctr_ref,
    gr_ref, gg_ref, gb_ref,
    dgeom_ref, dmat_ref,
    dox_ref, doy_ref, doz_ref, ddx_ref, ddy_ref, ddz_ref,
    st,
    *, spp, num_bounces, num_spheres, num_prims, has_dielectric,
    num_boxes=0, num_triangles=0, gcols=8,
):
    geom = geom_ref[:, :]
    mat = mat_ref[:, :]
    rows_g = _table_rows(geom, num_prims, num_cols=gcols)
    rows_m = _table_rows(mat, num_prims)
    flat = tuple(x for row in rows_g for x in row) + tuple(
        x for row in rows_m for x in row
    )
    ncols = num_prims * gcols

    pox, poy, poz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
    pdx, pdy, pdz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
    g_r, g_g, g_b = gr_ref[:, :], gg_ref[:, :], gb_ref[:, :]
    shape = pox.shape
    zeros = jnp.zeros(shape, jnp.float32)
    ones = jnp.ones(shape, jnp.float32)

    def bounce_flat(flat_s, ox, oy, oz, dxx, dyy, dzz, thr, thg, thb,
                    vx, vy, vz):
        """The differentiation unit: one bounce as a function of the flat
        scalar tables + float state, with the random vector closed over as
        a constant by the caller.  Returns the 12 float outputs (next
        origin/direction/throughput + emission); the dead mask (bool) is
        dropped — booleans carry no cotangent."""
        rg = [
            list(flat_s[p * gcols : (p + 1) * gcols])
            for p in range(num_prims)
        ]
        rm = [
            list(flat_s[ncols + p * 8 : ncols + (p + 1) * 8])
            for p in range(num_prims)
        ]
        out = _bounce_core(
            rg, rm, num_spheres, num_prims, has_dielectric,
            ox, oy, oz, dxx, dyy, dzz, thr, thg, thb, vx, vy, vz,
            num_boxes=num_boxes, num_triangles=num_triangles,
        )
        return out[:12]

    def one_sample(_, carry):
        (ra, rb, rc, rctr, d_flat,
         adox, adoy, adoz, addx, addy, addz) = carry

        # ---- forward replay, storing per-bounce residuals in VMEM ----
        ox, oy, oz = pox, poy, poz
        dxx, dyy, dzz = pdx, pdy, pdz
        thr, thg, thb = ones, ones, ones
        for b in range(num_bounces):
            st[b, 0], st[b, 1], st[b, 2] = ox, oy, oz
            st[b, 3], st[b, 4], st[b, 5] = dxx, dyy, dzz
            st[b, 6], st[b, 7], st[b, 8] = thr, thg, thb
            vx, vy, vz, ra2, rb2, rc2, rctr2 = _draw_vec(ra, rb, rc, rctr)
            st[b, 9], st[b, 10], st[b, 11] = vx, vy, vz
            (ox, oy, oz, dxx, dyy, dzz, thr, thg, thb,
             _, _, _, dead) = _bounce_core(
                rows_g, rows_m, num_spheres, num_prims, has_dielectric,
                ox, oy, oz, dxx, dyy, dzz, thr, thg, thb, vx, vy, vz,
                num_boxes=num_boxes, num_triangles=num_triangles,
            )
            # Dead lanes never advance their generator (Trace.hs:364-365).
            ra = jnp.where(dead, ra, ra2)
            rb = jnp.where(dead, rb, rb2)
            rc = jnp.where(dead, rc, rc2)
            rctr = jnp.where(dead, rctr, rctr2)

        # ---- reverse sweep ----
        # After the last bounce the ray and throughput are unused, so their
        # cotangents start at zero; the emission cotangent is the incoming
        # radiance cotangent at EVERY bounce (radiance = sum of emissions).
        c_o = (zeros, zeros, zeros)
        c_d = (zeros, zeros, zeros)
        c_t = (zeros, zeros, zeros)
        for i in range(num_bounces):
            b = num_bounces - 1 - i
            ox_b, oy_b, oz_b = st[b, 0], st[b, 1], st[b, 2]
            dx_b, dy_b, dz_b = st[b, 3], st[b, 4], st[b, 5]
            tr_b, tg_b, tb_b = st[b, 6], st[b, 7], st[b, 8]
            vx_b, vy_b, vz_b = st[b, 9], st[b, 10], st[b, 11]

            f = lambda fl, a, bb, c, d, e, ff, g, h, k: bounce_flat(
                fl, a, bb, c, d, e, ff, g, h, k, vx_b, vy_b, vz_b
            )
            _, vjp_fn = jax.vjp(
                f, flat, ox_b, oy_b, oz_b, dx_b, dy_b, dz_b,
                tr_b, tg_b, tb_b,
            )
            cts = c_o + c_d + c_t + (g_r, g_g, g_b)
            (dflat_b, do1, do2, do3, dd1, dd2, dd3, dt1, dt2, dt3) = vjp_fn(
                cts
            )
            d_flat = tuple(a + bb for a, bb in zip(d_flat, dflat_b))
            c_o = (do1, do2, do3)
            c_d = (dd1, dd2, dd3)
            c_t = (dt1, dt2, dt3)

        return (
            ra, rb, rc, rctr, d_flat,
            adox + c_o[0], adoy + c_o[1], adoz + c_o[2],
            addx + c_d[0], addy + c_d[1], addz + c_d[2],
        )

    d_flat0 = tuple(
        jnp.zeros((), jnp.float32) for _ in range(ncols + num_prims * 8)
    )
    carry0 = (
        ra_ref[:, :], rb_ref[:, :], rc_ref[:, :], rctr_ref[:, :],
        d_flat0, zeros, zeros, zeros, zeros, zeros, zeros,
    )
    carry = jax.lax.fori_loop(0, spp, one_sample, carry0)
    (_, _, _, _, d_flat, adox, adoy, adoz, addx, addy, addz) = carry

    dox_ref[:, :] = adox
    doy_ref[:, :] = adoy
    doz_ref[:, :] = adoz
    ddx_ref[:, :] = addx
    ddy_ref[:, :] = addy
    ddz_ref[:, :] = addz

    # Scene-table gradients accumulate across the (sequential) grid
    # programs in the revisited SMEM output block.
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        for p in range(num_prims):
            for i in range(gcols):
                dgeom_ref[p, i] = 0.0
            for i in range(8):
                dmat_ref[p, i] = 0.0

    for p in range(num_prims):
        for i in range(gcols):
            dgeom_ref[p, i] = dgeom_ref[p, i] + d_flat[p * gcols + i]
        for i in range(8):
            dmat_ref[p, i] = dmat_ref[p, i] + d_flat[ncols + p * 8 + i]


def _bwd_call(
    geom, mat, ray_o, ray_d, rng_state, g_rad,
    *, spp, num_bounces, num_spheres, tile_rows, has_dielectric, interpret,
    num_boxes=0, num_triangles=0,
):
    H, W = rng_state.shape[:2]
    num_prims, gcols = geom.shape
    tile_rows = min(tile_rows, H)
    while H % tile_rows:
        tile_rows //= 2
    # The reverse sweep holds every bounce's residuals in VMEM scratch plus
    # the unrolled per-bounce vjp intermediates — several times the forward
    # kernel's live set per lane — so the column axis is tiled too (the
    # forward kernel streams full rows).  128 = one lane tile.
    tile_cols = min(128, W)
    while W % tile_cols:
        tile_cols //= 2

    planes_in = (
        [ray_o[..., i] for i in range(3)]
        + [ray_d[..., i] for i in range(3)]
        + [rng_state[..., i] for i in range(4)]
        + [g_rad[..., i] for i in range(3)]
    )

    tile_spec = pl.BlockSpec(
        (tile_rows, tile_cols), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    geom_spec = pl.BlockSpec(
        (num_prims, gcols), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec(
        (num_prims, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    smem_geom = pl.BlockSpec(
        (num_prims, gcols), lambda i, j: (0, 0), memory_space=pltpu.SMEM
    )
    smem_mat = pl.BlockSpec(
        (num_prims, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM
    )

    kernel = functools.partial(
        _bwd_kernel,
        spp=spp,
        num_bounces=num_bounces,
        num_spheres=num_spheres,
        num_prims=num_prims,
        has_dielectric=has_dielectric,
        num_boxes=num_boxes,
        num_triangles=num_triangles,
        gcols=gcols,
    )
    out = pl.pallas_call(
        kernel,
        grid=(H // tile_rows, W // tile_cols),
        in_specs=[geom_spec, mat_spec] + [tile_spec] * 13,
        out_specs=[smem_geom, smem_mat] + [tile_spec] * 6,
        out_shape=(
            [jax.ShapeDtypeStruct((num_prims, gcols), jnp.float32)]
            + [jax.ShapeDtypeStruct((num_prims, 8), jnp.float32)]
            + [jax.ShapeDtypeStruct((H, W), jnp.float32)] * 6
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (num_bounces, _ST_PLANES, tile_rows, tile_cols), jnp.float32
            )
        ],
        interpret=interpret,
    )(geom, mat, *planes_in)

    d_geom, d_mat = out[0], out[1]
    d_ray_o = jnp.stack(out[2:5], axis=-1)
    d_ray_d = jnp.stack(out[5:8], axis=-1)
    return d_geom, d_mat, d_ray_o, d_ray_d


@functools.lru_cache(maxsize=64)
def _make_diff_fn(
    spp, num_bounces, num_spheres, tile_rows, bwd_tile_rows, has_dielectric,
    interpret, num_boxes=0, num_triangles=0,
):
    """Build (and cache) the custom-VJP trace for one static config."""

    @jax.custom_vjp
    def f(geom, mat, ray_o, ray_d, rng_state):
        return _fwd_only(geom, mat, ray_o, ray_d, rng_state)

    def _fwd_only(geom, mat, ray_o, ray_d, rng_state):
        # Reuse the production forward kernel through its scene-level entry
        # by faking a minimal table-compatible scene is MORE code than
        # calling the pallas_call again; instead go through the public
        # fwd path at the table level.
        return _fwd_tables(
            geom, mat, ray_o, ray_d, rng_state,
            spp=spp, num_bounces=num_bounces, num_spheres=num_spheres,
            tile_rows=tile_rows, has_dielectric=has_dielectric,
            interpret=interpret,
            num_boxes=num_boxes, num_triangles=num_triangles,
        )

    def fwd(geom, mat, ray_o, ray_d, rng_state):
        out = _fwd_only(geom, mat, ray_o, ray_d, rng_state)
        return out, (geom, mat, ray_o, ray_d, rng_state)

    def bwd(res, cts):
        geom, mat, ray_o, ray_d, rng_state = res
        g_rad, _g_rng = cts  # rng_out is integer: float0 cotangent, unused
        d_geom, d_mat, d_ray_o, d_ray_d = _bwd_call(
            geom, mat, ray_o, ray_d, rng_state, g_rad,
            spp=spp, num_bounces=num_bounces, num_spheres=num_spheres,
            tile_rows=bwd_tile_rows, has_dielectric=has_dielectric,
            interpret=interpret,
            num_boxes=num_boxes, num_triangles=num_triangles,
        )
        d_rng = np.zeros(rng_state.shape, jax.dtypes.float0)
        return d_geom, d_mat, d_ray_o, d_ray_d, d_rng

    f.defvjp(fwd, bwd)
    return f


def _fwd_tables(
    geom, mat, ray_o, ray_d, rng_state,
    *, spp, num_bounces, num_spheres, tile_rows, has_dielectric, interpret,
    num_boxes=0, num_triangles=0,
):
    """The forward megakernel at the (geom, mat) table level — the same
    pallas_call `trace_inline_pallas` makes after `_scene_tables`."""
    from .pallas_megakernel import _megakernel_body

    H, W = rng_state.shape[:2]
    num_prims, gcols = geom.shape
    tile_rows = min(tile_rows, H)
    while H % tile_rows:
        tile_rows //= 2

    planes_in = (
        [ray_o[..., i] for i in range(3)]
        + [ray_d[..., i] for i in range(3)]
        + [rng_state[..., i] for i in range(4)]
    )
    row_spec = pl.BlockSpec(
        (tile_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    geom_spec = pl.BlockSpec(
        (num_prims, gcols), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec(
        (num_prims, 8), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _megakernel_body,
        spp=spp,
        num_bounces=num_bounces,
        num_spheres=num_spheres,
        num_prims=num_prims,
        russian_roulette=False,
        rr_start=3,
        has_dielectric=has_dielectric,
        num_boxes=num_boxes,
        num_triangles=num_triangles,
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


def trace_inline_pallas_diff(
    scene,
    rays,
    rng_state: jnp.ndarray,
    num_bounces: int = 4,
    spp: int = 1,
    tile_rows: int = 8,
    bwd_tile_rows: int | None = None,
    interpret: bool = False,
    has_dielectric: bool | None = None,
):
    """Differentiable fused trace: (radiance_sum [H,W,3], rng_out [H,W,4]),
    with gradients w.r.t. every differentiable Scene leaf (via the
    `_scene_tables` packing — incl. box corners and triangle vertices,
    whose table rows are differentiable functions of the vertices) and
    the primary rays.

    The RNG state is a detached constant of the gradient, exactly as in
    diff/grad.py."""
    if has_dielectric is None:
        has_dielectric = True
    if bwd_tile_rows is None:
        # 16-row backward tiles measured 1.65 vs 1.34 Grays/s fwd+bwd at
        # 512x512/64spp/8b on v5e (the headline shape); 32 rows OOMs the
        # reverse sweep's VMEM stack (_bwd_call already tiles the column
        # axis at 128 — 8 bounces x 8 rows x 512 cols OOMed at 18 MB
        # against the 16 MB scoped limit).
        bwd_tile_rows = 16
    geom, mat = _scene_tables(scene)
    f = _make_diff_fn(
        spp, num_bounces, scene.spheres.count, tile_rows, bwd_tile_rows,
        bool(has_dielectric), interpret,
        num_boxes=scene.boxes.count, num_triangles=scene.triangles.count,
    )
    return f(geom, mat, rays.origin, rays.direction, rng_state)
