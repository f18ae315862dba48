"""Pallas fused node kernel for the raytracer5 family — the whitted5
TPU fast path.

The jnp levelwise tracer (models/whitted5.py whitted5_trace) evaluates
each tree level as full-frame XLA dataflow: every per-node [R, N]
candidate table, every area-light shadow cast (3 box lights x up to 2
jittered samples x N primitives per level) and every select chain
round-trips HBM, which caps room5 800x600 at ~0.4-0.5 Mrays/s on a v5e
chip (r3 BENCH_MATRIX). This kernel fuses ALL the geometric work of one
tree level — nearest-hit over sphere/one-sided-plane/box primitives,
CalcShade Monte-Carlo area-light visibility (raytracer5/trunk/
raytracer.cpp:371-406), Phong-20 local shading terms, glossy disc
sampling (DiffuseRefl, raytracer.cpp:290-319) and refraction directions
(raytracer.cpp:337-359) — into one VMEM-resident pass over [sublanes,
128] ray tiles, with the 23-row scene table on-chip.

What stays OUTSIDE the kernel (driver ``whitted5_trace_pallas``): the
bilinear texture fetches and every color-dependent combine. Mosaic has
no per-lane vector gather, and XLA's gather is HBM-latency-bound (~40 M
amortized fetch/s measured) — so since r5 the fetch runs on the MXU
texel unit (kernels/texel_kernel.py: Texture::GetTexel as one-hot
matmuls against a VMEM-resident atlas, 98-225 M fetch/s, bitwise-equal
for the reference's u8/256 TGA texels), with the XLA gather path kept
as the fallback for mixed-shape textures. The kernel therefore
emits the hit's local shading DECOMPOSED as (A, B) with
``local = A * color(hit) + B``: A is the summed diffuse light term
(which multiplies the texture-modulated surface color), B is the summed
specular term plus the hit-a-light case (Raytrace returning the light's
color, raytracer.cpp:246-252). Child ray weights, Beer transparency
(child-distance semantics, raytracer.cpp:353-356) and the level-to-level
concatenation run as cheap elementwise XLA on the kernel's outputs.

Dead-tile skipping: levels are node-major, so the valid mask is
spatially coherent; a tile whose lanes are all invalid (no reflective or
refractive parent hits) skips the whole node body via one scalar
``pl.when`` — the deep levels of mostly-diffuse frames cost one scalar
test per tile, mirroring how the recursion simply doesn't recurse.

RNG parity: draws use the same counter generator, the same
``_node_key``-mixed per-node keys (computed by the driver exactly like
the jnp path) and the same masked-advancement order (per box light, per
grid sample: u1 then u2; then the glossy pair), so the kernel consumes
streams bit-identically to models/whitted5._shade_node and the fast
path's estimator equals the jnp path's up to float reassociation
(tests/test_whitted5_kernel.py pins it to ~1e-4).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from se195_raytracer_tpu.scenes.whitted5_scenes import (
    BOX5,
    BOX_LIGHT_GRID,
    PLANE5,
    SPHERE5,
    Whitted5Scene,
)
from se195_raytracer_tpu.models.whitted5 import (
    EPSILON5,
    PASS_DRAW_BUDGET,
    TRACEDEPTH5,
    _static_normals,
)

LANES = 128
DEF_SUBLANES = 8
PI = float(np.float32(np.pi))

# Scene table rows (pack_whitted5_scene).
_SC_CX, _SC_CY, _SC_CZ, _SC_RAD = 0, 1, 2, 3
_SC_NX, _SC_NY, _SC_NZ, _SC_DEPTH = 4, 5, 6, 7
_SC_BPX, _SC_BPY, _SC_BPZ = 8, 9, 10
_SC_BSX, _SC_BSY, _SC_BSZ = 11, 12, 13
_SC_COLR, _SC_COLG, _SC_COLB = 14, 15, 16
_SC_REFL, _SC_REFR, _SC_RIDX, _SC_DIFF, _SC_SPEC, _SC_DREFL = (
    17, 18, 19, 20, 21, 22,
)
_SC_SNX, _SC_SNY, _SC_SNZ = 23, 24, 25  # static normal (plane/box)
_SC_RRAD = 26  # 1/radius (guarded) for sphere normals
_SC_N = 27

# Output planes.
_O_IDX, _O_HIT, _O_HITLIGHT, _O_DIST = 0, 1, 2, 3
_O_PX, _O_PY, _O_PZ = 4, 5, 6
_O_AR, _O_AG, _O_AB = 7, 8, 9
_O_BR, _O_BG, _O_BB = 10, 11, 12
_O_RLX, _O_RLY, _O_RLZ, _O_RLOK = 13, 14, 15, 16
_O_RRX, _O_RRY, _O_RRZ, _O_RROK = 17, 18, 19, 20
_O_N = 21


def pack_whitted5_scene(scene: Whitted5Scene) -> jnp.ndarray:
    """[27, N] float32 primitive table. Static normals (plane normal /
    the reference's position-independent Box::GetNormal) and guarded
    reciprocal radii are precomputed host-side."""
    sn = _static_normals(scene)
    rrad = 1.0 / jnp.where(scene.radius != 0.0, scene.radius, 1.0)
    return jnp.concatenate(
        [
            scene.center.T,
            scene.radius[None, :],
            scene.normal.T,
            scene.depth[None, :],
            scene.box_pos.T,
            scene.box_size.T,
            scene.color.T,
            scene.refl[None, :],
            scene.refr[None, :],
            scene.refr_index[None, :],
            scene.diff[None, :],
            scene.spec[None, :],
            scene.drefl[None, :],
            sn.T,
            rrad[None, :],
        ],
        axis=0,
    ).astype(jnp.float32)


def _counter_next(key, ctr):
    """core/rng.py counter_next on vectors (same as pt_kernel)."""
    x = key ^ (ctr * jnp.uint32(0x9E3779B9))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x21F0AAAD)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x735A2D97)
    x = x ^ (x >> 15)
    v = (x >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )
    return v, ctr + jnp.uint32(1)


def _pow20(x):
    """x^20 as a multiply chain (whitted_kernel.py) — jnp.power(x, 20.0)
    lowers to exp/log; the chain is cheaper and agrees to ~1e-6 rel."""
    x2 = x * x
    x5 = x2 * x2 * x
    x10 = x5 * x5
    return x10 * x10


def _make_whitted5_level_kernel(
    n_prims: int,
    ptype: Tuple[int, ...],
    is_light: Tuple[bool, ...],
    n_samp: int,
    glossy_enabled: bool,
    sublanes: int,
):
    """One tree level's node work for a [sublanes, 128] ray tile."""
    eps = float(np.float32(EPSILON5))
    grid_cells = np.asarray(BOX_LIGHT_GRID, np.float32)

    def kernel(scene_ref, rays_ref, key_ref, ctr_ref, ridx_ref, valid_ref,
               out_ref):
        shape = (sublanes, LANES)
        zero = jnp.zeros(shape, jnp.float32)
        one = jnp.ones(shape, jnp.float32)

        def sc(f, j):
            return scene_ref[f, j]

        # Dead-tile skip: outputs zeroed, body predicated on any valid.
        out_ref[:] = jnp.zeros((_O_N,) + shape, jnp.float32)
        tile_live = jnp.max(valid_ref[:]) > 0.5

        @pl.when(tile_live)
        def _body():
            ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
            dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
            key = key_ref[:]
            ctr = ctr_ref[:]
            rindex = ridx_ref[:]
            valid = valid_ref[:] > 0.5

            def draw(ctr, mask):
                v, nctr = _counter_next(key, ctr)
                return v, jnp.where(mask, nctr, ctr)

            def prim_candidate(j, ox, oy, oz, dx, dy, dz):
                """(dist, inprim_flag, valid) for primitive j — the
                models/whitted5._prim_candidates formulas per class."""
                if ptype[j] == SPHERE5:
                    vx = ox - sc(_SC_CX, j)
                    vy = oy - sc(_SC_CY, j)
                    vz = oz - sc(_SC_CZ, j)
                    sb = -(vx * dx + vy * dy + vz * dz)
                    det = sb * sb - (vx * vx + vy * vy + vz * vz) + (
                        sc(_SC_RAD, j) * sc(_SC_RAD, j)
                    )
                    ok = det > 0.0
                    sq = jnp.sqrt(jnp.where(ok, det, 1.0))
                    i1 = sb - sq
                    i2 = sb + sq
                    ok = ok & (i2 > 0.0)
                    inprim = i1 < 0.0
                    return jnp.where(inprim, i2, i1), inprim, ok
                if ptype[j] == PLANE5:
                    pd = sc(_SC_NX, j) * dx + sc(_SC_NY, j) * dy + sc(_SC_NZ, j) * dz
                    no = sc(_SC_NX, j) * ox + sc(_SC_NY, j) * oy + sc(_SC_NZ, j) * oz
                    pd_safe = jnp.where(pd != 0.0, pd, 1.0)
                    dist = -(no + sc(_SC_DEPTH, j)) / pd_safe
                    return dist, zero > 1.0, pd < 0.0
                # Box: six slab faces with a running min
                # (scene.cpp:306-350 semantics via whitted5.py). Masks
                # derive from comparisons only — Mosaic cannot
                # materialize i1 vector constants.
                b_dist = jnp.full(shape, 1e30, jnp.float32)
                b_okf = zero
                o3 = (ox, oy, oz)
                d3 = (dx, dy, dz)
                v1 = [sc(_SC_BPX + a, j) for a in range(3)]
                v2 = [sc(_SC_BPX + a, j) + sc(_SC_BSX + a, j) for a in range(3)]
                for axis in range(3):
                    d_a = d3[axis]
                    d_safe = jnp.where(d_a != 0.0, d_a, 1.0)
                    axis_ok = d_a != 0.0
                    for bound in (v1[axis], v2[axis]):
                        t_f = (bound - o3[axis]) / d_safe
                        inside = axis_ok
                        for a2 in range(3):
                            ip = o3[a2] + t_f * d3[a2]
                            inside = inside & (
                                (ip > v1[a2] - eps) & (ip < v2[a2] + eps)
                            )
                        face_ok = inside & (t_f > 0.0)
                        b_dist = jnp.where(
                            face_ok & (t_f < b_dist), t_f, b_dist
                        )
                        b_okf = jnp.where(face_ok, 1.0, b_okf)
                return b_dist, zero > 1.0, b_okf > 0.5

            def nearest(ox, oy, oz, dx, dy, dz):
                """First-minimum fold in ascending prim order (strict <,
                matching jnp.argmin's first-index tie-break) tracking the
                winner's attributes. Returns dict of [S, 128] planes."""
                st = {
                    "t": jnp.full(shape, jnp.float32(np.inf)),
                    "idx": -one,
                    "code": zero,  # HIT=1 / INPRIM=-1
                    "light": zero,
                    "is_sphere": zero,
                    "cx": zero, "cy": zero, "cz": zero, "rrad": zero,
                    "snx": zero, "sny": zero, "snz": zero,
                    "colr": zero, "colg": zero, "colb": zero,
                    "diff": zero, "spec": zero,
                    "refl": zero, "drefl": zero,
                    "refr": zero, "ridx": zero,
                }
                for j in range(n_prims):
                    dist, inprim, ok = prim_candidate(j, ox, oy, oz, dx, dy, dz)
                    upd = ok & (dist < st["t"])
                    st["t"] = jnp.where(upd, dist, st["t"])
                    st["idx"] = jnp.where(upd, jnp.float32(j), st["idx"])
                    st["code"] = jnp.where(
                        upd, jnp.where(inprim, -one, one), st["code"]
                    )
                    st["light"] = jnp.where(
                        upd, 1.0 if is_light[j] else 0.0, st["light"]
                    )
                    st["is_sphere"] = jnp.where(
                        upd, 1.0 if ptype[j] == SPHERE5 else 0.0,
                        st["is_sphere"],
                    )
                    if ptype[j] == SPHERE5:
                        st["cx"] = jnp.where(upd, sc(_SC_CX, j), st["cx"])
                        st["cy"] = jnp.where(upd, sc(_SC_CY, j), st["cy"])
                        st["cz"] = jnp.where(upd, sc(_SC_CZ, j), st["cz"])
                        st["rrad"] = jnp.where(upd, sc(_SC_RRAD, j), st["rrad"])
                    else:
                        st["snx"] = jnp.where(upd, sc(_SC_SNX, j), st["snx"])
                        st["sny"] = jnp.where(upd, sc(_SC_SNY, j), st["sny"])
                        st["snz"] = jnp.where(upd, sc(_SC_SNZ, j), st["snz"])
                    st["colr"] = jnp.where(upd, sc(_SC_COLR, j), st["colr"])
                    st["colg"] = jnp.where(upd, sc(_SC_COLG, j), st["colg"])
                    st["colb"] = jnp.where(upd, sc(_SC_COLB, j), st["colb"])
                    st["diff"] = jnp.where(upd, sc(_SC_DIFF, j), st["diff"])
                    st["spec"] = jnp.where(upd, sc(_SC_SPEC, j), st["spec"])
                    st["refl"] = jnp.where(upd, sc(_SC_REFL, j), st["refl"])
                    st["drefl"] = jnp.where(upd, sc(_SC_DREFL, j), st["drefl"])
                    st["refr"] = jnp.where(upd, sc(_SC_REFR, j), st["refr"])
                    st["ridx"] = jnp.where(upd, sc(_SC_RIDX, j), st["ridx"])
                return st

            def nearest_is(px, py, pz, sdx, sdy, sdz, maxt, target):
                """CalcShade visibility: the nearest primitive within
                ``maxt`` must be the light itself (occluders include
                other lights — models/whitted5._nearest_is). The winner
                flag is an f32 plane — Mosaic cannot materialize selects
                over i1 vectors."""
                best = jnp.full(shape, jnp.float32(np.inf))
                is_t = zero
                for j in range(n_prims):
                    dist, _, ok = prim_candidate(j, px, py, pz, sdx, sdy, sdz)
                    upd = ok & (dist < best)
                    best = jnp.where(upd, dist, best)
                    is_t = jnp.where(upd, 1.0 if j == target else 0.0, is_t)
                return (best < maxt) & (is_t > 0.5)

            st = nearest(ox, oy, oz, dx, dy, dz)
            hit = st["idx"] >= 0.0
            dist_safe = jnp.where(hit, st["t"], 1.0)
            px = ox + dx * dist_safe
            py = oy + dy * dist_safe
            pz = oz + dz * dist_safe
            hit_light = hit & (st["light"] > 0.5)

            is_sph = st["is_sphere"] > 0.5
            nx = jnp.where(is_sph, (px - st["cx"]) * st["rrad"], st["snx"])
            ny = jnp.where(is_sph, (py - st["cy"]) * st["rrad"], st["sny"])
            nz = jnp.where(is_sph, (pz - st["cz"]) * st["rrad"], st["snz"])

            draw_mask = valid & hit & ~hit_light

            ar, ag, ab = zero, zero, zero
            br, bg, bb = zero, zero, zero
            for li in range(n_prims):
                if not is_light[li]:
                    continue
                if ptype[li] == SPHERE5:
                    lvx = sc(_SC_CX, li) - px
                    lvy = sc(_SC_CY, li) - py
                    lvz = sc(_SC_CZ, li) - pz
                    tdist = jnp.sqrt(
                        jnp.maximum(lvx * lvx + lvy * lvy + lvz * lvz, 1e-30)
                    )
                    ldx, ldy, ldz = lvx / tdist, lvy / tdist, lvz / tdist
                    vis = nearest_is(
                        px + ldx * eps, py + ldy * eps, pz + ldz * eps,
                        ldx, ldy, ldz, tdist, li,
                    )
                    shade = jnp.where(vis, 1.0, 0.0)
                else:
                    # Box area light: n_samp jittered grid samples on the
                    # bottom face (CalcShade, raytracer.cpp:385-404).
                    bpx, bpy, bpz = (
                        sc(_SC_BPX, li), sc(_SC_BPY, li), sc(_SC_BPZ, li)
                    )
                    bsx, bsz = sc(_SC_BSX, li), sc(_SC_BSZ, li)
                    lvx = (bpx + 0.5 * sc(_SC_BSX, li)) - px
                    lvy = (bpy + 0.5 * sc(_SC_BSY, li)) - py
                    lvz = (bpz + 0.5 * bsz) - pz
                    linv = 1.0 / jnp.sqrt(
                        jnp.maximum(lvx * lvx + lvy * lvy + lvz * lvz, 1e-30)
                    )
                    ldx, ldy, ldz = lvx * linv, lvy * linv, lvz * linv
                    deltax = bsx * 0.25
                    deltay = bsz * 0.25
                    shade = zero
                    sscale = jnp.float32(1.0 / n_samp)
                    for i in range(n_samp):
                        u1, ctr = draw(ctr, draw_mask)
                        u2, ctr = draw(ctr, draw_mask)
                        gx = (
                            jnp.float32(grid_cells[i & 15, 0]) * (bsx / 4.0)
                            + bpx + u1 * deltax
                        )
                        gz = (
                            jnp.float32(grid_cells[i & 15, 1]) * (bsz / 4.0)
                            + bpz + u2 * deltay
                        )
                        svx = gx - px
                        svy = bpy - py
                        svz = gz - pz
                        ldist = jnp.sqrt(
                            jnp.maximum(svx * svx + svy * svy + svz * svz, 1e-30)
                        )
                        sdx, sdy, sdz = svx / ldist, svy / ldist, svz / ldist
                        vis = nearest_is(
                            px + sdx * eps, py + sdy * eps, pz + sdz * eps,
                            sdx, sdy, sdz, ldist, li,
                        )
                        shade = shade + jnp.where(vis, sscale, 0.0)

                pos_shade = shade > 0.0
                dnl = ldx * nx + ldy * ny + ldz * nz
                diff_term = jnp.where(
                    pos_shade & (st["diff"] > 0.0) & (dnl > 0.0),
                    dnl * st["diff"] * shade,
                    0.0,
                )
                ar = ar + diff_term * sc(_SC_COLR, li)
                ag = ag + diff_term * sc(_SC_COLG, li)
                ab = ab + diff_term * sc(_SC_COLB, li)
                rvx = ldx - 2.0 * dnl * nx
                rvy = ldy - 2.0 * dnl * ny
                rvz = ldz - 2.0 * dnl * nz
                dvr = dx * rvx + dy * rvy + dz * rvz
                spec_term = jnp.where(
                    pos_shade & (st["spec"] > 0.0) & (dvr > 0.0),
                    _pow20(jnp.maximum(dvr, 0.0)) * st["spec"] * shade,
                    0.0,
                )
                br = br + spec_term * sc(_SC_COLR, li)
                bg = bg + spec_term * sc(_SC_COLG, li)
                bb = bb + spec_term * sc(_SC_COLB, li)

            # local = A * color(hit) + B with the hit-a-light case folded
            # into B (A=0, B=light prim color) and misses zeroed.
            hitf = jnp.where(hit, 1.0, 0.0)
            a_gate = jnp.where(hit_light, 0.0, hitf)
            ar, ag, ab = ar * a_gate, ag * a_gate, ab * a_gate
            br = jnp.where(hit_light, st["colr"], br * a_gate)
            bg = jnp.where(hit_light, st["colg"], bg * a_gate)
            bb = jnp.where(hit_light, st["colb"], bb * a_gate)

            shaded = valid & hit & ~hit_light

            # Reflection child (perfect or glossy disc sample).
            ddn = dx * nx + dy * ny + dz * nz
            rdx = dx - 2.0 * ddn * nx
            rdy = dy - 2.0 * ddn * ny
            rdz = dz - 2.0 * ddn * nz
            if glossy_enabled:
                glossy_ok = shaded & (st["refl"] > 0.0) & (st["drefl"] > 0.0)
            else:
                glossy_ok = zero > 1.0  # all-false mask from a comparison
            u1, ctr = draw(ctr, glossy_ok)
            u2, ctr = draw(ctr, glossy_ok)
            rad = st["drefl"] * jnp.sqrt(u1)
            ang = jnp.float32(2.0 * PI) * u2
            xoffs = rad * jnp.cos(ang)
            yoffs = rad * jnp.sin(ang)
            # RN1 = (R.z, R.y, -R.x); RN2 = R x RN1 (raytracer.cpp:296-298)
            r1x, r1y, r1z = rdz, rdy, -rdx
            r2x = rdy * r1z - rdz * r1y
            r2y = rdz * r1x - rdx * r1z
            r2z = rdx * r1y - rdy * r1x
            yd = yoffs * st["drefl"]
            gx_ = rdx + r1x * xoffs + r2x * yd
            gy_ = rdy + r1y * xoffs + r2y * yd
            gz_ = rdz + r1z * xoffs + r2z * yd
            ginv = 1.0 / jnp.sqrt(
                jnp.maximum(gx_ * gx_ + gy_ * gy_ + gz_ * gz_, 1e-30)
            )
            cdx = jnp.where(glossy_ok, gx_ * ginv, rdx)
            cdy = jnp.where(glossy_ok, gy_ * ginv, rdy)
            cdz = jnp.where(glossy_ok, gz_ * ginv, rdz)
            refl_ok = shaded & (st["refl"] > 0.0)

            # Refraction child (raytracer.cpp:337-359).
            m_ridx = jnp.where(st["ridx"] != 0.0, st["ridx"], 1.0)
            n_ratio = rindex / m_ridx
            n2x = nx * st["code"]
            n2y = ny * st["code"]
            n2z = nz * st["code"]
            cos_i = -(n2x * dx + n2y * dy + n2z * dz)
            cos_t2 = 1.0 - n_ratio * n_ratio * (1.0 - cos_i * cos_i)
            refr_ok = shaded & (st["refr"] > 0.0) & (cos_t2 > 0.0)
            ct_safe = jnp.sqrt(jnp.where(cos_t2 > 0.0, cos_t2, 1.0))
            kk = n_ratio * cos_i - ct_safe
            tdx = n_ratio * dx + kk * n2x
            tdy = n_ratio * dy + kk * n2y
            tdz = n_ratio * dz + kk * n2z

            out_ref[_O_IDX] = st["idx"]
            out_ref[_O_HIT] = hitf
            out_ref[_O_HITLIGHT] = jnp.where(hit_light, 1.0, 0.0)
            out_ref[_O_DIST] = dist_safe
            out_ref[_O_PX] = px
            out_ref[_O_PY] = py
            out_ref[_O_PZ] = pz
            out_ref[_O_AR] = ar
            out_ref[_O_AG] = ag
            out_ref[_O_AB] = ab
            out_ref[_O_BR] = br
            out_ref[_O_BG] = bg
            out_ref[_O_BB] = bb
            out_ref[_O_RLX] = cdx
            out_ref[_O_RLY] = cdy
            out_ref[_O_RLZ] = cdz
            out_ref[_O_RLOK] = jnp.where(refl_ok, 1.0, 0.0)
            out_ref[_O_RRX] = tdx
            out_ref[_O_RRY] = tdy
            out_ref[_O_RRZ] = tdz
            out_ref[_O_RROK] = jnp.where(refr_ok, 1.0, 0.0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "ptype", "is_light", "n_samp", "glossy_enabled", "sublanes",
        "interpret",
    ),
)
def _whitted5_level_pallas(
    scene_tab: jnp.ndarray,  # [27, N]
    rays: jnp.ndarray,  # [6, rows, 128] f32
    keys: jnp.ndarray,  # [rows, 128] uint32
    ctrs: jnp.ndarray,  # [rows, 128] uint32
    rindex: jnp.ndarray,  # [rows, 128] f32
    valid: jnp.ndarray,  # [rows, 128] f32 0/1
    *,
    ptype: Tuple[int, ...],
    is_light: Tuple[bool, ...],
    n_samp: int,
    glossy_enabled: bool,
    sublanes: int = DEF_SUBLANES,
    interpret: bool = False,
):
    n = scene_tab.shape[1]
    rows = rays.shape[1]
    assert rows % sublanes == 0, (rows, sublanes)
    grid = rows // sublanes
    kernel = _make_whitted5_level_kernel(
        n, ptype, is_light, n_samp, glossy_enabled, sublanes
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scene table
            pl.BlockSpec((6, sublanes, LANES), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sublanes, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sublanes, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sublanes, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sublanes, LANES), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_O_N, sublanes, LANES), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_O_N, rows, LANES), jnp.float32),
        interpret=interpret,
    )(scene_tab, rays, keys, ctrs, rindex, valid)


def _node_key_jnp(key, heap_id):
    """models/whitted5._node_key on device arrays."""
    x = key ^ (heap_id * jnp.uint32(0x9E3779B9) + jnp.uint32(0x7F4A7C15))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x21F0AAAD)
    x = x ^ (x >> 15)
    return x


def _tile128(v, rows, fill=0.0):
    """Pad a flat [n] vector to rows*128 and reshape [rows, 128]."""
    n = v.shape[0]
    pad = rows * LANES - n
    if pad:
        v = jnp.concatenate([v, jnp.full((pad,), fill, v.dtype)])
    return v.reshape(rows, LANES)


def _texel_planes(bitmap, u, v, row_offset=None, wrap_shape=None):
    """models/whitted5._texel per channel on component planes — same
    arithmetic (incl. the width-for-height quirk), operating on flat
    [R] vectors: next to the Pallas custom-calls XLA lays minor-dim-3
    arrays out tiled (3 -> 128 lanes, a 42x memory blow-up that OOM'd
    800x600 — the whole driver is component-planes for that reason).

    ``wrap_shape``/``row_offset``: atlas mode — the wrap math runs at
    the per-texture shape, then rows are offset into the concatenated
    atlas (see _get_color_planes)."""
    th, tw = (wrap_shape if wrap_shape is not None else bitmap.shape)[:2]
    fu = (u + 1000.5) * tw
    fv = (v + 1000.0) * tw
    u1 = jnp.floor(fu).astype(jnp.int32) % tw
    v1 = jnp.floor(fv).astype(jnp.int32) % th
    u2 = (u1 + 1) % tw
    v2 = (v1 + 1) % th
    fracu = fu - jnp.floor(fu)
    fracv = fv - jnp.floor(fv)
    w1 = (1 - fracu) * (1 - fracv)
    w2 = fracu * (1 - fracv)
    w3 = (1 - fracu) * fracv
    w4 = fracu * fracv
    # Four ROW gathers of [R, 3] rgb triples, unstacked to planes
    # immediately. Measured on the chip (r4 gather race): XLA-TPU
    # gathers are HBM-random-access-latency-bound (~4.5M single-element
    # fetches/s regardless of formulation — 12 scalar sweeps, flat
    # 1-D, or quad-packed uint32 all cost the same), but a 3-element
    # row per index amortizes the latency ~3x. The [R, 3] gather
    # output is consumed by slices right here, so it stays off the
    # padded-layout path that plane-ification exists to avoid.
    if row_offset is not None:
        v1 = v1 + row_offset
        v2 = v2 + row_offset
    out = [jnp.zeros_like(w1) for _ in range(3)]
    for (vi, ui), wgt in (((v1, u1), w1), ((v1, u2), w2),
                          ((v2, u1), w3), ((v2, u2), w4)):
        rows = bitmap[vi, ui]  # [R, 3]
        for c in range(3):
            out[c] = out[c] + rows[:, c] * wgt
    return tuple(out)


def _prim_uv_planes(scene: Whitted5Scene, j: int, px, py, pz):
    """(ucoord, vcoord) [R] for textured primitive j — per-class mapping
    from models/whitted5.get_color, componentwise."""
    us = scene.uv_scale[j]
    if scene.ptype[j] == SPHERE5:
        rr = 1.0 / jnp.where(scene.radius[j] != 0.0, scene.radius[j], 1.0)
        c = scene.center[j]
        vpx = (px - c[0]) * rr
        vpy = (py - c[1]) * rr
        vpz = (pz - c[2]) * rr
        cosphi = jnp.clip(-vpy, -1.0, 1.0)
        phi = jnp.arccos(cosphi)
        sinphi = jnp.sqrt(jnp.maximum(1.0 - cosphi * cosphi, 1e-12))
        vcoord = phi * (1.0 / us[1]) * (1.0 / jnp.float32(PI))
        costheta = jnp.clip(vpx / sinphi, -1.0, 1.0)
        theta = jnp.arccos(costheta) * jnp.float32(2.0 / PI)
        ucoord = jnp.where(-vpz >= 0.0, 1.0 - theta, theta) * (1.0 / us[0])
    else:  # plane mapping (boxes keep material color in the reference)
        nrm = scene.normal[j]
        ua = jnp.stack([nrm[1], nrm[2], -nrm[0]])
        va = jnp.cross(ua, nrm)
        ucoord = (px * ua[0] + py * ua[1] + pz * ua[2]) * us[0]
        vcoord = (px * va[0] + py * va[1] + pz * va[2]) * us[1]
    return ucoord, vcoord


def _get_color_planes_mxu(scene: Whitted5Scene, tabs, idx, px, py, pz,
                          live, interpret=False):
    """models/whitted5.get_color on component planes via the MXU texel
    unit (kernels/texel_kernel.py): the four bilinear gathers collapse
    into one-hot matmuls against the VMEM-resident atlas tables — the
    XLA gather path caps the whole family at ~40 M fetch/s while the
    MXU unit measured 98-225 M fetch/s (r5, dead-row skipping).

    ``live`` marks lanes whose color can matter (valid & hit); dead
    lanes and lanes hitting untextured primitives return the plain
    material color (their texel is skipped/zero — downstream masking
    already ignores them, matching _get_color_planes' garbage-lane
    contract). Values on textured live lanes are bit-identical to the
    jnp path for bf16-exact (u8/256) textures."""
    from se195_raytracer_tpu.kernels.texel_kernel import texel_fetch_mxu

    col_t = [scene.color[:, c] for c in range(3)]
    out = [col_t[c][idx] for c in range(3)]
    textured = [j for j in range(scene.num_prims) if scene.tex_id[j] >= 0]
    tw, th = tabs.tw, tabs.tex_h

    sel_u = jnp.zeros_like(px)
    sel_v = jnp.zeros_like(px)
    sel_off = jnp.zeros_like(idx)
    tex_lane = jnp.zeros_like(px, dtype=bool)
    for j in textured:
        ucoord, vcoord = _prim_uv_planes(scene, j, px, py, pz)
        m = idx == j
        sel_u = jnp.where(m, ucoord, sel_u)
        sel_v = jnp.where(m, vcoord, sel_v)
        sel_off = jnp.where(m, scene.tex_id[j] * th, sel_off)
        tex_lane = tex_lane | m

    # GetTexel index math (scene.cpp:87-99, incl. the width-for-height
    # quirk) — same arithmetic as _texel_planes.
    fu = (sel_u + 1000.5) * tw
    fv = (sel_v + 1000.0) * tw
    u1 = jnp.floor(fu).astype(jnp.int32) % tw
    v1 = jnp.floor(fv).astype(jnp.int32) % th
    fracu = fu - jnp.floor(fu)
    fracv = fv - jnp.floor(fv)
    tex = texel_fetch_mxu(
        (tabs.hi, tabs.lo, not tabs.has_lo),
        v1 + sel_off, u1, fracu, fracv, live & tex_lane,
        tw=tw, interpret=interpret,
    )
    for j in textured:
        sel = idx == j
        for c in range(3):
            out[c] = jnp.where(sel, tex[c] * scene.color[j, c], out[c])
    return tuple(out)


def _get_color_planes(scene: Whitted5Scene, idx, px, py, pz):
    """models/whitted5.get_color on component planes: (cr, cg, cb) [R]
    with texture modulation (same per-channel values).

    When every texture has the same shape (the reference's .tga assets
    are all 200x200), the per-prim fetches collapse into ONE atlas
    fetch: uv is selected per lane by the hit id (cheap elementwise),
    the per-texture wrap math is unchanged (same th/tw), and the gather
    hits a row-concatenated atlas at v + 200*texture. Gathers are the
    measured bottleneck of this family (HBM random-access latency, see
    _texel_planes), so fetch COUNT is what matters."""
    col_t = [scene.color[:, c] for c in range(3)]
    out = [col_t[c][idx] for c in range(3)]
    textured = [j for j in range(scene.num_prims) if scene.tex_id[j] >= 0]
    if not textured:
        return tuple(out)
    shapes = {scene.textures[scene.tex_id[j]].shape for j in textured}
    if len(shapes) == 1 and len(textured) > 1:
        th = next(iter(shapes))[0]
        atlas = jnp.concatenate(
            [scene.textures[t] for t in range(len(scene.textures))], axis=0
        )
        sel_u = jnp.zeros_like(px)
        sel_v = jnp.zeros_like(px)
        sel_off = jnp.zeros_like(idx)
        for j in textured:
            ucoord, vcoord = _prim_uv_planes(scene, j, px, py, pz)
            m = idx == j
            sel_u = jnp.where(m, ucoord, sel_u)
            sel_v = jnp.where(m, vcoord, sel_v)
            sel_off = jnp.where(m, scene.tex_id[j] * th, sel_off)
        tex = _texel_planes(atlas, sel_u, sel_v, row_offset=sel_off,
                            wrap_shape=next(iter(shapes)))
        for j in textured:
            sel = idx == j
            for c in range(3):
                out[c] = jnp.where(
                    sel, tex[c] * scene.color[j, c], out[c]
                )
        return tuple(out)
    for j in textured:
        bitmap = scene.textures[scene.tex_id[j]]
        ucoord, vcoord = _prim_uv_planes(scene, j, px, py, pz)
        tex = _texel_planes(bitmap, ucoord, vcoord)
        sel = idx == j
        for c in range(3):
            out[c] = jnp.where(sel, tex[c] * scene.color[j, c], out[c])
    return tuple(out)


def whitted5_trace_pallas(
    scene: Whitted5Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    state,
    trace_depth: int = TRACEDEPTH5,
    area_samples_by_level: Tuple[int, ...] = (4, 2, 1, 1),
    sublanes: int = DEF_SUBLANES,
    interpret: bool = False,
    scene_tab: jnp.ndarray | None = None,
    return_primary_idx: bool = False,
    texel_tabs=None,
):
    """Drop-in fast-path twin of models/whitted5.whitted5_trace: the same
    levelwise tree, with each level's node work fused into the Pallas
    kernel and only texture gathers + color-weight combines in XLA.
    Same RNG streams; output agrees with the jnp path to float
    reassociation. Returns (accumulated color [R, 3], advanced state),
    plus the level-1 nearest-hit ids ([R] int32, -1 on miss) when
    ``return_primary_idx`` — the adaptive renderer's edge mask needs
    them and the kernel already computed them.

    Every inter-level value lives as COMPONENT PLANES (flat [K*R]
    vectors per x/y/z/r/g/b component), never [K*R, 3]: adjacent to the
    Pallas custom-calls XLA tiles minor-dim-3 arrays to 128 lanes — a
    42x padding blow-up that OOM'd the 800x600 frame at 21 GB of HLO
    temps for <1 GB of data."""
    eps = jnp.float32(EPSILON5)
    r = o.shape[0]
    key_in, ctr_in = state
    key_in = key_in.astype(jnp.uint32)
    ctr_in = ctr_in.astype(jnp.uint32)
    if scene_tab is None:
        scene_tab = pack_whitted5_scene(scene)
    refl_tab = scene.refl
    ridx_tab = jnp.where(scene.refr_index != 0.0, scene.refr_index, 1.0)
    col_tabs = [scene.color[:, c] for c in range(3)]

    acc = [jnp.zeros(r, jnp.float32) for _ in range(3)]
    heap_ids = [0]
    ob = [o[:, c] for c in range(3)]
    db = [d[:, c] for c in range(3)]
    weight = [jnp.ones(r, jnp.float32) for _ in range(3)]
    beer = [jnp.zeros(r, jnp.float32) for _ in range(3)]
    rindex = jnp.ones(r, jnp.float32)
    valid = jnp.ones(r, bool)

    tile = sublanes * LANES
    for level in range(1, trace_depth + 1):
        k = len(heap_ids)
        kr = k * r
        n_samp = area_samples_by_level[
            min(level, len(area_samples_by_level) - 1)
        ]
        rows = ((kr + tile - 1) // tile) * tile // LANES
        hvec = jnp.repeat(jnp.asarray(np.array(heap_ids, np.uint32)), r)
        keys = _node_key_jnp(jnp.tile(key_in, k), hvec)
        ctrs = jnp.tile(ctr_in, k)

        rays = jnp.stack([_tile128(v, rows) for v in ob + db])
        out = _whitted5_level_pallas(
            scene_tab, rays,
            _tile128(keys, rows, 0), _tile128(ctrs, rows, 0),
            _tile128(rindex, rows, 1.0),
            _tile128(valid.astype(jnp.float32), rows, 0.0),
            ptype=scene.ptype, is_light=scene.is_light, n_samp=n_samp,
            glossy_enabled=(level < 3), sublanes=sublanes,
            interpret=interpret,
        )
        out = out.reshape(_O_N, rows * LANES)[:, :kr]

        idx = out[_O_IDX].astype(jnp.int32)
        safe = jnp.maximum(idx, 0)
        hit = out[_O_HIT] > 0.5
        if level == 1:
            primary_idx = idx[:r]
        dist = out[_O_DIST]
        px, py, pz = out[_O_PX], out[_O_PY], out[_O_PZ]
        vh = valid & hit
        if texel_tabs is not None:
            color = _get_color_planes_mxu(
                scene, texel_tabs, safe, px, py, pz, vh, interpret=interpret
            )
        else:
            color = _get_color_planes(scene, safe, px, py, pz)

        w_eff = []
        for c in range(3):
            w_eff.append(weight[c] * jnp.exp(beer[c] * (-dist)))
            local_c = out[_O_AR + c] * color[c] + out[_O_BR + c]
            contrib = jnp.where(vh, w_eff[c] * local_c, 0.0)
            acc[c] = acc[c] + contrib.reshape(k, r).sum(axis=0)
        if level >= trace_depth:
            break

        refl_ok = out[_O_RLOK] > 0.5
        refr_ok = out[_O_RROK] > 0.5
        cdir = [out[_O_RLX], out[_O_RLY], out[_O_RLZ]]
        tdir = [out[_O_RRX], out[_O_RRY], out[_O_RRZ]]
        refl = refl_tab[safe]
        m_ridx = ridx_tab[safe]
        point = [px, py, pz]

        ob_n, db_n, w_n, beer_n = [], [], [], []
        for c in range(3):
            refl_o = jnp.where(refl_ok, point[c] + cdir[c] * eps, point[c])
            refl_w = jnp.where(refl_ok, w_eff[c] * refl * color[c], 0.0)
            refr_o = jnp.where(refr_ok, point[c] + tdir[c] * eps, point[c])
            refr_d = jnp.where(refr_ok, tdir[c], db[c])
            refr_w = jnp.where(refr_ok, w_eff[c], 0.0)
            refr_beer = jnp.where(
                refr_ok, col_tabs[c][safe] * jnp.float32(0.15), 0.0
            )
            ob_n.append(jnp.concatenate([refl_o, refr_o]))
            db_n.append(jnp.concatenate([cdir[c], refr_d]))
            w_n.append(jnp.concatenate([refl_w, refr_w]))
            beer_n.append(
                jnp.concatenate([jnp.zeros_like(refl_w), refr_beer])
            )
        ob, db, weight, beer = ob_n, db_n, w_n, beer_n
        rindex = jnp.concatenate(
            [rindex, jnp.where(refr_ok, m_ridx, rindex)]
        )
        valid = jnp.concatenate([refl_ok, refr_ok])
        heap_ids = [2 * i + 1 for i in heap_ids] + [
            2 * i + 2 for i in heap_ids
        ]

    state_out = (key_in, ctr_in + jnp.uint32(PASS_DRAW_BUDGET))
    if return_primary_idx:
        return jnp.stack(acc, axis=-1), state_out, primary_idx
    return jnp.stack(acc, axis=-1), state_out


@functools.partial(
    jax.jit,
    static_argnames=("spp", "trace_depth", "height", "width", "interpret"),
)
def _whitted5_frame_pallas(
    scene: Whitted5Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    state,
    spp: int,
    trace_depth: int,
    height: int,
    width: int,
    interpret: bool = False,
    texel_tabs=None,
) -> jnp.ndarray:
    """Fast-path twin of models/whitted5._whitted5_frame: lax.scan over
    spp passes of whitted5_trace_pallas, one device dispatch."""
    scene_tab = pack_whitted5_scene(scene)

    def body(carry, _):
        st, acc = carry
        col, st = whitted5_trace_pallas(
            scene, o, d, st, trace_depth, interpret=interpret,
            scene_tab=scene_tab, texel_tabs=texel_tabs,
        )
        return (st, acc + col), None

    init = (state, jnp.zeros((o.shape[0], 3)))
    (_, acc), _ = jax.lax.scan(body, init, None, length=spp)
    return (acc / spp).reshape(height, width, 3)


def render_whitted5_pallas(
    scene: Whitted5Scene,
    width: int = 320,
    height: int = 240,
    spp: int = 1,
    trace_depth: int = TRACEDEPTH5,
    seed: int = 0,
    interpret: bool = False,
    use_mxu_texels: bool = True,
) -> jnp.ndarray:
    """Full-frame whitted5 render on the fused level kernels — same
    estimator and RNG streams as models/whitted5.render_whitted5.
    Returns [H, W, 3] float32 linear radiance. Texture fetches ride the
    MXU texel unit (kernels/texel_kernel.py) unless disabled."""
    from se195_raytracer_tpu.kernels.texel_kernel import prepare_texel_tables
    from se195_raytracer_tpu.models.whitted5 import (
        _cached_rays5,
        _cached_state5,
    )

    o, d = _cached_rays5(width, height)
    state = _cached_state5(o.shape[0], seed)
    tabs = prepare_texel_tables(scene) if use_mxu_texels else None
    return _whitted5_frame_pallas(
        scene, o, d, state, spp=spp, trace_depth=trace_depth,
        height=height, width=width, interpret=interpret, texel_tabs=tabs,
    )
