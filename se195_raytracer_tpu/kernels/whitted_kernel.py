"""Pallas fused Whitted-tracer kernel — the TPU fast path for the
Raytracer3.2.0x / 3.0.06 family.

The jnp tree tracer (models/whitted.py whitted_trace) unrolls the
2^(depth+1)-1 reflect/refract tree as pure dataflow, which XLA compiles
well but leaves every per-node [R, N] intersection temporary in HBM. This
kernel is the 3.0.06 heap formulation (raytracer.cpp Engine_Render:
398-511 — node i's children at 2i+1 reflection / 2i+2 refraction) done
TPU-style: rays tiled [sublanes, 128] in VMEM, node states in a VMEM
scratch array indexed by heap position, ONE compiled node body run as a
``fori_loop`` over the heap (parents strictly precede children, so every
node's state is written before it is read), the scene resident on-chip.

Dead-subtree skipping: the reference's queue only ever processes rays
that were actually spawned (PUSH_RAY, raytracer_kernel.cl:34-44); the
full-width heap walk must win that back or it does 63 nodes of work for
the ~2-6 a typical tile needs. Each node owns one scalar SMEM liveness
flag, written when its parent spawns it (a single vector->scalar ``max``
reduction per child) and read as a cheap scalar ``pl.when`` predicate —
whole dead subtrees cost one scalar test per node. Ray tiles are
spatially coherent (consecutive subsamples of consecutive pixels), so
wall/floor regions — the bulk of the frame — kill their subtree at
depth 1 and the tile does O(live) work like the reference's queue.

Node state is 13 planes: origin(3) direction(3) V(3) wtr(3) ridx(1).
``wtr`` = scalar-weight x Beer-transparency (weight is >0 for every
spawned ray, transparency is an exp() product, so ``wtr.r > 0`` IS the
per-lane validity predicate) and ``V`` = the node's finished
contribution factor: contribution = V * shade_color. The reference's
per-type switch (raytracer_kernel.cl:317-328 — ORIGIN -> 1, REFLECTED ->
parent_color * transparency, REFRACTED -> transparency, each times the
scalar ``weight``) is folded in at spawn time:

    V_refl = refl * parent_hit_color * wtr      wtr_refl = refl * wtr
    V_refr = wtr * beer                          wtr_refr = V_refr

which both shrinks the per-node scratch DMA and makes the accumulation
body type-independent.

Semantics are those of models/whitted.py (which carries the reference
citations): ascending order-dependent nearest fold with the optional
3.2.03 ``hit_bias``, hard point-shadows toward sphere-light centers,
N.L diffuse + Phong^20 specular (the powr lowered to a 5-multiply
square chain — x^20 is integer-exponent, no transcendental needed),
Beer transparency on the parent ray's travel distance, reflection tint
by the immediate parent's color only. Accumulation order differs from
the depth-first jnp tracer (heap vs depth-first), so agreement is
float-reassociation-level, not bitwise.

Scene table (``pack_whitted_scene``): rows
[0 unused(type) | 1-3 plane normal | 4 plane depth | 5-7 center |
 8 sq_radius | 9 r_radius | 10-12 color | 13 refl | 14 diff | 15 spec |
 16 refr | 17 refr_index] — one column per primitive. ``ptype`` and
``is_light`` are static structure (the kernel unrolls the primitive loop
emitting only the matching test per primitive).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from se195_raytracer_tpu.models.whitted import (
    HIT,
    INPRIM,
    W_EPSILON,
    whitted_camera_rays,
)
from se195_raytracer_tpu.scenes.whitted_scenes import PLANE, SPHERE, WhittedScene

LANES = 128
DEF_SUBLANES = 8  # 8 x 128 = 1024 rays per tile (deep trees: register pressure)

# Scratch state planes per tree node.
_ST_O = 0  # 0-2 origin
_ST_D = 3  # 3-5 direction
_ST_V = 6  # 6-8 contribution factor (weight x type-switch factor)
_ST_WTR = 9  # 9-11 weight x Beer transparency; wtr.r > 0 <=> lane valid
_ST_RIDX = 12  # refractive index the ray travels in
_ST_N = 13


def pack_whitted_scene(scene: WhittedScene) -> jnp.ndarray:
    """[18, N] float32 primitive table."""
    tarr = jnp.asarray(np.array(scene.ptype, np.float32))[None, :]
    return jnp.concatenate(
        [
            tarr,
            scene.normal.T,
            scene.depth[None, :],
            scene.center.T,
            scene.sq_radius[None, :],
            scene.r_radius[None, :],
            scene.color.T,
            scene.refl[None, :],
            scene.diff[None, :],
            scene.spec[None, :],
            scene.refr[None, :],
            scene.refr_index[None, :],
        ],
        axis=0,
    ).astype(jnp.float32)


def _pow20(x):
    """x^20 for x >= 0 as a multiply chain (x^5 squared twice) — the
    reference's powr(dot, 20) (raytracer_kernel.cl:232) has an integer
    exponent, so no exp/log transcendental is needed."""
    x2 = x * x
    x5 = x2 * x2 * x
    x10 = x5 * x5
    return x10 * x10


def _make_whitted_kernel(
    n_prims: int,
    ptype: Tuple[int, ...],
    is_light: Tuple[bool, ...],
    trace_depth: int,
    hit_bias: float,
    sublanes: int,
    debug_tap: str | None = None,
    camgen: Tuple[int, int, int] | None = None,
):
    """``camgen=(width, height, supersample)`` drops the rays input and
    generates the fixed-window camera rays in-kernel from the ray linear
    index (whitted_camera_rays semantics, raytracer_kernel.cl:267-305).
    Host ray-gen + upload of [6, W*H*ss^2] floats costs ~75x the trace
    itself over the tunnel — primary rays are a formula, not data."""
    m_nodes = 2 ** (trace_depth + 1) - 1
    eps = float(np.float32(W_EPSILON))
    bias = float(np.float32(hit_bias))
    big = float(np.finfo(np.float32).max)

    def kernel(scene_ref, *refs):
        if camgen is None:
            rays_ref, out_ref, st_ref, live_ref = refs
        else:
            cam_ref, out_ref, st_ref, live_ref = refs
        shape = (sublanes, LANES)
        zero = jnp.zeros(shape, jnp.float32)
        one = jnp.ones(shape, jnp.float32)

        def primary_rays():
            if camgen is None:
                return tuple(rays_ref[k] for k in range(6))
            w, h, ss = camgen
            ss2 = ss * ss
            # Window constants (raytracer_kernel.cl:267-281); the
            # viewpoint itself comes from the SMEM camera row
            # [O(3), X(3), Y(3), C(3)] (models/whitted.py
            # whitted_camera_row): dir = X*sx + Y*sy + C, so the fused
            # path renders any camera — the default row reproduces the
            # reference's fixed (0, 0.25, -7) formula exactly.
            wx1, wy1 = -3.0, 2.25
            dxs = np.float32(6.0 / w)
            dys = np.float32(-4.5 / h)
            lin = (
                pl.program_id(0) * (sublanes * LANES)
                + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            )
            pix = lin // ss2
            sub = lin - pix * ss2
            txi = sub // ss
            tyi = sub - txi * ss
            x = pix % w
            y = pix // w
            half = ss // 2
            sx = (
                jnp.float32(wx1)
                + x.astype(jnp.float32) * dxs
                + (txi - half).astype(jnp.float32) * jnp.float32(dxs / 2.0)
            )
            sy = (
                jnp.float32(wy1)
                + y.astype(jnp.float32) * dys
                + (tyi - half).astype(jnp.float32) * jnp.float32(dys / 2.0)
            )
            cr = [cam_ref[0, k] for k in range(12)]
            rdx = cr[3] * sx + cr[6] * sy + cr[9]
            rdy = cr[4] * sx + cr[7] * sy + cr[10]
            rdz = cr[5] * sx + cr[8] * sy + cr[11]
            inv = 1.0 / jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
            ox = cr[0] + zero
            oy = cr[1] + zero
            oz = cr[2] + zero
            return ox, oy, oz, rdx * inv, rdy * inv, rdz * inv

        def sc(f, j):
            return scene_ref[f, j]

        def prim_candidate(j, ox, oy, oz, dx, dy, dz):
            """(upd_dist, upd_res, valid-to-update) for primitive j given
            current best distance ``cumu`` is applied by the caller."""
            if ptype[j] == PLANE:
                nd = sc(1, j) * dx + sc(2, j) * dy + sc(3, j) * dz
                no = sc(1, j) * ox + sc(2, j) * oy + sc(3, j) * oz
                nd_safe = jnp.where(nd != 0.0, nd, 1.0)
                pdist = -(no + sc(4, j)) / nd_safe
                pvalid = (nd != 0.0) & (pdist > 0.0)
                return pdist, None, None, pvalid
            vx = ox - sc(5, j)
            vy = oy - sc(6, j)
            vz = oz - sc(7, j)
            b = -(vx * dx + vy * dy + vz * dz)
            det = b * b - (vx * vx + vy * vy + vz * vz) + sc(8, j)
            svalid = det > 0.0
            sq = jnp.sqrt(jnp.where(svalid, det, 1.0))
            i1 = b - sq
            i2 = b + sq
            svalid = svalid & (i2 > 0.0)
            return None, i1, i2, svalid

        def nearest(ox, oy, oz, dx, dy, dz):
            """Order-dependent fold over primitives 0..N-1
            (models/whitted.py whitted_nearest), tracking the winner's
            attributes. Returns dict of [S,128] planes."""
            st = {
                "t": jnp.full(shape, big, jnp.float32),
                "res": zero,  # MISS=0 / HIT=1 / INPRIM=-1 as f32
                "is_plane": zero,
                "pnx": zero, "pny": zero, "pnz": zero,
                "cx": zero, "cy": zero, "cz": zero, "rrad": zero,
                "colr": zero, "colg": zero, "colb": zero,
                "refl": zero, "diff": zero, "spec": zero, "refr": zero,
                "ridx": zero, "light": zero,
            }
            for j in range(n_prims):
                pdist, i1, i2, valid = prim_candidate(j, ox, oy, oz, dx, dy, dz)
                if ptype[j] == PLANE:
                    upd = valid & (pdist < st["t"])
                    new_t = pdist
                    new_res = one
                else:
                    inprim = valid & (i1 < 0.0) & (i2 < st["t"])
                    hit_near = valid & (i1 >= 0.0) & (i1 < st["t"] + bias)
                    upd = inprim | hit_near
                    new_t = jnp.where(i1 < 0.0, i2, i1)
                    new_res = jnp.where(inprim, jnp.float32(INPRIM), jnp.float32(HIT))
                st["t"] = jnp.where(upd, new_t, st["t"])
                st["res"] = jnp.where(upd, new_res, st["res"])
                st["is_plane"] = jnp.where(
                    upd, 1.0 if ptype[j] == PLANE else 0.0, st["is_plane"]
                )
                if ptype[j] == PLANE:
                    st["pnx"] = jnp.where(upd, sc(1, j), st["pnx"])
                    st["pny"] = jnp.where(upd, sc(2, j), st["pny"])
                    st["pnz"] = jnp.where(upd, sc(3, j), st["pnz"])
                else:
                    st["cx"] = jnp.where(upd, sc(5, j), st["cx"])
                    st["cy"] = jnp.where(upd, sc(6, j), st["cy"])
                    st["cz"] = jnp.where(upd, sc(7, j), st["cz"])
                    st["rrad"] = jnp.where(upd, sc(9, j), st["rrad"])
                st["colr"] = jnp.where(upd, sc(10, j), st["colr"])
                st["colg"] = jnp.where(upd, sc(11, j), st["colg"])
                st["colb"] = jnp.where(upd, sc(12, j), st["colb"])
                st["refl"] = jnp.where(upd, sc(13, j), st["refl"])
                st["diff"] = jnp.where(upd, sc(14, j), st["diff"])
                st["spec"] = jnp.where(upd, sc(15, j), st["spec"])
                st["refr"] = jnp.where(upd, sc(16, j), st["refr"])
                st["ridx"] = jnp.where(upd, sc(17, j), st["ridx"])
                st["light"] = jnp.where(
                    upd, 1.0 if is_light[j] else 0.0, st["light"]
                )
            return st

        def occluded(ox, oy, oz, dx, dy, dz, maxt):
            """Shadow predicate over non-light primitives
            (models/whitted.py whitted_occluded)."""
            occ = zero
            for j in range(n_prims):
                if is_light[j]:
                    continue
                pdist, i1, i2, valid = prim_candidate(j, ox, oy, oz, dx, dy, dz)
                if ptype[j] == PLANE:
                    hitj = valid & (pdist < maxt)
                else:
                    # No select over i1 vectors (Mosaic can't materialize
                    # them) — expand the near/inside cases as conjunctions.
                    hitj = valid & (
                        ((i1 < 0.0) & (i2 < maxt))
                        | ((i1 >= 0.0) & (i1 < maxt + bias))
                    )
                occ = jnp.where(hitj, 1.0, occ)
            return occ > 0.5

        def shade(ox, oy, oz, dx, dy, dz):
            """Nearest hit + local Phong shading
            (models/whitted.py whitted_shade)."""
            st = nearest(ox, oy, oz, dx, dy, dz)
            hit = st["res"] != 0.0
            # Clamp: padded lanes (o=d=0) can report quasi-infinite plane
            # distances; inf hit points breed inf*0=NaN in the Beer term.
            # In-scene distances are far below 1e6.
            dist_safe = jnp.minimum(jnp.where(hit, st["t"], 1.0), 1e6)
            px = ox + dx * dist_safe
            py = oy + dy * dist_safe
            pz = oz + dz * dist_safe
            is_plane = st["is_plane"] > 0.5
            nx = jnp.where(is_plane, st["pnx"], (px - st["cx"]) * st["rrad"])
            ny = jnp.where(is_plane, st["pny"], (py - st["cy"]) * st["rrad"])
            nz = jnp.where(is_plane, st["pnz"], (pz - st["cz"]) * st["rrad"])

            ar, ag, ab = zero, zero, zero
            for li in range(n_prims):
                if not is_light[li]:
                    continue
                lvx = sc(5, li) - px
                lvy = sc(6, li) - py
                lvz = sc(7, li) - pz
                llen = jnp.sqrt(
                    jnp.maximum(lvx * lvx + lvy * lvy + lvz * lvz, 1e-30)
                )
                ldx, ldy, ldz = lvx / llen, lvy / llen, lvz / llen
                if ptype[li] == SPHERE:
                    occ = occluded(
                        px + ldx * eps, py + ldy * eps, pz + ldz * eps,
                        ldx, ldy, ldz, llen,
                    )
                    sh = jnp.where(occ, 0.0, 1.0)
                else:
                    sh = one
                dnl = nx * ldx + ny * ldy + nz * ldz
                dterm = jnp.where(
                    (st["diff"] > 0.0) & (dnl > 0.0), dnl * st["diff"] * sh, 0.0
                )
                ar = ar + dterm * st["colr"] * sc(10, li)
                ag = ag + dterm * st["colg"] * sc(11, li)
                ab = ab + dterm * st["colb"] * sc(12, li)
                rvx = ldx - 2.0 * dnl * nx
                rvy = ldy - 2.0 * dnl * ny
                rvz = ldz - 2.0 * dnl * nz
                dvr = dx * rvx + dy * rvy + dz * rvz
                sterm = jnp.where(
                    (st["spec"] > 0.0) & (dvr > 0.0),
                    _pow20(jnp.maximum(dvr, 0.0)) * st["spec"] * sh,
                    0.0,
                )
                ar = ar + sterm * sc(10, li)
                ag = ag + sterm * sc(11, li)
                ab = ab + sterm * sc(12, li)

            hit_is_light = hit & (st["light"] > 0.5)
            colr = jnp.where(hit_is_light, st["colr"], jnp.where(hit, ar, 0.0))
            colg = jnp.where(hit_is_light, st["colg"], jnp.where(hit, ag, 0.0))
            colb = jnp.where(hit_is_light, st["colb"], jnp.where(hit, ab, 0.0))
            return st, hit, dist_safe, (px, py, pz), (nx, ny, nz), (colr, colg, colb)

        if debug_tap is not None:
            # Kernel debug hook (the reference's DEBUGGING printf,
            # raytracer_kernel.cl:1-6, reborn): emit an intermediate
            # triple for the primary rays instead of tracing the tree.
            ox, oy, oz, dx, dy, dz = primary_rays()
            st = nearest(ox, oy, oz, dx, dy, dz)
            if debug_tap == "tres":
                taps = (st["t"], st["res"], st["is_plane"])
            elif debug_tap == "attr":
                taps = (st["colr"], st["diff"], st["light"])
            elif debug_tap == "shade":
                _, _, _, _, _, cols = shade(ox, oy, oz, dx, dy, dz)
                taps = cols
            else:
                raise ValueError(debug_tap)
            out_ref[0], out_ref[1], out_ref[2] = taps
            return

        # --- root node state from the primary rays ---
        # Node state is read/written as ONE [_ST_N, S, 128] slice per node:
        # dynamic VMEM indexing costs a DMA per access, so batching the 13
        # planes into a single slice is the difference between 3 and ~39
        # dynamic accesses per node.
        prim = primary_rays()
        for k in range(6):
            st_ref[0, k] = prim[k]
        for k in range(6, _ST_N):
            st_ref[0, k] = one

        # Liveness flags: only the root starts live; a node's flag is
        # written by its parent at spawn time (dead parents never write,
        # so the zero-init stands for their whole subtree).
        for k in range(m_nodes):
            live_ref[k] = jnp.float32(1.0 if k == 0 else 0.0)

        out_ref[0] = zero
        out_ref[1] = zero
        out_ref[2] = zero

        # --- heap walk: parents strictly precede children ---
        def node(i, _):
            @pl.when(live_ref[i] > 0.5)
            def _live_node():
                ns = st_ref[i]  # [_ST_N, S, 128] single dynamic read
                ox, oy, oz = ns[_ST_O], ns[_ST_O + 1], ns[_ST_O + 2]
                dx, dy, dz = ns[_ST_D], ns[_ST_D + 1], ns[_ST_D + 2]
                vr, vg, vb = ns[_ST_V], ns[_ST_V + 1], ns[_ST_V + 2]
                wr, wg, wb = ns[_ST_WTR], ns[_ST_WTR + 1], ns[_ST_WTR + 2]
                ridx = ns[_ST_RIDX]
                valid = wr > 0.0

                st, hit, dist, (px, py, pz), (nx, ny, nz), (colr, colg, colb) = (
                    shade(ox, oy, oz, dx, dy, dz)
                )

                out_ref[0] += vr * colr
                out_ref[1] += vg * colg
                out_ref[2] += vb * colb

                @pl.when(2 * i + 2 < m_nodes)
                def _children():
                    # Reflection child (raytracer_kernel.cl:332-348).
                    ddn = dx * nx + dy * ny + dz * nz
                    rdx = dx - 2.0 * ddn * nx
                    rdy = dy - 2.0 * ddn * ny
                    rdz = dz - 2.0 * ddn * nz
                    refl_ok = valid & hit & (st["refl"] > 0.0)

                    def sane(v, ok):
                        # Invalid children must store FINITE state: their
                        # contribution is gated by wtr=0, but garbage
                        # origins/directions (unnormalized reflections of
                        # far-miss lanes) otherwise overflow downstream
                        # into 0*inf=NaN.
                        return jnp.where(ok, v, 0.0)

                    st_ref[2 * i + 1] = jnp.stack(
                        [
                            sane(px + rdx * eps, refl_ok),
                            sane(py + rdy * eps, refl_ok),
                            sane(pz + rdz * eps, refl_ok),
                            sane(rdx, refl_ok), sane(rdy, refl_ok),
                            sane(rdz, refl_ok),
                            sane(st["refl"] * st["colr"] * wr, refl_ok),
                            sane(st["refl"] * st["colg"] * wg, refl_ok),
                            sane(st["refl"] * st["colb"] * wb, refl_ok),
                            sane(st["refl"] * wr, refl_ok),
                            sane(st["refl"] * wg, refl_ok),
                            sane(st["refl"] * wb, refl_ok),
                            sane(ridx, refl_ok),
                        ],
                        axis=0,
                    )
                    live_ref[2 * i + 1] = jnp.max(
                        jnp.where(refl_ok, 1.0, 0.0)
                    )

                    # Refraction child (raytracer_kernel.cl:350-372).
                    ridx_m = jnp.where(st["ridx"] != 0.0, st["ridx"], 1.0)
                    n_ratio = ridx / ridx_m
                    n2x = nx * st["res"]  # result = HIT(+1) / INPRIM(-1)
                    n2y = ny * st["res"]
                    n2z = nz * st["res"]
                    cos_i = -(n2x * dx + n2y * dy + n2z * dz)
                    cos_t2 = 1.0 - n_ratio * n_ratio * (1.0 - cos_i * cos_i)
                    ct_safe = jnp.sqrt(jnp.where(cos_t2 > 0.0, cos_t2, 1.0))
                    kk = n_ratio * cos_i - ct_safe
                    tdx = n_ratio * dx + kk * n2x
                    tdy = n_ratio * dy + kk * n2y
                    tdz = n_ratio * dz + kk * n2z
                    refr_ok = valid & hit & (st["refr"] > 0.0) & (cos_t2 > 0.0)
                    # Beer's law with the PARENT ray's travel distance
                    # (raytracer_kernel.cl:370).
                    bwr = wr * jnp.exp(st["colr"] * 0.15 * (-dist))
                    bwg = wg * jnp.exp(st["colg"] * 0.15 * (-dist))
                    bwb = wb * jnp.exp(st["colb"] * 0.15 * (-dist))
                    st_ref[2 * i + 2] = jnp.stack(
                        [
                            sane(px + tdx * eps, refr_ok),
                            sane(py + tdy * eps, refr_ok),
                            sane(pz + tdz * eps, refr_ok),
                            sane(tdx, refr_ok), sane(tdy, refr_ok),
                            sane(tdz, refr_ok),
                            sane(bwr, refr_ok), sane(bwg, refr_ok),
                            sane(bwb, refr_ok),
                            sane(bwr, refr_ok), sane(bwg, refr_ok),
                            sane(bwb, refr_ok),
                            sane(ridx_m, refr_ok),
                        ],
                        axis=0,
                    )
                    live_ref[2 * i + 2] = jnp.max(
                        jnp.where(refr_ok, 1.0, 0.0)
                    )

            return 0

        jax.lax.fori_loop(0, m_nodes, node, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "ptype", "is_light", "trace_depth", "hit_bias", "sublanes",
        "interpret", "debug_tap",
    ),
)
def whitted_trace_pallas_padded(
    scene_tab: jnp.ndarray,  # [18, N]
    rays: jnp.ndarray,  # [6, Rp/128, 128]
    *,
    ptype: Tuple[int, ...],
    is_light: Tuple[bool, ...],
    trace_depth: int,
    hit_bias: float,
    sublanes: int = DEF_SUBLANES,
    interpret: bool = False,
    debug_tap: str | None = None,
):
    """Trace explicit padded ray tiles; returns acc [3, Rp/128, 128].

    This is the arbitrary-rays entry (parity tests, debug taps, custom
    cameras). The full-frame fast path is ``whitted_frame_pallas``, which
    generates the camera rays in-kernel instead of shipping them."""
    n = scene_tab.shape[1]
    rows = rays.shape[1]
    assert rows % sublanes == 0, (rows, sublanes)
    grid = rows // sublanes
    m_nodes = 2 ** (trace_depth + 1) - 1

    kernel = _make_whitted_kernel(
        n, ptype, is_light, trace_depth, hit_bias, sublanes,
        debug_tap=debug_tap,
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scene table
            pl.BlockSpec((6, sublanes, LANES), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, sublanes, LANES), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, rows, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m_nodes, _ST_N, sublanes, LANES), jnp.float32),
            pltpu.SMEM((m_nodes,), jnp.float32),
        ],
        interpret=interpret,
    )(scene_tab, rays)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ptype", "is_light", "width", "height", "supersample",
        "trace_depth", "hit_bias", "sublanes", "interpret",
    ),
)
def whitted_frame_pallas(
    scene_tab: jnp.ndarray,  # [18, N]
    cam_row: jnp.ndarray | None = None,  # [12] whitted_camera_row
    *,
    ptype: Tuple[int, ...],
    is_light: Tuple[bool, ...],
    width: int,
    height: int,
    supersample: int = 3,
    trace_depth: int = 5,
    hit_bias: float = 0.0,
    sublanes: int = DEF_SUBLANES,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full-frame fused render: camera rays generated in-kernel from the
    ray index and the SMEM camera row (any viewpoint — default is the
    reference's fixed one), subsample reduction + tone scale on device.
    Returns [H, W, 3] float32 in 0..255 (acc * 256 / ss^2, clamped —
    raytracer_kernel.cl:378-382). The only host traffic is the scene
    table + 12-float camera row down and the finished frame back."""
    from se195_raytracer_tpu.models.whitted import whitted_camera_row

    n = scene_tab.shape[1]
    ss2 = supersample * supersample
    r = width * height * ss2
    tile = sublanes * LANES
    rp = ((r + tile - 1) // tile) * tile
    grid = rp // tile
    m_nodes = 2 ** (trace_depth + 1) - 1
    if cam_row is None:
        cam_row = jnp.asarray(whitted_camera_row())

    kernel = _make_whitted_kernel(
        n, ptype, is_light, trace_depth, hit_bias, sublanes,
        camgen=(width, height, supersample),
    )
    acc = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scene table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # camera row (1, 12)
        ],
        out_specs=pl.BlockSpec((3, sublanes, LANES), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, rp // LANES, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m_nodes, _ST_N, sublanes, LANES), jnp.float32),
            pltpu.SMEM((m_nodes,), jnp.float32),
        ],
        interpret=interpret,
    )(scene_tab, cam_row.astype(jnp.float32).reshape(1, 12))
    flat = acc.reshape(3, rp)[:, :r].T  # [R, 3]
    img = flat.reshape(height, width, ss2, 3).sum(axis=2)
    return jnp.clip(img * jnp.float32(256.0 / ss2), 0.0, 255.0)


def render_whitted_pallas(
    scene: WhittedScene,
    width: int = 800,
    height: int = 600,
    supersample: int = 3,
    trace_depth: int = 5,
    hit_bias: float = 0.0,
    interpret: bool = False,
    cam_row: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full-frame Whitted render on the fused kernel -> [H, W, 3] in
    0..255 scale. ``cam_row`` (models/whitted.py whitted_camera_row)
    selects the viewpoint; None = the reference's fixed camera."""
    return whitted_frame_pallas(
        pack_whitted_scene(scene),
        cam_row,
        ptype=scene.ptype, is_light=scene.is_light,
        width=width, height=height, supersample=supersample,
        trace_depth=trace_depth, hit_bias=float(hit_bias),
        interpret=interpret,
    )
