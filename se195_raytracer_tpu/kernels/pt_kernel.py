"""Pallas fused path-tracing kernel — the TPU fast path.

The pure-jnp integrator (models/smallpt.py) is HBM-bound: every bounce
materializes [R, N] and [R, 3] temporaries. This kernel is the analogue of
the reference's device kernel (rendering_kernel.cl RadianceGPU:53-97) done
TPU-style: one ``pallas_call`` per progressive pass, rays tiled
``[sublanes, 128]`` in VMEM, the scene resident on-chip (the
``async_work_group_copy``-to-local-memory trick of raytracer_kernel.cl:
254-258, except VMEM), the whole camera-gen + 7-bounce loop + running-mean
accumulation fused with zero HBM round-trips per bounce.

Layout choices:
* Ray state is struct-of-vectors: separate [T1, 128] f32 registers per
  component (ox, oy, oz, ...), never a minor-dim-3 array.
* The sphere loop is unrolled over the *static* scene size with scalar
  reads from the VMEM scene table — right for the reference's scene sizes
  (5..783; beyond ~1k spheres a vectorized-over-lanes variant would win).
* Intersection iterates spheres N-1..0 with strict ``<`` so equal
  distances resolve to the larger index, exactly like Intersect
  (geomfunc.h:82-89).
* RNG runs in-kernel on uint32 vectors with masked advancement, in both
  framework modes: the reference MWC (simplernd.h:34-48) and the
  shard-invariant counter hash (core/rng.py counter_next) — the Pallas
  output matches the jnp path stream-for-stream either way.

Scene table layout (packed by ``pack_scene``): rows are
[cx, cy, cz, rad, ex, ey, ez, colr, colg, colb, refl, emissive] — one
column per sphere.

Two sphere-loop strategies, selected by scene size
(``UNROLL_MAX_SPHERES``): fully unrolled with static scalar reads (small
scenes — the reference's 5..64-sphere zoo), or a ``fori_loop`` over the
scene table in SMEM with the winning hit's attributes tracked in the loop
carry (large scenes — the 783-sphere ``complex`` fractal), keeping code
size and compile time O(1) in scene size.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from se195_raytracer_tpu.core.types import EPSILON, Scene

LANES = 128
# 16 x 128 = 2048 rays per tile: measured best on a v5e (r4 sweep,
# cornell 512^2 marginal rate: 920 Mrays/s @16 vs 895 @32 and 203 @8 —
# smaller tiles pay grid overhead, larger ones gain nothing).
DEF_SUBLANES = int(_os.environ.get("SE195_PT_SUBLANES", "16"))
# Above this the per-sphere unroll bloats compile time; switch to the
# fori_loop kernel (scene indexed dynamically from SMEM).
UNROLL_MAX_SPHERES = 96
# Spheres per fori_loop iteration in the large-scene kernel: the loop
# body unrolls this many spheres so loop control and carry traffic
# amortize, while compile time stays O(1) in scene size.
SPHERE_BLOCK = int(_os.environ.get("SE195_PT_BLOCK", "16"))
# Tile-level block culling in the large-scene kernel (see block_bounds).
# r4 tried a per-block lax.cond INSIDE the sweep and lost 23% (the cond
# broke Mosaic's software pipelining; row-major [16,128] tiles span 4
# full image rows, whose wide frustum kept ~23% of subtree bounds
# possible anyway). r5 replaces the mechanism and the geometry:
# * rays are REMAPPED so each tile is a near-square image block (64x32
#   at sublanes=16), measured 10.5% primary-bounce block survival vs
#   23% for row strips (tools/profile_complex.py predictor);
# * each sweep first evaluates all block bounds (one ~14-op vector test
#   + reduce per block, ~4% of a full sweep), compacts the surviving
#   block ids into an SMEM list, then runs a fori_loop over JUST that
#   list — no cond in the hot loop, so pipelining is undisturbed.
# Output stays bit-identical: bounds are conservatively inflated and
# the compacted list preserves the descending-index sweep order.
# SE195_PT_CULL=0 disables (full sweeps, same remapped layout).
CULL_BLOCKS = _os.environ.get("SE195_PT_CULL", "1") != "0"
# Per-bounce whole-tile early exit (SE195_PT_EARLYEXIT=0 disables;
# depth 0 always runs). Measured neutral for cornell PT (within tunnel
# noise around ~300 Mrays/s marginal) and clearly right for DL, whose
# diffuse lanes die after the first NEE estimate (DL > PT e2e on the
# chip, matching the reference's qualitative claim).
EARLY_EXIT = _os.environ.get("SE195_PT_EARLYEXIT", "1") != "0"
# Hoisted sphere test in the large-scene kernel (experiment knob):
# det = b^2 - (o.o - 2 o.c + (c.c - r^2)) with o.d/o.o hoisted per sweep
# and c.c - r^2 precomputed per sphere (scene row 12) — ~5 fewer plane
# ops of ~31 per sphere visit. Measured on chip (r5, complex783 512x512
# marginal, 2 sessions): hoist 16.8-20.8 vs default 16.5-17.8 Mrays/s —
# inside tunnel noise, so the sweep is not purely VPU-op-bound (SMEM
# scalar-load latency in the culled fori likely dominates). Default OFF;
# reformulated f32 rounding shifts det by ulps (loop-kernel parity
# tests are tolerance-based; the unrolled small-scene kernels never
# use it).
HOIST_SPHERE = _os.environ.get("SE195_PT_HOIST", "0") == "1"


def pack_scene(scene: Scene) -> jnp.ndarray:
    """[13, N] float32 scene table (refl stored as float; row 11 is the
    emissive-classification flag — the reference's viszero test incl. its
    y-bug, vec.h:44, baked host-side exactly like ``light_indices``;
    row 12 is c.c - r^2 for the hoisted large-scene sphere test)."""
    emissive = np.zeros((1, scene.num_spheres), np.float32)
    for i in scene.light_indices:
        emissive[0, i] = 1.0
    ccr = (
        jnp.sum(scene.center * scene.center, axis=-1)
        - scene.radius * scene.radius
    )
    return jnp.concatenate(
        [
            scene.center.T,
            scene.radius[None, :],
            scene.emission.T,
            scene.color.T,
            scene.refl.astype(jnp.float32)[None, :],
            jnp.asarray(emissive),
            ccr[None, :],
        ],
        axis=0,
    )


def pack_camera(basis) -> jnp.ndarray:
    """[1, 12] float32: orig, dir, x, y."""
    return jnp.concatenate([basis.orig, basis.dir, basis.x, basis.y]).reshape(1, 12)


def _mwc_next(s0, s1):
    c16 = jnp.uint32(0xFFFF)
    s0 = jnp.uint32(36969) * (s0 & c16) + (s0 >> 16)
    s1 = jnp.uint32(18000) * (s1 & c16) + (s1 >> 16)
    ires = (s0 << 16) + s1
    bits = (ires & jnp.uint32(0x007FFFFF)) | jnp.uint32(0x40000000)
    f = pltpu.bitcast(bits, jnp.float32)
    return (f - 2.0) * 0.5, s0, s1


def _counter_next(s0, s1):
    """core/rng.py counter_next on vectors: s0 = per-pixel key (static),
    s1 = draw counter."""
    x = s0 ^ (s1 * jnp.uint32(0x9E3779B9))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x21F0AAAD)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x735A2D97)
    x = x ^ (x >> 15)
    # (x >> 8) < 2^24: route the convert through int32 (unsigned->float
    # converts are shaky in Mosaic).
    v = (x >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )
    return v, s0, s1 + jnp.uint32(1)


def _make_rng(rng: str):
    nxt = _mwc_next if rng == "mwc" else _counter_next

    def masked(s0, s1, mask):
        v, n0, n1 = nxt(s0, s1)
        return v, jnp.where(mask, n0, s0), jnp.where(mask, n1, s1)

    return nxt, masked


def _norm3(x, y, z):
    inv = 1.0 / jnp.sqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def block_bounds(scene_tab: jnp.ndarray) -> jnp.ndarray:
    """[4, nb] (cx, cy, cz, rad) bounding spheres of the contiguous
    SPHERE_BLOCK-sized index ranges of the scene table — the TPU-native
    stand-in for the reference's regular-grid culling (raytracer5/trunk/
    scene.cpp:544-588): the fractal generator emits spheres in DFS order
    (scene_build_complex.pl:19-60), so contiguous ranges are spatially
    tight subtrees and one bound test amortizes a whole block's sweep.

    Bounds are conservatively inflated (relative + absolute margin) so
    f32 rounding in the kernel's det test can never reject a block that
    contains a true hit — the culled sweep stays BIT-IDENTICAL to the
    full sweep (index order is untouched; a skipped block updates
    nothing a run block wouldn't)."""
    n = scene_tab.shape[1]
    nb = n // SPHERE_BLOCK
    m = nb * SPHERE_BLOCK
    c3 = scene_tab[0:3, :m].reshape(3, nb, SPHERE_BLOCK)
    rad = scene_tab[3, :m].reshape(nb, SPHERE_BLOCK)
    lo = (c3 - rad[None]).min(axis=-1)
    hi = (c3 + rad[None]).max(axis=-1)
    bc = 0.5 * (lo + hi)  # [3, nb]
    br = jnp.max(
        jnp.sqrt(jnp.sum((c3 - bc[:, :, None]) ** 2, axis=0)) + rad, axis=-1
    )
    br = br * jnp.float32(1.001) + jnp.float32(0.01)
    return jnp.concatenate([bc, br[None]], axis=0)


def _make_kernel(
    n_spheres: int,
    light_indices: Tuple[int, ...],
    emissive_flags: Tuple[bool, ...],
    width: int,
    height: int,
    max_depth: int,
    direct_only: bool,
    sublanes: int,
    loop_scene: bool = False,
    rng: str = "mwc",
):
    """Build the kernel body for a static scene *structure* (size, light
    set, per-sphere emissive classification — the reference's viszero
    test, vec.h:44) while all scene *values* stay runtime inputs.

    ``loop_scene=False`` unrolls the sphere loop (best for the reference's
    small scenes); ``loop_scene=True`` runs it as a ``fori_loop`` over the
    SMEM scene table with the winning hit's attributes tracked in the loop
    carry — compile time and code size stay O(1) in scene size, which is
    what the 783-sphere ``complex`` scene needs."""

    tile = sublanes * LANES
    rng_next, rng_masked = _make_rng(rng)
    eps = float(np.float32(EPSILON))  # python scalar: jnp consts can't be closure-captured by kernels

    def kernel(samp_ref, scene_ref, *rest):
        if loop_scene:
            (bounds_ref, cam_ref, pix_ref, s0_ref, s1_ref, acc_ref,
             s0_out, s1_out, acc_out, list_ref, cnt_ref) = rest
        else:
            bounds_ref = list_ref = cnt_ref = None
            (cam_ref, pix_ref, s0_ref, s1_ref, acc_ref,
             s0_out, s1_out, acc_out) = rest
        shape = (sublanes, LANES)

        def sc(f, j):
            return scene_ref[f, j]

        def block_possible(t, ox, oy, oz, dx, dy, dz):
            """Tile-level cull (see ``block_bounds``): True iff ANY lane's
            ray can intersect block t's bounding sphere ahead of the
            origin — the conservative superset of every contained
            sphere's hit predicate, so a False verdict skips the block
            with bit-identical results."""
            bx, by, bz = bounds_ref[0, t], bounds_ref[1, t], bounds_ref[2, t]
            rb = bounds_ref[3, t]
            opx = bx - ox
            opy = by - oy
            opz = bz - oz
            b = opx * dx + opy * dy + opz * dz
            det = b * b - (opx * opx + opy * opy + opz * opz) + rb * rb
            pos = (det >= 0.0) & (
                (b + jnp.sqrt(jnp.maximum(det, 0.0))) > 0.0
            )
            return jnp.sum(jnp.where(pos, 1.0, 0.0)) > 0.0

        # Pixel coordinates (reference gid -> (x, y), rendering_kernel.cl:60-63
        # with the framebuffer v-flip folded in: row r maps to camera
        # y = height-1-r; see driver/render.py).
        # pix_ref: ABSOLUTE pixel id per lane, provided by the driver —
        # identity order for small scenes, near-square-block tile order
        # for loop scenes (ray_layout; tight tile frustums are what make
        # the block cull effective). Absolute ids also make RNG/pixel
        # keying shard-invariant under shard_map (SURVEY.md §7 hard
        # part 6) — each device's slice of the table carries its own
        # bases, no offset scalar needed.
        lin = pix_ref[:]
        px = lin % width
        prow = lin // width
        py = (height - 1) - prow

        s0 = s0_ref[:]
        s1 = s1_ref[:]

        # --- GenerateCameraRay (rendering_kernel.cl:29-51): 2 draws ---
        r1, s0, s1 = rng_next(s0, s1)
        r2, s0, s1 = rng_next(s0, s1)
        kcx = (px.astype(jnp.float32) + (r1 - 0.5)) * (1.0 / width) - 0.5
        kcy = (py.astype(jnp.float32) + (r2 - 0.5)) * (1.0 / height) - 0.5
        co = [cam_ref[0, i] for i in range(12)]
        rdx = co[6] * kcx + co[9] * kcy + co[3]
        rdy = co[7] * kcx + co[10] * kcy + co[4]
        rdz = co[8] * kcx + co[11] * kcy + co[5]
        ox = 0.1 * rdx + co[0]
        oy = 0.1 * rdy + co[1]
        oz = 0.1 * rdz + co[2]
        dx, dy, dz = _norm3(rdx, rdy, rdz)

        zero = jnp.zeros(shape, jnp.float32)
        one = jnp.ones(shape, jnp.float32)
        rad_r, rad_g, rad_b = zero, zero, zero
        thr_r, thr_g, thr_b = one, one, one
        # Flags are f32 0/1 indicators: Mosaic has no i1 vector materialization.
        alive_f = one
        spec_f = one

        def _roots_to_t(b, det):
            hit = det >= 0.0
            sq = jnp.sqrt(jnp.where(hit, det, 1.0))
            t1 = b - sq
            t2 = b + sq
            tj = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, 0.0))
            return jnp.where(hit, tj, 0.0)

        def sphere_t(j, ox, oy, oz, dx, dy, dz):
            """SphereIntersect (geomfunc.h:32-59): distance or 0 on miss."""
            opx = sc(0, j) - ox
            opy = sc(1, j) - oy
            opz = sc(2, j) - oz
            b = opx * dx + opy * dy + opz * dz
            det = b * b - (opx * opx + opy * opy + opz * opz) + sc(3, j) * sc(3, j)
            return _roots_to_t(b, det)

        def make_sphere_t_hoisted(ox, oy, oz, dx, dy, dz):
            """Per-sweep-hoisted sphere test (HOIST_SPHERE, loop scenes):
            b = c.d - o.d and det = b^2 - (o.o - 2 c.o + (c.c - r^2)),
            with o.d and o.o computed once per sweep."""
            od = ox * dx + oy * dy + oz * dz
            oo = ox * ox + oy * oy + oz * oz

            def f(j):
                cd = sc(0, j) * dx + sc(1, j) * dy + sc(2, j) * dz
                b = cd - od
                co = sc(0, j) * ox + sc(1, j) * oy + sc(2, j) * oz
                det = b * b - (oo - 2.0 * co + sc(12, j))
                return _roots_to_t(b, det)

            return f

        # Attribute rows carried through the nearest-hit fold: center,
        # emission, color, material, emissive flag (radius not needed
        # after the hit).
        ATTR_ROWS = (0, 1, 2, 4, 5, 6, 7, 8, 9, 10, 11)

        def nearest(ox, oy, oz, dx, dy, dz):
            """Nearest hit + winning sphere's attributes, folded
            N-1 .. 0 with strict < so the larger index wins ties
            (geomfunc.h:82-89)."""

            if loop_scene and HOIST_SPHERE:
                t_of = make_sphere_t_hoisted(ox, oy, oz, dx, dy, dz)
            else:
                t_of = lambda j: sphere_t(j, ox, oy, oz, dx, dy, dz)

            def step(j, carry):
                t_best = carry[0]
                tj = t_of(j)
                better = (tj != 0.0) & (tj < t_best)
                new = [jnp.where(better, tj, t_best)]
                for f, a in zip(ATTR_ROWS, carry[1:]):
                    new.append(jnp.where(better, sc(f, j), a))
                return tuple(new)

            init = (jnp.full(shape, 1e20, jnp.float32),) + tuple(
                zero for _ in ATTR_ROWS
            )
            if loop_scene:
                carry = _culled_sweep(step, init, ox, oy, oz, dx, dy, dz)
            else:
                carry = init
                for j in range(n_spheres - 1, -1, -1):
                    carry = step(j, carry)
            t_best = carry[0]
            return t_best, t_best < 1e20, carry[1:]

        def _culled_sweep(step, init, ox, oy, oz, dx, dy, dz):
            """Blocked large-scene sweep: fori_loop over blocks of
            SPHERE_BLOCK python-unrolled spheres (loop control and carry
            traffic amortize over the block; code size stays O(1) in
            scene size). Iteration is descending N-1..0 (strict <
            tie-break, geomfunc.h:82-89): the remainder block runs
            first.

            With CULL_BLOCKS, the sweep first tests every block's
            conservative bounding sphere against THIS sweep's actual
            rays (primary, bounce or shadow — whatever (o, d) holds),
            compacts the surviving block ids into the SMEM ``list_ref``
            in descending order, and runs the fori_loop over just that
            list — the hot loop body is unconditional (r4's per-block
            lax.cond broke pipelining and lost 23%), and skipped blocks
            contain no true hits, so the fold is bit-identical."""
            nb = n_spheres // SPHERE_BLOCK
            rem = n_spheres - nb * SPHERE_BLOCK
            carry = init
            for j in range(n_spheres - 1, n_spheres - rem - 1, -1):
                carry = step(j, carry)

            if CULL_BLOCKS:
                cnt_ref[0] = 0
                for t in range(nb - 1, -1, -1):
                    @pl.when(block_possible(t, ox, oy, oz, dx, dy, dz))
                    def _(t=t):
                        list_ref[cnt_ref[0]] = t
                        cnt_ref[0] = cnt_ref[0] + 1

                def block(i, c):
                    base = list_ref[i] * SPHERE_BLOCK + (SPHERE_BLOCK - 1)
                    for k in range(SPHERE_BLOCK):
                        c = step(base - k, c)
                    return c

                return jax.lax.fori_loop(0, cnt_ref[0], block, carry)

            def block(i, c):
                base = (nb - 1 - i) * SPHERE_BLOCK + (SPHERE_BLOCK - 1)
                for k in range(SPHERE_BLOCK):
                    c = step(base - k, c)
                return c

            return jax.lax.fori_loop(0, nb, block, carry)

        def any_hit(ox, oy, oz, dx, dy, dz, maxt):
            if loop_scene and HOIST_SPHERE:
                t_of = make_sphere_t_hoisted(ox, oy, oz, dx, dy, dz)
            else:
                t_of = lambda j: sphere_t(j, ox, oy, oz, dx, dy, dz)

            def step(j, occ):
                tj = t_of(j)
                return jnp.where((tj != 0.0) & (tj < maxt), 1.0, occ)

            if loop_scene:
                # Same culled blocked sweep as ``nearest`` (order
                # irrelevant for an any-hit OR; 1-register carry). The
                # block flags are rebuilt against THESE shadow rays
                # (maxt ignored by the bound test — conservative
                # superset). Carry is a 1-tuple so _culled_sweep's
                # tuple plumbing is shared.
                occ = _culled_sweep(
                    lambda j, c: (step(j, c[0]),), (zero,),
                    ox, oy, oz, dx, dy, dz,
                )[0]
            else:
                occ = zero
                for j in range(n_spheres - 1, -1, -1):
                    occ = step(j, occ)
            return occ > 0.5

        # --- bounce loop (geomfunc.h:182-336), unrolled max_depth times ---
        # Large scenes (loop_scene) wrap each bounce — and the NEE/diffuse
        # block inside it — in a lax.cond keyed on whether ANY lane in the
        # [sublanes, 128] tile still needs it: a tile whose rays all
        # escaped the (open) complex fractal scene skips the remaining
        # bounces' 783-sphere sweeps entirely. Every RNG draw inside the
        # skipped regions is already masked (rng_masked) by a subset of
        # the skip predicate, so skipping is stream-identical to
        # executing — the Pallas output stays bit-equal to the jnp path.
        def bounce(carry):
            (ox, oy, oz, dx, dy, dz, rad_r, rad_g, rad_b,
             thr_r, thr_g, thr_b, alive_f, spec_f, s0, s1) = carry
            t, hit, attrs = nearest(ox, oy, oz, dx, dy, dz)
            (ccx, ccy, ccz, ex, ey, ez, cr, cg, cb, mat, emissive_f) = attrs
            act = (alive_f > 0.5) & hit
            t_safe = jnp.where(hit, t, 1.0)
            hx = ox + t_safe * dx
            hy = oy + t_safe * dy
            hz = oz + t_safe * dz
            nx0, ny0, nz0 = hx - ccx, hy - ccy, hz - ccz
            inv = 1.0 / jnp.sqrt(
                jnp.maximum(nx0 * nx0 + ny0 * ny0 + nz0 * nz0, 1e-38)
            )
            nx, ny, nz = nx0 * inv, ny0 * inv, nz0 * inv
            dp = nx * dx + ny * dy + nz * dz
            sgn = jnp.where(dp > 0.0, -1.0, 1.0)  # -sign(dp), sign(0)=-1
            nlx, nly, nlz = sgn * nx, sgn * ny, sgn * nz

            # Per-sphere emissive classification (vec.h:44 viszero incl.
            # its y-bug) is baked host-side into scene row 11 (pack_scene).
            emissive = emissive_f > 0.5

            hit_light = act & emissive
            gate = hit_light & (spec_f > 0.5)
            adp = jnp.abs(dp)
            rad_r = rad_r + jnp.where(gate, adp * thr_r * ex, 0.0)
            rad_g = rad_g + jnp.where(gate, adp * thr_g * ey, 0.0)
            rad_b = rad_b + jnp.where(gate, adp * thr_b * ez, 0.0)

            live = act & ~emissive
            is_diff = live & (mat == 0.0)
            is_spec = live & (mat == 1.0)
            is_refr = live & (mat != 0.0) & (mat != 1.0)

            tcr, tcg, tcb = thr_r * cr, thr_g * cg, thr_b * cb

            # --- SampleLights (geomfunc.h:112-165) + diffuse bounce dir:
            # everything in here is gated lane-wise on is_diff, so the
            # whole block can be tile-skipped when no lane is diffuse.
            def diffuse_block(carry):
                s0, s1 = carry
                ld_r, ld_g, ld_b = zero, zero, zero
                for li in light_indices:
                    # right-to-left C arg evaluation: first draw -> u2
                    # (phi), second -> u1 (zz). See models/smallpt.py
                    # sample_lights.
                    u2, s0, s1 = rng_masked(s0, s1, is_diff)
                    u1, s0, s1 = rng_masked(s0, s1, is_diff)
                    zz = 1.0 - 2.0 * u1
                    rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - zz * zz))
                    phi = jnp.float32(2.0 * np.pi) * u2
                    ux = rr * jnp.cos(phi)
                    uy = rr * jnp.sin(phi)
                    uz = zz
                    lrad = sc(3, li)
                    spx = lrad * ux + sc(0, li) - hx
                    spy = lrad * uy + sc(1, li) - hy
                    spz = lrad * uz + sc(2, li) - hz
                    ln = jnp.sqrt(spx * spx + spy * spy + spz * spz)
                    ln_s = jnp.maximum(ln, 1e-20)
                    sdx, sdy, sdz = spx / ln_s, spy / ln_s, spz / ln_s
                    wo = sdx * ux + sdy * uy + sdz * uz
                    wi = sdx * nlx + sdy * nly + sdz * nlz
                    occ = any_hit(hx, hy, hz, sdx, sdy, sdz, ln - eps)
                    s_fac = (
                        jnp.float32(4.0 * np.pi)
                        * lrad
                        * lrad
                        * wi
                        * (-wo)
                        / (ln_s * ln_s)
                    )
                    ok = (wo <= 0.0) & (wi > 0.0) & ~occ & is_diff
                    s_fac = jnp.where(ok, s_fac, 0.0)
                    ld_r = ld_r + s_fac * sc(4, li)
                    ld_g = ld_g + s_fac * sc(5, li)
                    ld_b = ld_b + s_fac * sc(6, li)

                # --- diffuse bounce direction (geomfunc.h:242-265) ---
                if not direct_only:
                    r1u, s0, s1 = rng_masked(s0, s1, is_diff)
                    r2u, s0, s1 = rng_masked(s0, s1, is_diff)
                    ang = jnp.float32(2.0 * np.pi) * r1u
                    r2s = jnp.sqrt(r2u)
                    big_x = jnp.abs(nlx) > 0.1
                    ax = jnp.where(big_x, 0.0, 1.0)
                    ay = jnp.where(big_x, 1.0, 0.0)
                    # u = norm(a x w); v = w x u
                    ux0 = ay * nlz
                    uy0 = -ax * nlz
                    uz0 = ax * nly - ay * nlx
                    ux1, uy1, uz1 = _norm3(ux0, uy0, uz0)
                    vx = nly * uz1 - nlz * uy1
                    vy = nlz * ux1 - nlx * uz1
                    vz = nlx * uy1 - nly * ux1
                    ca, sa = jnp.cos(ang) * r2s, jnp.sin(ang) * r2s
                    wsc = jnp.sqrt(jnp.maximum(0.0, 1.0 - r2u))
                    ndx = ux1 * ca + vx * sa + nlx * wsc
                    ndy = uy1 * ca + vy * sa + nly * wsc
                    ndz = uz1 * ca + vz * sa + nlz * wsc
                else:
                    ndx, ndy, ndz = dx, dy, dz
                return ld_r, ld_g, ld_b, ndx, ndy, ndz, s0, s1

            if loop_scene:
                any_diff = jnp.sum(jnp.where(is_diff, one, zero)) > 0.0
                (ld_r, ld_g, ld_b, ndx, ndy, ndz, s0, s1) = jax.lax.cond(
                    any_diff,
                    diffuse_block,
                    lambda c: (zero, zero, zero, dx, dy, dz) + c,
                    (s0, s1),
                )
            else:
                (ld_r, ld_g, ld_b, ndx, ndy, ndz, s0, s1) = diffuse_block(
                    (s0, s1)
                )

            rad_r = rad_r + jnp.where(is_diff, tcr * ld_r, 0.0)
            rad_g = rad_g + jnp.where(is_diff, tcg * ld_g, 0.0)
            rad_b = rad_b + jnp.where(is_diff, tcb * ld_b, 0.0)

            # --- SPEC reflect (geomfunc.h:270-280) ---
            k2dp = 2.0 * dp
            rfx = dx - k2dp * nx
            rfy = dy - k2dp * ny
            rfz = dz - k2dp * nz

            # --- REFR (geomfunc.h:281-336) ---
            into = (nx * nlx + ny * nly + nz * nlz) > 0.0
            nnt = jnp.where(into, jnp.float32(1.0 / 1.5), jnp.float32(1.5))
            ddn = dx * nlx + dy * nly + dz * nlz
            cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
            tir = cos2t < 0.0
            kk = jnp.where(into, 1.0, -1.0) * (
                ddn * nnt + jnp.sqrt(jnp.where(tir, 1.0, cos2t))
            )
            tdx0 = nnt * dx - kk * nx
            tdy0 = nnt * dy - kk * ny
            tdz0 = nnt * dz - kk * nz
            tinv = 1.0 / jnp.sqrt(
                jnp.maximum(tdx0 * tdx0 + tdy0 * tdy0 + tdz0 * tdz0, 1e-38)
            )
            tdx, tdy, tdz = tdx0 * tinv, tdy0 * tinv, tdz0 * tinv
            r0 = jnp.float32(0.25 / 6.25)
            c1 = 1.0 - jnp.where(into, -ddn, tdx * nx + tdy * ny + tdz * nz)
            re = r0 + (1.0 - r0) * c1 * c1 * c1 * c1 * c1
            pp = 0.25 + 0.5 * re
            rp = re / pp
            tp = (1.0 - re) / (1.0 - pp)
            u_rr, s0, s1 = rng_masked(s0, s1, is_refr & ~tir)
            pick_refl = u_rr < pp
            refr_refl = is_refr & (tir | pick_refl)
            refr_trans = is_refr & ~tir & ~pick_refl

            plain = is_diff | is_spec | (is_refr & tir)
            scale = jnp.where(
                plain, 1.0, jnp.where(refr_trans, tp, jnp.where(is_refr, rp, 1.0))
            )
            n_thr_r = jnp.where(live, scale * tcr, thr_r)
            n_thr_g = jnp.where(live, scale * tcg, thr_g)
            n_thr_b = jnp.where(live, scale * tcb, thr_b)

            take_refl = is_spec | refr_refl
            ndx = jnp.where(take_refl, rfx, jnp.where(refr_trans, tdx, ndx))
            ndy = jnp.where(take_refl, rfy, jnp.where(refr_trans, tdy, ndy))
            ndz = jnp.where(take_refl, rfz, jnp.where(refr_trans, tdz, ndz))

            ox = jnp.where(live, hx, ox)
            oy = jnp.where(live, hy, oy)
            oz = jnp.where(live, hz, oz)
            dx = jnp.where(live, ndx, dx)
            dy = jnp.where(live, ndy, dy)
            dz = jnp.where(live, ndz, dz)
            thr_r, thr_g, thr_b = n_thr_r, n_thr_g, n_thr_b
            spec_f = jnp.where(is_diff, 0.0, jnp.where(is_spec | is_refr, 1.0, spec_f))
            if direct_only:
                alive_f = jnp.where(live & ~is_diff, 1.0, 0.0)
            else:
                alive_f = jnp.where(live, 1.0, 0.0)
            return (ox, oy, oz, dx, dy, dz, rad_r, rad_g, rad_b,
                    thr_r, thr_g, thr_b, alive_f, spec_f, s0, s1)

        carry = (ox, oy, oz, dx, dy, dz, rad_r, rad_g, rad_b,
                 thr_r, thr_g, thr_b, alive_f, spec_f, s0, s1)
        # Tile-level early exit for EVERY kernel variant (not just
        # loop_scene): a bounce whose whole [sublanes, 128] tile is dead
        # is the identity (all RNG draws inside are masked by subsets of
        # alive, so skipping is stream-identical to executing), and in
        # direct-lighting mode diffuse lanes terminate after the first
        # NEE estimate — most tiles die at depth 1 and skip the
        # remaining sweeps, which is what makes DL faster than PT like
        # the reference observes ("very fast indeed",
        # smallptgpu-v1.6/README.txt:36-44). Depth 0 always runs: the
        # initial alive_f is all-ones.
        for _depth in range(max_depth):
            if _depth == 0 or not EARLY_EXIT:
                carry = bounce(carry)
            else:
                any_alive = jnp.sum(carry[12]) > 0.0
                carry = jax.lax.cond(any_alive, bounce, lambda c: c, carry)
        (ox, oy, oz, dx, dy, dz, rad_r, rad_g, rad_b,
         thr_r, thr_g, thr_b, alive_f, spec_f, s0, s1) = carry

        # --- running-mean accumulate (rendering_kernel.cl:80-89) ---
        samp = samp_ref[0, 0].astype(jnp.float32)
        k2 = 1.0 / (samp + 1.0)
        acc_out[0] = (acc_ref[0] * samp + rad_r) * k2
        acc_out[1] = (acc_ref[1] * samp + rad_g) * k2
        acc_out[2] = (acc_ref[2] * samp + rad_b) * k2
        s0_out[:] = s0
        s1_out[:] = s1

    return kernel


def _pass_impl(
    scene_tab: jnp.ndarray,  # [12, N]
    cam_tab: jnp.ndarray,  # [1, 12]
    sample_idx: jnp.ndarray,  # scalar int32
    s0: jnp.ndarray,  # [Rp] uint32 (padded to tile multiple)
    s1: jnp.ndarray,
    acc: jnp.ndarray,  # [3, Rp/128, 128] f32
    pix: jnp.ndarray | None = None,  # [Rp] i32 absolute pixel id per lane
    *,
    width: int,
    height: int,
    max_depth: int,
    direct_only: bool,
    light_indices: Tuple[int, ...],
    emissive_flags: Tuple[bool, ...],
    sublanes: int = DEF_SUBLANES,
    interpret: bool = False,
    rng: str = "mwc",
):
    """One fused progressive pass. Returns (s0, s1, acc) updated."""
    n = scene_tab.shape[1]
    rp = s0.shape[0]
    tile = sublanes * LANES
    assert rp % tile == 0, (rp, tile)
    grid = rp // tile
    rows = rp // LANES
    loop_scene = n > UNROLL_MAX_SPHERES

    kernel = _make_kernel(
        n, light_indices, emissive_flags, width, height, max_depth,
        direct_only, sublanes, loop_scene=loop_scene, rng=rng,
    )
    s2 = s0.reshape(rows, LANES)
    s3 = s1.reshape(rows, LANES)
    if pix is None:
        pix = jnp.arange(rp, dtype=jnp.int32)
    pix2 = pix.reshape(rows, LANES)

    # The loop kernel indexes spheres dynamically — scalar memory is the
    # right home for the table there; the unrolled kernel reads static
    # offsets, fine from VMEM.
    scene_space = pltpu.SMEM if loop_scene else pltpu.VMEM

    in_arrays = [
        sample_idx.reshape(1, 1),
        scene_tab,
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # sample idx (1,1)
        pl.BlockSpec(memory_space=scene_space),  # scene table
    ]
    scratch_shapes = []
    if loop_scene:
        # Per-block bounding spheres + the compacted active-block list
        # scratch for the tile-level cull.
        in_arrays.append(block_bounds(scene_tab))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        nb = max(n // SPHERE_BLOCK, 1)
        scratch_shapes = [
            pltpu.SMEM((nb,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ]
    in_arrays += [cam_tab, pix2, s2, s3, acc]
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # camera
        pl.BlockSpec((sublanes, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((sublanes, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((sublanes, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, sublanes, LANES), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
    ]
    base = len(in_arrays) - 3  # index of s2 among inputs

    out_s0, out_s1, out_acc = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((sublanes, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sublanes, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, sublanes, LANES), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((3, rows, LANES), jnp.float32),
        ],
        input_output_aliases={base: 0, base + 1: 1, base + 2: 2},
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*in_arrays)
    return out_s0.reshape(rp), out_s1.reshape(rp), out_acc


pt_sample_pass = jax.jit(
    _pass_impl,
    static_argnames=(
        "width", "height", "max_depth", "direct_only", "sublanes",
        "light_indices", "emissive_flags", "interpret", "rng",
    ),
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_samples", "width", "height", "max_depth", "direct_only",
        "sublanes", "light_indices", "emissive_flags", "interpret", "rng",
    ),
)
def pt_multi_pass(
    scene_tab: jnp.ndarray,
    cam_tab: jnp.ndarray,
    start_sample: jnp.ndarray,  # scalar int32
    s0: jnp.ndarray,
    s1: jnp.ndarray,
    acc: jnp.ndarray,
    pix: jnp.ndarray | None = None,
    *,
    num_samples: int,
    width: int,
    height: int,
    max_depth: int,
    direct_only: bool,
    light_indices: Tuple[int, ...],
    emissive_flags: Tuple[bool, ...],
    sublanes: int = DEF_SUBLANES,
    interpret: bool = False,
    rng: str = "mwc",
):
    """``num_samples`` progressive passes fused into ONE device dispatch.

    The Python-loop-of-launches form costs a host round-trip per pass
    (the reference pays the same per ``clEnqueueNDRangeKernel``,
    smallptGPU.cpp:739-755); here a ``lax.scan`` over the sample index
    keeps the whole progressive loop on device with the seed/accumulator
    buffers donated in place."""

    def body(carry, i):
        s0, s1, acc = carry
        s0, s1, acc = _pass_impl(
            scene_tab, cam_tab, start_sample + i, s0, s1, acc, pix,
            width=width, height=height, max_depth=max_depth,
            direct_only=direct_only, light_indices=light_indices,
            emissive_flags=emissive_flags, sublanes=sublanes,
            interpret=interpret, rng=rng,
        )
        return (s0, s1, acc), None

    (s0, s1, acc), _ = jax.lax.scan(
        body, (s0, s1, acc), jnp.arange(num_samples, dtype=jnp.int32)
    )
    return s0, s1, acc


@functools.lru_cache(maxsize=32)
def ray_layout(
    width: int, height: int, sublanes: int = DEF_SUBLANES,
    blocked: bool = False, tile_multiple: int = 1,
):
    """Lane <-> pixel layout for the fused kernel.

    Returns (rp, pix, inv) as host numpy: ``rp`` = padded lane count,
    ``pix[lane]`` = absolute pixel id (pad lanes get ``width*height`` —
    one past the end, the pad slot of a seed array extended by one),
    ``inv[pixel]`` = lane holding that pixel (None for the identity
    layout, where lane == pixel and assembly is a slice).

    Identity order serves small scenes. ``blocked`` remaps lanes so
    each [sublanes, 128] tile covers a near-square image block (64x32
    at sublanes=16) — a tight tile frustum is what makes the
    large-scene per-tile block cull effective: measured primary-bounce
    block survival on complex783 is 10.5% for 64x32 blocks vs 23% for
    the 4-row strips the flat order produces (tools/profile_complex.py
    predictor). Values are UNCHANGED by the remap (pixel ids, and
    therefore RNG streams and radiances, travel with the lane).

    ``tile_multiple``: round the tile count up to this multiple (sharded
    renders need equal whole-tile shards per device)."""
    r = width * height
    tile = sublanes * LANES
    m = tile_multiple

    def round_tiles(ntiles):
        return ((ntiles + m - 1) // m) * m

    if not blocked:
        rp = round_tiles((r + tile - 1) // tile) * tile
        return rp, np.arange(rp, dtype=np.int32), None
    th_ = 32
    tw_ = max(tile // th_, 1)
    gw = (width + tw_ - 1) // tw_
    gh = (height + th_ - 1) // th_
    rp = round_tiles(gw * gh) * tile
    lanes = np.arange(rp)
    ti, wi = lanes // tile, lanes % tile
    wy, wx = wi // tw_, wi % tw_
    tr, tc = ti // gw, ti % gw
    px = tc * tw_ + wx
    py = tr * th_ + wy
    valid = (px < width) & (py < height) & (ti < gw * gh)
    pix = np.where(valid, py * width + px, r).astype(np.int32)
    inv = np.empty(r, np.int64)
    inv[pix[valid]] = lanes[valid]
    return rp, pix, inv


def render_pallas(
    scene: Scene,
    camera,
    config,
    num_samples: int | None = None,
    state: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int] | None = None,
    interpret: bool = False,
):
    """Progressive Pallas render.

    Returns (image [H, W, 3] float32, (s0, s1, acc, sample) state).
    """
    from se195_raytracer_tpu.core.rng import init_state
    from se195_raytracer_tpu.core.types import update_camera

    w, h = config.width, config.height
    r = w * h
    spp = num_samples if num_samples is not None else config.spp
    blocked = scene.num_spheres > UNROLL_MAX_SPHERES
    rp, pix_np, inv_np = ray_layout(w, h, DEF_SUBLANES, blocked)

    if state is None:
        # Seed the REAL pixels exactly like the XLA path (same stream
        # over (r,)), then lay the per-pixel states out in LANE order
        # (identity for small scenes; tile-blocked for loop scenes) with
        # an inert pad state in the slack lanes — output stays
        # bit-identical to the jnp path at every resolution and layout.
        # Pad value 2 is the minimal valid MWC seed; for the counter RNG
        # the pad is (key=2, ctr=2), equally valid and discarded.
        s0, s1 = init_state(config.rng, (r,), config.seed)
        pad = jnp.full((max(rp - r, 1),), 2, jnp.uint32)
        if blocked:
            s0 = jnp.concatenate([s0, pad[:1]])[pix_np]
            s1 = jnp.concatenate([s1, pad[:1]])[pix_np]
        elif rp != r:
            s0 = jnp.concatenate([s0, pad])
            s1 = jnp.concatenate([s1, pad])
        acc = jnp.zeros((3, rp // LANES, LANES), jnp.float32)
        start = 0
    else:
        s0, s1, acc, start = state

    scene_tab = pack_scene(scene)
    cam_tab = pack_camera(update_camera(camera, w, h))
    emissive_flags = tuple(
        bool(i in scene.light_indices) for i in range(scene.num_spheres)
    )
    s0, s1, acc = pt_multi_pass(
        scene_tab, cam_tab, jnp.int32(start), s0, s1, acc,
        jnp.asarray(pix_np),
        num_samples=spp, width=w, height=h, max_depth=config.max_depth,
        direct_only=(config.integrator == "dl"),
        light_indices=scene.light_indices,
        emissive_flags=emissive_flags,
        interpret=interpret,
        rng=config.rng,
    )
    flat = acc.reshape(3, rp)
    flat = flat[:, inv_np] if blocked else flat[:, :r]
    img = flat.T.reshape(h, w, 3)
    return img, (s0, s1, acc, start + spp)
