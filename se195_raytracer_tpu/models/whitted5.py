"""Extended Whitted tracer — the raytracer5 feature set, TPU-native.

Capabilities of raytracer5/trunk/raytracer.cpp Engine::Raytrace:228-363 /
CalcShade:371-406 and scene.cpp primitives, re-expressed as a batched
unrolled reflect/refract tree over masked ray lanes:

* sphere / one-sided plane / axis-aligned box primitives
  (Sphere::Intersect scene.cpp:128-159, PlanePrim::Intersect :232-244
  — note the plane has NO dist>0 guard, faithfully kept — and the
  Box slab test :306-350)
* point lights (sphere) and box **area lights** with the 4x4 jittered
  grid Monte-Carlo shadow estimator (CalcShade:371-406, grid table
  Box::Light scene.cpp:376-404); shadow rays must reach the light
  primitive itself (occluders include other lights)
* glossy reflection (DiffuseRefl disc sampling, raytracer.cpp:290-319)
  — the reference averages SAMPLES=4 in-node disc samples; here each
  pass draws ONE stochastic disc sample (same estimator, the variance
  folds into progressive passes), keeping the trace a binary tree
* dielectric refraction with Beer's-law absorption where the
  transparency uses the CHILD ray's travel distance
  (raytracer.cpp:335-359) — unlike the 3.2.0x kernel which uses the
  parent distance
* bilinearly filtered textures with UV scaling: sphere polar mapping
  (Sphere::GetColor scene.cpp:161-176), plane axis mapping
  (PlanePrim::GetColor :263-277), texel fetch with the reference's
  +1000.5/+1000.0 offsets and its width-for-height indexing quirk
  (Texture::GetTexel :81-106)
* the reference's position-independent Box::GetNormal (scene.cpp:352-374
  computes its six candidate distances from box pos/size only — the hit
  point is ignored; replicated exactly)
* look-at camera matrix with the (0,0,-5) eye / 8x6 screen plane at z=0
  (Engine::InitRender raytracer.cpp:413-451)
* IMPORTANCE-style area-light sample scheduling: 4 shadow samples at the
  primary level, halved per bounce (raytracer.cpp:312-331 a_Samples
  scaling), as a static per-level count

Not carried over: the regular-grid accelerator + ray-ID mailboxing
(FindNearest raytracer.cpp:53-221) — brute-force [rays, prims] is the
right shape on TPU for N <= ~1k; and the 100ms cooperative time slicing
(Render:526-531), a Windows-message-pump artifact. The reference's
adaptive 1-vs-4-ray supersampling (Render:481-535) IS carried over, as a
two-phase compacted renderer (``render_whitted5_adaptive``): full-frame
primary pass -> primitive-change edge mask -> the 3 extra sub-pixel rays
traced only for the compacted edge-pixel set (fixed-size DEVICE-side
compaction by default since r5 — no host round-trip; the exact-bucket
host path is retained), with ``render_whitted5_4ray`` as the honest
full-supersampling comparator. ``soft_edges > 0`` swaps CalcShade's
binary visibility for the smooth shadow transmittance
(_soft_shadow_transmittance) so area-light/occluder silhouettes carry
gradients.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from se195_raytracer_tpu.core.rng import MWCState, counter_next_masked
from se195_raytracer_tpu.scenes.whitted5_scenes import (
    BOX5,
    BOX_LIGHT_GRID,
    PLANE5,
    SPHERE5,
    Whitted5Scene,
)

EPSILON5 = 0.001  # raytracer5 common.h:27
TRACEDEPTH5 = 4  # common.h:28
PI = float(np.float32(np.pi))

HIT, MISS, INPRIM = 1, 0, -1


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _arccos1(x):
    """arccos of an already-clipped cosine, bitwise-equal forward,
    NaN-free backward: arccos'(+-1) is infinite and the usual
    clip-then-arccos turns that into 0*inf = NaN for every lane at the
    poles, which poisons whole-scene gradients (r5: box-light position
    grads were NaN through Sphere::GetColor's polar mapping). Endpoint
    lanes take exact constants (arccos(1)=0, arccos(-1)=pi(f32)) via
    the double-where pattern; interior lanes differentiate normally."""
    edge = jnp.abs(x) >= 1.0
    xs = jnp.where(edge, 0.0, x)
    endpoint = jnp.where(x >= 1.0, jnp.float32(0.0), jnp.float32(PI))
    return jnp.where(edge, endpoint, jnp.arccos(xs))


@functools.lru_cache(maxsize=64)
def _type_partition(ptype: Tuple[int, ...]):
    """Static partition of primitive indices by class + the inverse
    permutation that restores original order after per-class concat."""
    t = np.array(ptype, np.int32)
    sph = np.nonzero(t == SPHERE5)[0]
    pla = np.nonzero(t == PLANE5)[0]
    box = np.nonzero(t == BOX5)[0]
    perm = np.concatenate([sph, pla, box])
    inv = np.argsort(perm)
    return sph, pla, box, inv


def _prim_candidates(scene: Whitted5Scene, o: jnp.ndarray, d: jnp.ndarray):
    """Per-primitive candidate hits, [R, N] each: (dist, code, valid).

    code is HIT or INPRIM (spheres entered from inside). Semantics per
    primitive class:
    * sphere — scene.cpp:128-159 (det > 0 strict, i2 > 0, near root if
      i1 >= 0 else far root as INPRIM)
    * plane — scene.cpp:232-244: only faces with dot(N, d) < 0; NO
      dist > 0 rejection (faithful)
    * box — scene.cpp:306-350: six slab distances, point-in-box with
      +-EPSILON slack, smallest positive candidate

    The primitive table is partitioned by class (statically, from the
    pytree-aux ``ptype``) so each class formula runs only on its own
    columns — the reference dispatches per-primitive virtual Intersect
    calls (raytracer.cpp:228-237); a vector machine instead evaluates
    each class once on its compact [R, N_class] block and stitches the
    columns back in original primitive order (tie-break order preserved).
    """
    sph, pla, box, inv = _type_partition(scene.ptype)
    dists, valids, codes = [], [], []

    if sph.size:
        # Spheres.
        v = o[:, None, :] - scene.center[sph][None, :, :]
        sb = -jnp.sum(v * d[:, None, :], axis=-1)
        rad = scene.radius[sph]
        det = sb * sb - jnp.sum(v * v, axis=-1) + (rad * rad)[None, :]
        s_ok = det > 0.0
        sq = jnp.sqrt(jnp.where(s_ok, det, 1.0))
        i1 = sb - sq
        i2 = sb + sq
        s_ok = s_ok & (i2 > 0.0)
        s_inprim = i1 < 0.0
        dists.append(jnp.where(s_inprim, i2, i1))
        valids.append(s_ok)
        codes.append(
            jnp.where(s_inprim, jnp.int32(INPRIM), jnp.int32(HIT))
        )

    if pla.size:
        # Planes (one-sided). The k=3 contraction is written as explicit
        # elementwise mul/adds, NOT einsum: einsum lowers to a matmul
        # whose kernel (and f32 rounding) depends on the batch shape R,
        # which breaks bitwise shard-invariance (render_whitted5_sharded
        # slices R per device), and on TPU could land on the MXU in bf16
        # where the rounding eats epsilon-scale offsets. Elementwise ops
        # are IEEE-deterministic at every shape on every backend.
        nrm = scene.normal[pla]  # [Np, 3]
        pd = (
            nrm[None, :, 0] * d[:, None, 0]
            + nrm[None, :, 1] * d[:, None, 1]
            + nrm[None, :, 2] * d[:, None, 2]
        )
        p_ok = pd < 0.0
        pd_safe = jnp.where(pd != 0.0, pd, 1.0)
        no = (
            nrm[None, :, 0] * o[:, None, 0]
            + nrm[None, :, 1] * o[:, None, 1]
            + nrm[None, :, 2] * o[:, None, 2]
        )
        p_dist = -(no + scene.depth[pla][None, :]) / pd_safe
        dists.append(p_dist)
        valids.append(p_ok)
        codes.append(jnp.full(p_dist.shape, HIT, jnp.int32))

    if box.size:
        # Boxes: six slab faces (scene.cpp:306-350), evaluated one face
        # at a time with a running min — same candidates and predicates
        # as the reference's loop, but peak temporaries stay [R, Nb]
        # instead of the [R, Nb, 6, 3] hit-point tensor (which at the
        # deep tree levels' 8R batches cost gigabytes of HLO temps).
        v1 = scene.box_pos[box]  # [Nb, 3]
        v2 = v1 + scene.box_size[box]
        eps = jnp.float32(EPSILON5)
        b_dist = jnp.full((o.shape[0], box.size), 1e30, jnp.float32)
        b_ok = jnp.zeros((o.shape[0], box.size), bool)
        for axis in range(3):
            d_a = d[:, axis : axis + 1]  # [R, 1]
            o_a = o[:, axis : axis + 1]
            d_safe = jnp.where(d_a != 0.0, d_a, 1.0)
            axis_ok = d_a != 0.0
            for bound in (v1, v2):
                t_f = (bound[None, :, axis] - o_a) / d_safe  # [R, Nb]
                inside = jnp.ones_like(b_ok)
                for a2 in range(3):
                    ip_a = o[:, a2 : a2 + 1] + t_f * d[:, a2 : a2 + 1]
                    inside = inside & (
                        (ip_a > v1[None, :, a2] - eps)
                        & (ip_a < v2[None, :, a2] + eps)
                    )
                face_ok = axis_ok & (t_f > 0.0) & inside
                b_dist = jnp.where(face_ok & (t_f < b_dist), t_f, b_dist)
                b_ok = b_ok | face_ok
        dists.append(b_dist)
        valids.append(b_ok)
        codes.append(jnp.full((o.shape[0], box.size), HIT, jnp.int32))

    dist = jnp.concatenate(dists, axis=1)[:, inv]
    valid = jnp.concatenate(valids, axis=1)[:, inv]
    code = jnp.concatenate(codes, axis=1)[:, inv]
    return dist, code, valid


def find_nearest(
    scene: Whitted5Scene, o: jnp.ndarray, d: jnp.ndarray, max_dist: float = 1e6
):
    """FindNearest semantics (brute force): ascending primitive order,
    strict improvement (raytracer.cpp:228-237 via per-class Intersect).

    Returns (idx [R] int32, code [R], dist [R]); idx = -1 on miss.
    """
    dist, code, valid = _prim_candidates(scene, o, d)
    # Ascending-order strict-improvement scan == first-index argmin over
    # the masked distances (jnp.argmin returns the FIRST minimum, exactly
    # the reference's `dist < best` tie-break).
    dm = jnp.where(valid, dist, jnp.float32(np.inf))
    best = jnp.min(dm, axis=1)
    amin = jnp.argmin(dm, axis=1).astype(jnp.int32)
    hit = best < jnp.float32(max_dist)
    idx = jnp.where(hit, amin, -1)
    res = jnp.where(
        hit, jnp.take_along_axis(code, amin[:, None], axis=1)[:, 0], MISS
    )
    best = jnp.where(hit, best, jnp.float32(max_dist))
    return idx, res, best


def _nearest_is(
    scene: Whitted5Scene, o, d, max_dist: jnp.ndarray, target: int
) -> jnp.ndarray:
    """True where the nearest primitive within max_dist is ``target`` —
    the CalcShade visibility test (shadow rays must reach the light
    itself, raytracer.cpp:379-384,396-401)."""
    dist, _, valid = _prim_candidates(scene, o, d)
    dm = jnp.where(valid, dist, jnp.float32(np.inf))
    best = jnp.min(dm, axis=1)
    amin = jnp.argmin(dm, axis=1).astype(jnp.int32)
    return (best < max_dist) & (amin == target)


def _soft_shadow_transmittance(
    scene: Whitted5Scene, o, d, max_t, target: int, soft_w: float
) -> jnp.ndarray:
    """[R] smooth shadow transmittance in [0, 1] (1 = fully lit) — the
    whitted5 face of the differentiable-visibility relaxation
    (models/smallpt.py hard-part-2 notes apply; soft-OR/width semantics
    shared with _soft_transmittance there, extended to the three
    primitive classes). Replaces _nearest_is's binary nearest-is-light
    indicator: every non-target primitive contributes a smooth
    occlusion weight occ_j = sigma(margin/w) * in-range window, and
    T = prod(1 - occ_j). As w -> 0 this recovers the hard semantics up
    to the relaxation's ~w-wide silhouette band.

    Class margins: spheres use the silhouette distance (exactly the
    smallpt relaxation); one-sided planes keep the facing test hard
    (it depends only on the shadow-ray direction) and soften the
    in-range window; boxes use smooth windows around the slab
    entry/exit span (the span itself uses hard min/max — C0 with
    bounded derivatives, inside the band the relaxation blurs anyway).
    """
    from se195_raytracer_tpu.models.smallpt import _sigmoid, _smax0

    w = jnp.float32(soft_w)
    eps = jnp.float32(EPSILON5)
    sph, pla, box, _ = _type_partition(scene.ptype)
    mt = max_t[:, None]
    trans = jnp.ones(o.shape[0], jnp.float32)

    def in_range(t):
        return _sigmoid((t - eps) / w) * _sigmoid((mt - t) / w)

    def drop_target(occ, cls_idx):
        keep = (np.asarray(cls_idx) != target)[None, :]
        return occ * jnp.asarray(keep, jnp.float32)

    if sph.size:
        c = scene.center[sph]
        r = scene.radius[sph]
        op = c[None, :, :] - o[:, None, :]
        b = jnp.sum(op * d[:, None, :], axis=-1)
        perp = op - b[..., None] * d[:, None, :]
        pd = jnp.sqrt(jnp.maximum(jnp.sum(perp * perp, axis=-1), 1e-12))
        m_sil = r[None, :] - pd
        det = m_sil * (r[None, :] + pd)
        sq = jnp.sqrt(_smax0(det, soft_w) + w * w)
        f1 = in_range(b - sq)
        f2 = in_range(b + sq)
        occ = _sigmoid(m_sil / w) * (f1 + f2 - f1 * f2)
        trans = trans * jnp.prod(1.0 - drop_target(occ, sph), axis=-1)

    if pla.size:
        # Elementwise contractions, not einsum — same TPU-determinism
        # rationale as _prim_candidates (MXU bf16 would eat eps-scale
        # offsets).
        nrm = scene.normal[pla]
        pdir = (
            nrm[None, :, 0] * d[:, None, 0]
            + nrm[None, :, 1] * d[:, None, 1]
            + nrm[None, :, 2] * d[:, None, 2]
        )
        pdir_safe = jnp.where(pdir != 0.0, pdir, 1.0)
        no = (
            nrm[None, :, 0] * o[:, None, 0]
            + nrm[None, :, 1] * o[:, None, 1]
            + nrm[None, :, 2] * o[:, None, 2]
        )
        t = -(no + scene.depth[pla][None, :]) / pdir_safe
        occ = jnp.where(pdir < 0.0, in_range(t), 0.0)
        trans = trans * jnp.prod(1.0 - drop_target(occ, pla), axis=-1)

    if box.size:
        v1 = scene.box_pos[box]
        v2 = v1 + scene.box_size[box]
        big = jnp.float32(1e30)
        tmin = jnp.full((o.shape[0], box.size), -big)
        tmax = jnp.full((o.shape[0], box.size), big)
        for axis in range(3):
            d_a = d[:, axis : axis + 1]
            o_a = o[:, axis : axis + 1]
            d_safe = jnp.where(d_a != 0.0, d_a, 1.0)
            ta = (v1[None, :, axis] - o_a) / d_safe
            tb = (v2[None, :, axis] - o_a) / d_safe
            lo = jnp.minimum(ta, tb)
            hi = jnp.maximum(ta, tb)
            inside_a = (o_a > v1[None, :, axis]) & (o_a < v2[None, :, axis])
            lo = jnp.where(d_a != 0.0, lo, jnp.where(inside_a, -big, big))
            hi = jnp.where(d_a != 0.0, hi, jnp.where(inside_a, big, -big))
            tmin = jnp.maximum(tmin, lo)
            tmax = jnp.minimum(tmax, hi)
        occ = (
            _sigmoid((tmax - tmin) / w)
            * _sigmoid((tmax - eps) / w)
            * _sigmoid((mt - tmin) / w)
        )
        trans = trans * jnp.prod(1.0 - drop_target(occ, box), axis=-1)

    return trans


def _box_normal_static(scene: Whitted5Scene, j: int) -> jnp.ndarray:
    """Box::GetNormal (scene.cpp:352-374), position-independent as in the
    reference: six candidate 'distances' computed from pos/size only."""
    pos = scene.box_pos[j]
    size = scene.box_size[j]
    cands = jnp.stack(
        [
            jnp.abs(size[0] - pos[0]),
            jnp.abs(size[0] + size[0] - pos[0]),
            jnp.abs(size[1] - pos[1]),
            jnp.abs(size[1] + size[1] - pos[1]),
            jnp.abs(size[2] - pos[2]),
            jnp.abs(size[2] + size[2] - pos[2]),
        ]
    )
    normals = jnp.array(
        [
            [-1.0, 0, 0], [1.0, 0, 0],
            [0, -1.0, 0], [0, 1.0, 0],
            [0, 0, -1.0], [0, 0, 1.0],
        ],
        jnp.float32,
    )
    return normals[jnp.argmin(cands)]


def _static_normals(scene: Whitted5Scene) -> jnp.ndarray:
    """[N, 3] table of the position-independent normals: plane normals and
    the reference's constant Box::GetNormal; sphere rows are unused (their
    normal is position-dependent and selected per lane in get_normal)."""
    rows = []
    for j in range(scene.num_prims):
        if scene.ptype[j] == PLANE5:
            rows.append(scene.normal[j])
        elif scene.ptype[j] == BOX5:
            rows.append(_box_normal_static(scene, j))
        else:
            rows.append(jnp.zeros(3, jnp.float32))
    return jnp.stack(rows)


def get_normal(scene: Whitted5Scene, idx: jnp.ndarray, point: jnp.ndarray):
    """Per-lane normal by primitive class: ONE gather from the static
    normal table (planes/boxes) selected against the sphere formula —
    O(1) ops in scene size instead of a where-chain per primitive."""
    n_sphere = (point - scene.center[idx]) * (
        1.0 / jnp.where(scene.radius[idx] != 0.0, scene.radius[idx], 1.0)
    )[:, None]
    is_sphere = jnp.asarray(np.array(scene.ptype) == SPHERE5)[idx]
    return jnp.where(is_sphere[:, None], n_sphere, _static_normals(scene)[idx])


def _texel(bitmap: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
           row_offset=None, wrap_shape=None) -> jnp.ndarray:
    """Texture::GetTexel (scene.cpp:81-106), including the quirk that both
    fu and fv are scaled by the texture *width*.

    ``wrap_shape``/``row_offset``: atlas mode — wrap math at the
    per-texture shape, rows offset into a row-concatenated atlas (see
    get_color)."""
    th, tw = (wrap_shape if wrap_shape is not None else bitmap.shape)[:2]
    fu = (u + 1000.5) * tw
    fv = (v + 1000.0) * tw
    u1 = jnp.floor(fu).astype(jnp.int32) % tw
    v1 = jnp.floor(fv).astype(jnp.int32) % th
    u2 = (u1 + 1) % tw
    v2 = (v1 + 1) % th
    if row_offset is not None:
        v1 = v1 + row_offset
        v2 = v2 + row_offset
    fracu = fu - jnp.floor(fu)
    fracv = fv - jnp.floor(fv)
    w1 = (1 - fracu) * (1 - fracv)
    w2 = fracu * (1 - fracv)
    w3 = (1 - fracu) * fracv
    w4 = fracu * fracv
    c1 = bitmap[v1, u1]
    c2 = bitmap[v1, u2]
    c3 = bitmap[v2, u1]
    c4 = bitmap[v2, u2]
    return (
        c1 * w1[:, None] + c2 * w2[:, None] + c3 * w3[:, None] + c4 * w4[:, None]
    )


def _prim_uv(scene: Whitted5Scene, j: int, point: jnp.ndarray):
    """(ucoord, vcoord) [R] for textured primitive j (Sphere::GetColor
    scene.cpp:161-176, PlanePrim::GetColor :263-277)."""
    us = scene.uv_scale[j]
    if scene.ptype[j] == SPHERE5:
        rr = 1.0 / jnp.where(scene.radius[j] != 0.0, scene.radius[j], 1.0)
        vp = (point - scene.center[j][None]) * rr
        # vn=(0,1,0), ve=(1,0,0), vc=vn x ve=(0,0,-1) (scene.cpp:117-120)
        cosphi = jnp.clip(-vp[:, 1], -1.0, 1.0)
        phi = _arccos1(cosphi)
        sinphi = jnp.sqrt(jnp.maximum(1.0 - cosphi * cosphi, 1e-12))
        vcoord = phi * (1.0 / us[1]) * (1.0 / PI)
        costheta = jnp.clip(vp[:, 0] / sinphi, -1.0, 1.0)
        theta = _arccos1(costheta) * (2.0 / PI)
        ucoord = jnp.where(-vp[:, 2] >= 0.0, (1.0 - theta), theta) * (1.0 / us[0])
    else:  # plane mapping (boxes keep material color in the reference)
        nrm = scene.normal[j]
        uaxis = jnp.stack([nrm[1], nrm[2], -nrm[0]])
        vaxis = jnp.cross(uaxis, nrm)
        ucoord = _dot(point, uaxis[None]) * us[0]
        vcoord = _dot(point, vaxis[None]) * us[1]
    return ucoord, vcoord


def get_color(scene: Whitted5Scene, idx: jnp.ndarray, point: jnp.ndarray):
    """Primitive::GetColor with texture modulation (Sphere::GetColor
    scene.cpp:161-176, PlanePrim::GetColor :263-277).

    Same-shaped textures collapse into ONE per-lane fetch from a
    row-concatenated atlas with per-lane-selected uv — texture gathers
    are the measured whitted5 bottleneck (HBM random-access latency,
    kernels/whitted5_kernel.py), so fetch COUNT is what matters. The
    atlas path is value-IDENTICAL to per-prim fetches (same uv floats,
    same texels, same blend order), so goldens are unaffected."""
    out = scene.color[idx]
    textured = [j for j in range(scene.num_prims) if scene.tex_id[j] >= 0]
    if not textured:
        return out
    shapes = {scene.textures[scene.tex_id[j]].shape for j in textured}
    if len(shapes) == 1 and len(textured) > 1:
        th = next(iter(shapes))[0]
        atlas = jnp.concatenate(list(scene.textures), axis=0)
        sel_u = jnp.zeros(point.shape[0], jnp.float32)
        sel_v = jnp.zeros(point.shape[0], jnp.float32)
        sel_off = jnp.zeros(point.shape[0], jnp.int32)
        for j in textured:
            ucoord, vcoord = _prim_uv(scene, j, point)
            m = idx == j
            sel_u = jnp.where(m, ucoord, sel_u)
            sel_v = jnp.where(m, vcoord, sel_v)
            sel_off = jnp.where(m, scene.tex_id[j] * th, sel_off)
        tex = _texel(atlas, sel_u, sel_v, row_offset=sel_off,
                     wrap_shape=next(iter(shapes)))
        for j in textured:
            out = jnp.where(
                (idx == j)[:, None], tex * scene.color[j][None], out
            )
        return out
    for j in textured:
        bitmap = scene.textures[scene.tex_id[j]]
        ucoord, vcoord = _prim_uv(scene, j, point)
        tex = _texel(bitmap, ucoord, vcoord)
        out = jnp.where((idx == j)[:, None], tex * scene.color[j][None], out)
    return out


def calc_shade(
    scene: Whitted5Scene,
    light: int,
    point: jnp.ndarray,
    state: MWCState,
    draw_mask: jnp.ndarray,
    n_samples: int,
    soft_edges: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, MWCState]:
    """CalcShade (raytracer.cpp:371-406): returns (shade [R], L [R,3],
    new rng state). Point lights: binary visibility of the light sphere.
    Area lights: ``n_samples`` jittered grid samples on the box's bottom
    face, each weighted 1/n_samples.

    ``soft_edges > 0`` replaces each binary visibility with the smooth
    shadow transmittance (_soft_shadow_transmittance) — the relaxation
    that gives area-light/occluder silhouettes usable gradients."""
    eps = jnp.float32(EPSILON5)

    def vis_fn(o, d, maxt):
        if soft_edges > 0.0:
            return _soft_shadow_transmittance(
                scene, o, d, maxt, light, soft_edges
            )
        return jnp.where(_nearest_is(scene, o, d, maxt, light), 1.0, 0.0)

    if scene.ptype[light] == SPHERE5:
        ldir = scene.center[light][None] - point
        tdist = jnp.sqrt(jnp.maximum(_dot(ldir, ldir), 1e-30))
        ldir = ldir / tdist[:, None]
        vis = vis_fn(point + ldir * eps, ldir, tdist)
        return vis, ldir, state
    # Box area light.
    pos = scene.box_pos[light]
    size = scene.box_size[light]
    ldir = (pos + 0.5 * size)[None] - point
    ldir = ldir * (1.0 / jnp.sqrt(jnp.maximum(_dot(ldir, ldir), 1e-30)))[:, None]
    deltax = size[0] * 0.25
    deltay = size[2] * 0.25
    grid = jnp.asarray(BOX_LIGHT_GRID)  # [16, 2] cell units
    shade = jnp.zeros(point.shape[0])
    sscale = jnp.float32(1.0 / n_samples)
    for i in range(n_samples):
        u1, state = counter_next_masked(state, draw_mask)
        u2, state = counter_next_masked(state, draw_mask)
        gx = grid[i & 15, 0] * (size[0] / 4.0) + pos[0] + u1 * deltax
        gz = grid[i & 15, 1] * (size[2] / 4.0) + pos[2] + u2 * deltay
        lp = jnp.stack([gx, jnp.full_like(gx, pos[1]), gz], axis=-1)
        sdir = lp - point
        ldist = jnp.sqrt(jnp.maximum(_dot(sdir, sdir), 1e-30))
        sdir = sdir / ldist[:, None]
        vis = vis_fn(point + sdir * eps, sdir, ldist)
        shade = shade + vis * sscale
    return shade, ldir, state


def _shade_node(
    scene: Whitted5Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    state: MWCState,
    draw_mask: jnp.ndarray,
    area_samples: int,
    soft_edges: float = 0.0,
):
    """One Raytrace node's local work (raytracer.cpp:239-285): nearest
    hit, light-by-light diffuse + Phong-20 specular with CalcShade
    visibility; lights hit directly return their color."""
    idx, code, dist = find_nearest(scene, o, d)
    hit = idx >= 0
    safe = jnp.maximum(idx, 0)
    dist_safe = jnp.where(hit, dist, 1.0)
    point = o + d * dist_safe[:, None]

    is_light_arr = jnp.asarray(np.array(scene.is_light, bool))
    hit_light = hit & is_light_arr[safe]

    color = get_color(scene, safe, point)
    n_hit = get_normal(scene, safe, point)
    m_diff = scene.diff[safe]
    m_spec = scene.spec[safe]

    acc = jnp.zeros_like(o)
    for li in range(scene.num_prims):
        if not scene.is_light[li]:
            continue
        shade, ldir, state = calc_shade(
            scene, li, point, state, draw_mask & hit & ~hit_light,
            area_samples, soft_edges,
        )
        pos_shade = shade > 0.0
        dnl = _dot(ldir, n_hit)
        diff_term = jnp.where(
            pos_shade & (m_diff > 0.0) & (dnl > 0.0),
            dnl * m_diff * shade,
            0.0,
        )
        acc = acc + diff_term[:, None] * color * scene.color[li][None]
        rv = ldir - (2.0 * dnl)[:, None] * n_hit
        dvr = _dot(d, rv)
        spec_term = jnp.where(
            pos_shade & (m_spec > 0.0) & (dvr > 0.0),
            jnp.power(jnp.maximum(dvr, 0.0), jnp.float32(20.0)) * m_spec * shade,
            0.0,
        )
        acc = acc + spec_term[:, None] * scene.color[li][None]

    local = jnp.where(
        hit_light[:, None],
        scene.color[safe],
        jnp.where(hit[:, None], acc, 0.0),
    )
    return idx, code, dist_safe, point, color, n_hit, local, state


# Counter budget reserved per trace pass: successive passes (spp loop,
# adaptive extra rays) start their draw counters this far apart, so no
# (node key, counter) pair ever repeats across passes. Max actual draws
# per node = 2 glossy + lights*2*samples << this.
PASS_DRAW_BUDGET = 1 << 10


def _node_key(key: jnp.ndarray, heap_id: jnp.ndarray) -> jnp.ndarray:
    """Mix a ray-tree heap index into the per-ray RNG key so every node
    of the tree draws an independent stream (SplitMix-style round)."""
    x = key ^ (heap_id * jnp.uint32(0x9E3779B9) + jnp.uint32(0x7F4A7C15))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x21F0AAAD)
    x = x ^ (x >> 15)
    return x


def whitted5_trace(
    scene: Whitted5Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    state: MWCState,
    trace_depth: int = TRACEDEPTH5,
    area_samples_by_level: Tuple[int, ...] = (4, 2, 1, 1),
    soft_edges: float = 0.0,
) -> Tuple[jnp.ndarray, MWCState]:
    """Batched binary reflect/refract tree of depth ``trace_depth``
    (depth starts at 1 as in RenderRay, raytracer.cpp:457-474),
    evaluated LEVELWISE: all 2^(l-1) nodes of level l fold into one
    batched ``_shade_node`` call over a [K*R] ray batch (node-major).

    The reference recurses node-by-node (Engine::Raytrace,
    raytracer.cpp:228-363); unrolling that recursion emits 2^depth-1
    distinct shading graphs, which at depth 4 takes XLA-TPU tens of
    minutes to compile (and trips a compiler crash in the fusion cost
    model). The levelwise form emits ``depth`` graphs on strictly larger
    batches — the right shape for a vector machine, same estimator.

    RNG is the counter generator (core/rng.py counter_next): ``state`` is
    a (key[R], counter[R]) pair; each tree node derives an independent
    stream by mixing its heap index into the key (``_node_key``), and the
    returned state advances the counter by ``PASS_DRAW_BUDGET`` so
    successive passes stay decorrelated. (The reference uses MT19937
    here — twister.cpp — carried bit-exactly in core/mt19937.py for
    capability completeness; the counter generator is what shards and
    vectorizes, so the integrator draws from it.)

    The TPU fast path is kernels/whitted5_kernel.whitted5_trace_pallas —
    the same levelwise tree with each level's node work fused into a
    Pallas kernel, stream-identical draws, texture gathers left in XLA.

    Returns (accumulated color [R, 3], advanced state)."""
    eps = jnp.float32(EPSILON5)
    r = o.shape[0]
    key_in, ctr_in = state
    key_in = key_in.astype(jnp.uint32)
    ctr_in = ctr_in.astype(jnp.uint32)
    acc_total = jnp.zeros_like(o)
    is_light_arr = jnp.asarray(np.array(scene.is_light, bool))

    heap_ids = [0]
    o_b, d_b = o, d
    weight = jnp.ones_like(o)
    beer = jnp.zeros_like(o)
    rindex = jnp.ones(r, jnp.float32)
    valid = jnp.ones(r, bool)

    for level in range(1, trace_depth + 1):
        k = len(heap_ids)
        n_samp = area_samples_by_level[
            min(level, len(area_samples_by_level) - 1)
        ]
        hvec = jnp.repeat(
            jnp.asarray(np.array(heap_ids, np.uint32)), r
        )  # [K*R], node-major
        st = (
            _node_key(jnp.tile(key_in, k), hvec),
            jnp.tile(ctr_in, k),
        )
        idx, code, dist, point, color, n_hit, local, st = _shade_node(
            scene, o_b, d_b, st, valid, n_samp, soft_edges
        )
        hit = idx >= 0
        safe = jnp.maximum(idx, 0)
        # Beer's law completes at this node using our own travel distance
        # (raytracer.cpp:353-356); beer == 0 means no absorption.
        w_eff = weight * jnp.exp(beer * (-dist)[:, None])
        contrib = jnp.where((valid & hit)[:, None], w_eff * local, 0.0)
        acc_total = acc_total + contrib.reshape(k, r, 3).sum(axis=0)
        if level >= trace_depth:
            break

        shaded = valid & hit & ~is_light_arr[safe]

        # Reflection children (perfect or glossy; raytracer.cpp:287-335).
        refl = scene.refl[safe]
        drefl = scene.drefl[safe]
        rdir = d_b - (2.0 * _dot(d_b, n_hit))[:, None] * n_hit
        glossy_ok = shaded & (refl > 0.0) & (drefl > 0.0) & (level < 3)
        # One stochastic disc sample per pass (estimator-equivalent to the
        # reference's in-node average of SAMPLES=4 draws).
        u1, st = counter_next_masked(st, glossy_ok)
        u2, st = counter_next_masked(st, glossy_ok)
        rad = drefl * jnp.sqrt(u1)
        ang = jnp.float32(2.0 * PI) * u2
        xoffs = rad * jnp.cos(ang)
        yoffs = rad * jnp.sin(ang)
        # RN1 = (R.z, R.y, -R.x); RN2 = R x RN1 (raytracer.cpp:296-298)
        rn1 = jnp.stack([rdir[:, 2], rdir[:, 1], -rdir[:, 0]], axis=-1)
        rn2 = jnp.cross(rdir, rn1)
        gdir = rdir + rn1 * xoffs[:, None] + rn2 * (yoffs * drefl)[:, None]
        gdir = gdir * (
            1.0 / jnp.sqrt(jnp.maximum(_dot(gdir, gdir), 1e-30))
        )[:, None]
        child_dir = jnp.where(glossy_ok[:, None], gdir, rdir)
        refl_ok = shaded & (refl > 0.0)
        child_w = w_eff * refl[:, None] * color
        refl_o = jnp.where(refl_ok[:, None], point + child_dir * eps, point)
        refl_w = jnp.where(refl_ok[:, None], child_w, 0.0)

        # Refraction children (raytracer.cpp:337-359).
        refr = scene.refr[safe]
        m_rindex = scene.refr_index[safe]
        m_rindex_safe = jnp.where(m_rindex != 0.0, m_rindex, 1.0)
        n_ratio = rindex / m_rindex_safe
        n2 = n_hit * code.astype(jnp.float32)[:, None]
        cos_i = -_dot(n2, d_b)
        cos_t2 = 1.0 - n_ratio * n_ratio * (1.0 - cos_i * cos_i)
        refr_ok = shaded & (refr > 0.0) & (cos_t2 > 0.0)
        cos_t2_safe = jnp.where(cos_t2 > 0.0, cos_t2, 1.0)
        tdir = n_ratio[:, None] * d_b + (
            n_ratio * cos_i - jnp.sqrt(cos_t2_safe)
        )[:, None] * n2
        # Child's Beer absorbance: parent material color * 0.15, applied
        # with the child's own hit distance when the child completes.
        child_beer = scene.color[safe] * jnp.float32(0.15)
        refr_o = jnp.where(refr_ok[:, None], point + tdir * eps, point)
        refr_d = jnp.where(refr_ok[:, None], tdir, d_b)
        refr_w = jnp.where(refr_ok[:, None], w_eff, 0.0)
        refr_beer = jnp.where(refr_ok[:, None], child_beer, 0.0)
        refr_ri = jnp.where(refr_ok, m_rindex_safe, rindex)

        # Next level: [refl children of all nodes; refr children].
        o_b = jnp.concatenate([refl_o, refr_o])
        d_b = jnp.concatenate([child_dir, refr_d])
        weight = jnp.concatenate([refl_w, refr_w])
        beer = jnp.concatenate([jnp.zeros_like(refl_w), refr_beer])
        rindex = jnp.concatenate([rindex, refr_ri])
        valid = jnp.concatenate([refl_ok, refr_ok])
        heap_ids = [2 * i + 1 for i in heap_ids] + [
            2 * i + 2 for i in heap_ids
        ]

    return acc_total, (key_in, ctr_in + jnp.uint32(PASS_DRAW_BUDGET))


def camera_frame5(
    width: int,
    height: int,
    pos=(0.0, 0.0, 0.0),
    target=(0.0, 0.0, 1.0),
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Look-at camera frame (Engine::InitRender, raytracer.cpp:413-451):
    eye at (0,0,-5), 8x6 screen plane at z=0 in camera space, transformed
    to world space. Returns (origin, p1, dx, dy) as host float32 arrays —
    screen position of pixel (col, row) is ``p1 + col*dx + row*dy``."""
    pos = np.asarray(pos, np.float32)
    target = np.asarray(target, np.float32)
    z = target - pos
    z = z / np.linalg.norm(z)
    up = np.array([0, 1, 0], np.float32)
    x = np.cross(up, z)
    x = x / max(np.linalg.norm(x), 1e-12)
    y = np.cross(x, -z)
    rot = np.stack([x, y, z], axis=0)  # rows
    inv = np.linalg.inv(rot)

    def xf(p):
        return inv @ np.asarray(p, np.float32) + pos

    origin = xf((0, 0, -5))
    p1 = xf((-4, 3, 0))
    p2 = xf((4, 3, 0))
    p4 = xf((-4, -3, 0))
    dx = (p2 - p1) / width
    dy = (p4 - p1) / height
    return (
        origin.astype(np.float32), p1.astype(np.float32),
        dx.astype(np.float32), dy.astype(np.float32),
    )


def camera_rays5(
    width: int,
    height: int,
    pos=(0.0, 0.0, 0.0),
    target=(0.0, 0.0, 1.0),
    sub: Tuple[float, float] = (0.5, 0.5),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-frame primary rays; ``sub`` is the sub-pixel offset in pixel
    units (0.5, 0.5 = pixel centers; the reference's scanline renderer
    samples at (0, 0) — the raw ``lpos``, raytracer.cpp:493-503).
    Row 0 = top of image."""
    origin, p1, dx, dy = camera_frame5(width, height, pos, target)
    cols = np.arange(width, dtype=np.float32) + np.float32(sub[0])
    rows = np.arange(height, dtype=np.float32) + np.float32(sub[1])
    screen = (
        p1[None, None]
        + cols[None, :, None] * dx[None, None]
        + rows[:, None, None] * dy[None, None]
    ).reshape(-1, 3)
    dirs = screen - origin
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(origin, dirs.shape)
    return jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("spp", "trace_depth", "height", "width", "soft_edges"),
)
def _whitted5_frame(
    scene: Whitted5Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    state: MWCState,
    spp: int,
    trace_depth: int,
    height: int,
    width: int,
    soft_edges: float = 0.0,
) -> jnp.ndarray:
    # lax.scan over passes: O(1) memory in spp (a python loop lets XLA
    # overlap every pass's temporaries — 800x600 spp8 OOMs the chip) and
    # one traced pass regardless of spp.
    def body(carry, _):
        st, acc = carry
        col, st = whitted5_trace(scene, o, d, st, trace_depth,
                                 soft_edges=soft_edges)
        return (st, acc + col), None

    init = (state, jnp.zeros((o.shape[0], 3)))
    (_, acc), _ = jax.lax.scan(body, init, None, length=spp)
    return (acc / spp).reshape(height, width, 3)


@functools.lru_cache(maxsize=32)
def _cached_rays5(width: int, height: int, sub=(0.5, 0.5)):
    """Device-resident primary-ray buffers, cached per (w, h, sub).

    camera_rays5 is deterministic host numpy; without the cache every
    frame re-uploads ~11 MB of (o, d) through the tunnel (~0.2 s at
    800x600 — 4x the trace itself on the MXU-texel path). Persistent
    device buffers are the production shape (the reference similarly
    keeps its OpenCL buffers resident across frames, smallptGPU.cpp
    AllocateBuffers/ReInit)."""
    return camera_rays5(width, height, sub=sub)


@functools.lru_cache(maxsize=32)
def _cached_state5(n: int, seed: int) -> MWCState:
    """Device-resident RNG-state twin of _init_state5_np (same bits)."""
    return _init_state5_np(n, seed)


def _init_state5_np(n: int, seed: int) -> MWCState:
    """Host-side (numpy) twin of core.rng.init_counter_state — bitwise
    identical uint32s, computed OUTSIDE the jitted frame: fusing the
    iota+integer-hash state init with the trace graph crashes the TPU
    compiler's fusion cost model (same failure mode 875c7d5 fixed for the
    3.2.0x whitted camgen), so the init never enters the frame graph."""
    with np.errstate(over="ignore"):
        pid = np.arange(n, dtype=np.uint32)
        seed_word = np.uint32((seed * 0x85EBCA6B + 0x165667B1) & 0xFFFFFFFF)
        key = pid * np.uint32(0x9E3779B1) ^ seed_word
        key = key ^ (key >> np.uint32(16))
        key = key * np.uint32(0x7FEB352D)
        key = key ^ (key >> np.uint32(15))
    return jnp.asarray(key), jnp.zeros((n,), jnp.uint32)


def render_whitted5(
    scene: Whitted5Scene,
    width: int = 320,
    height: int = 240,
    spp: int = 1,
    trace_depth: int = TRACEDEPTH5,
    seed: int = 0,
    soft_edges: float = 0.0,
) -> jnp.ndarray:
    """Full-frame render; returns [H, W, 3] float32 linear radiance,
    averaged over ``spp`` stochastic passes (area-light jitter + glossy).

    Camera rays and RNG state are produced host-side once per
    (resolution, seed) and stay device-resident (``_cached_rays5``);
    only the trace itself is one jitted dispatch."""
    o, d = _cached_rays5(width, height)
    state = _cached_state5(o.shape[0], seed)
    return _whitted5_frame(
        scene, o, d, state, spp=spp, trace_depth=trace_depth,
        height=height, width=width, soft_edges=soft_edges,
    )


# Extra sub-pixel offsets fired on a primitive-change edge, in pixel
# units relative to the primary sample (Engine::Render,
# raytracer.cpp:500-503: lpos - 0.5 dx, lpos - 0.5 dy, lpos - both).
ADAPTIVE_OFFSETS = ((-0.5, 0.0), (0.0, -0.5), (-0.5, -0.5))


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "trace_depth", "use_pallas",
                     "interpret"),
)
def _whitted5_frame_4ray(
    scene, state, width, height, trace_depth,
    use_pallas=False, interpret=False, texel_tabs=None,
):
    subs = ((0.0, 0.0),) + tuple(
        (fx, fy) for fx, fy in ADAPTIVE_OFFSETS
    )
    if use_pallas:
        from se195_raytracer_tpu.kernels.whitted5_kernel import (
            whitted5_trace_pallas,
        )

        trace_fn = functools.partial(
            whitted5_trace_pallas, interpret=interpret,
            texel_tabs=texel_tabs,
        )
    else:
        trace_fn = whitted5_trace
    acc = None
    st = state
    for fx, fy in subs:
        o, d = camera_rays5(width, height, sub=(fx, fy))
        col, st = trace_fn(scene, o, d, st, trace_depth)
        acc = col if acc is None else acc + col
    return (acc * 0.25).reshape(height, width, 3)


def render_whitted5_4ray(
    scene: Whitted5Scene,
    width: int = 320,
    height: int = 240,
    trace_depth: int = TRACEDEPTH5,
    seed: int = 0,
    use_pallas: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """FULL 4-ray supersampling — the comparator the adaptive renderer
    exists to beat (Engine::Render fires these same 4 sub-pixel rays at
    EVERY pixel when neighbors disagree, raytracer.cpp:500-512; this
    renders as if they always disagreed). Same sub-pixel offsets and
    0.25 blend as the adaptive path, so adaptive output differs from
    this only at non-edge pixels (where adaptive kept 1 ray)."""
    texel_tabs = None
    if use_pallas:
        from se195_raytracer_tpu.kernels.texel_kernel import (
            prepare_texel_tables,
        )

        texel_tabs = prepare_texel_tables(scene)
    state = _cached_state5(width * height, seed)
    return _whitted5_frame_4ray(
        scene, state, width, height, trace_depth,
        use_pallas=use_pallas, interpret=interpret, texel_tabs=texel_tabs,
    )


@functools.partial(jax.jit, static_argnames=("trace_depth",))
def _adaptive_primary_jit(scene, o, d, state, trace_depth):
    col, state = whitted5_trace(scene, o, d, state, trace_depth)
    idx, _, _ = find_nearest(scene, o, d)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), idx[:-1]])
    edge = idx != prev
    return col, edge, state


def _adaptive_primary(scene, width, height, trace_depth, seed):
    """Phase 1: one primary ray per pixel at the reference's raw ``lpos``
    + the scan-order primitive-change edge mask (prim != lastprim,
    raytracer.cpp:499; lastprim carries across scanline ends and starts
    as NULL, which equals our miss code -1). Rays + RNG init host-side
    (see _init_state5_np)."""
    o, d = _cached_rays5(width, height, sub=(0.0, 0.0))
    state = _cached_state5(o.shape[0], seed)
    return _adaptive_primary_jit(scene, o, d, state, trace_depth)


def _adaptive_extra(
    scene, col0, edge, sel, colrow, live_mask, state_sel,
    width, height, trace_depth, padded, use_pallas=False, interpret=False,
    texel_tabs=None,
):
    """Phase 2: trace the 3 extra sub-pixel rays ONLY for the compacted
    edge-pixel index set ``sel`` (padded to the static size ``padded``;
    ``live_mask`` marks the real rows — the pad tail is inert), then
    blend: edge pixels average the 4 samples, interior pixels keep the
    single primary sample (the 64-vs-256 scale of raytracer.cpp:506-520,
    pre-tonemap).

    ``sel``, ``colrow`` (= [padded, 2] float (col, row) of each sel
    pixel), ``live_mask`` AND the gathered RNG state ``state_sel`` are
    built HOST-side by the caller: the iota/div/mod index math and the
    per-sel gather fused into the trace graph are what crash the TPU
    compiler (same failure mode as the camgen split, r3). This wrapper
    is deliberately a PLAIN Python composition — jitting it would inline
    both inner jits into one compiled module and the dispatch split
    would be inert (r3's committed SIGILL rows); as two separate jits
    the trace graph stays free of scatter ops and the scatter blend
    compiles as its own small module."""
    extra = _adaptive_trace_extra(
        scene, colrow, state_sel, width, height, trace_depth, padded,
        use_pallas, interpret, texel_tabs,
    )
    return _adaptive_blend(col0, edge, sel, live_mask, extra)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "trace_depth", "padded",
                     "use_pallas", "interpret"),
)
def _adaptive_trace_extra(
    scene, colrow, state_sel, width, height, trace_depth, padded,
    use_pallas=False, interpret=False, texel_tabs=None,
):
    if use_pallas:
        import functools as _ft

        from se195_raytracer_tpu.kernels.whitted5_kernel import (
            whitted5_trace_pallas,
        )

        trace_fn = _ft.partial(whitted5_trace_pallas, interpret=interpret,
                               texel_tabs=texel_tabs)
    else:
        trace_fn = whitted5_trace
    origin, p1, dx, dy = camera_frame5(width, height)
    colx = colrow[:, 0]
    rowy = colrow[:, 1]
    st = state_sel
    extra = jnp.zeros((padded, 3), jnp.float32)
    o = jnp.broadcast_to(jnp.asarray(origin), (padded, 3))
    for fx, fy in ADAPTIVE_OFFSETS:
        screen = (
            jnp.asarray(p1)
            + (colx + fx)[:, None] * jnp.asarray(dx)
            + (rowy + fy)[:, None] * jnp.asarray(dy)
        )
        dirs = screen - o
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        c, st = trace_fn(scene, o, dirs, st, trace_depth)
        extra = extra + c
    return extra


@jax.jit
def _adaptive_blend(col0, edge, sel, live_mask, extra):
    summed = col0.at[sel].add(jnp.where(live_mask[:, None], extra, 0.0))
    return jnp.where(edge[:, None], summed * 0.25, col0)


@functools.partial(jax.jit, static_argnames=("padded", "width"))
def _adaptive_select_device(edge, state, padded, width):
    """Device-side compaction of the edge-pixel set (r5 — replaces the
    host nonzero round-trip): fixed-size jnp.nonzero keeps every shape
    static, so the primary pass, selection, extra-ray pass and blend
    chain on-device with no host sync. Edges beyond ``padded`` (never
    seen in practice — the measured edge rate is ~0.3-0.7% vs the 4%
    default bucket) gracefully keep their 1-ray color."""
    (sel,) = jnp.nonzero(edge, size=padded, fill_value=0)
    n_edge = jnp.sum(edge)
    live = jnp.arange(padded) < n_edge
    sel = sel.astype(jnp.int32)
    colrow = jnp.stack(
        [(sel % width).astype(jnp.float32),
         (sel // width).astype(jnp.float32)], axis=-1
    )
    state_sel = jax.tree.map(lambda a: a[sel], state)
    # used: edge pixels actually granted extra rays (guards overflow).
    used = jnp.zeros(edge.shape, bool).at[sel].set(live)
    return sel, colrow, live, state_sel, used, n_edge


@jax.jit
def _adaptive_blend_device(col0, used, sel, live_mask, extra):
    summed = col0.at[sel].add(jnp.where(live_mask[:, None], extra, 0.0))
    return jnp.where(used[:, None], summed * 0.25, col0)


def render_whitted5_adaptive(
    scene: Whitted5Scene,
    width: int = 320,
    height: int = 240,
    trace_depth: int = TRACEDEPTH5,
    seed: int = 0,
    min_bucket: int = 4096,
    use_pallas: bool = False,
    interpret: bool = False,
    compaction: str = "device",
):
    """Adaptive 1-vs-4-ray supersampling (Engine::Render,
    raytracer.cpp:481-535), TPU-style.

    The reference walks pixels serially and fires 3 extra rays whenever
    the primary hit's primitive differs from the previous pixel's. A
    serial walk is the wrong shape for a vector machine, but the *work
    split* maps cleanly to two fixed-shape phases: a full-frame primary
    pass computes colors + the scan-order edge mask on device, the edge
    pixels are compacted on host (the only host round-trip), and a second
    jitted pass traces 3 rays per edge pixel at a power-of-two padded
    size (>= min_bucket) so recompiles stay O(log max_edges).

    ``use_pallas`` routes both trace phases through the fused level
    kernels (kernels/whitted5_kernel.py) — stream-identical RNG, so the
    edge mask and blend semantics are unchanged.

    ``compaction``: 'device' (default) compacts the edge set on-device
    with a fixed-size jnp.nonzero — the whole pipeline chains with no
    host round-trip (the r4-measured fixed overhead); the bucket is
    max(min_bucket, ~4% of pixels) and overflow pixels (far beyond the
    measured 0.3-0.7% edge rate) gracefully keep their 1-ray sample.
    'host' reproduces the r4 exact-bucket host path.

    Returns ([H, W, 3] float32 image, edge fraction in [0, 1]).
    """
    texel_tabs = None
    if use_pallas:
        from se195_raytracer_tpu.kernels.texel_kernel import (
            prepare_texel_tables,
        )

        texel_tabs = prepare_texel_tables(scene)
        col0, edge, state = _adaptive_primary_pallas(
            scene, width, height, trace_depth, seed, interpret, texel_tabs
        )
    else:
        col0, edge, state = _adaptive_primary(
            scene, width, height, trace_depth, seed
        )

    if compaction == "device":
        r = width * height
        # ~1.7% of pixels, pow2: the measured room5 edge rate is
        # 0.3-0.7%, so the bucket has >2x headroom while keeping the
        # extra-ray pass small (overflow degrades gracefully, see above).
        padded = max(min_bucket, 1 << (max(r // 64, 1) - 1).bit_length())
        sel, colrow, live, state_sel, used, n_edge = (
            _adaptive_select_device(edge, state, padded, width)
        )
        extra = _adaptive_trace_extra(
            scene, colrow, state_sel, width, height, trace_depth, padded,
            use_pallas, interpret, texel_tabs,
        )
        img = _adaptive_blend_device(col0, used, sel, live, extra)
        return (img.reshape(height, width, 3),
                float(n_edge) / (width * height))

    edge_np = np.asarray(edge)
    sel_np = np.nonzero(edge_np)[0]
    n_edge = int(sel_np.size)
    if n_edge == 0:
        return col0.reshape(height, width, 3), 0.0
    padded = max(min_bucket, 1 << (n_edge - 1).bit_length())
    sel_pad = np.concatenate([sel_np, np.zeros(padded - n_edge, np.int64)])
    sel = jnp.asarray(sel_pad, jnp.int32)
    colrow = jnp.asarray(
        np.stack([sel_pad % width, sel_pad // width], axis=-1), jnp.float32
    )
    live_mask = jnp.asarray(np.arange(padded) < n_edge)
    # Host-side gather of the per-sel RNG state (see _adaptive_extra).
    state_sel = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a)[sel_pad]), state
    )
    img = _adaptive_extra(
        scene, col0, edge, sel, colrow, live_mask, state_sel,
        width, height, trace_depth, padded, use_pallas=use_pallas,
        interpret=interpret, texel_tabs=texel_tabs,
    )
    return img.reshape(height, width, 3), n_edge / edge_np.size


@functools.partial(jax.jit, static_argnames=("trace_depth", "interpret"))
def _adaptive_primary_pallas_jit(scene, o, d, state, trace_depth,
                                 interpret=False, texel_tabs=None):
    from se195_raytracer_tpu.kernels.whitted5_kernel import (
        whitted5_trace_pallas,
    )

    col, st, idx = whitted5_trace_pallas(
        scene, o, d, state, trace_depth, return_primary_idx=True,
        interpret=interpret, texel_tabs=texel_tabs,
    )
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), idx[:-1]])
    return col, idx != prev, st


def _adaptive_primary_pallas(scene, width, height, trace_depth, seed,
                             interpret=False, texel_tabs=None):
    """Phase 1 on the fused level kernels: the trace already computes the
    level-1 nearest-hit ids, so the edge mask costs no extra sweep."""
    o, d = _cached_rays5(width, height, sub=(0.0, 0.0))
    state = _cached_state5(o.shape[0], seed)
    return _adaptive_primary_pallas_jit(scene, o, d, state, trace_depth,
                                        interpret, texel_tabs)
