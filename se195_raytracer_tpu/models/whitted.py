"""Whitted reflect/refract tracer, tree form.

TPU-native re-expression of the reference's Whitted family:

* The OpenCL ray-*queue* kernel (Raytracer3.2.03/raytracer_kernel.cl:
  raytracer_kernel:246-383 with PUSH_RAY/POP_RAY :34-44, raytrace
  :163-242, plane/sphere intersect :89-137, Beer transparency :370) and
* the de-recursified ray-*tree* engine (raytracer3.0.06.no_rec.samp/
  raytracer.cpp Engine_Render:301-530 — a 63-node binary tree, children of
  node i at 2i+1 reflection / 2i+2 refraction).

Since every queue entry's contribution is summed into the accumulator
independently, queue order is irrelevant and the bounded binary tree is
the canonical scan-friendly shape (SURVEY.md §3.4): we run one
``lax.scan`` over the 2^(depth+1)-1 heap-ordered nodes; each step traces
that node's ray batch, accumulates its weighted contribution, and writes
its two children. Divergence (plane/sphere, hit/inprim, lit/shadowed)
is masked lane arithmetic.

Semantics flags:
* ``hit_bias`` — the 3.2.03 kernel biases sphere near-hits by +0.005
  (raytracer_kernel.cl:128: ``i1 < cumu_dist + 0.005f``); the 3.2.02
  kernel and the scalar CPU port (raytracer_non_OpenCL.c:139) do not.
  Default 0.0 (CPU/3.2.02 semantics); set 0.005 for 3.2.03-kernel parity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from se195_raytracer_tpu.scenes.whitted_scenes import PLANE, SPHERE, WhittedScene

# raytracer_kernel.cl:26-30
HIT = 1
MISS = 0
INPRIM = -1
W_EPSILON = 0.001  # Whitted-family epsilon (raytracer_kernel.cl:30)

# Ray node types (raytracer_kernel.cl:50-54)
ORIGIN = 0
REFLECTED = 1
REFRACTED = 2

# The reference's fixed viewpoint (raytracer_kernel.cl:267-281): camera
# at (0, 0.25, -7), world-anchored screen window on the z=0 plane.
DEFAULT_CAM_ORIG = (0.0, 0.25, -7.0)


def whitted_camera_row(orig=None, target=None) -> np.ndarray:
    """Affine camera for the Whitted family as a [12] float32 row
    [O(3), X(3), Y(3), C(3)]: a primary ray through window point
    (sx, sy) is  origin O, direction normalize(X*sx + Y*sy + C).

    Default (no args) reproduces the reference's fixed viewpoint exactly:
    O=(0,0.25,-7), X=e_x, Y=e_y, C=(0,-0.25,7) — i.e. dir =
    (sx-0, sy-0.25, 7), the world-anchored z=0 screen of
    raytracer_kernel.cl:267-281. With ``orig``/``target`` a look-at
    basis is built (up = +y), the screen plane held at the reference's
    distance 7 in front of the eye with the same window extents."""
    f32 = np.float32
    if orig is None and target is None:
        o = np.array(DEFAULT_CAM_ORIG, f32)
        x = np.array([1, 0, 0], f32)
        y = np.array([0, 1, 0], f32)
        c = np.array([0.0, -0.25, 7.0], f32)
        return np.concatenate([o, x, y, c]).astype(f32)
    o = np.asarray(
        DEFAULT_CAM_ORIG if orig is None else orig, f32
    )
    t = np.asarray((0.0, 0.25, 0.0) if target is None else target, f32)
    z = t - o
    z = z / max(np.linalg.norm(z), 1e-12)
    up = np.array([0, 1, 0], f32)
    x = np.cross(up, z)
    nx = np.linalg.norm(x)
    if nx < 1e-6:  # looking straight up/down: fall back to world x
        x = np.array([1, 0, 0], f32)
    else:
        x = x / nx
    y = np.cross(z, x)
    return np.concatenate([o, x, y, 7.0 * z]).astype(f32)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _prim_tests(scene: WhittedScene, o: jnp.ndarray, d: jnp.ndarray):
    """Vectorized per-primitive intersection candidates.

    Returns (plane_dist, plane_valid, i1, i2, sphere_valid), each [R, N]:
    plane test per raytracer_kernel.cl:89-102, sphere quadratic per
    :104-137 (the INPRIM/near-root selection happens in the sequential
    nearest-hit fold, where the reference's order-dependent bias lives).
    """
    # Planes: dist = -(n.o + depth) / (n.d), valid if n.d != 0 and dist > 0.
    # precision=HIGHEST: XLA-TPU otherwise feeds the MXU in bf16, and the
    # rounding (~2^-8 relative) eats the shadow-ray epsilon offset —
    # every wall self-shadows. Geometry contractions must be f32.
    hi = jax.lax.Precision.HIGHEST
    denom = jnp.einsum("nk,rk->rn", scene.normal, d, precision=hi)
    num = -(
        jnp.einsum("nk,rk->rn", scene.normal, o, precision=hi)
        + scene.depth[None, :]
    )
    denom_safe = jnp.where(denom != 0.0, denom, 1.0)
    pdist = num / denom_safe
    pvalid = (denom != 0.0) & (pdist > 0.0)

    # Spheres: v = o - c; b = -v.d; det = b^2 - v.v + r^2.
    v = o[:, None, :] - scene.center[None, :, :]
    b = -jnp.sum(v * d[:, None, :], axis=-1)
    det = b * b - jnp.sum(v * v, axis=-1) + scene.sq_radius[None, :]
    svalid = det > 0.0
    # Safe value 1.0 on miss lanes: sqrt'(0)=inf NaN-poisons backward.
    sq = jnp.sqrt(jnp.where(svalid, det, 1.0))
    i1 = b - sq
    i2 = b + sq
    svalid = svalid & (i2 > 0.0)
    return pdist, pvalid, i1, i2, svalid


def whitted_nearest(
    scene: WhittedScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    hit_bias: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sequential nearest-hit fold over primitives (raytrace:163-177).

    The reference's loop is order-dependent: each primitive that improves
    ``cumu_dist`` (with the sphere ``+bias`` slack) takes the hit, so with
    bias > 0 a *later* primitive can steal the hit with a slightly larger
    distance. We reproduce this with a fori fold over the primitive axis.

    Returns (prim_idx [R] int32 — -1 if miss, result [R] int32 HIT/INPRIM,
    dist [R]).
    """
    r = o.shape[0]
    n = scene.num_prims
    pdist, pvalid, i1, i2, svalid = _prim_tests(scene, o, d)
    type_arr = jnp.asarray(np.array(scene.ptype, np.int32))
    bias = jnp.float32(hit_bias)

    def body(j, carry):
        cumu, idx, res = carry
        is_plane = type_arr[j] == PLANE
        upd_plane = is_plane & pvalid[:, j] & (pdist[:, j] < cumu)
        inprim = svalid[:, j] & (i1[:, j] < 0.0) & (i2[:, j] < cumu)
        hit_near = svalid[:, j] & (i1[:, j] >= 0.0) & (i1[:, j] < cumu + bias)
        upd_sphere = (~is_plane) & (inprim | hit_near)
        upd = upd_plane | upd_sphere
        new_dist = jnp.where(
            is_plane, pdist[:, j], jnp.where(i1[:, j] < 0.0, i2[:, j], i1[:, j])
        )
        cumu = jnp.where(upd, new_dist, cumu)
        idx = jnp.where(upd, j, idx)
        res = jnp.where(upd, jnp.where(upd_sphere & inprim, INPRIM, HIT), res)
        return cumu, idx, res

    cumu0 = jnp.full((r,), jnp.finfo(jnp.float32).max)
    idx0 = jnp.full((r,), -1, jnp.int32)
    res0 = jnp.full((r,), MISS, jnp.int32)
    cumu, idx, res = jax.lax.fori_loop(0, n, body, (cumu0, idx0, res0))
    return idx, res, cumu


def whitted_occluded(
    scene: WhittedScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    max_t: jnp.ndarray,
    hit_bias: float = 0.0,
) -> jnp.ndarray:
    """Shadow predicate (raytrace:199-212): any non-light primitive hit
    closer than max_t (the reference breaks on the first hit, and max_t is
    only mutated after the break, so an any() is exact)."""
    pdist, pvalid, i1, i2, svalid = _prim_tests(scene, o, d)
    non_light = jnp.asarray(np.array([not l for l in scene.is_light], bool))
    type_arr = jnp.asarray(np.array(scene.ptype, np.int32))
    bias = jnp.float32(hit_bias)
    mt = max_t[:, None]
    plane_hit = (type_arr[None, :] == PLANE) & pvalid & (pdist < mt)
    sphere_hit = (
        (type_arr[None, :] == SPHERE)
        & svalid
        & jnp.where(i1 < 0.0, i2 < mt, i1 < mt + bias)
    )
    return jnp.any(non_light[None, :] & (plane_hit | sphere_hit), axis=-1)


def _get_normal(scene: WhittedScene, prim_idx: jnp.ndarray, point: jnp.ndarray):
    """get_normal (raytracer_kernel.cl:151-161), gathered per lane."""
    type_arr = jnp.asarray(np.array(scene.ptype, np.int32))
    is_plane = (type_arr[prim_idx] == PLANE)[:, None]
    n_plane = scene.normal[prim_idx]
    n_sphere = (point - scene.center[prim_idx]) * scene.r_radius[prim_idx][:, None]
    return jnp.where(is_plane, n_plane, n_sphere)


def whitted_shade(
    scene: WhittedScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    hit_bias: float = 0.0,
):
    """raytrace (raytracer_kernel.cl:163-242): nearest hit + local shading.

    Returns (prim_idx, result, dist, point, color [R,3]).
    Lights return their material color directly; other hits accumulate
    N.L diffuse and Phong^20 specular per light with hard point-shadows
    cast toward each sphere light's center.
    """
    prim_idx, result, dist = whitted_nearest(scene, o, d, hit_bias)
    hit = prim_idx >= 0
    safe_idx = jnp.maximum(prim_idx, 0)
    dist_safe = jnp.where(hit, dist, 1.0)
    point = o + d * dist_safe[:, None]

    is_light_arr = jnp.asarray(np.array(scene.is_light, bool))
    hit_is_light = hit & is_light_arr[safe_idx]

    acc = jnp.zeros_like(o)
    n_hit = _get_normal(scene, safe_idx, point)
    m_diff = scene.diff[safe_idx]
    m_spec = scene.spec[safe_idx]
    m_color = scene.color[safe_idx]

    for li in range(scene.num_prims):
        if not scene.is_light[li]:
            continue
        l_vec = scene.center[li][None, :] - point
        l_len = jnp.sqrt(jnp.maximum(_dot(l_vec, l_vec), 1e-30))
        l_dir = l_vec / l_len[:, None]
        if scene.ptype[li] == SPHERE:
            sh_o = point + l_dir * jnp.float32(W_EPSILON)
            occluded = whitted_occluded(scene, sh_o, l_dir, l_len, hit_bias)
            shade = jnp.where(occluded, 0.0, 1.0)
        else:
            shade = jnp.ones_like(l_len)
        # Diffuse: dot(N, L) > 0 (raytracer_kernel.cl:215-223)
        dnl = _dot(n_hit, l_dir)
        diff_term = jnp.where(
            (m_diff > 0.0) & (dnl > 0.0),
            dnl * m_diff * shade,
            0.0,
        )
        acc = acc + diff_term[:, None] * m_color * scene.color[li][None, :]
        # Specular: R = L - 2 dot(L, N) N; powr(dot(V, R), 20) (:225-236)
        r_vec = l_dir - (2.0 * dnl)[:, None] * n_hit
        dvr = _dot(d, r_vec)
        spec_term = jnp.where(
            (m_spec > 0.0) & (dvr > 0.0),
            jnp.power(jnp.maximum(dvr, 0.0), jnp.float32(20.0)) * m_spec * shade,
            0.0,
        )
        acc = acc + spec_term[:, None] * scene.color[li][None, :]

    color = jnp.where(
        hit_is_light[:, None],
        m_color,
        jnp.where(hit[:, None], acc, 0.0),
    )
    return prim_idx, result, dist_safe, point, color


def whitted_trace(
    scene: WhittedScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    trace_depth: int = 5,
    hit_bias: float = 0.0,
) -> jnp.ndarray:
    """Trace a batch of primary rays through the bounded reflect/refract
    tree; returns accumulated color [R, 3] (pre tone-scale).

    Implemented as an UNROLLED binary recursion over the 2^(depth+1)-1
    tree positions (the 3.0.06 formulation, raytracer.cpp:398-472) —
    pure dataflow with no dynamic array updates, which both XLA and the
    TPU backend compile far better than an in-place node-array scan.
    Contribution rules per ray type follow raytracer_kernel.cl:317-328:
    a node's color is weighted by its scalar weight (product of refl
    factors), its accumulated Beer transparency, and — for reflection
    rays only — its *immediate* parent's material color (ancestor tints
    do not accumulate in the reference).
    """
    r = o.shape[0]
    eps = jnp.float32(W_EPSILON)
    acc_total = jnp.zeros((r, 3), jnp.float32)

    def node(level, o, d, weight, rtype, parent_col, r_index, transp, valid):
        nonlocal acc_total
        prim_idx, result, dist, point, ray_col = whitted_shade(
            scene, o, d, hit_bias
        )
        hit = prim_idx >= 0
        safe_idx = jnp.maximum(prim_idx, 0)

        if rtype == ORIGIN:
            factor = jnp.ones((r, 3), jnp.float32)
        elif rtype == REFLECTED:
            factor = parent_col * transp
        else:
            factor = transp
        acc_total = acc_total + jnp.where(
            valid[:, None], ray_col * weight[:, None] * factor, 0.0
        )

        if level >= trace_depth:
            return

        n_hit = _get_normal(scene, safe_idx, point)
        my_col = scene.color[safe_idx]
        # Reflection child (raytracer_kernel.cl:332-348).
        refl_f = scene.refl[safe_idx]
        rdir = d - (2.0 * _dot(d, n_hit))[:, None] * n_hit
        ro = point + rdir * eps
        refl_ok = valid & hit & (refl_f > 0.0)
        node(
            level + 1, ro, rdir, refl_f * weight, REFLECTED, my_col,
            r_index, transp, refl_ok,
        )
        # Refraction child (raytracer_kernel.cl:350-372).
        refr_f = scene.refr[safe_idx]
        m_rindex = scene.refr_index[safe_idx]
        m_rindex_safe = jnp.where(m_rindex != 0.0, m_rindex, 1.0)
        n_ratio = r_index / m_rindex_safe
        n2 = n_hit * result.astype(jnp.float32)[:, None]
        cos_i = -_dot(n2, d)
        cos_t2 = 1.0 - n_ratio * n_ratio * (1.0 - cos_i * cos_i)
        cos_t2_safe = jnp.where(cos_t2 > 0.0, cos_t2, 1.0)
        tdir = n_ratio[:, None] * d + (
            n_ratio * cos_i - jnp.sqrt(cos_t2_safe)
        )[:, None] * n2
        to = point + tdir * eps
        # Beer's law with the PARENT ray's travel distance
        # (raytracer_kernel.cl:370).
        t_child = transp * jnp.exp(
            scene.color[safe_idx] * jnp.float32(0.15) * (-dist)[:, None]
        )
        refr_ok = valid & hit & (refr_f > 0.0) & (cos_t2 > 0.0)
        node(
            level + 1, to, tdir, weight, REFRACTED, my_col,
            m_rindex_safe, t_child, refr_ok,
        )

    node(
        0,
        o,
        d,
        jnp.ones((r,), jnp.float32),
        ORIGIN,
        jnp.ones((r, 3), jnp.float32),
        jnp.ones((r,), jnp.float32),
        jnp.ones((r, 3), jnp.float32),
        jnp.ones((r,), bool),
    )
    return acc_total


def whitted_camera_rays(
    width: int, height: int, supersample: int = 3
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Primary rays for the fixed Whitted camera (raytracer_kernel.cl:
    267-305): window x in [-3, 3], y in [2.25, -2.25] (top row first),
    camera at (0, 0.25, -7), screen plane z = 0, 3x3 subpixel offsets
    tx, ty in {-1, 0, 1} scaled by half a pixel.

    Returns (origins [R, 3], dirs [R, 3]) with R = H*W*supersample^2,
    ordered pixel-major then subsample (tx outer, ty inner — matching the
    kernel's loop nesting :291-292).

    All arithmetic is strict float32 in the exact op order of the Pallas
    in-kernel generator (kernels/whitted_kernel.py ``primary_rays``) so
    the two ray sets are bit-identical.
    """
    f32 = np.float32
    dxs = f32(6.0 / width)
    dys = f32(-4.5 / height)
    half = supersample // 2
    xs = np.arange(width, dtype=f32)
    ys = np.arange(height, dtype=f32)
    offs = (np.arange(supersample, dtype=np.int32) - half).astype(f32)
    shape = (height, width, supersample, supersample)
    # Pixel grid [H, W] then subsample [S, S] (tx outer, ty inner).
    x = np.broadcast_to(xs[None, :, None, None], shape)
    y = np.broadcast_to(ys[:, None, None, None], shape)
    tx = np.broadcast_to(offs[None, None, :, None], shape)
    ty = np.broadcast_to(offs[None, None, None, :], shape)
    sx = (f32(-3.0) + x * dxs) + tx * (dxs / f32(2.0))
    sy = (f32(2.25) + y * dys) + ty * (dys / f32(2.0))
    rdx = sx - f32(0.0)
    rdy = sy - f32(0.25)
    rdz = np.full(shape, 7.0, f32)
    inv = f32(1.0) / np.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
    dirs = np.stack([rdx * inv, rdy * inv, rdz * inv], axis=-1).reshape(-1, 3)
    camera = np.array([0.0, 0.25, -7.0], f32)
    origins = np.broadcast_to(camera, dirs.shape)
    return jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "supersample")
)
def whitted_camera_rays_device(
    width: int,
    height: int,
    supersample: int = 3,
    cam_row: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side twin of ``whitted_camera_rays`` (same f32 formula, jnp
    ops): primary rays are a formula of the ray index, so generating them
    on device replaces a [R, 6]-float host upload per frame.

    ``cam_row`` is the [12] affine camera of ``whitted_camera_row``
    (O, X, Y, C); None = the reference's fixed viewpoint, bit-identical
    to the historical formula."""
    ss2 = supersample * supersample
    r = width * height * ss2
    f32 = jnp.float32
    if cam_row is None:
        cam_row = jnp.asarray(whitted_camera_row())
    cam_row = cam_row.astype(f32)
    dxs = np.float32(6.0 / width)
    dys = np.float32(-4.5 / height)
    half = supersample // 2
    lin = jnp.arange(r, dtype=jnp.int32)
    pix = lin // ss2
    sub = lin - pix * ss2
    txi = sub // supersample
    tyi = sub - txi * supersample
    x = pix % width
    y = pix // width
    sx = (f32(-3.0) + x.astype(f32) * dxs) + (txi - half).astype(f32) * f32(
        dxs / np.float32(2.0)
    )
    sy = (f32(2.25) + y.astype(f32) * dys) + (tyi - half).astype(f32) * f32(
        dys / np.float32(2.0)
    )
    rdx = cam_row[3] * sx + cam_row[6] * sy + cam_row[9]
    rdy = cam_row[4] * sx + cam_row[7] * sy + cam_row[10]
    rdz = cam_row[5] * sx + cam_row[8] * sy + cam_row[11]
    inv = f32(1.0) / jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
    d = jnp.stack([rdx * inv, rdy * inv, rdz * inv], axis=-1)
    o = jnp.broadcast_to(cam_row[0:3], (r, 3))
    return o, d


_whitted_trace_jit = jax.jit(
    whitted_trace, static_argnames=("trace_depth", "hit_bias")
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "supersample", "trace_depth", "hit_bias",
        "ray_tile",
    ),
)
def _whitted_frame_xla(
    scene: WhittedScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    *,
    width: int,
    height: int,
    supersample: int,
    trace_depth: int,
    hit_bias: float,
    ray_tile: int,
) -> jnp.ndarray:
    """Full-frame XLA render: a ``lax.map`` over fixed-size ray chunks
    (bounds the unrolled tree's working set without paying a host
    round-trip per chunk), subsample reduce, tone scale.

    Camera rays come in as *inputs* (generated on device by the separately
    jitted ``whitted_camera_rays_device`` — two dispatches, zero host
    traffic). Fusing the camera-gen iota/div/mod formula into the same
    compilation as the unrolled trace tree reproducibly crashes the TPU
    compiler (tpu_compile_helper SIGILL) at small frame shapes, e.g.
    80x60/ss2/depth4; the split is the workaround and costs nothing
    measurable at real frame sizes."""
    n = width * height * supersample * supersample
    pad = (-n) % ray_tile
    if pad:
        # Inert padding rays (d = 0 hits nothing); lanes discarded below.
        o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
        d = jnp.concatenate([d, jnp.zeros((pad, 3), jnp.float32)])
    chunks = (n + pad) // ray_tile
    acc = jax.lax.map(
        lambda od: whitted_trace(scene, od[0], od[1], trace_depth, hit_bias),
        (o.reshape(chunks, ray_tile, 3), d.reshape(chunks, ray_tile, 3)),
    )
    acc = acc.reshape(-1, 3)[:n]
    ss2 = supersample * supersample
    acc = acc.reshape(height, width, ss2, 3).sum(axis=2)
    return jnp.clip(acc * jnp.float32(256.0 / ss2), 0.0, 255.0)


def render_whitted_scene(
    scene: WhittedScene,
    width: int = 800,
    height: int = 600,
    supersample: int = 3,
    trace_depth: int = 5,
    hit_bias: float = 0.0,
    ray_tile: int | None = None,
    cam_row: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full-frame Whitted render -> float32 [H, W, 3] in 0..255 scale
    (acc * 256 / supersample^2, clamped — raytracer_kernel.cl:378-382).

    The frame is TWO device dispatches: camera rays are generated on
    device by the jitted ``whitted_camera_rays_device`` (a formula of the
    ray index beats shipping [R, 6] floats from the host every frame),
    then ``_whitted_frame_xla`` runs the chunked trace + reduce. The
    split (rather than one fused dispatch) works around a TPU-compiler
    SIGILL — see ``_whitted_frame_xla``'s docstring.
    """
    n = width * height * supersample * supersample
    if ray_tile is None:
        # The unrolled tree holds ~2^(depth+1)*[tile, N] temporaries;
        # 256k rays keeps that comfortably inside HBM while leaving the
        # VPU enough width per chunk.
        ray_tile = min(n, 256 * 1024)
    ray_tile = min(ray_tile, n)
    o, d = whitted_camera_rays_device(width, height, supersample, cam_row)
    return _whitted_frame_xla(
        scene, o, d, width=width, height=height, supersample=supersample,
        trace_depth=trace_depth, hit_bias=float(hit_bias),
        ray_tile=ray_tile,
    )


def render_whitted(spec_or_scene, config) -> jnp.ndarray:
    """CLI adapter: render a WhittedScene (or named builder) with a
    RenderConfig-ish object; returns [H, W, 3] float in 0..255."""
    from se195_raytracer_tpu.scenes.whitted_scenes import WHITTED_SCENES

    scene = spec_or_scene
    if isinstance(spec_or_scene, str):
        if spec_or_scene not in WHITTED_SCENES:
            raise KeyError(
                f"unknown whitted scene {spec_or_scene!r}; "
                f"known: {sorted(WHITTED_SCENES)}"
            )
        scene = WHITTED_SCENES[spec_or_scene]()
    if not isinstance(scene, WhittedScene):
        raise TypeError(
            f"render_whitted needs a WhittedScene or a name, got "
            f"{type(scene).__name__}"
        )
    supersample = getattr(config, "supersample", 3)
    trace_depth = getattr(config, "trace_depth", 5)
    hit_bias = getattr(config, "hit_bias", 0.0)
    if getattr(config, "use_pallas", False):
        from se195_raytracer_tpu.kernels.whitted_kernel import (
            render_whitted_pallas,
        )

        return render_whitted_pallas(
            scene, width=config.width, height=config.height,
            supersample=supersample, trace_depth=trace_depth,
            hit_bias=hit_bias,
        )
    return render_whitted_scene(
        scene,
        width=config.width,
        height=config.height,
        supersample=supersample,
        trace_depth=trace_depth,
        hit_bias=hit_bias,
        ray_tile=config.ray_tile,
    )
