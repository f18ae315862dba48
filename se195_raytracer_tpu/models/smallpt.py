"""Smallpt-family integrators: path tracing and direct lighting.

TPU-native re-expression of the reference's integrator layer
(smallptgpu-v1.6/geomfunc.h: RadiancePathTracing:167-338,
RadianceDirectLighting:340-483, SampleLights:112-165) and the camera-ray
generator (rendering_kernel.cl GenerateCameraRay:29-51).

Design (SURVEY.md §7): the reference's per-work-item tail-iterative bounce
loop becomes a ``lax.scan`` over a fixed bounce budget carrying
``(ray, radiance, throughput, alive, specular_bounce, rng_state)`` for a
whole ray batch. SIMT branch divergence (DIFF/SPEC/REFR, alive/dead)
becomes masked full-width computation with ``jnp.where`` selects — free
lane-masking on TPU vectors. The reference's *variable* RNG consumption
(draws depend on material and light count) is reproduced exactly via
masked seed advancement (core/rng.py: mwc_next_masked), so per-pixel RNG
streams are bit-identical to the C code.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from se195_raytracer_tpu.core.rng import MWCState, mwc_next_masked, next_masked
from se195_raytracer_tpu.core.types import (
    DIFF,
    SPEC,
    EPSILON,
    CameraBasis,
    Scene,
)
from se195_raytracer_tpu.ops.intersect import (
    intersect_any,
    intersect_nearest,
    intersect_nearest_excluding,
)
from se195_raytracer_tpu.ops.sampling import cosine_sample_dir, uniform_sample_sphere


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def _ref_sign(x: jnp.ndarray) -> jnp.ndarray:
    """vec.h:59 ``sign(x) = x > 0 ? 1 : -1`` (note: sign(0) == -1)."""
    return jnp.where(x > 0.0, jnp.float32(1.0), jnp.float32(-1.0))


def _is_emissive(e: jnp.ndarray) -> jnp.ndarray:
    """Negation of the reference ``viszero`` macro (vec.h:44), bug included:
    y is never tested (x is tested twice). [R, 3] -> [R] bool."""
    return (e[..., 0] != 0.0) | (e[..., 2] != 0.0)


def generate_camera_rays(
    basis: CameraBasis,
    state: MWCState,
    width: int,
    height: int,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    rng: str = "mwc",
) -> Tuple[jnp.ndarray, jnp.ndarray, MWCState]:
    """Jittered primary rays — rendering_kernel.cl:29-51 GenerateCameraRay.

    Consumes exactly 2 RNG draws per pixel. ``xs``/``ys`` are the
    reference's pixel coordinates (y counts up from the image bottom).
    """
    draw = next_masked(rng)
    all_on = jnp.ones(xs.shape, bool)
    r1, state = draw(state, all_on)
    r2, state = draw(state, all_on)
    inv_w = jnp.float32(1.0 / width)
    inv_h = jnp.float32(1.0 / height)
    kcx = (xs.astype(jnp.float32) + (r1 - 0.5)) * inv_w - 0.5
    kcy = (ys.astype(jnp.float32) + (r2 - 0.5)) * inv_h - 0.5
    rdir = (
        basis.x[None, :] * kcx[:, None]
        + basis.y[None, :] * kcy[:, None]
        + basis.dir[None, :]
    )
    rorig = jnp.float32(0.1) * rdir + basis.orig[None, :]
    rdir = rdir * (1.0 / jnp.sqrt(jnp.sum(rdir * rdir, axis=-1, keepdims=True)))
    return rorig, rdir, state


def sample_lights(
    scene: Scene,
    state: MWCState,
    hit_point: jnp.ndarray,
    nl: jnp.ndarray,
    draw_mask: jnp.ndarray,
    rng: str = "mwc",
    soft_w: float = 0.0,
    origin_hid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, MWCState]:
    """Next-event estimation over all emissive spheres — geomfunc.h:112-165.

    The reference loops spheres in ascending index order and draws two RNG
    values per light *unconditionally* (draws happen before the ``wo > 0``
    rejection). ``scene.light_indices`` is static and ascending, so looping
    it here consumes the stream identically. ``draw_mask`` gates seed
    advancement to lanes that reached this code path (DIFF hits).

    Returns (Ld [R, 3], new_state).
    """
    draw = next_masked(rng)
    r = hit_point.shape[0]
    ld = jnp.zeros((r, 3), jnp.float32)
    for li in scene.light_indices:
        # The reference calls UniformSampleSphere(GetRandom(), GetRandom())
        # in ONE expression (geomfunc.h:138); C argument evaluation order is
        # unspecified and gcc/MSVC evaluate right-to-left, so u1 receives
        # the SECOND draw and u2 the FIRST. Verified against the compiled
        # reference (tests/test_reference_parity.py).
        draw_a, state = draw(state, draw_mask)
        draw_b, state = draw(state, draw_mask)
        usp = uniform_sample_sphere(draw_b, draw_a)  # [R, 3]
        sphere_point = scene.radius[li] * usp + scene.center[li][None, :]
        sdir = sphere_point - hit_point
        if soft_w > 0.0:
            # sqrt at an exact 0 (hit point coinciding with the sampled
            # light point — one-in-1e5 f32 coincidence at full frame
            # size) has a 0/0 JVP; the max-guard zeroes the tangent at
            # the clamp instead of NaN-poisoning the pixel. Soft mode
            # only: the hard path must stay bit-identical to the
            # reference oracle (which computes sqrt(0) = 0).
            length = jnp.sqrt(jnp.maximum(_dot(sdir, sdir), 1e-24))
        else:
            length = jnp.sqrt(_dot(sdir, sdir))
        # Soft mode floors at 1e-10, not 1e-20: TPU flushes subnormals
        # to zero, so (1e-20)^2 -> 0 and the 1/len^2 geometry factor
        # becomes inf with NaN tangents on the (masked-out) degenerate
        # lanes; 1e-10 squares to a normal float. Hard mode keeps the
        # reference-parity value.
        len_safe = jnp.maximum(
            length, jnp.float32(1e-10 if soft_w > 0.0 else 1e-20)
        )
        sdir = sdir / len_safe[:, None]
        wo = _dot(sdir, usp)
        wrong_half = wo > 0.0  # sample on the far half of the light sphere
        wi = _dot(sdir, nl)
        s = (
            jnp.float32(4.0 * jnp.pi)
            * scene.radius[li]
            * scene.radius[li]
            * wi
            * (-wo)
            / (len_safe * len_safe)
        )
        if soft_w > 0.0:
            # Relaxed visibility: smooth transmittance instead of the
            # binary IntersectP (see the relaxation block comment).
            trans = _soft_transmittance(
                scene, hit_point, sdir, length - jnp.float32(EPSILON),
                origin_hid, li, soft_w,
            )
            ok = (~wrong_half) & (wi > 0.0) & draw_mask
            contrib = jnp.where(
                ok[:, None],
                (s * trans)[:, None] * scene.emission[li][None, :],
                0.0,
            )
        else:
            occluded = intersect_any(
                scene, hit_point, sdir, length - jnp.float32(EPSILON)
            )
            ok = (~wrong_half) & (wi > 0.0) & (~occluded) & draw_mask
            contrib = jnp.where(
                ok[:, None], s[:, None] * scene.emission[li][None, :], 0.0
            )
        ld = ld + contrib
    return ld, state


# ---------------------------------------------------------------------------
# Differentiable-visibility relaxation (RenderConfig.soft_edges > 0) —
# SURVEY.md §7 hard part 2's stretch goal. The hard estimator's gradient
# failures are step functions of scene parameters (grad_probe evidence,
# r4): (a) the nearest-hit WINNER flipping between a light and the
# geometry at its silhouette/occlusion boundary, and (b) shadow-ray
# occlusion races where an occluder's entry distance crosses the EPSILON
# threshold as the sampled light point moves. The relaxation replaces
# exactly those two indicator functions with sigmoids of signed margins
# of width ``w`` (world units), in BOTH forward and backward, so finite
# differences of the relaxed forward agree with autodiff everywhere:
#
# * Emissive spheres are removed from the geometric nearest-hit and
#   handled analytically: each light contributes ``g * |dp| * thr * e``
#   where g = sigma(silhouette margin/w) * sigma((t_excl - t_light)/w)
#   * sigma((t_light - eps)/w) — smooth in the light's center/radius —
#   and the path CONTINUES through the light onto the non-light winner
#   with throughput scaled by (1 - g) (the light becomes semi-
#   transparent over a ~w-wide silhouette band). As w -> 0 this recovers
#   the hard semantics: g -> {0, 1} and the continuation vanishes.
# * Shadow visibility becomes a transmittance: T = prod_j (1 - occ_j)
#   with occ_j = sigma(margin_j/w) * soft-OR of the two root-in-range
#   windows, EXCLUDING the sphere the shadow ray originates on (the
#   convex self-occlusion eps-race the hard EPSILON offset exists to
#   suppress) and the target light itself.
#
# The relaxed estimator is intentionally biased near silhouettes (a
# ~w-wide smooth band); it is a config flag, not the default.
# ---------------------------------------------------------------------------


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _smax0(x, w):
    """Smooth max(x, 0) with curvature scale w^2: equals w^2 at x = 0,
    -> x for x >> w^2, -> 0 for x << -w^2; derivative in (0, 1),
    smooth everywhere."""
    w2 = jnp.float32(w * w)
    return 0.5 * (x + jnp.sqrt(x * x + 4.0 * w2 * w2))


def _soft_light_weight(scene, li: int, o, d, t_excl, soft_w: float):
    """(g [R], |dp| [R]) for light ``li``: the smooth hit weight and the
    absolute normal cosine at the (phantom) hit point."""
    w = jnp.float32(soft_w)
    eps = jnp.float32(EPSILON)
    c = scene.center[li][None, :]
    r = scene.radius[li]
    op = c - o
    b = _dot(op, d)
    # Perpendicular miss distance computed stably (1e4-radius walls:
    # |op|^2 - b^2 cancels catastrophically; the rejection doesn't).
    perp = op - b[:, None] * d
    pd = jnp.sqrt(jnp.maximum(_dot(perp, perp), 1e-12))
    m_sil = r - pd  # >0: ray line passes inside the silhouette
    det = m_sil * (r + pd)  # r^2 - pd^2, factored for f32 stability
    # sqrt(smax0(det) + w^2), NOT sqrt(max(det, tiny)):
    # d(sqrt(det))/d(params) diverges like 1/sqrt(det) at the
    # silhouette, which would shrink the ordering sigmoid's width in
    # PARAMETER space below any FD eps (the relaxation must be smooth at
    # a fixed world-space scale w). smax0 is a smooth max(det, 0) with
    # curvature scale w^2 (a hard max would put a derivative kink right
    # at the silhouette, where the sigmoid weight is 0.5); derivative is
    # bounded by ~1/(2w), and the ~w bias in t near grazing sits inside
    # the band the relaxation already blurs. det can be hugely negative
    # (1e10-scale for the wall spheres) — smax0 handles it finitely.
    sq = jnp.sqrt(_smax0(det, w) + w * w)
    t1 = b - sq
    t2 = b + sq
    t_l = jnp.where(t1 > eps, t1, t2)
    g = (
        _sigmoid(m_sil / w)
        * _sigmoid((t_excl - t_l) / w)
        * _sigmoid((t_l - eps) / w)
    )
    q = o + t_l[:, None] * d
    n = q - c
    n = n * (1.0 / jnp.sqrt(jnp.maximum(_dot(n, n), 1e-12)))[:, None]
    return g, jnp.abs(_dot(n, d))


def _soft_transmittance(scene, o, d, max_t, origin_hid, target_li: int,
                        soft_w: float):
    """[R] smooth shadow transmittance in [0, 1] (1 = unoccluded).

    Per sphere j: occ_j = sigma(margin_j/w) * softOR(entry-in-range,
    exit-in-range); the product excludes the per-lane originating sphere
    (``origin_hid``) and the static target light ``target_li``."""
    w = jnp.float32(soft_w)
    eps = jnp.float32(EPSILON)
    op = scene.center[None, :, :] - o[:, None, :]  # [R, N, 3]
    b = jnp.sum(op * d[:, None, :], axis=-1)  # [R, N]
    perp = op - b[..., None] * d[:, None, :]
    pd = jnp.sqrt(jnp.maximum(jnp.sum(perp * perp, axis=-1), 1e-12))
    m_sil = scene.radius[None, :] - pd
    det = m_sil * (scene.radius[None, :] + pd)
    # Smooth, derivative-bounded root (see _soft_light_weight).
    sq = jnp.sqrt(_smax0(det, w) + w * w)
    t1 = b - sq
    t2 = b + sq
    mt = max_t[:, None]

    def in_range(t):
        return _sigmoid((t - eps) / w) * _sigmoid((mt - t) / w)

    f1 = in_range(t1)
    f2 = in_range(t2)
    f_t = f1 + f2 - f1 * f2
    occ = _sigmoid(m_sil / w) * f_t
    n = occ.shape[-1]
    cols = jnp.arange(n)[None, :]
    occ = jnp.where(cols == origin_hid[:, None], 0.0, occ)
    occ = jnp.where(cols == target_li, 0.0, occ)
    return jnp.prod(1.0 - occ, axis=-1)


class BounceCarry(NamedTuple):
    o: jnp.ndarray  # [R, 3] ray origin
    d: jnp.ndarray  # [R, 3] ray direction
    rad: jnp.ndarray  # [R, 3] accumulated radiance
    thr: jnp.ndarray  # [R, 3] path throughput
    alive: jnp.ndarray  # [R] bool
    spec_bounce: jnp.ndarray  # [R] bool — specular-bounce emission gate
    s0: jnp.ndarray  # [R] uint32
    s1: jnp.ndarray  # [R] uint32


def _bounce_body(scene: Scene, direct_only: bool, rng: str, soft_edges: float, carry: BounceCarry, _) -> Tuple[BounceCarry, None]:
    """One iteration of the bounce loop (geomfunc.h:182-336), all lanes.

    ``soft_edges > 0`` switches to the differentiable-visibility
    relaxation (see the block comment above): lights leave the geometric
    nearest-hit and contribute analytically with smooth weights, and
    the path continues through them with (1-g)-damped throughput."""
    o, d, rad, thr, alive, spec_b, s0, s1 = carry
    state: MWCState = (s0, s1)

    soft = soft_edges > 0.0
    if soft:
        t, hid, hit = intersect_nearest_excluding(
            scene, o, d, scene.light_indices
        )
        # Analytic soft light terms: emission gated on the specular-
        # bounce flag exactly like the hard path (geomfunc.h:216-227);
        # absorption at the light (1-g) applies regardless of the gate —
        # the hard path terminates at a light whether or not it adds
        # emission.
        for li in scene.light_indices:
            g, adp = _soft_light_weight(scene, li, o, d, t, soft_edges)
            rad = rad + jnp.where(
                (alive & spec_b)[:, None],
                (g * adp)[:, None] * thr * scene.emission[li][None, :],
                0.0,
            )
            thr = thr * jnp.where(alive[:, None], (1.0 - g)[:, None], 1.0)
    else:
        t, hid, hit = intersect_nearest(scene, o, d)
    act = alive & hit  # lanes doing shading work this bounce

    t_safe = jnp.where(hit, t, jnp.float32(1.0))
    hp = o + t_safe[:, None] * d
    center = scene.center[hid]
    n = hp - center
    n = n * (1.0 / jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-38)))
    dp = _dot(n, d)
    nl = (-_ref_sign(dp))[:, None] * n  # oriented normal (geomfunc.h:211-214)

    e = scene.emission[hid]
    c = scene.color[hid]
    emissive = _is_emissive(e)

    # Emission: only if the previous bounce was specular (geomfunc.h:216-227).
    hit_light = act & emissive
    rad = rad + jnp.where(
        (hit_light & spec_b)[:, None],
        jnp.abs(dp)[:, None] * thr * e,
        0.0,
    )

    live = act & ~emissive
    mat = scene.refl[hid]
    is_diff = live & (mat == DIFF)
    is_spec = live & (mat == SPEC)
    is_refr = live & ~(mat == DIFF) & ~(mat == SPEC)  # geomfunc.h else-branch

    draw = next_masked(rng)
    # ---------------- DIFF (geomfunc.h:229-269) ----------------
    thr_c = thr * c  # throughput already multiplied before NEE (:231)
    ld, state = sample_lights(
        scene, state, hp, nl, is_diff, rng,
        soft_w=soft_edges, origin_hid=hid,
    )
    rad = rad + jnp.where(is_diff[:, None], thr_c * ld, 0.0)
    if direct_only:
        # RadianceDirectLighting:402-414 — diffuse path terminates after NEE.
        nd_diff = d
    else:
        r1u, state = draw(state, is_diff)
        r2u, state = draw(state, is_diff)
        nd_diff = cosine_sample_dir(nl, r1u, r2u)

    # ---------------- SPEC (geomfunc.h:270-280) ----------------
    refl_dir = d - (2.0 * dp)[:, None] * n

    # ---------------- REFR (geomfunc.h:281-336) ----------------
    into = _dot(n, nl) > 0.0
    nnt = jnp.where(into, jnp.float32(1.0 / 1.5), jnp.float32(1.5))
    ddn = _dot(d, nl)
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    tir = cos2t < 0.0
    # sqrt of a where-guarded positive (not max(.,0)): keeps backward finite
    # on TIR lanes (sqrt'(0) = inf would NaN-poison geometry gradients).
    cos2t_safe = jnp.where(tir, 1.0, cos2t)
    kk = jnp.where(into, 1.0, -1.0) * (ddn * nnt + jnp.sqrt(cos2t_safe))
    tdir = nnt[:, None] * d - kk[:, None] * n
    tdir = tdir * (1.0 / jnp.sqrt(
        jnp.maximum(jnp.sum(tdir * tdir, axis=-1, keepdims=True), 1e-38)
    ))
    # R0 = ((nt-nc)/(nt+nc))^2 with nc=1, nt=1.5 (geomfunc.h:312-314)
    r0 = jnp.float32(0.25 / 6.25)
    c1 = 1.0 - jnp.where(into, -ddn, _dot(tdir, n))
    re = r0 + (1.0 - r0) * c1 * c1 * c1 * c1 * c1
    tr = 1.0 - re
    p = 0.25 + 0.5 * re
    rp = re / p
    tp = tr / (1.0 - p)
    u_rr, state = draw(state, is_refr & ~tir)
    pick_refl = u_rr < p

    refr_refl = is_refr & (tir | pick_refl)  # follow reflection ray
    refr_trans = is_refr & ~tir & ~pick_refl  # follow transmission ray

    # ---------------- combine ----------------
    w_diff = is_diff[:, None]
    w_spec = is_spec[:, None]
    thr_new = jnp.where(
        w_diff | w_spec | (is_refr & tir)[:, None],
        thr_c,
        jnp.where(
            (is_refr & ~tir & pick_refl)[:, None],
            rp[:, None] * thr * c,
            jnp.where(refr_trans[:, None], tp[:, None] * thr * c, thr),
        ),
    )
    d_new = jnp.where(
        w_diff,
        nd_diff,
        jnp.where(
            w_spec | refr_refl[:, None],
            refl_dir,
            jnp.where(refr_trans[:, None], tdir, d),
        ),
    )
    o_new = jnp.where(live[:, None], hp, o)
    spec_new = jnp.where(is_diff, False, jnp.where(is_spec | is_refr, True, spec_b))
    if direct_only:
        alive_new = live & ~is_diff
    else:
        alive_new = live
    # Dead lanes keep their previous ray so downstream compute stays finite.
    d_new = jnp.where(live[:, None], d_new, d)
    thr_new = jnp.where(live[:, None], thr_new, thr)

    s0n, s1n = state
    return BounceCarry(o_new, d_new, rad, thr_new, alive_new, spec_new, s0n, s1n), None


def radiance(
    scene: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    state: MWCState,
    max_depth: int = 7,
    direct_only: bool = False,
    remat: bool = False,
    rng: str = "mwc",
    soft_edges: float = 0.0,
) -> Tuple[jnp.ndarray, MWCState]:
    """Estimate radiance for a batch of rays.

    ``max_depth`` counts bounce-body iterations; the reference runs the body
    for depth = 0..6 (7 iterations — geomfunc.h:182-187), so the default is 7.

    ``remat=True`` wraps each bounce in ``jax.checkpoint`` — per-bounce
    gradient rematerialization so backward memory is O(1) in depth
    (the blockwise/remat analogue of SURVEY.md §5).

    ``soft_edges > 0`` enables the differentiable-visibility relaxation
    (see the block comment above BounceCarry): smooth silhouette/shadow
    gradients, intentionally biased within a ~soft_edges-wide band.
    """
    r = origin.shape[0]
    carry = BounceCarry(
        o=origin,
        d=direction,
        rad=jnp.zeros((r, 3), jnp.float32),
        thr=jnp.ones((r, 3), jnp.float32),
        alive=jnp.ones((r,), bool),
        spec_bounce=jnp.ones((r,), bool),
        s0=state[0],
        s1=state[1],
    )
    body = functools.partial(
        _bounce_body, scene, direct_only, rng, float(soft_edges)
    )
    if remat:
        body = jax.checkpoint(body)
    carry, _ = jax.lax.scan(body, carry, None, length=max_depth)
    return carry.rad, (carry.s0, carry.s1)


def radiance_path_tracing(scene, origin, direction, state, max_depth=7, remat=False, rng="mwc"):
    """RadiancePathTracing (geomfunc.h:167-338), batched."""
    return radiance(scene, origin, direction, state, max_depth, False, remat, rng)


def radiance_direct_lighting(scene, origin, direction, state, max_depth=7, remat=False, rng="mwc"):
    """RadianceDirectLighting (geomfunc.h:340-483), batched."""
    return radiance(scene, origin, direction, state, max_depth, True, remat, rng)
