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
from se195_raytracer_tpu.ops.intersect import intersect_any, intersect_nearest
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
        length = jnp.sqrt(_dot(sdir, sdir))
        len_safe = jnp.maximum(length, jnp.float32(1e-20))
        sdir = sdir / len_safe[:, None]
        wo = _dot(sdir, usp)
        wrong_half = wo > 0.0  # sample on the far half of the light sphere
        wi = _dot(sdir, nl)
        occluded = intersect_any(
            scene, hit_point, sdir, length - jnp.float32(EPSILON)
        )
        s = (
            jnp.float32(4.0 * jnp.pi)
            * scene.radius[li]
            * scene.radius[li]
            * wi
            * (-wo)
            / (len_safe * len_safe)
        )
        ok = (~wrong_half) & (wi > 0.0) & (~occluded) & draw_mask
        contrib = jnp.where(ok[:, None], s[:, None] * scene.emission[li][None, :], 0.0)
        ld = ld + contrib
    return ld, state


class BounceCarry(NamedTuple):
    o: jnp.ndarray  # [R, 3] ray origin
    d: jnp.ndarray  # [R, 3] ray direction
    rad: jnp.ndarray  # [R, 3] accumulated radiance
    thr: jnp.ndarray  # [R, 3] path throughput
    alive: jnp.ndarray  # [R] bool
    spec_bounce: jnp.ndarray  # [R] bool — specular-bounce emission gate
    s0: jnp.ndarray  # [R] uint32
    s1: jnp.ndarray  # [R] uint32


def _bounce_body(scene: Scene, direct_only: bool, rng: str, carry: BounceCarry, _) -> Tuple[BounceCarry, None]:
    """One iteration of the bounce loop (geomfunc.h:182-336), all lanes."""
    o, d, rad, thr, alive, spec_b, s0, s1 = carry
    state: MWCState = (s0, s1)

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
    ld, state = sample_lights(scene, state, hp, nl, is_diff, rng)
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
) -> Tuple[jnp.ndarray, MWCState]:
    """Estimate radiance for a batch of rays.

    ``max_depth`` counts bounce-body iterations; the reference runs the body
    for depth = 0..6 (7 iterations — geomfunc.h:182-187), so the default is 7.

    ``remat=True`` wraps each bounce in ``jax.checkpoint`` — per-bounce
    gradient rematerialization so backward memory is O(1) in depth
    (the blockwise/remat analogue of SURVEY.md §5).
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
    body = functools.partial(_bounce_body, scene, direct_only, rng)
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
