"""Scalar float32 CPU oracle for the smallpt integrators.

The reference's correctness strategy is a CPU twin of the GPU kernel
compiled from the same source (smallptCPU.cpp vs smallptGPU.cpp via the
GPU_KERNEL ifdef seam — SURVEY.md §4.1). This module is our equivalent: an
independent, deliberately scalar, per-pixel NumPy implementation of
RadiancePathTracing / RadianceDirectLighting (geomfunc.h:167-483) against
which the vectorized JAX/TPU path must agree.

Everything is computed in np.float32 so the arithmetic matches C float
semantics (numpy >= 2.0 keeps float32 under NEP 50 weak-scalar rules).
The RNG is the exact two-stream MWC of simplernd.h:34-48, consumed with the
reference's data-dependent draw pattern (this is what the vectorized
integrator replicates with masked seed advancement).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

F = np.float32
EPSILON = F(0.01)
FOUR_PI = F(4.0) * F(np.pi)


@dataclasses.dataclass
class OracleScene:
    center: np.ndarray  # [N,3] f32
    radius: np.ndarray  # [N] f32
    emission: np.ndarray  # [N,3] f32
    color: np.ndarray  # [N,3] f32
    refl: np.ndarray  # [N] int

    @classmethod
    def from_scene(cls, scene) -> "OracleScene":
        return cls(
            center=np.asarray(scene.center, np.float32),
            radius=np.asarray(scene.radius, np.float32),
            emission=np.asarray(scene.emission, np.float32),
            color=np.asarray(scene.color, np.float32),
            refl=np.asarray(scene.refl, np.int32),
        )


def get_random(seeds: np.ndarray) -> F:
    """simplernd.h:34-48, scalar. ``seeds`` is a uint32[2] mutated in place."""
    s0 = np.uint32(
        (np.uint64(36969) * np.uint64(seeds[0] & np.uint32(0xFFFF)) + np.uint64(seeds[0] >> np.uint32(16))) & np.uint64(0xFFFFFFFF)
    )
    s1 = np.uint32(
        (np.uint64(18000) * np.uint64(seeds[1] & np.uint32(0xFFFF)) + np.uint64(seeds[1] >> np.uint32(16))) & np.uint64(0xFFFFFFFF)
    )
    seeds[0] = s0
    seeds[1] = s1
    ires = np.uint32((np.uint64(s0) << np.uint64(16)) + np.uint64(s1) & np.uint64(0xFFFFFFFF))
    bits = np.uint32((ires & np.uint32(0x007FFFFF)) | np.uint32(0x40000000))
    f = bits.view(np.float32)
    return F((f - F(2.0)) * F(0.5))


def _norm(v: np.ndarray) -> np.ndarray:
    return v * (F(1.0) / np.sqrt(F(v.dot(v))))


def sphere_hit(center, radius, o, d) -> F:
    """SphereIntersect (geomfunc.h:32-59)."""
    op = center - o
    b = F(op.dot(d))
    det = F(b * b - op.dot(op) + radius * radius)
    if det < F(0.0):
        return F(0.0)
    det = np.sqrt(det)
    t = F(b - det)
    if t > EPSILON:
        return t
    t = F(b + det)
    if t > EPSILON:
        return t
    return F(0.0)


def intersect(sc: OracleScene, o, d) -> Tuple[bool, F, int]:
    """Intersect (geomfunc.h:71-92): reverse loop, strict < update."""
    t = F(1e20)
    hit_id = 0
    for i in range(sc.center.shape[0] - 1, -1, -1):
        dist = sphere_hit(sc.center[i], sc.radius[i], o, d)
        if dist != F(0.0) and dist < t:
            t = dist
            hit_id = i
    return t < F(1e20), t, hit_id


def intersect_p(sc: OracleScene, o, d, maxt: F) -> bool:
    """IntersectP (geomfunc.h:94-110)."""
    for i in range(sc.center.shape[0] - 1, -1, -1):
        dist = sphere_hit(sc.center[i], sc.radius[i], o, d)
        if dist != F(0.0) and dist < maxt:
            return True
    return False


def _viszero(v: np.ndarray) -> bool:
    """vec.h:44 — the y component is never tested (reference bug)."""
    return bool(v[0] == F(0.0) and v[0] == F(0.0) and v[2] == F(0.0))


def uniform_sample_sphere(u1: F, u2: F) -> np.ndarray:
    zz = F(F(1.0) - F(2.0) * u1)
    r = np.sqrt(np.maximum(F(0.0), F(F(1.0) - zz * zz)))
    phi = F(F(2.0) * F(np.pi) * u2)
    return np.array([r * np.cos(phi), r * np.sin(phi), zz], np.float32)


def sample_lights(sc: OracleScene, seeds, hit_point, nl) -> np.ndarray:
    """SampleLights (geomfunc.h:112-165)."""
    result = np.zeros(3, np.float32)
    for i in range(sc.center.shape[0]):
        if _viszero(sc.emission[i]):
            continue
        # gcc/MSVC evaluate UniformSampleSphere's two GetRandom() args
        # right-to-left (geomfunc.h:138): first draw -> u2, second -> u1.
        draw_a = get_random(seeds)
        draw_b = get_random(seeds)
        usp = uniform_sample_sphere(draw_b, draw_a)
        sphere_point = sc.radius[i] * usp + sc.center[i]
        sdir = sphere_point - hit_point
        length = F(np.sqrt(F(sdir.dot(sdir))))
        sdir = sdir * (F(1.0) / length)
        wo = F(sdir.dot(usp))
        if wo > F(0.0):
            continue
        wo = F(-wo)
        wi = F(sdir.dot(nl))
        if wi > F(0.0) and not intersect_p(sc, hit_point, sdir, F(length - EPSILON)):
            s = F(FOUR_PI * sc.radius[i] * sc.radius[i] * wi * wo / (length * length))
            result = result + s * sc.emission[i]
    return result


def radiance(
    sc: OracleScene, o, d, seeds, direct_only: bool = False, max_depth: int = 7
) -> np.ndarray:
    """RadiancePathTracing / RadianceDirectLighting (geomfunc.h:167-483)."""
    o = np.array(o, np.float32)
    d = np.array(d, np.float32)
    rad = np.zeros(3, np.float32)
    throughput = np.ones(3, np.float32)
    specular_bounce = True
    for _depth in range(max_depth):
        hit, t, hid = intersect(sc, o, d)
        if not hit:
            return rad
        hp = o + t * d
        n = _norm(hp - sc.center[hid])
        dp = F(n.dot(d))
        # vec.h:59 sign(0) == -1, so invSignDP == +1 when dp == 0.
        inv_sign = F(-1.0) if dp > F(0.0) else F(1.0)
        nl = inv_sign * n
        e = sc.emission[hid]
        if not _viszero(e):
            if specular_bounce:
                rad = rad + np.abs(dp) * throughput * e
            return rad
        refl = int(sc.refl[hid])
        if refl == 0:  # DIFF
            specular_bounce = False
            throughput = throughput * sc.color[hid]
            ld = sample_lights(sc, seeds, hp, nl)
            rad = rad + throughput * ld
            if direct_only:
                return rad
            r1 = F(F(2.0) * F(np.pi) * get_random(seeds))
            r2 = get_random(seeds)
            r2s = np.sqrt(r2)
            w = nl
            a = (
                np.array([0.0, 1.0, 0.0], np.float32)
                if np.abs(w[0]) > F(0.1)
                else np.array([1.0, 0.0, 0.0], np.float32)
            )
            u = _norm(np.cross(a, w))
            v = np.cross(w, u)
            new_dir = (
                u * F(np.cos(r1) * r2s)
                + v * F(np.sin(r1) * r2s)
                + w * np.sqrt(F(1.0) - r2)
            ).astype(np.float32)
            o = hp
            d = new_dir
        elif refl == 1:  # SPEC
            specular_bounce = True
            new_dir = d - F(2.0) * F(n.dot(d)) * n
            throughput = throughput * sc.color[hid]
            o = hp
            d = new_dir.astype(np.float32)
        else:  # REFR
            specular_bounce = True
            refl_dir = (d - F(2.0) * F(n.dot(d)) * n).astype(np.float32)
            into = F(n.dot(nl)) > F(0.0)
            nc, nt = F(1.0), F(1.5)
            nnt = F(nc / nt) if into else F(nt / nc)
            ddn = F(d.dot(nl))
            cos2t = F(F(1.0) - nnt * nnt * (F(1.0) - ddn * ddn))
            if cos2t < F(0.0):  # total internal reflection
                throughput = throughput * sc.color[hid]
                o = hp
                d = refl_dir
                continue
            kk = (F(1.0) if into else F(-1.0)) * F(ddn * nnt + np.sqrt(cos2t))
            tdir = _norm((nnt * d - kk * n).astype(np.float32))
            a = F(nt - nc)
            b = F(nt + nc)
            r0 = F(a * a / (b * b))
            c1 = F(F(1.0) - (F(-ddn) if into else F(tdir.dot(n))))
            re = F(r0 + (F(1.0) - r0) * c1 * c1 * c1 * c1 * c1)
            tr = F(F(1.0) - re)
            p = F(F(0.25) + F(0.5) * re)
            rp = F(re / p)
            tp = F(tr / (F(1.0) - p))
            if get_random(seeds) < p:
                throughput = (rp * throughput * sc.color[hid]).astype(np.float32)
                o = hp
                d = refl_dir
            else:
                throughput = (tp * throughput * sc.color[hid]).astype(np.float32)
                o = hp
                d = tdir
    return rad


def generate_camera_ray(basis, seeds, width, height, x, y):
    """GenerateCameraRay (rendering_kernel.cl:29-51), scalar."""
    inv_w = F(1.0 / width)
    inv_h = F(1.0 / height)
    r1 = F(get_random(seeds) - F(0.5))
    r2 = F(get_random(seeds) - F(0.5))
    kcx = F((F(x) + r1) * inv_w - F(0.5))
    kcy = F((F(y) + r2) * inv_h - F(0.5))
    rdir = (basis["x"] * kcx + basis["y"] * kcy + basis["dir"]).astype(np.float32)
    rorig = (F(0.1) * rdir + basis["orig"]).astype(np.float32)
    rdir = _norm(rdir)
    return rorig, rdir


def update_camera(orig, target, width, height):
    """displayfunc.cpp:182-195, scalar float32."""
    orig = np.asarray(orig, np.float32)
    target = np.asarray(target, np.float32)
    d = _norm(target - orig)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    fov = F(F(np.pi) / F(180.0) * F(45.0))
    cx = _norm(np.cross(d, up)) * F(width * fov / height)
    cy = _norm(np.cross(cx, d)) * fov
    return {"orig": orig, "target": target, "dir": d, "x": cx, "y": cy}


def render(
    sc: OracleScene,
    camera_orig,
    camera_target,
    width: int,
    height: int,
    spp: int,
    seeds: np.ndarray,
    direct_only: bool = False,
    max_depth: int = 7,
) -> np.ndarray:
    """Progressive render, the UpdateRenderingCPU loop (smallptCPU.cpp:77-132).

    ``seeds``: uint32[height, width, 2], indexed by (row, x) where row 0 is
    the TOP image row; the camera y coordinate for row r is height-1-r
    (matching our framebuffer convention; see driver/render.py).

    Returns float32 [height, width, 3] mean radiance.
    """
    basis = update_camera(camera_orig, camera_target, width, height)
    colors = np.zeros((height, width, 3), np.float32)
    for s in range(spp):
        for row in range(height):
            y = height - 1 - row
            for x in range(width):
                px_seeds = seeds[row, x]
                ro, rd = generate_camera_ray(basis, px_seeds, width, height, x, y)
                r = radiance(sc, ro, rd, px_seeds, direct_only, max_depth)
                if s == 0:
                    colors[row, x] = r
                else:
                    k1 = F(s)
                    k2 = F(1.0) / F(s + 1.0)
                    colors[row, x] = (colors[row, x] * k1 + r) * k2
    return colors
