"""Scalar float32 CPU oracle for the Whitted tracer.

Independent scalar transliteration of the reference's CPU kernel port
(Raytracer3.2.03/raytracer_non_OpenCL.c: raytrace:179-281,
raytracer_non_kernel:285-450) used as the parity target for
models/whitted.py — the reborn dual-implementation check (SURVEY.md §4.1).
Implements the ray-queue algorithm literally (queue of 64, FIFO).

``hit_bias`` selects 3.2.03-kernel (+0.005) vs CPU/3.2.02 (0.0) sphere
near-hit semantics.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

F = np.float32
HIT, MISS, INPRIM = 1, 0, -1
EPSILON = F(0.001)
ORIGIN, REFLECTED, REFRACTED = 0, 1, 2


@dataclasses.dataclass
class WRay:
    origin: np.ndarray
    direction: np.ndarray
    weight: F
    depth: int
    origin_primitive: int
    rtype: int
    r_index: F
    transparency: np.ndarray


def _np_scene(scene):
    return dict(
        normal=np.asarray(scene.normal, np.float32),
        depth=np.asarray(scene.depth, np.float32),
        center=np.asarray(scene.center, np.float32),
        radius=np.asarray(scene.radius, np.float32),
        color=np.asarray(scene.color, np.float32),
        refl=np.asarray(scene.refl, np.float32),
        diff=np.asarray(scene.diff, np.float32),
        refr=np.asarray(scene.refr, np.float32),
        refr_index=np.asarray(scene.refr_index, np.float32),
        spec=np.asarray(scene.spec, np.float32),
        ptype=list(scene.ptype),
        is_light=list(scene.is_light),
    )


def _intersect_prim(sc, j, o, d, cumu, bias):
    """Returns (code, new_cumu). Plane per raytracer_non_OpenCL.c:plane
    branch; sphere with optional +bias near-root slack."""
    if sc["ptype"][j] == 0:  # plane
        dd = F(sc["normal"][j].dot(d))
        if dd != F(0.0):
            dist = F(-(sc["normal"][j].dot(o) + sc["depth"][j]) / dd)
            if dist > F(0.0) and dist < cumu:
                return HIT, dist
        return MISS, cumu
    v = o - sc["center"][j]
    b = F(-v.dot(d))
    det = F(b * b - v.dot(v) + sc["radius"][j] * sc["radius"][j])
    if det > F(0.0):
        det = np.sqrt(det)
        i1 = F(b - det)
        i2 = F(b + det)
        if i2 > F(0.0):
            if i1 < F(0.0):
                if i2 < cumu:
                    return INPRIM, i2
            else:
                if i1 < F(cumu + bias):
                    return HIT, i1
    return MISS, cumu


def _get_normal(sc, j, point):
    if sc["ptype"][j] == 0:
        return sc["normal"][j]
    return (point - sc["center"][j]) * F(1.0 / sc["radius"][j])


def raytrace(sc, ray: WRay, bias):
    """Nearest hit + local shading; returns (prim_index, result, dist,
    point, color)."""
    cumu = F(np.finfo(np.float32).max)
    prim_index = -1
    result = MISS
    for j in range(len(sc["ptype"])):
        code, cumu = _intersect_prim(sc, j, ray.origin, ray.direction, cumu, bias)
        if code:
            prim_index = j
            result = code
    if prim_index == -1:
        return -1, result, cumu, None, np.zeros(3, np.float32)
    acc = np.zeros(3, np.float32)
    if sc["is_light"][prim_index]:
        return prim_index, result, cumu, None, sc["color"][prim_index].copy()
    point = ray.origin + ray.direction * cumu
    for l in range(len(sc["ptype"])):
        if not sc["is_light"][l]:
            continue
        l_vec = sc["center"][l] - point
        l_len = F(np.sqrt(F(l_vec.dot(l_vec))))
        l_dir = (l_vec / l_len).astype(np.float32)
        shade = F(1.0)
        if sc["ptype"][l] == 1:  # sphere light: cast shadow ray
            so = point + l_dir * EPSILON
            maxt = l_len
            for s in range(len(sc["ptype"])):
                if sc["is_light"][s]:
                    continue
                code, maxt = _intersect_prim(sc, s, so, l_dir, maxt, bias)
                if code:
                    shade = F(0.0)
                    break
        n = _get_normal(sc, prim_index, point)
        if sc["diff"][prim_index] > F(0.0):
            dot_prod = F(n.dot(l_dir))
            if dot_prod > F(0.0):
                diff = F(dot_prod * sc["diff"][prim_index] * shade)
                acc = acc + diff * sc["color"][prim_index] * sc["color"][l]
        if sc["spec"][prim_index] > F(0.0):
            r_vec = l_dir - F(2.0) * F(l_dir.dot(n)) * n
            dot_prod = F(ray.direction.dot(r_vec))
            if dot_prod > F(0.0):
                spec = F(np.power(dot_prod, F(20.0)) * sc["spec"][prim_index] * shade)
                acc = acc + spec * sc["color"][l]
    return prim_index, result, cumu, point, acc


def trace_pixel_rays(scene, rays: List[WRay], trace_depth=5, hit_bias=0.0) -> np.ndarray:
    """Run the ray queue to exhaustion for one pixel's primary rays."""
    sc = _np_scene(scene)
    bias = F(hit_bias)
    acc = np.zeros(3, np.float32)
    queue: List[WRay] = list(rays)
    while queue:
        ray = queue.pop(0)
        prim_index, result, dist, point, ray_col = raytrace(sc, ray, bias)
        if ray.rtype == ORIGIN:
            acc = acc + ray_col * ray.weight
        elif ray.rtype == REFLECTED:
            acc = acc + ray_col * ray.weight * sc["color"][ray.origin_primitive] * ray.transparency
        else:
            acc = acc + ray_col * ray.weight * ray.transparency
        if prim_index == -1 or point is None:
            continue
        if ray.depth < trace_depth:
            refl = sc["refl"][prim_index]
            if refl > F(0.0):
                n = _get_normal(sc, prim_index, point)
                rdir = (ray.direction - F(2.0) * F(ray.direction.dot(n)) * n).astype(np.float32)
                queue.append(
                    WRay(
                        origin=point + rdir * EPSILON,
                        direction=rdir,
                        weight=F(refl * ray.weight),
                        depth=ray.depth + 1,
                        origin_primitive=prim_index,
                        rtype=REFLECTED,
                        r_index=ray.r_index,
                        transparency=ray.transparency.copy(),
                    )
                )
            refr = sc["refr"][prim_index]
            if refr > F(0.0):
                m_rindex = sc["refr_index"][prim_index]
                nr = F(ray.r_index / m_rindex)
                n2 = (_get_normal(sc, prim_index, point) * F(result)).astype(np.float32)
                cos_i = F(-n2.dot(ray.direction))
                cos_t2 = F(F(1.0) - nr * nr * (F(1.0) - cos_i * cos_i))
                if cos_t2 > F(0.0):
                    tdir = (nr * ray.direction + F(nr * cos_i - np.sqrt(cos_t2)) * n2).astype(np.float32)
                    transp = (
                        ray.transparency
                        * np.exp(sc["color"][prim_index] * F(0.15) * F(-dist))
                    ).astype(np.float32)
                    queue.append(
                        WRay(
                            origin=point + tdir * EPSILON,
                            direction=tdir,
                            weight=ray.weight,
                            depth=ray.depth + 1,
                            origin_primitive=prim_index,
                            rtype=REFRACTED,
                            r_index=m_rindex,
                            transparency=transp,
                        )
                    )
    return acc


def render_pixel(
    scene, x: int, y: int, width: int, height: int,
    supersample: int = 3, trace_depth: int = 5, hit_bias: float = 0.0,
) -> np.ndarray:
    """One pixel of the reference frame (raytracer_kernel.cl:260-382):
    3x3 supersampled queue traces, scaled by 256/9, clamped 0..255."""
    wx1, wx2 = F(-3.0), F(3.0)
    wy1, wy2 = F(2.25), F(-2.25)
    dx = F((wx2 - wx1) / width)
    dy = F((wy2 - wy1) / height)
    sx = F(wx1 + x * dx)
    sy = F(wy1 + y * dy)
    camera = np.array([0.0, 0.25, -7.0], np.float32)
    acc = np.zeros(3, np.float32)
    half = supersample // 2
    for tx in range(-half, supersample - half):
        for ty in range(-half, supersample - half):
            target = np.array(
                [sx + dx * F(tx / 2.0), sy + dy * F(ty / 2.0), 0.0], np.float32
            )
            d = target - camera
            d = (d / np.sqrt(F(d.dot(d)))).astype(np.float32)
            ray = WRay(
                origin=camera.copy(),
                direction=d,
                weight=F(1.0),
                depth=0,
                origin_primitive=-1,
                rtype=ORIGIN,
                r_index=F(1.0),
                transparency=np.ones(3, np.float32),
            )
            acc = acc + trace_pixel_rays(scene, [ray], trace_depth, hit_bias)
    ss2 = supersample * supersample
    return np.clip(acc * F(256.0 / ss2), 0.0, 255.0)
