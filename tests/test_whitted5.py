"""Extended (raytracer5-family) tracer tests: primitive semantics against
hand-computed values, reference-quirk replication, area-light shadows,
texture mapping, and image-level sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from se195_raytracer_tpu.models.whitted5 import (
    HIT,
    INPRIM,
    _box_normal_static,
    _texel,
    calc_shade,
    find_nearest,
    render_whitted5,
    whitted5_trace,
)
from se195_raytracer_tpu.core.rng import init_mwc_state
from se195_raytracer_tpu.scenes.whitted5_scenes import (
    Whitted5Builder,
    checker_texture,
    room5_scene,
)


def test_box_slab_intersect():
    b = Whitted5Builder()
    b.box((1.0, -1.0, -1.0), (2.0, 2.0, 2.0), diff=1.0)
    scene = b.build()
    o = jnp.array([[0.0, 0.0, 0.0], [4.0, 0.0, 0.0], [0.0, 5.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    idx, code, dist = find_nearest(scene, o, d)
    assert int(idx[0]) == 0 and abs(float(dist[0]) - 1.0) < 1e-5
    assert int(idx[1]) == 0 and abs(float(dist[1]) - 1.0) < 1e-5
    assert int(idx[2]) == -1  # passes above the box


def test_plane_is_one_sided():
    """PlanePrim::Intersect only accepts dot(N, dir) < 0 (scene.cpp:232-244)."""
    b = Whitted5Builder()
    b.plane((0.0, 1.0, 0.0), 2.0, diff=1.0)  # plane y = -2
    scene = b.build()
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, -4.0, 0.0]])
    d = jnp.array([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]])
    idx, code, dist = find_nearest(scene, o, d)
    assert int(idx[0]) == 0 and abs(float(dist[0]) - 2.0) < 1e-5
    assert int(idx[1]) == -1  # approaching from below the normal: ignored


def test_sphere_inprim_code():
    b = Whitted5Builder()
    b.sphere((0.0, 0.0, 0.0), 2.0, diff=1.0)
    scene = b.build()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    idx, code, dist = find_nearest(scene, o, d)
    assert int(idx[0]) == 0 and int(code[0]) == INPRIM
    assert abs(float(dist[0]) - 2.0) < 1e-5


def test_box_normal_replicates_reference_quirk():
    """Box::GetNormal ignores the hit position (scene.cpp:352-374); for the
    pillar box of the room scene it yields (1, 0, 0)."""
    scene = room5_scene()
    # prim 8 is the box pillar at (4,-2,0.5) size (0.25,3.5,12)
    n = np.asarray(_box_normal_static(scene, 8))
    np.testing.assert_array_equal(n, [1.0, 0.0, 0.0])


def test_texel_quirk_width_for_height():
    """GetTexel scales fv by the *width* (scene.cpp:63-66)."""
    bitmap = jnp.asarray(np.arange(8 * 4 * 3, dtype=np.float32).reshape(4, 8, 3))
    u = jnp.array([0.0])
    v = jnp.array([0.0])
    # fu = 1000.5*8 = 8004.0 -> u1 = 8004 % 8 = 4, frac 0
    # fv = 1000.0*8 = 8000.0 -> v1 = 8000 % 4 = 0 (width used, then mod height)
    out = np.asarray(_texel(bitmap, u, v))
    np.testing.assert_allclose(out[0], np.asarray(bitmap)[0, 4], rtol=1e-5)
    # quarter-texel offset in u gives a 25/75 bilinear blend
    u2 = jnp.array([0.25 / 8.0])
    out2 = np.asarray(_texel(bitmap, u2, v))
    expected = 0.75 * np.asarray(bitmap)[0, 4] + 0.25 * np.asarray(bitmap)[0, 5]
    np.testing.assert_allclose(out2[0], expected, rtol=1e-4)


def test_area_light_shadowing():
    """A plate between the surface and the box light blocks all 16 grid
    samples; removing it restores full visibility."""
    def make(blocked):
        b = Whitted5Builder()
        b.plane((0.0, 1.0, 0.0), 0.0, diff=1.0)  # floor y=0
        b.box((-1.0, 5.0, -1.0), (2.0, 0.1, 2.0), is_light=True, color=(1, 1, 1))
        if blocked:
            b.box((-3.0, 2.5, -3.0), (6.0, 0.1, 6.0), diff=1.0)
        return b.build()

    point = jnp.array([[0.0, 0.001, 0.0]])
    state = init_mwc_state((1,), 0)
    mask = jnp.array([True])
    sh_open, _, _ = calc_shade(make(False), 1, point, state, mask, 16)
    sh_block, _, _ = calc_shade(make(True), 2 if False else 1, point, state, mask, 16)
    assert float(sh_open[0]) == 1.0
    assert float(sh_block[0]) == 0.0


def test_point_light_requires_reaching_light():
    """CalcShade point-light visibility: the shadow ray's nearest hit must
    be the light primitive itself (raytracer.cpp:379-384)."""
    b = Whitted5Builder()
    b.plane((0.0, 1.0, 0.0), 0.0, diff=1.0)
    b.sphere((0.0, 5.0, 0.0), 0.1, is_light=True, color=(1, 1, 1))
    b.sphere((0.0, 2.5, 0.0), 0.5, diff=1.0)  # occluder
    scene = b.build()
    state = init_mwc_state((2,), 0)
    mask = jnp.array([True, True])
    pts = jnp.array([[0.0, 0.001, 0.0], [3.0, 0.001, 0.0]])
    shade, _, _ = calc_shade(scene, 1, pts, state, mask, 4)
    assert float(shade[0]) == 0.0  # directly under occluder
    assert float(shade[1]) == 1.0  # off to the side


def test_room5_render_stats():
    scene = room5_scene()
    img = np.asarray(render_whitted5(scene, width=64, height=48, spp=2))
    assert np.isfinite(img).all()
    assert img.max() > 0.3 and (img.max(-1) > 0.05).mean() > 0.3
    # textured checker floor should produce spatial variance on the floor
    assert img.std() > 0.05


def test_glossy_varies_with_rng_but_perfect_does_not():
    def make(drefl):
        b = Whitted5Builder()
        b.plane((0.0, 1.0, 0.0), 0.0, refl=0.8, drefl=drefl, diff=0.2,
                color=(1.0, 1.0, 1.0))
        # Sphere centered on the perfect-reflection ray's closest-approach
        # point so the glossy lobe straddles its silhouette.
        b.sphere((0.0, 0.6, 1.2), 0.5, diff=1.0, color=(1.0, 0.0, 0.0))
        b.sphere((5.0, 5.0, 0.0), 0.1, is_light=True, color=(1, 1, 1))
        return b.build()

    # Many identical rays with per-ray RNG keys: the glossy lobe straddles
    # the red sphere's silhouette, so stochastic disc samples must spread
    # the results across rays; a perfect mirror (drefl=0) draws nothing
    # and every ray must agree exactly.
    n = 64
    o = jnp.tile(jnp.array([[0.0, 2.0, -4.0]]), (n, 1))
    d = jnp.array([0.0, -0.5, 1.0])
    d = jnp.tile((d / jnp.linalg.norm(d))[None], (n, 1))
    from se195_raytracer_tpu.core.rng import init_counter_state

    glossy = make(0.5)
    c1, _ = whitted5_trace(glossy, o, d, init_counter_state((n,), 1))
    assert not (np.asarray(c1) == np.asarray(c1)[0]).all()
    mirror = make(0.0)
    m1, _ = whitted5_trace(mirror, o, d, init_counter_state((n,), 1))
    assert (np.asarray(m1) == np.asarray(m1)[0]).all()
    # and a different base seed changes the glossy image but not the mirror
    c2, _ = whitted5_trace(glossy, o, d, init_counter_state((n,), 2))
    assert not np.allclose(np.asarray(c1), np.asarray(c2))
    m2, _ = whitted5_trace(mirror, o, d, init_counter_state((n,), 2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def _deterministic_scene():
    """Point (sphere) light, zero drefl: no RNG draws affect the image,
    so subset-traced rays equal full-frame-traced rays exactly."""
    b = Whitted5Builder()
    b.plane((0.0, 1.0, 0.0), 4.4, color=(0.4, 0.3, 0.3), diff=1.0, spec=0.0)
    b.sphere((1.0, -0.8, 3.0), 2.5, color=(0.7, 0.7, 1.0), refl=0.4, diff=0.2)
    b.sphere((-5.5, -0.5, 7.0), 2.0, color=(0.7, 0.7, 1.0), refl=0.7, diff=0.1)
    b.sphere((0.0, 5.0, 5.0), 0.1, color=(0.6, 0.6, 0.6), is_light=True)
    return b.build()


def test_adaptive_supersampling_matches_bruteforce():
    """render_whitted5_adaptive == the reference's Render() semantics
    (raytracer.cpp:481-535): edge pixels (primary prim != scan-order
    predecessor's) average 4 sub-pixel rays, interior pixels keep the
    single primary sample."""
    from se195_raytracer_tpu.models.whitted5 import (
        ADAPTIVE_OFFSETS,
        camera_rays5,
        render_whitted5_adaptive,
    )

    from se195_raytracer_tpu.models.whitted5 import (
        _adaptive_extra,
        _adaptive_primary,
    )

    scene = _deterministic_scene()
    w, h = 48, 36
    img, frac = render_whitted5_adaptive(scene, width=w, height=h, seed=3)
    assert 0.0 < frac < 1.0
    assert np.isfinite(np.asarray(img)).all()

    # Edge mask semantics, independently in numpy: primary prim differs
    # from the scan-order predecessor's (lastprim carries across scanline
    # ends; initial NULL == miss code -1).
    col0, edge, state = _adaptive_primary(scene, w, h, 4, 3)
    o, d = camera_rays5(w, h, sub=(0.0, 0.0))
    idx = np.asarray(find_nearest(scene, o, d)[0])
    prev = np.concatenate([[-1], idx[:-1]])
    np.testing.assert_array_equal(np.asarray(edge), idx != prev)

    # Expected image: run phase 2 over the FULL pixel set (so the extra
    # rays use the identical jnp math), then blend with the same mask.
    # Rays are RNG-independent here (point light, drefl=0), so tracing
    # every pixel vs only edge pixels must agree bit-for-bit.
    r = w * h
    padded = 4096
    sel_pad = np.concatenate([np.arange(r), np.zeros(padded - r)])
    sel_all = jnp.asarray(sel_pad, jnp.int32)
    colrow = jnp.asarray(
        np.stack([sel_pad % w, sel_pad // w], axis=-1), jnp.float32
    )
    live = jnp.asarray(np.arange(padded) < r)
    state_sel = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a)[sel_pad.astype(np.int64)]), state
    )
    img_all = _adaptive_extra(
        scene, col0, jnp.ones((r,), bool), sel_all, colrow, live, state_sel,
        w, h, 4, padded,
    )
    want = np.where(
        np.asarray(edge)[:, None], np.asarray(img_all), np.asarray(col0)
    ).reshape(h, w, 3)
    np.testing.assert_allclose(np.asarray(img), want, rtol=1e-6, atol=1e-7)

    # Interior pixels keep the single primary sample exactly.
    flat = np.asarray(img).reshape(r, 3)
    np.testing.assert_array_equal(flat[~np.asarray(edge)],
                                  np.asarray(col0)[~np.asarray(edge)])
    # The edge mask really is sparse on this scene (that's the point of
    # the adaptive split): fewer than a third of pixels supersampled.
    assert frac < 0.34


def test_adaptive_supersampling_room_smoke():
    """Stochastic scene (area lights): shapes/finiteness + edge fraction."""
    from se195_raytracer_tpu.models.whitted5 import render_whitted5_adaptive

    img, frac = render_whitted5_adaptive(room5_scene(), width=40, height=30)
    assert img.shape == (30, 40, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert 0.0 < frac < 1.0
