"""whitted5 Pallas level-kernel (kernels/whitted5_kernel.py) parity vs
the jnp levelwise tracer (models/whitted5.py) — interpret mode on CPU
(Mosaic lowering itself is gated on the real chip, tests/test_tpu.py).

The two paths consume identical counter-RNG streams (same per-node keys,
same masked draw order), so they evaluate the same Monte-Carlo estimator;
agreement is float-reassociation-level. At ESTIMATOR-DISCRETE points a
1-ulp geometric difference can flip one shadow-sample visibility test
(shade jumps by 1/n_samp), so the stochastic-scene gate is p99-tight
with a bounded max (an RNG/stream bug disagrees at ~1e-1 level across
most of the frame, far beyond it); the deterministic scene — no
visibility MC — is pinned tight.
"""

import numpy as np


def _robust_close(a, b, tag, p99=1e-4, mx=3e-3):
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(b).all(), f"{tag}: non-finite"
    d = np.abs(a - b)
    assert float(np.percentile(d, 99)) < p99, (
        f"{tag}: p99 {np.percentile(d, 99):.2e}"
    )
    assert float(d.max()) < mx, f"{tag}: max {d.max():.2e}"

from se195_raytracer_tpu.kernels.whitted5_kernel import (
    pack_whitted5_scene,
    render_whitted5_pallas,
    whitted5_trace_pallas,
)
from se195_raytracer_tpu.models.whitted5 import (
    _init_state5_np,
    camera_rays5,
    render_whitted5,
    whitted5_trace,
)
from se195_raytracer_tpu.scenes.whitted5_scenes import (
    Whitted5Builder,
    room5_scene,
)


def test_room5_frame_matches_jnp_interpret():
    """Full room5 frame (textures, 3 box area lights, glossy, refractive
    ceiling): kernel fast path == jnp path."""
    scene = room5_scene()
    w, h = 40, 30
    a = render_whitted5(scene, width=w, height=h, spp=1, seed=3)
    b = render_whitted5_pallas(scene, width=w, height=h, spp=1, seed=3,
                               interpret=True)
    _robust_close(a, b, "room5 40x30")


def test_room5_spp_scan_and_state_advance():
    """Multi-pass (spp) scan: same accumulation and the same advanced
    RNG state as the jnp path (stream parity across passes)."""
    scene = room5_scene()
    w, h = 32, 24
    a = render_whitted5(scene, width=w, height=h, spp=2, seed=7)
    b = render_whitted5_pallas(scene, width=w, height=h, spp=2, seed=7,
                               interpret=True)
    _robust_close(a, b, "room5 spp2")

    o, d = camera_rays5(w, h)
    st = _init_state5_np(o.shape[0], 7)
    _, st_jnp = whitted5_trace(scene, o, d, st)
    _, st_pal = whitted5_trace_pallas(scene, o, d, st, interpret=True)
    np.testing.assert_array_equal(np.asarray(st_jnp[0]), np.asarray(st_pal[0]))
    np.testing.assert_array_equal(np.asarray(st_jnp[1]), np.asarray(st_pal[1]))


def test_deterministic_scene_tight_parity():
    """Point (sphere) light + perfect mirror, no RNG influence: the two
    paths differ only by reassociation — tight tolerance."""
    b5 = Whitted5Builder()
    b5.plane((0.0, 1.0, 0.0), 4.4, color=(0.4, 0.3, 0.3), diff=1.0, spec=0.4)
    b5.sphere((1.0, -0.8, 3.0), 2.5, color=(0.7, 0.7, 1.0), refl=0.4, diff=0.2)
    b5.sphere((-2.0, 0.5, 6.0), 1.5, color=(1.0, 0.4, 0.4), refr=0.8,
              refr_index=1.3, diff=0.1)
    b5.sphere((0.0, 5.0, 5.0), 0.1, color=(0.6, 0.6, 0.6), is_light=True)
    scene = b5.build()
    w, h = 32, 24
    a = render_whitted5(scene, width=w, height=h, spp=1, seed=0)
    b = render_whitted5_pallas(scene, width=w, height=h, spp=1, seed=0,
                               interpret=True)
    aa, bb = np.asarray(a), np.asarray(b)
    assert np.isfinite(bb).all()
    np.testing.assert_allclose(bb, aa, rtol=1e-5, atol=1e-5)


def test_scene_table_layout():
    scene = room5_scene()
    tab = np.asarray(pack_whitted5_scene(scene))
    assert tab.shape == (27, scene.num_prims)
    np.testing.assert_allclose(tab[0:3].T, np.asarray(scene.center))
    np.testing.assert_allclose(tab[14:17].T, np.asarray(scene.color))
    # degenerate zero-radius sphere (prim 3) gets a guarded 1/r of 1.0
    assert tab[26, 3] == 1.0


def test_adaptive_pallas_matches_jnp_adaptive():
    """render_whitted5_adaptive(use_pallas=True) consumes the identical
    RNG streams as the jnp adaptive path: same edge mask, frames within
    reassociation tolerance (interpret mode on CPU)."""
    from se195_raytracer_tpu.models.whitted5 import (
        render_whitted5_adaptive,
    )

    scene = room5_scene()
    a, fa = render_whitted5_adaptive(scene, width=40, height=30, seed=3)
    b, fb = render_whitted5_adaptive(scene, width=40, height=30, seed=3,
                                     use_pallas=True, interpret=True)
    assert fa == fb
    _robust_close(a, b, "adaptive pallas 40x30")
