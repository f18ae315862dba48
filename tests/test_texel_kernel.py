"""MXU texel unit (kernels/texel_kernel.py) vs the jnp bilinear fetch
(models/whitted5._texel) — interpret mode on CPU.

The kernel is the whitted5 texture fast path: one-hot matmuls against
the VMEM-resident atlas instead of XLA gathers (Texture::GetTexel,
raytracer5/trunk/scene.cpp:81-106). For u8/256 texels (the reference's
TGA assets, io/tga.py) the kernel is bit-exact; arbitrary f32 texels
take the hi+lo split tables and are ~2^-17-relative accurate.
"""

import numpy as np
import jax.numpy as jnp

from se195_raytracer_tpu.kernels.texel_kernel import (
    pack_texel_tables,
    prepare_texel_tables,
    texel_fetch_mxu,
)
from se195_raytracer_tpu.models.whitted5 import _texel
from se195_raytracer_tpu.scenes.whitted5_scenes import room5_scene


def _ref_fetch(atlas, th, tw, u, v, tex_id):
    """models/whitted5._texel in atlas mode (the jnp path's own code)."""
    return np.asarray(
        _texel(
            jnp.asarray(atlas),
            jnp.asarray(u),
            jnp.asarray(v),
            row_offset=jnp.asarray(tex_id * th),
            wrap_shape=(th, tw),
        )
    )


def _kernel_fetch(tables, th, tw, u, v, tex_id, live=None):
    fu = (u + 1000.5) * tw
    fv = (v + 1000.0) * tw
    u1 = np.floor(fu).astype(np.int32) % tw
    v1 = np.floor(fv).astype(np.int32) % th
    fracu = (fu - np.floor(fu)).astype(np.float32)
    fracv = (fv - np.floor(fv)).astype(np.float32)
    if live is None:
        live = np.ones(u.shape[0], bool)
    hi, lo, exact = tables
    r, g, b = texel_fetch_mxu(
        (hi, lo, exact),
        jnp.asarray(v1 + tex_id * th), jnp.asarray(u1),
        jnp.asarray(fracu), jnp.asarray(fracv), jnp.asarray(live),
        tw=tw, interpret=True,
    )
    return np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)


def test_u8_atlas_exact_selection():
    """u8/256 texels (the reference TGA semantics): the one-hot corner
    SELECTION is exact (bf16 copies u8/256 values unchanged), including
    u/v wrap and the cross-texture atlas row offsets. The final 4-term
    blend runs in a different executable than the jnp reference, so XLA
    CPU's per-compilation FMA-contraction choices can move it by 1 ulp
    (on TPU the kernel path measured bitwise-equal to the gather path,
    r5); the gate is <= 1 ulp of the <= 1.0 texel scale."""
    rng = np.random.default_rng(0)
    th = tw = 16
    atlas = (rng.integers(0, 256, (2 * th, tw, 3)) / 256.0).astype(np.float32)
    tables = pack_texel_tables(atlas, th)
    assert tables[2], "u8/256 texels must be detected bf16-exact"

    n = 1024
    u = (rng.random(n).astype(np.float32) * 7 - 3)
    v = (rng.random(n).astype(np.float32) * 5 - 2)
    tex = rng.integers(0, 2, n).astype(np.int32)
    got = _kernel_fetch(tables, th, tw, u, v, tex)
    want = _ref_fetch(atlas, th, tw, u, v, tex)
    assert np.abs(got - want).max() <= 1.2e-7, np.abs(got - want).max()

    # fracu = fracv = 0 isolates pure selection: exactly one corner with
    # weight 1.0*1.0 — bit-exact regardless of FMA contraction.
    u0 = np.floor(u * tw) / tw
    v0 = np.floor(v * tw) / tw
    got0 = _kernel_fetch(tables, th, tw, u0, v0, tex)
    want0 = _ref_fetch(atlas, th, tw, u0, v0, tex)
    assert np.array_equal(got0, want0), np.abs(got0 - want0).max()


def test_arbitrary_f32_lo_split():
    """Non-u8 texels route through the hi+lo split tables (~1e-5 rel)."""
    rng = np.random.default_rng(1)
    th = tw = 16
    atlas = rng.random((th, tw, 3)).astype(np.float32)
    tables = pack_texel_tables(atlas, th)
    assert not tables[2]
    assert tables[1] is not None

    n = 512
    u = rng.random(n).astype(np.float32) * 3
    v = rng.random(n).astype(np.float32) * 3
    tex = np.zeros(n, np.int32)
    got = _kernel_fetch(tables, th, tw, u, v, tex)
    want = _ref_fetch(atlas, th, tw, u, v, tex)
    assert np.abs(got - want).max() < 3e-5


def test_dead_lanes_zero_and_live_unaffected():
    rng = np.random.default_rng(2)
    th = tw = 8
    atlas = (rng.integers(0, 256, (th, tw, 3)) / 256.0).astype(np.float32)
    tables = pack_texel_tables(atlas, th)
    n = 256
    u = rng.random(n).astype(np.float32)
    v = rng.random(n).astype(np.float32)
    tex = np.zeros(n, np.int32)
    live = rng.random(n) < 0.5
    got = _kernel_fetch(tables, th, tw, u, v, tex, live=live)
    want = _ref_fetch(atlas, th, tw, u, v, tex)
    # live rows of a [8, TM] block run whenever ANY lane in them is
    # live; dead lanes in live rows still produce the true texel, dead
    # rows produce 0 — either value is fine (callers mask), but live
    # lanes must match (1-ulp blend slack, see
    # test_u8_atlas_exact_selection).
    assert np.abs(got[live] - want[live]).max() <= 1.2e-7


def test_prepare_texel_tables_room5():
    """room5's real TGA assets are u8/256 -> exact single-table mode."""
    scene = room5_scene()
    tabs = prepare_texel_tables(scene)
    assert tabs is not None
    assert tabs.tw == 200 and tabs.tex_h == 200
    assert not tabs.has_lo, "reference TGA texels are u8/256 => bf16-exact"
    assert tabs.hi.shape == (6 * 200, 2 * 200)
