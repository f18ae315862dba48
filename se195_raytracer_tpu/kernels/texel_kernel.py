"""MXU bilinear texel unit — the whitted5 texture fast path.

Texture::GetTexel (raytracer5/trunk/scene.cpp:81-106) is four random
fetches + a bilinear blend per lane. XLA-TPU lowers random gathers to a
~5-11 M fetch/s scalar path regardless of formulation (measured r5:
row-width, dtype and index coherence move it <2x), which made the fetch
98% of the whitted5 frame time (0.459 of 0.468 s/spp at 800x600). A
TPU has no per-lane vector gather — but it has an MXU, and selecting
row v of a table T is ``onehot(v) @ T``. This kernel runs the whole
bilinear fetch as one-hot contractions over ray tiles:

* The texture atlas (all same-shaped textures row-concatenated, [Va,
  Tw, 3]) is packed host-side into a transposed ``[2*3*Tw, Va]`` bf16
  table: row ``ch*Tw + u`` holds channel ch of column u; the second
  half is the SAME atlas pre-rolled one v-row forward with per-texture
  wrap, so a single one-hot over v1 yields both bilinear rows (v1 and
  v2=(v1+1) mod Th) in one matmul.
* Per [8, TM] tile of lanes, per sublane row: build ``onehot[Va, TM]``
  from the v1 plane (iota-compare — lanes stay in the minor dim, no
  relayout), then ``A = TBIG @ onehot`` on the MXU (bf16 x bf16 ->
  f32 accumulate).
* The four corner texels are extracted from A with u1/u2 one-hot row
  masks and sublane sums, then blended ``c1*w1 + c2*w2 + c3*w3 + c4*w4``
  in exactly GetTexel's order.

Exactness: the reference's TGA texels are u8/256 (io/tga.py), which
bf16 represents exactly (integers 0..255 fit its 8-bit significand), a
one-hot product copies table entries unchanged, and every reduction has
a single nonzero term — so for real texture assets the kernel output is
BIT-IDENTICAL to models/whitted5._texel. Textures that are not exactly
bf16-representable (the procedural fallbacks) get a second lo-residual
table pass (hi + lo splitting), accurate to ~2^-17 relative.

Dead-row skip: node-major deep tree levels are mostly invalid lanes; a
sublane row of TM lanes whose ``live`` plane is all zero skips its
matmul via ``pl.when`` (outputs stay zero — callers mask dead lanes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEF_TM = 1024  # lanes per sublane row of a tile (tile = 8 * TM lanes)


@struct.dataclass
class TexelTables:
    """Packed one-hot texel tables for a scene's same-shaped textures.

    ``hi``/``lo`` are the transposed [2*3*Tw, Va] bf16 tables (lo is the
    residual split for non-bf16-exact texels; all-zero when exact —
    statically absent via ``has_lo``)."""

    hi: jnp.ndarray
    lo: Optional[jnp.ndarray]
    tw: int = struct.field(pytree_node=False)
    tex_h: int = struct.field(pytree_node=False)
    has_lo: bool = struct.field(pytree_node=False)


def prepare_texel_tables(scene) -> Optional[TexelTables]:
    """Build TexelTables for a Whitted5Scene OUTSIDE jit (needs concrete
    texture values to decide bf16 exactness). Returns None when the MXU
    path does not apply (no textures in use, or mixed shapes)."""
    textured = [j for j in range(scene.num_prims) if scene.tex_id[j] >= 0]
    if not textured:
        return None
    shapes = {scene.textures[scene.tex_id[j]].shape for j in textured}
    if len(shapes) != 1:
        return None
    th, tw = next(iter(shapes))[:2]
    atlas = np.concatenate([np.asarray(t) for t in scene.textures], axis=0)
    hi, lo, exact = pack_texel_tables(atlas, th)
    return TexelTables(
        hi=jnp.asarray(hi), lo=None if exact else jnp.asarray(lo),
        tw=int(tw), tex_h=int(th), has_lo=not exact,
    )


def pack_texel_tables(
    atlas: np.ndarray, tex_h: int
) -> Tuple[np.ndarray, np.ndarray | None, bool]:
    """Pack a row-concatenated atlas [Va, Tw, 3] (Va = n_tex * tex_h)
    into the transposed hi table [2*3*Tw, Va] bf16 (+ lo residual table
    when the texels are not exactly bf16-representable).

    Returns (hi, lo_or_None, exact)."""
    atlas = np.asarray(atlas, np.float32)
    va, tw, _ = atlas.shape
    assert va % tex_h == 0, (va, tex_h)
    # v-rolled atlas: row v -> row (v+1 wrapped within its texture).
    idx = np.arange(va)
    base = (idx // tex_h) * tex_h
    rolled = atlas[base + (idx - base + 1) % tex_h]

    def to_t(a):  # [Va, Tw, 3] -> [3*Tw, Va], row = ch*Tw + u
        return np.ascontiguousarray(
            a.transpose(2, 1, 0).reshape(3 * tw, va)
        )

    big = np.concatenate([to_t(atlas), to_t(rolled)], axis=0)  # [6Tw, Va]
    hi = big.astype(jnp.bfloat16)
    exact = bool(np.all(hi.astype(np.float32) == big))
    lo = None if exact else (big - hi.astype(np.float32)).astype(jnp.bfloat16)
    return hi, lo, exact


def _make_texel_kernel(tw: int, va: int, tm: int, has_lo: bool):
    def kernel(*refs):
        if has_lo:
            hi_ref, lo_ref, va_ref, u1_ref, fu_ref, fv_ref, live_ref, out_ref = refs
        else:
            hi_ref, va_ref, u1_ref, fu_ref, fv_ref, live_ref, out_ref = refs

        out_ref[:] = jnp.zeros((8, 8, tm), jnp.float32)
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (va, tm), 0)
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (tw, tm), 0)

        for row in range(8):
            @pl.when(jnp.max(live_ref[row, :]) > 0.5)
            def _row(row=row):
                v1 = va_ref[row : row + 1, :]  # [1, TM] i32 atlas row
                u1 = u1_ref[row : row + 1, :]
                fu = fu_ref[row : row + 1, :]  # [1, TM] f32
                fv = fv_ref[row : row + 1, :]

                oh = (iota_v == v1).astype(jnp.bfloat16)  # [Va, TM]
                a = jnp.dot(
                    hi_ref[:], oh, preferred_element_type=jnp.float32
                )  # [6*Tw, TM]
                if has_lo:
                    a = a + jnp.dot(
                        lo_ref[:], oh, preferred_element_type=jnp.float32
                    )

                u2 = jnp.where(u1 == tw - 1, 0, u1 + 1)
                m1 = (iota_u == u1).astype(jnp.float32)  # [Tw, TM]
                m2 = (iota_u == u2).astype(jnp.float32)

                w1 = (1.0 - fu) * (1.0 - fv)
                w2 = fu * (1.0 - fv)
                w3 = (1.0 - fu) * fv
                w4 = fu * fv
                for ch in range(3):
                    a1 = a[ch * tw : (ch + 1) * tw]          # T[v1, :, ch]
                    a2 = a[(3 + ch) * tw : (4 + ch) * tw]    # T[v2, :, ch]
                    c1 = jnp.sum(a1 * m1, axis=0, keepdims=True)  # [1, TM]
                    c2 = jnp.sum(a1 * m2, axis=0, keepdims=True)
                    c3 = jnp.sum(a2 * m1, axis=0, keepdims=True)
                    c4 = jnp.sum(a2 * m2, axis=0, keepdims=True)
                    # GetTexel's exact blend order (scene.cpp:103-105).
                    out_ref[ch, row : row + 1, :] = (
                        c1 * w1 + c2 * w2 + c3 * w3 + c4 * w4
                    )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("tw", "tm", "interpret"),
)
def _texel_pallas(
    hi: jnp.ndarray,            # [6*Tw, Va] bf16
    lo: jnp.ndarray | None,     # same, or None
    va_rows: jnp.ndarray,       # [G*8, TM] i32
    u1: jnp.ndarray,            # [G*8, TM] i32
    fu: jnp.ndarray,            # [G*8, TM] f32
    fv: jnp.ndarray,            # [G*8, TM] f32
    live: jnp.ndarray,          # [G*8, TM] f32
    *,
    tw: int,
    tm: int,
    interpret: bool = False,
):
    rows, _ = va_rows.shape
    assert rows % 8 == 0
    g = rows // 8
    va = hi.shape[1]
    kernel = _make_texel_kernel(tw, va, tm, lo is not None)
    plane = lambda: pl.BlockSpec((8, tm), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    tab = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = ([tab()] if lo is None else [tab(), tab()]) + [
        plane() for _ in range(5)
    ]
    args = ([hi] if lo is None else [hi, lo]) + [va_rows, u1, fu, fv, live]
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, 8, tm), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, g * 8, tm), jnp.float32),
        interpret=interpret,
    )(*args)
    return out


def texel_fetch_mxu(
    tables,
    va_rows: jnp.ndarray,  # [R] i32 atlas row of v1 (incl. texture offset)
    u1: jnp.ndarray,       # [R] i32 column
    fu: jnp.ndarray,       # [R] f32 frac
    fv: jnp.ndarray,       # [R] f32 frac
    live: jnp.ndarray,     # [R] bool — lanes whose value matters
    tw: int,
    tm: int = DEF_TM,
    interpret: bool = False,
):
    """Bilinear fetch for R flat lanes; returns (r, g, b) [R] f32 planes.
    Dead lanes return 0. ``tables`` = pack_texel_tables output."""
    hi, lo, _ = tables
    r = va_rows.shape[0]
    tile = 8 * tm
    g = -(-r // tile)
    pad = g * tile - r

    def shape2(x, fill):
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(g * 8, tm)

    out = _texel_pallas(
        jnp.asarray(hi), None if lo is None else jnp.asarray(lo),
        shape2(va_rows.astype(jnp.int32), 0),
        shape2(u1.astype(jnp.int32), 0),
        shape2(fu, 0.0), shape2(fv, 0.0),
        shape2(live.astype(jnp.float32), 0.0),
        tw=tw, tm=tm, interpret=interpret,
    )  # [8, G*8, TM]
    flat = out.reshape(8, g * tile)[:, :r]
    return flat[0], flat[1], flat[2]
