"""Pallas fused ROIAlign (forward + backward).

Why a kernel: the XLA formulation (ops/roi_align.py) materializes four
corner-gather buffers in HBM before interpolating — ~3x the bandwidth floor.

Two forward designs live here:

* LEVEL-RESIDENT (default, ``_make_resident_kernel``): each image's whole
  FPN pyramid is copied into VMEM with one contiguous slab DMA per level,
  then every ROI's (WIN, WIN, C) window is sliced straight out of VMEM and
  reduced by two separable bf16 MXU matmuls. Requires image-major ROI
  order with a fixed per-image count (``rois_per_image``); scalar-prefetch
  SMEM limits chunk the image axis automatically.
* WINDOWED (fallback, ``_make_kernel``): DMAs each ROI's (rows, WIN, C)
  window from HBM as one strided block copy — rows is the smallest
  ROW_BUCKETS entry covering the ROI's y-span — double-buffered so ROI
  r+1's DMA hides under ROI r's compute. Row-descriptor-bound (~160 ns per
  strided row) at large ROI counts, which is what motivated the resident
  variant.

The BACKWARD (``_make_resident_bwd_kernel``) is the exact transpose of the
resident forward: per ROI the (P, P, C) cotangent expands back to its
window via the transposed separable matmuls and accumulates into a
VMEM-resident gradient pyramid, written to HBM once per image — replacing
XLA's scatter-add lowering (which was 35% of the Mask R-CNN train step).

Layout constraints honored (Mosaic (8,128)/(16,128) tiling): each level is a
(B*H, Wpad, C) ref whose W is padded to a multiple of 8 and >= WIN; window x
origins align down to 8; the leading (row) dim is unconstrained, so y
origins are free.

Semantics: identical to ROIAlignV2 for ROIs whose sampling span fits the
usable window (WIN - 9 cells). The multilevel wrapper bumps oversized ROIs
to a coarser level so the bound holds (extreme-aspect proposals; in the
reference those few boxes sample at the finer level — sub-0.1 AP effect).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

WIN = 40  # window cells per axis
ALIGN = 8  # x-origin alignment required by the sublane tiling
# Window-size buckets for the per-ROI DMA. Rows (the leading dim of the 3-D
# level refs) have no tiling constraint, and the x window only needs
# multiple-of-ALIGN extents, so each ROI copies only the smallest bucket
# covering its span instead of the full WIN x WIN — pure HBM traffic
# savings, zero numerics change (axis weights are zero beyond the span;
# stale cells in the scratch are finite feature values, zeroed at step 0).
ROW_BUCKETS = (16, 24, 32, WIN)
# x stays full width. The per-ROI window DMA is ROW-DESCRIPTOR-bound on
# this chip (~160ns per strided row chunk), not byte-bound: narrowing the
# columns (even one extra {24, WIN} bucket) keeps the same descriptor count
# with less payload per descriptor and measured 16% SLOWER end-to-end.
COL_BUCKETS = (WIN,)


def _axis_weights(start: Array, bin_size: Array, origin: Array, size: Array, p: int, s: int):
    """Separable weight matrix (P, WIN) for one axis of one ROI.

    start/bin_size: ROI start coord and bin size in feature cells (at the
    ROI's level); origin: window origin (cells); size: level extent.
    Includes bilinear hat weights, 1/s sample averaging and out-of-range
    zeroing (reference ROIAlign boundary rules).
    """
    grid = (
        jnp.arange(p, dtype=jnp.float32)[:, None]
        + (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s
    ).reshape(-1)  # (P*S,) sample positions in bin units
    coords = start + grid * bin_size  # absolute cell coords
    oob = (coords < -1.0) | (coords > size)
    cc = jnp.clip(coords, 0.0, jnp.maximum(size - 1.0, 0.0)) - origin
    cc = jnp.clip(cc, 0.0, WIN - 1.001)
    lo = jnp.floor(cc).astype(jnp.int32)
    frac = cc - lo
    # dense compare-based build instead of scatter-add: the two hat taps
    # land on distinct columns (lo <= WIN-2 after the clip above), and XLA
    # scatters were 10x the cost of this elementwise form at 64k ROIs
    # (profiled 32 ms/step -> ~3 ms).
    k = jnp.arange(WIN, dtype=jnp.int32)[None, :]  # (1, WIN)
    w = jnp.where(k == lo[:, None], (1.0 - frac)[:, None], 0.0) + jnp.where(
        k == jnp.minimum(lo + 1, WIN - 1)[:, None], frac[:, None], 0.0
    )
    w = jnp.where(oob[:, None], 0.0, w)
    return w.reshape(p, s, WIN).sum(axis=1) / s  # (P, WIN)


def _make_kernel(num_levels: int, group: int):
    """Each grid step handles ``group`` ROIs: their window DMAs are all in
    flight together (per-ROI semaphore slots) and the per-ROI matmuls queue
    back-to-back on the MXU, amortizing the scalar-core control overhead
    that dominates at one-ROI-per-step granularity for large windows."""

    def kernel(lvl_ref, row_ref, ox_ref, ybkt_ref, wy_ref, wx_ref, *refs):
        level_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        bufs = (refs[num_levels + 1], refs[num_levels + 2])
        sems = (refs[num_levels + 3], refs[num_levels + 4])

        r = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(r, 2)

        nyb = len(COL_BUCKETS)

        def issue(block, buf, sem):
            for g in range(group):
                i = block * group + g
                lv = lvl_ref[i]
                ro = row_ref[i]
                oxi = pl.multiple_of(ox_ref[i] * ALIGN, ALIGN)
                bk = ybkt_ref[i]  # combined bucket: y * len(COL_BUCKETS) + x
                for l in range(num_levels):
                    for ky, rows in enumerate(ROW_BUCKETS):
                        for kx, cols in enumerate(COL_BUCKETS):
                            @pl.when((lv == l) & (bk == ky * nyb + kx))
                            def _(l=l, rows=rows, cols=cols, g=g):
                                pltpu.make_async_copy(
                                    level_refs[l].at[pl.ds(ro, rows), pl.ds(oxi, cols)],
                                    buf.at[g, pl.ds(0, rows), pl.ds(0, cols)],
                                    sem.at[g],
                                ).start()

        def wait(block, g, buf, sem):
            i = block * group + g
            bk = ybkt_ref[i]
            for ky, rows in enumerate(ROW_BUCKETS):
                for kx, cols in enumerate(COL_BUCKETS):
                    @pl.when(bk == ky * nyb + kx)
                    def _(rows=rows, cols=cols):
                        pltpu.make_async_copy(
                            level_refs[0].at[pl.ds(0, rows), pl.ds(0, cols)],
                            buf.at[g, pl.ds(0, rows), pl.ds(0, cols)],
                            sem.at[g],
                        ).wait()  # size-matched wait on this ROI's semaphore

        @pl.when(r == 0)
        def _init():
            # rows beyond a copied bucket keep their y-weight-zero garbage
            # out of the contraction only if finite: zero both buffers once
            # (later steps leave prior finite feature rows behind)
            bufs[0][...] = jnp.zeros_like(bufs[0])
            bufs[1][...] = jnp.zeros_like(bufs[1])
            issue(0, bufs[0], sems[0])

        # double-buffer: issue block r+1's windows while block r is in flight
        @pl.when(r + 1 < n)
        def _prefetch():
            for s in range(2):
                @pl.when(slot == s)
                def _(s=s):
                    issue(r + 1, bufs[1 - s], sems[1 - s])

        def compute(g, buf):
            win = buf[g]  # (WIN, WIN, C)
            wy = wy_ref[g]  # (P, WIN)
            wx = wx_ref[g]  # (P, WIN)
            # x-contraction: tmp[q, i, c] = sum_j wx[q, j] win[i, j, c]
            tmp = jax.lax.dot_general(
                wx.astype(jnp.float32),
                win.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            # y-contraction: out[p, q, c] = sum_i wy[p, i] tmp[q, i, c]
            out = jax.lax.dot_general(
                wy.astype(jnp.float32),
                tmp,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[g] = out.astype(out_ref.dtype)

        for s in range(2):
            @pl.when(slot == s)
            def _(s=s):
                for g in range(group):
                    wait(r, g, bufs[s], sems[s])
                    compute(g, bufs[s])

    return kernel


# ROIs per grid step (see _make_kernel). 8 windows x2 slots at C=256 bf16 is
# ~13 MB of VMEM — comfortably inside the limit. Measured optimum among
# {4, 8, 16} on the dev chip (16 regresses: VMEM pressure hurts overlap).
GROUP = 8

# ---------------------------------------------------------------------------
# Level-resident variant: the per-ROI window DMA above is ROW-DESCRIPTOR
# bound (~160 ns x rows per ROI -> 168 ms for the 64k-ROI box pooler at
# batch 64). When ROIs arrive image-major with a fixed count per image (all
# detection-head callers: batch_idx = repeat(arange(B), R/B)), we instead
# make EACH IMAGE'S WHOLE PYRAMID resident in VMEM — one contiguous slab
# copy per level (4 descriptors/image instead of ~R*rows) — and slice every
# ROI window straight out of VMEM. Traffic drops to the pyramid itself
# (~46 MB/image at 800x1344 C=256) and the kernel becomes MXU-bound.
# ---------------------------------------------------------------------------


def _make_resident_kernel(
    num_levels: int, group: int, rb: int, h_sizes, win_rows: int, mode: str,
    img0: int = 0,
):
    """Grid (B, rb): step (b, 0) copies image b's level slabs into VMEM;
    every step computes ``group`` ROIs by slicing windows from the resident
    buffers. ``h_sizes``: static per-level image row counts. ``mode``
    selects the per-ROI contraction strategy (see _roi_contract)."""

    def _roi_contract(win, wy, wx, out_dtype, p):
        if "bf16" in mode:
            # bf16 operands, f32 accumulate: one MXU pass per tile instead
            # of the 3/6-pass f32 emulation. Weight quantization adds
            # ~4e-3 relative — comparable to the bf16 feature rounding
            # already present on the compute path.
            win = win.astype(jnp.bfloat16)
            wy = wy.astype(jnp.bfloat16)
            wx = wx.astype(jnp.bfloat16)
            kw = dict(preferred_element_type=jnp.float32)
        else:
            win = win.astype(jnp.float32)
            kw = dict(
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        if mode == "xfirst":
            tmp = jax.lax.dot_general(
                wx, win, dimension_numbers=(((1,), (1,)), ((), ())), **kw
            )
            out = jax.lax.dot_general(
                wy, tmp, dimension_numbers=(((1,), (1,)), ((), ())), **kw
            )
            return out.astype(out_dtype)
        if mode.startswith("kron"):
            # ONE matmul per ROI: the (P*P, WIN*WIN) Kronecker weight
            # wy (x) wx against the window flattened to (WIN*WIN, C) — the
            # caller passes ``win`` already flat via a ref-level reshape
            # ((i, j, c) -> (i*j, c) is physically free: the (8,128) tiling
            # of (j, c) equals that of (ij, c) blockwise), so K=WIN*WIN
            # rides the MXU as one long contraction instead of ~P+1 tiny
            # launches.
            w2 = (wy[:, None, :, None] * wx[None, :, None, :]).reshape(
                p * p, WIN * WIN
            )
            out = jax.lax.dot_general(
                w2, win, dimension_numbers=(((1,), (0,)), ((), ())), **kw
            )
            return out.reshape(p, p, -1).astype(out_dtype)
        # "yfirst": contract the window's leading (row) dim first — a clean
        # (P, WIN) @ (WIN, WIN*C) matmul in the buffer's natural layout —
        # then P small (P, WIN) @ (WIN, C) matmuls for the x axis
        s1 = jax.lax.dot_general(
            wy, win, dimension_numbers=(((1,), (0,)), ((), ())), **kw
        )  # (P, WIN, C)
        s1 = s1.astype(win.dtype)  # keep operand dtypes uniform for stage 2
        if "ybatch" in mode:
            # stage 2 as ONE batched matmul over the P rows instead of P
            # separate launches
            wxb = jnp.broadcast_to(wx[None], (p,) + wx.shape)
            out = jax.lax.dot_general(
                wxb, s1, dimension_numbers=(((2,), (1,)), ((0,), (0,))), **kw
            )  # (P, P, C)
            return out.astype(out_dtype)
        rows = [
            jax.lax.dot_general(
                wx, s1[q], dimension_numbers=(((1,), (0,)), ((), ())), **kw
            )
            for q in range(p)
        ]
        return jnp.stack(rows, axis=0).astype(out_dtype)

    def kernel(lvl_ref, oy_ref, ox_ref, wy_ref, wx_ref, *refs):
        level_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        bufs = refs[num_levels + 1 : 2 * num_levels + 1]
        sems = refs[2 * num_levels + 1]
        wbuf = refs[2 * num_levels + 2] if mode.endswith("_copy") else None

        b = pl.program_id(0)
        j = pl.program_id(1)
        p = out_ref.shape[1]

        @pl.when(j == 0)
        def _load_levels():
            for l in range(num_levels):
                pltpu.make_async_copy(
                    level_refs[l].at[
                        pl.ds((img0 + b) * h_sizes[l], h_sizes[l])
                    ],
                    bufs[l],
                    sems.at[l],
                ).start()
            for l in range(num_levels):
                pltpu.make_async_copy(
                    level_refs[l].at[pl.ds(0, h_sizes[l])],
                    bufs[l],
                    sems.at[l],
                ).wait()

        for g in range(group):
            i = (b * rb + j) * group + g
            lv = lvl_ref[i]
            oy = oy_ref[i]
            oxi = pl.multiple_of(ox_ref[i] * ALIGN, ALIGN)
            if wbuf is not None:
                # branch only the window materialization; contract uniformly
                for l in range(num_levels):
                    @pl.when(lv == l)
                    def _(l=l):
                        wbuf[...] = bufs[l][
                            pl.ds(oy, win_rows), pl.ds(oxi, WIN), :
                        ]
                c_out = out_ref.shape[-1]
                win_val = (
                    wbuf.reshape(WIN * WIN, c_out)[...]
                    if mode.startswith("kron")
                    else wbuf[...]
                )
                out_ref[g] = _roi_contract(
                    win_val, wy_ref[g], wx_ref[g], out_ref.dtype, p
                )
            else:
                for l in range(num_levels):
                    @pl.when(lv == l)
                    def _(l=l, g=g, oy=oy, oxi=oxi):
                        win = bufs[l][pl.ds(oy, win_rows), pl.ds(oxi, WIN), :]
                        out_ref[g] = _roi_contract(
                            win, wy_ref[g], wx_ref[g], out_ref.dtype, p
                        )

    return kernel


# VMEM the resident pyramid may occupy; beyond this fall back to the
# windowed kernel (96 MB compiler limit minus out/weight/compute slack)
RESIDENT_VMEM_BUDGET = 72 * 1024 * 1024


def _resident_group(rois_per_image: int) -> int:
    for g in (16, 8, 4, 2, 1):
        if rois_per_image % g == 0:
            return g
    return 1


@partial(
    jax.jit,
    static_argnames=("output_size", "rois_per_image", "h_sizes", "mode", "img0"),
)
def _pallas_call_resident(
    levels3d, lvl_idx, oy, ox_div, wy, wx, output_size: int,
    rois_per_image: int, h_sizes: Tuple[int, ...], mode: str = "xfirst",
    img0: int = 0,
):
    r = lvl_idx.shape[0]
    c = levels3d[0].shape[-1]
    p = output_size
    num_levels = len(levels3d)
    b = r // rois_per_image
    group = _resident_group(rois_per_image)
    rb = rois_per_image // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # lvl, oy, ox_div
        grid=(b, rb),
        in_specs=[
            pl.BlockSpec(
                (group, p, WIN), lambda bi, j, *_: (bi * rb + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, p, WIN), lambda bi, j, *_: (bi * rb + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_levels)],
        out_specs=pl.BlockSpec(
            (group, p, p, c), lambda bi, j, *_: (bi * rb + j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((h_sizes[l], levels3d[l].shape[1], c), levels3d[l].dtype)
            for l in range(num_levels)
        ]
        + [pltpu.SemaphoreType.DMA((num_levels,))]
        + (
            [pltpu.VMEM((WIN, WIN, c), levels3d[0].dtype)]
            if mode.endswith("_copy")
            else []
        ),
    )
    return pl.pallas_call(
        _make_resident_kernel(num_levels, group, rb, h_sizes, WIN, mode, img0),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, p, p, c), levels3d[0].dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(lvl_idx, oy, ox_div, wy, wx, *levels3d)




def _make_resident_bwd_kernel(num_levels, group, rb, h_sizes, mode):
    """Transpose of the resident forward: per ROI, expand the (P, P, C)
    output cotangent back to its (WIN, WIN, C) window via the transposed
    separable matmuls and ACCUMULATE into the image's VMEM-resident
    gradient pyramid; write each level back to HBM once per image. This
    replaces XLA's scatter-add lowering of the pooler backward, which was
    35% of the Mask R-CNN train step (8 fusions x 29 ms at batch 16)."""

    def kernel(lvl_ref, oy_ref, ox_ref, dout_ref, wy_ref, wx_ref, *refs):
        out_refs = refs[:num_levels]
        bufs = refs[num_levels : 2 * num_levels]
        sems = refs[2 * num_levels]

        b = pl.program_id(0)
        j = pl.program_id(1)
        nb = pl.num_programs(0)

        @pl.when(j == 0)
        def _start_image():
            @pl.when(b > 0)
            def _():
                # previous image's writeback must finish before we reuse
                # the buffers
                for l in range(num_levels):
                    pltpu.make_async_copy(
                        out_refs[l].at[pl.ds(0, h_sizes[l])],
                        bufs[l],
                        sems.at[l],
                    ).wait()
            for l in range(num_levels):
                bufs[l][...] = jnp.zeros_like(bufs[l])

        for g in range(group):
            i = (b * rb + j) * group + g
            lv = lvl_ref[i]
            oy = oy_ref[i]
            oxi = pl.multiple_of(ox_ref[i] * ALIGN, ALIGN)
            dout = dout_ref[g]
            wy = wy_ref[g]
            wx = wx_ref[g]
            if "bf16" in mode:
                dout = dout.astype(jnp.bfloat16)
                wy = wy.astype(jnp.bfloat16)
                wx = wx.astype(jnp.bfloat16)
                kw = dict(preferred_element_type=jnp.float32)
            else:
                dout = dout.astype(jnp.float32)
                wy = wy.astype(jnp.float32)
                wx = wx.astype(jnp.float32)
                kw = dict(
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            # v[j, p, c] = sum_q wx[q, j] dout[p, q, c]
            v = jax.lax.dot_general(
                wx, dout, dimension_numbers=(((0,), (1,)), ((), ())), **kw
            ).astype(dout.dtype)
            # dwin[i, j, c] = sum_p wy[p, i] v[j, p, c]
            dwin = jax.lax.dot_general(
                wy, v, dimension_numbers=(((0,), (1,)), ((), ())), **kw
            )
            for l in range(num_levels):
                @pl.when(lv == l)
                def _(l=l, g=g, oy=oy, oxi=oxi, dwin=dwin):
                    cur = bufs[l][pl.ds(oy, WIN), pl.ds(oxi, WIN), :]
                    bufs[l][pl.ds(oy, WIN), pl.ds(oxi, WIN), :] = (
                        cur + dwin.astype(bufs[l].dtype)
                    )

        @pl.when(j == rb - 1)
        def _end_image():
            for l in range(num_levels):
                pltpu.make_async_copy(
                    bufs[l],
                    out_refs[l].at[pl.ds(b * h_sizes[l], h_sizes[l])],
                    sems.at[l],
                ).start()

            @pl.when(b == nb - 1)
            def _():
                for l in range(num_levels):
                    pltpu.make_async_copy(
                        out_refs[l].at[pl.ds(0, h_sizes[l])],
                        bufs[l],
                        sems.at[l],
                    ).wait()

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "output_size", "rois_per_image", "h_sizes", "w_pads", "mode", "dtype"
    ),
)
def _pallas_call_resident_bwd(
    dout, lvl_idx, oy, ox_div, wy, wx, output_size: int,
    rois_per_image: int, h_sizes: Tuple[int, ...], w_pads: Tuple[int, ...],
    mode: str, dtype,
):
    r = lvl_idx.shape[0]
    c = dout.shape[-1]
    p = output_size
    num_levels = len(h_sizes)
    b = r // rois_per_image
    group = _resident_group(rois_per_image)
    rb = rois_per_image // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # lvl, oy, ox_div
        grid=(b, rb),
        in_specs=[
            pl.BlockSpec(
                (group, p, p, c), lambda bi, j, *_: (bi * rb + j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, p, WIN), lambda bi, j, *_: (bi * rb + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, p, WIN), lambda bi, j, *_: (bi * rb + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_levels)
        ],
        scratch_shapes=[
            pltpu.VMEM((h_sizes[l], w_pads[l], c), dtype)
            for l in range(num_levels)
        ]
        + [pltpu.SemaphoreType.DMA((num_levels,))],
    )
    return pl.pallas_call(
        _make_resident_bwd_kernel(num_levels, group, rb, h_sizes, mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h_sizes[l], w_pads[l], c), dtype)
            for l in range(num_levels)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(lvl_idx, oy, ox_div, dout, wy, wx)


@partial(jax.jit, static_argnames=("output_size",))
def _pallas_call(levels3d, lvl_idx, row0, ox_div, ybkt, wy, wx, output_size: int):
    r = lvl_idx.shape[0]
    c = levels3d[0].shape[-1]
    p = output_size
    num_levels = len(levels3d)

    # pad the ROI axis to a multiple of GROUP (degenerate zero-weight ROIs)
    rp = ((r + GROUP - 1) // GROUP) * GROUP
    if rp != r:
        pad = rp - r
        lvl_idx = jnp.pad(lvl_idx, (0, pad))
        row0 = jnp.pad(row0, (0, pad))
        ox_div = jnp.pad(ox_div, (0, pad))
        ybkt = jnp.pad(ybkt, (0, pad))
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # lvl, row0, ox_div, ybkt
        grid=(rp // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, p, WIN), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, p, WIN), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_levels)],
        out_specs=pl.BlockSpec(
            (GROUP, p, p, c), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((GROUP, WIN, WIN, c), levels3d[0].dtype),
            pltpu.VMEM((GROUP, WIN, WIN, c), levels3d[0].dtype),
            pltpu.SemaphoreType.DMA((GROUP,)),
            pltpu.SemaphoreType.DMA((GROUP,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(num_levels, GROUP),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rp, p, p, c), levels3d[0].dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(lvl_idx, row0, ox_div, ybkt, wy, wx, *levels3d)
    return out[:r] if rp != r else out


def _bumped_levels(features, spatial_scales, boxes, levels):
    """Level assignment after the span-fits-window bump (shared by forward
    kernel and the autodiff backward)."""
    num_levels = len(features)
    scales = jnp.asarray(spatial_scales, jnp.float32)
    lvl = levels.astype(jnp.int32)
    usable = WIN - ALIGN + 1 - 2
    for _ in range(num_levels - 1):
        sc = scales[lvl]
        span = jnp.maximum(
            (boxes[:, 2] - boxes[:, 0]) * sc, (boxes[:, 3] - boxes[:, 1]) * sc
        )
        lvl = jnp.where((span > usable) & (lvl < num_levels - 1), lvl + 1, lvl)
    return lvl


@partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6, 7))
def roi_align_multilevel_pallas(
    features,
    spatial_scales,
    boxes,
    batch_indices,
    levels,
    output_size: int,
    sampling_ratio: int = 2,
    rois_per_image: int | None = None,
):
    """Drop-in multilevel ROIAlign on the fused kernel.

    features: per level (B, H, W, C); boxes (R, 4); levels (R,) assignments.
    Differentiable w.r.t. features: the backward runs the VJP of the XLA
    formulation at the SAME (bumped) level assignment — identical math, so
    gradients are exact for the f32 modes and the windowed/XLA fallback.
    The default ``yfirst_bf16_copy`` resident mode quantizes interpolation
    weights/cotangents to bf16 in BOTH forward and backward, so gradients
    there carry ~1e-3-level quantization error (and the backward is not the
    bit-exact transpose of the rounded forward).

    Known approximation: an ROI whose span at the LAST pyramid level still
    exceeds the usable window (31 cells — e.g. a >992 px box on FPN p5)
    cannot bump further; its outermost samples clamp to the 40-cell window
    edge. Single-level callers are unaffected (ROIPooler routes them to the
    XLA gather path).

    ``rois_per_image``: when set, the caller PROMISES image-major ROI order
    with exactly this many ROIs per image (batch_idx = repeat(arange(B),
    rois_per_image)); the level-resident kernel is then used when the
    pyramid fits the VMEM budget — ~4x faster than per-ROI window DMAs.
    """
    num_levels = len(features)
    c = features[0].shape[-1]
    s = max(sampling_ratio, 1)
    p = output_size

    # pad W to a multiple of ALIGN and both dims to >= WIN. No bottom slack:
    # window y-origins are clamped to H - WIN below, so reads never overrun
    # an image's rows — this keeps the (B,H,W,C)->(BH,W,C) reshape copy-free
    # for the big levels (a +WIN bottom jnp.pad forced XLA to copy the
    # whole 2.2 GB P2 tensor at batch 64; profiled at ~13 ms/step).
    padded = []
    for f in features:
        b, h, w, _ = f.shape
        wp = max(((w + ALIGN - 1) // ALIGN) * ALIGN, WIN)
        hp = max(h, WIN)
        f2 = jnp.pad(f, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        padded.append(f2)
    levels3d = [f.reshape(-1, f.shape[2], c) for f in padded]

    hs = jnp.asarray([f.shape[1] for f in padded], jnp.int32)
    ws_pad = jnp.asarray([f.shape[2] for f in padded], jnp.int32)
    ws_true = jnp.asarray([f.shape[2] for f in features], jnp.int32)
    hs_true = jnp.asarray([f.shape[1] for f in features], jnp.int32)
    scales = jnp.asarray(spatial_scales, jnp.float32)

    def span_at(lvl):
        sc = scales[lvl]
        return jnp.maximum(
            (boxes[:, 2] - boxes[:, 0]) * sc, (boxes[:, 3] - boxes[:, 1]) * sc
        )

    lvl = levels.astype(jnp.int32)
    usable = WIN - ALIGN + 1 - 2
    for _ in range(num_levels - 1):
        too_big = span_at(lvl) > usable
        lvl = jnp.where(too_big & (lvl < num_levels - 1), lvl + 1, lvl)

    sc = scales[lvl]
    h_l = hs_true[lvl]
    w_l = ws_true[lvl]
    h_p = hs[lvl]
    x0 = boxes[:, 0] * sc - 0.5
    y0 = boxes[:, 1] * sc - 0.5
    x1 = boxes[:, 2] * sc - 0.5
    y1 = boxes[:, 3] * sc - 0.5
    bin_w = (x1 - x0) / p
    bin_h = (y1 - y0) / p

    ox = jnp.clip(jnp.floor(x0).astype(jnp.int32) - 1, 0, None)
    ox = (ox // ALIGN) * ALIGN
    ox = jnp.minimum(ox, ((ws_pad[lvl] - WIN) // ALIGN) * ALIGN)
    # clamp the y origin like the x origin so [oy, oy+WIN) stays inside the
    # image's rows (weights are built against the clamped origin, so the
    # samples are identical; see the span-fits-window bump above)
    oy = jnp.clip(jnp.floor(y0).astype(jnp.int32) - 1, 0, None)
    oy = jnp.minimum(oy, hs[lvl] - WIN)
    row0 = batch_indices.astype(jnp.int32) * h_p + oy

    # smallest window bucket covering [origin, floor(min(hi, extent-1))] +
    # the bilinear +1 neighbor + 1 slack cell, per axis
    y_hi = jnp.floor(jnp.minimum(y1, (h_l - 1).astype(jnp.float32))).astype(jnp.int32)
    rows_needed = jnp.clip(y_hi - oy + 3, 1, WIN)
    ybkt = jnp.zeros_like(rows_needed)
    for rb in ROW_BUCKETS[:-1]:
        ybkt = ybkt + (rows_needed > rb).astype(jnp.int32)
    x_hi = jnp.floor(jnp.minimum(x1, (w_l - 1).astype(jnp.float32))).astype(jnp.int32)
    cols_needed = jnp.clip(x_hi - ox + 3, 1, WIN)
    xbkt = jnp.zeros_like(cols_needed)
    for cb in COL_BUCKETS[:-1]:
        xbkt = xbkt + (cols_needed > cb).astype(jnp.int32)
    ybkt = ybkt * len(COL_BUCKETS) + xbkt

    wy = jax.vmap(
        lambda st, bs, o, sz: _axis_weights(st, bs, o.astype(jnp.float32), sz.astype(jnp.float32), p, s)
    )(y0, bin_h, oy, h_l)
    wx = jax.vmap(
        lambda st, bs, o, sz: _axis_weights(st, bs, o.astype(jnp.float32), sz.astype(jnp.float32), p, s)
    )(x0, bin_w, ox, w_l)

    r = boxes.shape[0]
    b = features[0].shape[0]
    h_sizes = tuple(int(f.shape[1]) for f in padded)
    pyramid_bytes = sum(
        h_sizes[l] * levels3d[l].shape[1] * c * levels3d[l].dtype.itemsize
        for l in range(num_levels)
    )
    import os

    # level-resident kernel (default): yfirst_bf16_copy won the on-chip
    # mode sweep (1.9 us/ROI vs 3.6 windowed / 3.3 yfirst_copy at 4k ROIs;
    # bf16 operands halve MXU passes, accuracy within 2x the bf16 feature
    # rounding). JTSM_RESIDENT_MODE=yfirst_copy restores f32 contraction;
    # =off falls back to the windowed per-ROI-DMA kernel.
    mode = os.environ.get("JTSM_RESIDENT_MODE", "yfirst_bf16_copy")
    if (
        mode not in ("", "off")
        and rois_per_image is not None
        and r == b * rois_per_image
        and pyramid_bytes <= RESIDENT_VMEM_BUDGET
    ):
        # the scalar-prefetch arrays live in SMEM (1 MB): chunk the image
        # axis so lvl/oy/ox stay under ~850 KB per kernel call (batch 128
        # at 1000 ROIs/img otherwise overflows SMEM)
        max_rois_per_call = int(
            os.environ.get("JTSM_RESIDENT_MAX_SMEM_ROIS", (850 * 1024) // 12)
        )
        imgs_per_chunk = max(1, max_rois_per_call // rois_per_image)
        oyi = oy.astype(jnp.int32)
        oxi = (ox // ALIGN).astype(jnp.int32)
        outs = []
        for i0 in range(0, b, imgs_per_chunk):
            i1 = min(i0 + imgs_per_chunk, b)
            sl = slice(i0 * rois_per_image, i1 * rois_per_image)
            outs.append(
                _pallas_call_resident(
                    tuple(levels3d),
                    lvl[sl],
                    oyi[sl],
                    oxi[sl],
                    wy[sl],
                    wx[sl],
                    p,
                    rois_per_image,
                    h_sizes,
                    mode,
                    i0,
                )
            )
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    return _pallas_call(
        tuple(levels3d),
        lvl,
        row0.astype(jnp.int32),
        (ox // ALIGN).astype(jnp.int32),
        ybkt.astype(jnp.int32),
        wy,
        wx,
        p,
    )


def _fwd(
    features, spatial_scales, boxes, batch_indices, levels, output_size,
    sampling_ratio, rois_per_image=None,
):
    out = roi_align_multilevel_pallas(
        features, spatial_scales, boxes, batch_indices, levels, output_size,
        sampling_ratio, rois_per_image,
    )
    return out, (features, boxes, batch_indices, levels)


def _resident_geometry(shapes, spatial_scales, boxes, levels, p, s):
    """Window geometry for the resident kernels, from feature SHAPES only
    (the backward never touches feature values — ROIAlign is linear).
    MUST mirror the forward wrapper's math exactly (same bump, clamps and
    weight construction)."""
    num_levels = len(shapes)
    h_sizes = tuple(max(h, WIN) for (_, h, _, _) in shapes)
    w_pads = tuple(
        max(((w + ALIGN - 1) // ALIGN) * ALIGN, WIN) for (_, _, w, _) in shapes
    )
    hs = jnp.asarray(h_sizes, jnp.int32)
    ws_pad = jnp.asarray(w_pads, jnp.int32)
    hs_true = jnp.asarray([h for (_, h, _, _) in shapes], jnp.int32)
    ws_true = jnp.asarray([w for (_, _, w, _) in shapes], jnp.int32)
    scales = jnp.asarray(spatial_scales, jnp.float32)

    lvl = levels.astype(jnp.int32)
    usable = WIN - ALIGN + 1 - 2
    for _ in range(num_levels - 1):
        sc = scales[lvl]
        span = jnp.maximum(
            (boxes[:, 2] - boxes[:, 0]) * sc, (boxes[:, 3] - boxes[:, 1]) * sc
        )
        lvl = jnp.where((span > usable) & (lvl < num_levels - 1), lvl + 1, lvl)

    sc = scales[lvl]
    h_l = hs_true[lvl]
    w_l = ws_true[lvl]
    x0 = boxes[:, 0] * sc - 0.5
    y0 = boxes[:, 1] * sc - 0.5
    x1 = boxes[:, 2] * sc - 0.5
    y1 = boxes[:, 3] * sc - 0.5
    bin_w = (x1 - x0) / p
    bin_h = (y1 - y0) / p

    ox = jnp.clip(jnp.floor(x0).astype(jnp.int32) - 1, 0, None)
    ox = (ox // ALIGN) * ALIGN
    ox = jnp.minimum(ox, ((ws_pad[lvl] - WIN) // ALIGN) * ALIGN)
    oy = jnp.clip(jnp.floor(y0).astype(jnp.int32) - 1, 0, None)
    oy = jnp.minimum(oy, hs[lvl] - WIN)

    wy = jax.vmap(
        lambda st, bs, o, sz: _axis_weights(
            st, bs, o.astype(jnp.float32), sz.astype(jnp.float32), p, s
        )
    )(y0, bin_h, oy, h_l)
    wx = jax.vmap(
        lambda st, bs, o, sz: _axis_weights(
            st, bs, o.astype(jnp.float32), sz.astype(jnp.float32), p, s
        )
    )(x0, bin_w, ox, w_l)
    return lvl, oy, (ox // ALIGN).astype(jnp.int32), wy, wx, h_sizes, w_pads


def _bwd(spatial_scales, output_size, sampling_ratio, rois_per_image, residuals, g):
    """Backward without re-running the forward. Resident-eligible calls use
    the transposed Pallas kernel (per-ROI window-grad accumulation into a
    VMEM-resident gradient pyramid — replaces XLA scatter-adds that were
    35% of the train step); otherwise ROIAlign is LINEAR in the features,
    so the exact cotangent is ``jax.linear_transpose`` of the XLA
    formulation."""
    import os

    from ..roi_align import roi_align_multilevel

    features, boxes, batch_indices, levels = residuals
    zeros_like = lambda x: jnp.zeros_like(x)
    nondiff_zeros = (
        jax.tree_util.tree_map(zeros_like, boxes),
        jax.tree_util.tree_map(zeros_like, batch_indices),
        jax.tree_util.tree_map(zeros_like, levels),
    )

    r = boxes.shape[0]
    b = features[0].shape[0]
    c = features[0].shape[-1]
    p = output_size
    s = max(sampling_ratio, 1)
    shapes = tuple(tuple(f.shape) for f in features)
    h_sizes = tuple(max(h, WIN) for (_, h, _, _) in shapes)
    w_pads = tuple(
        max(((w + ALIGN - 1) // ALIGN) * ALIGN, WIN) for (_, _, w, _) in shapes
    )
    pyramid_bytes = sum(
        h_sizes[l] * w_pads[l] * c * features[l].dtype.itemsize
        for l in range(len(features))
    )
    mode = os.environ.get("JTSM_RESIDENT_MODE", "yfirst_bf16_copy")
    if (
        mode not in ("", "off")
        and rois_per_image is not None
        and r == b * rois_per_image
        and pyramid_bytes <= RESIDENT_VMEM_BUDGET
    ):
        lvl, oy, ox_div, wy, wx, h_sizes, w_pads = _resident_geometry(
            shapes, spatial_scales, boxes, levels, p, s
        )
        dout = g.astype(features[0].dtype)
        max_rois_per_call = int(
            os.environ.get("JTSM_RESIDENT_MAX_SMEM_ROIS", (850 * 1024) // 12)
        )
        imgs_per_chunk = max(1, max_rois_per_call // rois_per_image)
        chunk_outs = []
        for i0 in range(0, b, imgs_per_chunk):
            i1 = min(i0 + imgs_per_chunk, b)
            sl = slice(i0 * rois_per_image, i1 * rois_per_image)
            chunk_outs.append(
                _pallas_call_resident_bwd(
                    dout[sl],
                    lvl[sl],
                    oy.astype(jnp.int32)[sl],
                    ox_div[sl],
                    wy[sl],
                    wx[sl],
                    p,
                    rois_per_image,
                    h_sizes,
                    w_pads,
                    mode,
                    features[0].dtype,
                )
            )
        dfeats = []
        for l, (bs, h, w, _) in enumerate(shapes):
            parts = [co[l] for co in chunk_outs]
            flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            df = flat.reshape(bs, h_sizes[l], w_pads[l], c)[:, :h, :w, :]
            dfeats.append(df)
        dfeats = tuple(dfeats) if isinstance(features, tuple) else list(dfeats)
        return (dfeats,) + nondiff_zeros

    lvl = _bumped_levels(features, spatial_scales, boxes, levels)

    def ref(feats):
        return roi_align_multilevel(
            tuple(feats),
            tuple(spatial_scales),
            boxes,
            batch_indices,
            lvl,
            output_size,
            sampling_ratio,
            True,
        )

    ref_shapes = [jax.ShapeDtypeStruct(f.shape, f.dtype) for f in features]
    transpose = jax.linear_transpose(ref, list(ref_shapes))
    (dfeats,) = transpose(g.astype(features[0].dtype))
    if isinstance(features, tuple):
        dfeats = tuple(dfeats)
    return (dfeats,) + nondiff_zeros


roi_align_multilevel_pallas.defvjp(_fwd, _bwd)
