"""Pallas TPU kernels for inverse warping.

Why: inverse warping (SURVEY.md §2b(i), the reference's custom CUDA
layer) is gather-bound on TPU — XLA lowers image-wide gathers at ~30 ns
per index (scalar-unit bound), ~11 ms for a batch-4 608x160 RGB warp,
making the warp (not convolution) the hot op of training. Mosaic's
``tpu.dynamic_gather`` does an 8x128 *vector* gather per VPU op but only
along one axis within a single vreg, so efficient kernels must
decompose the gather. A general 2D bilinear gather does NOT decompose
into one vertical then one horizontal vector gather (the second gather
evaluates the first coordinate at the wrong column), which shapes the
two kernels here:

1. **Rectified-stereo warp** (``stereo_warp``): v(y,x) == y exactly, so
   the warp is a per-row horizontal resample — lane-block gathers with a
   static disparity bound. Forward AND both backwards are kernels (the
   d/d_src scatter becomes a shift-select sum thanks to the bound).
   Used by the stereo photometric loss in every stage at every scale.
   Measured ~9x XLA fwd+bwd, bit-exact.

2. **General warp, frozen source** (``general_warp_frozen_src``): per-
   SOURCE-ROW candidates — for window row r, the horizontal resample
   H_r[i,j] = lerp(table[r, u0[i,j]]) is keyed entirely at the output
   pixel, and bilinear vertical taps select rows with v0==r / v0+1==r.
   Candidates are @pl.when-predicated (a handful fire per row-tile for
   rigid motion). The temporal/feature losses warp CONSTANT sources, so
   no scatter-shaped d/d_src exists; the forward also accumulates the
   two gradient factors (dout/du, dout/dv), making the backward pure
   elementwise XLA — no second gather kernel. f32-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from depthvo_tpu.geometry import warp as ref_warp

TILE_ROWS = 8  # f32 sublane count
LANE = 128

# When True, pallas_call runs in interpret mode (pure-Python reference
# execution of the kernel bodies) — lets CI exercise the actual kernel
# logic on the CPU test mesh instead of only the jnp fallback. Flipped by
# tests; never set in production paths.
INTERPRET = False


def _pallas_call(*args, **kwargs):
    return pl.pallas_call(*args, interpret=INTERPRET, **kwargs)


def supported(src, depth=None) -> bool:
    """Kernel preconditions (any 4D NHWC image works — H/W are padded)."""
    return src.ndim == 4


# --------------------------------------------------------------------------
# Disparity-bounded stereo sampling with full Pallas forward AND backward.
#
# For the stereo loss, disparity = j - u is known to lie in [0, dmax]
# (dmax = fx*baseline * max inverse depth; the DepthNet bounds inverse
# depth, so dmax is a static config-derived constant). That bound buys:
#   * forward: each output lane-block only reads from itself and the
#     ceil(dmax/128) blocks to its left — 2 combos instead of 25.
#   * backward d/d_src WITHOUT scatter: source column x only receives
#     gradient from output columns j in [x, x + dmax + 1], so
#     d_src[x] = sum_s rolled(g * w, s) over s in [0, dmax+1] — rolls and
#     selects only, fully vectorized (XLA's scatter lowering is
#     scalar-bound on TPU, just like gather).
#   * backward d/d_u as a bounded gather: d_u = sum_c g_c * (s1_c - s0_c).
#
# Gradient semantics match the reference bilinear sampler on pixels whose
# true disparity is in [0, dmax]; out-of-range (invalid / behind-bound)
# taps drop their gradient — the losses mask those pixels, so their
# cotangent is zero anyway.
# --------------------------------------------------------------------------


def _bounded_taps(rows, rows_r, u0, ob, n_back, n_blocks):
    """Gather taps s0, s1 for output lane-block ``ob`` reading only blocks
    [ob - n_back, ob]. rows/rows_r: (8, W); u0: (8, W) int32."""
    lo = ob * LANE
    idx = u0[:, lo : lo + LANE]
    s0 = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
    s1 = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
    for tb in range(max(0, ob - n_back), ob + 1):
        tlo = tb * LANE
        sel = (idx >= tlo) & (idx < tlo + LANE)
        local = (idx - tlo) & (LANE - 1)
        g0 = jnp.take_along_axis(rows[:, tlo : tlo + LANE], local, axis=1)
        g1 = jnp.take_along_axis(rows_r[:, tlo : tlo + LANE], local, axis=1)
        s0 = jnp.where(sel, g0, s0)
        s1 = jnp.where(sel, g1, s1)
    return s0, s1


def _stereo_fwd_kernel(src_ref, u_ref, out_ref, *, n_back):
    """src_ref is the (C, TILE_ROWS, W) block of the CURRENT tile row —
    the stereo warp is epipolar-horizontal (v == y exactly), so each
    output tile reads only its own source rows. Keeping the block
    tile-sized (instead of the whole image) bounds VMEM at ~C*8*W floats
    and lets the pipeline stream source rows alongside coordinates."""
    C = src_ref.shape[0]
    W = src_ref.shape[2]
    u = u_ref[:]
    u0f = jnp.floor(u)
    au = u - u0f
    u0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 1)
    n_blocks = W // LANE
    for c in range(C):
        rows = src_ref[c, :, :]
        rows_r = pltpu.roll(rows, shift=W - 1, axis=1)
        for ob in range(n_blocks):
            lo = ob * LANE
            s0, s1 = _bounded_taps(rows, rows_r, u0, ob, n_back, n_blocks)
            out_ref[c, :, lo : lo + LANE] = (
                (1.0 - au[:, lo : lo + LANE]) * s0 + au[:, lo : lo + LANE] * s1
            )


def _stereo_bwd_u_kernel(src_ref, g_ref, u_ref, out_ref, *, n_back):
    """d_u[i,j] = sum_c g[c,i,j] * (s1[c,i,j] - s0[c,i,j])."""
    C = src_ref.shape[0]
    W = src_ref.shape[2]
    u = u_ref[:]
    u0f = jnp.floor(u)
    u0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 1)
    n_blocks = W // LANE
    acc = jnp.zeros((TILE_ROWS, W), jnp.float32)
    for c in range(C):
        rows = src_ref[c, :, :]
        rows_r = pltpu.roll(rows, shift=W - 1, axis=1)
        g = g_ref[c, :, :]
        parts = []
        for ob in range(n_blocks):
            lo = ob * LANE
            s0, s1 = _bounded_taps(rows, rows_r, u0, ob, n_back, n_blocks)
            parts.append(g[:, lo : lo + LANE] * (s1 - s0))
        acc = acc + jnp.concatenate(parts, axis=1)
    out_ref[:, :] = acc


def _stereo_bwd_src_kernel(g_ref, u_ref, out_ref, *, dmax):
    """Scatter-free d_src: d_src[c,i,x] = sum_{s=0}^{dmax+1} g[c,i,x+s] *
    ((1-au)[x+s] * [u0[x+s]==x] + au[x+s] * [u0[x+s]==x-1])."""
    C = g_ref.shape[0]
    W = g_ref.shape[2]
    u = u_ref[:]
    u0f = jnp.floor(u)
    au = u - u0f
    u0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, W), dimension=1)

    # Precompute channel-independent shift weights W_s (g is the only
    # channel-dependent factor). Shifts are capped at W - 1: a roll by
    # s >= W wraps around and would alias gradient from the far edge
    # (u0[x+s-W] == x fires for disparity s - W when dmax + 2 > W).
    n_shifts = min(dmax + 2, W)
    weights = []
    for s in range(n_shifts):
        u0_s = pltpu.roll(u0, shift=(W - s) % W, axis=1)
        au_s = pltpu.roll(au, shift=(W - s) % W, axis=1)
        w = jnp.where(u0_s == cols, 1.0 - au_s, 0.0) + jnp.where(
            u0_s == cols - 1, au_s, 0.0
        )
        weights.append(w)

    for c in range(C):
        g = g_ref[c, :, :]
        acc = jnp.zeros((TILE_ROWS, W), jnp.float32)
        for s in range(n_shifts):
            g_s = pltpu.roll(g, shift=(W - s) % W, axis=1)
            acc = acc + g_s * weights[s]
        out_ref[c, :, :] = acc


def _pad_hw(x, Hp, Wp, H, W, mode="constant"):
    """Pad the trailing (H, W) dims up to the tile grid.

    ``mode="edge"`` matters for the general kernel's COORDINATE planes:
    zero-padding them makes every padded lane carry v=0, which fires the
    candidate-row probe for rows 0/1 in EVERY tile (KITTI 608 is not a
    multiple of 128, so ~25% of lanes are padding) — pure wasted gather
    work. Edge replication gives padded lanes the same v as a real
    neighbor in their tile, so no row fires that would not fire anyway;
    padded outputs are sliced off regardless.
    """
    if (Hp, Wp) == (H, W):
        return x
    pads = [(0, 0)] * (x.ndim - 2) + [(0, Hp - H), (0, Wp - W)]
    return jnp.pad(x, pads, mode=mode)


def _stereo_sample_chw_impl(src_chw, u, dmax):
    """Forward kernel launch. src_chw (B,C,H,W) f32; u (B,H,W) f32."""
    B, C, H, W = src_chw.shape
    Wp = -(-W // LANE) * LANE
    Hp = -(-H // TILE_ROWS) * TILE_ROWS
    srcp = _pad_hw(src_chw.astype(jnp.float32), Hp, Wp, H, W)
    up = _pad_hw(jnp.clip(u, 0.0, W - 1), Hp, Wp, H, W)
    n_back = -(-dmax // LANE)
    kernel = functools.partial(_stereo_fwd_kernel, n_back=n_back)
    out = _pallas_call(
        kernel,
        grid=(B, Hp // TILE_ROWS),
        in_specs=[
            pl.BlockSpec((None, C, TILE_ROWS, Wp), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TILE_ROWS, Wp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, C, TILE_ROWS, Wp), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp, Wp), jnp.float32),
    )(srcp, up)
    return out[:, :, :H, :W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _stereo_sample_chw(src_chw, u, dmax):
    """Kernel-layout stereo sample: (B,C,H,W) f32 in and out.

    The custom-VJP boundary sits HERE (not at the NHWC wrapper) so
    callers that keep the loss region in the kernel's CHW layout pay
    zero layout conversions in either direction (program hygiene; the
    measured end-to-end step is unchanged — see compute_losses)."""
    return _stereo_sample_chw_impl(src_chw, u, dmax)


def _stereo_sample_chw_fwd(src_chw, u, dmax):
    return _stereo_sample_chw_impl(src_chw, u, dmax), (src_chw, u)


def _stereo_sample_chw_bwd(dmax, res, g):
    src_chw, u = res
    B, C, H, W = src_chw.shape
    Wp = -(-W // LANE) * LANE
    Hp = -(-H // TILE_ROWS) * TILE_ROWS
    n_back = -(-dmax // LANE)
    # g arrives masked by the loss; pad region cotangent is zero.
    g_chw = _pad_hw(g.astype(jnp.float32), Hp, Wp, H, W)
    up = _pad_hw(jnp.clip(u, 0.0, W - 1), Hp, Wp, H, W)
    srcp = _pad_hw(src_chw.astype(jnp.float32), Hp, Wp, H, W)

    d_u = _pallas_call(
        functools.partial(_stereo_bwd_u_kernel, n_back=n_back),
        grid=(B, Hp // TILE_ROWS),
        in_specs=[
            pl.BlockSpec((None, C, TILE_ROWS, Wp), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, C, TILE_ROWS, Wp), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TILE_ROWS, Wp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, TILE_ROWS, Wp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
    )(srcp, g_chw, up)[:, :H, :W]

    d_src = _pallas_call(
        functools.partial(_stereo_bwd_src_kernel, dmax=dmax),
        grid=(B, Hp // TILE_ROWS),
        in_specs=[
            pl.BlockSpec((None, C, TILE_ROWS, Wp), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TILE_ROWS, Wp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, C, TILE_ROWS, Wp), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp, Wp), jnp.float32),
    )(g_chw, up)[:, :, :H, :W]
    return d_src.astype(src_chw.dtype), d_u


_stereo_sample_chw.defvjp(_stereo_sample_chw_fwd, _stereo_sample_chw_bwd)


def _stereo_sample(src, u, dmax):
    """NHWC convenience wrapper: the layout transposes live OUTSIDE the
    custom-VJP core, so JAX AD transposes the cotangent automatically and
    CHW-layout callers never pay them."""
    out = _stereo_sample_chw(
        jnp.transpose(src.astype(jnp.float32), (0, 3, 1, 2)), u, dmax
    )
    return jnp.transpose(out, (0, 2, 3, 1)).astype(src.dtype)


# --------------------------------------------------------------------------
# General 2D warp with frozen source (gather-only gradients).
#
# A correct general kernel can't do one vertical then one horizontal
# vector gather (the second gather evaluates the first coordinate at the
# wrong column — see module doc). Instead, CANDIDATE VERTICAL OFFSETS:
# for candidate window row-offset `off`, H_off[i,j] = window[off+i,
# u0[i,j]] is a pure horizontal gather keyed at the output pixel, and the
# true sample selects candidates where v0[i,j] - window_start - i == off.
# For rigid driving-scene motion only a handful of candidates fire per
# row-tile, so candidates are predicated with @pl.when on an any() probe.
#
# Gradients: the temporal/feature losses warp CONSTANT sources (the other
# frame's pixels; frozen features), so no scatter-shaped d/d_src is ever
# needed — the backward is d/d_coords only. ``general_warp_frozen_src``
# therefore stops gradients to ``src`` (asserted by construction), and
# the differentiated forward emits per-channel gradient factors S/D so
# the VJP is an elementwise multiply-reduce in XLA (no second kernel).
#
# Window semantics (masked in `valid`): vertical displacement
# |v - row| <= pad_v - 1 and horizontal displacement |u - col| <= 127.
# --------------------------------------------------------------------------

GEN_PAD_V = 16  # vertical half-window (rows; MUST be a multiple of 8 —
#                 the window start and the BlockSpec row-block indices are
#                 tile-aligned). Coverage quantified in tests/test_warp_window.py.


def _gen_coords(u_ref, v_ref, s, rv, W):
    u = u_ref[:]
    v = v_ref[:]
    u0f = jnp.floor(u)
    v0f = jnp.floor(v)
    au = u - u0f
    av = v - v0f
    u0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 1)
    dv = jnp.clip(v0f.astype(jnp.int32) - s, 0, rv - 2)
    return u0, au, av, dv, dv + 1


def _gen_row_candidates(srow_refs, u0, au, dv, dv1, rv, n_blocks, consume):
    """Per-source-row candidates: for each window row r the horizontal
    resample H_r[i,j] = lerp(row_r[u0[i,j]], row_r[u0[i,j]+1]) is keyed
    entirely at the output pixel, and the true bilinear taps select rows
    with dv == r (v0 tap) / dv+1 == r (v1 tap). Decoupled from the output
    sublane index, so window clamping at image edges stays exact.

    Channel-hoisted loop nest: everything that does not depend on the
    channel — the hit predicate, the lane-block membership masks/local
    indices, and the lerp weight slices — is computed ONCE per
    (row, lane-block); the per-channel work is the candidate-row
    broadcast + rotate, the two data gathers, and the consume
    accumulation. Measured effect (v5e-1, fwd+bwd): modest — 4.69 -> 4.50
    ms at C=3, 14.6 -> 14.0 ms at C=19; the per-channel gathers dominate,
    so kernel cost stays ~linear in C (see ops.frozen_warp's
    channel-width note for the XLA crossover discussion).

    ``srow_refs``: rv//8 window row-block refs of shape (C, 8, W) — row r
    lives at srow_refs[r // 8][:, r % 8, :].
    ``consume(c, h, slope, sel0, sel1, ob)`` receives, per channel and
    output lane-block, the interped row values, the horizontal lerp slope
    (s1-s0), and the two vertical-tap selectors (float masks).
    """
    C = srow_refs[0].shape[0]
    W = srow_refs[0].shape[2]
    # dv in [0, rv-2], dv1 in [1, rv-1]: candidates span all rv rows.
    for r in range(rv):
        hit = jnp.any(dv == r) | jnp.any(dv1 == r)

        @pl.when(hit)
        def _(r=r):
            bi, ri = r // TILE_ROWS, r % TILE_ROWS
            # Channel-independent prep, once per (row, lane-block).
            prep = []
            for ob in range(n_blocks):
                lo = ob * LANE
                idx = u0[:, lo : lo + LANE]
                a = au[:, lo : lo + LANE]
                sel0 = (dv[:, lo : lo + LANE] == r).astype(jnp.float32)
                sel1 = (dv1[:, lo : lo + LANE] == r).astype(jnp.float32)
                # |du| <= 127: taps live in blocks [ob-1, ob+1].
                tbs = list(range(max(0, ob - 1), min(n_blocks, ob + 2)))
                sels = []
                locs = []
                for tb in tbs:
                    tlo = tb * LANE
                    sels.append((idx >= tlo) & (idx < tlo + LANE))
                    locs.append((idx - tlo) & (LANE - 1))
                prep.append((ob, a, sel0, sel1, tbs, sels, locs))
            for c in range(C):
                rows = srow_refs[bi][c, :, :]
                blk = jnp.broadcast_to(rows[ri : ri + 1, :], (TILE_ROWS, W))
                blk_r = pltpu.roll(blk, shift=W - 1, axis=1)
                for ob, a, sel0, sel1, tbs, sels, locs in prep:
                    s0 = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
                    s1 = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
                    for tb, sel, local in zip(tbs, sels, locs):
                        tlo = tb * LANE
                        s0 = jnp.where(
                            sel,
                            jnp.take_along_axis(
                                blk[:, tlo : tlo + LANE], local, axis=1
                            ),
                            s0,
                        )
                        s1 = jnp.where(
                            sel,
                            jnp.take_along_axis(
                                blk_r[:, tlo : tlo + LANE], local, axis=1
                            ),
                            s1,
                        )
                    h = (1.0 - a) * s0 + a * s1
                    consume(c, h, s1 - s0, sel0, sel1, ob)


def _gen_band_candidates(srow_refs, u0, au, dv, dv1, rv, n_blocks, consume):
    """Per-offset (band) candidates — the gather-count-minimal dual of
    ``_gen_row_candidates``. NOT the default: measured neutral-to-slower
    on v5e (see GEN_VARIANT note above / PERF.md) because per-candidate
    vector work, not gather issues, binds the kernel.

    The row variant's hit count is lower-bounded by ~TILE_ROWS for ANY
    flow: dv tracks the output sublane (dv ≈ i + flow), so an 8-row tile
    always fires ≥8 source-row candidates even for identity motion. The
    band variant enumerates the OFFSET q = dv - i instead: for smooth
    rigid-scene flow q is nearly constant across a tile, so only
    ~(1 + flow spread) + 1 candidates fire (the +1 is the v1 tap at
    q+1). Same per-candidate gather work, ~3-4x fewer fired candidates.
    Bit-exact vs the row variant on TPU (same taps in the same
    accumulation order per output pixel: the v0 tap fires at q0=dv-i,
    the v1 tap one candidate later at q0+1, exactly as rows fire dv
    before dv1=dv+1); in CPU interpret mode FMA association across the
    two graph shapes differs by ≤2.4e-7.

    For fired q, the candidate surface is the BAND band[i,:] =
    window_row(q+i) — 8 consecutive window rows starting at q, built
    from the two spanning row-blocks with a static sublane slice (q is a
    Python loop constant). The horizontal resample H_q[i,j] =
    lerp(band[i, u0[i,j]]) is keyed at the output pixel exactly like the
    row variant's broadcast row, and taps select with dv-i == q (v0) /
    dv1-i == q (v1). Sublanes whose band row falls outside [0, rv-1]
    read a wrapped (real, finite) row from the stacked blocks and are
    provably never selected: dv ≥ 0 and dv1 ≤ rv-1 bound the selectable
    band rows.

    (A per-output-block ``@pl.when`` gate inside the candidate body was
    tried and REMOVED: C*n_blocks scalar branches per fired candidate
    cost more than the skipped vector work — see PERF.md's band-vs-rows
    A/B notes.)
    """
    C = srow_refs[0].shape[0]
    W = srow_refs[0].shape[2]
    nv = rv // TILE_ROWS
    ii = jax.lax.broadcasted_iota(jnp.int32, dv.shape, dimension=0)
    q0 = dv - ii  # in [-(TILE_ROWS-1), rv-2]
    q1 = dv1 - ii  # = q0 + 1
    for q in range(-(TILE_ROWS - 1), rv):
        hit = jnp.any(q0 == q) | jnp.any(q1 == q)

        @pl.when(hit)
        def _(q=q):
            b0 = max(0, min(q // TILE_ROWS, nv - 1))
            b1 = min(b0 + 1, nv - 1)
            sh = q - b0 * TILE_ROWS  # in [-(TILE_ROWS-1), TILE_ROWS-1]
            # Channel-independent prep, once per (q, lane-block).
            prep = []
            for ob in range(n_blocks):
                lo = ob * LANE
                idx = u0[:, lo : lo + LANE]
                a = au[:, lo : lo + LANE]
                sel0 = (q0[:, lo : lo + LANE] == q).astype(jnp.float32)
                sel1 = (q1[:, lo : lo + LANE] == q).astype(jnp.float32)
                # |du| <= 127: taps live in blocks [ob-1, ob+1].
                tbs = list(range(max(0, ob - 1), min(n_blocks, ob + 2)))
                sels = []
                locs = []
                for tb in tbs:
                    tlo = tb * LANE
                    sels.append((idx >= tlo) & (idx < tlo + LANE))
                    locs.append((idx - tlo) & (LANE - 1))
                prep.append((ob, a, sel0, sel1, tbs, sels, locs))
            for c in range(C):
                stacked = jnp.concatenate(
                    [srow_refs[b0][c, :, :], srow_refs[b1][c, :, :]], axis=0
                )
                if sh == 0:
                    band = srow_refs[b0][c, :, :]
                elif sh > 0:
                    band = stacked[sh : sh + TILE_ROWS, :]
                else:
                    band = jnp.concatenate(
                        [stacked[2 * TILE_ROWS + sh :, :],
                         stacked[: TILE_ROWS + sh, :]],
                        axis=0,
                    )
                band_r = pltpu.roll(band, shift=W - 1, axis=1)
                for ob, a, sel0, sel1, tbs, sels, locs in prep:
                    s0 = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
                    s1 = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
                    for tb, sel, local in zip(tbs, sels, locs):
                        tlo = tb * LANE
                        s0 = jnp.where(
                            sel,
                            jnp.take_along_axis(
                                band[:, tlo : tlo + LANE], local, axis=1
                            ),
                            s0,
                        )
                        s1 = jnp.where(
                            sel,
                            jnp.take_along_axis(
                                band_r[:, tlo : tlo + LANE], local, axis=1
                            ),
                            s1,
                        )
                    h = (1.0 - a) * s0 + a * s1
                    consume(c, h, s1 - s0, sel0, sel1, ob)


# Candidate enumeration strategy for the general kernel: "rows"
# (per-source-row, DEFAULT) or "band" (per-offset). The band variant
# fires 3-4x fewer candidates, but the 2026-08-19 TPU A/B showed the
# kernel is bound by per-candidate VPU vector work, not gather count:
# band is timing-noise-level faster at small motion (1.04-1.07x) and up
# to 2x slower at large motion x C=19 (band construction costs
# C x (concat+slice+roll) per fired candidate vs one broadcast). Kept
# bit-exact-equivalent (tests/test_warp_pallas_interpret.py) as the
# documented negative result — see PERF.md "candidate-enumeration A/B".
GEN_VARIANT = "rows"


def _gen_fwd_kernel(*refs, rv, pad_v, Hp, emit_grad_aux, variant=None):
    """Window source blocks: the kernel receives rv//8 row-blocks of the
    source (shifted per-tile via the BlockSpec index maps) instead of the
    whole image — VMEM per buffer is C*rv*W floats, not C*H*W, which
    keeps the 19-channel fused RGB+feature payload far below the scoped
    VMEM limit and streams only the reachable window from HBM.

    ``emit_grad_aux``: also accumulate the two per-channel gradient
    factors alongside the output —

        S[c] = slope_dv*(1-av) + slope_dv1*av      (d out[c] / d u)
        D[c] = h_dv1 - h_dv                        (d out[c] / d v)

    so the custom-VJP backward is PURE elementwise XLA (d_u = sum_c g*S,
    d_v = sum_c g*D) with no second gather kernel. The accumulations
    reuse the per-candidate h/slope the forward already computed — two
    extra FMAs per candidate vs re-running every candidate gather in a
    backward kernel, which the train-step trace showed costing as much
    as the forward (~4.3 ms/step at C=19, 13% of the whole step)."""
    nv = rv // TILE_ROWS
    srow_refs = refs[:nv]
    u_ref, v_ref = refs[nv], refs[nv + 1]
    if emit_grad_aux:
        out_ref, s_ref, d_ref = refs[nv + 2], refs[nv + 3], refs[nv + 4]
    else:
        out_ref = refs[nv + 2]
    C = srow_refs[0].shape[0]
    W = srow_refs[0].shape[2]
    t = pl.program_id(1)
    s = pl.multiple_of(jnp.clip(t * TILE_ROWS - pad_v, 0, Hp - rv), TILE_ROWS)
    u0, au, av, dv, dv1 = _gen_coords(u_ref, v_ref, s, rv, W)
    n_blocks = W // LANE
    for c in range(C):
        out_ref[c, :, :] = jnp.zeros((TILE_ROWS, W), jnp.float32)
        if emit_grad_aux:
            s_ref[c, :, :] = jnp.zeros((TILE_ROWS, W), jnp.float32)
            d_ref[c, :, :] = jnp.zeros((TILE_ROWS, W), jnp.float32)

    def consume(c, h, slope, sel0, sel1, ob):
        lo = ob * LANE
        a_v = av[:, lo : lo + LANE]
        w_v = (1.0 - a_v) * sel0 + a_v * sel1
        out_ref[c, :, lo : lo + LANE] += h * w_v
        if emit_grad_aux:
            s_ref[c, :, lo : lo + LANE] += slope * w_v
            d_ref[c, :, lo : lo + LANE] += h * (sel1 - sel0)

    enumerate_candidates = (
        _gen_band_candidates
        if (variant or GEN_VARIANT) == "band"
        else _gen_row_candidates
    )
    enumerate_candidates(srow_refs, u0, au, dv, dv1, rv, n_blocks, consume)


def _gen_specs(B, C, Hp, Wp, pad_v):
    """Input specs: rv//8 source row-block views (the k-th maps to window
    block-row clip(t - pad_v/8, 0, (Hp-rv)/8) + k — same start the kernel
    recomputes as ``s``), then the per-tile coordinate planes."""
    rv = 2 * pad_v + TILE_ROWS
    nv = rv // TILE_ROWS
    pv8 = pad_v // TILE_ROWS
    sb_max = (Hp - rv) // TILE_ROWS

    def srow_spec(k):
        return pl.BlockSpec(
            (None, C, TILE_ROWS, Wp),
            lambda b, t, k=k: (b, 0, jnp.clip(t - pv8, 0, sb_max) + k, 0),
            memory_space=pltpu.VMEM,
        )

    srow_specs = [srow_spec(k) for k in range(nv)]
    tile_spec = pl.BlockSpec((None, TILE_ROWS, Wp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    ctile_spec = pl.BlockSpec((None, C, TILE_ROWS, Wp), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM)
    return srow_specs, tile_spec, ctile_spec


def _gen_sample_chw_impl(src_chw, u, v, pad_v, emit_grad_aux=False,
                         variant=None):
    B, C, H, W = src_chw.shape
    Wp = -(-W // LANE) * LANE
    Hp = -(-H // TILE_ROWS) * TILE_ROWS
    rv = 2 * pad_v + TILE_ROWS
    srcp = _pad_hw(src_chw.astype(jnp.float32), Hp, Wp, H, W)
    up = _pad_hw(jnp.clip(u, 0.0, W - 1), Hp, Wp, H, W, mode="edge")
    vp = _pad_hw(jnp.clip(v, 0.0, H - 1), Hp, Wp, H, W, mode="edge")
    srow_specs, tile_spec, ctile_spec = _gen_specs(B, C, Hp, Wp, pad_v)
    ctile_shape = jax.ShapeDtypeStruct((B, C, Hp, Wp), jnp.float32)
    n_out = 3 if emit_grad_aux else 1
    outs = _pallas_call(
        functools.partial(
            _gen_fwd_kernel,
            rv=rv,
            pad_v=pad_v,
            Hp=Hp,
            emit_grad_aux=emit_grad_aux,
            variant=variant,
        ),
        grid=(B, Hp // TILE_ROWS),
        in_specs=[*srow_specs, tile_spec, tile_spec],
        out_specs=tuple([ctile_spec] * n_out) if emit_grad_aux else ctile_spec,
        out_shape=tuple([ctile_shape] * n_out) if emit_grad_aux else ctile_shape,
    )(*([srcp] * len(srow_specs)), up, vp)
    if emit_grad_aux:
        out, s_aux, d_aux = outs
        # S/D stay in padded CHW kernel layout: the backward contraction
        # consumes them there (no transposes anywhere on the CHW path).
        return out[:, :, :H, :W], s_aux, d_aux
    return outs[:, :, :H, :W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gen_sample_chw(src_chw, u, v, pad_v):
    """Kernel-layout general sample: (B,C,H,W) f32 in and out. The
    custom-VJP boundary sits here so CHW-layout callers pay no layout
    conversions (see _stereo_sample_chw)."""
    return _gen_sample_chw_impl(src_chw, u, v, pad_v)


def _gen_sample_chw_fwd(src_chw, u, v, pad_v):
    warped, s_aux, d_aux = _gen_sample_chw_impl(
        src_chw, u, v, pad_v, emit_grad_aux=True
    )
    # src rides along for shape/dtype only (zeros_like cotangent); it is
    # the frozen source image/feature map, alive in the loss graph anyway.
    return warped, (src_chw, s_aux, d_aux)


def _gen_sample_chw_bwd(pad_v, res, g):
    """Pure-XLA backward from the forward's accumulated factors:
    d_u = sum_c g[c] * S[c], d_v = sum_c g[c] * D[c] — a fused
    elementwise-multiply-reduce, no second gather kernel (see
    _gen_fwd_kernel's emit_grad_aux note for the trace numbers)."""
    src_chw, s_aux, d_aux = res
    B, C, H, W = src_chw.shape
    # g: (B, C, H, W) -> padded to match the kernel-layout residuals.
    Hp, Wp = s_aux.shape[2], s_aux.shape[3]
    g_chw = _pad_hw(g.astype(jnp.float32), Hp, Wp, H, W)
    d_u = jnp.sum(g_chw * s_aux, axis=1)[:, :H, :W]
    d_v = jnp.sum(g_chw * d_aux, axis=1)[:, :H, :W]
    # Frozen source by contract: no scatter-shaped d_src is computed.
    return jnp.zeros_like(src_chw), d_u, d_v


_gen_sample_chw.defvjp(_gen_sample_chw_fwd, _gen_sample_chw_bwd)


def _gen_sample(src, u, v, pad_v):
    """NHWC convenience wrapper around the CHW custom-VJP core."""
    out = _gen_sample_chw(
        jnp.transpose(src.astype(jnp.float32), (0, 3, 1, 2)), u, v, pad_v
    )
    return jnp.transpose(out, (0, 2, 3, 1)).astype(src.dtype)


def window_mask(u, v, H: int, W: int, pad_v: int):
    """The general kernel's reach mask: True where the (u, v) sample's
    bilinear footprint lies inside the kernel's per-tile source window
    (vertical) and lane-block neighborhood (horizontal, |u - col| <= 127).

    Shared by ``general_warp_frozen_src`` (to build ``valid``) and the
    coverage-quantification tests (tests/test_warp_window.py), so the
    documented drop fractions measure exactly the shipped mask.
    """
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    rows = jax.lax.broadcasted_iota(jnp.float32, v.shape, dimension=1)
    cols = jax.lax.broadcasted_iota(jnp.float32, u.shape, dimension=2)
    rv = 2 * pad_v + TILE_ROWS
    tile = (rows // TILE_ROWS).astype(jnp.int32)
    Hp = -(-H // TILE_ROWS) * TILE_ROWS
    s = jnp.clip(tile * TILE_ROWS - pad_v, 0, Hp - rv)
    return (v0 >= s) & (v0 + 1 <= s + rv - 1) & (jnp.abs(u - cols) <= LANE - 1)


def _gen_warp_prep(depth, T, K, H, W, pad_v):
    """Shared coordinate + validity math for the general warp (both
    layouts): returns (u, v, valid)."""
    if pad_v <= 0 or pad_v % TILE_ROWS:
        raise ValueError(f"pad_v must be a positive multiple of {TILE_ROWS}, got {pad_v}")
    Hp = -(-H // TILE_ROWS) * TILE_ROWS
    if Hp < 2 * pad_v + TILE_ROWS:
        raise ValueError(
            f"padded height {Hp} < window {2 * pad_v + TILE_ROWS}; reduce pad_v"
        )
    coords, front = ref_warp.warp_coords(depth, T, K)
    u, v = coords[..., 0], coords[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    in_bounds = (u0 >= 0.0) & (u0 + 1.0 <= W - 1) & (v0 >= 0.0) & (v0 + 1.0 <= H - 1)
    valid = in_bounds & front & window_mask(u, v, H, W, pad_v)
    return u, v, valid


def general_warp_frozen_src(src, depth, T, K, pad_v: int = GEN_PAD_V):
    """General inverse warp with a FROZEN (non-differentiated) source.

    Drop-in for ``geometry.warp.inverse_warp(stop_gradient(src), ...)``:
    gradients flow to depth and pose through the sampling coordinates;
    the source image receives none (by contract — the temporal and
    frozen-feature losses warp constant sources).

    Additional mask semantics vs the reference: samples with vertical
    displacement |v - row| > pad_v - 1 or horizontal displacement
    |u - col| > 127 are invalid (windowed kernel; coverage quantified in
    tests/test_warp_window.py — 0.00% of otherwise-valid pixels dropped
    at KITTI-scale motion up to 1.6 m/frame with the default pad).
    """
    B, H, W, C = src.shape
    u, v, valid = _gen_warp_prep(depth, T, K, H, W, pad_v)
    warped = _gen_sample(jax.lax.stop_gradient(src), u, v, pad_v)
    return warped, valid


def general_warp_frozen_src_chw(src_chw, depth, T, K, pad_v: int = GEN_PAD_V):
    """``general_warp_frozen_src`` in the kernel's native (B,C,H,W)
    layout: src and the warped result are CHW f32, so a CHW loss region
    pays zero layout conversions around the custom-call (measured
    end-to-end step time is unchanged — XLA already hid them — see the
    compute_losses note; the CHW surface is kept as the kernel's native
    API). ``valid`` stays (B,H,W) as in the NHWC API."""
    B, C, H, W = src_chw.shape
    u, v, valid = _gen_warp_prep(depth, T, K, H, W, pad_v)
    warped = _gen_sample_chw(jax.lax.stop_gradient(src_chw), u, v, pad_v)
    return warped, valid


def stereo_warp(
    src: jax.Array, depth: jax.Array, fx_baseline: jax.Array, dmax: int = 128
):
    """Rectified-stereo inverse warp via the Pallas kernels.

    Samples ``src`` (the other stereo view) at u' = x - fx*b/depth — the
    projection of the target pixel through depth and the pure-x-baseline
    transform. ``fx_baseline``: scalar or (B,) fx*baseline in pixels*m/m.
    Sign convention: positive warps the RIGHT image into the LEFT view
    (matching T_lr = [I | (-b, 0, 0)] in the loss graph).

    ``dmax``: static disparity bound in pixels (fx*b * the network's max
    inverse depth). Pixels with larger disparity are masked invalid, and
    their gradient taps are dropped (the losses zero their cotangent
    anyway) — so the bound must dominate the head's reachable disparity.
    The loss graph derives it from the config per scale
    (``configs.base.stereo_dmax``, with an exceeds-reach error guard);
    the default 128 is only a safe standalone-call value for KITTI at
    608 width. The derived bound is a correctness feature: backward
    shift count scales with dmax, but at KITTI scale the measured cost
    difference vs the blanket 128 is within tunnel timing noise
    (interleaved sweep over dmax 64..144: mins all 3.4-5.5 ms).

    Returns (warped, valid) matching
    ``geometry.warp.inverse_warp(src, depth, T_lr, K)`` on valid pixels.
    Forward AND backward run as Pallas kernels (backward d_src is
    scatter-free shift-select; see the block comment above).
    """
    B, H, W, C = src.shape
    if depth.ndim == 4:
        depth = depth[..., 0]
    disparity, u = stereo_disparity_u(depth, fx_baseline, W)
    valid = stereo_valid_mask(depth, disparity, u, H, W, dmax)
    warped = _stereo_sample(src, u, dmax)
    return warped, valid


def stereo_warp_chw(
    src_chw: jax.Array, depth: jax.Array, fx_baseline, dmax: int = 128
):
    """``stereo_warp`` in the kernel's native (B,C,H,W) layout (same
    coordinate/mask semantics; see ``general_warp_frozen_src_chw`` for
    why the CHW surface exists). ``valid`` stays (B,H,W)."""
    B, C, H, W = src_chw.shape
    if depth.ndim == 4:
        depth = depth[..., 0]
    disparity, u = stereo_disparity_u(depth, fx_baseline, W)
    valid = stereo_valid_mask(depth, disparity, u, H, W, dmax)
    warped = _stereo_sample_chw(src_chw.astype(jnp.float32), u, dmax)
    return warped, valid


def stereo_disparity_u(depth: jax.Array, fx_baseline, W: int):
    """Shared stereo coordinate math: ``disparity = fx*b/depth`` and the
    horizontal sample coordinate ``u = col - disparity``.

    ONE definition used by both the kernel path (above) and the jnp
    fallback (``ops.stereo_warp``) so the two backends can never fork
    their coordinate semantics."""
    if depth.ndim == 4:
        depth = depth[..., 0]
    disparity = (
        jnp.reshape(jnp.asarray(fx_baseline, jnp.float32), (-1, 1, 1)) / depth
    )
    cols = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    return disparity, cols - disparity


def stereo_valid_mask(depth, disparity, u, H: int, W: int, dmax) -> jax.Array:
    """Shared stereo validity: 4-tap footprint in-image (the last row is
    invalid even at zero vertical weight — bilinear_sample semantics),
    positive depth, and the static disparity bound."""
    u0 = jnp.floor(u)
    rows_ok = jnp.arange(H, dtype=jnp.int32)[None, :, None] + 1 <= H - 1
    valid = (
        (u0 >= 0.0)
        & (u0 + 1.0 <= W - 1)
        & (depth > 0)
        & rows_ok
    )
    if dmax is not None:
        valid = valid & (disparity >= 0) & (disparity <= dmax)
    return valid
