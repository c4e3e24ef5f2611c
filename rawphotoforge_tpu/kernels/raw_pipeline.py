"""Fully-fused RAW pipeline kernel: mosaic -> sRGB in ONE Pallas pass.

BASELINE config 3 is the whole develop chain on a 45MP RAW: demosaic +
white balance + camera matrix + sharpen + the edit stack. Composed from
separate XLA ops that chain streams the image through HBM ~6 times
(demosaic shifts, two blur passes, the develop kernel). This kernel runs
the entire chain per VMEM tile: the mosaic is read once (with a 4-pixel
halo for the two stencil stages) and sRGB is written once — the only HBM
traffic is 1 plane in + 3 planes out.

Structure:
  * the mosaic is reflect-padded by HALO outside the kernel (one cheap
    copy) so edge tiles need no boundary logic;
  * the padded mosaic stays in ANY/HBM memory; each grid step DMAs its
    overlapping (TH+2*HALO, TW+2*HALO) window into a VMEM scratch
    (overlapping windows cannot be expressed as a BlockSpec, hence the
    manual make_async_copy — the double-buffering of consecutive windows
    is left to the hardware prefetcher since compute dominates here);
  * per tile: CFA white balance -> Malvar-He-Cutler demosaic (shift
    arithmetic on the scratch, consumes 2 halo pixels) -> camera matrix ->
    unsharp mask (radius-2 Gaussian, consumes the other 2) -> the full
    edit stack (shared code with kernels/fused.py) -> sRGB store.

Tile origins are even, so the CFA phase pattern is identical in every tile
(HALO is even too) — the phase masks are compile-time constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import DevelopParams
from ..ops import pointwise
from ..ops.demosaic import BAYER_PATTERNS
from .fused import _interpret, edit_stack, pack_curve_tables, smem_spec

HALO = 4          # 2 for the demosaic stencil + 2 for the sharpen radius
# Swept on-chip at 45MP: larger tiles win here (halo/DMA overhead
# amortizes; 64x1024 = 14.7 ms vs 21 ms at 16x512). A later interleaved
# A/B of 64x1024 vs 64x2048 under a heavily time-shared chip was
# INCONCLUSIVE (identical programs drifted 10-19 ms rep to rep; 24MP
# medians mildly favored 2048, 45MP medians favored 1024), so the
# quieter-session 64x1024 stands; 128x2048 and 256x1024 exhaust VMEM
# (remote compile HTTP 500). Small mosaics clamp the tile to the
# (alignment-rounded) image extent below rather than padding out to it.
TILE_H = 64
TILE_W = 1024

# X-Trans variant: the residual demosaic's support is 9 pixels (7-tap NC
# of a quantity that itself needs a 7-tap NC) + 2 for sharpen; the halo
# must also be 0 mod 6 so every DMA window starts on the same 6x6 CFA
# phase (tile origins are 0 mod 6 too — see the validations below).
XT_HALO = 12
# Swept on-chip at 24MP: 48x384 17.0 ms, 48x768 13.2 ms, 96x384 13.9 ms,
# 96x768 12.6 ms (best; 192x768 / 96x1536 / 144x768 exhaust VMEM and fail
# to compile — the residual demosaic holds ~12 window-sized temporaries).
XT_TILE_H = 96     # multiple of 6 (constant 6x6 CFA phase per tile)
XT_TILE_W = 768    # multiple of lcm(128, 6): 128-aligned DMA AND phase


def _gauss_taps():
    """Radius-2 Gaussian taps — ops/sharpen's own computation (sigma=1.0,
    radius=2) so the kernel-vs-anchor sharpen equivalence can never
    drift from a duplicated constant."""
    from ..ops.sharpen import _gauss_taps as _ops_taps

    return tuple(_ops_taps(1.0, 2).tolist())


def _phase_const(pattern: str, th: int, tw: int):
    """CFA phase masks for a tile whose origin is even, built from iota
    parity in-kernel (Pallas kernels cannot capture array constants)."""
    tile = BAYER_PATTERNS[pattern]
    ys = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) % 2
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) % 2
    chan = jnp.where(
        ys == 0,
        jnp.where(xs == 0, tile[0][0], tile[0][1]),
        jnp.where(xs == 0, tile[1][0], tile[1][1]),
    )
    r_in_row0 = 0 in tile[0]
    # Static python branch, not a where over python bools (Mosaic cannot
    # truncate an i8 select result to i1).
    row_has_r = (ys == 0) if r_in_row0 else (ys != 0)
    return chan == 0, chan == 1, chan == 2, row_has_r


def _malvar(m, th, tw, pattern):
    """Malvar-He-Cutler demosaic of a padded tile ``m`` [(th+4), (tw+4)]
    -> (r, g, b) [th, tw]. Same math as ops/demosaic.demosaic_malvar."""

    def sh(dy, dx):
        return m[2 + dy : 2 + dy + th, 2 + dx : 2 + dx + tw]

    c = sh(0, 0)
    cross1 = sh(-1, 0) + sh(1, 0) + sh(0, -1) + sh(0, 1)
    diag1 = sh(-1, -1) + sh(-1, 1) + sh(1, -1) + sh(1, 1)
    ud2 = sh(-2, 0) + sh(2, 0)
    lr2 = sh(0, -2) + sh(0, 2)
    axial2 = ud2 + lr2
    ud1 = sh(-1, 0) + sh(1, 0)
    lr1 = sh(0, -1) + sh(0, 1)

    g_at_cb = (4.0 * c + 2.0 * cross1 - axial2) * 0.125
    same_row = (5.0 * c + 4.0 * lr1 - diag1 - lr2 + 0.5 * ud2) * 0.125
    same_col = (5.0 * c + 4.0 * ud1 - diag1 - ud2 + 0.5 * lr2) * 0.125
    opp = (6.0 * c + 2.0 * diag1 - 1.5 * axial2) * 0.125

    is_r, is_g, is_b, row_has_r = _phase_const(pattern, th, tw)
    g = jnp.where(is_g, c, g_at_cb)
    r = jnp.where(is_r, c,
                  jnp.where(is_g, jnp.where(row_has_r, same_row, same_col), opp))
    b = jnp.where(is_b, c,
                  jnp.where(is_g, jnp.where(row_has_r, same_col, same_row), opp))
    return r, g, b


def _xtrans_masks(oy: int, ox: int, eh: int, ew: int):
    """Float R/G/B sample masks [eh, ew] for a window whose origin sits at
    CFA phase (oy, ox) mod 6, built from iota parity (kernels cannot
    capture array constants). R and B each occupy 8 of the 36 tile sites,
    so they are built as 8-term indicator sums and G as the complement —
    20 fewer selects than mapping all 36 sites."""
    from ..ops.demosaic import XTRANS

    ys = (jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 0) + oy) % 6
    xs = (jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 1) + ox) % 6

    def sites(ch):
        acc = None
        for r in range(6):
            for c in range(6):
                if int(XTRANS[r][c]) == ch:
                    t = jnp.logical_and(ys == r, xs == c).astype(jnp.float32)
                    acc = t if acc is None else acc + t
        return acc

    mr = sites(0)
    mb = sites(2)
    return mr, 1.0 - mr - mb, mb


# The un-normalized triangle taps of ops/demosaic._NC_KERNEL_1D (NC divides
# a weighted sum by the weighted mask sum, so scale cancels — but using the
# same taps keeps the arithmetic bit-comparable to the jnp path).
_NC_TAPS = (1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0)


def _conv7y(x, eh):
    """7-tap triangle filter down the rows: [(eh+6), W] -> [eh, W]."""
    return sum(t * x[i : i + eh, :] for i, t in enumerate(_NC_TAPS))


def _conv7x(x, ew):
    """7-tap triangle filter along the columns: [H, (ew+6)] -> [H, ew]."""
    return sum(t * x[:, i : i + ew] for i, t in enumerate(_NC_TAPS))


def _xtrans(m, th, tw):
    """Directional-green residual demosaic of an X-Trans window
    ``m`` [(th + 2*XT_HALO), (tw + 2*XT_HALO)] -> (r, g, b) [th+4, tw+4]
    (2 pixels of margin remain for the sharpen stage, like _malvar).

    Same math as ops/demosaic.demosaic_cfa(method="residual") with two
    window-local simplifications, both exact for the X-Trans layout:

    * the 1-D green NC denominators are always > 0.5 (every X-Trans row
      and column holds a green within any 7-window), so the jnp path's
      2-D fallback branch is never taken and is omitted here;
    * phase masks continue periodically into the reflect-padded border
      instead of reflecting with the mosaic, so the outer <=9 px of a
      full image may differ slightly from the jnp path (interior tiles
      see true neighbors and match exactly).
    """
    # Window-coordinate offsets: output E0 at 10 (= XT_HALO - 2), the
    # green estimate E1 at 7 (E0 - 3), conv/grad support at 4 (E1 - 3),
    # gradients read mosaic one pixel further (offset 3).
    eh0, ew0 = th + 4, tw + 4          # demosaic output extent
    eh1, ew1 = th + 10, tw + 10        # g_est extent
    ehs, ews = th + 16, tw + 16        # conv-input / mask extent

    mr, mg, mb = _xtrans_masks(4, 4, ehs, ews)
    mw = m[4 : 4 + ehs, 4 : 4 + ews]

    # Directional gradient energies at E1: spread(|central difference|).
    gx = jnp.abs(m[4 : 4 + ehs, 5 : 5 + ews] - m[4 : 4 + ehs, 3 : 3 + ews])
    gy = jnp.abs(m[5 : 5 + ehs, 4 : 4 + ews] - m[3 : 3 + ehs, 4 : 4 + ews])
    sgx = _conv7x(_conv7y(gx, eh1), ew1)
    sgy = _conv7x(_conv7y(gy, eh1), ew1)

    # 1-D green NC along each axis at E1; pick the lower-gradient axis.
    prod = mw * mg
    g_h = _conv7x(prod[3 : 3 + eh1, :], ew1) / jnp.maximum(
        _conv7x(mg[3 : 3 + eh1, :], ew1), 1e-8)
    g_v = _conv7y(prod[:, 3 : 3 + ew1], eh1) / jnp.maximum(
        _conv7y(mg[:, 3 : 3 + ew1], eh1), 1e-8)
    g_est = jnp.where(sgx > sgy, g_v, g_h)

    m0 = m[10 : 10 + eh0, 10 : 10 + ew0]
    g = jnp.where(mg[6 : 6 + eh0, 6 : 6 + ew0] > 0, m0,
                  g_est[3 : 3 + eh0, 3 : 3 + ew0])

    # Chroma residual NC: (mosaic - g_est) sampled at R/B sites, spread
    # with the same triangle, added back onto the final green.
    d = m[7 : 7 + eh1, 7 : 7 + ew1] - g_est

    def chroma(mask):
        mk = mask[3 : 3 + eh1, 3 : 3 + ew1]
        num = _conv7x(_conv7y(d * mk, eh0), ew0)
        den = _conv7x(_conv7y(mk, eh0), ew0)
        est = g + num / jnp.maximum(den, 1e-8)
        return jnp.where(mask[6 : 6 + eh0, 6 : 6 + ew0] > 0, m0, est)

    return chroma(mr), g, chroma(mb)


def _blur5(x, th, tw):
    """Separable radius-2 Gaussian of padded ``x`` [(th+4), (tw+4)] -> [th, tw]."""
    t = _gauss_taps()
    rows = sum(t[k] * x[k : k + th, :] for k in range(5))          # (th, tw+4)
    return sum(t[k] * rows[:, k : k + tw] for k in range(5))        # (th, tw)


def _raw_kernel(
    scal_ref,     # SMEM (1, 4): [vignette, true_h, true_w, sharpen]
                  # (WB is applied host-side in apply_wb_mosaic; the
                  # camera matrix arrives via cam_ref)
    cam_ref,      # SMEM (3, 3) camera->sRGB matrix
    gains_ref,    # SMEM (M, 3)
    tone_ref,     # SMEM (M, 6)
    chan_ref,     # SMEM (M, 1) brightness-curve channel selector
    knots_ref,    # SMEM (M*4, S)
    coeffs_ref,   # SMEM (M*4, S*4) raw per-segment monomials
    mosaic_ref,   # ANY (Hp, Wp) padded mosaic, windows DMA'd manually
    *rest,        # [masks_ref VMEM (M-1, TH, TW) if num_masks > 1],
                  # out_ref VMEM (3, TH, TW), scratch, sem
    pattern: str,
    num_masks: int,
    num_seg: int,
    default_bright_curves: bool,
    default_oklch_curves: bool,
    identity_oklch: bool,
    full_h: int,
    full_w: int,
    tile_h: int,
    tile_w: int,
    halo: int = HALO,
):
    if num_masks > 1:
        masks_ref, out_ref, scratch_ref, sem = rest
    else:
        out_ref, scratch_ref, sem = rest
        masks_ref = None
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n_j = pl.num_programs(1)
    n_i = pl.num_programs(0)
    th, tw = tile_h, tile_w

    # Double-buffered halo-window DMA: each grid step prefetches the NEXT
    # step's window while computing its own (a serial start/wait per tile
    # leaves thousands of DMA latencies on the critical path). HBM slices
    # must be 128-aligned on the lane axis, so windows are tw + 128 wide
    # (offset tj*tw is aligned for 128-multiple tw); only the leading
    # tw + 2*HALO columns are used.
    idx = ti * n_j + tj
    slot = jax.lax.rem(idx, 2)
    nxt = jax.lax.rem(idx + 1, 2)

    def window_dma(buf_slot, i, j):
        return pltpu.make_async_copy(
            mosaic_ref.at[pl.ds(i * th, th + 2 * halo), pl.ds(j * tw, tw + 128)],
            scratch_ref.at[buf_slot],
            sem.at[buf_slot],
        )

    @pl.when(idx == 0)
    def _():
        window_dma(slot, ti, tj).start()

    nxt_idx = idx + 1
    nxt_i = jax.lax.div(nxt_idx, n_j)
    nxt_j = jax.lax.rem(nxt_idx, n_j)

    @pl.when(nxt_idx < n_i * n_j)
    def _():
        window_dma(nxt, nxt_i, nxt_j).start()

    window_dma(slot, ti, tj).wait()

    # Mosaic is already white-balanced (the wrapper applies the CFA gains
    # before reflect-padding, so mirrored border samples carry the gain of
    # their *source* site, matching ops/demosaic exactly).
    m = scratch_ref[slot, :, : tw + 2 * halo]

    # Demosaic to the inner (th+4, tw+4) region (keeps 2px for the blur).
    if pattern == "XTRANS":
        r, g, b = _xtrans(m, th, tw)
    else:
        r, g, b = _malvar(m, th + 4, tw + 4, pattern)

    # Camera -> linear sRGB.
    cr = cam_ref[0, 0] * r + cam_ref[0, 1] * g + cam_ref[0, 2] * b
    cg = cam_ref[1, 0] * r + cam_ref[1, 1] * g + cam_ref[1, 2] * b
    cb = cam_ref[2, 0] * r + cam_ref[2, 1] * g + cam_ref[2, 2] * b
    cr = jnp.clip(cr, 0.0, 1.0)
    cg = jnp.clip(cg, 0.0, 1.0)
    cb = jnp.clip(cb, 0.0, 1.0)

    # Unsharp mask (amount may be 0 -> identity), consuming the last halo.
    amt = scal_ref[0, 3]
    r = cr[2:-2, 2:-2]
    g = cg[2:-2, 2:-2]
    b = cb[2:-2, 2:-2]
    rs = jnp.maximum(r + amt * (r - _blur5(cr, th, tw)), 0.0)
    gs = jnp.maximum(g + amt * (g - _blur5(cg, th, tw)), 0.0)
    bs = jnp.maximum(b + amt * (b - _blur5(cb, th, tw)), 0.0)
    apply_s = amt != 0.0
    r = jnp.where(apply_s, rs, r)
    g = jnp.where(apply_s, gs, g)
    b = jnp.where(apply_s, bs, b)

    # ---- the edit stack (same structure as kernels/fused.py) ----
    ys = ti * th + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    xs = tj * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    hf = jnp.where(scal_ref[0, 1] > 0, scal_ref[0, 1], jnp.float32(full_h))
    wf = jnp.where(scal_ref[0, 2] > 0, scal_ref[0, 2], jnp.float32(full_w))
    r, g, b = pointwise.vignette(r, g, b, scal_ref[0, 0], hf, wf, ys, xs)

    # Mask 0 is the all-ones main mask (unconditional); regional masks
    # select per pixel (wgsl:279-308 semantics; this kernel's mask
    # stack carries regional rows only, hence the k-1 indexing). The
    # stack itself is kernels/fused.edit_stack — one home for the
    # per-mask linear + OKLCH contract both production kernels share.
    def sel_for(k):
        return None if k == 0 else masks_ref[k - 1] != 0

    r, g, b = edit_stack(r, g, b, sel_for, gains_ref, tone_ref, chan_ref,
                         knots_ref, coeffs_ref,
                         num_masks, num_seg, default_bright_curves,
                         default_oklch_curves, identity_oklch)
    out_ref[0] = r
    out_ref[1] = g
    out_ref[2] = b


@functools.partial(
    jax.jit, static_argnames=("pattern", "tile_h", "tile_w",
                              "default_bright_curves",
                              "default_oklch_curves", "identity_oklch")
)
def raw_develop_fused(
    mosaic01: jax.Array,
    wb_gains: jax.Array,
    cam2srgb: jax.Array,
    params: DevelopParams,
    sharpen_amount: jax.Array,
    pattern: str = "RGGB",
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    masks: jax.Array | None = None,
    default_bright_curves: bool = False,
    default_oklch_curves: bool = False,
    identity_oklch: bool = False,
) -> jax.Array:
    """Whole-RAW-pipeline fused kernel.

    mosaic01: normalized CFA [H, W]; returns sRGB f32 [3, H, W]. With
    regional masks pass ``masks`` [M, H, W] (row 0 = main, always treated
    as all ones) matching params' mask count; the per-mask stack runs
    inside the same single pass.
    """
    from ..ops.demosaic import apply_wb_mosaic

    h, w = mosaic01.shape
    m = params.gains.shape[0]
    s = params.breaks.shape[-1]
    if identity_oklch and not default_oklch_curves:
        raise ValueError("identity_oklch requires default_oklch_curves=True")
    xtrans = pattern == "XTRANS"
    if xtrans and (tile_h, tile_w) == (TILE_H, TILE_W):
        # The Bayer defaults violate the 6-periodicity constraints below;
        # swap in the X-Trans tile geometry unless the caller chose one.
        tile_h, tile_w = XT_TILE_H, XT_TILE_W
    if not xtrans:
        # Clamp to the alignment-rounded image extent so a small mosaic
        # (fixtures, previews) doesn't pad its working area out to the
        # large default tile: width to the next multiple of 128 (DMA lane
        # alignment), height to the next even row (CFA phase).
        tile_w = min(tile_w, -(-max(w, 128) // 128) * 128)
        tile_h = min(tile_h, max(2, h + (h % 2)))
    halo = XT_HALO if xtrans else HALO
    if tile_w % 128 != 0:
        # The double-buffered HBM DMA reads tw+128-wide windows at offset
        # tj*tw; lane slices must be 128-aligned (CLAUDE.md).
        raise ValueError(f"tile_w must be a multiple of 128, got {tile_w}")
    if xtrans:
        # Constant 6x6 phase masks need every window origin (tile origin
        # minus halo) at phase 0; XT_HALO is 0 mod 6 already.
        if tile_h % 6 != 0 or tile_w % 6 != 0:
            raise ValueError(
                f"X-Trans tiles must be multiples of 6, got "
                f"{tile_h}x{tile_w} (tile_w needs lcm(128,6)=384)")
    elif tile_h % 2 != 0:
        # Odd tile origins would shift the CFA phase masks.
        raise ValueError(f"tile_h must be even, got {tile_h}")

    # Round the working area up to tile multiples (edge-replicated; output
    # is cropped back) so every DMA window is in bounds.
    ph = (-h) % tile_h
    pw = (-w) % tile_w
    wh, ww = h + ph, w + pw

    balanced = apply_wb_mosaic(mosaic01, pattern, wb_gains)
    if xtrans:
        # Phase-preserving border: reflect padding breaks the 6x6 CFA
        # phase (row -k mirrors row k, and -k != k mod 6), which would
        # feed wrong-channel samples into the border NC sums (full-scale
        # fringe). halo == 12 is exactly two CFA periods, so continuing
        # each edge with its OWN first/last 12 rows/cols (not the
        # opposite edge's, as mode="wrap" would) keeps every padded site
        # on its true channel while sourcing values <= 12 px away.
        padded = jnp.concatenate(
            [balanced[:halo], balanced, balanced[-halo:]], axis=0)
        padded = jnp.concatenate(
            [padded[:, :halo], padded, padded[:, -halo:]], axis=1)
    else:
        padded = jnp.pad(balanced, halo, mode="reflect")
    # Right/bottom growth: tile rounding plus the extra DMA-window width
    # (the kernel reads tw+128-wide aligned windows).
    padded = jnp.pad(padded, ((0, ph), (0, pw + 128 - 2 * halo)), mode="edge")

    knots, coeffs = pack_curve_tables(params, m, s)

    scal = jnp.stack([
        params.vignette.astype(jnp.float32).reshape(()),
        params.extent[0], params.extent[1],
        jnp.asarray(sharpen_amount, dtype=jnp.float32).reshape(()),
    ]).reshape(1, 4)

    kernel = functools.partial(
        _raw_kernel,
        pattern=pattern,
        num_masks=m,
        num_seg=s,
        default_bright_curves=default_bright_curves,
        default_oklch_curves=default_oklch_curves,
        identity_oklch=identity_oklch,
        # True dims, not the tile-rounded working dims: positional effects
        # (vignette) must normalize by the real image extent.
        full_h=h,
        full_w=w,
        tile_h=tile_h,
        tile_w=tile_w,
        halo=halo,
    )
    chan = params.bright_channel.reshape(m, 1).astype(jnp.float32)
    in_specs = [
        smem_spec((1, 4)),
        smem_spec((3, 3)),
        smem_spec((m, 3)),
        smem_spec((m, 6)),
        smem_spec((m, 1)),
        smem_spec((m * 4, s)),
        smem_spec((m * 4, s * 4)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [scal, jnp.asarray(cam2srgb, dtype=jnp.float32), params.gains,
              params.tone, chan, knots, coeffs, padded]
    if m > 1:
        if masks is None:
            raise ValueError(f"params pack {m} masks; pass masks [M, H, W]")
        regional = jnp.pad(masks[1:], ((0, 0), (0, ph), (0, pw)))
        in_specs.append(
            pl.BlockSpec((m - 1, tile_h, tile_w), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(regional)
    out = pl.pallas_call(
        kernel,
        grid=(wh // tile_h, ww // tile_w),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, tile_h, tile_w), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, wh, ww), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2 * halo, tile_w + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(*inputs)
    return out[:, :h, :w]
