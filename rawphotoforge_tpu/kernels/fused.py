"""Fused Pallas develop kernel — the TPU equivalent of the WGSL megakernel.

The reference renders each frame with one fused GPU compute pass over 16x16
workgroups (wgpu_shader.wgsl:265-337). Here the same pointwise stack runs as
one Pallas kernel over (TILE_H, TILE_W) VMEM tiles: vignette -> per-mask
(WB -> tone -> brightness curve) -> OKLCH per-mask (hue/sat/light curves) ->
sRGB encode. The lens-distortion gather stage stays outside (ops/geometry
+ dirty-stage caching) because its data-dependent coordinates do not tile.

The un-TPU-ish part of the reference is its 4 x 65536-entry i32 LUTs per
mask, gathered per pixel (wgpu_shader.wgsl:184-194). Per-pixel dynamic
gathers serialize on the VPU, so this kernel replaces each LUT with the
*curve that generated it*: the PCHIP segments are packed as per-segment
monomial coefficients (core/curve.pchip_coeffs) and evaluated
branchlessly — one compare + five lane-wise selects per segment over the
sorted knots. Indexing still quantizes to floor(v * 65535) and
results still truncate to integers, so the kernel reproduces the reference's
LUT staircase semantics, not just the smooth curve (tests gate it against
ops/develop's exact-LUT path).

Tone, vignette, and color-space math are shared with the jnp path
(ops/pointwise, core/color) — same code traced into the kernel body.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import color
from ..core.params import DevelopParams
from ..ops import pointwise
from . import ktrig

LUT_MAX = 65535.0

# Default tile: 16 sublanes x 512 lanes, f32. Counterintuitively small:
# the kernel holds ~15 live full-tile temporaries (tone chain, OKLCH
# round trip, curve accumulators), and at 256x512 those spill VMEM —
# measured 7.7 ms for a 24MP frame at 256x512 vs 4.9 ms at 16x512; a
# full-path sweep (tools/kernel_sweep.py) confirmed 16x512 still wins
# at 4.79 ms vs 4.90-5.87 ms for every other shape tried.
TILE_H = 16
TILE_W = 512
# The identity_oklch variant drops most of those temporaries (no OKLCH
# round trip), so wider tiles stop spilling and start amortizing grid
# overhead: 2.49 ms/24MP at 16x1024 vs 3.03 ms at 16x512 (same-session
# sweep); with an M=4 mask stack streaming alongside it still wins
# (3.95 vs 4.08 ms), so the wider default is safe for masked sessions
# too. Callers that don't pick a tile get this shape on that variant.
IDENTITY_TILE_W = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pack_curve_tables(params: DevelopParams, m: int, s: int):
    """Host-side (traced, tiny) packing of curve data into SMEM tables —
    ONE home for the convention both kernels (this one and
    kernels/raw_pipeline) depend on.

    Returns (knots, coeffs): knots [m*4, s] sorted positions (padded
    with 2*65536) and coeffs [m*4, s*4] the RAW per-segment monomial
    coefficients. _eval_curve SELECTS the active segment's row with
    lane-wise where() — the previous telescoped-delta formulation
    (accumulating f32 first-differences of the coefficients) suffered
    catastrophic cancellation when a narrow steep segment preceded a
    wide one (coefficient deltas ~1e9 recovering values ~1e2: up to 168
    LUT units of hue error, the seed-12 TPUFUZZ outliers the round-4
    staircase gate proved inexplicable by index flips); selection is
    exact."""
    knots = params.breaks.reshape(m * 4, s)
    coeffs = params.coeffs.reshape(m * 4, s, 4).reshape(m * 4, s * 4)
    return knots, coeffs


def smem_spec(shape):
    """BlockSpec for a whole-array SMEM table under a 2-D grid."""
    return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                        memory_space=pltpu.SMEM)


def _channel_select(ch, rk, gk, bk, rc, gc, bc):
    """Brightness-curve channel selector (v1 tone_curve_lut channel arg;
    ops/develop.py:83-89 semantics): ch 0/1/2 applies the curve to one
    RGB channel, 3 (the v4 default) to all. ``ch`` is a traced SMEM
    scalar; the {0,1}-weight blend is exact and Mosaic-safe."""
    wr = ((ch == 0.0) | (ch == 3.0)).astype(jnp.float32)
    wg = ((ch == 1.0) | (ch == 3.0)).astype(jnp.float32)
    wb = ((ch == 2.0) | (ch == 3.0)).astype(jnp.float32)
    return (rc * wr + rk * (1.0 - wr),
            gc * wg + gk * (1.0 - wg),
            bc * wb + bk * (1.0 - wb))


def _eval_curve(u, knots_ref, coeffs_ref, row, num_seg):
    """Selected packed-PCHIP evaluation at LUT-domain positions ``u``.

    The refs are per-curve SMEM tables indexed by (row, j):
    knots_ref[row, j] the sorted knot positions (padded with 2*65536)
    and coeffs_ref[row, j*4+c] the raw monomial coefficient c of segment
    j. Per segment one broadcast compare and five lane-wise selects —
    no gathers, no accumulation (the telescoped-delta form this replaces
    lost up to 168 LUT units to f32 cancellation across
    narrow-then-wide segments; selection reproduces each segment's
    coefficients EXACTLY, so the only remaining deviation from the LUT
    is the Hermite-vs-monomial evaluation round-off, ~1 LUT step). The
    loop unrolls at trace time (num_seg is static).
    """
    u = jnp.maximum(u, knots_ref[row, 0])
    a = jnp.full_like(u, coeffs_ref[row, 0])
    b = jnp.full_like(u, coeffs_ref[row, 1])
    c = jnp.full_like(u, coeffs_ref[row, 2])
    d = jnp.full_like(u, coeffs_ref[row, 3])
    x0 = jnp.full_like(u, knots_ref[row, 0])
    for j in range(1, num_seg):
        w = u >= knots_ref[row, j]
        a = jnp.where(w, coeffs_ref[row, j * 4 + 0], a)
        b = jnp.where(w, coeffs_ref[row, j * 4 + 1], b)
        c = jnp.where(w, coeffs_ref[row, j * 4 + 2], c)
        d = jnp.where(w, coeffs_ref[row, j * 4 + 3], d)
        x0 = jnp.where(w, knots_ref[row, j], x0)
    dt = u - x0
    return a + dt * (b + dt * (c + dt * d))


def _quantized_curve(v, knots, coeffs, row, num_seg, denom):
    """LUT-semantics curve application: index floor(v*65535), evaluate, then
    truncate+clamp the result like the i32 table (wgpu_shader.wgsl:184-194,
    293-305) and rescale by ``denom`` (65535 for value curves, 32767.5 for
    the sat/light gain decode, wgsl:329-330).

    The INDEX clamp is load-bearing: tone can drive a channel negative,
    and WGSL's ``u32(v * 65535)`` conversion saturates to 0 (the anchor's
    jnp.take likewise clips), so a negative input must read the curve AT
    its first knot — evaluating the first PCHIP segment's polynomial at
    dt < 0 instead extrapolates below the curve (up to slope * |v|, the
    seed-12-class TPUFUZZ outliers the round-4 staircase gate caught as
    inexplicable by any index flip)."""
    u = jnp.clip(jnp.floor(v * LUT_MAX), 0.0, LUT_MAX)
    y = _eval_curve(u, knots, coeffs, row, num_seg)
    y = jnp.clip(jnp.floor(y), 0.0, 65535.0)
    return y / denom


def edit_stack(r, g, b, sel_for, gains_ref, tone_ref, chan_ref,
               knots_ref, coeffs_ref, num_masks, num_seg,
               default_bright_curves, default_oklch_curves, identity_oklch,
               default_slots=None):
    """The per-mask edit stack: (WB -> tone -> brightness curve) per mask,
    the per-mask OKLCH hue/sat/light pass, then the sRGB encode
    (wgpu_shader.wgsl:279-336). ONE home for the contract shared by the
    two production kernels (this module's _develop_kernel and
    kernels/raw_pipeline's one-pass RAW kernel) — they differ only in how
    a mask row is fetched, injected as ``sel_for(k) -> None | bool
    tile`` (None = unconditional main-mask application). Returns the
    encoded (r, g, b) tile triple.

    ``default_slots``: optional per-mask (bright, hue, sat, light)
    default-curve booleans (static, trace-time). A slot marked default
    takes the bit-identical staircase/constant shortcut for THAT mask
    only, so a stack where e.g. just one regional mask carries a custom
    saturation curve pays exactly one packed-PCHIP sweep instead of
    4 x M (VERDICT r4 #2: M=4 cost 2x the single-mask frame because
    every mask swept every curve). The global flags remain the all-mask
    shorthand (and what identity_oklch keys off).

    NOTE (r5, measured): a tile-level mask-skip variant (each regional
    mask's chain under ``pl.when(sum(sel) > 0)`` with VMEM scratch — the
    TPU analog of the reference's per-pixel ``if mask != 1.0 continue``,
    wgsl:281) was built, proven bit-identical, and measured SLOWER on
    hardware: 8.59 vs 6.53 ms at 24 MPix/M=4 with ~12%-coverage masks
    (9.91 vs 6.37 ms scattered). The predicate reduction + scratch round
    trips + lost fusion across the branch cost more than the skipped
    arithmetic saves on the VPU — SIMT divergence has no profitable tile
    analog here, so the kernel stays unconditional."""

    def _slot_default(k, slot):
        return default_slots is not None and default_slots[k][slot]

    def _bright_chain(k, r_, g_, b_):
        """Mask k's WB -> tone -> brightness-curve values."""
        gains = (gains_ref[k, 0], gains_ref[k, 1], gains_ref[k, 2])
        rk, gk, bk = pointwise.white_balance(r_, g_, b_, gains)
        tv = tuple(tone_ref[k, i] for i in range(6))
        rk, gk, bk = pointwise.tone(rk, gk, bk, tv)
        if default_bright_curves or _slot_default(k, 0):
            # Identity-LUT staircase without evaluating the (identity)
            # curve: floor(v*65535)/65535 — bit-identical, far fewer ops.
            rc = jnp.clip(jnp.floor(rk * LUT_MAX), 0.0, LUT_MAX) / LUT_MAX
            gc = jnp.clip(jnp.floor(gk * LUT_MAX), 0.0, LUT_MAX) / LUT_MAX
            bc = jnp.clip(jnp.floor(bk * LUT_MAX), 0.0, LUT_MAX) / LUT_MAX
        else:
            row = k * 4 + 0  # brightness slot
            rc = _quantized_curve(rk, knots_ref, coeffs_ref,
                                  row, num_seg, LUT_MAX)
            gc = _quantized_curve(gk, knots_ref, coeffs_ref,
                                  row, num_seg, LUT_MAX)
            bc = _quantized_curve(bk, knots_ref, coeffs_ref,
                                  row, num_seg, LUT_MAX)
        return _channel_select(chan_ref[k, 0], rk, gk, bk, rc, gc, bc)

    for k in range(num_masks):
        sel = sel_for(k)
        if sel is None:
            r, g, b = _bright_chain(k, r, g, b)
        else:
            rk, gk, bk = _bright_chain(k, r, g, b)
            r = jnp.where(sel, rk, r)
            g = jnp.where(sel, gk, g)
            b = jnp.where(sel, bk, b)

    # Per-mask OKLCH pass (wgsl:310-331). Polynomial trig: Mosaic has no
    # atan2/sin/cos primitives. (Measured: Mosaic's native pow lowering
    # beats ktrig.cbrt_fast here — the Halley divisions and extra live
    # temporaries cost more than exp/log in this spill-sensitive kernel.)
    #
    # identity_oklch: with every hue/sat/light curve at its default, the
    # OKLCH pass only quantizes H to 1/65536 and scales C and L by
    # floor(32767)/32767.5 (= 1 - 1.5e-5) — all sub-u8-quantization.
    # Skipping the whole round trip (2 matrix pairs, 3 cbrt, atan2,
    # sincos, 3 cubes) deviates <= ~2e-3 in sRGB out (mostly the ktrig
    # round-trip error the anchor keeps; documented 3e-3 bound, gated
    # in tests/test_pallas.py) and nearly halves the slider-only frame.
    # The skip only needs the OKLCH curves default — the brightness curve
    # runs BEFORE this pass, so a custom tone curve composes with it.
    if identity_oklch:
        return (jnp.clip(color.linear_to_srgb(r), 0.0, 1.0),
                jnp.clip(color.linear_to_srgb(g), 0.0, 1.0),
                jnp.clip(color.linear_to_srgb(b), 0.0, 1.0))
    L, C, H = color.linear_srgb_to_oklch(r, g, b,
                                         atan2_turns=ktrig.atan2_turns)

    def _oklch_vals(k, H_):
        # Per-slot shortcut: the staircase hue / constant 32767/32767.5
        # gain is exactly what a default curve evaluates to (f32 division,
        # not a pre-rounded f64 constant, to stay bit-identical to the
        # general path's floor(32767)/32767.5), so each slot elides
        # independently per mask.
        if default_oklch_curves or _slot_default(k, 1):
            new_h = jnp.clip(jnp.floor(H_ * LUT_MAX), 0.0, LUT_MAX) / LUT_MAX
        else:
            new_h = _quantized_curve(H_, knots_ref, coeffs_ref,
                                     k * 4 + 1, num_seg, LUT_MAX)
        if default_oklch_curves or _slot_default(k, 2):
            sat_g = jnp.float32(32767.0) / jnp.float32(32767.5)
        else:
            sat_g = _quantized_curve(H_, knots_ref, coeffs_ref,
                                     k * 4 + 2, num_seg, 32767.5)
        if default_oklch_curves or _slot_default(k, 3):
            light_g = jnp.float32(32767.0) / jnp.float32(32767.5)
        else:
            light_g = _quantized_curve(H_, knots_ref, coeffs_ref,
                                       k * 4 + 3, num_seg, 32767.5)
        return new_h, sat_g, light_g

    for k in range(num_masks):
        sel = sel_for(k)
        if sel is None:
            new_h, sat_g, light_g = _oklch_vals(k, H)
            H, C, L = new_h, C * sat_g, L * light_g
        else:
            new_h, sat_g, light_g = _oklch_vals(k, H)
            H = jnp.where(sel, new_h, H)
            C = jnp.where(sel, C * sat_g, C)
            L = jnp.where(sel, L * light_g, L)
    r, g, b = color.oklch_to_linear_srgb(L, C, H,
                                         sincos_turns=ktrig.sincos_turns)
    return (jnp.clip(color.linear_to_srgb(r), 0.0, 1.0),
            jnp.clip(color.linear_to_srgb(g), 0.0, 1.0),
            jnp.clip(color.linear_to_srgb(b), 0.0, 1.0))


def _develop_kernel(
    vig_ref,      # SMEM (1, 4) f32: [vignette, true_h, true_w, row_offset]
    gains_ref,    # SMEM (M, 3) f32
    tone_ref,     # SMEM (M, 6) f32
    chan_ref,     # SMEM (M, 1) f32: brightness-curve channel selector
    knots_ref,    # SMEM (M*4, S) f32
    coeffs_ref,   # SMEM (M*4, S*4) f32 raw per-segment monomials
    img_ref,      # VMEM (3, TH, TW) f32
    *rest_refs,   # [masks_ref VMEM (M, TH, TW) f32 unless main_only] out_ref
    num_masks: int,
    num_seg: int,
    full_h: int,
    full_w: int,
    tile_h: int,
    tile_w: int,
    main_only: bool,
    default_bright_curves: bool,
    default_oklch_curves: bool,
    identity_oklch: bool,
    default_slots=None,
):
    if main_only:
        (out_ref,) = rest_refs
        masks_ref = None
    else:
        masks_ref, out_ref = rest_refs
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    r = img_ref[0]
    g = img_ref[1]
    b = img_ref[2]

    # Vignette (main-mask only, wgsl:276): global integer pixel coords,
    # normalized by the *true* extent when the image is bucket-padded.
    # vig_ref[0, 3] is the global row offset of this shard (0 single-chip;
    # axis_index * local_rows under shard_map — exact in f32 below 2^24).
    ys = (ti * tile_h
          + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          ).astype(jnp.float32) + vig_ref[0, 3]
    xs = tj * tile_w + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    hf = jnp.where(vig_ref[0, 1] > 0, vig_ref[0, 1], jnp.float32(full_h))
    wf = jnp.where(vig_ref[0, 2] > 0, vig_ref[0, 2], jnp.float32(full_w))
    r, g, b = pointwise.vignette(r, g, b, vig_ref[0, 0], hf, wf, ys, xs)

    # Mask 0 is the all-ones main mask by construction (lib.rs:100-113):
    # when the caller asserts main_only, the mask read and selects are
    # elided entirely.
    def sel_for(k):
        return None if (k == 0 and main_only) else masks_ref[k] != 0

    r, g, b = edit_stack(r, g, b, sel_for, gains_ref, tone_ref, chan_ref,
                         knots_ref, coeffs_ref,
                         num_masks, num_seg, default_bright_curves,
                         default_oklch_curves, identity_oklch,
                         default_slots=default_slots)
    out_ref[0] = r
    out_ref[1] = g
    out_ref[2] = b


@functools.partial(
    jax.jit,
    static_argnames=("tile_h", "tile_w", "main_mask_all_ones",
                     "default_bright_curves", "default_oklch_curves",
                     "identity_oklch", "default_curve_slots"),
)
def develop_post_geo_fused(
    planes: jax.Array,
    params: DevelopParams,
    masks: jax.Array | None,
    tile_h: int | None = None,
    tile_w: int | None = None,
    main_mask_all_ones: bool = False,
    default_bright_curves: bool = False,
    default_oklch_curves: bool = False,
    identity_oklch: bool = False,
    row_offset: jax.Array | None = None,
    default_curve_slots: tuple | None = None,
) -> jax.Array:
    """Fused-kernel version of ops.develop.develop_post_geo.

    Same signature and semantics (to curve-evaluation tolerance),
    including the brightness-curve channel selector: planes f32 [3, H, W]
    post-geometry linear image, masks f32 [M, H, W], returns
    sRGB-encoded f32 [3, H, W] in [0, 1].

    ``main_mask_all_ones``: caller-asserted invariant that mask row 0 is
    all ones (always true for editor sessions, lib.rs:100-113) — elides the
    main-mask read/selects, and with a single mask skips streaming the mask
    array entirely (~14% of HBM traffic). In that single-mask case
    ``masks`` may be ``None``, skipping the dead [1, H, W] device
    allocation too (~180 MB at 45MP).

    ``row_offset``: global row index of this block's first row — pass
    ``jax.lax.axis_index(...) * local_rows`` when running per-shard under
    shard_map so the vignette's global coordinates stay correct.

    ``default_bright_curves`` / ``default_oklch_curves``: caller-asserted
    invariants that every mask's brightness curve, respectively every
    mask's hue/sat/light curves, are the defaults (identity brightness/
    hue, constant-32767 sat/light) — the corresponding curve evaluations
    then reduce to the bare floor staircase / a constant gain,
    bit-identical to evaluating the default curves but skipping the
    packed-PCHIP sweeps. The flags are independent so the common "user is
    dragging the tone curve" state still skips the three OKLCH sweeps
    (and vice versa for hue/sat/light edits).

    ``identity_oklch`` (requires ``default_oklch_curves``): additionally
    skip the OKLCH round trip the default hue/sat/light curves barely
    perturb (H quantized to 1/65536, C and L scaled by 1 - 1.5e-5) — NOT
    bit-identical, deviates <= ~2e-3 in sRGB output (mostly the ktrig
    round-trip error the anchor keeps; documented 3e-3 bound, gated in
    tests/test_pallas.py), and nearly halves the slider-only frame time.
    A custom brightness curve composes fine with it (the brightness pass
    runs before the OKLCH stage), so tone-curve drags stay on this fast
    path.

    ``default_curve_slots``: per-mask, per-slot default-curve booleans —
    a tuple of M (bright, hue, sat, light) tuples. Each default slot
    takes the bit-identical shortcut for that mask alone, so a regional
    mask stack only pays packed-PCHIP sweeps for the curves a user
    actually edited (VERDICT r4 #2). Orthogonal to the global flags
    (which remain the all-masks shorthand).
    """
    _, h, w = planes.shape
    if masks is None:
        if not main_mask_all_ones:
            raise ValueError(
                "masks=None requires main_mask_all_ones=True (the all-ones "
                "main mask is what justifies eliding the mask array)")
        m = params.gains.shape[0]
        if m != 1:
            raise ValueError(f"masks=None requires a single mask, got {m}")
    else:
        m = masks.shape[0]
        if m != params.gains.shape[0]:
            # A stale mask stack (fewer rows: packed params silently
            # dropped; more rows: SMEM blocks read past the param
            # arrays) would mis-render with no exception — fail loudly.
            raise ValueError(
                f"masks rows ({m}) != packed mask count "
                f"({params.gains.shape[0]})")
    if identity_oklch and not default_oklch_curves:
        # Skipping the OKLCH pass is only near-exact when the hue/sat/
        # light curves are the defaults; with real curves it would drop
        # the user's edit entirely.
        raise ValueError("identity_oklch requires default_oklch_curves=True")
    if default_curve_slots is not None:
        if len(default_curve_slots) != m or any(
                len(sl) != 4 for sl in default_curve_slots):
            # A mismatched slot table would silently shortcut the wrong
            # mask's curves.
            raise ValueError(
                f"default_curve_slots needs {m} (bright, hue, sat, light) "
                f"tuples, got {default_curve_slots!r}")
    s = params.breaks.shape[-1]
    main_only = main_mask_all_ones and m == 1

    # Variant-keyed default tile (see TILE_H/IDENTITY_TILE_W comments).
    if tile_h is None:
        tile_h = TILE_H
    if tile_w is None:
        tile_w = IDENTITY_TILE_W if identity_oklch else TILE_W
    tile_h = min(tile_h, max(8, h))
    tile_w = min(tile_w, max(128, w))

    knots, coeffs = pack_curve_tables(params, m, s)
    off = (jnp.zeros(1, jnp.float32) if row_offset is None
           else jnp.asarray(row_offset, jnp.float32).reshape(1))
    vig = jnp.concatenate(
        [params.vignette.reshape(1), params.extent.reshape(2), off]
    ).reshape(1, 4)

    kernel = functools.partial(
        _develop_kernel,
        num_masks=m,
        num_seg=s,
        full_h=h,
        full_w=w,
        tile_h=tile_h,
        tile_w=tile_w,
        main_only=main_only,
        default_bright_curves=default_bright_curves,
        default_oklch_curves=default_oklch_curves,
        identity_oklch=identity_oklch,
        default_slots=default_curve_slots,
    )

    grid = (pl.cdiv(h, tile_h), pl.cdiv(w, tile_w))
    chan = params.bright_channel.reshape(m, 1).astype(jnp.float32)
    in_specs = [
        smem_spec((1, 4)),
        smem_spec((m, 3)),
        smem_spec((m, 6)),
        smem_spec((m, 1)),
        smem_spec((m * 4, s)),
        smem_spec((m * 4, s * 4)),
        pl.BlockSpec((3, tile_h, tile_w), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [vig, params.gains, params.tone, chan, knots, coeffs,
              planes]
    if not main_only:
        in_specs.append(
            pl.BlockSpec((m, tile_h, tile_w), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(masks)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, tile_h, tile_w), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        interpret=_interpret(),
    )(*inputs)
