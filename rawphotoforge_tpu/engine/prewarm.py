"""Preview-program pre-warming: compile before the user's first slider.

The reference renders interactively from the moment a file loads
(web/main.ts:652-695); through the remote-TPU tunnel a *cold* XLA compile
of the develop program costs tens of seconds to minutes, which would land
on the user's first preview request. This module compiles the programs on
the first-preview critical path ahead of time, in a daemon thread:

* the fused develop kernel (slider-only "staircase shortcut" variant — the
  state every session opens in) at the bucket-padded preview shapes;
* the MID-level histogram (served with every edit tick);
* the device-side preview quantizer (u8 HWC — the /preview and /export
  encode path);
* the editor's lazy FULL->MID/LOW pyramid resizes (keyed on the source
  extent, so only the per-open editor warm can cover them).

Two warming moments:

* server start: the standard-aspect MID/LOW preview buckets are known
  before any file opens (the preview long edges come from Settings; the
  bucket rounding collapses all same-aspect photos onto one shape), so a
  background warm at startup covers most subsequent ``POST /open``s;
* file open: the *actual* pyramid shapes of the just-opened editor (covers
  non-standard aspects, custom preview sizes, and the small-image case
  where MID aliases FULL).

All compiles land in the persistent on-disk compile cache, so a warm done
once benefits every later process too. Warming is strictly best-effort:
it touches no editor state (only freshly-allocated dummy buffers), takes
no locks, and swallows every failure — a dead tunnel must degrade to
"cold compiles on demand", never to a crashed server.
"""

from __future__ import annotations

import threading

# (aspect_w, aspect_h) of the sensor formats that cover essentially all
# cameras: 3:2 (full-frame/APS-C), 4:3 (MFT/phones), 16:9 (video crops),
# 1:1, plus portrait orientations.
STANDARD_ASPECTS = (
    (3, 2), (2, 3), (4, 3), (3, 4), (16, 9), (9, 16), (1, 1),
)

# Canonical sensor dimensions (h, w) + portrait twins: the FULL shapes
# whose bucket-stable open-path programs (upload-normalize + the
# extent-traced FULL->MID/LOW resizes) are worth compiling before any
# file opens. The 128-bucket collapses each onto one program shared by
# every camera within 127 px of it, so this short list covers the common
# 24MP 3:2 bodies, 4:3 phones/MFT, 26MP APS-C, and 45MP full frame.
CANONICAL_SENSOR_SHAPES = (
    (4000, 6000), (6000, 4000),   # 24MP 3:2 (most FF/APS-C)
    (3000, 4000), (4000, 3000),   # 12MP 4:3 (phones, older MFT)
    (4160, 6240), (6240, 4160),   # 26MP APS-C (Fuji X-Trans IV/V)
    (5464, 8192), (8192, 5464),   # 45MP FF (R5/Z8-class)
)

# Fuji X-Trans sensor extents (landscape storage). X-Trans opens ARE
# bucket-stable since the masked-NC demosaic (true extent + origin
# traced, ops/demosaic.demosaic_cfa) — these exact extents feed
# xtrans_full_shapes so prewarm covers the canonical Fuji BUCKETS.
XTRANS_SENSOR_SHAPES = ((4160, 6240), (5152, 7728))

# Shapes (true h, true w) whose programs this process already warmed (or
# started warming) — consulted to skip duplicate work on repeated opens.
_warmed: set[tuple[int, int]] = set()
_warmed_lock = threading.Lock()
_warmed_full: set[tuple] = set()
_warmed_curves: set[tuple[int, int]] = set()


def preview_shapes(
    mid_long_edge: int, low_long_edge: int,
    aspects=STANDARD_ASPECTS,
) -> list[tuple[int, int]]:
    """True (h, w) preview dimensions for the standard aspects.

    Mirrors the editor's pyramid construction (engine.editor.PhotoEditor
    __init__): each level is the original resized so its long edge equals
    the configured preview size, so for any photo bigger than the preview
    the true preview shape depends only on the aspect ratio.
    """
    from ..ops.geometry import resize_long_edge_shape

    out = []
    for edge in (mid_long_edge, low_long_edge):
        for aw, ah in aspects:
            # A representative source comfortably larger than the edge;
            # resize_long_edge_shape only uses the h:w ratio.
            h, w = ah * 1000, aw * 1000
            out.append(resize_long_edge_shape(h, w, edge))
    # Dedup, stable order.
    seen: set[tuple[int, int]] = set()
    uniq = []
    for s in out:
        if s not in seen:
            seen.add(s)
            uniq.append(s)
    return uniq


def warm_shape(true_shape: tuple[int, int]) -> bool:
    """Compile the first-preview programs for one true (h, w) shape.

    Runs the fused develop (default-curve variant, single elided mask) on
    a dummy bucket-padded image, then the histogram and both preview
    quantizers on the true-extent slice — exactly the programs
    ``PhotoEditor.apply(MID)`` + ``/histogram`` + ``/preview`` dispatch on
    a freshly-opened session. Returns True if all programs compiled.
    """
    import jax.numpy as jnp

    from ..core.params import EditParameters, pack_params
    from ..kernels import fused
    from ..ops.stats import histogram_rgbl, histogram_rgbl_rect
    from ..utils.transfer import _to_u8_hwc_jit
    from .editor import _pad_to_bucket

    h, w = int(true_shape[0]), int(true_shape[1])
    with _warmed_lock:
        if (h, w) in _warmed:
            return True
        _warmed.add((h, w))
    try:
        planes = _pad_to_bucket(jnp.zeros((3, h, w), jnp.float32))
        params = pack_params([EditParameters()], extent=(h, w),
                             build_luts=False)
        # EXACTLY the static-arg combination the editor dispatches on a
        # fresh open (engine/editor.apply: default_bright_curves=db,
        # default_oklch_curves=doc, identity_oklch=doc with db=doc=True)
        # — any other flag combination is a different XLA program and the
        # warm would never be hit.
        out = fused.develop_post_geo_fused(
            planes, params, None,
            main_mask_all_ones=True, default_bright_curves=True,
            default_oklch_curves=True, identity_oklch=True,
            default_curve_slots=None,
        )
        true_out = out[:, :h, :w]
        hist = histogram_rgbl(true_out)
        # The crop-rect histogram variant (editor.histogram under a crop)
        # is one program per level shape too — warm it alongside.
        histogram_rgbl_rect(true_out, jnp.asarray([0, h, 0, w], jnp.int32))
        # No _to_ycc420_jit here: the YCbCr quantizer serves only the CLI
        # batch fast path at full-RAW shapes — /preview and /export go
        # through _to_u8_hwc_jit. Warming it at preview shapes was one
        # useless remote compile per shape, serialized on this thread
        # AHEAD of warms the first slider drag actually needs.
        _to_u8_hwc_jit()(true_out)
        # The jit compiles run synchronously at dispatch (that is the
        # expensive part being front-loaded); block_until_ready is a
        # no-op through the tunnel, so force execution with a tiny
        # indexed fetch (CLAUDE.md timing notes).
        float(hist[0, 0])
        return True
    except Exception:
        # Best-effort by contract: cold compiles on demand still work.
        with _warmed_lock:
            _warmed.discard((h, w))
        return False


def warm_curve_programs(true_shape: tuple[int, int]) -> bool:
    """Compile the first-curve-drag develop programs for one true shape.

    The editor keys the fused kernel on per-family default flags
    (engine/editor.apply): touching the brightness (tone) curve
    dispatches (default_bright_curves=False, default_oklch_curves=True,
    identity_oklch=True); touching a hue/sat/light curve dispatches the
    general kernel. The packed segment count is static too — a modified
    two-point curve packs s=2 and adding a third control point bumps it
    to s=4 (pack_params pads to the next power of two) — so the likely
    first-drag programs are (brightness, s=2), (brightness, s=4) and
    (hue/sat/light, s=4). Compiling them in the post-open warm hides the
    remote compile the user's first curve drag would otherwise pay.
    (A hue-family endpoint drag at s=2 is left cold: rarer than the
    add-a-point gesture, and every warm here serializes ahead of ones
    later opens need.)
    """
    import jax.numpy as jnp

    from ..core.params import BRIGHTNESS, HUE, EditParameters, pack_params
    from ..kernels import fused
    from .editor import _pad_to_bucket

    h, w = int(true_shape[0]), int(true_shape[1])
    with _warmed_lock:
        if (h, w) in _warmed_curves:
            return True
        _warmed_curves.add((h, w))
    try:
        planes = _pad_to_bucket(jnp.zeros((3, h, w), jnp.float32))
        out = None
        for slot, pts in ((BRIGHTNESS, 2), (BRIGHTNESS, 3), (HUE, 3)):
            p = EditParameters()
            if pts == 2:
                p.set_curve(slot, [0, 65535], [0, 60000])
            else:
                p.set_curve(slot, [0, 30000, 65535], [0, 30001, 65535])
            params = pack_params([p], extent=(h, w), build_luts=False)
            # Pass every flag EXPLICITLY, exactly like engine/editor.apply:
            # jax.jit keys its in-process cache on the call's argument
            # binding, so an omitted static kwarg and an explicitly-passed
            # equal value are DIFFERENT cache entries and the warm would
            # be dead (caught by tests/test_prewarm.py).
            if slot == BRIGHTNESS:
                out = fused.develop_post_geo_fused(
                    planes, params, None, main_mask_all_ones=True,
                    default_bright_curves=False,
                    default_oklch_curves=True, identity_oklch=True,
                    default_curve_slots=None)
            else:
                out = fused.develop_post_geo_fused(
                    planes, params, None, main_mask_all_ones=True,
                    default_bright_curves=True,
                    default_oklch_curves=False, identity_oklch=False,
                    default_curve_slots=None)
        float(out[0, 0, 0])  # force execution through the tunnel
        return True
    except Exception:
        with _warmed_lock:
            _warmed_curves.discard((h, w))
        return False


def warm_full_shape(full_shape: tuple[int, int],
                    mid_long_edge: int = 1280,
                    low_long_edge: int = 400,
                    raw_patterns: tuple = ()) -> bool:
    """Compile the bucket-stable open-path programs for one FULL sensor
    shape: the u8 upload-normalize (the JPEG decode path), the
    extent-traced FULL->MID/LOW pyramid resizes, and — per
    ``raw_patterns`` entry (e.g. "RGGB") — the bucket-stable RAW develop
    chain (io.raw.develop_raw_image_padded's normalize + WB + Malvar
    demosaic + camera matrix).

    Every program here keys on BUCKET shapes (engine.editor's
    128-multiple padding; extents are traced), so one warm covers every
    image within the same bucket — with the canonical sensor list, a
    typical camera file's first open finds the whole device open path
    already compiled. Dummy buffers only; best-effort like warm_shape.
    """
    import jax.numpy as jnp

    from ..io.image_io import _normalize_upload
    from ..ops.geometry import (resize_bilinear_extents,
                                resize_long_edge_shape)
    from .editor import bucket_shape

    h, w = int(full_shape[0]), int(full_shape[1])
    key = (bucket_shape(h, w), mid_long_edge, low_long_edge,
           tuple(raw_patterns))
    with _warmed_lock:
        if key in _warmed_full:
            return True
        _warmed_full.add(key)
    try:
        import numpy as _np

        from ..ops.develop import replicate_true_edges_traced
        from ..utils.transfer import put_np

        hp, wp = key[0]
        # Through put_np, like the real upload closures, so the banded
        # concat/reshape transfer program is prewarmed too.
        dummy_u8 = put_np(_np.zeros((3, hp, wp), _np.uint8))
        planes = _normalize_upload(255.0, True)(dummy_u8)
        # The 16-bit linear open path (PPM16 / 16-bit TIFF) uses the
        # u16 transfer + 65535-scale normalize — two more tiny programs.
        _normalize_upload(65535.0, False)(
            put_np(_np.zeros((3, hp, wp), _np.uint16)))
        for edge in (mid_long_edge, low_long_edge):
            dh, dw = resize_long_edge_shape(h, w, edge)
            if (dh, dw) == (h, w):
                continue
            out = resize_bilinear_extents(
                planes, jnp.asarray([h, w, dh, dw], jnp.int32),
                bucket_shape(dh, dw))
            float(out[0, 0, 0])  # force execution through the tunnel
        from ..engine.editor import SHAPE_BUCKET
        from ..ops import demosaic as dm

        for pattern in raw_patterns:
            # Two grids per sensor bucket: the plain one and the
            # crop-enlarged one (+1 bucket per axis) that DefaultCrop
            # files develop on (io/raw._bucket_pads) — virtually every
            # real camera DNG carries a DefaultCrop.
            for gh, gw in ((hp, wp),
                           (hp + SHAPE_BUCKET, wp + SHAPE_BUCKET)):
                mosaic01 = dm.normalize_mosaic(
                    put_np(_np.zeros((gh, gw), _np.uint16)),
                    512.0, 16383.0)
                # X-Trans buckets develop through the masked-NC
                # demosaic with the TRUE extent traced (the program
                # develop_raw_image_padded dispatches); Bayer keys on
                # the grid alone.
                ts = (jnp.asarray([h, w], jnp.int32)
                      if pattern == "XTRANS" else None)
                out = dm.develop_raw(
                    mosaic01, jnp.asarray([2.0, 1.0, 1.5], jnp.float32),
                    jnp.eye(3, dtype=jnp.float32), pattern=pattern,
                    true_shape=ts)
                out = replicate_true_edges_traced(
                    out, jnp.asarray([h, w], jnp.int32))
                float(out[0, 0, 0])
        return True
    except Exception:
        with _warmed_lock:
            _warmed_full.discard(key)
        return False


def warm_sparse_export(full_shape: tuple[int, int]) -> bool:
    """Compile the sparse JPEG export program for one FULL bucket shape.

    The production wire is the PACKED one (io/jpegbits: fDCT +
    quantization + on-device Huffman bit assembly + the global bit-pack
    with two 1-bit-sort compactions) — the heaviest per-bucket compile
    on the export path; without this warm, the first uncropped JPEG
    export per bucket stalls its job on the whole remote compile — and
    the stall shows as the 'fetch' stage (the totals sync point blocks
    on compile+compute), reading like a wedged tunnel rather than a
    compile. Dummy buffers only; best-effort like warm_shape. If the
    packed warm fails, the nibble wire (encode_jpeg's last fallback) is
    warmed instead so the degraded path is at least compile-free too
    (the mid-chain prepacked wire shares its lane stages with packed
    and only triggers on capacity overflow — rare enough to compile on
    demand).
    """
    import numpy as _np
    import jax.numpy as jnp

    from ..io import jpegbits, jpegenc
    from .editor import bucket_shape

    h, w = int(full_shape[0]), int(full_shape[1])
    key = ("sparse_export", bucket_shape(h, w))
    with _warmed_lock:
        if key in _warmed_full:
            return True
        _warmed_full.add(key)
    hp, wp = key[1]
    qlum, qchr = jpegenc._quant_tables(92)  # programs are quality-free:
    # the tables ride as device arrays, so one warm covers every
    # quality setting at this bucket.
    # Mirror the encoders' program choice: a true extent inside the
    # bucket takes the extent-aware (clamp-fill) program — the editor's
    # apply_padded exports always do unless the image is exactly
    # bucket-sized. Extents are traced, so warming with THIS image's
    # extent covers every extent in the bucket.
    try:
        stages = jpegbits._prepacked_jit()
        caps = (jpegbits.PACKED_ENT_WORDS, jpegbits.PACKED_OUT_WORDS)
        if (h, w) == (hp, wp):
            out = stages.full_packed(jnp.zeros((3, hp, wp), jnp.float32),
                                     jnp.asarray(qlum), jnp.asarray(qchr),
                                     *caps)
        else:
            out = stages.full_packed_extent(
                jnp.zeros((3, hp, wp), jnp.float32),
                jnp.asarray(qlum), jnp.asarray(qchr), h, w, *caps)
        int(_np.asarray(out[1])[0])  # force execution through the tunnel
        return True
    except Exception:
        # A transiently-failed packed warm must stay retryable: the
        # production wire is tried FIRST by encode_jpeg, so marking the
        # bucket warmed off the nibble fallback alone would leave every
        # later warm a no-op while the first real export still pays the
        # packed compile inline. The fallback warm tracks its own key.
        with _warmed_lock:
            _warmed_full.discard(key)
    nkey = ("sparse_export_nibble", key[1])
    with _warmed_lock:
        if nkey in _warmed_full:
            return False  # fallback warm done; prepack warm still failing
        _warmed_full.add(nkey)
    try:
        stages = jpegenc._sparse_jit()
        if (h, w) == (hp, wp):
            out = stages.full_banded(jnp.zeros((3, hp, wp), jnp.float32),
                                     jnp.asarray(qlum), jnp.asarray(qchr))
        else:
            out = stages.full_extent_banded(
                jnp.zeros((3, hp, wp), jnp.float32),
                jnp.asarray(qlum), jnp.asarray(qchr), h, w)
        int(_np.asarray(out[3])[0])  # force execution through the tunnel
    except Exception:
        with _warmed_lock:
            _warmed_full.discard(nkey)
    return False


def warm_raw_exact(shape: tuple[int, int], pattern: str = "XTRANS") -> bool:
    """Compile the legacy (per-extent) RAW develop for one exact mosaic
    shape — the path bucket-INELIGIBLE files take (since the masked-NC
    demosaic made upright X-Trans bucket-stable, that's rotated X-Trans
    — a top/left pad would shift the absolute 6x6 phase — plus files
    carrying post-demosaic opcodes). With XTRANS_SENSOR_SHAPES this
    covers a rotated Fuji file's first open: normalize + NC demosaic +
    matrix at the exact extent, plus the editor's bucket pad of the
    result."""
    import numpy as _np
    import jax.numpy as jnp

    from ..ops import demosaic as dm
    from ..utils.transfer import put_np
    from .editor import _pad_to_bucket

    h, w = int(shape[0]), int(shape[1])
    key = ("raw_exact", h, w, pattern)
    with _warmed_lock:
        if key in _warmed_full:
            return True
        _warmed_full.add(key)
    try:
        mosaic01 = dm.normalize_mosaic(
            put_np(_np.zeros((h, w), _np.uint16)), 512.0, 16383.0)
        planes = dm.develop_raw(
            mosaic01, jnp.asarray([2.0, 1.0, 1.5], jnp.float32),
            jnp.eye(3, dtype=jnp.float32), pattern=pattern)
        padded = _pad_to_bucket(planes)
        float(padded[0, 0, 0])
        return True
    except Exception:
        with _warmed_lock:
            _warmed_full.discard(key)
        return False


def warm_editor_levels(editor, levels=("mid", "low")) -> int:
    """Warm the preview programs for an open editor's actual shapes.

    Also dispatches the editor's lazy FULL->level resize
    (``_original_at``) — that program is jit-keyed on the SOURCE extent,
    so no dummy-buffer warm can cover it, and without it the user's
    first ``/preview?level=low`` drag pays the cold remote compile this
    module exists to prevent. Safe off-thread: lens correction ran
    inside ``PhotoEditor.open`` before any warm is spawned, and a
    concurrent request thread building the same level just writes an
    equivalent buffer."""
    n = 0
    for level in levels:
        try:
            shape = editor.level_shape(level)
        except KeyError:
            continue
        try:
            editor._original_at(level)
        except Exception:
            continue  # best-effort, like warm_shape
        if warm_shape(shape):
            n += 1
    # Curve-touch variants AFTER both levels' open-state programs: the
    # first slider drag needs those; the first curve drag comes later.
    for level in levels:
        try:
            shape = editor.level_shape(level)
        except KeyError:
            continue
        if warm_curve_programs(shape):
            n += 1
    return n


def warm_async(shapes=None, editor=None, levels=("mid", "low"),
               full_shapes=None, preview_edges=(1280, 400),
               raw_patterns=(), xtrans_full_shapes=(), raw_exact=(),
               on_done=None) -> threading.Thread:
    """Spawn a daemon thread warming ``shapes`` and/or an editor's levels
    and/or the bucket-stable open-path programs for ``full_shapes``
    (see warm_full_shape; ``preview_edges`` = (mid, low) long edges),
    ``xtrans_full_shapes`` (same, with the X-Trans masked-NC develop),
    and/or the exact-extent RAW develops for ``raw_exact`` ((shape,
    pattern) pairs, see warm_raw_exact — ordered LAST: heaviest
    compiles, least common files).

    The thread never raises; ``on_done(warmed_count)`` (optional) runs at
    the end (used by tests and the server log line).
    """

    def run():
        n = 0
        try:
            if editor is not None:
                n += warm_editor_levels(editor, levels)
            for s in shapes or ():
                if warm_shape(s):
                    n += 1
            for s in full_shapes or ():
                if warm_full_shape(s, preview_edges[0], preview_edges[1],
                                   raw_patterns=raw_patterns):
                    n += 1
            for s in xtrans_full_shapes or ():
                if warm_full_shape(s, preview_edges[0], preview_edges[1],
                                   raw_patterns=("XTRANS",)):
                    n += 1
            # Export program warms come AFTER every open-path warm (a
            # cold first preview hurts more than a cold first export)
            # but BEFORE raw_exact: any open image can be exported.
            if editor is not None and warm_sparse_export(editor.shape):
                n += 1
            for s in list(full_shapes or ()) + list(xtrans_full_shapes
                                                    or ()):
                if warm_sparse_export(s):
                    n += 1
            for s, pat in raw_exact or ():
                if warm_raw_exact(s, pat):
                    n += 1
        except Exception:
            pass
        if on_done is not None:
            try:
                on_done(n)
            except Exception:
                pass

    t = threading.Thread(target=run, name="rpf-prewarm", daemon=True)
    t.start()
    return t
