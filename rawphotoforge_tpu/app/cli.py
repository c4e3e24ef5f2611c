"""Command-line develop tool — the framework's equivalent of the reference's
native smoke binary (rust/photo-editor-test/src/main.rs:8-72) grown into a
usable batch developer.

Usage:
  python -m rawphotoforge_tpu.app.cli info IMAGE
  python -m rawphotoforge_tpu.app.cli develop IN OUT [edit flags]
  python -m rawphotoforge_tpu.app.cli batch IN_DIR OUT_DIR [edit flags]

Edit flags mirror the UI sliders (web/index.html tone tab ranges):
exposure EV in [-6, 6]; all other sliders integer [-100, 100]; curves as
comma-separated control points "x:y,x:y,...".
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

from ..core.params import BRIGHTNESS, HUE, SATURATION, LIGHTNESS
from ..engine.editor import PhotoEditor, FULL
from ..io import image_io


def _parse_curve(spec: str):
    from ..errors import PhotoEditorError

    try:
        xs, ys = [], []
        for pair in spec.split(","):
            x, y = pair.split(":")
            xs.append(int(x))
            ys.append(int(y))
    except ValueError as e:
        raise PhotoEditorError(
            f"bad curve spec {spec!r} (want 'x:y,x:y,...'): {e}") from e
    return np.asarray(xs, dtype=np.int32), np.asarray(ys, dtype=np.int32)


def _add_edit_flags(p: argparse.ArgumentParser):
    p.add_argument("--exposure", type=float, default=0.0)
    p.add_argument("--contrast", type=int, default=0)
    p.add_argument("--shadow", type=int, default=0)
    p.add_argument("--highlight", type=int, default=0)
    p.add_argument("--black", type=int, default=0)
    p.add_argument("--white", type=int, default=0)
    p.add_argument("--wb-temperature", type=int, default=0)
    p.add_argument("--wb-tint", type=int, default=0)
    p.add_argument("--vignette", type=int, default=0)
    p.add_argument("--lens-distortion", type=int, default=0)
    p.add_argument("--sharpness", type=int, default=0)
    p.add_argument("--crop", type=str, default=None,
                   help='crop rect "x0,y0,x1,y1" in source pixels')
    p.add_argument("--brightness-curve", type=str, default=None,
                   help='control points "x:y,x:y,..." in [0,65535]')
    p.add_argument("--hue-curve", type=str, default=None)
    p.add_argument("--saturation-curve", type=str, default=None)
    p.add_argument("--lightness-curve", type=str, default=None)
    p.add_argument("--preset", type=str, default=None,
                   help="JSON preset file (overrides other edit flags)")
    p.add_argument("--save-preset", type=str, default=None)
    p.add_argument("--quality", type=int, default=95)
    p.add_argument("--bit-depth", type=int, default=8, choices=(8, 16),
                   help="16 -> 48-bit PNG (output must be .png or .ppm)")
    p.add_argument("--jnp-path", action="store_true",
                   help="use the exact-LUT jnp path instead of the fused kernel")
    p.add_argument("--histogram", action="store_true",
                   help="print the 4x256 histogram summary")
    p.add_argument("--lens-correct", nargs="?", const="auto", default=None,
                   choices=["auto", "calibrated-only"],
                   help="auto-apply a lens profile matched from EXIF; "
                        "'calibrated-only' skips the bundled approximate "
                        "profiles (only real lensfun DBs via --lens-db)")
    p.add_argument("--lens-db", type=str, action="append", default=None,
                   help="extra lensfun XML file/dir (repeatable)")


def _set_edit_flags(target, args):
    """Flag-to-edit mapping, written ONCE for both consumers:
    ``PhotoEditor`` (develop/batch editor route) and ``EditParameters``
    (the batch fused-RAW fast path) expose the same setter names, so one
    function keeps the two routes in lockstep — a flag wired into only
    one of two hand-maintained copies would make `develop` and `batch`
    silently differ for identical flags."""
    target.set_tone(args.exposure, args.contrast, args.shadow,
                    args.highlight, args.black, args.white)
    target.set_whitebalance(args.wb_temperature, args.wb_tint)
    target.set_vignette(args.vignette)
    target.set_lens_distortion(args.lens_distortion)
    target.set_sharpness(args.sharpness)
    for slot, spec in (
        (BRIGHTNESS, args.brightness_curve),
        (HUE, args.hue_curve),
        (SATURATION, args.saturation_curve),
        (LIGHTNESS, args.lightness_curve),
    ):
        if spec:
            xs, ys = _parse_curve(spec)
            target.set_curve(slot, xs, ys)


def _apply_edit_flags(ed: PhotoEditor, args):
    if args.crop:
        from ..errors import PhotoEditorError

        try:
            x0, y0, x1, y1 = (int(v) for v in args.crop.split(","))
            ed.set_crop(x0, y0, x1, y1)
        except ValueError as e:
            raise PhotoEditorError(
                f"bad crop {args.crop!r} (want 'x0,y0,x1,y1' inside the "
                f"image): {e}") from e
    if args.preset:
        ed.load_preset(args.preset)
        return
    _set_edit_flags(ed, args)


def cmd_info(args) -> int:
    if getattr(args, "preview", None):
        from ..io.dng import extract_preview

        with open(args.image, "rb") as f:
            jpeg = extract_preview(f.read())
        if jpeg is None:
            print("no embedded JPEG preview found")
        else:
            with open(args.preview, "wb") as f:
                f.write(jpeg)
            print(f"embedded preview: {len(jpeg)} bytes -> {args.preview}")
    try:
        planes, exif = image_io.read_image(args.image)
    except Exception as e:
        from .._errbase import PhotoEditorError
        from ..io.raw import decode_embedded_preview, is_raw_image

        if not (isinstance(e, PhotoEditorError) and is_raw_image(args.image)):
            raise
        with open(args.image, "rb") as f:
            res = decode_embedded_preview(f.read())
        if res is None:
            raise
        planes, exif = res
        print(f"sensor data not decodable ({e}); dimensions are the "
              f"embedded camera preview's")
    _, h, w = planes.shape
    print(f"{args.image}: {w}x{h} ({w * h / 1e6:.1f} MPix)")
    for k, v in sorted(exif.items()):
        if k.startswith("_"):
            continue  # _exif_bytes: the raw APP1 blob, not a field
        print(f"  {k}: {v}")
    if exif.get("LensModel") or exif.get("Model"):
        # What --lens-correct WOULD apply, with provenance: approximate
        # bundled profiles must be distinguishable from calibrated DBs.
        from ..io.lensdb import LensDatabase

        prof = LensDatabase.load(
            getattr(args, "lens_db", None)).profile_from_exif(exif)
        if prof is not None:
            prov = (" (APPROXIMATE bundled profile, not calibrated data)"
                    if prof.approximate else " (calibrated)")
            print(f"  lens profile match: {prof.name}{prov}")
    if getattr(args, "verify_decode", False):
        # Silent-wrong detector for vendor RAW decodes: develop the
        # sensor data and correlate against the file's own embedded
        # camera preview (io/vendor_raw.preview_correlation).
        from ..io.raw import is_raw_image
        from ..io.vendor_raw import CORRELATION_GATE, preview_correlation

        if not is_raw_image(args.image):
            print("verify-decode: not a RAW container, nothing to verify")
        else:
            from .._errbase import PhotoEditorError

            try:
                with open(args.image, "rb") as f:
                    corr = preview_correlation(f.read())
            except PhotoEditorError as e:
                print(f"verify-decode: sensor data not decodable ({e})")
                return 0
            if corr is None:
                print("verify-decode: no embedded preview to correlate "
                      "against")
            else:
                verdict = ("ok" if corr >= CORRELATION_GATE
                           else "SUSPECT (below gate "
                                f"{CORRELATION_GATE})")
                print(f"verify-decode: preview correlation {corr:.4f} "
                      f"-> {verdict}")
                if corr < CORRELATION_GATE:
                    return 1
    return 0


def cmd_develop(args) -> int:
    # A .dng output exports scene-linear HDR (float LinearRaw DNG);
    # everything else validates as a display format before rendering.
    hdr_out = args.output.lower().endswith(".dng")
    if args.bit_depth == 16 and not args.output.lower().endswith(
            (".png", ".ppm")):
        # Reject up front instead of after minutes of develop + fetch
        # (the .dng HDR export is already scene-linear float).
        raise image_io.ImageIOError(
            "--bit-depth 16 needs a .png or .ppm output")
    if not hdr_out:
        fmt = image_io.format_for_path(args.output)
        if fmt == "DNG":
            # A vendor-RAW extension (.cr2/.nef/...) maps to "DNG" in the
            # registry; only literal .dng means the HDR export. Reject up
            # front instead of after minutes of develop + fetch.
            raise image_io.ImageIOError(
                f"cannot develop to {os.path.splitext(args.output)[1]}; "
                "use .dng for scene-linear HDR or a display format "
                "(.jpg/.png/.webp/.tif/.ppm)")
    t0 = time.perf_counter()
    ed = PhotoEditor.open(args.input, use_pallas=not args.jnp_path,
                          lens_correct=args.lens_correct,
                          lens_db_paths=args.lens_db)
    t_load = time.perf_counter() - t0
    if ed.opened_from_preview:
        print(f"WARNING: sensor data not decodable "
              f"({ed.opened_from_preview}); editing the embedded "
              f"camera-rendered JPEG preview instead")
    if args.lens_correct:
        print(f"lens profile: {_lens_note(ed)}")
    _apply_edit_flags(ed, args)
    t1 = time.perf_counter()
    # fetch_sync, NOT block_until_ready: the latter is a no-op through
    # the axon tunnel (CLAUDE.md), which would report dispatch time as
    # develop time. The tiny fetch forces device completion; save()'s
    # bulk fetch then reuses the finished buffer.
    from ..utils.profiling import fetch_sync

    # cropped=False: save()/save_hdr_dng render the FULL frame and slice
    # host-side, so syncing on the cropped render would compile a device
    # slice program per distinct --crop rect that nothing else reuses.
    fetch_sync(ed.apply(FULL, cropped=False))
    t_dev = time.perf_counter() - t1
    if hdr_out:
        ed.save_hdr_dng(args.output)
    else:
        ed.save(args.output, quality=args.quality,
                bit_depth=args.bit_depth)
    t_total = time.perf_counter() - t0
    h, w = ed.shape
    mpix = h * w / 1e6
    print(
        f"developed {w}x{h} ({mpix:.1f} MPix): load {t_load * 1e3:.0f} ms, "
        f"develop {t_dev * 1e3:.1f} ms ({mpix / t_dev:.0f} MPix/s), "
        f"total {t_total * 1e3:.0f} ms -> {args.output}"
    )
    if args.save_preset:
        ed.save_preset(args.save_preset)
    if args.histogram:
        # FULL reuses the render this command just produced; the MID
        # default would compile the FULL->MID resize plus a MID develop
        # purely for a four-line summary.
        hist = ed.histogram(FULL)
        for name, row in zip(("R", "G", "B", "Y"), hist):
            peak = int(np.argmax(row))
            print(f"  hist {name}: peak bin {peak}, mass {int(row.sum())}")
    return 0


def _lens_note(ed) -> str:
    """Human-readable applied-lens-profile line with provenance: a user
    must always be able to tell a bundled-approximate correction from a
    calibrated lensfun profile (data/lenses.xml provenance stamp)."""
    if not ed.applied_lens_profile:
        return "no match"
    if ed.applied_lens_approximate:
        return (f"{ed.applied_lens_profile} (APPROXIMATE bundled "
                "profile, not calibrated data; use --lens-db with a real "
                "lensfun DB or --lens-correct calibrated-only)")
    return ed.applied_lens_profile


def _params_from_args(args):
    from ..core.params import EditParameters

    p = EditParameters()
    _set_edit_flags(p, args)
    return p


def _batch_out_name(path, output_dir, taken) -> str:
    """Collision-safe output path: RAW+JPEG shooting pairs (IMG_0001.CR2
    + IMG_0001.JPG) must not overwrite each other's develop."""
    stem = os.path.splitext(os.path.basename(path))[0]
    name = stem + ".jpg"
    if name in taken:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        name = f"{stem}_{ext}.jpg"
        i = 2
        while name in taken:
            name = f"{stem}_{ext}_{i}.jpg"
            i += 1
    taken.add(name)
    return os.path.join(output_dir, name)


def _batch_raw_fast_path(paths, args) -> int:
    """Batch-develop RAW files through the one-pass fused kernel: the
    mosaic never round-trips HBM between stages, and compile reuse comes
    from the kernel's tile-multiple padding (BASELINE config 5 shape)."""
    import jax.numpy as jnp

    from .._errbase import PhotoEditorError
    from ..core.params import pack_params
    from ..io.raw import parse_raw
    from ..io.raw import develop_raw_image  # noqa: F401 (parity fallback)
    from ..kernels.raw_pipeline import raw_develop_fused
    from ..ops import demosaic as dm
    from ..ops.geometry import orient_exif

    edit = _params_from_args(args)
    sharpen = jnp.float32(edit.sharpness / 100.0 * 2.0)
    # Untouched curve families -> the staircase + identity_oklch kernel
    # variants (the latter skips the OKLCH round trip; <= ~2e-3 deviation
    # vs the general kernel, sub-u8-quantization — kernels/fused.py
    # docstring). The flags are per family: a --curve-brightness flag
    # alone still skips the OKLCH trip.
    db = edit.curves[BRIGHTNESS].is_default(BRIGHTNESS)
    doc = all(edit.curves[s].is_default(s)
              for s in (HUE, SATURATION, LIGHTNESS))

    def edit_planes(planes, extent):
        """Sharpen + the fused edit kernel on already-linear planes."""
        from ..kernels import fused

        packed = pack_params([edit], extent=extent, build_luts=False)
        if edit.sharpness:
            from ..ops.sharpen import unsharp_mask

            planes = unsharp_mask(planes, sharpen)
        # masks=None: the all-ones main mask is elided entirely — no dead
        # [1, H, W] device allocation (~180 MB at 45MP).
        return fused.develop_post_geo_fused(
            planes, packed, None, main_mask_all_ones=True,
            default_bright_curves=db, default_oklch_curves=doc,
            identity_oklch=doc,
        )

    t0 = time.perf_counter()
    total_pix = 0
    taken: set = set()
    for p in paths:
        with open(p, "rb") as f:
            data = f.read()
        preview_note = ""
        pv_exif: dict = {}
        try:
            raw = parse_raw(data)
        except PhotoEditorError as e:
            # Vendor-codec sensor data: develop the embedded
            # camera-rendered preview instead of aborting the batch.
            from ..io.raw import decode_embedded_preview

            res = decode_embedded_preview(data)
            if res is None:
                raise
            raw = None
            planes, pv_exif = res
            preview_note = f"  [embedded preview; sensor decode: {e}]"
        if raw is None:
            h, w = planes.shape[1:]
            srgb = edit_planes(planes, (h, w))
        else:
            if not raw.wb_known and tuple(raw.wb_gains) == (1.0, 1.0, 1.0):
                # Same gray-world fallback the single-file route applies
                # (io/raw.develop_raw_image): a vendor RAW with no
                # readable WB must not batch-develop with unit gains
                # (green cast) while `develop` of the identical file
                # balances it.
                import dataclasses

                from ..io.raw import estimate_gray_world_gains

                raw = dataclasses.replace(
                    raw, wb_gains=estimate_gray_world_gains(
                        raw.mosaic, raw.pattern, raw.black_level,
                        raw.white_level))
            h, w = raw.mosaic.shape[:2]
            mos01 = dm.normalize_mosaic(
                jnp.asarray(raw.mosaic), raw.black_level, raw.white_level
            )
            cam = (
                jnp.asarray(dm.cam_matrix_to_srgb(raw.xyz_to_cam))
                if raw.xyz_to_cam is not None
                else jnp.eye(3, dtype=jnp.float32)
            )
            # Position-dependent stages (vignette center, the sharpen
            # stencil at crop borders) must see the CROPPED frame like
            # `develop` does (the editor crops at open, io/raw.py) — the
            # one-pass kernel fuses crop-after, so such files take the
            # generic demosaic + crop-first + fused-edit route.
            crop_first = raw.default_crop is not None and (
                edit.vignette != 0 or edit.sharpness != 0)
            if (raw.pattern in dm.BAYER_PATTERNS or
                    raw.pattern == "XTRANS") and \
                    raw.warp_rectilinear is None and \
                    raw.warp_fisheye is None and not crop_first:
                packed = pack_params([edit], extent=(h, w), build_luts=False)
                srgb = raw_develop_fused(
                    mos01, jnp.asarray(raw.wb_gains, dtype=jnp.float32), cam,
                    packed, sharpen, pattern=raw.pattern,
                    default_bright_curves=db, default_oklch_curves=doc,
                    identity_oklch=doc,
                )
            else:
                # Non-CFA data (demosaiced LinearRaw), a WarpRectilinear
                # opcode (must run between demosaic and the edit stack),
                # or crop-first routing: develop via the generic path,
                # then the fused edit kernel. (Bayer AND X-Trans CFAs
                # take the one-pass kernel above.)
                if raw.pattern == "RGB":
                    planes = dm.develop_linear_raw(
                        mos01, jnp.asarray(raw.wb_gains, dtype=jnp.float32),
                        cam,
                    )
                else:
                    planes = dm.develop_raw(
                        mos01, jnp.asarray(raw.wb_gains, dtype=jnp.float32),
                        cam, pattern=raw.pattern,
                    )
                if raw.warp_rectilinear is not None:
                    from ..ops.lenscorr import warp_rectilinear

                    wc, wcen = raw.warp_rectilinear
                    planes = warp_rectilinear(
                        planes, jnp.asarray(wc), jnp.asarray(wcen))
                if raw.warp_fisheye is not None:
                    from ..ops.lenscorr import warp_fisheye

                    wc, wcen = raw.warp_fisheye
                    planes = warp_fisheye(
                        planes, jnp.asarray(wc), jnp.asarray(wcen))
                if crop_first:
                    cx, cy, cw, ch = raw.default_crop
                    planes = planes[:, cy : cy + ch, cx : cx + cw]
                    srgb = edit_planes(planes, (ch, cw))
                else:
                    srgb = edit_planes(planes, (h, w))
            if raw.default_crop is not None and not crop_first:
                cx, cy, cw, ch = raw.default_crop
                srgb = srgb[:, cy : cy + ch, cx : cx + cw]
            srgb = orient_exif(srgb, raw.orientation)
        out = _batch_out_name(p, args.output_dir, taken)
        # Fast JPEG path: device-side YCbCr 4:2:0 + native encoder (half
        # the link bytes); falls back to the Pillow path without native.
        from ..io import jpegenc

        # Preview-fallback files keep the preview's own EXIF blob when it
        # carries one (same as `develop` via editor.export_exif_bytes);
        # otherwise synthesize from whichever dict the open produced.
        if raw is not None:
            exif_b = image_io.build_exif_bytes(raw.exif)
        else:
            exif_b = (pv_exif.get("_exif_bytes")
                      or image_io.build_exif_bytes(pv_exif))
        # encode_jpeg falls back to the Pillow path itself when the
        # native library is unavailable.
        body = jpegenc.encode_jpeg(srgb, quality=args.quality,
                                   exif_bytes=exif_b)
        with open(out, "wb") as f:
            f.write(body)
        # Count the ENCODED frame (post-DefaultCrop), not the mosaic:
        # the preview-fallback branch counts output pixels too, and the
        # MPix/s summary must not claim cropped-away pixels.
        total_pix += srgb.shape[1] * srgb.shape[2]
        print(f"  {p} -> {out}{preview_note}")
    dt = time.perf_counter() - t0
    print(f"batch (fused raw path): {len(paths)} images, "
          f"{total_pix / 1e6:.4g} MPix in {dt:.1f} s "
          f"({total_pix / 1e6 / dt:.4g} MPix/s end-to-end)")
    return 0


def _batch_mesh_path(paths, args) -> int:
    """Mesh-sharded batch export (SURVEY §2.6: "batch export shards the
    image batch across the mesh" — the 256-image export config).

    Shards the image batch over ALL visible devices and runs the editor's
    render->encode tail per shard (parallel.mesh.export_batch_editor_
    packed_step: develop_post_geo + the PACKED JPEG wire). Per-image open
    (decode + demosaic + geometry + sharpen) runs on the default device;
    the develop + entropy coding — where the steady per-frame FLOPs are —
    runs data-parallel with zero collectives. Images are grouped by
    (bucket shape, true extent); each group is processed in chunks of
    n_devices (the last chunk padded by repetition, pad outputs
    discarded).

    Output files are byte-identical to the single-device editor loop
    (``--no-mesh --jnp-path``): develop_post_geo is the same anchor
    program, and everything after the u8-grid round is integer math —
    gated by tests/test_cli_mesh.py on the 8-virtual-device mesh. Any
    per-image wire rejection (capacity overflow on pathologically dense
    content) degrades that image to the editor's own save_bytes fallback
    chain, never silently.

    NOTE: rows are fetched at full packed capacity (~2.7x the true scan
    bytes); this path is for locally-attached multi-device hosts — a
    single tunnel-remote chip stays on the banded single-image wire."""
    import jax

    from .. import native
    from ..io import jpegbits, jpegenc
    from ..parallel import mesh as pmesh

    ndev = len(jax.devices())
    msh = pmesh.make_mesh(ndev)
    step = jax.jit(pmesh.export_batch_editor_packed_step,
                   static_argnums=(2, 5, 6, 7))
    caps = (jpegbits.PACKED_ENT_WORDS, jpegbits.PACKED_OUT_WORDS)
    qlum_h, qchr_h = jpegenc._quant_tables(args.quality)
    import jax.numpy as jnp

    qlum, qchr = jnp.asarray(qlum_h), jnp.asarray(qchr_h)

    t0 = time.perf_counter()
    total_pix = 0
    taken: set = set()
    groups: dict = {}  # (bucket_shape, extent) -> list[(path, editor, geo)]

    def flush(key, items):
        nonlocal total_pix
        (_, bh, bw), (th, tw) = key
        n_real = len(items)
        geos = [it[2] for it in items]
        while len(geos) % ndev:
            geos.append(geos[-1])  # pad the chunk; outputs discarded
        stack = jnp.stack(geos)
        params = items[0][1]._packed_params(FULL)
        words, totals = step(stack, params, msh, qlum, qchr,
                             (th, tw), *caps)
        hw = np.asarray(words)
        tv = np.asarray(totals)
        nblocks = (bh // 16) * (bw // 16) * 6
        for i, (p, ed, _g) in enumerate(items[:n_real]):
            nw, nbits, bad, n_ent, kept = (int(x) for x in tv[i])
            if (bad or n_ent > nblocks * caps[0] or kept != nw
                    or nw > nblocks * caps[1]):
                # Dense-content capacity overflow: this image takes the
                # editor's own fallback chain (prepacked -> nibble ->
                # dense), same bytes by the cross-wire identity tests.
                body = ed.save_bytes("JPEG", quality=args.quality)
            else:
                body = native.jpeg_encode_packed(
                    hw[i, :nw], nbits, th, tw, quality=args.quality)
                exif_b = ed.export_exif_bytes()
                if exif_b:
                    body = jpegenc._splice_app1(body, exif_b)
            out = _batch_out_name(p, args.output_dir, taken)
            with open(out, "wb") as f:
                f.write(body)
            total_pix += th * tw
            note = (f"  [lens: {_lens_note(ed)}]"
                    if args.lens_correct else "")
            print(f"  {p} -> {out}{note}")

    for p in paths:
        # use_pallas=False: the mesh step runs the exact-LUT anchor
        # program (develop_post_geo), so the packed params MUST carry
        # the built LUTs — and the per-image fallback then renders on
        # the same path, keeping every output in one batch consistent.
        ed = PhotoEditor.open(p, use_pallas=False,
                              lens_correct=args.lens_correct,
                              lens_db_paths=args.lens_db)
        _apply_edit_flags(ed, args)
        geo = ed._geo_at(FULL)
        key = (tuple(geo.shape), ed._extents[FULL])
        groups.setdefault(key, []).append((p, ed, geo))
        if len(groups[key]) == ndev:
            flush(key, groups.pop(key))
    for key, items in groups.items():
        flush(key, items)
    dt = time.perf_counter() - t0
    print(f"batch (mesh x{ndev}): {len(paths)} images, "
          f"{total_pix / 1e6:.4g} MPix in {dt:.1f} s "
          f"({total_pix / 1e6 / dt:.4g} MPix/s end-to-end)")
    return 0


def cmd_batch(args) -> int:
    from ..io.raw import is_raw_image

    if args.bit_depth != 8:
        # Batch outputs are JPEG; silently ignoring the flag would
        # contradict the strict-surface posture everywhere else.
        print("batch exports JPEG; --bit-depth 16 is develop-only "
              "(use develop with a .png output)", file=sys.stderr)
        return 1

    paths = sorted(
        p for p in glob.glob(os.path.join(args.input_dir, "*"))
        if os.path.splitext(p)[1].lower() in image_io.SUPPORTED_EXTENSIONS
        or is_raw_image(p)
    )
    if not paths:
        print(f"no images found in {args.input_dir}", file=sys.stderr)
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    # Multi-device host: shard the batch across the mesh (SURVEY §2.6).
    # Presets are excluded (they can add masks/crops the shared-params
    # step doesn't model); --crop is excluded like the fast path; the
    # packed assembly needs the native library. Single-device fallback
    # below otherwise.
    if not getattr(args, "no_mesh", False) and not args.preset \
            and not args.crop:
        import jax

        from .. import native as _native

        if len(jax.devices()) > 1 and _native.available():
            return _batch_mesh_path(paths, args)

    # The one-pass fused RAW kernel has no lens-distortion (geometry)
    # stage and no profile-correction stage; with --lens-distortion or
    # --lens-correct set, fall through to the editor path so batch output
    # matches `develop` with identical flags.
    if (all(is_raw_image(p) for p in paths) and not args.preset
            and not args.crop and not args.jnp_path
            and args.lens_distortion == 0 and not args.lens_correct):
        return _batch_raw_fast_path(paths, args)

    t0 = time.perf_counter()
    total_pix = 0
    taken: set = set()
    for p in paths:
        ed = PhotoEditor.open(p, use_pallas=not args.jnp_path,
                              lens_correct=args.lens_correct,
                              lens_db_paths=args.lens_db)
        _apply_edit_flags(ed, args)
        out = _batch_out_name(p, args.output_dir, taken)
        ed.save(out, quality=args.quality)
        h, w = ed.shape
        total_pix += h * w
        note = f"  [lens: {_lens_note(ed)}]" if args.lens_correct else ""
        print(f"  {p} -> {out}{note}")
    dt = time.perf_counter() - t0
    print(f"batch: {len(paths)} images, {total_pix / 1e6:.4g} MPix in {dt:.1f} s "
          f"({total_pix / 1e6 / dt:.4g} MPix/s end-to-end)")
    return 0


def cmd_convert(args) -> int:
    """Transcode a RAW file to a compressed DNG — archival recompression,
    pixel data bit-identical. ``--codec ljpeg`` (default) uses the
    framework's own ITU-T.81 encoder with per-image optimal Huffman tables
    (typically 2-2.5x smaller than uncompressed); ``--codec deflate``
    writes Compression=8 with the X2 CFA-pitch predictor."""
    from ..io.dng import write_dng
    from ..io.raw import parse_raw

    with open(args.input, "rb") as f:
        src = f.read()
    # Lossless-transcode mode: stored pixel values pass through verbatim
    # and opcode lists (GainMap/Warp) are re-serialized, not baked in.
    raw = parse_raw(src, apply_opcodes=False)
    # Carry the source's embedded camera preview through so the output
    # DNG stays instantly viewable in other software.
    from ..io.dng import extract_preview

    preview = None if args.no_preview else extract_preview(src)
    tile = None
    if args.tile:
        from ..errors import PhotoEditorError

        try:
            th, tw = (int(v) for v in args.tile.split("x"))
        except ValueError as e:
            raise PhotoEditorError(
                f"bad tile {args.tile!r} (want 'HxW', e.g. 256x256)") from e
        tile = (th, tw)
    if args.codec == "deflate":
        out = write_dng(raw, compression=8, predictor=34892, tile=tile,
                        preview_jpeg=preview)
    else:
        out = write_dng(raw, compression=7, tile=tile, preview_jpeg=preview)
    with open(args.output, "wb") as f:
        f.write(out)
    h, w = raw.mosaic.shape[:2]
    print(f"converted {w}x{h} {raw.pattern} mosaic: "
          f"{len(src)} -> {len(out)} bytes "
          f"({len(src) / max(len(out), 1):.2f}x)")
    return 0


def cmd_devices(args) -> int:
    """List accelerator devices (the GPU adapter-picker analog,
    rust-godot-legacy settings_window.gd:46-49)."""
    import jax

    for i, d in enumerate(jax.devices()):
        print(f"[{i}] {d.platform}: {d}")
    return 0


def cmd_serve(args) -> int:
    from .server import main as server_main

    return server_main(
        ([args.image] if args.image else [])
        + ["--port", str(args.port)]
        + (["--segmenter", args.segmenter] if args.segmenter else [])
        + (["--no-host-drag"] if args.no_host_drag else [])
        + (["--lens-correct", args.lens_correct_srv]
           if getattr(args, "lens_correct_srv", None) else [])
        + sum((["--lens-db", d] for d in (args.lens_db_srv or [])), [])
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="rawphotoforge-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_info = sub.add_parser("info", help="print image dims + EXIF")
    p_info.add_argument("image")
    p_info.add_argument("--preview", type=str, default=None,
                        help="extract the embedded JPEG preview to this path")
    p_info.add_argument("--verify-decode", action="store_true",
                        help="correlate the developed sensor decode against "
                             "the embedded camera preview (silent-wrong "
                             "detector for vendor RAWs; exit 1 below the "
                             "0.9 gate)")
    p_info.add_argument("--lens-db", type=str, action="append", default=None,
                        help="extra lensfun XML file/dir for the lens "
                             "profile match line (repeatable)")
    p_info.set_defaults(fn=cmd_info)

    p_dev = sub.add_parser("develop", help="develop one image")
    p_dev.add_argument("input")
    p_dev.add_argument("output")
    _add_edit_flags(p_dev)
    p_dev.set_defaults(fn=cmd_develop)

    p_batch = sub.add_parser("batch", help="develop a directory of images")
    p_batch.add_argument("input_dir")
    p_batch.add_argument("output_dir")
    p_batch.add_argument("--no-mesh", action="store_true",
                         help="force the single-device loop even when "
                              "multiple devices are visible")
    _add_edit_flags(p_batch)
    p_batch.set_defaults(fn=cmd_batch)

    p_cv = sub.add_parser(
        "convert", help="transcode a RAW to a compressed DNG")
    p_cv.add_argument("input")
    p_cv.add_argument("output")
    p_cv.add_argument("--tile", type=str, default=None,
                      help='tile size "HxW" (e.g. 256x256); default: one strip')
    p_cv.add_argument("--codec", choices=("ljpeg", "deflate"),
                      default="ljpeg",
                      help="DNG compression: lossless JPEG (7) or deflate (8)")
    p_cv.add_argument("--no-preview", action="store_true",
                      help="do not carry the source's embedded JPEG preview "
                           "into the output")
    p_cv.set_defaults(fn=cmd_convert)

    p_ls = sub.add_parser("devices", help="list accelerator devices")
    p_ls.set_defaults(fn=cmd_devices)

    p_srv = sub.add_parser("serve", help="run the interactive preview server")
    p_srv.add_argument("image", nargs="?")
    p_srv.add_argument("--port", type=int, default=8080)
    p_srv.add_argument("--segmenter", type=str, default=None,
                       help="external AI-mask command: cmd image.png x y out.npy")
    p_srv.add_argument("--no-host-drag", action="store_true",
                       help="device-render LOW drag previews (exact but "
                            "tunnel-bound) instead of the host mirror")
    p_srv.add_argument("--lens-correct", dest="lens_correct_srv",
                       nargs="?", const="auto", default=None,
                       choices=["auto", "calibrated-only"],
                       help="auto-apply a lens profile matched from each "
                            "opened file's EXIF ('calibrated-only' skips "
                            "bundled approximate profiles)")
    p_srv.add_argument("--lens-db", dest="lens_db_srv", action="append",
                       default=None,
                       help="extra lensfun XML file/dir (repeatable)")
    p_srv.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    from ..errors import PhotoEditorError

    # Honor the settings' adapter pick (device_index) in the CLI too —
    # the server already does (gpu_image_processing.rs:43-51 analog).
    # Only for commands that compute: `convert`/`info` are pure
    # numpy/C++ paths that must keep working offline, and backend init
    # through the tunnel costs seconds.
    if args.cmd in ("develop", "batch"):
        from ..engine.session import Settings

        try:
            Settings.load().select_device()
        except Exception:  # noqa: BLE001 — no accelerator reachable:
            pass           # the command surfaces its own typed error
    try:
        return args.fn(args)
    except PhotoEditorError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
