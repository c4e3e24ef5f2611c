"""Device-mesh parallelism: batch-sharded export and spatially-sharded develop.

The reference is strictly single-GPU (SURVEY.md §2.6) — its only parallelism
is SIMT threads inside one kernel dispatch. The TPU-native equivalents here:

* ``make_mesh`` — a 2-D ('batch', 'sp') mesh over ICI.
* ``batch_develop_sharded`` — the 256-image export config: images sharded
  over 'batch', develop vmapped per shard; zero communication.
* ``develop_spatial_sharded`` — one huge image sharded over rows ('sp');
  the develop stack is pointwise so XLA partitions it with no collectives
  (vignette uses positionally-correct global iota under SPMD).
* ``histogram_sharded`` — per-shard partial 256-bin histograms combined
  with an explicit psum over the mesh (shard_map), the TPU analog of the
  reference's CPU cv2.calcHist (raw_photo_forge.py:1849-1862).
* ``full_step`` — develop + histogram + clip stats in one jitted program
  over the mesh; the "training step" equivalent used by the multichip
  dry-run.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from ._compat import shard_map

from ..core.params import DevelopParams
from ..ops import develop as dev
from ..ops.stats import NUM_BINS


def make_mesh(n_batch: int | None = None, n_spatial: int = 1, devices=None) -> Mesh:
    """Build a ('batch', 'sp') mesh. Defaults to all devices on 'batch'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_batch is None:
        n_batch = devices.size // n_spatial
    need = n_batch * n_spatial
    if n_batch < 1 or need > devices.size:
        raise ValueError(
            f"mesh shape ({n_batch} batch x {n_spatial} sp) needs {need} "
            f"devices, have {devices.size}"
        )
    devices = devices[:need].reshape(n_batch, n_spatial)
    return Mesh(devices, axis_names=("batch", "sp"))


def batch_develop_sharded(
    imgs: jax.Array, params: DevelopParams, masks: jax.Array, mesh: Mesh
) -> jax.Array:
    """Data-parallel batch develop: imgs [N, 3, H, W] sharded over 'batch'.

    Parameters and masks are replicated (broadcast once, reused every
    frame — unlike the reference's per-call re-upload,
    gpu_image_processing.rs:250-307).
    """
    img_sharding = NamedSharding(mesh, P("batch", None, None, None))
    repl = NamedSharding(mesh, P())
    imgs = jax.lax.with_sharding_constraint(imgs, img_sharding)
    params = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, repl), params)
    masks = jax.lax.with_sharding_constraint(masks, repl)
    return dev.develop_batch(imgs, params, masks)


def develop_spatial_sharded(
    planes: jax.Array, params: DevelopParams, masks: jax.Array, mesh: Mesh,
    use_pallas: bool = False,
) -> jax.Array:
    """Single-image develop with rows sharded over the 'sp' axis.

    The post-geometry stack is pointwise, so the XLA partitioner runs it
    with zero collectives; the lens-distortion gather — the one stage with
    cross-shard reads — runs row-sharded too, exchanging only the
    bounded-displacement halo rows (spatial.distortion_sharded). Nothing
    in the step computes replicated full-image data.

    ``use_pallas``: run the fused develop kernel per shard under
    shard_map (the production multi-chip path: each chip executes the
    same VMEM-tile megakernel on its row slab, with the shard's global
    row offset feeding the vignette coordinates) instead of the jnp
    anchor stack. Output matches the single-device kernel exactly.
    """
    from . import spatial

    row_sharding = NamedSharding(mesh, P(None, "sp", None))
    planes = jax.lax.with_sharding_constraint(planes, row_sharding)
    geo = spatial.distortion_sharded(
        planes, params.distortion, mesh, extent=params.extent)
    geo = jax.lax.with_sharding_constraint(geo, row_sharding)
    masks = jax.lax.with_sharding_constraint(
        masks, NamedSharding(mesh, P(None, "sp", None))
    )
    if use_pallas:
        import dataclasses

        from ..kernels import fused

        # Per-shard kernels see only their row slab, so the true global
        # extent must ride in params (the single-device kernel can fall
        # back to the array shape; a shard cannot).
        ext = jnp.where(
            params.extent > 0, params.extent,
            jnp.asarray(planes.shape[1:], jnp.float32),
        )
        params = dataclasses.replace(params, extent=ext)
        n_sp = mesh.shape["sp"]
        h = geo.shape[1]
        # shard_map needs evenly divisible dims: pad with edge rows (the
        # vignette normalizes by the TRUE extent in params, so padded
        # rows render garbage that is sliced off below).
        pad = (-h) % n_sp
        if pad:
            geo = jnp.concatenate(
                [geo, jnp.repeat(geo[:, -1:], pad, axis=1)], axis=1)
            masks = jnp.concatenate(
                [masks, jnp.repeat(masks[:, -1:], pad, axis=1)], axis=1)
        local_rows = (h + pad) // n_sp

        def local_fn(g, p, m):
            off = jax.lax.axis_index("sp") * local_rows
            return fused.develop_post_geo_fused(g, p, m, row_offset=off)

        out = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(None, "sp", None), P(), P(None, "sp", None)),
            out_specs=P(None, "sp", None),
            check_vma=False,  # axis_index makes shard values device-varying
        )(geo, params, masks)
        return out[:, :h, :] if pad else out
    out = dev.develop_post_geo(geo, params, masks)
    return jax.lax.with_sharding_constraint(out, row_sharding)


def histogram_sharded(srgb_planes: jax.Array, mesh: Mesh) -> jax.Array:
    """[3, H, W] sRGB planes (row-sharded over 'sp') -> replicated [4, 256]
    histogram via per-shard partials + explicit psum over the mesh.

    Per-shard work reuses ops/stats.histogram_rgbl (the per-bin
    fused-reduction formulation — bincount is a scatter and compiles
    pathologically on TPU). Heights that don't divide the 'sp' axis pad
    with out-of-gamut rows binned into 255, whose known count is
    subtracted after the psum."""
    from ..ops.stats import histogram_rgbl

    n_sp = mesh.shape["sp"]
    _, h, w = srgb_planes.shape
    pad = (-h) % n_sp
    if pad:
        srgb_planes = jnp.concatenate(
            [srgb_planes,
             jnp.full((3, pad, w), 2.0, srgb_planes.dtype)], axis=1)

    def partial_hist(local: jax.Array) -> jax.Array:
        # Rows are split over 'sp' only; the image is replicated over
        # 'batch', so the reduction rides the 'sp' ICI ring.
        return jax.lax.psum(histogram_rgbl(local), axis_name="sp")

    hist = shard_map(
        partial_hist,
        mesh=mesh,
        in_specs=P(None, "sp", None),
        out_specs=P(),
    )(srgb_planes)
    if pad:
        hist = hist.at[:, NUM_BINS - 1].add(-pad * w)
    return hist


def full_step(
    planes: jax.Array, params: DevelopParams, masks: jax.Array, mesh: Mesh
):
    """One full interactive-frame step over the mesh: spatially-sharded
    develop of a single image + cross-shard histogram + clip fractions.
    This is the program the multichip dry-run jit-compiles."""
    srgb = develop_spatial_sharded(planes, params, masks, mesh)
    hist = histogram_sharded(srgb, mesh)
    # Canonical clip semantics (ops/stats.clipping_stats): fraction of
    # PIXELS with any clipped channel, not the per-element mean.
    hi_clip = jnp.mean(
        jnp.any(srgb >= 1.0 - 0.5 / 255.0, axis=0).astype(jnp.float32))
    return srgb, hist, hi_clip


def export_batch_step(
    imgs: jax.Array, params: DevelopParams, masks: jax.Array, mesh: Mesh
):
    """Batch export step: sharded develop + per-image u8 quantization."""
    srgb = batch_develop_sharded(imgs, params, masks, mesh)
    return dev.encode_u8(srgb)


def entropy_batch_sharded(
    srgb: jax.Array, mesh: Mesh, qlum: jax.Array, qchr: jax.Array,
):
    """Per-image device JPEG entropy coding over a batch-sharded render
    stack: srgb [B, 3, H, W] -> (bit_lens u16 [B, N], words u32
    [B, N*52] zero-tailed, totals i32 [B, 3]), all sharded on 'batch'.

    Zero collectives: the per-image wire (u8-grid round, fDCT,
    quantization, Huffman bit assembly, sort compaction) is independent
    per image, so the XLA partitioner keeps every stage local to the
    shard that owns the image. After the u8-grid round the math is all
    INTEGER, so for identical input pixels the streams are bit-identical
    to the single-device wire regardless of sharding or compilation —
    the dryrun certifies exactly that.

    Consumption protocol per image i (mirror encode_prepacked_device):
    REQUIRE totals[i, 2] == 0 first (nonzero = coefficients outside the
    baseline Huffman domain; the stream would be silently undecodable),
    then feed lens[i] and words[i, :totals[i, 0]] to
    native.jpeg_encode_prepacked. NOTE words rows are full capacity
    (N*52 u32 ≈ 117 MB/24MP vs a few MB of true words): the shape is
    for mesh-local consumption (each shard's rows live on the device
    that computed them); a tunnel-remote single chip should use the
    banded single-image wire (io/jpegbits.encode_prepacked_device)
    whose pre-split band buffers avoid both the capacity fetch and
    slice-at-fetch-time device programs."""
    from ..io import jpegbits

    srgb = jax.lax.with_sharding_constraint(
        srgb, NamedSharding(mesh, P("batch", None, None, None)))
    st = jpegbits._prepacked_jit()
    lens, words, totals = jax.vmap(lambda p: st.wire(p, qlum, qchr))(srgb)
    out = NamedSharding(mesh, P("batch"))
    return tuple(jax.lax.with_sharding_constraint(a, out)
                 for a in (lens, words, totals))


def export_batch_jpeg_step(
    imgs: jax.Array, params: DevelopParams, masks: jax.Array, mesh: Mesh,
    qlum: jax.Array, qchr: jax.Array,
):
    """Batch export step, FULL wire: sharded develop + per-image JPEG
    entropy coding on device (entropy_batch_sharded — see its docstring
    for the consumption protocol and the bit-exactness guarantee, which
    holds for identical DEVELOPED pixels: the sharded develop itself
    carries the usual differently-compiled-f32 ulp caveat, and an ulp
    flipping a quantization tie changes the stream, the same way
    export_batch_step's u8 output budgets a one-code delta)."""
    srgb = batch_develop_sharded(imgs, params, masks, mesh)
    return entropy_batch_sharded(srgb, mesh, qlum, qchr)


def entropy_batch_packed_sharded(
    srgb: jax.Array, mesh: Mesh, qlum: jax.Array, qchr: jax.Array,
):
    """PACKED wire over a batch-sharded render stack: each shard emits
    its images' FINISHED contiguous entropy-coded scans. srgb
    [B, 3, H, W] -> (words u32 [B, N*PACKED_OUT_WORDS] zero-tailed,
    totals i32 [B, 5]), both sharded on 'batch', zero collectives (the
    per-image wire is independent, exactly like entropy_batch_sharded).

    Consumption protocol per image i (mirror encode_packed_device):
    REQUIRE totals[i, 2] == 0 (out-of-domain coefficients),
    totals[i, 3] <= N*PACKED_ENT_WORDS and totals[i, 4] == totals[i, 0]
    <= N*PACKED_OUT_WORDS (aggregate-capacity overflow / invariant
    break — degrade that image to the prepacked wire, which has
    per-block capacity only), then feed words[i, :totals[i, 0]] and
    totals[i, 1] bits to native.jpeg_encode_packed. The same integer
    bit-exactness guarantee applies: identical developed pixels give
    byte-identical files to the single-device packed wire."""
    from ..io import jpegbits

    srgb = jax.lax.with_sharding_constraint(
        srgb, NamedSharding(mesh, P("batch", None, None, None)))
    st = jpegbits._prepacked_jit()
    caps = (jpegbits.PACKED_ENT_WORDS, jpegbits.PACKED_OUT_WORDS)
    words, totals = jax.vmap(
        lambda p: st.wire_packed(p, qlum, qchr, *caps))(srgb)
    out = NamedSharding(mesh, P("batch"))
    return tuple(jax.lax.with_sharding_constraint(a, out)
                 for a in (words, totals))


def export_batch_raw_fused_packed_step(
    mosaics: jax.Array, wb: jax.Array, cam: jax.Array,
    params: DevelopParams, sharpen: jax.Array, mesh: Mesh,
    qlum: jax.Array, qchr: jax.Array, pattern: str,
    cap_ent: int, cap_out: int,
):
    """Bench-config-5's RAW->finished-JPEG-scan pipeline, batch-sharded
    with PER-CHIP speed-of-light intact: shard_map over 'batch' hands
    each device ONE unbatched image, so the one-pass fused Pallas RAW
    kernel (kernels/raw_pipeline.raw_develop_fused — mosaic read once,
    sRGB written once) runs exactly as it does single-device, followed by
    the PACKED entropy wire. No vmap over the Pallas kernel, zero
    collectives.

    mosaics [N, H, W] with N == mesh batch size (ONE image per device
    per dispatch — a lax.map over multiple 24MP images in one program
    keeps every iteration's compaction intermediates live at once and
    hard-crashes the TPU worker, CLAUDE.md); H, W multiples of 16.
    wb [3], cam [3,3], params, sharpen replicated. Returns (words u32
    [N, nblocks*cap_out] zero-tailed, totals i32 [N, 5]) sharded on
    'batch'; consumption protocol = entropy_batch_packed_sharded's.
    Byte-exactness: identical developed pixels give byte-identical scans
    to the single-device packed wire (integer math after the u8 round)."""
    from ..io import jpegbits
    from ..kernels.raw_pipeline import raw_develop_fused

    if int(mosaics.shape[0]) != int(mesh.shape["batch"]):
        raise ValueError(
            f"one image per device: got {mosaics.shape[0]} images for a "
            f"{mesh.shape['batch']}-way batch axis")
    st = jpegbits._prepacked_jit()

    def local_fn(local, wb_, cam_, sharpen_, params_, qlum_, qchr_):
        srgb = raw_develop_fused(local[0], wb_, cam_, params_, sharpen_,
                                 pattern=pattern)
        words, totals = st.wire_packed(srgb, qlum_, qchr_,
                                       cap_ent, cap_out)
        return words[None], totals[None]

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("batch", None, None), P(), P(), P(), P(), P(), P()),
        out_specs=(P("batch"), P("batch")),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )(mosaics, wb, cam, sharpen, params, qlum, qchr)


def export_batch_editor_packed_step(
    geos: jax.Array, params: DevelopParams, mesh: Mesh,
    qlum: jax.Array, qchr: jax.Array, true_shape: tuple[int, int],
    cap_ent: int, cap_out: int,
):
    """The editor's render->encode tail, batch-sharded: the PRODUCT entry
    for multi-device batch export (``cli batch`` / the server's batch
    export route through ``app.cli._batch_mesh_path``).

    ``geos`` [N, 3, Hb, Wb] are post-geometry BUCKET-PADDED planes — the
    exact tensors ``engine.editor._geo_at(FULL)`` holds (demosaic + crop +
    orientation + lens distortion + sharpen already applied), sharded over
    'batch'. ``params`` is one replicated extent-traced DevelopParams (the
    whole batch shares one edit, the CLI contract); ``true_shape`` is the
    static true extent shared by the group (callers group images by
    (bucket shape, extent)).

    Per image this computes ``develop_post_geo`` (the jnp anchor — the
    same program ``editor._render_padded`` runs on the exact path) and the
    PACKED JPEG wire on the padded MCU grid (true blocks only), so for
    identical input planes the emitted scan is BYTE-IDENTICAL to a
    single-device ``editor.save_bytes("JPEG")`` of the same session —
    everything after the u8-grid round is integer math. Zero collectives:
    each device develops and entropy-codes only its own images.

    Returns (words u32 [N, nblocks*cap_out] zero-tailed, totals i32
    [N, 5]), sharded on 'batch'. Consumption protocol per image i =
    entropy_batch_packed_sharded's: require totals[i,2]==0,
    totals[i,3] <= nblocks*cap_ent, totals[i,4]==totals[i,0] <=
    nblocks*cap_out, then native.jpeg_encode_packed(words[i,:totals[i,0]],
    totals[i,1], h, w)."""
    from ..io import jpegbits

    geos = jax.lax.with_sharding_constraint(
        geos, NamedSharding(mesh, P("batch", None, None, None)))
    repl = NamedSharding(mesh, P())
    params = jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, repl), params)
    st = jpegbits._prepacked_jit()
    th, tw = int(true_shape[0]), int(true_shape[1])

    def one(g):
        srgb = dev.develop_post_geo(g, params, None)
        return st.wire_packed_extent(srgb, qlum, qchr, th, tw,
                                     cap_ent, cap_out)

    words, totals = jax.vmap(one)(geos)
    out = NamedSharding(mesh, P("batch"))
    return tuple(jax.lax.with_sharding_constraint(a, out)
                 for a in (words, totals))


def export_batch_jpeg_packed_step(
    imgs: jax.Array, params: DevelopParams, masks: jax.Array, mesh: Mesh,
    qlum: jax.Array, qchr: jax.Array,
):
    """Batch export step over the PACKED wire: sharded develop + the
    finished contiguous scan per image (entropy_batch_packed_sharded —
    see its docstring for the consumption protocol). The production
    batch shape: each shard's output is ~its images' finished JPEG
    scans, so gathering results off the mesh moves the minimum bytes."""
    srgb = batch_develop_sharded(imgs, params, masks, mesh)
    return entropy_batch_packed_sharded(srgb, mesh, qlum, qchr)
