"""Kernel-vs-anchor fuzz ON THE REAL TPU (tests run it on CPU interpret).

Run on hardware (~10-30 min, remote-compile dominated): N random
full-parameter draws, M in {1,2,3} masks, through the Mosaic-compiled
fused kernel vs the exact-LUT jnp anchor, plus the one-pass RAW kernel
vs the composed demosaic+develop path.

The Mosaic-compiled kernel is the production artifact; the committed
per-round JSON (``--out TPUFUZZ_rNN.json``) records backend, git HEAD,
per-seed deviation stats and the pass/fail verdict, so on-hardware
kernel correctness is a regenerable artifact, not a commit message:

    python tools/tpu_fuzz.py --out TPUFUZZ_r03.json
"""
import argparse
import datetime
import json
import subprocess
import sys

import os
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import numpy as np
import jax
import jax.numpy as jnp

ap = argparse.ArgumentParser()
ap.add_argument("--out", default=None,
                help="write the JSON artifact here (e.g. TPUFUZZ_r03.json)")
ap.add_argument("--seeds", type=int, default=24)
ap.add_argument("--raw-seeds", type=int, default=8)
args = ap.parse_args()

print("backend:", jax.default_backend(), flush=True)

from rawphotoforge_tpu.core.params import pack_params
from rawphotoforge_tpu.kernels import fused
from rawphotoforge_tpu.ops import develop as dev
from test_fuzz import (_random_params, assert_fuzz_close,
                       assert_staircase_explained)


def _dev_stats(ours, ref):
    d = np.abs(np.asarray(ours, dtype=np.float64)
               - np.asarray(ref, dtype=np.float64))
    return {"median": float(np.median(d)), "mean": float(d.mean()),
            "max": float(d.max())}


h, w = 256, 512
fails = 0
fused_seeds = []
for seed in range(args.seeds):
    r = np.random.default_rng(seed + 1000)
    planes = jnp.asarray(r.random((3, h, w)).astype(np.float32))
    masks = jnp.asarray(
        np.stack([np.ones((h, w), np.float32)]
                 + [(r.random((h, w)) > 0.5).astype(np.float32)
                    for _ in range(seed % 3)]))
    params = jax.device_put(pack_params(
        [_random_params(r, allow_geometry=False)
         for _ in range(masks.shape[0])]))
    ours = fused.develop_post_geo_fused(planes, params, masks,
                                        main_mask_all_ones=True)
    ref = dev.develop_post_geo_jit(planes, params, masks)
    stats = _dev_stats(ours, ref)
    try:
        assert_fuzz_close(ours, ref)
        # Staircase-aware gate (round 4): every outlier pixel must be
        # EXPLAINED by an adjacent-index flip (it must lie within the
        # envelope of the anchor run with each curve family's LUT
        # shifted one index either way), not merely fall under a flat
        # max bound — a genuine localized defect below 0.06 would have
        # passed the old gate. flip_frac is recorded per seed.
        flip_frac, _ = assert_staircase_explained(
            np.asarray(ours), planes, params, masks)
        stats["flip_frac"] = flip_frac
        ok = True
        print(f"seed {seed}: ok (M={masks.shape[0]}, "
              f"max={stats['max']:.2e}, flips={flip_frac:.2%})", flush=True)
    except AssertionError as e:
        ok = False
        fails += 1
        print(f"seed {seed}: FAIL {e}", flush=True)
    fused_seeds.append({"seed": seed, "masks": int(masks.shape[0]),
                        "ok": ok, **stats})

print("TPU FUZZ RESULT:", "PASS" if fails == 0 else f"{fails} FAILURES")

# --- part 1b: per-mask per-slot default-curve elision (r5) -----------------
# The slot shortcuts must be BIT-identical to the general kernel on the
# Mosaic-compiled artifact, per mask stack with mixed edited/default
# curve families.
from rawphotoforge_tpu.core.params import default_curve_slots
from test_fuzz import _random_params as _rp

se_fails = 0
se_seeds = []
for seed in range(8):
    r = np.random.default_rng(seed + 9000)
    m = 2 + seed % 3
    edits = []
    for k in range(m):
        e = _rp(r, allow_geometry=False)
        # Reset a random subset of curve families to default so the slot
        # table actually elides something different per mask.
        from rawphotoforge_tpu.core.params import CurveState
        for slot in range(4):
            if r.random() < 0.6:
                e.curves[slot] = CurveState()
        edits.append(e)
    slots = default_curve_slots(edits)
    planes = jnp.asarray(r.random((3, h, w)).astype(np.float32))
    masks = jnp.asarray(np.stack(
        [np.ones((h, w), np.float32)]
        + [(r.random((h, w)) > 0.5).astype(np.float32)
           for _ in range(m - 1)]))
    params = jax.device_put(pack_params(edits))
    general = np.asarray(fused.develop_post_geo_fused(
        planes, params, masks, main_mask_all_ones=True))
    elided = np.asarray(fused.develop_post_geo_fused(
        planes, params, masks, main_mask_all_ones=True,
        default_curve_slots=slots))
    n_diff = int((general != elided).sum())
    ok = n_diff == 0
    se_fails += 0 if ok else 1
    n_elided = sum(sum(sl) for sl in slots)
    print(f"slots seed {seed}: {'ok' if ok else 'FAIL'} (M={m}, "
          f"{n_elided}/{4 * m} slots default, diff_px={n_diff})",
          flush=True)
    se_seeds.append({"seed": seed, "masks": m, "ok": ok,
                     "slots": [list(map(bool, sl)) for sl in slots],
                     "diff_px": n_diff})
print("TPU SLOT-ELISION RESULT:",
      "PASS" if se_fails == 0 else f"{se_fails} FAILURES")

# --- part 2: the one-pass RAW kernel vs the composed path, on hardware ---
from rawphotoforge_tpu.kernels import raw_pipeline
from rawphotoforge_tpu.ops import demosaic as dm
from rawphotoforge_tpu.ops.sharpen import unsharp_mask

raw_fails = 0
raw_seeds = []
for seed in range(args.raw_seeds):
    r = np.random.default_rng(seed + 2000)
    pattern = ["RGGB", "BGGR", "GRBG", "GBRG"][seed % 4]
    mosaic = jnp.asarray(r.random((192, 512)).astype(np.float32))
    wb = jnp.asarray([r.uniform(1.2, 2.4), 1.0, r.uniform(1.1, 2.0)],
                     dtype=jnp.float32)
    cam = jnp.asarray(dm.cam_matrix_to_srgb(np.array(
        [[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]])))
    params = jax.device_put(pack_params(
        [_random_params(r, allow_geometry=False)]))
    sharpen = jnp.float32(r.uniform(0.0, 1.5))

    one_pass = np.asarray(raw_pipeline.raw_develop_fused(
        mosaic, wb, cam, params, sharpen, pattern=pattern))
    rgb = dm.develop_raw(mosaic, wb, cam, pattern=pattern, method="malvar")
    rgb = jax.lax.cond(sharpen != 0.0,
                       lambda x: unsharp_mask(x, sharpen), lambda x: x, rgb)
    masks = jnp.ones((1,) + mosaic.shape, dtype=jnp.float32)
    composed = np.asarray(fused.develop_post_geo_fused(
        rgb, params, masks, main_mask_all_ones=True))
    stats = _dev_stats(one_pass, composed)
    # Random steep curves: same fuzz-grade bound as part 1, plus slack for
    # the one-pass kernel's f32 demosaic reassociation.
    ok = (stats["median"] < 1e-4 and stats["mean"] < 2e-3
          and stats["max"] < 0.08)
    if ok:
        print(f"raw seed {seed}: ok ({pattern}, sharpen={float(sharpen):.2f}, "
              f"max={stats['max']:.2e})", flush=True)
    else:
        raw_fails += 1
        print(f"raw seed {seed}: FAIL median={stats['median']:.2e} "
              f"mean={stats['mean']:.2e} max={stats['max']:.2e}", flush=True)
    raw_seeds.append({"seed": seed, "pattern": pattern,
                      "sharpen": float(sharpen), "ok": ok, **stats})

print("TPU RAW FUZZ RESULT:",
      "PASS" if raw_fails == 0 else f"{raw_fails} FAILURES")

# --- part 3: the X-Trans one-pass kernel vs the composed residual path ---
# Interior-only comparison: the kernel's border uses a phase-preserving
# periodic continuation while the jnp path reflect-pads intermediates
# (kernels/raw_pipeline._xtrans docstring) — the outer 12 px legitimately
# differ on noise inputs.
xt_fails = 0
xt_seeds = []
for seed in range(max(2, args.raw_seeds // 2)):
    r = np.random.default_rng(seed + 3000)
    mosaic = jnp.asarray(r.random((192, 768)).astype(np.float32))
    wb = jnp.asarray([r.uniform(1.2, 2.4), 1.0, r.uniform(1.1, 2.0)],
                     dtype=jnp.float32)
    cam = jnp.asarray(dm.cam_matrix_to_srgb(np.array(
        [[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]])))
    params = jax.device_put(pack_params(
        [_random_params(r, allow_geometry=False)]))
    sharpen = jnp.float32(r.uniform(0.0, 1.5))

    one_pass = np.asarray(raw_pipeline.raw_develop_fused(
        mosaic, wb, cam, params, sharpen, pattern="XTRANS"))
    rgb = dm.develop_raw(mosaic, wb, cam, pattern="XTRANS",
                         method="residual")
    rgb = jax.lax.cond(sharpen != 0.0,
                       lambda x: unsharp_mask(x, sharpen), lambda x: x, rgb)
    masks = jnp.ones((1,) + mosaic.shape, dtype=jnp.float32)
    composed = np.asarray(fused.develop_post_geo_fused(
        rgb, params, masks, main_mask_all_ones=True))
    stats = _dev_stats(one_pass[:, 14:-14, 14:-14],
                       composed[:, 14:-14, 14:-14])
    ok = (stats["median"] < 1e-4 and stats["mean"] < 2e-3
          and stats["max"] < 0.08)
    if ok:
        print(f"xtrans seed {seed}: ok (sharpen={float(sharpen):.2f}, "
              f"max={stats['max']:.2e})", flush=True)
    else:
        xt_fails += 1
        print(f"xtrans seed {seed}: FAIL median={stats['median']:.2e} "
              f"mean={stats['mean']:.2e} max={stats['max']:.2e}", flush=True)
    xt_seeds.append({"seed": seed, "sharpen": float(sharpen), "ok": ok,
                     **stats})

print("TPU XTRANS FUZZ RESULT:",
      "PASS" if xt_fails == 0 else f"{xt_fails} FAILURES")

# --- part 4: identity_oklch variant vs the general staircase variant ---
# The editor's slider-only fast path; documented deviation bound 3e-3
# (sub-u8-quantization after encode).
io_fails = 0
io_seeds = []
for seed in range(max(2, args.raw_seeds // 2)):
    r = np.random.default_rng(seed + 4000)
    planes = jnp.asarray(r.random((3, h, w)).astype(np.float32))
    p = _random_params(r, allow_geometry=False)
    for slot in range(4):
        p.curves[slot].control_x = None  # defaults only: the variant's domain
        p.curves[slot].control_y = None
        p.curves[slot].raw_lut = None
    params = jax.device_put(pack_params([p]))
    full = np.asarray(fused.develop_post_geo_fused(
        planes, params, None, main_mask_all_ones=True,
        default_bright_curves=True, default_oklch_curves=True))
    fast = np.asarray(fused.develop_post_geo_fused(
        planes, params, None, main_mask_all_ones=True,
        default_bright_curves=True, default_oklch_curves=True,
        identity_oklch=True))
    mx = float(np.abs(full - fast).max())
    ok = mx < 3e-3
    if ok:
        print(f"identity_oklch seed {seed}: ok (max={mx:.2e})", flush=True)
    else:
        io_fails += 1
        print(f"identity_oklch seed {seed}: FAIL max={mx:.2e}", flush=True)
    io_seeds.append({"seed": seed, "ok": ok, "max": mx})

print("TPU IDENTITY-OKLCH RESULT:",
      "PASS" if io_fails == 0 else f"{io_fails} FAILURES")

# --- part 5: tone-curve mixed state (custom brightness curve riding the
# identity_oklch variant — the per-family flag split's new fast path) vs
# the fully-general kernel. Same 3e-3 documented bound.
tc_fails = 0
tc_seeds = []
for seed in range(max(2, args.raw_seeds // 2)):
    r = np.random.default_rng(seed + 5000)
    planes = jnp.asarray(r.random((3, h, w)).astype(np.float32))
    p = _random_params(r, allow_geometry=False)
    for slot in range(1, 4):
        p.curves[slot].control_x = None  # OKLCH family default
        p.curves[slot].control_y = None
        p.curves[slot].raw_lut = None
    xs = np.sort(r.choice(65533, size=2, replace=False) + 1)  # distinct interior knots
    p.set_curve(0, [0, int(xs[0]), int(xs[1]), 65535],
                sorted(int(v) for v in r.integers(0, 65536, size=4)))
    params = jax.device_put(pack_params([p]))
    general = np.asarray(fused.develop_post_geo_fused(
        planes, params, None, main_mask_all_ones=True))
    fast = np.asarray(fused.develop_post_geo_fused(
        planes, params, None, main_mask_all_ones=True,
        default_oklch_curves=True, identity_oklch=True))
    mx = float(np.abs(general - fast).max())
    ok = mx < 3e-3
    if ok:
        print(f"tone-curve seed {seed}: ok (max={mx:.2e})", flush=True)
    else:
        tc_fails += 1
        print(f"tone-curve seed {seed}: FAIL max={mx:.2e}", flush=True)
    tc_seeds.append({"seed": seed, "ok": ok, "max": mx})

print("TPU TONE-CURVE-IDENTITY RESULT:",
      "PASS" if tc_fails == 0 else f"{tc_fails} FAILURES")

# --- part 6: the sparse JPEG export wire, on hardware. The device stream
# (fDCT + quant + DC-delta + stable-sort nibble compaction) must equal the
# exact integer numpy mirror seeded from the DEVICE blockify output, and
# the native entropy coder must produce the same bytes from either side.
# One shape -> one remote compile; the f32-vs-f64 DCT stage is covered by
# the CPU suite (test_device_blocks_track_f64_oracle).
from rawphotoforge_tpu.io import jpegenc
from rawphotoforge_tpu import native as rpf_native

sw_fails = 0
sw_seeds = []
sw_h, sw_w = 512, 768
sp_full, sp_blockify, _, _ = jpegenc._sparse_jit()
ql_h, qc_h = jpegenc._quant_tables(92)
ql_d, qc_d = jnp.asarray(ql_h), jnp.asarray(qc_h)
for seed in range(max(2, args.raw_seeds // 2)):
    r = np.random.default_rng(seed + 6000)
    base = r.random((3, 1, 1)).astype(np.float32)
    planes = np.clip(base + 0.15 * r.standard_normal(
        (3, sw_h, sw_w)).astype(np.float32), 0.0, 1.0)
    pd = jnp.asarray(planes)
    blocks = np.asarray(sp_blockify(pd, ql_d, qc_d))
    ref = jpegenc._sparsify_np(jpegenc._dc_delta_np(blocks))
    dev_out = [np.asarray(x) for x in sp_full(pd, ql_d, qc_d)]
    nv, ne = int(dev_out[4][0]), int(dev_out[4][1])
    stream_ok = (
        nv == ref[4] and ne == ref[5]
        and np.array_equal(dev_out[0], ref[0])
        and np.array_equal(dev_out[1], ref[1])
        and np.array_equal(dev_out[2][: (nv + 1) // 2], ref[2])
        and np.array_equal(dev_out[3][:ne], ref[3]))
    from_device = rpf_native.jpeg_encode_sparse(
        dev_out[0], dev_out[1], dev_out[2][: (nv + 1) // 2],
        dev_out[3][:ne], sw_h, sw_w, quality=92)
    from_mirror = rpf_native.jpeg_encode_sparse(
        ref[0], ref[1], ref[2], ref[3], sw_h, sw_w, quality=92)
    ok = stream_ok and from_device == from_mirror
    density = nv / (dev_out[0].size * 64)
    if ok:
        print(f"sparse seed {seed}: ok (density={density:.2f}, "
              f"escapes={ne})", flush=True)
    else:
        sw_fails += 1
        print(f"sparse seed {seed}: FAIL stream_ok={stream_ok}", flush=True)
    sw_seeds.append({"seed": seed, "ok": ok, "n_values": nv,
                     "n_escapes": ne, "density": density})

print("TPU SPARSE-WIRE RESULT:",
      "PASS" if sw_fails == 0 else f"{sw_fails} FAILURES")

# --- part 7: the PREPACKED entropy wire, on hardware. The device-emitted
# Huffman bit streams (select-sum table lookups, 64-bit shifts as u32
# pairs, the 65-lane word accumulation) must equal the serial numpy
# oracle seeded from the DEVICE blockify output, and the finished file
# must be byte-identical to the nibble wire's — including a bucket-padded
# encode, which certifies the masked DC-delta chain (associative scan
# over true blocks) on the Mosaic/XLA:TPU compile, not just CPU.
from rawphotoforge_tpu.io import jpegbits
from rawphotoforge_tpu.utils.transfer import fetch_banded

pp_fails = 0
pp_seeds = []
st_pp = jpegbits._prepacked_jit()
pp_bounds = jpegbits._word_band_layout((sw_h // 16) * (sw_w // 16) * 6)
for seed in range(max(2, args.raw_seeds // 2)):
    r = np.random.default_rng(seed + 7000)
    base = r.random((3, 1, 1)).astype(np.float32)
    planes = np.clip(base + 0.15 * r.standard_normal(
        (3, sw_h, sw_w)).astype(np.float32), 0.0, 1.0)
    pd = jnp.asarray(planes)
    blocks = np.asarray(sp_blockify(pd, ql_d, qc_d))
    ref_lens, ref_words = jpegbits.prepacked_np(
        jpegenc._dc_delta_np(blocks))
    lens_d, word_bands, totals = st_pp.full(pd, ql_d, qc_d)
    n_words = int(np.asarray(totals)[0])
    hl = np.asarray(lens_d)
    hw = fetch_banded(word_bands, pp_bounds, n_words)
    stream_ok = (np.array_equal(hl, ref_lens)
                 and n_words == ref_words.size
                 and np.array_equal(hw[:n_words], ref_words))
    from_device = rpf_native.jpeg_encode_prepacked(
        hl, hw[:n_words], sw_h, sw_w, quality=92)
    from_nibble = jpegenc._encode_sparse_device(pd, 92)
    # Bucket-padded twin: true extent strictly inside the grid exercises
    # the masked DC chain and the true-block walk end to end.
    th, tw = sw_h - 37, sw_w - 11
    padded_pp = jpegbits.encode_prepacked_device(pd, 92,
                                                 true_shape=(th, tw))
    padded_nb = jpegenc._encode_sparse_device(pd, 92, true_shape=(th, tw))
    ok = (stream_ok and from_device == from_nibble
          and padded_pp == padded_nb)
    bits = int(hl.astype(np.int64).sum())
    if ok:
        print(f"prepacked seed {seed}: ok (bits={bits}, "
              f"words={n_words})", flush=True)
    else:
        pp_fails += 1
        print(f"prepacked seed {seed}: FAIL stream_ok={stream_ok} "
              f"full_eq={from_device == from_nibble} "
              f"padded_eq={padded_pp == padded_nb}", flush=True)
    pp_seeds.append({"seed": seed, "ok": ok, "total_bits": bits,
                     "n_words": n_words})

print("TPU PREPACKED-WIRE RESULT:",
      "PASS" if pp_fails == 0 else f"{pp_fails} FAILURES")

# --- part 8: the PACKED wire, on hardware. The device-emitted contiguous
# scan (per-block global-phase rotation in the lane pass, run-merge via
# bounded prefix-doubling OR, two stable-sort compactions) must equal
# the serial numpy oracle word for word, and the finished file must be
# byte-identical to the nibble wire's — full grid and bucket-padded.
pk_fails = 0
pk_seeds = []
pk_caps = (jpegbits.PACKED_ENT_WORDS, jpegbits.PACKED_OUT_WORDS)
pk_bounds = jpegbits._packed_band_layout((sw_h // 16) * (sw_w // 16) * 6)
for seed in range(max(2, args.raw_seeds // 2)):
    r = np.random.default_rng(seed + 8000)
    base = r.random((3, 1, 1)).astype(np.float32)
    planes = np.clip(base + 0.15 * r.standard_normal(
        (3, sw_h, sw_w)).astype(np.float32), 0.0, 1.0)
    pd = jnp.asarray(planes)
    blocks = np.asarray(sp_blockify(pd, ql_d, qc_d))
    ref_words, ref_bits = jpegbits.packed_np(jpegenc._dc_delta_np(blocks))
    word_bands, totals = st_pp.full_packed(pd, ql_d, qc_d, *pk_caps)
    tv = np.asarray(totals)
    n_words, n_bits, bad, n_ent, kept = (int(x) for x in tv)
    hw = fetch_banded(word_bands, pk_bounds, n_words)
    stream_ok = (bad == 0 and n_bits == ref_bits
                 and n_words == ref_words.size == kept
                 and np.array_equal(hw[:n_words], ref_words))
    from_device = rpf_native.jpeg_encode_packed(
        hw[:n_words], n_bits, sw_h, sw_w, quality=92)
    from_nibble = jpegenc._encode_sparse_device(pd, 92)
    th, tw = sw_h - 37, sw_w - 11
    padded_pk = jpegbits.encode_packed_device(pd, 92, true_shape=(th, tw))
    padded_nb = jpegenc._encode_sparse_device(pd, 92, true_shape=(th, tw))
    ok = (stream_ok and from_device == from_nibble
          and padded_pk == padded_nb)
    if ok:
        print(f"packed seed {seed}: ok (bits={n_bits}, words={n_words}, "
              f"entries={n_ent})", flush=True)
    else:
        pk_fails += 1
        print(f"packed seed {seed}: FAIL stream_ok={stream_ok} "
              f"full_eq={from_device == from_nibble} "
              f"padded_eq={padded_pk == padded_nb}", flush=True)
    pk_seeds.append({"seed": seed, "ok": ok, "total_bits": n_bits,
                     "n_words": n_words, "n_entries": n_ent})

print("TPU PACKED-WIRE RESULT:",
      "PASS" if pk_fails == 0 else f"{pk_fails} FAILURES")

if args.out:
    try:
        head = subprocess.run(
            ["git", "-C", _REPO, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        head = "unknown"
    artifact = {
        "git_head": head,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "when_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "shape": [3, h, w],
        "fused_kernel": {
            "seeds": args.seeds, "fails": fails,
            "worst_max_dev": max(s["max"] for s in fused_seeds),
            "worst_median_dev": max(s["median"] for s in fused_seeds),
            "per_seed": fused_seeds,
        },
        "raw_kernel": {
            "seeds": args.raw_seeds, "fails": raw_fails,
            "worst_max_dev": max(s["max"] for s in raw_seeds),
            "worst_median_dev": max(s["median"] for s in raw_seeds),
            "per_seed": raw_seeds,
        },
        "xtrans_kernel": {
            "seeds": len(xt_seeds), "fails": xt_fails,
            "worst_max_dev": max(s["max"] for s in xt_seeds),
            "worst_median_dev": max(s["median"] for s in xt_seeds),
            "per_seed": xt_seeds,
        },
        "identity_oklch": {
            "seeds": len(io_seeds), "fails": io_fails,
            "worst_max_dev": max(s["max"] for s in io_seeds),
            "per_seed": io_seeds,
        },
        "tone_curve_identity": {
            "seeds": len(tc_seeds), "fails": tc_fails,
            "worst_max_dev": max(s["max"] for s in tc_seeds),
            "per_seed": tc_seeds,
        },
        "sparse_wire": {
            "seeds": len(sw_seeds), "fails": sw_fails,
            "per_seed": sw_seeds,
        },
        "prepacked_wire": {
            "seeds": len(pp_seeds), "fails": pp_fails,
            "per_seed": pp_seeds,
        },
        "packed_wire": {
            "seeds": len(pk_seeds), "fails": pk_fails,
            "per_seed": pk_seeds,
        },
        "slot_elision": {
            "seeds": len(se_seeds), "fails": se_fails,
            "per_seed": se_seeds,
        },
        "ok": fails == 0 and raw_fails == 0 and xt_fails == 0
              and io_fails == 0 and tc_fails == 0 and sw_fails == 0
              and pp_fails == 0 and pk_fails == 0 and se_fails == 0,
    }
    with open(os.path.join(_REPO, args.out) if not os.path.isabs(args.out)
              else args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}", flush=True)

sys.exit(0 if fails == 0 and raw_fails == 0 and xt_fails == 0
         and io_fails == 0 and tc_fails == 0 and sw_fails == 0
         and pp_fails == 0 and se_fails == 0 else 1)
