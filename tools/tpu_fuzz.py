"""Kernel-vs-anchor fuzz ON THE REAL TPU (tests run it on CPU interpret).

Run on hardware (~10-30 min, remote-compile dominated): 24 random
full-parameter draws, M in {1,2,3} masks, through the Mosaic-compiled
fused kernel vs the exact-LUT jnp anchor.

The Mosaic-compiled kernel is the production artifact; this drives N
random full-parameter draws through both paths on hardware.
"""
import sys

import os
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from rawphotoforge_tpu.core.params import pack_params
from rawphotoforge_tpu.kernels import fused
from rawphotoforge_tpu.ops import develop as dev
from test_fuzz import _random_params, assert_fuzz_close

h, w = 256, 512
fails = 0
for seed in range(24):
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
    try:
        assert_fuzz_close(ours, ref)
        print(f"seed {seed}: ok (M={masks.shape[0]})", flush=True)
    except AssertionError as e:
        fails += 1
        print(f"seed {seed}: FAIL {e}", flush=True)

print("TPU FUZZ RESULT:", "PASS" if fails == 0 else f"{fails} FAILURES")

# --- part 2: the one-pass RAW kernel vs the composed path, on hardware ---
from rawphotoforge_tpu.kernels import raw_pipeline
from rawphotoforge_tpu.ops import demosaic as dm
from rawphotoforge_tpu.ops.sharpen import unsharp_mask

raw_fails = 0
for seed in range(8):
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
    d = np.abs(one_pass.astype(np.float64) - composed.astype(np.float64))
    # Random steep curves: same fuzz-grade bound as part 1, plus slack for
    # the one-pass kernel's f32 demosaic reassociation.
    ok = np.median(d) < 1e-4 and d.mean() < 2e-3 and d.max() < 0.08
    if ok:
        print(f"raw seed {seed}: ok ({pattern}, sharpen={float(sharpen):.2f})",
              flush=True)
    else:
        raw_fails += 1
        print(f"raw seed {seed}: FAIL median={np.median(d):.2e} "
              f"mean={d.mean():.2e} max={d.max():.2e}", flush=True)

print("TPU RAW FUZZ RESULT:",
      "PASS" if raw_fails == 0 else f"{raw_fails} FAILURES")
sys.exit(0 if fails == 0 and raw_fails == 0 else 1)
