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
sys.exit(0 if fails == 0 else 1)
