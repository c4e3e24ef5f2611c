"""Extended soak: heavier fuzzing than the CI-sized suites.

Run occasionally (~10 min on CPU): 1500 mutations per container variant,
12 extra editor cache-coherence seeds, 6 extra geodesic-vs-Dijkstra
configurations. Exits nonzero on any failure."""
import sys

import os
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from rawphotoforge_tpu._errbase import PhotoEditorError
from rawphotoforge_tpu.io import dng
from rawphotoforge_tpu.io.raw import parse_raw

fails = []

# 1. Container mutation soak: 1500 mutations per variant.
from test_dng_fuzz import _variants
from test_cr2 import build_cr2

variants = dict(_variants())
rng0 = np.random.default_rng(12345)
variants["cr2"] = build_cr2(
    rng0.integers(0, 16000, size=(48, 48), dtype=np.uint16))

# The r3 vendor containers (uncompressed NEF/ARW shapes via TIFF-EP,
# Panasonic RW2, Fujifilm RAF) get the same mutation budget as the DNG
# family — their parsers walk offset tables and bit-unpack payloads, the
# exact shape of code mutation fuzz catches.
from rawphotoforge_tpu.io import vendor_raw as _vr
from rawphotoforge_tpu.io.raw import synthetic_raw as _synth

_img = rng0.random((3, 48, 48), dtype=np.float32) * 0.8


def _vraw(pattern):
    return _synth(_img, pattern=pattern, black_level=512,
                  white_level=16383)


variants["nef"] = _vr.write_tiff_ep(_vraw("RGGB"), bits=14,
                                    make="NIKON CORPORATION")
variants["arw"] = _vr.write_tiff_ep(_vraw("RGGB"), bits=16,
                                    make="SONY")
variants["rw2"] = _vr.write_rw2(_vraw("GBRG"))
variants["raf"] = _vr.write_raf(_vraw("XTRANS"))

# r5 packed bitstream codecs: the ARW2 block decoder and the RAW4 bit
# reader consume attacker-shaped bytes directly — prime mutation
# targets.
_codes = (300 + rng0.integers(0, 100, (24, 64))).astype(np.uint16)
_arw2 = dng.RawImage(mosaic=_codes, pattern="RGGB", black_level=512,
                     white_level=16300, wb_gains=(2.0, 1.0, 1.5),
                     xyz_to_cam=None, exif={})
variants["arw2"] = _vr.write_tiff_ep(
    _arw2, bits=8, make="SONY", compression=32767, sony_tags=True,
    arw2_curve_knots=[4000, 8000, 12000, 16000])
_m12 = (500 + np.cumsum(rng0.integers(-30, 31, (14, 28)), axis=1)
        ).clip(16, 4095).astype(np.uint16)
variants["raw4"] = _vr.write_rw2(dng.RawImage(
    mosaic=_m12, pattern="RGGB", black_level=157, white_level=4095,
    wb_gains=(1.0, 1.0, 1.0), xyz_to_cam=None, exif={}), raw_format=4)

for name, data in sorted(variants.items()):
    rng = np.random.default_rng(abs(hash("soak" + name)) % 2**32)
    for trial in range(1500):
        buf = bytearray(data)
        kind = trial % 4
        if kind == 0:
            buf = buf[: int(rng.integers(1, len(buf)))]
        elif kind == 1:
            for _ in range(int(rng.integers(1, 16))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        elif kind == 2:
            a = int(rng.integers(0, len(buf) - 1))
            b = min(len(buf), a + int(rng.integers(1, 256)))
            buf[a:b] = bytes(b - a)
        else:  # random splice of two regions
            a = int(rng.integers(0, len(buf) - 8))
            b = int(rng.integers(0, len(buf) - 8))
            buf[a : a + 8] = data[b : b + 8]
        try:
            parse_raw(bytes(buf))
        except PhotoEditorError:
            pass
        except Exception as e:  # noqa: BLE001
            fails.append((name, trial, type(e).__name__, str(e)[:100]))
    print(f"soak fuzz {name}: done ({len(fails)} total failures so far)",
          flush=True)

# 2. Editor cache-coherence soak: 12 extra seeds.
import test_fuzz
from conftest import random_linear_image  # noqa: F401

for seed in range(100, 112):
    rng = np.random.default_rng(seed)
    try:
        test_fuzz.test_editor_cache_coherence_random_sequences(rng)
    except Exception as e:  # noqa: BLE001
        fails.append(("editor-fuzz", seed, type(e).__name__, str(e)[:160]))
    print(f"soak editor seed {seed}: ok={len(fails) == 0}", flush=True)

# 3. Geodesic vs Dijkstra: 6 extra random configurations.
import test_smart_select as tss
import jax.numpy as jnp
from rawphotoforge_tpu.ops import masking

for seed in range(50, 56):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(8, 20))
    w = int(rng.integers(8, 20))
    planes = rng.random((3, h, w)).astype(np.float32)
    point = (int(rng.integers(0, h)), int(rng.integers(0, w)))
    ew = float(rng.uniform(2, 12))
    got = np.asarray(masking.geodesic_distance(
        jnp.asarray(planes), jnp.asarray(point, dtype=jnp.int32),
        jnp.float32(ew), jnp.float32(0.01), sweeps=14))
    want = tss._dijkstra_oracle(planes, point, ew, 0.01)
    if not np.allclose(got, want, rtol=1e-4, atol=1e-5):
        fails.append(("geodesic", seed, "mismatch",
                      f"max {np.abs(got - want).max():.2e}"))
    print(f"soak geodesic seed {seed}: ok", flush=True)

print("SOAK RESULT:", "PASS" if not fails else f"{len(fails)} FAILURES")
for f in fails[:20]:
    print("  ", f)
sys.exit(0 if not fails else 1)
