import json
import numpy as np


V1 = {
    "exposure": 0.8, "contrast": 25, "shadow": -10, "highlight": 5,
    "black": 0, "white": 0, "wb_temperature": 12, "wb_tint": -4,
    "brightness_curve_points": [[0, 0], [30000, 40000], [65535, 65535]],
    "oklch_h_curve_points": [[0, 0], [65535, 65535]],
    "oklch_c_curve_points": [[0, 32767.5], [40000, 45000], [65535, 32767.5]],
    "oklch_l_curve_points": [[0, 32767.5], [65535, 32767.5]],
    "vignette": 40, "mask_range": 0.0,
}


def test_from_json_v1_schema():
    from rawphotoforge_tpu.core.params import (
        BRIGHTNESS, SATURATION, EditParameters)

    p = EditParameters.from_json(V1)
    assert p.exposure == 0.8 and p.contrast == 25 and p.vignette == 40
    assert p.wb_temperature == 12 and p.wb_tint == -4
    b = p.curves[BRIGHTNESS]
    assert list(b.control_x) == [0, 30000, 65535]
    assert list(b.control_y) == [0, 40000, 65535]
    s = p.curves[SATURATION]
    assert list(s.control_x) == [0, 40000, 65535]


def test_from_json_v1_legacy_aliases():
    from rawphotoforge_tpu.core.params import HUE, EditParameters

    d = {"exposure": 0.1,
         "hue_curve_points": [[0, 100], [65535, 65400]]}
    p = EditParameters.from_json(d)
    assert list(p.curves[HUE].control_y) == [100, 65400]


def test_from_json_v1_ignored_when_curves_present():
    from rawphotoforge_tpu.core.params import BRIGHTNESS, EditParameters

    d = {"curves": {"brightness": {"x": [0, 65535], "y": [0, 60000]}},
         "brightness_curve_points": [[0, 0], [65535, 1000]]}
    p = EditParameters.from_json(d)
    assert list(p.curves[BRIGHTNESS].control_y) == [0, 60000]


def test_editor_loads_v1_preset(rng):
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    planes = rng.uniform(0.1, 0.9, (3, 24, 32)).astype(np.float32)
    ed = PhotoEditor(planes)
    ed.set_crop(2, 2, 20, 20)
    ed.load_preset_json(json.dumps(V1))
    main = next(m for m in ed.masks if m.name == "main")
    assert main.params.exposure == 0.8
    assert ed.crop_rect == (2, 2, 20, 20)  # v1 presets don't carry crop
    out = np.asarray(ed.apply("full"))
    assert np.isfinite(out).all()


def test_editor_rejects_bad_v1_preset(rng):
    import pytest

    from rawphotoforge_tpu.engine.editor import PhotoEditor

    planes = rng.uniform(0.1, 0.9, (3, 16, 16)).astype(np.float32)
    ed = PhotoEditor(planes)
    bad = dict(V1, brightness_curve_points=[[30000, 0], [0, 65535]])
    with pytest.raises(Exception):
        ed.load_preset_json(json.dumps(bad))
    main = next(m for m in ed.masks if m.name == "main")
    assert main.params.exposure == 0.0  # untouched


def test_v1_malformed_curve_points_rejected():
    import pytest

    from rawphotoforge_tpu.core.params import EditParameters

    with pytest.raises(ValueError, match="pairs"):
        EditParameters.from_json({"brightness_curve_points": [1, 2, 3]})
