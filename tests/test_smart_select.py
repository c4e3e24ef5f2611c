"""Geodesic smart-select masks (ops/masking.geodesic_distance).

The sweep-based distance transform is gated against an exact Dijkstra
solution (scipy.sparse.csgraph) on the same 4-connected cost graph, and
the selection semantics are checked on a connectivity case the plain
similarity mask cannot get right.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.ops import masking


def _dijkstra_oracle(planes, point_yx, edge_weight, spatial_cost):
    """Exact geodesic distances via scipy on the identical cost graph."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import dijkstra

    L, A, B = (np.asarray(x) for x in masking._oklab(jnp.asarray(planes)))
    lab = np.stack([L, A, B], axis=-1)
    h, w = L.shape

    def idx(y, x):
        return y * w + x

    rows, cols, vals = [], [], []
    for y in range(h):
        for x in range(w):
            for dy, dx in ((0, 1), (1, 0)):
                ny, nx = y + dy, x + dx
                if ny >= h or nx >= w:
                    continue
                c = np.linalg.norm(lab[y, x] - lab[ny, nx]) * edge_weight \
                    + spatial_cost
                rows += [idx(y, x), idx(ny, nx)]
                cols += [idx(ny, nx), idx(y, x)]
                vals += [c, c]
    g = coo_matrix((vals, (rows, cols)), shape=(h * w, h * w))
    d = dijkstra(g.tocsr(), indices=idx(*point_yx))
    return d.reshape(h, w)


def _two_regions(h=18, w=24):
    """Left/right halves same color, separated by a dark vertical bar."""
    planes = np.full((3, h, w), 0.5, dtype=np.float32)
    planes[:, :, w // 2 - 1 : w // 2 + 1] = 0.02
    return planes


def test_distance_matches_dijkstra():
    rng = np.random.default_rng(5)
    planes = rng.random((3, 14, 17)).astype(np.float32) * 0.5 + 0.2
    point = (6, 4)
    got = np.asarray(masking.geodesic_distance(
        jnp.asarray(planes), jnp.asarray(point, dtype=jnp.int32),
        jnp.float32(8.0), jnp.float32(0.01), sweeps=12,
    ))
    want = _dijkstra_oracle(planes, point, 8.0, 0.01)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_smart_select_respects_connectivity():
    planes = _two_regions()
    h, w = planes.shape[1:]
    logits = np.asarray(masking.smart_select_mask(
        jnp.asarray(planes), (h // 2, 3),
        tolerance=0.3, edge_weight=12.0, spatial_cost=0.001,
    ))
    # Same-colored left half selected...
    assert (logits[:, : w // 2 - 1] >= 0).mean() > 0.95
    # ...same-colored RIGHT half rejected: the color barrier blocks the
    # flood (similarity_mask would select it; see contrast test below).
    assert (logits[:, w // 2 + 1 :] < 0).all()
    sim = np.asarray(masking.similarity_mask(
        jnp.asarray(planes), jnp.asarray([h // 2, 3], dtype=jnp.int32),
        jnp.float32(0.1), jnp.float32(1.0), spatial_falloff=False,
    ))
    assert (sim[:, w // 2 + 1 :] >= 0).all()  # similarity leaks by design


def test_editor_add_smart_mask_end_to_end():
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    planes = _two_regions(40, 64)
    ed = PhotoEditor(jnp.asarray(planes))
    ed.add_smart_mask("subject", (8, 20), tolerance=0.3)
    assert "subject" in ed.mask_names()
    ed.set_tone(exposure=1.0, mask_name="subject")
    out = np.asarray(ed.apply())
    # The selected (left) side brightened; the barrier-isolated right side
    # kept its original rendering.
    base = np.asarray(PhotoEditor(jnp.asarray(planes)).apply())
    assert (out[:, 20, 8] > base[:, 20, 8] + 0.05).all()
    np.testing.assert_allclose(out[:, 20, 52], base[:, 20, 52], atol=1e-5)


def test_server_mask_add_smart_route():
    from rawphotoforge_tpu.app.server import EditorApp
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    planes = _two_regions(30, 40)
    app = EditorApp(PhotoEditor(jnp.asarray(planes)))
    app.editor.add_smart_mask("s", (5, 10))
    assert "s" in app.editor.mask_names()


@pytest.mark.parametrize("point", [(0, 0), (13, 16)])
def test_corner_seeds(point):
    rng = np.random.default_rng(1)
    planes = rng.random((3, 14, 17)).astype(np.float32)
    d = np.asarray(masking.geodesic_distance(
        jnp.asarray(planes), jnp.asarray(point, dtype=jnp.int32),
        jnp.float32(4.0), jnp.float32(0.01), sweeps=12,
    ))
    assert d[point] == 0.0
    assert np.isfinite(d).all() and (d >= 0).all()


# ---------------------------------------------------------------------------
# Labeled multi-point prompts (r5, VERDICT r4 #6 — v1 predictor labels).
# ---------------------------------------------------------------------------


def test_combine_labeled_logits_rules():
    from rawphotoforge_tpu.ops.masking import combine_labeled_logits

    stack = jnp.asarray([
        [[0.8, -0.5], [0.1, 0.9]],    # include A
        [[-0.2, 0.7], [-0.9, -0.1]],  # include B
        [[0.9, -1.0], [0.05, -1.0]],  # exclude
    ])
    labels = jnp.asarray([1, 1, 0])
    out = np.asarray(combine_labeled_logits(stack, labels))
    # (0,0): inc max 0.8, exc 0.9 >= -> carved to min(0.8, -0.9) = -0.9
    np.testing.assert_allclose(out[0, 0], -0.9, atol=1e-6)
    # (0,1): inc max 0.7, exc -1.0 < -> keeps 0.7
    np.testing.assert_allclose(out[0, 1], 0.7, atol=1e-6)
    # (1,0): inc 0.1, exc 0.05 < 0.1 -> keeps 0.1
    np.testing.assert_allclose(out[1, 0], 0.1, atol=1e-6)
    # no excludes: plain include max
    out2 = np.asarray(combine_labeled_logits(stack[:2],
                                             jnp.asarray([1, 1])))
    np.testing.assert_allclose(out2, np.maximum(stack[0], stack[1]),
                               atol=1e-6)


def test_similarity_points_exclude_carves_color():
    """Include on color A with a tolerance wide enough to also grab
    color B; an exclude point on B carves the B region out (the VERDICT
    done-criterion shape)."""
    from rawphotoforge_tpu.ops.masking import (similarity_mask,
                                               similarity_mask_points)

    h, w = 20, 30
    planes = np.zeros((3, h, w), dtype=np.float32)
    planes[:, :, : w // 2] = 0.55            # region A (gray)
    planes[0, :, w // 2:] = 0.62             # region B (slightly warm)
    planes[1, :, w // 2:] = 0.55
    planes[2, :, w // 2:] = 0.50
    p = jnp.asarray(planes)

    inc_only = np.asarray(similarity_mask(
        p, jnp.asarray([10, 5]), jnp.float32(0.5), jnp.float32(1.0),
        spatial_falloff=False))
    assert (inc_only >= 0).all()  # wide tolerance selects BOTH regions

    both = np.asarray(similarity_mask_points(
        p, jnp.asarray([[10, 5], [10, w - 5]], dtype=jnp.int32),
        jnp.asarray([1, 0], dtype=jnp.int32),
        jnp.float32(0.5), jnp.float32(1.0), spatial_falloff=False))
    assert (both[:, : w // 2] >= 0).all()    # A stays selected
    assert (both[:, w // 2:] < 0).all()      # B carved out


def test_smart_points_exclude_splits_region():
    """One flat region, include on the left + exclude on the right: the
    competing floods split it at the geodesic midline."""
    from rawphotoforge_tpu.ops.masking import (smart_select_mask,
                                               smart_select_points)

    h, w = 16, 40
    planes = np.full((3, h, w), 0.5, dtype=np.float32)
    p = jnp.asarray(planes)
    full = np.asarray(smart_select_mask(p, (8, 4), tolerance=1.0))
    assert (full >= 0).all()  # one flat region floods entirely

    split = np.asarray(smart_select_points(
        p, [(8, 4)], [(8, w - 5)], tolerance=1.0))
    assert (split[:, :10] >= 0).all()        # near the include seed
    assert (split[:, -10:] < 0).all()        # near the exclude seed


def test_smart_points_multi_include_is_union():
    """Two include seeds across a hard edge flood both regions (multi-
    seed distance = min over seeds)."""
    from rawphotoforge_tpu.ops.masking import (smart_select_mask,
                                               smart_select_points)

    planes = _two_regions(18, 24)
    p = jnp.asarray(planes)
    left_only = np.asarray(smart_select_mask(p, (9, 4), tolerance=0.15))
    assert (left_only[:, 16:] < 0).all()     # the bar stops one seed
    both = np.asarray(smart_select_points(
        p, [(9, 4), (9, 20)], None, tolerance=0.15))
    assert (both[:, :10] >= 0).all() and (both[:, 16:] >= 0).all()


def test_editor_points_labels_end_to_end():
    """PhotoEditor.add_similarity_mask with an exclude point: the
    binarized mask covers A and not B (VERDICT r4 #6 done criterion)."""
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    h, w = 24, 32
    rgb = np.zeros((h, w, 3), dtype=np.float32)
    rgb[:, : w // 2] = 0.5
    rgb[:, w // 2:] = [0.6, 0.5, 0.42]
    ed = PhotoEditor.from_rgb_f32(rgb, mid_long_edge=32, low_long_edge=16,
                                  use_pallas=False)
    ed.add_similarity_mask("sel", points_xy=[(4, 10), (w - 4, 10)],
                           labels=[1, 0], color_tolerance=0.5)
    m = np.asarray(ed._find("sel").data_full)
    assert (m[:, : w // 2 - 2] == 1.0).all()
    assert (m[:, w // 2 + 2:] == 0.0).all()


def test_hostdev_multi_mirrors_device():
    """The era numpy mirrors agree with the device ops on labeled
    multi-point prompts."""
    from rawphotoforge_tpu.engine import hostdev
    from rawphotoforge_tpu.ops.masking import (similarity_mask_points,
                                               smart_select_points)

    rng = np.random.default_rng(3)
    planes = (rng.random((3, 16, 22)).astype(np.float32) * 0.6 + 0.2)
    pts = [(4, 5), (12, 18)]
    labs = [1, 0]
    dev = np.asarray(similarity_mask_points(
        jnp.asarray(planes), jnp.asarray(pts, dtype=jnp.int32),
        jnp.asarray(labs, dtype=jnp.int32),
        jnp.float32(0.3), jnp.float32(1.0), spatial_falloff=False))
    host = hostdev.similarity_logits_points_np(planes, pts, labs, 0.3, 0.0)
    np.testing.assert_allclose(host, dev, atol=2e-5)

    dev_s = np.asarray(smart_select_points(
        jnp.asarray(planes), [pts[0]], [pts[1]], tolerance=0.4))
    host_s = hostdev.smart_logits_points_np(planes, [pts[0]], [pts[1]],
                                            tolerance=0.4)
    np.testing.assert_allclose(host_s, dev_s, atol=2e-4)


def test_server_mask_add_points_route():
    from rawphotoforge_tpu.app.server import EditorApp
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    planes = _two_regions(30, 40)
    app = EditorApp(PhotoEditor(jnp.asarray(planes)))
    app.editor.add_smart_mask("s", points_xy=[(10, 5), (30, 5)],
                              labels=[1, 0])
    assert "s" in app.editor.mask_names()
