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
