"""Prewarm + cold-open compile-avoidance tests (VERDICT r2 #3).

The interactive contract (web/main.ts:652-695 renders the moment a file
loads) requires the first preview to be cheap: the geometry stage must not
compile at all while its sliders are untouched, and the develop/histogram/
quantize programs should be warmable ahead of the first request.
"""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.engine import prewarm
from rawphotoforge_tpu.engine.editor import MID, LOW, PhotoEditor


def _img(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((3, h, w), dtype=np.float32))


class TestPreviewShapes:
    def test_standard_aspects_cover_common_cameras(self):
        shapes = prewarm.preview_shapes(1280, 400)
        # 3:2 landscape at MID: long edge 1280 -> 1280x853 true shape.
        assert (853, 1280) in shapes
        assert (1280, 853) in shapes  # portrait
        assert (960, 1280) in shapes  # 4:3
        assert (400, 400) in shapes   # 1:1 at LOW
        # Deduped: square appears once per level, not per orientation.
        assert len(shapes) == len(set(shapes))

    def test_long_edge_is_the_preview_size(self):
        for h, w in prewarm.preview_shapes(1280, 400):
            assert max(h, w) in (1280, 400)


class TestWarmShape:
    def test_warm_marks_and_dedups(self):
        prewarm._warmed.discard((40, 60))
        assert prewarm.warm_shape((40, 60))
        assert (40, 60) in prewarm._warmed
        # Second call is a no-op hit.
        assert prewarm.warm_shape((40, 60))

    def test_warm_failure_unmarks(self, monkeypatch):
        # A dead backend must leave the shape unwarmed (retry later) and
        # return False instead of raising.
        import rawphotoforge_tpu.ops.stats as stats

        def boom(*a, **k):
            raise RuntimeError("tunnel down")

        monkeypatch.setattr(stats, "histogram_rgbl", boom)
        prewarm._warmed.discard((48, 64))
        assert prewarm.warm_shape((48, 64)) is False
        assert (48, 64) not in prewarm._warmed

    def test_warm_async_editor_reports_count(self):
        ed = PhotoEditor(_img(), mid_long_edge=64, low_long_edge=32)
        for level in (MID, LOW):
            prewarm._warmed.discard(ed.level_shape(level))
            prewarm._warmed_curves.discard(ed.level_shape(level))
        done = threading.Event()
        counts = []
        t = prewarm.warm_async(editor=ed, on_done=lambda n: (
            counts.append(n), done.set()))
        assert done.wait(timeout=120)
        t.join(timeout=10)
        # 2 level-shape open-state warms + 2 curve-variant warms + the
        # editor's FULL-bucket sparse-export warm.
        assert counts == [5]
        for level in (MID, LOW):
            assert ed.level_shape(level) in prewarm._warmed


class TestColdOpenGeometryShortcut:
    def test_zero_geometry_never_dispatches_warp(self, monkeypatch):
        """With distortion=0 and sharpness=0 the geometry stage is a
        bit-exact identity — the editor must serve the original buffer
        without compiling/dispatching the warp program (it is off the
        first-preview critical path)."""
        from rawphotoforge_tpu.ops import develop as dev

        ed = PhotoEditor(_img(), mid_long_edge=64, low_long_edge=32)

        def boom(*a, **k):
            raise AssertionError("geometry program dispatched at cold open")

        monkeypatch.setattr(dev, "geometry_stage_jit", boom)
        out = ed.apply(MID)
        assert out.shape[0] == 3
        # The identity result IS the original buffer (no copy).
        assert ed._geo_cache[MID][1] is ed._originals[MID]

    def test_geometry_slider_still_works_after_shortcut(self):
        ed = PhotoEditor(_img(), mid_long_edge=64, low_long_edge=32)
        base = np.asarray(ed.apply(MID))
        ed.set_lens_distortion(30)
        warped = np.asarray(ed.apply(MID))
        assert warped.shape == base.shape
        assert not np.allclose(warped, base)
        # And back to zero reproduces the identity render bit-exactly.
        ed.set_lens_distortion(0)
        again = np.asarray(ed.apply(MID))
        np.testing.assert_array_equal(again, base)

    def test_shortcut_matches_dispatched_identity(self):
        """The skipped program at (0, 0) must equal what the dispatched
        geometry stage would have produced (lens_distortion lax.cond's
        to a passthrough at zero strength)."""
        from rawphotoforge_tpu.ops import develop as dev

        ed = PhotoEditor(_img(), mid_long_edge=64, low_long_edge=32)
        short = ed._geo_at(MID)
        extent = jnp.asarray(ed._extents[MID], dtype=jnp.float32)
        dispatched = dev.geometry_stage_jit(
            ed._originals[MID], jnp.float32(0.0), extent)
        np.testing.assert_array_equal(np.asarray(short),
                                      np.asarray(dispatched))


class TestServerPrewarmFlag:
    def test_serve_prewarm_off_spawns_no_thread(self, monkeypatch):
        import rawphotoforge_tpu.app.server as srv

        called = []
        monkeypatch.setattr(prewarm, "warm_async",
                            lambda *a, **k: called.append(1))
        from rawphotoforge_tpu.engine.session import Settings

        httpd = srv.serve(PhotoEditor(jnp.ones((3, 16, 16)) * 0.5),
                          port=0, settings=Settings(), prewarm=False)
        httpd.server_close()
        assert called == []


class TestWarmVariantMatchesEditor:
    def test_warm_compiles_the_editors_cold_open_program(self):
        """warm_shape must compile the exact static-arg combination the
        editor dispatches on a fresh open (default_bright_curves=True,
        default_oklch_curves=True, identity_oklch=True) — any other
        combination is a different XLA program
        and the warm would be dead weight (regression: the identity_oklch
        flag was added without updating the warm)."""
        from rawphotoforge_tpu.kernels import fused

        shape = (44, 60)
        prewarm._warmed.discard(shape)
        assert prewarm.warm_shape(shape)
        before = fused.develop_post_geo_fused._cache_size()
        ed = PhotoEditor(_img(*shape), mid_long_edge=64, low_long_edge=32)
        ed.set_tone(exposure=0.4)  # slider-only state
        ed.apply(MID)  # MID aliases FULL at this size -> warmed shape
        after = fused.develop_post_geo_fused._cache_size()
        assert after == before, (
            "editor cold-open render compiled a new program despite the "
            "prewarm")

    def test_warm_curve_programs_cover_first_curve_drags(self):
        """warm_curve_programs must compile the exact programs the editor
        dispatches on the first curve drags: a touched brightness curve
        (default_oklch_curves=True + identity_oklch at s=2 and s=4) and a
        touched hue-family curve (general kernel at s=4). If the editor's
        flag derivation or pack_params' segment bucketing drifts, this
        catches the dead warm."""
        from rawphotoforge_tpu.core.params import BRIGHTNESS, HUE
        from rawphotoforge_tpu.kernels import fused

        shape = (44, 60)
        prewarm._warmed_curves.discard(shape)
        assert prewarm.warm_curve_programs(shape)
        before = fused.develop_post_geo_fused._cache_size()
        # Three-point brightness curve (s=4, identity_oklch variant).
        ed = PhotoEditor(_img(*shape), mid_long_edge=64, low_long_edge=32)
        ed.set_curve(BRIGHTNESS, [0, 30000, 65535], [0, 20000, 65535])
        ed.apply(MID)
        # Endpoint-dragged two-point brightness curve (s=2).
        ed2 = PhotoEditor(_img(*shape), mid_long_edge=64, low_long_edge=32)
        ed2.set_curve(BRIGHTNESS, [0, 65535], [0, 50000])
        ed2.apply(MID)
        # Three-point hue curve (general kernel, s=4).
        ed3 = PhotoEditor(_img(*shape), mid_long_edge=64, low_long_edge=32)
        ed3.set_curve(HUE, [0, 30000, 65535], [0, 29000, 65535])
        ed3.apply(MID)
        after = fused.develop_post_geo_fused._cache_size()
        assert after == before, (
            "a first-curve-drag render compiled a new program despite "
            "warm_curve_programs")


class TestWarmFullShape:
    def test_warm_covers_the_bucket_stable_open_path(self):
        """warm_full_shape compiles the SAME programs the from_host
        bucket-stable open dispatches: after the warm, opening an image
        in the warmed bucket adds no new extent-traced resize program."""
        from rawphotoforge_tpu.ops.geometry import resize_bilinear_extents

        shape = (275, 410)  # buckets to (384, 512)
        prewarm._warmed_full.clear()
        assert prewarm.warm_full_shape(shape, 100, 40)
        # Same-bucket, different-extent image: the resize program must
        # already be compiled (cache size stable across the dispatch).
        before = resize_bilinear_extents._cache_size()
        ed = PhotoEditor(
            jnp.asarray(np.zeros((3, 384, 512), np.float32)),
            true_shape=(300, 400), mid_long_edge=100, low_long_edge=40)
        ed._original_at(MID)
        ed._original_at(LOW)
        assert resize_bilinear_extents._cache_size() == before, (
            "open-path resize compiled a new program despite the "
            "full-shape warm")
        # Second warm of the same bucket is a dedup no-op.
        assert prewarm.warm_full_shape((300, 401), 100, 40)

    def test_warm_full_shape_small_image_alias(self):
        # Image smaller than both preview edges: nothing to resize;
        # still reports success.
        prewarm._warmed_full.clear()
        assert prewarm.warm_full_shape((50, 60), 100, 40)


class TestWarmSparseExport:
    def test_warm_compiles_the_export_bucket_program(self):
        """warm_sparse_export runs _sparse_jit's full() at the BUCKET
        shape, so the first uncropped JPEG export per bucket finds the
        heavyweight sparse program compiled (the export-job stall the
        r2 review flagged)."""
        from rawphotoforge_tpu.engine.editor import bucket_shape

        prewarm._warmed_full.discard(
            ("sparse_export", bucket_shape(40, 64)))
        assert prewarm.warm_sparse_export((40, 64))
        assert ("sparse_export", bucket_shape(40, 64)) \
            in prewarm._warmed_full
        # same bucket -> cache hit, still reported as warmed
        assert prewarm.warm_sparse_export((30, 50))

    def test_warm_failure_unmarks(self, monkeypatch):
        from rawphotoforge_tpu.io import jpegbits, jpegenc

        def boom():
            raise RuntimeError("no jit for you")

        # BOTH wires must fail for the warm to report failure: the
        # prepacked (production) wire is tried first, the nibble wire
        # is the fallback warm.
        monkeypatch.setattr(jpegbits, "_prepacked_jit", boom)
        monkeypatch.setattr(jpegenc, "_sparse_jit", boom)
        prewarm._warmed_full.discard(("sparse_export", (128, 128)))
        prewarm._warmed_full.discard(("sparse_export_nibble", (128, 128)))
        assert prewarm.warm_sparse_export((10, 10)) is False
        assert ("sparse_export", (128, 128)) not in prewarm._warmed_full
        assert ("sparse_export_nibble", (128, 128)) \
            not in prewarm._warmed_full

    def test_warm_falls_back_to_nibble_wire_but_stays_retryable(
            self, monkeypatch):
        """A failed prepack warm still warms the nibble fallback, but
        reports False and leaves the bucket unmarked so the production
        (prepacked) program is retried on the next call — otherwise the
        first real export would pay the prepack compile inline."""
        from rawphotoforge_tpu.io import jpegbits

        calls = []

        def boom():
            calls.append(1)
            raise RuntimeError("no prepack")

        monkeypatch.setattr(jpegbits, "_prepacked_jit", boom)
        prewarm._warmed_full.discard(("sparse_export", (128, 128)))
        prewarm._warmed_full.discard(("sparse_export_nibble", (128, 128)))
        assert prewarm.warm_sparse_export((10, 10)) is False
        assert ("sparse_export", (128, 128)) not in prewarm._warmed_full
        assert ("sparse_export_nibble", (128, 128)) in prewarm._warmed_full
        # Second call retries the prepacked warm (not dedup-skipped).
        assert prewarm.warm_sparse_export((10, 10)) is False
        assert len(calls) == 2
        # Once the prepack warm recovers, the bucket warms fully.
        monkeypatch.undo()
        assert prewarm.warm_sparse_export((10, 10))
        assert ("sparse_export", (128, 128)) in prewarm._warmed_full


class TestWarmEditorLevels:
    def test_warm_builds_the_lazy_pyramid_resizes(self):
        """warm_editor_levels must dispatch the editor's lazy FULL->level
        resize (jit-keyed on the SOURCE extent, uncoverable by dummy-shape
        warms) — or the first /preview?level=low drag pays the cold
        compile this module exists to prevent."""
        ed = PhotoEditor(_img(), mid_long_edge=64, low_long_edge=32)
        assert MID not in ed._originals and LOW not in ed._originals
        prewarm._warmed.discard(ed.level_shape(MID))
        prewarm._warmed.discard(ed.level_shape(LOW))
        prewarm._warmed_curves.discard(ed.level_shape(MID))
        prewarm._warmed_curves.discard(ed.level_shape(LOW))
        # 2 open-state warms + 2 curve-variant warms.
        assert prewarm.warm_editor_levels(ed) == 4
        assert MID in ed._originals and LOW in ed._originals
