"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4d: sharded-vs-single-device equality)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.core.params import EditParameters, pack_params
from rawphotoforge_tpu.ops import develop as dev
from rawphotoforge_tpu.ops.stats import histogram_rgbl
from rawphotoforge_tpu.parallel import mesh as pmesh

from conftest import random_linear_image

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def the_mesh():
    return pmesh.make_mesh(n_batch=4, n_spatial=2)


def _params():
    p = EditParameters()
    p.set_tone(exposure=0.8, contrast=25, shadow=10)
    p.set_whitebalance(temperature=20, tint=-10)
    p.set_vignette(35)
    return pack_params([p])


def test_mesh_shape(the_mesh):
    assert the_mesh.shape == {"batch": 4, "sp": 2}


def test_batch_develop_sharded_matches_single(rng, the_mesh):
    imgs = np.stack([random_linear_image(rng, 32, 128) for _ in range(8)])
    imgs = jnp.asarray(imgs.transpose(0, 3, 1, 2))
    packed = _params()
    masks = jnp.ones((1, 32, 128), dtype=jnp.float32)

    sharded = jax.jit(pmesh.batch_develop_sharded, static_argnums=3)(
        imgs, packed, masks, the_mesh
    )
    single = dev.develop_batch(imgs, packed, masks)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-6)


def test_spatial_develop_sharded_matches_single(rng, the_mesh):
    img = random_linear_image(rng, 64, 128)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    packed = _params()
    masks = jnp.ones((1, 64, 128), dtype=jnp.float32)

    sharded = jax.jit(pmesh.develop_spatial_sharded, static_argnums=3)(
        planes, packed, masks, the_mesh
    )
    single = dev.develop_jit(planes, packed, masks)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-6)


def test_histogram_sharded_matches_single(rng, the_mesh):
    img = random_linear_image(rng, 64, 128)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    h_sharded = jax.jit(pmesh.histogram_sharded, static_argnums=1)(planes, the_mesh)
    h_single = histogram_rgbl(planes)
    np.testing.assert_array_equal(np.asarray(h_sharded), np.asarray(h_single))


def test_full_step_runs(rng, the_mesh):
    img = random_linear_image(rng, 64, 128)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    packed = _params()
    masks = jnp.ones((1, 64, 128), dtype=jnp.float32)
    srgb, hist, clip = jax.jit(pmesh.full_step, static_argnums=3)(
        planes, packed, masks, the_mesh
    )
    assert srgb.shape == (3, 64, 128)
    assert hist.shape == (4, 256)
    assert hist.sum() == 4 * 64 * 128
    assert 0.0 <= float(clip) <= 1.0


def test_export_batch_step(rng, the_mesh):
    imgs = np.stack([random_linear_image(rng, 32, 128) for _ in range(8)])
    imgs = jnp.asarray(imgs.transpose(0, 3, 1, 2))
    packed = _params()
    masks = jnp.ones((1, 32, 128), dtype=jnp.float32)
    u8 = jax.jit(pmesh.export_batch_step, static_argnums=3)(
        imgs, packed, masks, the_mesh
    )
    assert u8.dtype == jnp.uint8
    assert u8.shape == (8, 3, 32, 128)


def test_demosaic_sharded_matches_single(rng, the_mesh):
    """Halo-exchange demosaic over the 'sp' axis == single-device demosaic
    (both interior and the shard-boundary rows)."""
    from rawphotoforge_tpu.parallel import spatial
    from rawphotoforge_tpu.ops import demosaic as dm

    h, w = 64, 128  # 2 shards of 32 rows on sp
    mosaic = jnp.asarray(rng.random((h, w), dtype=np.float32))
    sharded = jax.jit(
        spatial.demosaic_sharded, static_argnums=(1, 2, 3)
    )(mosaic, the_mesh, "RGGB", "malvar")
    single = dm.demosaic_malvar(mosaic, "RGGB")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-6)


def test_demosaic_sharded_bilinear_and_pattern(rng, the_mesh):
    from rawphotoforge_tpu.parallel import spatial
    from rawphotoforge_tpu.ops import demosaic as dm

    mosaic = jnp.asarray(rng.random((32, 128), dtype=np.float32))
    sharded = jax.jit(
        spatial.demosaic_sharded, static_argnums=(1, 2, 3)
    )(mosaic, the_mesh, "GRBG", "bilinear")
    single = dm.demosaic_bilinear(mosaic, "GRBG")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-6)


def test_raw_develop_sharded_matches_single(rng, the_mesh):
    from rawphotoforge_tpu.parallel import spatial
    from rawphotoforge_tpu.ops import demosaic as dm
    from rawphotoforge_tpu.ops.sharpen import unsharp_mask

    h, w = 64, 128
    mosaic = jnp.asarray(rng.random((h, w), dtype=np.float32))
    wb = jnp.asarray([1.8, 1.0, 1.4])
    cam = jnp.asarray(dm.cam_matrix_to_srgb(
        np.array([[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]])
    ))
    sharded = jax.jit(
        spatial.raw_develop_sharded, static_argnums=(3, 4)
    )(mosaic, wb, cam, the_mesh, "RGGB", jnp.float32(0.7))

    balanced = dm.apply_wb_mosaic(mosaic, "RGGB", wb)
    single = jnp.clip(dm.camera_to_srgb(dm.demosaic_malvar(balanced, "RGGB"), cam), 0, 1)
    single = unsharp_mask(single, jnp.float32(0.7))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5)


def test_demosaic_sharded_rejects_odd_shards(rng, the_mesh):
    from rawphotoforge_tpu.parallel import spatial

    mosaic = jnp.asarray(rng.random((30, 128), dtype=np.float32))
    with pytest.raises(ValueError):
        spatial.demosaic_sharded(mosaic, the_mesh)
