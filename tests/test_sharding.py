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
