"""Multi-chip sharding tests on the virtual 8-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8; SURVEY.md §4's fake-multi-device
harness)."""

import jax
import numpy as np
import pytest

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.parallel import make_mesh, render_whitted_multichip
from directx_raytracer_tpu.render import render_whitted


@pytest.fixture(scope="module")
def cornell():
    scene = testscenes.cornell_box(64, 48)
    return scene, build_device_scene(scene)


def _single_chip(scene, d, **kw):
    img, _ = render_whitted(
        d, scene.camera.position, scene.camera.rotation, 64, 48, **kw
    )
    return np.asarray(img)


def test_tile_sharding_matches_single_chip(cornell):
    scene, d = cornell
    assert jax.device_count() >= 8
    mesh = make_mesh(n_tiles=8)
    img, stats = render_whitted_multichip(
        d, scene.camera.position, scene.camera.rotation, 64, 48, mesh, max_depth=3
    )
    ref = _single_chip(scene, d, max_depth=3)
    np.testing.assert_allclose(np.asarray(img), ref, atol=1e-5)


def test_tile_x_sample_sharding_matches_single_chip(cornell):
    scene, d = cornell
    mesh = make_mesh(n_tiles=2, n_samples=4)
    img, stats = render_whitted_multichip(
        d, scene.camera.position, scene.camera.rotation, 64, 48, mesh,
        max_depth=2, spp=4,
    )
    ref = _single_chip(scene, d, max_depth=2, spp=4)
    np.testing.assert_allclose(np.asarray(img), ref, atol=1e-5)


def test_indivisible_height_raises(cornell):
    scene, d = cornell
    mesh = make_mesh(n_tiles=8)
    with pytest.raises(ValueError, match="not divisible"):
        render_whitted_multichip(
            d, scene.camera.position, scene.camera.rotation, 64, 47, mesh
        )
