"""Whitted renderer tests: shadows, mirrors, dielectrics, textures, AA.

The reference parses all of this but never runs it (SURVEY.md facts 1-2), so
these tests check against analytic expectations of the Chaos-course shading
model rather than reference images.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from directx_raytracer_tpu.models.light import Light
from directx_raytracer_tpu.models.material import Material, MaterialType
from directx_raytracer_tpu.models.mesh import Mesh
from directx_raytracer_tpu.models.scene import Scene, SceneSettings, build_device_scene
from directx_raytracer_tpu.models.camera import Camera
from directx_raytracer_tpu.render.whitted import render_whitted
from directx_raytracer_tpu import testscenes

FOUR_PI = 4.0 * np.pi


def _mesh(vertices, triangles, material_index=0):
    m = Mesh(
        vertices=np.asarray(vertices, np.float32).reshape(-1, 3),
        indices=np.asarray(triangles, np.int32).reshape(-1),
        material_index=material_index,
    )
    m.calculate_vertex_normals()
    return m


def _render(scene, w, h, **kw):
    d = build_device_scene(scene)
    img, stats = render_whitted(
        d, scene.camera.position, scene.camera.rotation, w, h, **kw
    )
    return np.asarray(img), stats


def _floor_scene(mtype=MaterialType.DIFFUSE, albedo=(0.5, 0.5, 0.5), lights=None):
    """A big ground plane at y=0 viewed from above-ish."""
    scene = Scene()
    scene.settings = SceneSettings(background_color=np.array([0.0, 0.0, 0.0], np.float32))
    scene.camera = Camera(position=(0.0, 2.0, 0.0))
    scene.camera.rotate(0.0, 89.0)  # view = -forward, so +pitch looks down
    scene.meshes.append(
        _mesh([[-50, 0, 50], [50, 0, 50], [-50, 0, -50], [50, 0, -50]], [0, 1, 2, 3, 2, 1])
    )
    scene.materials.append(Material(type=mtype, albedo=np.array(albedo, np.float32)))
    for l in lights or [Light(position=np.array([0, 3, 0], np.float32), intensity=100.0)]:
        scene.lights.append(l)
    return scene


class TestDiffuse:
    def test_analytic_point_light(self):
        # Plane at y=0, camera looking straight down from (0,2,0), light at
        # (0,3,0) i=100: center pixel hits ~(0,0,0); n.l=1, r=3.
        scene = _floor_scene()
        img, _ = _render(scene, 33, 33, max_depth=2)
        expected = 0.5 * 100.0 / (FOUR_PI * 9.0)
        center = img[16, 16]
        np.testing.assert_allclose(center, expected, rtol=2e-2)

    def test_shadow_ray_occlusion(self):
        # A small occluder between the light and part of the floor darkens it.
        scene = _floor_scene()
        # quad hovering at y=1.5 over x,z in [0.2, 1.4] blocks light for
        # floor points directly underneath (light straight above at 3).
        scene.meshes.append(
            _mesh(
                [[0.2, 1.5, 1.4], [1.4, 1.5, 1.4], [0.2, 1.5, 0.2], [1.4, 1.5, 0.2]],
                [0, 1, 2, 3, 2, 1],
                material_index=0,
            )
        )
        img, _ = _render(scene, 65, 65, max_depth=2)
        # Camera looks down -y; +x is to the right, +z toward the bottom of
        # the image.  The shadowed floor region maps to lower-right quadrant.
        lit = img[32, 10]     # left of center: unshadowed floor
        shaded = img[45, 45]  # lower-right: under the occluder
        assert shaded.max() <= 1e-5
        assert lit.min() > 0.1 * lit.max() and lit.max() > 0.2

    def test_background_on_miss(self):
        scene = Scene()
        scene.settings = SceneSettings(background_color=np.array([0.1, 0.5, 0.9], np.float32))
        scene.camera = Camera(position=(0.0, 0.0, 5.0))
        img, _ = _render(scene, 8, 8, max_depth=2)
        np.testing.assert_allclose(img, np.broadcast_to([0.1, 0.5, 0.9], img.shape), atol=1e-6)


class TestConstant:
    def test_flat_albedo_ignores_lights(self):
        scene = _floor_scene(mtype=MaterialType.CONSTANT, albedo=(0.3, 0.6, 0.9))
        img, _ = _render(scene, 17, 17, max_depth=2)
        np.testing.assert_allclose(img[8, 8], [0.3, 0.6, 0.9], atol=1e-6)


class TestReflective:
    def test_mirror_reflects_background_tinted(self):
        # Mirror floor, nothing else: reflection ray hits the background; the
        # pixel is albedo * background.
        scene = _floor_scene(mtype=MaterialType.REFLECTIVE, albedo=(0.8, 0.4, 0.2))
        scene.settings.background_color = np.array([1.0, 1.0, 1.0], np.float32)
        img, _ = _render(scene, 17, 17, max_depth=3)
        np.testing.assert_allclose(img[8, 8], [0.8, 0.4, 0.2], rtol=1e-5)

    def test_mirror_sees_constant_object(self):
        # Mirror floor + constant-red ceiling: floor pixels show red * albedo.
        scene = _floor_scene(mtype=MaterialType.REFLECTIVE, albedo=(1.0, 1.0, 1.0))
        scene.meshes.append(
            _mesh([[-50, 4, 50], [50, 4, 50], [-50, 4, -50], [50, 4, -50]],
                  [0, 1, 2, 1, 3, 2], material_index=1)
        )
        scene.materials.append(
            Material(type=MaterialType.CONSTANT, albedo=np.array([1.0, 0.0, 0.0], np.float32))
        )
        img, _ = _render(scene, 17, 17, max_depth=3)
        np.testing.assert_allclose(img[8, 8], [1.0, 0.0, 0.0], atol=1e-5)

    def test_depth_exhaustion_shades_diffuse(self):
        # max_depth=1: the mirror's first hit is the last pass, shaded diffuse.
        scene = _floor_scene(mtype=MaterialType.REFLECTIVE, albedo=(0.8, 0.8, 0.8))
        img, _ = _render(scene, 9, 9, max_depth=1)
        expected = 0.8 * 100.0 / (FOUR_PI * 9.0)
        np.testing.assert_allclose(img[4, 4], expected, rtol=3e-2)


class TestRefractive:
    def test_glass_slab_transmits_plus_reflects(self):
        # Glass floor over a constant blue plane, white background above.
        # Straight-down center ray: transmitted weight (1-F)^2 hits blue,
        # Fresnel reflections pick up white background.
        scene = _floor_scene(mtype=MaterialType.REFRACTIVE)
        scene.materials[0].ior = 1.5
        scene.settings.background_color = np.array([1.0, 1.0, 1.0], np.float32)
        scene.meshes.append(
            _mesh([[-50, -2, 50], [50, -2, 50], [-50, -2, -50], [50, -2, -50]],
                  [0, 1, 2, 3, 2, 1], material_index=1)
        )
        scene.materials.append(
            Material(type=MaterialType.CONSTANT, albedo=np.array([0.0, 0.0, 1.0], np.float32))
        )
        img, _ = _render(scene, 9, 9, max_depth=6)
        center = img[4, 4]
        # Normal-incidence Fresnel for ior 1.5: F0 = 0.04.
        f0 = ((1.5 - 1.0) / (1.5 + 1.0)) ** 2
        # Blue channel: transmitted (1-F)^2 * 1 + reflected F * 1 (background
        # blue) + higher-order terms; Red: only reflected-background terms.
        assert center[2] > (1 - f0) ** 2 - 0.02
        assert 0.0 < center[0] < 3 * f0 + 0.02
        assert center[2] > center[0]

    def test_total_internal_reflection_terminates(self):
        # Grazing rays inside glass TIR; renders without NaN.
        scene = _floor_scene(mtype=MaterialType.REFRACTIVE)
        scene.materials[0].ior = 1.5
        img, _ = _render(scene, 33, 33, max_depth=4)
        assert np.isfinite(img).all()


class TestWavefront:
    def test_stats_shape_and_overflow_counter(self):
        scene = testscenes.cornell_box(64, 48)
        d = build_device_scene(scene)
        img, stats = render_whitted(
            d, scene.camera.position, scene.camera.rotation, 64, 48, max_depth=3
        )
        assert stats["alive"].shape == (3,)
        assert int(stats["dropped"].sum()) == 0  # diffuse box spawns nothing
        # After pass 1 of an all-diffuse scene no rays survive.
        assert int(stats["alive"][0]) == 0

    def test_supersampling_reduces_edge_aliasing(self):
        scene = testscenes.single_triangle()
        d = build_device_scene(scene)
        img1, _ = render_whitted(
            d, scene.camera.position, scene.camera.rotation, 64, 48, max_depth=2, spp=1
        )
        img4, _ = render_whitted(
            d, scene.camera.position, scene.camera.rotation, 64, 48, max_depth=2, spp=4
        )
        img1, img4 = np.asarray(img1), np.asarray(img4)
        # 4x RGSS must produce intermediate coverage values on edges (red
        # channel: background 0, full triangle coverage 1.0).
        frac1 = ((img1[..., 0] > 0.05) & (img1[..., 0] < 0.95)).any()
        frac4 = ((img4[..., 0] > 0.05) & (img4[..., 0] < 0.95)).any()
        assert not frac1 and frac4
        # Interior pixels identical (both fully covered).
        assert abs(img1[24, 32, 0] - img4[24, 32, 0]) < 1e-5


class TestCornell:
    def test_cornell_box_walls_colored(self):
        scene = testscenes.cornell_box(96, 72)
        img, _ = _render(scene, 96, 72, max_depth=2)
        assert np.isfinite(img).all()
        # The box spans roughly cols 32-63, rows 20-51 at this camera.
        left = img[36, 34]   # red wall
        right = img[36, 62]  # green wall
        back = img[36, 48]   # white wall
        assert left[0] > 3 * left[1]
        assert right[1] > 2 * right[0]
        assert back.min() > 0.0 and abs(back[0] - back[1]) < 0.05 * back.max()
