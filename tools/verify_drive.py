"""End-to-end verify drive on the real TPU: renders PNGs for eyeballing.

python -m tools.verify_drive  ->  /tmp/verify_*.png
"""
import numpy as np

from directx_raytracer_tpu import testscenes
from directx_raytracer_tpu.io import crtscene
from directx_raytracer_tpu.models.scene import build_device_scene
from directx_raytracer_tpu.render import render_debug, render_whitted
from directx_raytracer_tpu.bvh import (build_bvh, make_bvh_intersect_fn,
                                        make_bvh_occluder_factory)
from directx_raytracer_tpu.utils.image import write_png

import jax.numpy as jnp

DRAGON = ("/root/reference/DirectX-RayTracer/DirectX-RayTracer/"
          "Scenes/Dragon.crtscene")


def tonemap(img):
    return np.clip(np.asarray(img), 0.0, 1.0) ** (1 / 2.2)


def main():
    # 1. Dragon via the .crtscene loader + BVH + whitted
    scene = crtscene.load(DRAGON)
    d = build_device_scene(scene)
    bvh = build_bvh(d.geometry)
    isect = make_bvh_intersect_fn(bvh)
    occf = make_bvh_occluder_factory(bvh)
    img, stats = render_whitted(d, scene.camera.position, scene.camera.rotation,
                                480, 270, max_depth=3, intersect_fn=isect,
                                occluder_factory=occf)
    write_png("/tmp/verify_dragon_whitted.png", tonemap(img))
    print("dragon whitted: dropped =", int(np.asarray(stats["dropped"]).sum()))

    img = render_debug(d, jnp.asarray(scene.camera.position, jnp.float32),
                       jnp.asarray(scene.camera.rotation, jnp.float32),
                       jnp.int32(3), 480, 270, intersect_fn=isect)
    write_png("/tmp/verify_dragon_debug3.png", np.asarray(img))

    # 2. Cornell with a Blinn-Phong floor at spp=9 (new features)
    scene = testscenes.cornell_box(400, 300)
    for m in scene.materials:
        if int(m.type) == 1:  # DIFFUSE
            m.specular = 0.6
            m.shininess = 24.0
    d = build_device_scene(scene)
    assert d.has_specular
    img, _ = render_whitted(d, scene.camera.position, scene.camera.rotation,
                            400, 300, max_depth=3, spp=9)
    write_png("/tmp/verify_cornell_bp_spp9.png", tonemap(img))

    # 3. const_color bring-up config
    scene = testscenes.const_color(256, 256)
    d = build_device_scene(scene)
    img, _ = render_whitted(d, scene.camera.position, scene.camera.rotation,
                            256, 256, max_depth=1)
    write_png("/tmp/verify_const_color.png", np.asarray(img))
    print("wrote /tmp/verify_*.png")


if __name__ == "__main__":
    main()
