"""Golden-image regression tests (SURVEY.md §4): deterministic small renders
of the BASELINE configs compared against checked-in goldens by PSNR.

Regenerate with:  python tests/test_golden.py regen
"""

import os

import numpy as np

from low_precision_raytracer_tpu.config import DemoSettings, RenderConfig
from low_precision_raytracer_tpu.models.procedural import (
    animated_cornell_scene,
    cornell_box_scene,
    single_mesh_scene,
    sponza_like_scene,
)
from low_precision_raytracer_tpu.render.renderer import Renderer
from low_precision_raytracer_tpu.utils.image import psnr

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CONFIGS = {
    # name -> (scene builder, RenderConfig)
    "config1_mesh_direct": (
        single_mesh_scene,
        RenderConfig(width=48, height=48, precision="fp32", gi_on=False, taa_on=False),
    ),
    "config2_cornell_gi": (
        cornell_box_scene,
        RenderConfig(width=48, height=48, precision="fp32", gi_on=True),
    ),
    # config 3: the low-precision trace+shade with fp32 accumulation — the
    # reference's FLAGSHIP fp16 instantiation (`rt/gui/imgui_window.cu:
    # 746-752`) pinned by a golden of its own
    "config3_fp16": (
        cornell_box_scene,
        RenderConfig(width=48, height=48, precision="fp16", gi_on=True),
    ),
    # config 4: animated TRS scene with temporal reprojection + SVGF at
    # 1 spp — rendered over 4 animation steps so the golden bakes in the
    # reprojection/history behaviour, not just a cold first frame
    "config4_animated_svgf": (
        animated_cornell_scene,
        RenderConfig(width=48, height=48, precision="fp32", gi_on=True),
    ),
    "config5_sponza_sky": (
        lambda: sponza_like_scene(pillar_grid=2, sphere_subdiv=1),
        RenderConfig(width=48, height=48, precision="fp32", gi_on=True,
                     demo=DemoSettings(svgf=False), taa_on=False),
    ),
}


def _render(name):
    builder, cfg = CONFIGS[name]
    r = Renderer(builder(), cfg)
    if name == "config4_animated_svgf":
        img = None
        for i in range(4):  # animation steps exercise reprojection + SVGF history
            img, _ = r.render(time=i * 0.25)
        return np.asarray(img, np.float32)
    img, _ = r.render()
    return np.asarray(img, np.float32)


def _golden_path(name):
    return os.path.join(GOLDEN_DIR, f"{name}.npy")


def _check(name, min_psnr=35.0):
    img = _render(name)
    path = _golden_path(name)
    assert os.path.exists(path), f"golden missing: run `python {__file__} regen`"
    want = np.load(path)
    p = psnr(img, want)
    assert p > min_psnr, f"{name}: PSNR vs golden {p:.2f} dB"


def test_golden_config1():
    _check("config1_mesh_direct")


def test_golden_config2():
    _check("config2_cornell_gi")


def test_golden_config3_fp16():
    # fp16 numerics differ across backends more than fp32; the golden is
    # CPU-generated and the PSNR bar is accordingly a bit looser
    _check("config3_fp16", min_psnr=30.0)


def test_golden_config4():
    _check("config4_animated_svgf")


def test_golden_config5():
    _check("config5_sponza_sky")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name in CONFIGS:
            np.save(_golden_path(name), _render(name))
            print("wrote", _golden_path(name))
