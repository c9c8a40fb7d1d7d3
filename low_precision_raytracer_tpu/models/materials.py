"""Materials (reference `CUDAMaterial`, `rt/rtrt/memory.hpp:303-332`).

A host-side Material dataclass plus the packed SoA table shipped to device.
Texture references are integer ids into the scene texture atlas
(:mod:`.textures`); -1 means "use the constant factor" (the reference uses
UINT32_MAX uv-set selectors for the same purpose).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

NO_TEX = -1


@dataclass
class Material:
    color: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))
    emission: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    metallic: float = 0.0
    roughness: float = 1.0
    double_sided: bool = True  # reference default (`rt/rtrt/memory.hpp:316`)

    # texture id (-1 = none) + uv set selector (0/1)
    tex_color: int = NO_TEX
    uv_color: int = 0
    tex_emission: int = NO_TEX
    uv_emission: int = 0
    tex_metallic_roughness: int = NO_TEX
    uv_metallic_roughness: int = 0
    # glTF metallicRoughness channel mapping: G=roughness, B=metallic
    # (`rt/rtrt/loader.cu:444-541`)
    channel_roughness: int = 1
    channel_metallic: int = 2


def pack_materials(materials: list[Material]) -> dict[str, np.ndarray]:
    """Pack to SoA numpy arrays (cast to render dtype at device upload)."""
    if not materials:
        materials = [Material()]
    return {
        "color": np.stack([np.asarray(m.color, np.float32) for m in materials]),
        "emission": np.stack([np.asarray(m.emission, np.float32) for m in materials]),
        "metallic": np.array([m.metallic for m in materials], np.float32),
        "roughness": np.array([m.roughness for m in materials], np.float32),
        "double_sided": np.array([m.double_sided for m in materials], np.bool_),
        "tex_color": np.array([m.tex_color for m in materials], np.int32),
        "uv_color": np.array([m.uv_color for m in materials], np.int32),
        "tex_emission": np.array([m.tex_emission for m in materials], np.int32),
        "uv_emission": np.array([m.uv_emission for m in materials], np.int32),
        "tex_mr": np.array([m.tex_metallic_roughness for m in materials], np.int32),
        "uv_mr": np.array([m.uv_metallic_roughness for m in materials], np.int32),
        "channel_roughness": np.array([m.channel_roughness for m in materials], np.int32),
        "channel_metallic": np.array([m.channel_metallic for m in materials], np.int32),
    }
