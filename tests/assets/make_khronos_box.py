"""Offline reconstruction of the Khronos glTF-Sample-Models `Box` and
`BoxInterleaved` assets (COLLADA2GLTF exporter output structure).

This environment has zero network egress, so a literal third-party download
is impossible; these files instead reproduce the *foreign exporter's layout*
byte-for-byte in structure — everything this repo's own test writer
(`tests/gltf_writer.py`) never emits:

- `Box.gltf` + `Box0.bin`: separate binary buffer referenced by relative
  `uri`; one SHARED vec3 bufferView with `byteStride` (normals at accessor
  byteOffset 0, positions at 288); `target` fields; a root node carrying a
  column-major `matrix` (the COLLADA Z-up -> Y-up rotation) instead of TRS;
  ushort indices; named mesh and material ("Red", baseColorFactor
  [0.8, 0, 0, 1], metallicFactor 0).
- `BoxInterleaved.glb`: the same cube as a binary GLB container whose
  NORMAL/POSITION accessors interleave in one bufferView (byteStride 24,
  accessor byteOffsets 0/12) — the strided-decode path of
  `rt/rtrt/loader.cu:90-190` that tightly-packed writers never touch.
- `BoxTextured.gltf` + `BoxTextured0.bin` + `BoxTexturedCheck.png`: the
  `BoxTextured` sample structure — a TEXCOORD_0 accessor in a second
  strided bufferView, an `images` entry by relative file uri, a `samplers`
  table, and a material whose baseColorTexture (not factor) carries the
  color (`rt/rtrt/loader.cu:444-541` texture path).  The PNG is a
  generated checkerboard (the sample's logo bitmap is unfetchable).

The two assets decode to the SAME geometry through entirely different
layouts, so the loader test cross-checks them against each other instead of
against this repo's writer.
"""

import base64
import json
import os
import struct

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def cube_geometry():
    """24-vertex cube, +-0.5, outward normals, CCW front faces (glTF)."""
    positions, normals, indices = [], [], []
    for a in range(3):
        b, c = (a + 1) % 3, (a + 2) % 3
        for s in (1.0, -1.0):
            n = [0.0, 0.0, 0.0]
            n[a] = s
            corners = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
            if s < 0:
                corners = corners[::-1]
            base = len(positions)
            for u, v in corners:
                p = [0.0, 0.0, 0.0]
                p[a] = s * 0.5
                p[b] = u * 0.5
                p[c] = v * 0.5
                positions.append(p)
                normals.append(list(n))
            indices += [base, base + 1, base + 2, base, base + 2, base + 3]
    return (
        np.asarray(positions, np.float32),
        np.asarray(normals, np.float32),
        np.asarray(indices, np.uint16),
    )


# the COLLADA2GLTF Z-up -> Y-up root rotation (column-major), and the
# exporter's material
MATRIX = [1, 0, 0, 0, 0, 0, -1, 0, 0, 1, 0, 0, 0, 0, 0, 1]
MATERIAL = {
    "pbrMetallicRoughness": {
        "baseColorFactor": [0.800000011920929, 0.0, 0.0, 1.0],
        "metallicFactor": 0.0,
    },
    "name": "Red",
}


def write_box_gltf():
    pos, nrm, idx = cube_geometry()
    # Box0.bin layout: [normals (288 B) | positions (288 B) | indices (72 B)]
    bin_data = nrm.tobytes() + pos.tobytes() + idx.tobytes()
    assert len(bin_data) == 648
    gltf = {
        "asset": {"generator": "COLLADA2GLTF", "version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"children": [1], "matrix": MATRIX}, {"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"NORMAL": 1, "POSITION": 2},
                        "indices": 0,
                        "mode": 4,
                        "material": 0,
                    }
                ],
                "name": "Mesh",
            }
        ],
        "accessors": [
            {
                "bufferView": 0,
                "byteOffset": 0,
                "componentType": 5123,
                "count": 36,
                "max": [23],
                "min": [0],
                "type": "SCALAR",
            },
            {
                "bufferView": 1,
                "byteOffset": 0,
                "componentType": 5126,
                "count": 24,
                "max": [1.0, 1.0, 1.0],
                "min": [-1.0, -1.0, -1.0],
                "type": "VEC3",
            },
            {
                "bufferView": 1,
                "byteOffset": 288,
                "componentType": 5126,
                "count": 24,
                "max": [0.5, 0.5, 0.5],
                "min": [-0.5, -0.5, -0.5],
                "type": "VEC3",
            },
        ],
        "materials": [MATERIAL],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 576, "byteLength": 72, "target": 34963},
            {
                "buffer": 0,
                "byteOffset": 0,
                "byteLength": 576,
                "byteStride": 12,
                "target": 34962,
            },
        ],
        "buffers": [{"byteLength": 648, "uri": "Box0.bin"}],
    }
    with open(os.path.join(HERE, "Box.gltf"), "w") as f:
        json.dump(gltf, f, indent=2)
    with open(os.path.join(HERE, "Box0.bin"), "wb") as f:
        f.write(bin_data)


def write_box_interleaved_glb():
    pos, nrm, idx = cube_geometry()
    # interleaved [normal | position] per vertex, byteStride 24
    inter = np.empty((24, 6), np.float32)
    inter[:, 0:3] = nrm
    inter[:, 3:6] = pos
    bin_data = idx.tobytes() + inter.tobytes()
    gltf = {
        "asset": {"generator": "COLLADA2GLTF", "version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"children": [1], "matrix": MATRIX}, {"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"NORMAL": 1, "POSITION": 2},
                        "indices": 0,
                        "mode": 4,
                        "material": 0,
                    }
                ],
                "name": "Mesh",
            }
        ],
        "accessors": [
            {
                "bufferView": 0,
                "byteOffset": 0,
                "componentType": 5123,
                "count": 36,
                "max": [23],
                "min": [0],
                "type": "SCALAR",
            },
            {
                "bufferView": 1,
                "byteOffset": 0,
                "componentType": 5126,
                "count": 24,
                "max": [1.0, 1.0, 1.0],
                "min": [-1.0, -1.0, -1.0],
                "type": "VEC3",
            },
            {
                "bufferView": 1,
                "byteOffset": 12,
                "componentType": 5126,
                "count": 24,
                "max": [0.5, 0.5, 0.5],
                "min": [-0.5, -0.5, -0.5],
                "type": "VEC3",
            },
        ],
        "materials": [MATERIAL],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 72, "target": 34963},
            {
                "buffer": 0,
                "byteOffset": 72,
                "byteLength": 576,
                "byteStride": 24,
                "target": 34962,
            },
        ],
        "buffers": [{"byteLength": len(bin_data)}],  # no uri: GLB BIN chunk
    }
    json_bytes = json.dumps(gltf, separators=(",", ":")).encode()
    json_bytes += b" " * ((4 - len(json_bytes) % 4) % 4)
    bin_pad = bin_data + b"\x00" * ((4 - len(bin_data) % 4) % 4)
    total = 12 + 8 + len(json_bytes) + 8 + len(bin_pad)
    glb = (
        struct.pack("<4sII", b"glTF", 2, total)
        + struct.pack("<II", len(json_bytes), 0x4E4F534A)
        + json_bytes
        + struct.pack("<II", len(bin_pad), 0x004E4942)
        + bin_pad
    )
    with open(os.path.join(HERE, "BoxInterleaved.glb"), "wb") as f:
        f.write(glb)


def face_uvs():
    """One full [0,1]^2 texture tile per face, corner order matching
    cube_geometry()'s emission order."""
    uv = []
    for _face in range(6):
        uv += [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]
    return np.asarray(uv, np.float32)


def write_check_png(path, n=64, cell=8):
    """Deterministic red/white checkerboard (stands in for the sample
    asset's CesiumLogoFlat.png, which cannot be fetched offline)."""
    from PIL import Image

    yy, xx = np.mgrid[0:n, 0:n]
    check = ((xx // cell + yy // cell) % 2).astype(bool)
    img = np.empty((n, n, 3), np.uint8)
    img[check] = (255, 255, 255)
    img[~check] = (204, 0, 0)
    Image.fromarray(img).save(path)


def write_box_textured_gltf():
    """`BoxTextured` sample structure (COLLADA2GLTF): the Box layout plus a
    TEXCOORD_0 accessor in its own strided bufferView, a `samplers` table
    (repeat wrap, linear filters), an `images` entry by relative file uri,
    and a material whose baseColorTexture replaces the color factor."""
    pos, nrm, idx = cube_geometry()
    uv = face_uvs()
    # BoxTextured0.bin layout:
    #   [normals (288 B) | positions (288 B) | uv (192 B) | indices (72 B)]
    bin_data = nrm.tobytes() + pos.tobytes() + uv.tobytes() + idx.tobytes()
    assert len(bin_data) == 840
    gltf = {
        "asset": {"generator": "COLLADA2GLTF", "version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"children": [1], "matrix": MATRIX}, {"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"NORMAL": 1, "POSITION": 2, "TEXCOORD_0": 3},
                        "indices": 0,
                        "mode": 4,
                        "material": 0,
                    }
                ],
                "name": "Mesh",
            }
        ],
        "accessors": [
            {
                "bufferView": 0,
                "byteOffset": 0,
                "componentType": 5123,
                "count": 36,
                "max": [23],
                "min": [0],
                "type": "SCALAR",
            },
            {
                "bufferView": 1,
                "byteOffset": 0,
                "componentType": 5126,
                "count": 24,
                "max": [1.0, 1.0, 1.0],
                "min": [-1.0, -1.0, -1.0],
                "type": "VEC3",
            },
            {
                "bufferView": 1,
                "byteOffset": 288,
                "componentType": 5126,
                "count": 24,
                "max": [0.5, 0.5, 0.5],
                "min": [-0.5, -0.5, -0.5],
                "type": "VEC3",
            },
            {
                "bufferView": 2,
                "byteOffset": 0,
                "componentType": 5126,
                "count": 24,
                "max": [1.0, 1.0],
                "min": [0.0, 0.0],
                "type": "VEC2",
            },
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorTexture": {"index": 0},
                    "metallicFactor": 0.0,
                },
                "name": "Texture",
            }
        ],
        "textures": [{"sampler": 0, "source": 0}],
        "images": [{"uri": "BoxTexturedCheck.png"}],
        "samplers": [
            {"magFilter": 9729, "minFilter": 9986, "wrapS": 10497, "wrapT": 10497}
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 768, "byteLength": 72, "target": 34963},
            {
                "buffer": 0,
                "byteOffset": 0,
                "byteLength": 576,
                "byteStride": 12,
                "target": 34962,
            },
            {
                "buffer": 0,
                "byteOffset": 576,
                "byteLength": 192,
                "byteStride": 8,
                "target": 34962,
            },
        ],
        "buffers": [{"byteLength": 840, "uri": "BoxTextured0.bin"}],
    }
    with open(os.path.join(HERE, "BoxTextured.gltf"), "w") as f:
        json.dump(gltf, f, indent=2)
    with open(os.path.join(HERE, "BoxTextured0.bin"), "wb") as f:
        f.write(bin_data)
    write_check_png(os.path.join(HERE, "BoxTexturedCheck.png"))


if __name__ == "__main__":
    write_box_gltf()
    write_box_interleaved_glb()
    write_box_textured_gltf()
    print(
        "wrote Box.gltf / Box0.bin / BoxInterleaved.glb / "
        "BoxTextured.{gltf,0.bin} / BoxTexturedCheck.png"
    )
