"""One-off generator for tests/assets/sparse_quad.gltf — a text-format glTF
with data-URI buffers and a SPARSE position accessor, written independently
of tests/gltf_writer.py (different container format, different layout)."""
import base64, json, struct
import numpy as np

# base geometry: flat quad in z=0 plane, 4 verts, 2 tris
base_pos = np.array([[-1,-1,0],[1,-1,0],[1,1,0],[-1,1,0]], np.float32)
normals  = np.tile(np.array([0,0,1], np.float32), (4,1))
idx = np.array([0,1,2, 0,2,3], np.uint16)
# sparse: vertex 2 displaced to (1, 1, 2)
sp_idx = np.array([2], np.uint16)
sp_val = np.array([[1,1,2]], np.float32)

def pad4(b): return b + b"\0" * (-len(b) % 4)
bufs = [pad4(base_pos.tobytes()), pad4(normals.tobytes()), pad4(idx.tobytes()),
        pad4(sp_idx.tobytes()), pad4(sp_val.tobytes())]
blob = b"".join(bufs)
offs = np.cumsum([0] + [len(b) for b in bufs]).tolist()

gltf = {
  "asset": {"version": "2.0", "generator": "hand-authored sparse test asset"},
  "scene": 0,
  "scenes": [{"nodes": [0, 1, 2]}],
  "nodes": [
    {"name": "quad", "mesh": 0},
    {"name": "cam", "camera": 0, "translation": [0, 0, 4]},
    {"name": "lamp", "translation": [0, 2, 2],
     "extensions": {"KHR_lights_punctual": {"light": 0}}},
  ],
  "cameras": [{"type": "perspective",
               "perspective": {"yfov": 1.0471975, "znear": 0.01, "zfar": 100}}],
  "extensions": {"KHR_lights_punctual": {"lights": [
      {"type": "point", "color": [1, 0.9, 0.8], "intensity": 40.0}]}},
  "extensionsUsed": ["KHR_lights_punctual"],
  "materials": [{"pbrMetallicRoughness": {
      "baseColorFactor": [0.8, 0.2, 0.2, 1.0],
      "metallicFactor": 0.0, "roughnessFactor": 0.7}}],
  "meshes": [{"primitives": [{
      "attributes": {"POSITION": 0, "NORMAL": 1},
      "indices": 2, "material": 0}]}],
  "accessors": [
    {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
     "min": [-1,-1,0], "max": [1,1,2],
     "sparse": {"count": 1,
                "indices": {"bufferView": 3, "componentType": 5123},
                "values": {"bufferView": 4}}},
    {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
    {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
  ],
  "bufferViews": [
    {"buffer": 0, "byteOffset": offs[0], "byteLength": len(bufs[0])},
    {"buffer": 0, "byteOffset": offs[1], "byteLength": len(bufs[1])},
    {"buffer": 0, "byteOffset": offs[2], "byteLength": len(bufs[2])},
    {"buffer": 0, "byteOffset": offs[3], "byteLength": len(bufs[3])},
    {"buffer": 0, "byteOffset": offs[4], "byteLength": len(bufs[4])},
  ],
  "buffers": [{"byteLength": len(blob),
               "uri": "data:application/octet-stream;base64," +
                      base64.b64encode(blob).decode()}],
}
with open("/root/repo/tests/assets/sparse_quad.gltf", "w") as f:
    json.dump(gltf, f, indent=1)
print("wrote", len(blob), "buffer bytes")
