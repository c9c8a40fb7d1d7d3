"""Interactive scene explorer (reference 2.21: `SceneExplorer` +
`run_imgui`, `rt/gui/imgui_window.cu:369-846`), rebuilt without a native UI
toolkit: a stdlib HTTP server streams rendered frames to a browser canvas
and feeds key/mouse events back into the reference's controller scheme
(`gui/controller.py`).

Per-frame loop mirrors the reference's `SceneExplorer::render`
(`rt/gui/imgui_window.cu:437-474`): handle_events -> apply_animation ->
flatten -> render.  The free camera is rigged exactly like the reference's
`load_model` (`:592-627`): an inserted parent carries the explorer's
translation while the camera node itself carries the look rotation.

Usage: `lprt view cornell --width 512 --height 512` then open the printed
URL.  WASD + E/C move, hold right mouse button to look, wheel zooms FOV.
"""

from __future__ import annotations

import json
import math
import threading
import time

import numpy as np

from low_precision_raytracer_tpu.gui.controller import (
    HoldRotateController,
    MoveController,
)


class SceneExplorer:
    """Headless per-frame explorer loop; the web/UI layer only delivers
    events and displays the returned frames."""

    def __init__(self, host_scene, cfg):
        from low_precision_raytracer_tpu.models.hierarchy import CameraObject
        from low_precision_raytracer_tpu.render.renderer import Renderer

        self.host = host_scene
        if host_scene.active_camera is None:
            cam = CameraObject(name="free-cam", fov_y=np.pi / 3)
            host_scene.root.add(cam)
            host_scene.active_camera = cam
        self.camera = host_scene.active_camera
        # free camera: inserted parent holds translation, camera holds look
        # (`rt/gui/imgui_window.cu:599-626`)
        self.rig = self.camera.insert_parent()
        self.rig.name = "free-cam-rig"

        self.move_x = MoveController(max_speed=6.0)
        self.move_y = MoveController(max_speed=6.0)
        self.move_z = MoveController(max_speed=6.0)
        self.look = HoldRotateController()
        # seed FOV controller from the scene camera
        self.look.acc_z = float(self.camera.fov_y)

        self.renderer = Renderer(host_scene, cfg)
        self.cfg = cfg
        self.play_animation = host_scene.animated
        self._t0 = time.monotonic()
        self.frame_count = 0
        self.last_frame_ms = 0.0

    def handle_events(self, dt: float, keys: set[str], mouse=(0.0, 0.0),
                      right_down: bool = False, wheel: float = 0.0) -> None:
        """Integrate one frame of input (`handle_events`,
        `rt/gui/imgui_window.cu:642-686`)."""
        self.move_x.receive_event(dt, "d" in keys, "a" in keys)
        self.move_y.receive_event(dt, "e" in keys, "c" in keys)
        self.move_z.receive_event(dt, "s" in keys, "w" in keys)
        self.look.receive_event(mouse, right_down, wheel)

        yaw, pitch, fov = self.look.get_xyz()
        # look rotation on the camera node: yaw about +y then pitch about +x
        # (quaternions xyzw, matching the hierarchy convention)
        cy, sy = math.cos(-yaw / 2), math.sin(-yaw / 2)
        cp, sp = math.cos(-pitch / 2), math.sin(-pitch / 2)
        q_yaw = np.array([0, sy, 0, cy], np.float32)
        q_pitch = np.array([sp, 0, 0, cp], np.float32)
        self.camera.rotation = _quat_mul(q_yaw, q_pitch)
        self.camera.fov_y = float(fov)

        # translate the rig along the camera's yaw frame
        step = np.array(
            [self.move_x.pop_value(), self.move_y.pop_value(), self.move_z.pop_value()],
            np.float32,
        )
        # world step = R_y(-yaw) @ step — the SAME rotation the camera node
        # carries, so W tracks the view direction at every yaw (the mirrored
        # form R_y(+yaw) moved backward at yaw = 90 deg)
        cos_y, sin_y = math.cos(yaw), math.sin(yaw)
        world = np.array(
            [
                cos_y * step[0] - sin_y * step[2],
                step[1],
                sin_y * step[0] + cos_y * step[2],
            ],
            np.float32,
        )
        self.rig.translation = self.rig.translation + world

    def render_frame(self) -> np.ndarray:
        """-> (H, W, 3) uint8."""
        t = time.monotonic() - self._t0 if self.play_animation else 0.0
        t0 = time.perf_counter()
        img, _aux = self.renderer.render(time=t)
        arr = np.asarray(img)
        self.last_frame_ms = (time.perf_counter() - t0) * 1e3
        self.frame_count += 1
        # nan_to_num first: NaN -> uint8 is a C-cast with undefined result,
        # which would render as random speckle instead of black
        return (np.clip(np.nan_to_num(arr), 0, 1) * 255).astype(np.uint8)

    def stats(self) -> dict:
        return {
            "frame": self.frame_count,
            "ms": round(self.last_frame_ms, 1),
            "fps": round(1000.0 / self.last_frame_ms, 2) if self.last_frame_ms else 0.0,
            "impl": self.renderer.cfg.traversal_impl,
            "precision": self.cfg.precision,
        }

    # inspect-panel knobs (reference `rt/gui/imgui_window.cu:502-590`):
    # booleans toggle pipeline stages / displayed terms, floats are the
    # SVGF/TAA mix weights.  Each distinct config jit-compiles once and is
    # cached — flipping a toggle costs one compile the first time only.
    _BOOL_KEYS = (
        "gi_on", "taa_on", "svgf", "add_direct_out", "add_gi_colored",
        "add_gi_white", "demodulate",
    )
    _FLOAT_KEYS = ("svgf_color_w", "svgf_moments_w", "taa_w")

    def settings(self) -> dict:
        cfg = self.renderer.cfg
        return {
            "gi_on": cfg.gi_on,
            "taa_on": cfg.taa_on,
            "svgf": cfg.demo.svgf,
            "add_direct_out": cfg.demo.add_direct_out,
            "add_gi_colored": cfg.demo.add_gi_colored,
            "add_gi_white": cfg.demo.add_gi_white,
            "demodulate": cfg.demo.demodulate,
            "svgf_color_w": cfg.svgf.color_mix_weight,
            "svgf_moments_w": cfg.svgf.moments_mix_weight,
            "taa_w": cfg.taa_mix_weight,
            "play_animation": self.play_animation,
        }

    def apply_settings(self, upd: dict) -> None:
        """Apply a (partial) settings dict from the UI."""
        import dataclasses

        cfg = self.renderer.cfg
        demo_kw, cfg_kw, svgf_kw = {}, {}, {}
        for k in self._BOOL_KEYS:
            if k not in upd:
                continue
            v = bool(upd[k])
            if k in ("gi_on", "taa_on"):
                cfg_kw[k] = v
            else:
                demo_kw[k] = v
        if "svgf_color_w" in upd:
            svgf_kw["color_mix_weight"] = float(upd["svgf_color_w"])
        if "svgf_moments_w" in upd:
            svgf_kw["moments_mix_weight"] = float(upd["svgf_moments_w"])
        if "taa_w" in upd:
            cfg_kw["taa_mix_weight"] = float(upd["taa_w"])
        if "play_animation" in upd:
            self.play_animation = bool(upd["play_animation"])
        if demo_kw:
            cfg_kw["demo"] = dataclasses.replace(cfg.demo, **demo_kw)
        if svgf_kw:
            cfg_kw["svgf"] = dataclasses.replace(cfg.svgf, **svgf_kw)
        if cfg_kw:
            new = cfg.replace(**cfg_kw)
            self.renderer.cfg = new
            self.cfg = new


def _quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        np.float32,
    )


_PAGE = """<!doctype html>
<html><head><title>lprt explorer</title><style>
body { background:#111; color:#ccc; font-family:monospace; margin:12px }
canvas { image-rendering:pixelated; border:1px solid #333; outline:none }
#panel { margin-top:8px } #panel label { margin-right:12px; user-select:none }
#panel input[type=range] { vertical-align:middle; width:90px }
.note { color:#777; font-size:11px }
</style></head><body>
<div>lprt explorer — WASD+E/C move, hold RIGHT mouse to look, wheel = FOV</div>
<canvas id=v width=%W% height=%H% tabindex=0></canvas>
<div id=s></div>
<div id=panel>
<label><input type=checkbox data-k=gi_on> GI</label>
<label><input type=checkbox data-k=svgf> SVGF</label>
<label><input type=checkbox data-k=taa_on> TAA</label>
<label><input type=checkbox data-k=add_direct_out> direct</label>
<label><input type=checkbox data-k=add_gi_colored> GI-colored</label>
<label><input type=checkbox data-k=add_gi_white> GI-white</label>
<label><input type=checkbox data-k=demodulate> demodulate</label>
<label><input type=checkbox data-k=play_animation> animate</label>
<br>
<label>svgf color w <input type=range data-k=svgf_color_w min=0 max=1 step=0.05></label>
<label>moments w <input type=range data-k=svgf_moments_w min=0 max=1 step=0.05></label>
<label>taa w <input type=range data-k=taa_w min=0 max=1 step=0.05></label>
<div class=note>first flip of a toggle jit-compiles that pipeline variant once</div>
</div>
<script>
const keys = new Set(); let right=false, wheel=0, mx=0, my=0, upd=null;
const img = document.getElementById('v');
img.oncontextmenu = e => e.preventDefault();
addEventListener('keydown', e => keys.add(e.key.toLowerCase()));
addEventListener('keyup',   e => keys.delete(e.key.toLowerCase()));
// a key released while the tab is unfocused never sends keyup here —
// drop all held keys on blur so the camera can't drift forever
addEventListener('blur', () => { keys.clear(); right = false; });
img.onmousedown = e => { if (e.button === 2) right = true; };
addEventListener('mouseup', e => { if (e.button === 2) right = false; });
img.onmousemove = e => { mx = e.offsetX; my = e.offsetY; };
img.onwheel = e => { wheel += Math.sign(e.deltaY); e.preventDefault(); };
let synced = false;
for (const el of document.querySelectorAll('#panel input')) {
  el.onchange = () => {
    upd = upd || {};
    upd[el.dataset.k] = el.type === 'checkbox' ? el.checked : parseFloat(el.value);
  };
}
function syncPanel(settings) {
  if (synced) return; synced = true;
  for (const el of document.querySelectorAll('#panel input')) {
    const v = settings[el.dataset.k];
    if (v === undefined) continue;
    if (el.type === 'checkbox') el.checked = v; else el.value = v;
  }
}
// frames arrive as RAW RGB rows (PNG encode measured 26-40 ms/frame at
// 512x512 on the single host core — it dominated the loop; raw is ~free
// on localhost) and blit through one reused ImageData
const ctx = img.getContext('2d');
const idat = ctx.createImageData(%W%, %H%);
idat.data.fill(255);
async function loop() {
  const inp = {keys: [...keys], mouse: [mx, my], right, wheel};
  if (upd) { inp.settings = upd; upd = null; }
  wheel = 0;
  const r = await fetch('/frame', {method:'POST', body: JSON.stringify(inp)});
  const stats = JSON.parse(r.headers.get('x-stats'));
  syncPanel(stats.settings || {});
  const {settings, ...rest} = stats;
  document.getElementById('s').textContent = JSON.stringify(rest);
  const rgb = new Uint8Array(await r.arrayBuffer());
  const px = idat.data;
  for (let i = 0, j = 0; i < rgb.length; i += 3, j += 4) {
    px[j] = rgb[i]; px[j+1] = rgb[i+1]; px[j+2] = rgb[i+2];
  }
  ctx.putImageData(idat, 0, 0);
  requestAnimationFrame(loop);
}
loop();
</script></body></html>"""


def serve(explorer: SceneExplorer, host: str = "127.0.0.1", port: int = 8008):
    """Blocking single-renderer HTTP loop; one frame per POST /frame."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    lock = threading.Lock()
    last_t = [time.monotonic()]
    page = (
        _PAGE.replace("%W%", str(explorer.cfg.width))
        .replace("%H%", str(explorer.cfg.height))
        .encode()
    )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("content-type", "text/html")
            self.end_headers()
            self.wfile.write(page)

        def do_POST(self):
            n = int(self.headers.get("content-length", 0))
            inp = json.loads(self.rfile.read(n) or b"{}")
            with lock:  # one JAX renderer, serialized
                now = time.monotonic()
                dt = min(now - last_t[0], 0.25)
                last_t[0] = now
                if inp.get("settings"):
                    explorer.apply_settings(inp["settings"])
                explorer.handle_events(
                    dt,
                    set(inp.get("keys", [])),
                    tuple(inp.get("mouse") or (0, 0)),
                    bool(inp.get("right", False)),
                    float(inp.get("wheel", 0.0)),
                )
                frame = explorer.render_frame()
                stats = explorer.stats()
                stats["settings"] = explorer.settings()
            # raw RGB rows, not PNG: encode measured 26-40 ms/frame at
            # 512x512 on this host's single core — more than the device
            # render itself.  The page blits via canvas putImageData.
            body = np.ascontiguousarray(frame).tobytes()
            self.send_response(200)
            self.send_header("content-type", "application/octet-stream")
            self.send_header("x-stats", json.dumps(stats))
            self.send_header("content-length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer((host, port), Handler)
    print(f"lprt explorer: http://{host}:{srv.server_address[1]}/  (ctrl-c to stop)")
    return srv
