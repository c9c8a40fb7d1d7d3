"""Auxiliary subsystems: controllers, checkpoint/resume, diagnostics,
temporal reprojection identity."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from low_precision_raytracer_tpu.config import RenderConfig, get_precision
from low_precision_raytracer_tpu.gui.controller import HoldRotateController, MoveController
from low_precision_raytracer_tpu.models.hierarchy import build_flat_scene
from low_precision_raytracer_tpu.models.procedural import cornell_box_scene
from low_precision_raytracer_tpu.models.scene import build_scene_arrays, frame_input_from_flat
from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
from low_precision_raytracer_tpu.ops.diagnostics import fallback_rate
from low_precision_raytracer_tpu.render.checkpoint import load_checkpoint, save_checkpoint
from low_precision_raytracer_tpu.render.framestate import init_frame_state


def test_move_controller_accelerates_and_clamps():
    c = MoveController(initial_speed=1.0, acceleration=10.0, max_speed=5.0, max_position=100.0)
    for _ in range(50):
        c.receive_event(0.1, True, False)
    assert c.accumulated_pos > 0
    assert abs(c._speed) <= 5.0 + 1e-9
    # releasing resets speed
    c.receive_event(0.1, False, False)
    assert c._speed == 0.0
    v = c.pop_value()
    assert v > 0 and c.get_value() == 0.0


def test_rotate_controller_drag_and_clamp():
    c = HoldRotateController()
    c.receive_event((0, 0), right_down=True)
    c.receive_event((100, 5000), right_down=True)
    assert c.acc_x != 0
    assert c.acc_y == c.y_max  # pitch clamped
    c.receive_event((100, 5000), right_down=False, wheel=100.0)
    assert c.acc_z == c.z_max  # fov clamped
    c.clear()
    assert c.acc_x == 0 and abs(c.acc_z - math.pi * 0.3) < 1e-9


def test_checkpoint_roundtrip(tmp_path):
    cfg = RenderConfig(width=16, height=16, precision="bf16")
    state = init_frame_state(cfg, n_objects=3)
    state = state._replace if hasattr(state, "_replace") else state
    import dataclasses

    state = dataclasses.replace(
        state, taa_history=jnp.full((16, 16, 3), 0.25, cfg.dtype)
    )
    key = jax.random.PRNGKey(42)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, key, 7)
    s2, k2, fi = load_checkpoint(path)
    assert fi == 7
    np.testing.assert_array_equal(
        np.asarray(state.taa_history, np.float32), np.asarray(s2.taa_history, np.float32)
    )
    assert s2.last_l2w.shape == (3, 4, 4)
    # keys produce the same randomness
    a = jax.random.uniform(key, (4,))
    b = jax.random.uniform(k2, (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fallback_rate_bf16_exceeds_fp32():
    """bf16's wider error bands must produce a higher fp32-fallback rate."""
    host = cornell_box_scene()
    rates = {}
    for name in ("fp32", "bf16"):
        prec = get_precision(name)
        scene = build_scene_arrays(host, prec, leaf_size=4)
        flat = build_flat_scene(host.root, host.active_camera)
        frame = frame_input_from_flat(flat, host, prec)
        o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, 24, 24, prec.dtype)
        stats = fallback_rate(scene, frame, o.reshape(-1, 3), d.reshape(-1, 3), prec)
        rates[name] = float(stats["rate"])
        assert 0.0 <= rates[name] <= 1.0
    assert rates["bf16"] >= rates["fp32"]
    assert rates["bf16"] > 0.0  # the band is actually exercised
