"""Interactive-viewer support (reference L6: `rt/gui/`).

The heavy UI (GLFW/ImGui) has no TPU-side equivalent; the headless CLI
(`low_precision_raytracer_tpu.cli`) is the primary interface.  This package
keeps the interaction logic that IS portable: the camera controllers."""

from low_precision_raytracer_tpu.gui.controller import (
    HoldRotateController,
    MoveController,
)

__all__ = ["MoveController", "HoldRotateController"]
