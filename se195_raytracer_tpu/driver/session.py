"""Interactive render session: the reference's keystroke edit loop as an
API.

Re-expresses displayfunc.cpp's GLUT keyboard surface (keyFunc:251-362,
specialFunc:364-420, key catalog README.txt:19-31) headlessly: every edit
mutates the camera/scene and restarts progressive accumulation exactly
like ReInit(0)/ReInitScene (currentSample=0, seeds preserved —
smallptGPU.cpp:784-830), while ``refresh()`` is ReInit(1) (buffers
reallocated, fresh seeds). ``key()`` dispatches the original bindings.

Rotation quirk kept: the reference updates t.y and then uses the *new*
t.y in the t.z update (specialFunc:367-373 etc.), making arrow rotations
slightly non-orthogonal; we replicate the exact arithmetic.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.core.types import Camera, Scene, update_camera
from se195_raytracer_tpu.driver.render import init_render_state, render

MOVE_STEP = 10.0
ROTATE_STEP = 2.0 * math.pi / 180.0


class RenderSession:
    def __init__(self, scene: Scene, camera: Camera, config: RenderConfig):
        self.scene = scene
        self.camera = camera
        self.config = config
        self.current_sphere = 0
        self.state = init_render_state(config)
        self._image = None

    # ---- progressive loop (idleFunc analogue) ----

    def step(self, samples: int = 1) -> np.ndarray:
        """Advance accumulation by ``samples`` passes; returns the image."""
        cfg = self.config
        import dataclasses

        cfg_n = dataclasses.replace(cfg, spp=samples, use_pallas=False)
        img, self.state = render(self.scene, self.camera, cfg_n, state=self.state)
        self._image = np.asarray(img)
        return self._image

    # Fixed batch ladder for step_for: each distinct spp value jits one
    # render program, so the whole session compiles at most
    # len(STEP_LADDER) distinct programs (plus step(1)'s, shared with rung
    # 0) — no per-k compile churn while the wall-clock budget is measured.
    STEP_LADDER = (1, 8, 64)

    def step_for(self, budget_s: float = 0.1) -> np.ndarray:
        """Adaptive multi-launch batching (smallptGPU.cpp:739-755): below
        20 accumulated samples, one pass per call for fast interactive
        feedback; past that, keep adding batches of passes until the
        wall-clock budget is spent — the reference's re-launch-until-
        threshold loop, with the device-side sample scan replacing
        individual kernel launches. Batch sizes climb the fixed
        ``STEP_LADDER`` so only 3 distinct programs are ever compiled."""
        import time as _time

        if self.current_sample < 20:
            return self.step(1)
        t0 = _time.perf_counter()
        img = self.step(self.STEP_LADDER[0])
        rung = 0
        while _time.perf_counter() - t0 < budget_s:
            rung = min(rung + 1, len(self.STEP_LADDER) - 1)
            img = self.step(self.STEP_LADDER[rung])
        return img

    @property
    def current_sample(self) -> int:
        return int(self.state.sample)

    # ---- ReInit semantics ----

    def _reinit(self):
        """ReInit(0)/ReInitScene: restart accumulation, keep seeds
        (smallptGPU.cpp:784-830)."""
        self.state = self.state._replace(
            accum=jnp.zeros_like(self.state.accum), sample=jnp.int32(0)
        )

    def refresh(self):
        """ReInit(1): reallocate buffers — fresh seeds (AllocateBuffers)."""
        self.state = init_render_state(self.config)

    # ---- camera edits (keyFunc:277-320, specialFunc) ----

    def _move(self, delta):
        self.camera = Camera(
            orig=self.camera.orig + delta, target=self.camera.target + delta
        )
        self._reinit()

    def move_right(self):  # 'd'
        x = self.camera_basis().x
        self._move(MOVE_STEP * x / jnp.linalg.norm(x))

    def move_left(self):  # 'a'
        x = self.camera_basis().x
        self._move(-MOVE_STEP * x / jnp.linalg.norm(x))

    def move_forward(self):  # 'w'
        self._move(MOVE_STEP * self.camera_basis().dir)

    def move_backward(self):  # 's'
        self._move(-MOVE_STEP * self.camera_basis().dir)

    def move_up(self):  # 'r'
        self._move(jnp.array([0.0, MOVE_STEP, 0.0]))

    def move_down(self):  # 'f'
        self._move(jnp.array([0.0, -MOVE_STEP, 0.0]))

    def target_up(self):  # PageUp
        self.camera = self.camera.replace(
            target=self.camera.target + jnp.array([0.0, MOVE_STEP, 0.0])
        )
        self._reinit()

    def target_down(self):  # PageDown
        self.camera = self.camera.replace(
            target=self.camera.target - jnp.array([0.0, MOVE_STEP, 0.0])
        )
        self._reinit()

    def _rotate_vertical(self, angle: float):
        """UP/DOWN arrows — sequential y-then-z update, as the reference."""
        t = self.camera.target - self.camera.orig
        ty = t[1] * math.cos(angle) + t[2] * math.sin(angle)
        tz = -ty * math.sin(angle) + t[2] * math.cos(angle)
        t = jnp.array([t[0], ty, tz])
        self.camera = self.camera.replace(target=t + self.camera.orig)
        self._reinit()

    def _rotate_horizontal(self, angle: float):
        t = self.camera.target - self.camera.orig
        tx = t[0] * math.cos(angle) - t[2] * math.sin(angle)
        tz = tx * math.sin(angle) + t[2] * math.cos(angle)
        t = jnp.array([tx, t[1], tz])
        self.camera = self.camera.replace(target=t + self.camera.orig)
        self._reinit()

    def rotate_up(self):
        self._rotate_vertical(-ROTATE_STEP)

    def rotate_down(self):
        self._rotate_vertical(ROTATE_STEP)

    def rotate_left(self):
        self._rotate_horizontal(-ROTATE_STEP)

    def rotate_right(self):
        self._rotate_horizontal(ROTATE_STEP)

    def camera_basis(self):
        return update_camera(self.camera, self.config.width, self.config.height)

    # ---- object edits (keyFunc:322-355) ----

    def select_next(self):  # '+'
        self.current_sphere = (self.current_sphere + 1) % self.scene.num_spheres
        self._reinit()

    def select_prev(self):  # '-'
        n = self.scene.num_spheres
        self.current_sphere = (self.current_sphere + n - 1) % n
        self._reinit()

    def move_sphere(self, dx=0.0, dy=0.0, dz=0.0):
        delta = jnp.array([dx, dy, dz], jnp.float32)
        self.scene = self.scene.replace(
            center=self.scene.center.at[self.current_sphere].add(delta)
        )
        self._reinit()

    # ---- output ('p') ----

    def save_image(self, path: str):
        from se195_raytracer_tpu.io.image import write_image
        from se195_raytracer_tpu.ops.tonemap import to_int_np

        img = self._image if self._image is not None else self.step(0 or 1)
        write_image(to_int_np(img).astype(np.uint8), path)

    # ---- key dispatch (README.txt:19-31 bindings) ----

    def key(self, k: str, path: str = "image.ppm") -> bool:
        """Apply one reference key binding. Returns False for ESC."""
        half = 0.5 * MOVE_STEP
        table = {
            "a": self.move_left, "d": self.move_right,
            "w": self.move_forward, "s": self.move_backward,
            "r": self.move_up, "f": self.move_down,
            "+": self.select_next, "-": self.select_prev,
            "4": lambda: self.move_sphere(dx=-half),
            "6": lambda: self.move_sphere(dx=half),
            "8": lambda: self.move_sphere(dz=-half),
            "2": lambda: self.move_sphere(dz=half),
            "9": lambda: self.move_sphere(dy=half),
            "3": lambda: self.move_sphere(dy=-half),
            " ": self.refresh,
            "up": self.rotate_up, "down": self.rotate_down,
            "left": self.rotate_left, "right": self.rotate_right,
            "pageup": self.target_up, "pagedown": self.target_down,
        }
        if k == "p":
            self.save_image(path)
            return True
        if k == "\x1b":
            return False
        fn = table.get(k)
        if fn is not None:
            fn()
        return True
