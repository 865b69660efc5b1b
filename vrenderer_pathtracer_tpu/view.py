"""Live terminal viewer: the interactive display loop.

The reference is an *interactive* renderer — a 0-ms QTimer repaints
continuously while mouse drags orbit/dolly the camera and the HUD shows
fps / ms / spp (``src/NGLScene.cpp:234-343``,
``src/NGLSceneMouseControls.cpp:13-99``).  Round 1 had the camera math and
the progressive loop but nothing binding them to a display; this module is
that binding, Qt/GL-free: frames draw as ANSI 24-bit half-blocks (two
pixels per character cell), keys drive the same camera updates the
reference's mouse did, and every scene edit restarts progressive
accumulation exactly like ``clearBuffer()``.

Key map (reference affordance in parens):
  arrows / hjkl   orbit yaw/pitch          (LMB drag, 0.00174532925 rad/px)
  w / s           dolly forward/back       (RMB drag)
  enter           toggle color/depth view  (Return key)
  f               toggle FXAA              (UI checkbox)
  [ / ]           fresnel coefficient -/+  (UI slider, clears accumulation)
  ; / '           fresnel power -/+        (UI slider)
  q / Esc         quit                     (Escape)

Works headless too: ``TerminalViewer.run(max_passes=N, interactive=False)``
drives the same loop without a tty (used by tests and CI).
"""

from __future__ import annotations

import select
import sys
import time

import numpy as np

# Pixels of simulated mouse drag per orbit keypress.
ORBIT_PX = 40.0
DOLLY_STEP = 6.0


class TerminalViewer:
    """Progressive render loop + ANSI display + key handling."""

    def __init__(self, renderer, out=None, max_cols: int = 0,
                 max_rows: int = 0):
        self.r = renderer
        self.out = out if out is not None else sys.stdout
        self.show_depth = False
        self.quit = False
        self._max_cols = max_cols
        self._max_rows = max_rows
        self._passes = 0
        self._t0 = time.perf_counter()
        self._last_ms = 0.0

    # -- display ------------------------------------------------------------

    def _term_size(self):
        if self._max_cols and self._max_rows:
            return self._max_cols, self._max_rows
        try:
            import shutil

            size = shutil.get_terminal_size()
            cols, rows = size.columns, size.lines
        except Exception:
            cols, rows = 80, 24
        if self._max_cols:
            cols = min(cols, self._max_cols)
        if self._max_rows:
            rows = min(rows, self._max_rows)
        return max(cols, 8), max(rows - 2, 4)  # leave room for the HUD

    def _downsample(self, img, cols, rows2):
        """Nearest-sample img [H,W,3] to (rows2, cols) for display."""
        h, w = img.shape[:2]
        ys = np.clip((np.arange(rows2) + 0.5) * (h / rows2), 0, h - 1)
        xs = np.clip((np.arange(cols) + 0.5) * (w / cols), 0, w - 1)
        return img[ys.astype(int)[:, None], xs.astype(int)[None, :]]

    def draw(self, img, depth):
        """One ANSI frame: half-block image + HUD line."""
        cols, rows = self._term_size()
        if self.show_depth:
            # Reference displays (1 - depth) as grayscale (tonemap.py).
            shown = np.repeat((1.0 - depth)[..., None], 3, axis=-1)
        else:
            shown = img
        # Image rows are y-up (pixel 0 = bottom): flip for display.
        shown = np.clip(np.asarray(shown, np.float32)[::-1], 0.0, 1.0)
        small = self._downsample(shown, cols, rows * 2)
        rgb = (small * 255.0 + 0.5).astype(np.uint8)
        lines = ["\x1b[H"]  # cursor home
        for rr in range(rows):
            top = rgb[2 * rr]
            bot = rgb[2 * rr + 1]
            cells = []
            for cc in range(cols):
                tr, tg, tb = top[cc]
                br, bg, bb = bot[cc]
                cells.append(
                    f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg};{bb}m▀")
            lines.append("".join(cells) + "\x1b[0m\n")
        lines.append("\x1b[0m\x1b[K" + self.hud() + "\n")
        self.out.write("".join(lines))
        self.out.flush()

    def hud(self) -> str:
        """fps / ms / spp overlay (``src/NGLScene.cpp:324-342``)."""
        fps = 1000.0 / self._last_ms if self._last_ms > 0 else 0.0
        channel = "depth" if self.show_depth else "color"
        return (f"{fps:5.1f} fps | {self._last_ms:7.1f} ms/pass | "
                f"{self.r.samples_per_pixel} spp | {channel} | "
                f"fresnel {float(self.r.fresnel_coef):.2f}/"
                f"{float(self.r.fresnel_pow):.1f} | q quits")

    # -- input --------------------------------------------------------------

    def handle_key(self, key: str) -> None:
        """Apply one key (escape sequences already translated to names)."""
        r = self.r
        if key in ("q", "esc"):
            self.quit = True
        elif key in ("left", "h"):
            r.set_camera(r.camera.orbit(-ORBIT_PX, 0.0))
        elif key in ("right", "l"):
            r.set_camera(r.camera.orbit(ORBIT_PX, 0.0))
        elif key in ("up", "k"):
            r.set_camera(r.camera.orbit(0.0, ORBIT_PX))
        elif key in ("down", "j"):
            r.set_camera(r.camera.orbit(0.0, -ORBIT_PX))
        elif key == "w":
            r.set_camera(r.camera.move_forward(DOLLY_STEP))
        elif key == "s":
            r.set_camera(r.camera.move_forward(-DOLLY_STEP))
        elif key == "enter":
            self.show_depth = not self.show_depth
        elif key == "f":
            r.toggle_fxaa(not r.settings.use_fxaa)
        elif key == "[":
            r.set_fresnel_coef(max(float(r.fresnel_coef) - 0.05, 0.0))
        elif key == "]":
            r.set_fresnel_coef(min(float(r.fresnel_coef) + 0.05, 1.0))
        elif key == ";":
            r.set_fresnel_power(max(float(r.fresnel_pow) - 0.5, 0.0))
        elif key == "'":
            r.set_fresnel_power(float(r.fresnel_pow) + 0.5)

    def _read_keys_nonblocking(self):
        """Pending keys from a raw-mode stdin, escape sequences decoded."""
        keys = []
        while select.select([sys.stdin], [], [], 0)[0]:
            ch = sys.stdin.read(1)
            if ch == "\x1b":
                if select.select([sys.stdin], [], [], 0.01)[0]:
                    seq = sys.stdin.read(1)
                    if seq == "[" and select.select([sys.stdin], [], [], 0.01)[0]:
                        code = sys.stdin.read(1)
                        keys.append({"A": "up", "B": "down", "C": "right",
                                     "D": "left"}.get(code, ""))
                        continue
                keys.append("esc")
            elif ch in ("\r", "\n"):
                keys.append("enter")
            else:
                keys.append(ch)
        return [k for k in keys if k]

    # -- the loop -----------------------------------------------------------

    def step(self, keys=()) -> None:
        """One viewer iteration: apply keys, render a pass, draw."""
        for k in keys:
            self.handle_key(k)
            if self.quit:
                return
        t0 = time.perf_counter()
        img, depth = self.r.render()
        img = np.asarray(img)
        depth = np.asarray(depth)
        self._last_ms = (time.perf_counter() - t0) * 1e3
        self._passes += 1
        self.draw(img, depth)

    def run(self, max_passes: int | None = None, interactive: bool | None = None):
        """Drive the loop; interactive defaults to stdin being a tty."""
        if interactive is None:
            interactive = sys.stdin.isatty()
        if not interactive:
            n = max_passes if max_passes is not None else 8
            for _ in range(n):
                if self.quit:
                    break
                self.step()
            return

        import termios
        import tty

        fd = sys.stdin.fileno()
        saved = termios.tcgetattr(fd)
        self.out.write("\x1b[2J\x1b[?25l")  # clear, hide cursor
        try:
            tty.setcbreak(fd)
            while not self.quit:
                self.step(self._read_keys_nonblocking())
                if max_passes is not None and self._passes >= max_passes:
                    break
        finally:
            termios.tcsetattr(fd, termios.TCSADRAIN, saved)
            self.out.write("\x1b[?25h\x1b[0m\n")  # show cursor
            self.out.flush()
