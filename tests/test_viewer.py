"""Terminal viewer: display loop, key handling, CLI integration.

The reference's interactive affordances (NGLScene 0-ms repaint, mouse
orbit/dolly, Return channel toggle, HUD) re-expressed — exercised headless
through an in-memory stream.
"""

import io

import numpy as np

from vrenderer_pathtracer_tpu import Renderer, RenderSettings
from vrenderer_pathtracer_tpu.view import TerminalViewer

SETTINGS = RenderSettings(
    use_cornell_box=True, has_hdr=False, samples_per_pass=1, bounces=2)


def _viewer(w=16, h=16):
    r = Renderer(w, h, settings=SETTINGS)
    out = io.StringIO()
    return TerminalViewer(r, out=out, max_cols=24, max_rows=10), r, out


def test_headless_loop_draws_frames():
    v, r, out = _viewer()
    v.run(max_passes=3, interactive=False)
    assert r.get_frame_count() == 4  # 3 passes
    text = out.getvalue()
    assert "\x1b[38;2;" in text and "▀" in text  # truecolor half-blocks
    assert "spp" in text  # HUD line
    assert "3 spp" in text.split("\n")[-2] or "spp" in text


def test_orbit_keys_restart_accumulation():
    v, r, out = _viewer()
    v.step()
    assert r.get_frame_count() == 2
    yaw0 = float(r.camera.yaw)
    v.step(keys=["right"])
    # Camera moved by the reference drag constant * ORBIT_PX px and the
    # progressive state restarted (clearBuffer semantics).
    from vrenderer_pathtracer_tpu.view import ORBIT_PX

    assert np.isclose(float(r.camera.yaw) - yaw0,
                      r.camera.DRAG_RAD_PER_PX * ORBIT_PX)
    assert r.get_frame_count() == 2  # cleared to 1, then one pass

    origin0 = np.asarray(r.camera.origin)
    v.step(keys=["w"])
    assert not np.allclose(np.asarray(r.camera.origin), origin0)


def test_depth_toggle_and_quit():
    v, r, out = _viewer()
    v.step(keys=["enter"])
    assert v.show_depth
    hud = v.hud()
    assert "depth" in hud
    v.step(keys=["enter"])
    assert not v.show_depth
    v.step(keys=["q"])
    assert v.quit


def test_fresnel_keys_update_sliders():
    v, r, _ = _viewer()
    c0 = float(r.fresnel_coef)
    v.handle_key("]")
    assert float(r.fresnel_coef) > c0
    v.handle_key("[")
    assert np.isclose(float(r.fresnel_coef), c0)
    p0 = float(r.fresnel_pow)
    v.handle_key("'")
    assert float(r.fresnel_pow) > p0


def test_cli_view_headless(capsys):
    from vrenderer_pathtracer_tpu.cli import main

    rc = main([
        "view", "--cornell", "--width", "16", "--height", "16",
        "--samples-per-pass", "1", "--bounces", "2",
        "--passes", "2", "--headless", "--cpu",
        "--cols", "20", "--rows", "8",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "▀" in out and "spp" in out
