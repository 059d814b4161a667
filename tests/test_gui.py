"""Interactive viewer (utils/gui.py) — the reference GUI's protocol.

Covers the util/gui.h:27 interaction surface: HTTP page + frame serving,
keyboard events mutating the camera transform / exposure, the
RESET/EXIT/NONE DisplayState protocol, and the progressive render loop
resetting accumulation on camera movement (wavefront/integrator.cpp:444-472
analogue).
"""

import json
import urllib.request

import numpy as np

from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.scenes.cornell import cornell_box
from pbrt_tpu.utils.gui import GUI, DisplayState, interactive_render_loop


def _post(url, data=b""):
    req = urllib.request.Request(url, data=data, method="POST")
    return urllib.request.urlopen(req, timeout=5).read()


def _get(url):
    return urllib.request.urlopen(url, timeout=5).read()


def test_gui_http_surface():
    gui = GUI("test", (8, 8))
    try:
        page = _get(gui.url).decode()
        assert "frame.png" in page and "test" in page

        st = json.loads(_get(gui.url + "state"))
        assert st["frame"] == 0 and st["spp"] == 0

        gui.update_framebuffer(np.full((8, 8, 3), 0.5, np.float32), spp=4)
        png = _get(gui.url + "frame.png")
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        st = json.loads(_get(gui.url + "state"))
        assert st["frame"] == 1 and st["spp"] == 4
    finally:
        gui.close()


def test_gui_keyboard_camera_protocol():
    gui = GUI("test", (8, 8))
    try:
        # No input -> NONE.
        assert gui.refresh_display() is DisplayState.NONE

        # Dolly forward: camera transform gains +z translation -> RESET.
        _post(gui.url + "key", b"w")
        assert gui.refresh_display() is DisplayState.RESET
        m = np.asarray(gui.get_camera_transform().m)
        assert m[2, 3] > 0.0

        # Yaw changes the rotation block.
        _post(gui.url + "key", b"ArrowRight")
        assert gui.refresh_display() is DisplayState.RESET
        m2 = np.asarray(gui.get_camera_transform().m)
        assert abs(m2[0, 2]) > 0.0

        # Exposure keys mutate exposure and request a redraw.
        e0 = gui.exposure
        _post(gui.url + "key", b"=")
        assert gui.refresh_display() is DisplayState.RESET
        assert gui.exposure > e0

        # 'c' latches print_camera_transform without resetting.
        _post(gui.url + "key", b"c")
        assert gui.refresh_display() is DisplayState.NONE
        assert gui.print_camera_transform

        # Escape -> EXIT (sticky).
        _post(gui.url + "key", b"Escape")
        assert gui.refresh_display() is DisplayState.EXIT
        assert gui.refresh_display() is DisplayState.EXIT
    finally:
        gui.close()


def test_interactive_render_loop_accumulates_and_exits():
    scene, camera = cornell_box(resolution=(16, 16))
    integrator = PathIntegrator(max_depth=2)
    gui = GUI("loop", camera.resolution)
    try:
        img = interactive_render_loop(
            scene, camera, integrator, gui, samples_per_pass=1, max_passes=2
        )
        assert img.shape == (16, 16, 3)
        assert np.isfinite(img).all() and img.max() > 0.0
        # Frames were published for both passes.
        assert json.loads(_get(gui.url + "state"))["spp"] == 2

        # A camera move mid-loop resets accumulation (spp restarts).
        _post(gui.url + "key", b"w")
        interactive_render_loop(
            scene, camera, integrator, gui, samples_per_pass=1, max_passes=3
        )
        st = json.loads(_get(gui.url + "state"))
        assert st["spp"] < 3  # reset happened after the move
    finally:
        gui.close()
