"""App driver smoke test (reference main.rs bootstrap + frame loop)."""

import numpy as np

from wavefront_tpu.app.main import main


def test_app_runs_headless_frames(tmp_path, capsys):
    main([
        "--width", "16", "--height", "16", "--bounces", "1",
        "--max-steps", "16", "--frames", "3", "--window-chunks", "0",
        "--nee-type", "0", "--headless",
    ])
    out = capsys.readouterr().out
    assert "done: 3 frames" in out


def test_app_renders_and_accumulates(tmp_path):
    import wavefront_tpu.app.main as appmain

    world_holder = {}
    orig_build = appmain.build_world

    def capture(args):
        w = orig_build(args)
        world_holder["w"] = w
        return w

    appmain.build_world = capture
    try:
        appmain.main([
            "--width", "16", "--height", "16", "--bounces", "1",
            "--max-steps", "24", "--frames", "3", "--window-chunks", "0",
            "--nee-type", "0", "--accumulate", "--hold",
        ])
    finally:
        appmain.build_world = orig_build
    w = world_holder["w"]
    assert w.last_image is not None
    assert w.last_image.shape == (16, 16, 3)
    assert np.all(np.isfinite(w.last_image))


def test_viewer_input_channel():
    """POST /input -> drain_events round trip: the browser's keyboard/mouse
    capture reaches the frame loop as world.input Event records (the
    reference's interactive contract, main.rs:871-883,
    handle_user_input.rs:57-135)."""
    import json
    import urllib.request

    from wavefront_tpu.app.viewer import Viewer

    v = Viewer(port=0)
    try:
        v.publish(np.zeros((8, 8, 3), np.float32))
        base = f"http://127.0.0.1:{v.port}"
        page = urllib.request.urlopen(base + "/").read()
        assert b"/input" in page and b"mousedown" in page
        batch = [
            {"kind": "key_down", "key": "w"},
            {"kind": "mouse_down", "button": "middle"},
            {"kind": "mouse_move", "x": 12.5, "y": 7.0},
            {"kind": "wheel", "dy": 1.0},
            {"kind": "key_up", "key": "w"},
        ]
        req = urllib.request.Request(
            base + "/input", data=json.dumps(batch).encode(), method="POST"
        )
        assert urllib.request.urlopen(req).status == 204
        evs = v.drain_events()
        assert [e.kind for e in evs] == [
            "key_down", "mouse_down", "mouse_move", "wheel", "key_up"
        ]
        assert evs[2].x == 12.5 and evs[2].y == 7.0
        assert evs[1].button == "middle" and evs[3].dy == 1.0
        assert v.drain_events() == []
    finally:
        v.close()


def test_camera_orbit_from_window_events():
    """GameWorld routes mouse events to the interactive camera: middle-drag
    orbits (yaw/pitch), wheel zooms (reference camera.rs:144-203)."""
    from wavefront_tpu.core.config import RenderSettings, WorldSettings
    from wavefront_tpu.world.blocks import BlockRegistry
    from wavefront_tpu.world.game_world import GameWorld
    from wavefront_tpu.world.input import Event
    import os

    assets = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets")
    registry = BlockRegistry.load(assets)
    world = GameWorld(
        registry,
        settings=RenderSettings(width=32, height=32, num_bounces=1),
        world_settings=WorldSettings(),
        window_chunks=0,
        headless=True,
    )
    cam = world.camera
    yaw0, pitch0, off0 = cam.yaw, cam.pitch, cam.offset
    # move without drag: no orbit
    world.handle_window_event(Event("mouse_move", x=16.0, y=16.0))
    world.step()
    assert cam.yaw == yaw0 and cam.pitch == pitch0
    # middle-drag: orbit
    world.handle_window_event(Event("mouse_down", button="middle"))
    world.handle_window_event(Event("mouse_move", x=24.0, y=12.0))
    world.step()
    assert cam.yaw != yaw0 and cam.pitch != pitch0
    world.handle_window_event(Event("mouse_up", button="middle"))
    # wheel: zoom
    world.handle_window_event(Event("wheel", dy=2.0))
    world.step()
    assert cam.offset == off0 - 2.0
