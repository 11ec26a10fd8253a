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
