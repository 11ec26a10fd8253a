"""Live viewer: stream rendered frames to a browser over HTTP.

The reference presents through a winit window + Vulkan swapchain
(main.rs:796-804, interactive_rendering.rs:1636-1646).  A TPU host has no
display stack, so the interactive story here is a streamed viewer: a tiny
threaded HTTP server exposes

    /          a page showing the live stream + fps overlay
    /stream    multipart/x-mixed-replace MJPEG of the latest frame
    /frame     single JPEG snapshot
    /stats     JSON {frame, fps}

The app driver pushes each rendered frame with `viewer.publish(img)`;
encoding happens lazily per connected client, so an unwatched run pays
nothing beyond a numpy copy.

Run:  python -m wavefront_tpu.app.main --frames 100000 --serve 8787
then open http://localhost:8787/.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from wavefront_tpu.render.screenshot import to_srgb_bytes

_PAGE = b"""<!doctype html>
<html><head><title>wavefront-tpu live</title><style>
body { background:#111; color:#ddd; font-family:monospace; text-align:center }
img { image-rendering:pixelated; width:70vmin; height:auto;
      border:1px solid #333; margin-top:2em }
</style></head><body>
<h3>wavefront-tpu live</h3>
<img src="/stream">
<p id="s"></p>
<script>
setInterval(async () => {
  const r = await fetch('/stats'); const j = await r.json();
  document.getElementById('s').textContent =
    `frame ${j.frame}  ${j.fps.toFixed(1)} fps`;
}, 1000);
</script></body></html>"""


class Viewer:
    """Thread-safe latest-frame store + HTTP server."""

    def __init__(self, port: int = 8787, host: str = "127.0.0.1",
                 quality: int = 85):
        self._lock = threading.Condition()
        self._frame: np.ndarray | None = None
        self._seq = 0
        self._fps = 0.0
        self._last_pub = None
        self.quality = quality

        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                try:
                    if self.path == "/":
                        self.send_response(200)
                        self.send_header("Content-Type", "text/html")
                        self.end_headers()
                        self.wfile.write(_PAGE)
                    elif self.path == "/frame":
                        jpg = viewer._encode()
                        if jpg is None:
                            self.send_response(503)
                            self.end_headers()
                            return
                        self.send_response(200)
                        self.send_header("Content-Type", "image/jpeg")
                        self.end_headers()
                        self.wfile.write(jpg)
                    elif self.path == "/stats":
                        self.send_response(200)
                        self.send_header("Content-Type", "application/json")
                        self.end_headers()
                        self.wfile.write(json.dumps(
                            {"frame": viewer._seq, "fps": viewer._fps}
                        ).encode())
                    elif self.path == "/stream":
                        self.send_response(200)
                        self.send_header(
                            "Content-Type",
                            "multipart/x-mixed-replace; boundary=F",
                        )
                        self.end_headers()
                        seen = -1
                        while True:
                            with viewer._lock:
                                viewer._lock.wait_for(
                                    lambda: viewer._seq != seen, timeout=5.0
                                )
                                seen = viewer._seq
                            jpg = viewer._encode()
                            if jpg is None:
                                continue
                            self.wfile.write(
                                b"--F\r\nContent-Type: image/jpeg\r\n"
                                + f"Content-Length: {len(jpg)}\r\n\r\n".encode()
                            )
                            self.wfile.write(jpg)
                            self.wfile.write(b"\r\n")
                    else:
                        self.send_response(404)
                        self.end_headers()
                except (BrokenPipeError, ConnectionResetError):
                    pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_port
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def publish(self, img: np.ndarray) -> None:
        """Called by the frame loop with the latest (H, W, 3) float image."""
        now = time.perf_counter()
        with self._lock:
            self._frame = np.asarray(img)
            self._seq += 1
            if self._last_pub is not None:
                dt = now - self._last_pub
                inst = 1.0 / dt if dt > 0 else 0.0
                self._fps = 0.9 * self._fps + 0.1 * inst if self._fps else inst
            self._last_pub = now
            self._lock.notify_all()

    def _encode(self):
        from PIL import Image

        with self._lock:
            frame = self._frame
        if frame is None:
            return None
        buf = io.BytesIO()
        Image.fromarray(to_srgb_bytes(frame), "RGB").save(
            buf, "JPEG", quality=self.quality
        )
        return buf.getvalue()

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
