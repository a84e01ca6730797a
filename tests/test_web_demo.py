"""Web demo end-to-end over a real socket with a stub restore fn."""
import base64
import io
import json
import socket
import urllib.request

import numpy as np
from PIL import Image

from faithdiff_tpu.serving.web_demo import DemoApp, serve


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_web_demo_restore_roundtrip():
    def restore_fn(img, caption, **opts):
        assert opts["upscale"] == 2 and opts["color_fix"] == "adain"
        return np.clip(img.astype(np.float32) * 1.1, 0, 255).astype(np.uint8)

    def caption_fn(img):
        return f"an image of shape {img.shape}"

    app = DemoApp(restore_fn, caption_fn)
    port = _free_port()
    server = serve(app, host="127.0.0.1", port=port)
    try:
        img = np.random.default_rng(0).integers(0, 255, (16, 16, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()

        def post(path, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(body).encode())
            with urllib.request.urlopen(req, timeout=10) as r:
                return json.loads(r.read())

        out = post("/restore", {"image": b64, "upscale": 2,
                                "color_fix": "adain"})
        assert "image" in out
        rec = np.asarray(Image.open(io.BytesIO(base64.b64decode(out["image"]))))
        assert rec.shape == (16, 16, 3)

        cap = post("/caption", {"image": b64})
        assert "16, 16, 3" in cap["caption"]

        # UI page served
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
        assert "Restoration Run" in page
    finally:
        server.shutdown()


def test_web_demo_main_tiny_pipeline_http():
    """`python -m faithdiff_tpu.serving.web_demo --tiny`: real tiny
    pipeline behind the HTTP API, restored image comes back upscaled."""
    import threading
    import time

    from faithdiff_tpu.serving import web_demo

    port = _free_port()
    t = threading.Thread(
        target=web_demo.main,
        args=(["--tiny", "--host", "127.0.0.1", "--port", str(port)],),
        daemon=True)
    t.start()

    img = np.random.default_rng(1).integers(0, 255, (24, 20, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    body = json.dumps({
        "image": base64.b64encode(buf.getvalue()).decode(),
        "upscale": 2, "steps": 2, "seed": 1,
    }).encode()

    out = None
    deadline = time.time() + 240
    while time.time() < deadline:
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/restore", data=body)
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json.loads(r.read())
            break
        except (ConnectionError, urllib.error.URLError, OSError):
            time.sleep(2)
    assert out is not None and "image" in out, out
    rec = np.asarray(Image.open(io.BytesIO(base64.b64decode(out["image"]))))
    assert rec.shape == (48, 40, 3)        # 2x upscale, padding cropped
