"""Serving stack tests: registry, heartbeats/expiry, dispatch, streaming
end-to-end through real HTTP sockets, worker failover."""
import json
import time
import urllib.request

import pytest

from faithdiff_tpu.serving import controller as ctl
from faithdiff_tpu.serving import worker as wk


def _post(addr, path, payload):
    req = urllib.request.Request(
        addr + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture
def stack():
    cport = _free_port()
    controller = ctl.Controller(dispatch_method="shortest_queue")
    cserver = ctl.serve(controller, port=cport)
    caddr = f"http://127.0.0.1:{cport}"

    wport = _free_port()
    waddr = f"http://127.0.0.1:{wport}"

    def generate(params):
        for word in ["a", "tiny", "caption"]:
            yield word

    worker = wk.ModelWorker(caddr, waddr, ["faithdiff-captioner"], generate)
    wserver = wk.serve(worker, port=wport)
    yield controller, caddr, worker, waddr
    worker.stop()
    controller.stop()
    cserver.shutdown()
    wserver.shutdown()


def test_register_and_list_models(stack):
    controller, caddr, worker, waddr = stack
    out = json.loads(_post(caddr, "/list_models", {}))
    assert out["models"] == ["faithdiff-captioner"]


def test_dispatch_and_stream_end_to_end(stack):
    controller, caddr, worker, waddr = stack
    out = json.loads(_post(caddr, "/get_worker_address",
                           {"model": "faithdiff-captioner"}))
    assert out["address"] == waddr

    raw = _post(caddr, "/worker_generate_stream",
                {"model": "faithdiff-captioner"})
    chunks = [json.loads(c) for c in raw.split(b"\0") if c.strip()]
    assert [c["text"] for c in chunks] == ["a", "tiny", "caption"]
    assert all(c["error_code"] == 0 for c in chunks)


def test_heartbeat_updates_and_expiry(stack):
    controller, caddr, worker, waddr = stack
    assert controller.receive_heart_beat(waddr, 3)
    assert controller.workers[waddr].queue_length == 3
    # force expiry
    controller.workers[waddr].last_heart_beat = time.time() - 999
    dead = controller.remove_stale_workers()
    assert waddr in dead
    assert waddr not in controller.workers


def test_failover_to_next_worker(stack):
    controller, caddr, worker, waddr = stack
    # register a dead worker with shorter queue -> dispatcher picks it first,
    # then fails over to the live one
    dead_addr = "http://127.0.0.1:1"  # nothing listening
    controller.register_worker(dead_addr, True, {
        "model_names": ["faithdiff-captioner"], "speed": 1.0,
        "queue_length": 0})
    controller.workers[waddr].queue_length = 10

    raw = _post(caddr, "/worker_generate_stream",
                {"model": "faithdiff-captioner"})
    chunks = [json.loads(c) for c in raw.split(b"\0") if c.strip()]
    assert [c["text"] for c in chunks] == ["a", "tiny", "caption"]
    # the dead worker was removed on failure
    assert dead_addr not in controller.workers


def test_lottery_dispatch_weighted():
    controller = ctl.Controller(dispatch_method="lottery")
    controller.register_worker("w_fast", False, {
        "model_names": ["m"], "speed": 100.0, "queue_length": 0})
    controller.register_worker("w_slow", False, {
        "model_names": ["m"], "speed": 1.0, "queue_length": 0})
    import numpy as np

    rng = np.random.default_rng(0)
    picks = [controller.get_worker_address("m", rng) for _ in range(50)]
    assert picks.count("w_fast") > 40
    controller.stop()


def test_no_worker_for_unknown_model(stack):
    controller, caddr, worker, waddr = stack
    out = json.loads(_post(caddr, "/get_worker_address", {"model": "nope"}))
    assert out["address"] == ""


def test_distributed_single_host_noop():
    from faithdiff_tpu.parallel.distributed import (init_distributed,
                                                    local_batch_slice)

    assert init_distributed() == 0
    assert local_batch_slice(16) == slice(0, 16)


def test_chat_cli_parses(monkeypatch, tmp_path, capsys):
    """Chat loop drives the agent with accumulated history."""
    import numpy as np
    from PIL import Image

    from faithdiff_tpu.serving import chat

    img_path = tmp_path / "x.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_path)

    class StubAgent:
        temperature = 0.2
        max_new_tokens = 16
        calls = []

        def caption(self, img, question=""):
            StubAgent.calls.append(question)
            return f"echo: {question[-20:]}"

    monkeypatch.setattr(
        "faithdiff_tpu.captioner.agent.CaptionAgent.from_checkpoint",
        staticmethod(lambda d: StubAgent()))
    inputs = iter(["hello", "more"])
    monkeypatch.setattr("builtins.input",
                        lambda prompt="": next(inputs))
    import pytest as _pytest

    with _pytest.raises(StopIteration):
        chat.main(["--captioner_dir", "fake", "--image", str(img_path)])
    assert len(StubAgent.calls) == 2
    assert "hello" in StubAgent.calls[1]  # history carried into turn 2


def test_external_backend_worker_end_to_end():
    """Controller -> external worker -> stub 'sglang' backend, streamed back
    (the reference's sglang_worker path, `llava/serve/sglang_worker.py`)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from faithdiff_tpu.serving.external_worker import make_external_worker

    # stub external inference server: line-delimited cumulative JSON chunks
    class Backend(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            params = json.loads(self.rfile.read(n))
            assert params["model"] == "llava-ext"
            self.send_response(200)
            self.end_headers()
            acc = ""
            for w in ["ext", "ext backend", "ext backend caption"]:
                self.wfile.write(json.dumps({"text": w}).encode() + b"\n")
                self.wfile.flush()

    bport = _free_port()
    bserver = ThreadingHTTPServer(("127.0.0.1", bport), Backend)
    threading.Thread(target=bserver.serve_forever, daemon=True).start()

    cport = _free_port()
    controller = ctl.Controller(dispatch_method="shortest_queue")
    cserver = ctl.serve(controller, port=cport)
    caddr = f"http://127.0.0.1:{cport}"
    wport = _free_port()
    waddr = f"http://127.0.0.1:{wport}"
    worker = make_external_worker(
        caddr, waddr, ["llava-ext"],
        backend_url=f"http://127.0.0.1:{bport}/generate")
    wserver = wk.serve(worker, port=wport)
    try:
        raw = _post(caddr, "/worker_generate_stream",
                    {"model": "llava-ext", "prompt": "hi"})
        chunks = [json.loads(c) for c in raw.split(b"\0") if c.strip()]
        assert chunks[-1]["text"] == "ext backend caption"
        assert all(c["error_code"] == 0 for c in chunks)
    finally:
        worker.stop()
        controller.stop()
        cserver.shutdown()
        wserver.shutdown()
        bserver.shutdown()
