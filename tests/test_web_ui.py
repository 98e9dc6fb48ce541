"""Web UI route tests (no model load — generation itself is covered by the
inference CLI e2e; here we exercise the HTTP surface)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest


@pytest.fixture(scope="module")
def server():
    import web_ui

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), web_ui.Handler)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}, method="POST"
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_index(server):
    with urllib.request.urlopen(server + "/") as resp:
        body = resp.read().decode()
    assert resp.status == 200
    assert "start_inference" in body and "stream_output" in body


def test_validate_paths(server, tmp_path):
    exists = tmp_path / "song.wav"
    exists.write_bytes(b"")
    status, out = _post(server + "/validate_paths", {"audio_path": str(exists), "model_path": "/nope"})
    assert status == 200
    assert out == {"audio_path": True, "model_path": False}


def test_cancel_when_idle(server):
    status, out = _post(server + "/cancel_inference", {})
    assert status == 200
    assert out == {"status": "not running"}


def test_unknown_route(server):
    status, out = _post(server + "/nope", {})
    assert status == 404
