"""Web UI for beatmap generation (reference: ``web-ui.py:147-1034``).

A dependency-free HTTP app (stdlib ``http.server`` — Flask is not part of
this image) exposing the reference's workflow: a generation form, a
``/start_inference`` endpoint that runs ``inference.generate`` in a spawned
worker process with live log streaming over ``/stream_output``
(server-sent events), ``/cancel_inference``, and ``/validate_paths``.

    python web_ui.py [--port 8765]
"""

from __future__ import annotations

import json
import multiprocessing
import queue
import sys
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

PAGE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>Mapperatorinator TPU</title>
<style>
 body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 46rem; }
 label { display: block; margin-top: .8rem; font-weight: 600; }
 input, select { width: 100%; padding: .4rem; box-sizing: border-box; }
 button { margin-top: 1rem; padding: .6rem 1.4rem; font-size: 1rem; }
 #log { white-space: pre-wrap; background: #111; color: #9e9; padding: 1rem;
        margin-top: 1rem; height: 20rem; overflow-y: auto; font-family: monospace; }
</style>
</head>
<body>
<h1>Mapperatorinator <small>tpu</small></h1>
<form id="form">
 <label>Audio path <input name="audio_path" required></label>
 <label>Output path <input name="output_path"></label>
 <label>Model path <input name="model_path" required></label>
 <label>Reference beatmap (optional) <input name="beatmap_path"></label>
 <label>Gamemode <select name="gamemode">
   <option value="">auto</option><option value="0">standard</option>
   <option value="1">taiko</option><option value="2">catch</option>
   <option value="3">mania</option></select></label>
 <label>Difficulty <input name="difficulty" type="number" step="0.1"></label>
 <label>Seed <input name="seed" type="number"></label>
 <label>Extra overrides (space-separated key=value) <input name="extra_overrides"></label>
 <button type="submit">Generate</button>
 <button type="button" id="cancel">Cancel</button>
</form>
<h2>MaiMod <small>AI modding</small></h2>
<form id="modform">
 <label>Beatmap path (.osu) <input name="beatmap_path" required></label>
 <label>Audio path <input name="audio_path"></label>
 <label>Model path <input name="model_path" required></label>
 <label>Extra overrides <input name="extra_overrides"></label>
 <button type="submit">Analyze</button>
</form>
<div id="log"></div>
<script>
const log = document.getElementById('log');
let source = null;
document.getElementById('form').addEventListener('submit', async (e) => {
  e.preventDefault();
  log.textContent = '';
  const data = Object.fromEntries(new FormData(e.target).entries());
  const res = await fetch('/start_inference', {
    method: 'POST', headers: {'Content-Type': 'application/json'},
    body: JSON.stringify(data)});
  const out = await res.json();
  if (out.error) { log.textContent = 'error: ' + out.error; return; }
  source = new EventSource('/stream_output');
  source.onmessage = (ev) => {
    log.textContent += ev.data + '\\n';
    log.scrollTop = log.scrollHeight;
    if (ev.data.startsWith('[done]') || ev.data.startsWith('[error]')) source.close();
  };
});
document.getElementById('cancel').addEventListener('click', () =>
  fetch('/cancel_inference', {method: 'POST'}));
document.getElementById('modform').addEventListener('submit', async (e) => {
  e.preventDefault();
  log.textContent = '';
  const data = Object.fromEntries(new FormData(e.target).entries());
  const res = await fetch('/start_mai_mod', {
    method: 'POST', headers: {'Content-Type': 'application/json'},
    body: JSON.stringify(data)});
  const out = await res.json();
  if (out.error) { log.textContent = 'error: ' + out.error; return; }
  source = new EventSource('/stream_output');
  source.onmessage = (ev) => {
    log.textContent += ev.data + '\\n';
    log.scrollTop = log.scrollHeight;
    if (ev.data.startsWith('[done]') || ev.data.startsWith('[error]')) source.close();
  };
});
</script>
</body>
</html>
"""


def _mai_mod_worker(params: dict, log_queue):
    """MaiMod analysis worker process (reference: mai_mod_ui.py)."""
    import io

    class QueueWriter(io.TextIOBase):
        def write(self, s):
            s = s.strip()
            if s:
                log_queue.put(s)
            return len(s)

    sys.stdout = QueueWriter()
    sys.stderr = QueueWriter()
    try:
        from mai_mod import main as mai_mod_main

        extra = params.pop("extra_overrides", "") or ""
        overrides = []
        for key, value in params.items():
            if value in (None, ""):
                continue
            # model_path belongs to the nested inference config
            overrides.append(f"inference.{key}={value}" if key == "model_path" else f"{key}={value}")
        overrides += extra.split()
        mai_mod_main(overrides)
        log_queue.put("[done] analysis complete")
    except Exception as e:
        log_queue.put(f"[error] {e}")


def _worker(params: dict, log_queue):
    """Generation worker process (spawned; reference: web-ui.py:535-650)."""
    import io
    import warnings

    warnings.filterwarnings("ignore")

    class QueueWriter(io.TextIOBase):
        def write(self, s):
            s = s.strip()
            if s:
                log_queue.put(s)
            return len(s)

    sys.stdout = QueueWriter()
    sys.stderr = QueueWriter()
    try:
        from inference import main as inference_main

        extra = params.pop("extra_overrides", "") or ""
        overrides = [f"{k}={v}" for k, v in params.items() if v not in (None, "")]
        overrides += extra.split()
        result, result_path = inference_main(overrides)
        log_queue.put(f"[done] {result_path}")
    except Exception as e:
        log_queue.put(f"[error] {e}")


class AppState:
    def __init__(self):
        self.process = None
        self.log_queue = None
        self.lock = threading.Lock()


STATE = AppState()


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):
        pass

    def _json(self, payload: dict, status: int = 200) -> None:
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        path = urllib.parse.urlparse(self.path).path
        if path == "/":
            body = PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif path == "/stream_output":
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            q = STATE.log_queue
            if q is None:
                self.wfile.write(b"data: [error] no generation running\n\n")
                return
            while True:
                try:
                    line = q.get(timeout=60)
                except queue.Empty:
                    break
                try:
                    self.wfile.write(f"data: {line}\n\n".encode())
                    self.wfile.flush()
                except BrokenPipeError:
                    break
                if line.startswith("[done]") or line.startswith("[error]"):
                    break
        else:
            self._json({"error": "not found"}, 404)

    def do_POST(self):
        path = urllib.parse.urlparse(self.path).path
        length = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(length) or b"{}")

        if path in ("/start_inference", "/start_mai_mod"):
            target = _worker if path == "/start_inference" else _mai_mod_worker
            with STATE.lock:
                if STATE.process is not None and STATE.process.is_alive():
                    self._json({"error": "generation already running"}, 409)
                    return
                ctx = multiprocessing.get_context("spawn")
                STATE.log_queue = ctx.Queue()
                STATE.process = ctx.Process(target=target, args=(payload, STATE.log_queue), daemon=True)
                STATE.process.start()
            self._json({"status": "started"})
        elif path == "/cancel_inference":
            with STATE.lock:
                if STATE.process is not None and STATE.process.is_alive():
                    STATE.process.terminate()
                    if STATE.log_queue is not None:
                        STATE.log_queue.put("[error] cancelled")
                    self._json({"status": "cancelled"})
                else:
                    self._json({"status": "not running"})
        elif path == "/validate_paths":
            results = {}
            for key in ("audio_path", "beatmap_path", "model_path", "output_path"):
                value = payload.get(key)
                if value:
                    results[key] = Path(value).exists()
            self._json(results)
        else:
            self._json({"error": "not found"}, 404)


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    port = 8765
    if "--port" in argv:
        port = int(argv[argv.index("--port") + 1])
    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    print(f"Mapperatorinator web UI at http://127.0.0.1:{port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
