"""Reference web-UI surface-parity checklist (VERDICT r3 item 9).

Enumerates the REFERENCE's form controls (``/root/reference/template/
index.html``) and Flask routes (``/root/reference/web-ui.py``) at test time
and asserts each has a live equivalent here — so a control added to the
reference without a port shows up as a named failure, not silence.
"""

import re
from html.parser import HTMLParser
from pathlib import Path

import pytest

REF_TEMPLATE = Path("/root/reference/template/index.html")
REF_WEBUI = Path("/root/reference/web-ui.py")
OUR_TEMPLATE = Path("/root/repo/template/index.html")
OUR_WEBUI = Path("/root/repo/web_ui.py")

# reference control id -> our id, where the two UIs name the same thing
# differently
EQUIVALENT_IDS = {
    "inferenceForm": "inference-form",
    "model": "model-select",
    "language-selector": "lang-select",
    "progress_output": "log",
    "progressCards": "progress",
    "in-context-options-box": "in-context-options",
}

# reference ids with no control semantics to port, each with the reason
EXCUSED_IDS = {
    # CUDA-specific info text: bf16 support is unconditional on TPU (the
    # /check_bf16_support endpoint still exists and answers supported=true)
    "bf16-gpu-info": "CUDA capability hint; TPU bf16 is unconditional",
    "bf16-option": "wrapper div for the CUDA hint",
    # pure layout wrappers around controls that exist here under the same
    # name; visibility grouping is driven per-gamemode by app.js
    "group-circle_size": "layout wrapper; control circle_size exists",
    "group-hold_note_ratio": "layout wrapper; control hold_note_ratio exists",
    "group-keycount": "layout wrapper; control keycount exists",
    "group-scroll_speed_ratio": "layout wrapper; control scroll_speed_ratio exists",
    "group-year": "layout wrapper; control year exists",
    "option-item-hitsounded": "layout wrapper; control hitsounded exists",
    "add-to-beatmap-option": "layout wrapper; control add_to_beatmap exists",
    "overwrite-reference-beatmap-option": "layout wrapper; control overwrite_reference_beatmap exists",
    # Jinja-templated per-context checkbox ids; ours are the static
    # in_context_options checkboxes inside #in-context-options
    "context-{{ option[0].lower() }}": "templated id; in_context_options checkboxes exist",
}

# reference route -> how it is handled here (path string that must appear in
# our handler, or a note)
ROUTE_EQUIVALENTS = {
    "/": "/",
    "/check_bf16_support": "/check_bf16_support",
    "/start_inference": "/start_inference",
    "/stream_output": "/stream_output",
    "/cancel_inference": "/cancel_inference",
    "/open_folder": "/open_folder",
    "/open_log_file": "/open_log_file",
    "/save_config": "/save_config",
    "/validate_paths": "/validate_paths",
}


class IdScanner(HTMLParser):
    def __init__(self):
        super().__init__()
        self.ids = set()
        self.control_ids = set()

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if d.get("id"):
            self.ids.add(d["id"])
            if tag in ("input", "select", "textarea", "button", "form"):
                self.control_ids.add(d["id"])


def _scan(path: Path) -> IdScanner:
    scanner = IdScanner()
    scanner.feed(path.read_text(encoding="utf-8"))
    return scanner


def test_every_reference_control_has_an_equivalent():
    ref = _scan(REF_TEMPLATE)
    ours = _scan(OUR_TEMPLATE)
    missing = []
    for rid in sorted(ref.ids):
        if rid in EXCUSED_IDS:
            continue
        target = EQUIVALENT_IDS.get(rid, rid)
        if target not in ours.ids:
            missing.append(rid)
    assert not missing, (
        f"reference controls without an equivalent here: {missing} "
        f"(add the control, an EQUIVALENT_IDS mapping, or an EXCUSED_IDS reason)")


def test_no_stale_checklist_entries():
    """Every mapping/excusal must still exist in the reference — keeps the
    checklist honest when the reference template changes."""
    ref = _scan(REF_TEMPLATE)
    stale = [rid for rid in list(EQUIVALENT_IDS) + list(EXCUSED_IDS) if rid not in ref.ids]
    assert not stale, f"checklist entries no longer in the reference: {stale}"


def test_every_reference_route_has_an_equivalent():
    ref_routes = set(re.findall(r"@app\.route\('([^']+)'", REF_WEBUI.read_text(encoding="utf-8")))
    assert ref_routes, "failed to parse reference routes"
    unmapped = ref_routes - set(ROUTE_EQUIVALENTS)
    assert not unmapped, f"reference routes missing from the checklist: {unmapped}"

    ours = OUR_WEBUI.read_text(encoding="utf-8")
    missing = [r for r, target in ROUTE_EQUIVALENTS.items() if f'"{target}"' not in ours]
    assert not missing, f"routes without a handler here: {missing}"


def test_job_lifecycle_behaviors_present():
    """The reference's job-lifecycle semantics, greppable in the handler:
    per-job log files, kill-escalating cancellation, SSE termination
    sentinel, finished-job reaping."""
    ours = OUR_WEBUI.read_text(encoding="utf-8")
    assert "log_path" in ours                 # per-job log file (web-ui.py:818)
    assert "p.kill()" in ours                 # cancel force-kill escalation (web-ui.py:763-770)
    assert "__DONE__" in ours                 # SSE stream termination
    assert "_reap_job" in ours                # process/queue cleanup


def test_open_log_file_containment(tmp_path):
    """Driven check of the /open_log_file security boundary
    (reference: web-ui.py:826-835)."""
    import json
    import threading
    import urllib.parse
    import urllib.request
    from http.server import ThreadingHTTPServer

    import web_ui

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), web_ui.Handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, fields):
        data = urllib.parse.urlencode(fields).encode()
        req = urllib.request.Request(base + path, data=data, method="POST")
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        outside = tmp_path / "evil.log"
        outside.write_text("x")
        status, out = post("/open_log_file", {"path": str(outside)})
        assert status == 403 and out["status"] == "error"

        status, out = post("/open_log_file", {"path": ""})
        assert status == 400

        missing = web_ui.LOG_DIR / "nope-does-not-exist.log"
        status, out = post("/open_log_file", {"path": str(missing)})
        assert status == 404
    finally:
        httpd.shutdown()


def test_cli_wizard_covers_every_reference_option():
    """cli_inference.sh parity: every config key the reference wizard can
    emit (add_arg/add_bool_arg calls, cli_inference.sh:391-426) must be
    emittable by our wizard."""
    ref = Path("/root/reference/cli_inference.sh").read_text(encoding="utf-8")
    keys = set(re.findall(r'add_(?:bool_)?arg "([a-z_]+)"', ref))
    assert keys, "failed to parse reference wizard keys"
    ours = Path("/root/repo/cli_inference.sh").read_text(encoding="utf-8")
    missing = sorted(k for k in keys if k not in ours)
    assert not missing, f"wizard options missing from cli_inference.sh: {missing}"
