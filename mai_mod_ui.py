"""Dedicated MaiMod desktop/web app (reference: ``mai_mod_ui.py:1-634``).

Serves the MaiMod analysis page standalone (the combined UI also exposes it
at ``/mai-mod``): beatmap + model selection, teacher-forced surprisal
analysis in a worker process, SSE log streaming, and a categorized
suggestion table with ``osu://edit`` links.

    python mai_mod_ui.py [--port 8766] [--window]
"""

from __future__ import annotations

import sys
from http.server import ThreadingHTTPServer
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

from web_ui import Handler, serve  # shared job/SSE machinery


class MaiModHandler(Handler):
    """Same routes as the combined UI, but '/' is the MaiMod page."""

    def do_GET(self):
        if self.path == "/" or self.path.startswith("/?"):
            self._file(REPO_ROOT / "template" / "index_mai_mod.html", "text/html; charset=utf-8")
            return
        super().do_GET()


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    port = 8766
    if "--port" in argv:
        port = int(argv[argv.index("--port") + 1])
    url = f"http://127.0.0.1:{port}"
    if "--window" in argv:
        try:
            import webview

            server = ThreadingHTTPServer(("127.0.0.1", port), MaiModHandler)
            import threading

            threading.Thread(target=server.serve_forever, daemon=True).start()
            webview.create_window("MaiMod", url)
            webview.start()
            return
        except ImportError:
            print("pywebview not available; serving in browser mode")
    server = ThreadingHTTPServer(("127.0.0.1", port), MaiModHandler)
    print(f"MaiMod UI at {url}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
