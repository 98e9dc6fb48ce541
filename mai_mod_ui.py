"""MaiMod web UI (reference: ``mai_mod_ui.py`` — Flask + pywebview desktop
app). Serves the same stdlib-HTTP app as ``web_ui.py``; the page carries both
the generation and the MaiMod analysis forms (``/start_mai_mod``).

    python mai_mod_ui.py [--port 8766]
"""

from __future__ import annotations

import sys

from web_ui import main

if __name__ == "__main__":
    if "--port" not in sys.argv:
        sys.argv += ["--port", "8766"]
    main()
