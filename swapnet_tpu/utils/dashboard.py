"""Live training dashboard — the visdom-channel analog (reference
util/visualizer.py:103-209).

The reference streams image grids + loss line plots to a visdom server it
auto-spawns (visualizer.py:96-101).  The TPU-native substitution has no
external server dependency:

  * ``write_live_page`` renders web/live.html — an auto-refreshing page
    showing the CURRENT batch visuals, the loss curves SVG, and the last
    logged metrics line.  Any browser pointed at it follows training live.
  * ``serve_directory`` optionally serves the run directory over HTTP from
    a daemon thread (stdlib http.server) when --serve_dashboard is given;
    --display_port keeps its reference meaning as the port.
"""

from __future__ import annotations

import html as _html
import json
import os
import threading
from typing import Dict, Optional


def write_live_page(
    web_dir: str,
    name: str,
    visual_labels,
    epoch: int,
    last_metrics: Optional[Dict] = None,
    refresh_secs: int = 5,
) -> str:
    """Render web/live.html pointing at the latest_{label}.png images."""
    rows = []
    if last_metrics:
        cells = "".join(
            f"<td>{_html.escape(str(k))}</td><td>{v:.4f}</td>"
            if isinstance(v, float) else
            f"<td>{_html.escape(str(k))}</td><td>{_html.escape(str(v))}</td>"
            for k, v in last_metrics.items()
        )
        rows.append(f"<table border='1' style='border-collapse:collapse'><tr>{cells}</tr></table>")
    imgs = "".join(
        f"<div style='display:inline-block;margin:4px;text-align:center'>"
        f"<img src='images/latest_{_html.escape(label)}.png' width='256'/><br/>"
        f"{_html.escape(label)}</div>"
        for label in visual_labels
    )
    page = f"""<!DOCTYPE html>
<html><head><meta http-equiv="refresh" content="{int(refresh_secs)}">
<title>{_html.escape(name)} — live</title></head>
<body style="font-family:sans-serif">
<h2>{_html.escape(name)} — live (epoch {int(epoch)})</h2>
{''.join(rows)}
<p><object type="image/svg+xml" data="../loss_plot.svg" width="720" height="320"></object></p>
<div>{imgs}</div>
<p style="color:#888">auto-refreshes every {int(refresh_secs)}s</p>
</body></html>
"""
    path = os.path.join(web_dir, "live.html")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(page)
    os.replace(tmp, path)  # atomic: a refreshing browser never sees a torn page
    return path


def serve_directory(directory: str, port: int):
    """Serve ``directory`` on localhost:port from a daemon thread.

    Returns the server (with .server_port) or None when the port is taken
    — a warning, not an error, mirroring the reference's tolerance of a
    missing visdom server.
    """
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    class _Quiet(SimpleHTTPRequestHandler):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, directory=directory, **kwargs)

        def log_message(self, *args):  # keep the training console clean
            pass

    try:
        server = ThreadingHTTPServer(("127.0.0.1", port), _Quiet)
    except OSError as e:
        print(f"dashboard: could not bind port {port} ({e}); "
              "live page still written to web/live.html")
        return None
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    print(f"dashboard: serving at http://127.0.0.1:{server.server_port}/web/live.html")
    return server


def read_last_metrics(metrics_path: str) -> Optional[Dict]:
    """Last line of metrics.jsonl (cheap tail read)."""
    try:
        with open(metrics_path, "rb") as f:
            f.seek(0, os.SEEK_END)
            size = f.tell()
            f.seek(max(0, size - 4096))
            lines = f.read().decode(errors="replace").strip().splitlines()
        return json.loads(lines[-1]) if lines else None
    except (OSError, json.JSONDecodeError, IndexError):
        return None
