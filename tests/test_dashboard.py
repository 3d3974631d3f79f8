"""Live dashboard channel (the visdom analog): live.html rendering,
latest_* image copies, and the optional HTTP server."""

import json
import os
import urllib.request
from types import SimpleNamespace

import numpy as np

from swapnet_tpu.utils.dashboard import (
    read_last_metrics,
    serve_directory,
    write_live_page,
)
from swapnet_tpu.utils.visualizer import Visualizer


def test_write_live_page(tmp_path):
    web = tmp_path / "web"
    os.makedirs(web)
    path = write_live_page(
        str(web), "exp", ["fakes", "targets"], epoch=3,
        last_metrics={"epoch": 3, "loss_G": 1.2345}, refresh_secs=7,
    )
    html = open(path).read()
    assert 'http-equiv="refresh" content="7"' in html
    assert "images/latest_fakes.png" in html
    assert "1.2345" in html
    assert "epoch 3" in html


def test_read_last_metrics(tmp_path):
    p = tmp_path / "metrics.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"iters": i, "loss_G": float(i)}) + "\n")
    last = read_last_metrics(str(p))
    assert last == {"iters": 4, "loss_G": 4.0}
    assert read_last_metrics(str(tmp_path / "missing.jsonl")) is None


def _opt(tmp_path, **kw):
    base = dict(
        name="exp", checkpoints_dir=str(tmp_path), is_train=True,
        no_html=False, display_winsize=64,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def test_visualizer_writes_live_page_and_latest_images(tmp_path):
    viz = Visualizer(_opt(tmp_path))
    viz.print_current_losses(1, 4, {"loss_G": 0.5}, 0.01, 0.001,
                             print_func=lambda *a: None)
    visuals = {"fakes": np.zeros((2, 8, 8, 3), np.uint8)}
    viz.display_current_results(visuals, epoch=1, save_result=True)

    web = tmp_path / "exp" / "web"
    assert (web / "live.html").exists()
    assert (web / "images" / "latest_fakes.png").exists()
    assert (web / "images" / "epoch001_fakes.png").exists()
    html = open(web / "live.html").read()
    assert "loss_G" in html  # last metrics row rendered


def test_dashboard_http_server(tmp_path):
    viz = Visualizer(_opt(tmp_path, serve_dashboard=True, display_port=0))
    assert viz._dashboard_server is not None, "port 0 binds an ephemeral port"
    port = viz._dashboard_server.server_port
    visuals = {"fakes": np.zeros((1, 8, 8, 3), np.uint8)}
    viz.display_current_results(visuals, epoch=1, save_result=True)
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/web/live.html", timeout=10
    ) as r:
        body = r.read().decode()
    assert "live" in body and "latest_fakes.png" in body
    viz._dashboard_server.shutdown()
