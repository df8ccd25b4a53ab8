"""Serving entry point: train a tiny run, start the HTTP service, score a
video over the socket."""

import argparse
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from fixtures import make_ffpp_tree, write_video


@pytest.fixture
def run_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    import main as main_mod
    from test_e2e import _write_e2e_config

    root = make_ffpp_tree(str(tmp_path / "ffpp"))
    cfg = _write_e2e_config(tmp_path, root)
    return main_mod.main(argparse.Namespace(cfg=cfg, debug=False, test=False)), tmp_path


def test_serve_scores_over_http(run_dir):
    project_dir, tmp_path = run_dir
    import serve

    scorer = serve.Scorer(project_dir, batch_size=2)
    server = ThreadingHTTPServer(("127.0.0.1", 0), serve.make_handler(scorer))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True

        vid = str(tmp_path / "probe.avi")
        write_video(vid, 60, fps=25.0, size=64, seed=42)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score_path",
            data=json.dumps({"path": vid}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.loads(r.read())
        assert 0.0 <= payload["p_fake"] <= 1.0

        # raw-bytes endpoint
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=open(vid, "rb").read()
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            payload2 = json.loads(r.read())
        assert 0.0 <= payload2["p_fake"] <= 1.0

        # error path: unknown endpoint and unreadable video
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=30)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score_path",
            data=json.dumps({"path": "/nonexistent.avi"}).encode(),
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


import urllib.error  # noqa: E402
