"""Batch scoring service.

Production-serving entry the reference lacks: loads a training run's weights
once, keeps the jitted predict warm, and scores videos over HTTP.

  python serve.py logs/deepfake/<run> --port 8123

  POST /score            body: raw video bytes        -> {"p_fake": ...}
  POST /score_path       body: {"path": "/x.mp4"}     -> {"p_fake": ...}
  GET  /healthz                                       -> {"ok": true}

Videos are expected face-cropped (the offline pipeline's output); for raw
footage run pipeline.extract_landmarks/get_cropped_video first.
"""

from __future__ import annotations

import argparse
import json
import logging
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from os import path

import numpy as np


class Scorer:
    """Owns the model + jitted predict; thread-safe single-flight scoring."""

    def __init__(self, run_dir: str, cfg_name: str = "setting",
                 weight_mode: str = "best", batch_size: int = 8):
        import jax
        import yaml

        from dfd_clip_tpu.config import CN
        from dfd_clip_tpu.models import Detector
        from inference import load_model_params
        from main import load_pretrained_encoder

        with open(path.join(run_dir, f"{cfg_name}.yaml")) as f:
            preset = CN(yaml.safe_load(f), new_allowed=True)
        model_cfg = Detector.get_default_config().merge_from_other_cfg(preset.model)
        self.num_frames = preset.data.num_frames
        self.clip_duration = preset.data.clip_duration

        self.model = Detector(model_cfg, self.num_frames)
        wrapper = CN(new_allowed=True)
        wrapper.model = model_cfg
        load_pretrained_encoder(self.model, wrapper)
        self.params = load_model_params(self.model, run_dir, weight_mode)
        self.batch_size = batch_size
        from dfd_clip_tpu.scoring import resolve_deepfake_task

        task = resolve_deepfake_task(preset)
        self._predict = jax.jit(
            lambda p, x, m: self.model.predict(p, x, m)[0][task]
        )
        self._lock = threading.Lock()

    def score_video(self, video_path: str) -> float:
        """All clip_duration windows -> mean softmax P(fake) (shared loop:
        dfd_clip_tpu/scoring.py; the lock serializes device use across
        HTTP handler threads)."""
        from dfd_clip_tpu import scoring

        return scoring.score_video(
            video_path, self._predict, self.params,
            num_frames=self.num_frames, clip_duration=self.clip_duration,
            batch_size=self.batch_size, lock=self._lock,
        )


def make_handler(scorer: Scorer):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            else:
                self._reply(404, {"error": "unknown endpoint"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                if self.path == "/score":
                    with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
                        f.write(body)
                        f.flush()
                        p = scorer.score_video(f.name)
                elif self.path == "/score_path":
                    p = scorer.score_video(json.loads(body)["path"])
                else:
                    self._reply(404, {"error": "unknown endpoint"})
                    return
                self._reply(200, {"p_fake": p})
            except Exception as e:  # surface scoring errors to the client
                logging.exception("scoring failed")
                self._reply(400, {"error": str(e)})

        def log_message(self, fmt, *args):
            logging.info("%s " + fmt, self.address_string(), *args)

    return Handler


def main():
    parser = argparse.ArgumentParser(description="Deepfake scoring service (TPU)")
    parser.add_argument("run_dir", type=str)
    parser.add_argument("--port", type=int, default=8123)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--weight_mode", default="best")
    parser.add_argument("--cfg_name", default="setting")
    parser.add_argument("--batch_size", type=int, default=8)
    args = parser.parse_args()

    logging.basicConfig(level="INFO")
    scorer = Scorer(args.run_dir, args.cfg_name, args.weight_mode, args.batch_size)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(scorer))
    logging.info("serving on %s:%d", args.host, args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
