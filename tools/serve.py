#!/usr/bin/env python
"""Minimal HTTP inference server over an exported StableHLO artifact.

Completes the serving path (tools/export_model.py): load the artifact in
a process with no model/training code, preprocess with the metadata's
normalize constants, run, return argmax label maps.

    python tools/serve.py --artifact model_artifacts/w48 --port 8901

    # client: raw uint8 RGB bytes (H*W*3) or a .npy array
    curl -s -X POST --data-binary @frame.npy \
        -H 'Content-Type: application/x-npy' \
        http://localhost:8901/segment -o labels.npy

Endpoints:
    GET  /healthz   -> {"status": "ok", ...metadata}
    POST /segment   -> .npy int32 [H, W] train-id label map
                       (body: .npy uint8/float32 [H, W, 3] RGB image;
                       resized server-side to the artifact's input size
                       with bicubic, labels returned at artifact size)

The server is intentionally stdlib-only (http.server + ThreadingHTTPServer)
— the point is the artifact contract, not a web framework.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class ArtifactRunner:
    """Deserialize once, serve concurrently (jax dispatch is thread-safe)."""

    def __init__(self, artifact: str):
        import jax

        with open(artifact + ".stablehlo", "rb") as f:
            self.exported = jax.export.deserialize(f.read())
        with open(artifact + ".json") as f:
            self.meta = json.load(f)
        # --weights sidecar artifacts take the variables as the first
        # call argument: load + device_put ONCE at server start.
        self.variables = None
        if self.meta.get("weights") == "sidecar":
            from contrastiveseg_tpu.utils.tree_io import load_tree_npz

            self.variables = jax.device_put(
                load_tree_npz(artifact + ".weights.npz"))
        shape = self.meta["input"]["shape"]
        self.batch = None if isinstance(shape[0], str) else int(shape[0])
        self.h, self.w = int(shape[1]), int(shape[2])
        nz = self.meta["normalize"]
        self.div = float(nz["div_value"])
        self.mean = np.asarray(nz["mean"], np.float32)
        self.std = np.asarray(nz["std"], np.float32)
        self._lock = threading.Lock()

    def preprocess(self, img: np.ndarray) -> np.ndarray:
        if img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(f"expected [H, W, 3] RGB, got {img.shape}")
        if img.shape[:2] != (self.h, self.w):
            from contrastiveseg_tpu.data.transforms import _pil_resize_img

            img = _pil_resize_img(
                np.clip(img, 0, 255).astype(np.uint8), (self.w, self.h))
        x = img.astype(np.float32) / self.div
        return ((x - self.mean) / self.std)[None]

    def segment(self, img: np.ndarray) -> np.ndarray:
        import jax

        x = self.preprocess(img)
        if self.batch is not None and self.batch != 1:
            x = np.repeat(x, self.batch, axis=0)
        with self._lock:  # single accelerator: serialize dispatch
            xj = jax.numpy.asarray(x)
            logits = np.asarray(
                self.exported.call(self.variables, xj)
                if self.variables is not None else self.exported.call(xj))
        return logits[0].argmax(-1).astype(np.int32)


def make_handler(runner: ArtifactRunner):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps(
                    {"status": "ok", **runner.meta}).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"{}", "application/json")

        def do_POST(self):
            if self.path != "/segment":
                self._send(404, b"{}", "application/json")
                return
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            try:
                img = np.load(io.BytesIO(raw), allow_pickle=False)
                labels = runner.segment(np.asarray(img))
                buf = io.BytesIO()
                np.save(buf, labels)
                self._send(200, buf.getvalue(), "application/x-npy")
            except Exception as e:  # client error surface
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")

    return Handler


def serve(artifact: str, port: int, started: threading.Event | None = None):
    from http.server import ThreadingHTTPServer

    runner = ArtifactRunner(artifact)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(runner))
    if started is not None:
        started.set()
    print(f"serving {artifact} on http://127.0.0.1:{port} "
          f"(input {runner.h}x{runner.w})")
    httpd.serve_forever()
    return httpd


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifact", required=True,
                    help="path prefix from tools/export_model.py --out")
    ap.add_argument("--port", type=int, default=8901)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    serve(args.artifact, args.port)


if __name__ == "__main__":
    main()
