"""HTTP serving front-end for pose / face / hand detection.

New capability beyond the reference, which has no serving story at all —
its only "deployment" is re-instantiating the Chainer model inside each
demo process (``pose_detector.py:16-35``, ``demo.py:17-20``).  Here a
serving process loads an AOT ``jax.export`` bundle (no model code, no
tracing — see ``tpupose/serving.py``) or a live detector from npz
weights, and exposes detection over plain HTTP with stdlib-only
machinery (``http.server``), so it runs in any Python image that has
JAX + the bundle.

Endpoints
---------
- ``GET /healthz`` — readiness + bundle metadata (arch, mode, servable
  image sizes).
- ``POST /v1/detect`` — one image; body is an encoded image
  (PNG/JPEG, any ``Content-Type`` except ``application/octet-stream``)
  or raw uint8 HWC bytes with an ``X-Image-Shape: HxWx3`` header (the
  zero-decode path for camera producers).  Returns
  ``{"poses": [[[x, y, score] × 18] × N], "scores": [N]}``.
- ``POST /v1/detect_crops`` — crop-net bundles (facenet/handnet): raw
  uint8 NxHxWx3 bytes with ``X-Image-Shape`` and an optional
  ``X-Flips: 0,1,...`` header (the left-hand path).  Returns
  ``{"results": [[[x, y, conf] | null × C] × N]}``.

Throughput: the handler runs inside ``ThreadingHTTPServer``; each
request dispatches via the detector's async ``submit``/``submit_crops``
under a short lock and blocks on ``collect`` outside it, so concurrent
requests pipeline host decode/encode against device compute exactly
like the live camera loop (the mechanism behind the streaming
headline numbers — BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class ServingError(ValueError):
    """Client error (HTTP 400): bad payload, shape, or geometry."""


def _parse_shape(header: Optional[str], ndim: int):
    if not header:
        raise ServingError(
            "raw payloads need an X-Image-Shape header like 480x640x3")
    try:
        shape = tuple(int(t) for t in header.lower().split("x"))
    except ValueError:
        raise ServingError(f"bad X-Image-Shape {header!r}")
    if len(shape) != ndim or any(t <= 0 for t in shape) or shape[-1] != 3:
        raise ServingError(
            f"X-Image-Shape {header!r}: expected {ndim} positive "
            "x-separated dims ending in 3")
    return shape


def _decode_image(body: bytes, content_type: str, shape_header):
    """Encoded (cv2.imdecode) or raw-uint8 request body -> HWC image."""
    if content_type == "application/octet-stream":
        shape = _parse_shape(shape_header, 3)
        if len(body) != int(np.prod(shape)):
            raise ServingError(
                f"raw body is {len(body)} bytes, X-Image-Shape {shape} "
                f"needs {int(np.prod(shape))}")
        return np.frombuffer(body, np.uint8).reshape(shape)
    import cv2

    img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ServingError("could not decode image body")
    return img


class PoseService:
    """Wraps a pose detector (live or bundle) for the HTTP handler.

    ``submit`` is serialized by a lock (dispatch order = request order);
    ``collect`` blocks outside it so in-flight device work overlaps the
    next request's decode + dispatch."""

    kind = "pose"

    def __init__(self, detector):
        self.detector = detector
        self._submit_lock = threading.Lock()

    def info(self) -> dict:
        d = self.detector
        return {
            "kind": self.kind,
            "arch": getattr(d, "arch", "posenet"),
            "mode": getattr(d, "mode",
                            "precise" if getattr(d, "precise", False)
                            else "fast"),
            "image_sizes": [list(s) for s in
                            getattr(d, "image_sizes", [])] or None,
        }

    def handle(self, path: str, img: np.ndarray, headers) -> dict:
        if path != "/v1/detect":
            raise ServingError(f"pose service has no endpoint {path}")
        with self._submit_lock:
            try:
                pending = self.detector.submit(img)
            except ValueError as e:           # unknown bundle geometry
                raise ServingError(str(e))
        poses, scores = self.detector.collect(pending)
        return {"poses": np.asarray(poses, np.float64).tolist(),
                "scores": np.asarray(scores, np.float64).tolist()}


class CropService(PoseService):
    """Face/hand crop-net serving (``/v1/detect_crops``)."""

    kind = "crop"

    def info(self) -> dict:
        d = self.detector
        return {
            "kind": self.kind,
            "arch": d.arch,
            "crop_sizes": [list(s) for s in
                           getattr(d, "crop_sizes", [])] or None,
        }

    def handle(self, path: str, body: bytes, headers) -> dict:
        if path != "/v1/detect_crops":
            raise ServingError(f"crop service has no endpoint {path}")
        shape = _parse_shape(headers.get("X-Image-Shape"), 4)
        if len(body) != int(np.prod(shape)):
            raise ServingError(
                f"raw body is {len(body)} bytes, X-Image-Shape needs "
                f"{int(np.prod(shape))}")
        crops = np.frombuffer(body, np.uint8).reshape(shape)
        flips_hdr = headers.get("X-Flips")
        flips = None
        if flips_hdr:
            flips = [t.strip() not in ("0", "", "false")
                     for t in flips_hdr.split(",")]
            if len(flips) != shape[0]:
                raise ServingError(
                    f"X-Flips has {len(flips)} entries for "
                    f"{shape[0]} crops")
        with self._submit_lock:
            try:
                pending = self.detector.submit_crops(list(crops), flips)
            except ValueError as e:
                raise ServingError(str(e))
        return {"results": self.detector.collect_crops(pending)}


class _Handler(BaseHTTPRequestHandler):
    # the service is attached to the server object by make_server()
    protocol_version = "HTTP/1.1"

    def _reply(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):      # quiet by default
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def do_GET(self):
        if self.path == "/healthz":
            info = self.server.service.info()
            info["status"] = "ok"
            self._reply(200, info)
        else:
            self._reply(404, {"error": f"no endpoint {self.path}"})

    def do_POST(self):
        service = self.server.service
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            if isinstance(service, CropService):
                payload = service.handle(self.path, body, self.headers)
            else:
                img = _decode_image(
                    body, self.headers.get("Content-Type", ""),
                    self.headers.get("X-Image-Shape"))
                payload = service.handle(self.path, img, self.headers)
            self._reply(200, payload)
        except ServingError as e:
            self._reply(400, {"error": str(e)})
        except Exception as e:              # noqa: BLE001 — serving loop
            self._reply(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(detector, host: str = "127.0.0.1", port: int = 0,
                verbose: bool = False) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server for a detector.

    ``detector`` may be a live ``PoseDetector``, a ``ServingPoseDetector``
    bundle, or a crop detector / ``ServingCropDetector`` (selected by the
    presence of ``submit_crops``).  ``port=0`` binds an ephemeral port
    (``server.server_address[1]`` after return) — used by tests."""
    service = (CropService(detector) if hasattr(detector, "submit_crops")
               else PoseService(detector))
    server = ThreadingHTTPServer((host, port), _Handler)
    server.service = service
    server.verbose = verbose
    return server


# ---------------------------------------------------------------------------
# client helper


def detect_over_http(url: str, img: np.ndarray, raw: bool = True,
                     timeout: float = 60.0):
    """POST one image to a serve.py endpoint; returns (poses, scores).

    ``raw=True`` sends uint8 bytes with X-Image-Shape (no PNG encode);
    ``raw=False`` PNG-encodes (what a non-numpy client would send)."""
    from urllib.request import Request, urlopen

    img = np.ascontiguousarray(img, np.uint8)
    if raw:
        body = img.tobytes()
        headers = {"Content-Type": "application/octet-stream",
                   "X-Image-Shape": "x".join(str(t) for t in img.shape)}
    else:
        import cv2

        ok, buf = cv2.imencode(".png", img)
        if not ok:
            raise ValueError("PNG encode failed")
        body = buf.tobytes()
        headers = {"Content-Type": "image/png"}
    req = Request(url.rstrip("/") + "/v1/detect", data=body,
                  headers=headers, method="POST")
    with urlopen(req, timeout=timeout) as resp:
        out = json.loads(resp.read())
    return (np.asarray(out["poses"], np.float32),
            np.asarray(out["scores"], np.float32))


def detect_crops_over_http(url: str, crops, flips=None,
                           timeout: float = 60.0):
    """POST a crop batch (same HxW) to a crop-net server; keypoint lists."""
    from urllib.request import Request, urlopen

    arr = np.ascontiguousarray(np.stack(crops), np.uint8)
    headers = {"Content-Type": "application/octet-stream",
               "X-Image-Shape": "x".join(str(t) for t in arr.shape)}
    if flips is not None:
        headers["X-Flips"] = ",".join("1" if f else "0" for f in flips)
    req = Request(url.rstrip("/") + "/v1/detect_crops", data=arr.tobytes(),
                  headers=headers, method="POST")
    with urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())["results"]


# ---------------------------------------------------------------------------
# CLI


def _load_detector(args):
    import os

    if os.path.isdir(args.model):        # AOT bundle directory
        meta = json.load(open(os.path.join(args.model, "meta.json")))
        if meta.get("mode") == "crop":
            from tpupose.serving import ServingCropDetector

            return ServingCropDetector(args.model)
        from tpupose.serving import ServingPoseDetector

        return ServingPoseDetector(args.model)
    # npz weights -> live detector (traces + compiles in-process)
    if args.arch in ("facenet", "handnet"):
        from tpupose.detectors.crop_keypoints import CropKeypointDetector

        return CropKeypointDetector(args.arch, weights_file=args.model)
    from tpupose.detectors import PoseDetector

    return PoseDetector("posenet", weights_file=args.model,
                        precise=args.precise)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Serve pose/face/hand detection over HTTP from an "
                    "AOT bundle directory or an npz weights file.")
    p.add_argument("model",
                   help="bundle directory (apps.export_serving output) "
                        "or .npz weights")
    p.add_argument("--arch", default="posenet",
                   choices=("posenet", "facenet", "handnet"),
                   help="architecture when serving from npz weights "
                        "(bundles are self-describing)")
    p.add_argument("--precise", action="store_true",
                   help="multi-scale pyramid when serving from npz weights")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8731)
    p.add_argument("--verbose", action="store_true",
                   help="log each request")
    args = p.parse_args(argv)

    server = make_server(_load_detector(args), args.host, args.port,
                         verbose=args.verbose)
    host, port = server.server_address[:2]
    print(f"serving {args.model} on http://{host}:{port} "
          f"(GET /healthz, POST /v1/detect[_crops])", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
