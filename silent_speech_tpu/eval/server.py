"""HTTP serving daemon over exported bundles (stdlib-only).

Serves the AOT StableHLO bundles (``eval/export.py``) behind a small JSON
API — the deployment tier above ``ServingBundle``: one process loads the
bundles once and answers requests from any client, no jax knowledge
required on the caller's side. Threaded: the heavy call runs under jax,
which releases the GIL during device execution.

Endpoints (JSON in/out; arrays as nested lists):

- ``GET  /healthz``             → {"ok": true, "kinds": [...]}
- ``POST /v1/recognize``        {"emg": (T,112), "raw_emg": (T*8,8)}
                                → {"log_probs": (T,38), "text": "..."}
- ``POST /v1/transduce``        {"emg": ..., "raw_emg": ...,
                                 "session_ids": (T,)}
                                → {"mel": (T,80)[, "audio": (T*hop,)]}
  (``audio`` appears when a vocoder bundle is attached; requires the
  transduction bundle to carry mel denormalization stats — the export
  CLI embeds them when ``--normalizers_file`` exists)

Run::

    python -m silent_speech_tpu.eval.server --port 8008 \
        --recognition_bundle rec_serving/ \
        --transduction_bundle trans_serving/ [--vocoder_bundle voc/]
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from .export import ServingBundle


class ServingServer:
    """Own the bundles + the HTTP server; ``start()`` returns once bound
    (serving happens on a daemon thread), ``port`` is the bound port."""

    def __init__(self, recognition: Optional[ServingBundle] = None,
                 transduction: Optional[ServingBundle] = None,
                 vocoder: Optional[ServingBundle] = None,
                 host: str = "127.0.0.1", port: int = 0):
        self.bundles = {}
        if recognition is not None:
            assert recognition.kind == "recognition"
            self.bundles["recognition"] = recognition
        if transduction is not None:
            assert transduction.kind == "transduction"
            self.bundles["transduction"] = transduction
        if vocoder is not None:
            assert vocoder.kind == "vocoder"
            self.bundles["vocoder"] = vocoder
        assert self.bundles, "attach at least one bundle"

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet by default
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, {"ok": True,
                                      "kinds": sorted(server.bundles)})
                else:
                    self._reply(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    if self.path == "/v1/recognize":
                        self._reply(200, server.recognize(req))
                    elif self.path == "/v1/transduce":
                        self._reply(200, server.transduce(req))
                    else:
                        self._reply(404, {"error": f"no route {self.path}"})
                except (KeyError, ValueError, AssertionError) as e:
                    self._reply(400, {"error": str(e)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_port
        self._thread: Optional[threading.Thread] = None

    # ---------------- request handlers (plain python, testable) --------

    @staticmethod
    def _arrays(req: dict):
        emg = np.asarray(req["emg"], np.float32)
        raw = np.asarray(req["raw_emg"], np.float32)
        if emg.ndim != 2 or raw.ndim != 2 or raw.shape[0] != 8 * emg.shape[0]:
            raise ValueError(
                f"expected emg (T,F) and raw_emg (8T,C), got {emg.shape} "
                f"and {raw.shape}")
        return emg, raw

    def recognize(self, req: dict) -> dict:
        bundle = self.bundles.get("recognition")
        assert bundle is not None, "no recognition bundle attached"
        emg, raw = self._arrays(req)
        lp = bundle.predict(emg, raw)
        return {"log_probs": lp.tolist(), "text": bundle.decode_greedy(lp)}

    def transduce(self, req: dict) -> dict:
        bundle = self.bundles.get("transduction")
        assert bundle is not None, "no transduction bundle attached"
        emg, raw = self._arrays(req)
        sess = np.asarray(req["session_ids"], np.int64)
        mel = bundle.predict(emg, raw, sess)
        out = {"mel": mel.tolist()}
        voc = self.bundles.get("vocoder")
        if voc is not None:
            if not bundle.has_normalizer:
                raise ValueError(
                    "vocoding needs mel denormalization stats: re-export "
                    "the transduction bundle with audio_normalizer (the "
                    "CLI embeds them when --normalizers_file exists)")
            out["audio"] = voc.vocode(bundle.denormalize(mel)).tolist()
        return out

    # ---------------- lifecycle ----------------------------------------

    def start(self) -> "ServingServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self._httpd.server_close()


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--recognition_bundle")
    ap.add_argument("--transduction_bundle")
    ap.add_argument("--vocoder_bundle")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8008)
    args = ap.parse_args()

    def load(d):
        return ServingBundle.load(d) if d else None

    server = ServingServer(recognition=load(args.recognition_bundle),
                           transduction=load(args.transduction_bundle),
                           vocoder=load(args.vocoder_bundle),
                           host=args.host, port=args.port)
    print(f"serving {sorted(server.bundles)} on "
          f"http://{args.host}:{server.port}", flush=True)
    try:
        server._httpd.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
