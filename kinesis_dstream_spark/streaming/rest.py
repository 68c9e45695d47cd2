"""HTTP control-plane shim over StreamingJobRegistry (reference O-13).

The reference exposes its pollers over a Flask API guarded by an
``x-api-key`` header (``app/app.py:31-52``): POST /start spawns
``subprocess.Popen(job_name.py)``, /stop is ``kill -9 pid``, /check
greps ``ps`` (``:62-116``). This shim keeps the exact HTTP/auth contract
— same header, same 401 payloads, same job_name-keyed routes — but
fronts the Spark-native registry instead of OS processes:

- ``POST /start {"job_name": ...}`` launches a *pre-registered builder*
  (the Spark upgrade of "run <job_name>.py"); double-starts are 409
  instead of silently spawning duplicate pollers.
- ``POST /stop {"job_name": ...}`` stops by NAME and drains the current
  micro-batch (graceful — deliberately not the reference's kill -9,
  SURVEY §7 hard-part 5).
- ``POST /check {"job_name"?: ...}`` returns StreamingQuery status
  (id/runId/lastProgress) instead of parsed ``ps`` columns; without a
  job_name it lists every registered job.
- ``GET /`` is the unauthenticated health probe.

Implemented on stdlib ``http.server`` (threaded, ephemeral port) so it
has zero dependencies; it is a control plane, not a data path — request
volume is human-scale, so the stdlib server is the right weight.
"""

from __future__ import annotations

import json
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from kinesis_dstream_spark.streaming.control import StreamingJobRegistry


class ControlPlaneServer:
    """Serve the registry over HTTP with header auth.

    ``builders`` maps job_name -> zero-arg callable returning a started
    StreamingQuery (what the reference encoded as "<job_name>.py").
    """

    def __init__(
        self,
        registry: StreamingJobRegistry,
        builders: dict[str, Callable],
        api_key: str,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.registry = registry
        self.builders = builders
        self.api_key = api_key
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "ControlPlaneServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="control-plane", daemon=True
        )
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)

    # ------------------------------------------------------------------

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # noqa: ANN001 - silence stderr
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authorized(self) -> bool:
                """The reference's authorize decorator, byte-for-byte
                message parity (app/app.py:40-51)."""
                auth = self.headers.get("x-api-key")
                if not auth:
                    self._send(401, {"message": "Must provide x-api-key:token"})
                    return False
                if auth != server.api_key:
                    self._send(401, {"message": "Invalid API KEY"})
                    return False
                return True

            def _payload(self) -> dict | None:
                n = int(self.headers.get("Content-Length") or 0)
                if n == 0:
                    return None
                try:
                    return json.loads(self.rfile.read(n))
                except json.JSONDecodeError:
                    return None

            def do_GET(self):  # noqa: N802 - http.server API
                if self.path == "/":
                    self._send(200, {"message": "Server up and running"})
                else:
                    self._send(404, {"message": "unknown route"})

            def do_POST(self):  # noqa: N802 - http.server API
                if self.path not in ("/start", "/stop", "/check"):
                    self._send(404, {"message": "unknown route"})
                    return
                if not self._authorized():
                    return
                payload = self._payload()
                if payload is None:
                    self._send(400, {"message": "Must provide arguments in payload"})
                    return
                job_name = payload.get("job_name")
                if self.path != "/check" and not job_name:
                    self._send(400, {"message": "Must provide job_name"})
                    return
                try:
                    if self.path == "/start":
                        builder = server.builders.get(job_name)
                        if builder is None:
                            self._send(
                                404, {"message": f"unknown job_name {job_name!r}"}
                            )
                            return
                        self._send(200, server.registry.start(job_name, builder))
                    elif self.path == "/stop":
                        self._send(200, server.registry.stop(job_name))
                    elif job_name:
                        self._send(
                            200, {"current_status": server.registry.status(job_name)}
                        )
                    else:
                        self._send(200, {"current_status": server.registry.check()})
                except ValueError as e:  # double start
                    self._send(409, {"message": str(e)})
                except KeyError as e:  # unknown job
                    self._send(404, {"message": str(e.args[0])})

        return Handler
