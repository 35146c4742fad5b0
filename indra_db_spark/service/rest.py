"""Minimal REST front end over the service layer — the reference's
indra_db_service Flask app (api.py:339-560, call_handlers.py:472-602)
re-expressed with only the standard library so the engine stays
dependency-free.  The HTTP layer is deliberately thin: every route is one
call into ``service.params`` + ``plans.shaping``; a production deployment
would mount the same functions under Flask/FastAPI unchanged.

Routes (result_type grains as in api.py):

- ``GET  /health``
- ``GET  /statements/from_agents?agent=MEK@FPLX&type=...&limit=&ev_limit=``
- ``GET  /hashes/from_agents?...``
- ``POST /query/statements``  body ``{"query": <simple-json>, "limit": ...}``
- ``POST /compile[?format=json|string]``  (conformance endpoint,
  api.py:527-539)

The ``medscan`` query param simulates the reference's API-key permission
(call_handlers.py:168-174): without it, medscan-only statements are
censored from results.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from indra_db_spark.plans.shaping import get_hashes, get_statements
from indra_db_spark.service.params import (
    MAX_STMTS,
    WebQueryError,
    apply_medscan_censor,
    compile_query,
    query_from_simple_json,
    query_from_web_params,
)


def _web_params(qs: dict[str, list[str]]) -> dict:
    """parse_qs output → the dict shape query_from_web_params expects
    (scalars for single values, lists for repeated params)."""
    out: dict = {}
    for k, vals in qs.items():
        if k in ("limit", "offset", "ev_limit", "sort_by", "medscan", "format"):
            continue
        out[k] = vals if len(vals) > 1 else vals[0]
    return out


def make_handler(lake):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test runs
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _page_args(self, qs) -> dict:
            limit = min(int(qs.get("limit", [str(MAX_STMTS)])[0]), MAX_STMTS)
            return {
                "limit": limit,
                "offset": int(qs.get("offset", ["0"])[0]),
                "sort_by": qs.get("sort_by", ["ev_count"])[0],
            }

        def _run(self, result_type: str, query, ev_filter, qs) -> dict:
            query = apply_medscan_censor(
                query, has_medscan=qs.get("medscan", ["false"])[0] == "true"
            )
            page = self._page_args(qs)
            if result_type == "hashes":
                rows = get_hashes(query, lake, **page).collect()
                return {
                    "results": [
                        {"mk_hash": r.mk_hash, "ev_count": r.ev_count,
                         "belief": r.belief}
                        for r in rows
                    ]
                }
            if result_type == "statements":
                ev_limit = int(qs.get("ev_limit", ["10"])[0])
                res = get_statements(
                    query, lake, ev_limit=ev_limit,
                    evidence_filter=ev_filter, **page,
                )
                return res.json()
            raise WebQueryError(f"unknown result type {result_type!r}")

        def do_GET(self) -> None:
            url = urlparse(self.path)
            qs = parse_qs(url.query)
            try:
                if url.path == "/health":
                    self._send(200, {"status": "ok"})
                    return
                parts = url.path.strip("/").split("/")
                if len(parts) == 2 and parts[1] == "from_agents":
                    query, ev_filter = query_from_web_params(_web_params(qs))
                    self._send(200, self._run(parts[0], query, ev_filter, qs))
                    return
                self._send(404, {"error": f"no route {url.path}"})
            except (WebQueryError, KeyError, ValueError) as e:
                # ValueError/KeyError cover malformed query params (e.g. a
                # non-integer limit) — same contract as do_POST
                self._send(400, {"error": str(e)})

        def do_POST(self) -> None:
            url = urlparse(self.path)
            qs = parse_qs(url.query)
            n = int(self.headers.get("Content-Length", "0"))
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
                if url.path == "/compile":
                    fmt = qs.get("format", ["json"])[0]
                    self._send(200, {"compiled": compile_query(body, fmt)})
                    return
                parts = url.path.strip("/").split("/")
                if len(parts) == 2 and parts[0] == "query":
                    query = query_from_simple_json(body["query"])
                    for k in ("limit", "offset", "ev_limit"):
                        if k in body:
                            qs[k] = [str(body[k])]
                    self._send(200, self._run(parts[1], query, None, qs))
                    return
                self._send(404, {"error": f"no route {url.path}"})
            except (WebQueryError, KeyError, ValueError) as e:
                self._send(400, {"error": str(e)})

    return Handler


def serve(lake, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Start the shim on a daemon thread; returns the server (use
    ``server.server_address`` for the bound port, ``.shutdown()`` to stop)."""
    server = ThreadingHTTPServer((host, port), make_handler(lake))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
