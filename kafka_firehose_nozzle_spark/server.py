"""Stats HTTP endpoint (K7; reference server.go:15-85).

Serves the listener-accumulated counters as JSON on /stats/app (golden
format stats_test.go:64-92), runtime info on /stats/runtime, 404 otherwise.
Port from $PORT, default 8080 (server.go:20-28). Runs on a daemon thread
next to the Spark driver — the Spark analog of the reference's HTTP
goroutine (cli.go:186-193).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from kafka_firehose_nozzle_spark.stats import Stats

DEFAULT_PORT = 8080  # server.go:22


def make_handler(stats: Stats):
    class StatsHandler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/stats/app":
                body = stats.to_json().encode()
            elif self.path == "/stats/runtime":
                import resource

                ru = resource.getrusage(resource.RUSAGE_SELF)
                body = json.dumps(
                    {
                        "max_rss_kb": ru.ru_maxrss,
                        "user_time_sec": ru.ru_utime,
                        "threads": threading.active_count(),
                    }
                ).encode()
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet
            pass

    return StatsHandler


def start_stats_server(stats: Stats, port: int | None = None) -> ThreadingHTTPServer:
    """Start the endpoint on a daemon thread; returns the server (call
    .shutdown() to stop). Port precedence: arg > $PORT > 8080."""
    if port is None:
        port = int(os.environ.get("PORT", DEFAULT_PORT))
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(stats))
    threading.Thread(target=server.serve_forever, daemon=True, name="stats-http").start()
    return server
