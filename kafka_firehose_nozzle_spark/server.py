"""Stats HTTP endpoint (K7; reference server.go:15-85).

Serves the listener-accumulated counters as JSON on /stats/app (golden
format stats_test.go:64-92), runtime info on /stats/runtime, the index
page on / (server.go:50-63), and a pprof-equivalent under /debug/pprof/
(Go's net/http/pprof import at server.go:10 → Python: a goroutine-dump
analog from threading frames plus tracemalloc heap snapshots). 404
otherwise. Port from $PORT, default 8080 (server.go:20-28). Runs on a
daemon thread next to the Spark driver — the Spark analog of the
reference's HTTP goroutine (cli.go:186-193).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from kafka_firehose_nozzle_spark.stats import Stats

DEFAULT_PORT = 8080  # server.go:22

# server.go:51-59, repointed at this engine
INDEX_HTML = b"""
kafka-firehose-nozzle (PySpark engine)
<ul>
  <li><a href="/stats/runtime">stats/runtime</a></li>
  <li><a href="/stats/app">stats/app</a></li>
  <li><a href="/debug/pprof/">pprof</a></li>
</ul>
"""


def _pprof_index() -> bytes:
    profiles = ["threads", "heap"]
    items = "".join(
        f'<li><a href="/debug/pprof/{p}">{p}</a></li>' for p in profiles
    )
    return f"/debug/pprof/<ul>{items}</ul>".encode()


def _thread_dump() -> bytes:
    """Stack of every live thread — the goroutine-profile analog."""
    import sys
    import traceback

    frames = sys._current_frames()
    out = []
    for t in threading.enumerate():
        frame = frames.get(t.ident)
        out.append(f"--- {t.name} (daemon={t.daemon}) ---")
        if frame is not None:
            out.extend(line.rstrip() for line in traceback.format_stack(frame))
    return "\n".join(out).encode()


def _heap_profile() -> bytes:
    """Top allocation sites via tracemalloc — the heap-profile analog.
    Starts tracing on first request (like pprof, sampling begins when
    profiling is first exercised)."""
    import tracemalloc

    if not tracemalloc.is_tracing():
        tracemalloc.start()
        return b"tracemalloc started; request again for a snapshot\n"
    snap = tracemalloc.take_snapshot()
    lines = [str(s) for s in snap.statistics("lineno")[:25]]
    current, peak = tracemalloc.get_traced_memory()
    lines.append(f"traced_current={current} traced_peak={peak}")
    return "\n".join(lines).encode()


def make_handler(stats: Stats):
    class StatsHandler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API)
            # route on the PATH only, like Go's ServeMux (server.go uses
            # r.URL.Path): a scraper's cache-busting query string
            # (/stats/app?_=123) must not 404
            self.path = self.path.split("?", 1)[0]
            ctype = "application/json"
            if self.path == "/":
                body, ctype = INDEX_HTML, "text/html"
            elif self.path == "/stats/app":
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
            elif self.path in ("/debug/pprof", "/debug/pprof/"):
                body, ctype = _pprof_index(), "text/html"
            elif self.path == "/debug/pprof/threads":
                body, ctype = _thread_dump(), "text/plain"
            elif self.path == "/debug/pprof/heap":
                body, ctype = _heap_profile(), "text/plain"
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
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
