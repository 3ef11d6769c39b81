"""One-shot full-registry oracle sweep at a scaled sf dir, ANSI mode ON.

VERDICT r7 item 1: the per-wave sf1 gate caught three volume-activated
bugs (int64 overflows, a libm-ulp flip) but only covered queries that
landed after the gate existed. This script runs the ENTIRE registry —
Spark (ansi.enabled=true, so silent wraps become errors) vs the DuckDB
oracle — at an arbitrary sf dir with the same strict comparator the
driver uses (tools/compare_oracle.canon: dtype-exact, value-exact).

Usage: python tools/sweep_scale.py SF_DIR [--progress FILE]
           [--timeout SEC] [--shuffle-partitions N] [query ...]

``--shuffle-partitions``: size the shuffle to the scale factor. The
session default (32) gives multi-GB per-task shuffles at sf100 — the
r9 sweep lost supplier_pagerank to a 32 GB task heap OOM that simply
disappears at 256 partitions. This is the cluster-sizing knob the
engine docs call out (OPERATING.md), applied to the sweep itself.

Prints one progress line per query and a final JSON summary; exit 1 on
any failure. Results land in SCALE.md by hand.

``--progress FILE`` appends one JSON line per completed query and, on
restart, SKIPS names already recorded as pass — the first sf1 attempt
died 39 queries in when a concurrent job filled the disk, and a sweep
that re-runs five hours of passed queries after a crash is a sweep
that never finishes.  Disk hygiene for the same reason: a single
SparkSession accumulates shuffle files across 350 queries (36 GB by
query 39 at sf1), so after each query we clear the cache and nudge the
JVM GC — Spark's ContextCleaner only deletes shuffle dirs once their
RDDs are collected — and report the temp volume's free space.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tools.compare_oracle import compare_query, oracle_connection

from kafka_firehose_nozzle_spark.session import get_spark


def _load_done(path: str) -> dict[str, str | None]:
    """{name: err-or-None} from a previous run's progress file."""
    done: dict[str, str | None] = {}
    if path and os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["name"]] = rec["err"]
    return done


def _timed_compare(spark, con, sf_dir, name, timeout_sec):
    """compare_query under a SIGALRM deadline: one pathological query
    must not wedge a 350-query sweep.  On expiry the Spark jobs are
    cancelled and the DuckDB query interrupted; the query is recorded
    as a TIMEOUT failure for later triage."""
    import signal

    if not timeout_sec:
        return compare_query(spark, con, sf_dir, name)

    def on_alarm(signum, frame):
        raise TimeoutError(f"TIMEOUT>{timeout_sec}s")

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(timeout_sec)
    try:
        return compare_query(spark, con, sf_dir, name)
    except TimeoutError as e:
        try:
            spark.sparkContext.cancelAllJobs()
        except Exception:
            pass
        try:
            con.interrupt()
        except Exception:
            pass
        return str(e)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main() -> int:
    argv = list(sys.argv[1:])
    progress = None
    timeout_sec = 0
    if "--progress" in argv:
        i = argv.index("--progress")
        progress = argv[i + 1]
        del argv[i : i + 2]
    if "--timeout" in argv:
        i = argv.index("--timeout")
        timeout_sec = int(argv[i + 1])
        del argv[i : i + 2]
    shuffle_parts = None
    if "--shuffle-partitions" in argv:
        i = argv.index("--shuffle-partitions")
        shuffle_parts = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0]
    only = set(argv[1:]) or None
    done = _load_done(progress) if progress else {}
    # A progress entry whose err starts with "SKIP" is a deliberate,
    # documented exclusion (e.g. a data-regime infeasibility recorded
    # in SCALE.md) — honored on restart and reported separately, never
    # silently retried or counted as a pass.
    skips = {n: e for n, e in done.items() if e and e.startswith("SKIP")}
    # maxResultSize: the STRICT comparator materializes each query's
    # full result on the driver to canon-hash it against DuckDB — an
    # engine anti-pattern in operators, but the comparator's whole job.
    # sf100's session-window result crossed the 1 GiB default
    # (1053.5 MiB, r11); 8 GiB keeps the collect bounded well under the
    # 32 GiB driver heap while covering another decade of result growth.
    sweep_conf = {
        "spark.sql.ansi.enabled": "true",
        "spark.driver.maxResultSize": "8g",
    }
    if shuffle_parts:
        sweep_conf["spark.sql.shuffle.partitions"] = str(shuffle_parts)
    spark = get_spark("scale-sweep", extra_conf=sweep_conf)
    if not shuffle_parts:
        # engine-derived sizing (session.py): shuffle partitions from
        # the sf dir's actual volume — the sweep no longer needs the
        # manual --shuffle-partitions flag at sf100 (VERDICT r9 item 4).
        # Recorded into sweep_conf so a mid-sweep session recreation
        # (ensure_spark) inherits the same sizing.
        from kafka_firehose_nozzle_spark.session import configure_shuffle_for_input

        derived = configure_shuffle_for_input(spark, sf_dir)
        sweep_conf["spark.sql.shuffle.partitions"] = str(derived)
        print(f"shuffle partitions derived from input volume: {derived}", flush=True)
    # Best-effort vm.max_map_count raise: glibc mmaps each medium
    # DuckDB block separately, so a scaled-data oracle exhausts the
    # default 65,530 mappings at ~8 GB RSS and dies with a bad_alloc
    # that is indistinguishable from OOM (the r8 sweep lost four
    # queries to this before it was diagnosed — RSS was 8.4 GB on a
    # 125 GB box).  Requires root; harmless if it fails.  NOTE: this is
    # a host-global kernel knob that PERSISTS after the sweep exits —
    # we only ever RAISE it (never lower a value an admin already set
    # higher) and log when we change it, so the side effect is visible.
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            cur_map_count = int(f.read().strip())
        if cur_map_count < 1048576:
            with open("/proc/sys/vm/max_map_count", "w") as f:
                f.write("1048576")
            print(
                f"raised vm.max_map_count {cur_map_count} -> 1048576 "
                "(host-global, persists after exit)",
                flush=True,
            )
    except (OSError, ValueError):
        pass

    def fresh_con():
        # Cap DuckDB and give it a spill dir: both single-node oracle
        # deaths of the sf10 stretch sweep (supplier_triangles 92 GB
        # RSS, semdedup_keep 105 GB RSS) were hard OOM *process kills*
        # — with a cap, an over-budget operator spills to disk or
        # raises a catchable OutOfMemoryException that lands in the
        # journal as an ordinary failure instead of killing the whole
        # resumable sweep.  48 GB leaves room for the 32 GB Spark
        # driver on a 125 GB host.  The spill dir is per-process
        # (mkdtemp) so a concurrent sweep on this shared box can't have
        # its live spill files rmtree'd out from under it.
        c = oracle_connection(sf_dir)
        c.execute("SET memory_limit='48GB'")
        spill = tempfile.mkdtemp(prefix="duckdb_spill_")
        c.execute(f"SET temp_directory='{spill}'")
        return c, spill

    def ensure_spark(s):
        # A catastrophic executor failure (the r9 sf100 run hit a
        # disk-full spill that killed the whole SparkContext) must cost
        # ONE journal entry, not poison every later query with
        # "Cannot call methods on a stopped SparkContext".  getOrCreate
        # builds a fresh context once the old one is stopped.
        try:
            stopped = s.sparkContext._jsc.sc().isStopped()
        except Exception:
            stopped = True
        if not stopped:
            return s
        print("SparkContext died — recreating session", flush=True)
        try:
            s2 = get_spark("scale-sweep", extra_conf=sweep_conf)
            s2.range(1).count()  # prove the new context actually works
            return s2
        except Exception as e:
            # the JVM gateway itself is gone (r9 saw a heap-OOM take the
            # whole JVM: later getOrCreate calls returned a stopped
            # session, then ConnectionRefused) — in-process recovery is
            # impossible. Exit cleanly; the resumable journal makes a
            # process-level relaunch pick up exactly here.
            print(f"session recreation failed ({e}); exiting for a "
                  "process-level restart (journal is resumable)", flush=True)
            raise SystemExit(3)

    names = [n for n in entrymod.queries() if not only or n in only]
    failures: dict[str, str] = {
        n: e for n, e in done.items() if e and n not in skips
    }
    t0 = time.time()
    for i, name in enumerate(names, 1):
        if name in done and (done[name] is None or name in skips):
            continue  # passed / documented-skip in a previous attempt
        spark = ensure_spark(spark)
        t = time.time()
        # One connection PER QUERY: after rake_keywords exhausted the
        # 48 GB cap mid-operator, the shared connection's allocator
        # stayed poisoned — three later trivially-small queries failed
        # on 2 KB allocations and the process eventually segfaulted.
        # A fresh connection releases every buffer unconditionally.
        # fresh_con() itself sits inside the try: a transient duckdb
        # error during connect/SET is journaled as THIS query's failure
        # instead of aborting the whole resumable sweep.
        con, spill = None, None
        try:
            con, spill = fresh_con()
            err = _timed_compare(spark, con, sf_dir, name, timeout_sec)
        except Exception as e:  # connect/SET failure → this query's err
            err = f"{type(e).__name__}: {e}"
        finally:
            if con is not None:
                try:
                    con.close()
                except Exception:
                    pass
            if spill:
                shutil.rmtree(spill, ignore_errors=True)
        dt = time.time() - t
        # Release this query's shuffle/checkpoint files before the next
        # one: drop cached plans, then ask the JVM to GC so the
        # ContextCleaner actually unlinks the dirs.  Best-effort: a
        # context that died mid-query must still reach the journal
        # write below.
        try:
            # unpersist(True) blocks until localCheckpoint blocks are
            # actually removed — the py4j default (blocking=false) only
            # initiates removal, leaving open the ContextCleaner race
            # that filled the disk during the r9 sf100 bench
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(True)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        free_gb = shutil.disk_usage("/tmp").free / 2**30
        print(
            f"[{i}/{len(names)}] {name} {dt:.1f}s "
            + ("PASS" if err is None else f"FAIL {err}")
            + f" (disk_free={free_gb:.0f}G)",
            flush=True,
        )
        if progress:
            with open(progress, "a") as f:
                f.write(json.dumps({"name": name, "sec": round(dt, 1), "err": err}) + "\n")
        if err is not None:
            failures[name] = err
        else:
            failures.pop(name, None)  # a re-run that passes clears its stale record
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "ansi": True,
                "total": len(names),
                "n_fail": len(failures),
                "failed": failures,
                "documented_skips": skips,
                "elapsed_sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
