"""One-shot full-registry oracle sweep at a scaled sf dir, ANSI mode ON.

VERDICT r7 item 1: the per-wave sf1 gate caught three volume-activated
bugs (int64 overflows, a libm-ulp flip) but only covered queries that
landed after the gate existed. This script runs the ENTIRE registry —
Spark (ansi.enabled=true, so silent wraps become errors) vs the DuckDB
oracle — at an arbitrary sf dir with the same strict comparator the
driver uses (tools/compare_oracle.canon: dtype-exact, value-exact).

Usage: python tools/sweep_scale.py SF_DIR [query ...]

Prints one progress line per query and a final JSON summary; exit 1 on
any failure. Results land in SCALE.md by hand.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tools.compare_oracle import compare_query, oracle_connection

from kafka_firehose_nozzle_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1]
    only = set(sys.argv[2:]) or None
    spark = get_spark(
        "scale-sweep", extra_conf={"spark.sql.ansi.enabled": "true"}
    )
    con = oracle_connection(sf_dir)
    names = [n for n in entrymod.queries() if not only or n in only]
    failures: dict[str, str] = {}
    t0 = time.time()
    for i, name in enumerate(names, 1):
        t = time.time()
        err = compare_query(spark, con, sf_dir, name)
        dt = time.time() - t
        print(
            f"[{i}/{len(names)}] {name} {dt:.1f}s "
            + ("PASS" if err is None else f"FAIL {err}"),
            flush=True,
        )
        if err is not None:
            failures[name] = err
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "ansi": True,
                "total": len(names),
                "n_fail": len(failures),
                "failed": failures,
                "elapsed_sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
