"""Full-registry correctness gate: every queries() entry vs its DuckDB
oracle at sf0.01 (VERDICT r1 item 5 — the driver samples ~50 of the
registry; this test covers all of it so unchecked queries can't rot).

Marked slow (~3 min): deselect locally with ``-m "not slow"``.
"""

import pytest

from tools.compare_oracle import compare_all

SF = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_full_registry_matches_oracle(spark):
    import __spark_entry__ as entry

    registry = entry.queries()
    assert len(registry) >= 113  # r3 shipped 113; never shrink
    assert set(entry.oracle_sql()) <= set(registry)

    failures = compare_all(spark, SF)
    assert not failures, f"{len(failures)} queries diverge: {failures}"
