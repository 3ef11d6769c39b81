"""Scale-aware sizing helpers (session.py): shuffle partitions derived
from input volume and storage-level gating for big materializations —
OPERATING.md's 100-200 MB/task rule and the r9 sf100 storage-level
lessons encoded as engine behavior (VERDICT r9 items 1 and 4)."""

from __future__ import annotations

import pytest
from pyspark.storagelevel import StorageLevel

from kafka_firehose_nozzle_spark import session as S


# ------------------------------------------------- derive_shuffle_partitions


def test_small_input_stays_at_floor():
    # sf0.1 (~17.5 MB) and sf1 (~180 MB) must keep the local default so
    # the driver bench plans are unchanged
    assert S.derive_shuffle_partitions(17_500_000, floor=32) == 32
    assert S.derive_shuffle_partitions(180_000_000, floor=32) == 32


def test_sf100_volume_clears_the_oom_threshold():
    # 18.2 GB (the real sf100 dir) must derive >= the 256 partitions
    # that fixed the r9 supplier_pagerank heap OOM at 32
    n = S.derive_shuffle_partitions(18_200_000_000, floor=32)
    assert 256 <= n <= S.SHUFFLE_PARTITION_CAP


def test_cap_bounds_runaway_inputs():
    assert (
        S.derive_shuffle_partitions(10**15, floor=32)
        == S.SHUFFLE_PARTITION_CAP
    )


def test_monotone_in_volume():
    vals = [
        S.derive_shuffle_partitions(b, floor=8)
        for b in (0, 10**8, 10**9, 10**10, 10**11)
    ]
    assert vals == sorted(vals)
    assert vals[0] == 8


def test_rounds_up_never_down():
    # rounding must err toward MORE partitions (a missing one near the
    # memory cliff OOMs; AQE coalesces excess for free): one byte past
    # an exact task boundary adds a partition
    exact = 100 * S.TARGET_BYTES_PER_TASK
    b = int(exact / S.DEFAULT_EXPANSION)
    while int(b * S.DEFAULT_EXPANSION) < exact:
        b += 1
    assert S.derive_shuffle_partitions(b, floor=1) == 100
    assert S.derive_shuffle_partitions(b + 1, floor=1) == 101


# --------------------------------------------------------- heap parsing


def _fake_spark(confs: dict):
    class FakeConf:
        def get(self, key, default=None):
            return confs.get(key, default)

    class FakeSpark:
        conf = FakeConf()

    return FakeSpark()


@pytest.mark.parametrize(
    "raw,want",
    [
        ("32g", 32 << 30),
        ("512m", 512 << 20),
        ("1t", 1 << 40),
        ("2048k", 2048 << 10),
        # bare number = MiB, matching Spark's byteStringAsMb semantics
        # for the memory confs (a '4096' driver is a 4 GiB driver)
        ("4096", 4096 << 20),
        ("16G", 16 << 30),
        ("4gb", 4 << 30),
    ],
)
def test_heap_bytes_parses_jvm_memory_strings(raw, want):
    fake = _fake_spark(
        {"spark.master": "local[8]", "spark.driver.memory": raw}
    )
    assert S._heap_bytes(fake) == want


def test_heap_bytes_local_master_ignores_executor_memory():
    # local mode ignores spark.executor.memory (the driver IS the
    # executor) — a stray defaults-file value must not win
    fake = _fake_spark(
        {
            "spark.master": "local[32]",
            "spark.driver.memory": "32g",
            "spark.executor.memory": "4g",
        }
    )
    assert S._heap_bytes(fake) == 32 << 30


def test_heap_bytes_cluster_master_prefers_executor_memory():
    fake = _fake_spark(
        {
            "spark.master": "spark://head:7077",
            "spark.driver.memory": "8g",
            "spark.executor.memory": "16g",
        }
    )
    assert S._heap_bytes(fake) == 16 << 30


def test_heap_bytes_local_cluster_master_is_not_local():
    # local-cluster[n,cores,mem] launches real executor JVMs — their
    # (smaller) heap is the budget, not the driver's
    fake = _fake_spark(
        {
            "spark.master": "local-cluster[2,1,1024]",
            "spark.driver.memory": "32g",
            "spark.executor.memory": "1g",
        }
    )
    assert S._heap_bytes(fake) == 1 << 30


# ------------------------------------------- checkpoint_storage_level


def test_storage_level_gates_on_estimated_bytes(spark):
    # the live session runs a 32g driver heap (session.py default);
    # threshold = 25% of heap = 8 GB
    heap = S._heap_bytes(spark)
    small = S.checkpoint_storage_level(spark, heap // 100)
    big = S.checkpoint_storage_level(spark, heap)  # 1x heap >> 25%
    assert small == StorageLevel.MEMORY_AND_DISK
    assert big == StorageLevel.DISK_ONLY


def test_storage_level_applies_expansion(spark):
    # sf100 roundtrip regime: 1.36 GB events parquet x20 JSON expansion
    # crosses the cliff; the same bytes at x1 do not (32 GB heap)
    heap = S._heap_bytes(spark)
    if heap < 16 << 30:
        pytest.skip("heap too small for the sf100-regime constants")
    parquet_bytes = 1_360_000_000
    assert (
        S.checkpoint_storage_level(spark, parquet_bytes, expansion=20.0)
        == StorageLevel.DISK_ONLY
    )
    assert (
        S.checkpoint_storage_level(spark, parquet_bytes, expansion=1.0)
        == StorageLevel.MEMORY_AND_DISK
    )


# ---------------------------------------------------------- input_bytes


def test_input_bytes_via_hadoop_fs(spark, tmp_path):
    p = tmp_path / "t.parquet"
    spark.range(1000).write.parquet(str(p))
    got = S.input_bytes(spark, str(p))
    import os

    # LocalFileSystem's ContentSummary excludes its own hidden .crc
    # sidecars — mirror that
    want = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(p)
        for f in fs
        if not f.startswith(".")
    )
    assert got == want > 0
    # missing paths count zero, not error
    assert S.input_bytes(spark, str(tmp_path / "absent")) == 0


def test_configure_shuffle_for_input_sets_conf(spark, tmp_path):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        p = tmp_path / "tiny.parquet"
        spark.range(10).write.parquet(str(p))
        n = S.configure_shuffle_for_input(spark, str(p))
        # tiny input -> floor (local parallelism), and the conf is set
        assert n == S.derive_shuffle_partitions(S.input_bytes(spark, str(p)))
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(n)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_cap_clamp_warns_no_silent_caps(caplog):
    """Clamping the derived count to the cap re-opens per-task-bytes
    growth — the module must SAY so (ADVICE r10: no silent caps). Below
    the cap: silence."""
    import logging

    with caplog.at_level(logging.WARNING, logger="kafka_firehose_nozzle_spark"):
        n = S.derive_shuffle_partitions(300 * 1024**4)  # ~300 TB source
    assert n == S.SHUFFLE_PARTITION_CAP
    assert any("clamped to" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="kafka_firehose_nozzle_spark"):
        S.derive_shuffle_partitions(10 * 1024**3)
    assert not caplog.records


def test_parquet_expansion_reads_footers():
    """Footer-derived expansion (VERDICT r10 item 5): string-heavy
    tables expand, double-array embeddings do not — the fixed 3.0
    constant was over-partitioning the latter."""
    docs = S.parquet_expansion("/root/testdata/sf0.01/documents.parquet")
    emb = S.parquet_expansion("/root/testdata/sf0.01/embeddings.parquet")
    whole = S.parquet_expansion("/root/testdata/sf0.01")
    assert docs is not None and emb is not None and whole is not None
    assert emb < docs  # embeddings barely expand; documents ~2.7x
    assert 1.0 <= emb < 1.5 and 2.0 < docs < 4.0
    assert 1.0 <= whole <= 4.0
    # non-parquet / missing inputs degrade to None, never raise
    assert S.parquet_expansion("/etc/hosts") is None
    assert S.parquet_expansion("/nonexistent/path") is None


def test_configure_shuffle_uses_footer_expansion(spark, tmp_path):
    """configure_shuffle_for_input derives its expansion from the
    input's own footers (fallback: DEFAULT_EXPANSION for non-parquet)."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        p = tmp_path / "t.parquet"
        spark.range(1000).write.parquet(str(p))
        n = S.configure_shuffle_for_input(spark, str(p))
        exp = S.parquet_expansion(str(p)) or S.DEFAULT_EXPANSION
        assert n == S.derive_shuffle_partitions(
            S.input_bytes(spark, str(p)), expansion=exp
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_sf100_footer_derivation_stays_in_working_band():
    """The r10 done-criterion: footer-calibrated sizing at the fourth
    decade must stay inside the 256-512 band the sf100 sweeps
    validated (constant-3.0 derived 347 there; footers measure ~2.98).
    Runs only when the scaled corpus is materialized (OPERATING.md's
    disk-lifecycle rules)."""
    import os

    import pytest as _pytest

    if not os.path.isdir("/tmp/sf100"):
        _pytest.skip("sf100 corpus not materialized (see OPERATING.md)")
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk("/tmp/sf100")
        for f in fs
    )
    exp = S.parquet_expansion("/tmp/sf100")
    assert exp is not None and 2.0 < exp < 4.0
    n = S.derive_shuffle_partitions(total, expansion=exp)
    assert 256 <= n <= 512
