"""Compaction execution + partition-layout migration (operators/maintenance.py).

Closes the loop on the reference's 256 MB target-file property
(/root/reference/spark/schemas/bronze_schema.py:246-254): the planner is
oracle-checked as the ``compaction_plan`` query; here the REWRITE is
asserted file-for-file against the plan on real storage, and the
partition-evolution migration is asserted at the layout level (the
row-preservation side is the oracle-checked ``partition_evolution_audit``
query).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from wikistream_event_data_pipeline_aws_spark.catalog import load_table
from wikistream_event_data_pipeline_aws_spark.operators.maintenance import (
    execute_compaction,
    list_partition_files,
    plan_bins,
    plan_compaction,
)
from wikistream_event_data_pipeline_aws_spark.plans.partitioned import (
    EVO_PARTITION_BY,
    write_evolution_tables,
)


@pytest.fixture(scope="module")
def small_file_table(spark, sf_dir, tmp_path_factory) -> str:
    """A deliberately fragmented table: events split into 6 files per
    date partition — the layout a short-trigger streaming sink leaves
    behind."""
    path = str(tmp_path_factory.mktemp("compact") / "events_frag")
    (
        load_table(spark, sf_dir, "events")
        .select(
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
            "event_id",
            "user_id",
            "value",
        )
        .repartition(6)
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )
    return path


def test_inventory_excludes_metadata(spark, small_file_table):
    inv = list_partition_files(spark, small_file_table)
    assert inv, "empty inventory"
    for part in inv:
        assert part.partition.startswith("event_date="), part.partition
        for name, size in part.files:
            assert not name.startswith("_") and not name.startswith("."), name
            assert size > 0


def test_plan_bins_is_next_fit_prefix_sum(spark, small_file_table):
    inv = list_partition_files(spark, small_file_table)[0]
    target = max(size for _, size in inv.files) + 1
    bins = plan_bins(inv, target)
    # name-ordered prefix sum: bin ids are non-decreasing and start at 0
    ids = [bins[name] for name, _ in inv.files]
    assert ids[0] == 0
    assert all(a <= b for a, b in zip(ids, ids[1:]))


def test_execute_compaction_matches_plan_and_preserves_rows(spark, small_file_table):
    before_rows = spark.read.parquet(small_file_table).count()
    before_inv = {i.partition: i for i in list_partition_files(spark, small_file_table)}
    assert any(i.n_files > 1 for i in before_inv.values()), "fixture not fragmented"
    # target sized so every partition plans to FEWER files than it has
    target = max(i.total_bytes for i in before_inv.values()) + 1
    plan = plan_compaction(list(before_inv.values()), target)
    assert all(n == 1 for n in plan.values())

    report = execute_compaction(spark, small_file_table, target)

    after_inv = {i.partition: i for i in list_partition_files(spark, small_file_table)}
    assert set(report) == set(plan)
    for part, n_planned in plan.items():
        assert report[part]["planned_files"] == n_planned
        assert report[part]["files_after"] == n_planned, (part, report[part])
        assert after_inv[part].n_files == n_planned
    # rewrite preserved every row and byte-level sanity holds
    assert spark.read.parquet(small_file_table).count() == before_rows
    for part in plan:
        assert after_inv[part].total_bytes > 0

    # idempotence: a second pass finds nothing above plan and rewrites nothing
    report2 = execute_compaction(spark, small_file_table, target)
    assert all(r["rewritten"] == 0 for r in report2.values()), report2
    assert {p: i.files for p, i in after_inv.items()} == {
        p: i.files for p, i in
        {i.partition: i for i in list_partition_files(spark, small_file_table)}.items()
    }


def test_compaction_respects_multi_bin_plans(spark, small_file_table, tmp_path):
    """With a target smaller than a partition's bytes, the rewrite must
    produce ceil(bytes/target) files, not 1."""
    src = spark.read.option("basePath", small_file_table).parquet(small_file_table)
    path = str(tmp_path / "frag2")
    src.repartition(8).write.mode("overwrite").partitionBy("event_date").parquet(path)
    inv = {i.partition: i for i in list_partition_files(spark, path)}
    big = max(inv.values(), key=lambda i: i.total_bytes)
    target = big.total_bytes // 3 + 1  # plans 3 bins for the biggest partition
    plan = plan_compaction(list(inv.values()), target)
    assert plan[big.partition] in (3, 4)
    execute_compaction(spark, path, target)
    after = {i.partition: i for i in list_partition_files(spark, path)}
    for part, n in plan.items():
        if inv[part].n_files > n:
            assert after[part].n_files == n, (part, n, after[part].n_files)


def test_evolution_layout_and_pruning(spark, sf_dir):
    old_path, new_path = write_evolution_tables(spark, sf_dir)
    # old layout: single-level date dirs; new layout: type/date nesting
    assert glob.glob(os.path.join(old_path, "event_date=*"))
    type_dirs = glob.glob(os.path.join(new_path, "event_type=*"))
    assert type_dirs, "missing event_type top-level dirs"
    assert glob.glob(os.path.join(new_path, "event_type=*", "event_date=*"))

    # row preservation across the rewrite (the audit query oracle-checks
    # content equality; this is the quick structural invariant)
    n_old = spark.read.option("basePath", old_path).parquet(old_path).count()
    n_new = spark.read.option("basePath", new_path).parquet(new_path).count()
    assert n_old == n_new > 0

    # the point of the evolution: a type predicate prunes at the
    # partition level in the NEW layout
    df = spark.read.option("basePath", new_path).parquet(new_path)
    one_type = os.path.basename(type_dirs[0]).split("=", 1)[1]
    plan = (
        df.filter(F.col("event_type") == one_type)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200], plan


def test_evolution_audit_is_all_unchanged(spark, sf_dir):
    from wikistream_event_data_pipeline_aws_spark.plans.partitioned import (
        partition_evolution_audit,
    )

    rows = partition_evolution_audit(spark, sf_dir).collect()
    assert len(rows) == 1
    row = rows[0]
    assert row["diff_class"] == "unchanged"
    assert row["n_keys"] == load_table(spark, sf_dir, "events").count()
    assert EVO_PARTITION_BY == ["event_type", "event_date"]
