"""Incremental maintenance operators (operators/merge.py): SCD-1
upsert semantics, CDC changelog collapse, idempotent replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from waterdata_spark.operators.merge import apply_changes, merge_upsert


@pytest.fixture()
def target(spark):
    rows = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
    return spark.createDataFrame(rows, "id long, name string, val double")


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestMergeUpsert:
    def test_update_insert_delete(self, spark, target):
        src = spark.createDataFrame(
            [(2, "B", 21.0, False), (4, "d", 40.0, False), (3, None, 0.0, True), (9, "x", 0.0, True)],
            "id long, name string, val double, is_del boolean",
        )
        out = merge_upsert(target, src, ["id"], delete_col="is_del")
        assert _rows(out) == {
            (1, "a", 10.0),  # untouched
            (2, "B", 21.0),  # updated
            (4, "d", 40.0),  # inserted
            # 3 deleted; delete of missing key 9 is a no-op
        }

    def test_update_subset_of_columns(self, spark, target):
        src = spark.createDataFrame([(2, "IGNORED", 99.0)], "id long, name string, val double")
        out = merge_upsert(target, src, ["id"], update_cols=["val"])
        assert _rows(out) == {(1, "a", 10.0), (2, "b", 99.0), (3, "c", 30.0)}

    def test_source_null_wins_on_update(self, spark, target):
        """SCD-1 contract: the source VALUE wins, including NULL —
        this is an overwrite, not a coalesce."""
        src = spark.createDataFrame([(1, None, 11.0)], "id long, name string, val double")
        out = merge_upsert(target, src, ["id"])
        assert _rows(out) == {(1, None, 11.0), (2, "b", 20.0), (3, "c", 30.0)}

    def test_null_key_matches_null_key(self, spark):
        t = spark.createDataFrame([(None, "old")], "k string, v string")
        s = spark.createDataFrame([(None, "new")], "k string, v string")
        out = merge_upsert(t, s, ["k"])
        assert _rows(out) == {(None, "new")}

    def test_schema_is_target_schema(self, spark, target):
        src = spark.createDataFrame(
            [(5, "e", 1.0, "extra")], "id long, name string, val double, junk string"
        )
        out = merge_upsert(target, src, ["id"])
        assert out.columns == target.columns


class TestApplyChanges:
    @pytest.fixture()
    def changes(self, spark):
        rows = [
            (2, "b1", 21.0, "update", 1),
            (2, "b2", 22.0, "update", 2),  # later seq wins
            (3, None, 0.0, "delete", 1),
            (4, "d", 40.0, "insert", 1),
            (5, "e", 50.0, "insert", 1),
            (5, None, 0.0, "delete", 2),  # inserted then deleted -> gone
        ]
        return spark.createDataFrame(rows, "id long, name string, val double, op string, seq long")

    def test_latest_op_per_key_wins(self, spark, target, changes):
        out = apply_changes(target, changes, ["id"])
        assert _rows(out) == {(1, "a", 10.0), (2, "b2", 22.0), (4, "d", 40.0)}

    def test_replay_is_idempotent(self, spark, target, changes):
        once = apply_changes(target, changes, ["id"])
        twice = apply_changes(once, changes, ["id"])
        assert _rows(once) == _rows(twice)

    def test_collapse_is_single_aggregation(self, spark, target, changes):
        """The changelog collapse must be one hash aggregate (map-side
        combinable), not a window over the full log."""
        plan = (
            apply_changes(target, changes, ["id"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan


class TestStreamingCdc:
    def test_changelog_stream_maintains_table(self, spark, tmp_path):
        """End-to-end: a 2-file changelog stream (1 file per micro-batch)
        incrementally maintains a versioned parquet table; the final
        snapshot equals the batch apply_changes result applied in
        sequence."""
        from waterdata_spark.streaming.cdc import cdc_upsert_sink, init_table, read_table

        schema = "id long, name string, val double, op string, seq long"
        target0 = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, val double"
        )
        table_dir = str(tmp_path / "table")
        init_table(target0, table_dir)

        f1 = [(2, "b1", 21.0, "update", 1), (3, "c", 30.0, "insert", 1)]
        f2 = [(1, None, 0.0, "delete", 2), (3, "c2", 31.0, "update", 2)]
        changes_dir = tmp_path / "changes"
        changes_dir.mkdir()
        spark.createDataFrame(f1, schema).coalesce(1).write.parquet(str(changes_dir / "f1"))
        spark.createDataFrame(f2, schema).coalesce(1).write.parquet(str(changes_dir / "f2"))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(changes_dir / "*"))
        )
        q = cdc_upsert_sink(stream, table_dir, ["id"], checkpoint_dir=str(tmp_path / "ckpt"))
        q.awaitTermination()

        got = _rows(read_table(spark, table_dir))
        expected = apply_changes(
            apply_changes(target0, spark.createDataFrame(f1, schema), ["id"]),
            spark.createDataFrame(f2, schema),
            ["id"],
        )
        assert got == _rows(expected)
        assert got == {(2, "b1", 21.0), (3, "c2", 31.0)}


class TestBucketedMerge:
    def test_bucketed_target_merges_without_target_exchange(self, spark, tmp_path):
        """The incremental-maintenance scale contract: a target bucketed
        on the merge keys full-outer-joins its change set with no
        Exchange on the target side — repeated merges never re-shuffle
        the big table. (Needs plain key equality: null-safe `<=>` keys
        don't satisfy the bucketed output partitioning.)"""
        from waterdata_spark.sources.bucketed import read_table, write_bucketed

        spark.sql(f"CREATE DATABASE IF NOT EXISTS mgtest LOCATION '{tmp_path}/wh'")
        try:
            target = spark.createDataFrame(
                [(i, f"n{i}", float(i)) for i in range(100)], "id long, name string, val double"
            )
            write_bucketed(target, "mgtest.t_b", ["id"], n_buckets=4, sort_cols=["id"])
            src = spark.createDataFrame(
                [(1, "X", -1.0, False), (200, "new", 0.5, False), (2, None, 0.0, True)],
                "id long, name string, val double, is_del boolean",
            )
            out = merge_upsert(
                read_table(spark, "mgtest.t_b"), src, ["id"],
                delete_col="is_del", null_safe_keys=False,
            )
            plan = out._jdf.queryExecution().executedPlan().toString()
            # exactly one Exchange: the small source side
            assert plan.count("Exchange") == 1, plan
            rows = {tuple(r) for r in out.collect()}
            assert (1, "X", -1.0) in rows and (200, "new", 0.5) in rows
            assert not any(r[0] == 2 for r in rows)
            assert len(rows) == 100  # 100 - 1 delete + 1 insert
        finally:
            spark.sql("DROP TABLE IF EXISTS mgtest.t_b")
            spark.sql("DROP DATABASE IF EXISTS mgtest")

    def test_vacuum_keeps_live_and_n_newest(self, spark, tmp_path):
        from waterdata_spark.streaming.cdc import init_table, read_table, vacuum_table
        import os

        t = spark.createDataFrame([(1, "a")], "id long, v string")
        table_dir = str(tmp_path / "t")
        init_table(t, table_dir)
        # publish three more versions by hand
        from waterdata_spark.streaming.cdc import _publish

        for i in (1, 2, 3):
            _publish(t.withColumn("v", F.lit(f"v{i}")), table_dir, f"v{i}")
        removed = vacuum_table(table_dir, keep=2)
        assert removed == ["v0", "v1"]
        left = sorted(d for d in os.listdir(table_dir) if d.startswith("v") and d[1:].isdigit())
        assert left == ["v2", "v3"]
        assert {tuple(r) for r in read_table(spark, table_dir).collect()} == {(1, "v3")}


    def test_vacuum_uninitialized_raises_consistent_error(self, tmp_path):
        """vacuum_table on a never-initialized dir must raise the same
        'CDC table not initialized' RuntimeError apply_cdc_batch does —
        not a raw FileNotFoundError."""
        from waterdata_spark.streaming.cdc import vacuum_table
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="CDC table not initialized"):
            vacuum_table(str(tmp_path / "nope"))

    def test_assert_unique_rejects_duplicate_source_keys(self, spark, target):
        import pytest as _pytest

        src = spark.createDataFrame(
            [(2, "x", 1.0), (2, "y", 2.0), (9, "new", 9.0)],
            "id long, name string, val double",
        )
        with _pytest.raises(ValueError, match="not unique"):
            merge_upsert(target, src, ["id"], assert_unique=True)
        # unique source passes the gate unchanged
        ok = merge_upsert(target, src.filter("name <> 'y'"), ["id"], assert_unique=True)
        assert any(r["id"] == 9 for r in ok.collect())


class TestReviewRegressions:
    def test_update_cols_empty_means_insert_delete_only(self, spark, target):
        """An EXPLICIT update_cols=[] must not fall through to the
        all-shared-columns default: matched rows stay untouched."""
        src = spark.createDataFrame(
            [(2, "CHANGED", 99.0, False), (7, "new", 70.0, False)],
            "id long, name string, val double, is_del boolean",
        )
        out = merge_upsert(target, src, ["id"], update_cols=[], delete_col="is_del")
        assert _rows(out) == {
            (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),  # 2 NOT modified
            (7, "new", 70.0),  # insert still lands
        }

    def test_cdc_batch_replay_is_safe_and_content_stable(self, spark, tmp_path):
        """Checkpoint replay re-runs a committed batch: the merge must
        read the already-advanced snapshot and publish a fresh version
        with identical content — never overwrite the directory it is
        reading (the failure mode of batch-id-named versions)."""
        from waterdata_spark.streaming.cdc import apply_cdc_batch, init_table, read_table

        init_table(
            spark.createDataFrame([(1, "a", 10.0)], "id long, name string, val double"),
            str(tmp_path / "t"),
        )
        batch = spark.createDataFrame(
            [(1, "a2", 11.0, "update", 1), (2, "b", 20.0, "insert", 1)],
            "id long, name string, val double, op string, seq long",
        )
        v1 = apply_cdc_batch(batch, str(tmp_path / "t"), ["id"])
        first = _rows(read_table(spark, str(tmp_path / "t")))
        v2 = apply_cdc_batch(batch, str(tmp_path / "t"), ["id"])  # replay
        second = _rows(read_table(spark, str(tmp_path / "t")))
        assert (v1, v2) == ("v1", "v2")
        assert first == second == {(1, "a2", 11.0), (2, "b", 20.0)}
