"""Dataset snapshot diff (operators/diff.py)."""

from __future__ import annotations

import pytest

from waterdata_spark.operators.diff import dataset_diff


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", None),
            (4, None, 40.0),
        ],
        "id int, txt string, val double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),      # unchanged
            (2, "b2", 20.0),     # changed (txt)
            (3, "c", 3.0),       # changed (val null -> 3.0)
            (5, "e", 50.0),      # added; 4 removed
        ],
        "id int, txt string, val double",
    )
    return old, new


class TestDatasetDiff:
    def test_statuses(self, snaps):
        old, new = snaps
        got = {r["id"]: r["status"] for r in dataset_diff(old, new, "id").collect()}
        assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}

    def test_include_unchanged(self, snaps):
        old, new = snaps
        got = {
            r["id"]: r["status"]
            for r in dataset_diff(old, new, "id", include_unchanged=True).collect()
        }
        assert got[1] == "unchanged" and len(got) == 5

    def test_null_vs_literal_null_string_differ(self, spark):
        # a NULL cell and the string 'null' must not collide
        old = spark.createDataFrame([(1, None)], "id int, txt string")
        new = spark.createDataFrame([(1, "null")], "id int, txt string")
        (row,) = dataset_diff(old, new, "id").collect()
        assert row["status"] == "changed"

    def test_compare_cols_subset(self, snaps):
        old, new = snaps
        # comparing only val: id 2's txt change is invisible
        got = {
            r["id"]: r["status"]
            for r in dataset_diff(old, new, "id", compare_cols=["val"]).collect()
        }
        assert 2 not in got and got[3] == "changed"

    def test_separator_boundary_shift_detected(self, spark):
        # ('ab','c') vs ('a','bc') must digest differently
        old = spark.createDataFrame([(1, "ab", "c")], "id int, x string, y string")
        new = spark.createDataFrame([(1, "a", "bc")], "id int, x string, y string")
        (row,) = dataset_diff(old, new, "id").collect()
        assert row["status"] == "changed"

    def test_errors(self, spark, snaps):
        old, new = snaps
        with pytest.raises(ValueError):
            dataset_diff(old.select("id"), new.select("id"), "id")
        with pytest.raises(ValueError):
            dataset_diff(old, new, "id", compare_cols=["nope"])
