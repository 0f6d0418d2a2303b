"""Targeted fixtures for query semantics the sf corpora can't exercise:
q36's empty pivot cell (NULL-measure agreement with ANSI UNPIVOT) and
x06's document-frequency cap (a universal token must not explode the
candidate join). Each test replays the driver's gate — the registered
Spark fn vs the registered DuckDB twin — on a purpose-built corpus.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from waterdata_spark import queries
from waterdata_spark.queries import QUERIES


def _duck(sql: str, **tables: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name, path in tables.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(df.itertuples(index=False, name=None), key=repr)


def test_q36_unpivot_drops_empty_pivot_cell(spark, tmp_path):
    # returnflag 'N' has no 'F' rows → qty_F is an empty cell. Spark's
    # unpivot keeps the NULL measure; the ANSI/DuckDB twin excludes it.
    # The registered query must agree on THIS corpus, not just sf0.01
    # (where every cell happens to be populated).
    pd.DataFrame(
        {
            "l_returnflag": ["A", "A", "N"],
            "l_linestatus": ["O", "F", "O"],
            "l_quantity": [1.0, 2.0, 3.0],
        }
    ).to_parquet(tmp_path / "lineitem.parquet")

    spec = QUERIES["q36_unpivot"]
    got = spec.fn(spark, str(tmp_path)).toPandas()
    want = _duck(spec.sql, lineitem=str(tmp_path / "lineitem.parquet"))
    assert len(got) == 3  # the (N, F) NULL row is dropped
    assert _canon(got) == _canon(want)


@pytest.fixture()
def planted_docs(tmp_path):
    # 10 docs that all share 5 universal tokens; only docs 0 and 1 also
    # share 5 rare ones. Uncapped, every pair clears inter_size >= 5.
    rows = []
    for i in range(10):
        text = "w0 w1 w2 w3 w4"
        if i < 2:
            text += " r0 r1 r2 r3 r4"
        rows.append({"doc_id": i, "lang": "en", "text": text})
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    return tmp_path


def test_x06_df_cap_bounds_candidates(spark, planted_docs, monkeypatch):
    spec = QUERIES["x06_ngram_jaccard_pairs"]

    # Without a meaningful cap the universal tokens pair everything:
    # C(10,2) = 45 candidate pairs all clear the threshold.
    monkeypatch.setattr(queries, "X06_DF_CAP", 10**9)
    assert spec.fn(spark, str(planted_docs)).count() == 45

    # With the cap the universal tokens leave the vocabulary before the
    # self-join — only the genuinely-near-dup pair (0, 1) survives, and
    # Spark still matches the (same-capped) oracle twin exactly.
    monkeypatch.setattr(queries, "X06_DF_CAP", 3)
    assert "> 128" in spec.sql  # keep the twin's literal in sync
    got = spec.fn(spark, str(planted_docs)).toPandas()
    want = _duck(
        spec.sql.replace("> 128", "> 3"),
        documents=str(planted_docs / "documents.parquet"),
    )
    assert len(got) == 1
    assert _canon(got) == _canon(want)
    row = got.iloc[0]
    assert (row.doc_a, row.doc_b, row.inter_size, row.union_size) == (0, 1, 5, 5)
