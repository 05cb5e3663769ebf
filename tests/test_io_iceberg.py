"""Iceberg branch of the storage abstraction (SURVEY.md §4.4/§4.5).

No Iceberg runtime jars exist in the sandbox, so the catalog is mocked at
the SparkSession seam: table_complete's iceberg path only touches
``spark.catalog.tableExists`` and ``spark.sql(...).collect()``, which is
exactly what these stubs provide. The real-jar behavior (snapshot summary
properties, .snapshots/.history metadata tables) is public Iceberg
semantics; what this test pins is OUR protocol — write stamps
snapshot-property.run_id, resume trusts only the current snapshot's stamp.
"""

from __future__ import annotations

import pytest

from ner_spark import io as nio


class _Rows:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class _Row(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k)


class _Catalog:
    def __init__(self, tables):
        self._tables = tables

    def tableExists(self, name):
        return name in self._tables


class _FakeSpark:
    """Stub of the two SparkSession members the iceberg branch uses."""

    def __init__(self, tables: dict[str, str | None]):
        # table name -> run_id in the CURRENT snapshot summary (None = no stamp)
        self._tables = tables
        self.catalog = _Catalog(tables)
        self.queries: list[str] = []

    def sql(self, q):
        self.queries.append(q)
        name = q.split("FROM ")[1].split(".snapshots")[0]
        rid = self._tables[name]
        return _Rows([_Row({"run_id": rid})])


def test_missing_table_is_incomplete():
    sp = _FakeSpark({})
    assert nio.table_complete("cat.db.t", "r1", fmt="iceberg", spark=sp) is False
    assert sp.queries == []  # short-circuits before any metadata query


def test_existing_table_without_run_id_check():
    sp = _FakeSpark({"cat.db.t": None})
    assert nio.table_complete("cat.db.t", None, fmt="iceberg", spark=sp) is True


def test_run_id_match_and_mismatch():
    sp = _FakeSpark({"cat.db.t": "rA"})
    assert nio.table_complete("cat.db.t", "rA", fmt="iceberg", spark=sp) is True
    assert nio.table_complete("cat.db.t", "rB", fmt="iceberg", spark=sp) is False
    # stale table with NO stamp must not satisfy a run_id check
    sp2 = _FakeSpark({"cat.db.t": None})
    assert nio.table_complete("cat.db.t", "rA", fmt="iceberg", spark=sp2) is False


def test_iceberg_requires_spark():
    with pytest.raises(ValueError):
        nio.table_complete("cat.db.t", "rA", fmt="iceberg")


def test_write_table_stamps_run_id():
    """The writeTo chain must carry snapshot-property.run_id so
    table_complete can find it later."""

    class _Writer:
        def __init__(self):
            self.opts = {}
            self.created = False

        def option(self, k, v):
            self.opts[k] = v
            return self

        def partitionedBy(self, *cols):
            self.parts = cols
            return self

        def createOrReplace(self):
            self.created = True

    class _DF:
        def __init__(self):
            self.w = _Writer()

        def writeTo(self, name):
            self.name = name
            return self.w

    df = _DF()
    nio.write_table(df, "cat.db.t", fmt="iceberg", partition_by=["b"], run_id="rZ")
    assert df.w.created
    assert df.w.opts["snapshot-property.run_id"] == "rZ"
    assert df.w.parts == ("b",)


def test_compact_parquet_dir_merges_small_files(spark, tmp_path):
    from ner_spark import io as nio

    src = str(tmp_path / "small_files")
    # 32 tiny files — the post-streaming-sink shape compaction targets
    spark.range(0, 10_000).selectExpr(
        "id", "id % 7 AS k", "CAST(id AS DOUBLE) / 3 AS v"
    ).repartition(32).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 32
    out = str(tmp_path / "compacted")
    n_out = nio.compact_parquet_dir(spark, src, out, target_file_bytes=1 << 30)
    assert n_out == 1
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    # row-identical content
    a = spark.read.parquet(src).toPandas().sort_values("id").reset_index(drop=True)
    b = spark.read.parquet(out).toPandas().sort_values("id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    # coalesce is a narrow rewrite: the plan must contain no Exchange
    plan = (
        spark.read.parquet(src)
        .coalesce(4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


class TestMergeUpsert:
    """Parquet branch of io.merge_upsert: MERGE semantics on disk."""

    def _seed(self, spark, path):
        spark.createDataFrame(
            [(1, 10.0, "O"), (2, 20.0, "O"), (3, 30.0, "F")],
            "k long, price double, status string",
        ).write.parquet(path)

    def test_matched_updated_unmatched_inserted(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._seed(spark, path)
        delta = spark.createDataFrame(
            [(2, 99.0, "U"), (4, 40.0, "N")],
            "k long, price double, status string",
        )
        nio.merge_upsert(spark, path, delta, "k", fmt="parquet", run_id="r1")
        rows = {
            r["k"]: (r["price"], r["status"])
            for r in spark.read.parquet(path).collect()
        }
        assert rows == {
            1: (10.0, "O"),   # untouched base row survives
            2: (99.0, "U"),   # matched -> updated, exactly once
            3: (30.0, "F"),
            4: (40.0, "N"),   # not matched -> inserted
        }
        assert nio.table_complete(path, run_id="r1", fmt="parquet")

    def test_reapply_is_idempotent(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._seed(spark, path)
        delta = spark.createDataFrame(
            [(2, 99.0, "U")], "k long, price double, status string"
        )
        nio.merge_upsert(spark, path, delta, "k", fmt="parquet")
        nio.merge_upsert(spark, path, delta, "k", fmt="parquet")
        df = spark.read.parquet(path)
        assert df.count() == 3  # same delta twice -> no duplicate keys
        assert df.where("k = 2").collect()[0]["price"] == 99.0

    def test_iceberg_branch_issues_merge_sql(self, tmp_path):
        captured = {}

        class _Delta:
            columns = ["k", "price"]

            def createOrReplaceTempView(self, name):
                captured["view"] = name

        class _Spark:
            def sql(self, q):
                captured["sql"] = q
                return _Rows([])

        nio.merge_upsert(_Spark(), "wh.orders", _Delta(), "k", fmt="iceberg")
        assert captured["view"] == "__merge_delta"
        assert "MERGE INTO wh.orders t" in captured["sql"]
        assert "WHEN MATCHED THEN UPDATE SET t.price = s.price" in captured["sql"]
        assert "WHEN NOT MATCHED THEN INSERT (k, price)" in captured["sql"]


class TestMergeStrategy:
    def test_mor_strategy_on_iceberg_local(self, spark, tmp_path):
        """strategy='mor' through the io facade: same logical result as
        copy-on-write, but committed as a merge-on-read delete snapshot
        (no base data file rewritten)."""
        from ner_spark.iceberg.spark_io import read_iceberg, write_iceberg
        from ner_spark.iceberg.table import IcebergLocalTable

        base = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, price double"
        )
        delta = spark.createDataFrame(
            [(2, 99.0), (4, 40.0)], "k long, price double"
        )
        locs = {}
        for strat in ("cow", "mor"):
            loc = str(tmp_path / strat)
            write_iceberg(base, loc)
            data_files = {f.path for f in IcebergLocalTable(loc).scan()}
            nio.merge_upsert(
                spark, loc, delta, "k", fmt="iceberg-local", strategy=strat
            )
            locs[strat] = sorted(
                (r["k"], r["price"])
                for r in read_iceberg(spark, loc).collect()
            )
            op = IcebergLocalTable(loc).current_snapshot()["summary"][
                "operation"
            ]
            if strat == "mor":
                assert op == "delete"
                # MOR promise: base data files untouched
                assert data_files <= {
                    f.path for f in IcebergLocalTable(loc).scan()
                }
            else:
                assert op == "overwrite"
        assert locs["cow"] == locs["mor"] == [
            (1, 10.0), (2, 99.0), (3, 30.0), (4, 40.0)
        ]

    def test_mor_strategy_rejected_off_iceberg_local(self, spark, tmp_path):
        delta = spark.createDataFrame([(1, 1.0)], "k long, price double")
        with pytest.raises(ValueError, match="iceberg-local"):
            nio.merge_upsert(
                spark, str(tmp_path / "x"), delta, "k",
                fmt="parquet", strategy="mor",
            )
        with pytest.raises(ValueError, match="bogus"):
            nio.merge_upsert(
                spark, str(tmp_path / "x"), delta, "k",
                fmt="iceberg-local", strategy="bogus",
            )
