"""CQLTester-style semantic tests (SURVEY §5 — mirror of
test/unit/org/apache/cassandra/cql3/CQLTester.java's
createTable + execute + assertRows golden-row pattern, on crafted fixtures).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_pmem_spark.catalog import ClusteringColumn, TableMeta
from cassandra_pmem_spark.cql.table import CqlTable
from cassandra_pmem_spark.cql.validator import (
    InvalidRequest,
    Op,
    Restriction,
    validate_distinct,
    validate_group_by,
    validate_limits,
    validate_order_by,
    validate_restrictions,
)
from cassandra_pmem_spark.operators.aggregates import cql_avg, cql_sum
from cassandra_pmem_spark.operators.upsert import (
    apply_range_tombstones,
    apply_row_tombstones,
    filter_expired,
    upsert_lww_cells,
    upsert_lww_rows,
)

META = TableMeta(
    "t",
    T.StructType(
        [
            T.StructField("pk", T.LongType()),
            T.StructField("ck1", T.LongType()),
            T.StructField("ck2", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    ),
    partition_key=("pk",),
    clustering=(ClusteringColumn("ck1"), ClusteringColumn("ck2", ascending=False)),
)


def rows(df, *cols):
    out = [tuple(r) for r in (df.select(*cols) if cols else df).collect()]
    return sorted(out)


# ---- strict validator (StatementRestrictions / SelectStatement gates) -------


class TestStrictValidator:
    def test_regular_column_filter_requires_allow_filtering(self):
        with pytest.raises(InvalidRequest, match="ALLOW FILTERING"):
            validate_restrictions(META, [Restriction("val", Op.EQ)])

    def test_allow_filtering_lifts_gate(self):
        validate_restrictions(META, [Restriction("val", Op.EQ)], allow_filtering=True)

    def test_partial_partition_key_rejected(self):
        meta2 = TableMeta(
            "t2",
            META.schema,
            partition_key=("pk", "ck1"),
        )
        with pytest.raises(InvalidRequest, match="Partition key"):
            validate_restrictions(meta2, [Restriction("pk", Op.EQ)])

    def test_pk_slice_rejected(self):
        with pytest.raises(InvalidRequest, match="Partition key"):
            validate_restrictions(META, [Restriction("pk", Op.GT)])

    def test_clustering_skip_rejected(self):
        # ck2 restricted without ck1 — SelectStatement slice gate
        with pytest.raises(InvalidRequest, match="ALLOW FILTERING"):
            validate_restrictions(
                META, [Restriction("pk", Op.EQ), Restriction("ck2", Op.EQ)]
            )

    def test_clustering_after_slice_rejected(self):
        with pytest.raises(InvalidRequest, match="after a slice"):
            validate_restrictions(
                META,
                [
                    Restriction("pk", Op.EQ),
                    Restriction("ck1", Op.GT),
                    Restriction("ck2", Op.EQ),
                ],
            )

    def test_point_then_slice_ok(self):
        validate_restrictions(
            META,
            [Restriction("pk", Op.EQ), Restriction("ck1", Op.EQ), Restriction("ck2", Op.LT)],
        )

    def test_order_by_requires_pk_restriction(self):
        with pytest.raises(InvalidRequest, match="partition key is restricted"):
            validate_order_by(META, [("ck1", True)], pk_is_restricted=False)

    def test_order_by_non_prefix_rejected(self):
        with pytest.raises(InvalidRequest, match="prefix"):
            validate_order_by(META, [("ck2", True)], pk_is_restricted=True)

    def test_order_by_mixed_direction_rejected(self):
        # declared order is (ck1 ASC, ck2 DESC); (ASC, ASC) is neither
        # identical nor fully reversed
        with pytest.raises(InvalidRequest, match="reverse"):
            validate_order_by(META, [("ck1", True), ("ck2", True)], pk_is_restricted=True)

    def test_order_by_fully_reversed_ok(self):
        validate_order_by(META, [("ck1", False), ("ck2", True)], pk_is_restricted=True)

    def test_group_by_non_prefix_rejected(self):
        with pytest.raises(InvalidRequest, match="prefix"):
            validate_group_by(META, ["ck1"])
        validate_group_by(META, ["pk", "ck1"])

    def test_distinct_regular_rejected(self):
        with pytest.raises(InvalidRequest, match="DISTINCT"):
            validate_distinct(META, ["val"])
        validate_distinct(META, ["pk"])

    def test_order_by_regular_column_rejected(self):
        # SelectOrderByTest.java:656 "Order by is currently only supported
        # on the clustered columns of the PRIMARY KEY"
        with pytest.raises(InvalidRequest, match="prefix"):
            validate_order_by(META, [("val", True)], pk_is_restricted=True)

    def test_group_by_partial_partition_key_rejected(self):
        # SelectGroupByTest.java:489 "Group by is not supported on only a
        # part of the partition key"
        meta2 = TableMeta(
            "t2",
            T.StructType(
                [
                    T.StructField("p1", T.LongType()),
                    T.StructField("p2", T.LongType()),
                    T.StructField("v", T.LongType()),
                ]
            ),
            partition_key=("p1", "p2"),
        )
        with pytest.raises(InvalidRequest, match="part of the partition key"):
            validate_group_by(meta2, ["p1"])
        validate_group_by(meta2, ["p1", "p2"])

    def test_limit_must_be_positive(self):
        # SelectLimitTest.java:75 "LIMIT must be strictly positive"
        with pytest.raises(InvalidRequest, match="LIMIT must be strictly positive"):
            validate_limits(0, None)
        with pytest.raises(InvalidRequest, match="PER PARTITION LIMIT must be strictly positive"):
            validate_limits(None, -1)
        validate_limits(10, 3)

    def test_per_partition_limit_with_distinct_rejected(self):
        # SelectLimitTest.java:150
        with pytest.raises(InvalidRequest, match="SELECT DISTINCT"):
            validate_limits(None, 2, distinct=True)

    def test_per_partition_limit_with_aggregates_rejected(self):
        # SelectLimitTest.java:154
        with pytest.raises(InvalidRequest, match="aggregate"):
            validate_limits(None, 2, has_aggregates=True)


class TestParsedRejections:
    """End-to-end rejections through the text surface (CQLTester
    assertInvalid style — parse + prepare must throw, not execute)."""

    def _invalid(self, spark, cql, match):
        from cassandra_pmem_spark.cql.parser import execute_cql
        from tests.conftest import SF_SMALL

        with pytest.raises(InvalidRequest, match=match):
            execute_cql(spark, cql, SF_SMALL)

    def test_order_by_mixed_direction(self, spark):
        # events clustering is (ts ASC, event_id ASC)
        self._invalid(
            spark,
            "SELECT * FROM events WHERE user_id = 1 ORDER BY ts ASC, event_id DESC",
            "reverse",
        )

    def test_order_by_without_pk_restriction(self, spark):
        self._invalid(spark, "SELECT * FROM events ORDER BY ts", "partition key")

    def test_group_by_non_prefix(self, spark):
        self._invalid(
            spark,
            "SELECT count(*) FROM events GROUP BY event_type",
            "prefix|part of the partition",
        )

    def test_zero_limit(self, spark):
        self._invalid(
            spark,
            "SELECT * FROM events WHERE user_id = 1 LIMIT 0",
            "strictly positive",
        )

    def test_per_partition_limit_with_distinct(self, spark):
        self._invalid(
            spark,
            "SELECT DISTINCT user_id FROM events PER PARTITION LIMIT 2",
            "SELECT DISTINCT",
        )

    def test_per_partition_limit_with_aggregate(self, spark):
        self._invalid(
            spark,
            "SELECT count(*) FROM events PER PARTITION LIMIT 2",
            "aggregate",
        )


# ---- CqlTable end-to-end on a crafted fixture -------------------------------


@pytest.fixture(scope="module")
def fixture_df(spark):
    data = [
        (1, 1, 10, "a"),
        (1, 1, 20, "b"),
        (1, 2, 30, "c"),
        (2, 1, 10, "d"),
        (2, 5, 50, "e"),
    ]
    return spark.createDataFrame(data, META.schema)


class TestCqlTableSemantics:
    def test_point_lookup_with_clustering_order(self, fixture_df):
        t = CqlTable(fixture_df, META, strict=True)
        out = (
            t.where("pk", Op.EQ, 1)
            .order_by(("ck1", True), ("ck2", False))
            .select("ck1", "ck2", "val")
            .df()
            .collect()
        )
        # clustering order: ck1 ASC, ck2 DESC
        assert [tuple(r) for r in out] == [(1, 20, "b"), (1, 10, "a"), (2, 30, "c")]

    def test_per_partition_limit_respects_desc_clustering(self, fixture_df):
        t = CqlTable(fixture_df, META)
        out = rows(t.per_partition_limit(1).select("pk", "ck1", "ck2").df())
        # first row per pk in (ck1 ASC, ck2 DESC) order
        assert out == [(1, 1, 20), (2, 1, 10)]

    def test_strict_filter_without_allow_filtering_raises(self, fixture_df):
        t = CqlTable(fixture_df, META, strict=True)
        with pytest.raises(InvalidRequest):
            t.where("val", Op.EQ, "a").df()
        # same query with allow_filtering passes
        assert t.where("val", Op.EQ, "a").allow_filtering().df().count() == 1

    def test_tuple_relation_matches_python_lexicographic(self, fixture_df, spark):
        t = CqlTable(fixture_df, META)
        got = rows(t.where_tuple(("ck1", "ck2"), Op.GT, (1, 10)).select("pk", "ck1", "ck2").df())
        data = [(1, 1, 10), (1, 1, 20), (1, 2, 30), (2, 1, 10), (2, 5, 50)]
        want = sorted((pk, a, b) for pk, a, b in data if (a, b) > (1, 10))
        assert got == want


# ---- write-path emulation (InsertTest/UpdateTest/DeleteTest/TTLTest) --------


class TestUpsertSemantics:
    SCHEMA = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("a", T.StringType()),
            T.StructField("b", T.StringType()),
            T.StructField("writetime", T.LongType()),
        ]
    )

    def test_row_lww_keeps_newest_full_row(self, spark):
        log = spark.createDataFrame(
            [(1, "a1", "b1", 10), (1, "a2", "b2", 20), (2, "x", "y", 5)], self.SCHEMA
        )
        out = rows(upsert_lww_rows(log, key=["k"]), "k", "a", "b", "writetime")
        assert out == [(1, "a2", "b2", 20), (2, "x", "y", 5)]

    def test_cell_lww_merges_disjoint_column_writes(self, spark):
        # write 1: both cells at t=10; write 2: only column a at t=20.
        # Row-level LWW would wrongly resurrect b=NULL; cell-level keeps b1@10.
        log = spark.createDataFrame(
            [(1, "a1", "b1", 10), (1, "a2", None, 20)], self.SCHEMA
        )
        out = upsert_lww_cells(log, key=["k"], value_cols=["a", "b"]).collect()[0]
        assert (out["a"], out["_writetime_a"]) == ("a2", 20)
        assert (out["b"], out["_writetime_b"]) == ("b1", 10)

    def test_row_tombstone_shadows_by_writetime(self, spark):
        data = spark.createDataFrame(
            [(1, "old", "x", 10), (2, "keep", "y", 30)], self.SCHEMA
        )
        tombs = spark.createDataFrame(
            [(1, 15), (2, 20)],
            T.StructType(
                [T.StructField("k", T.LongType()), T.StructField("writetime", T.LongType())]
            ),
        )
        out = rows(apply_row_tombstones(data, tombs, key=["k"]), "k", "a")
        # k=1 deleted (10 <= 15); k=2 survives (30 > 20)
        assert out == [(2, "keep")]

    def test_range_tombstone_deletes_clustering_range(self, spark):
        schema = T.StructType(
            [
                T.StructField("pk", T.LongType()),
                T.StructField("ck", T.LongType()),
                T.StructField("v", T.StringType()),
                T.StructField("writetime", T.LongType()),
            ]
        )
        data = spark.createDataFrame(
            [(1, 5, "in", 10), (1, 15, "out", 10), (1, 7, "newer", 99), (2, 5, "otherpk", 10)],
            schema,
        )
        rts = spark.createDataFrame(
            [(1, 0, 10, 50)],
            T.StructType(
                [
                    T.StructField("pk", T.LongType()),
                    T.StructField("ck_lo", T.LongType()),
                    T.StructField("ck_hi", T.LongType()),
                    T.StructField("writetime", T.LongType()),
                ]
            ),
        )
        out = rows(
            apply_range_tombstones(data, rts, partition_key=["pk"], clustering_col="ck"),
            "pk",
            "ck",
            "v",
        )
        # (1,5) deleted in-range; (1,15) out of range; (1,7) newer than
        # tombstone survives; (2,5) other partition survives
        assert out == [(1, 7, "newer"), (1, 15, "out"), (2, 5, "otherpk")]

    def test_ttl_expiry_boundary(self, spark):
        schema = T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("expiry_ts", T.TimestampType())]
        )
        import datetime

        dt = datetime.datetime
        data = spark.createDataFrame(
            [
                (1, dt(2024, 1, 1, 0, 0, 0)),   # exactly now → expired (> is strict)
                (2, dt(2024, 1, 1, 0, 0, 1)),   # 1s later → live
                (3, None),                       # no TTL → live forever
            ],
            schema,
        )
        out = rows(filter_expired(data, now="2024-01-01 00:00:00"), "k")
        assert out == [(2,), (3,)]


# ---- collection operators (CollectionsTest.java patterns) -------------------


class TestCollectionOps:
    @pytest.fixture(scope="class")
    def cdf(self, spark):
        schema = T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("l", T.ArrayType(T.StringType())),
                T.StructField("s", T.ArrayType(T.StringType())),
                T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
            ]
        )
        return spark.createDataFrame(
            [(1, ["a", "b", "a"], ["z", "a"], {"k1": 1, "k2": 2, "k3": 3})], schema
        )

    def test_list_ops(self, cdf):
        from cassandra_pmem_spark.operators.collections import (
            element_at_index,
            list_append,
            list_discard,
            list_prepend,
            list_set_index,
        )

        row = cdf.select(
            list_append("l", F.array(F.lit("c"))).alias("ap"),
            list_prepend(F.array(F.lit("x")), "l").alias("pre"),
            list_discard("l", "a").alias("dis"),
            list_set_index("l", 1, "B").alias("setidx"),
            element_at_index("l", 0).alias("first"),
        ).collect()[0]
        assert row["ap"] == ["a", "b", "a", "c"]        # Lists.Appender
        assert row["pre"] == ["x", "a", "b", "a"]       # Lists.Prepender
        assert row["dis"] == ["b"]                      # Lists.Discarder removes all
        assert row["setidx"] == ["a", "B", "a"]         # Lists.SetterByIndex (0-based)
        assert row["first"] == "a"                      # l[0] — CQL 0-indexed

    def test_set_ops_keep_sorted_unique(self, cdf):
        from cassandra_pmem_spark.operators.collections import (
            normalize_set,
            set_add,
            set_discard,
        )

        row = cdf.select(
            set_add("s", F.array(F.lit("m"), F.lit("a"))).alias("added"),
            set_discard(normalize_set("s"), "z").alias("rm"),
        ).collect()[0]
        assert row["added"] == ["a", "m", "z"]  # sorted + unique invariant
        assert row["rm"] == ["a"]

    def test_map_ops(self, cdf):
        from cassandra_pmem_spark.operators.collections import (
            map_contains_key,
            map_contains_value,
            map_remove_key,
            map_slice,
            map_value,
            sorted_entries,
        )

        row = cdf.select(
            map_value("m", "k2").alias("v"),
            map_slice("m", "k1", "k2").alias("sl"),
            map_remove_key("m", "k1").alias("rm"),
            map_contains_key("m", "k3").alias("hask"),
            map_contains_value("m", 3).alias("hasv"),
            F.transform(sorted_entries("m"), lambda e: e["key"]).alias("keys_sorted"),
        ).collect()[0]
        assert row["v"] == 2                                  # m['k2']
        assert dict(row["sl"]) == {"k1": 1, "k2": 2}          # m[k1..k2] slice
        assert dict(row["rm"]) == {"k2": 2, "k3": 3}
        assert row["hask"] and row["hasv"]
        assert row["keys_sorted"] == ["k1", "k2", "k3"]       # key-sorted iteration


# ---- duration type (cql3/Duration.java) -------------------------------------


class TestDuration:
    def test_parse_duration_literal(self):
        from cassandra_pmem_spark.functions.duration import parse_duration

        assert parse_duration("1y2mo3w4d") == (14, 25, 0)
        assert parse_duration("5h6m7s") == (0, 0, (5 * 3600 + 6 * 60 + 7) * 1_000_000)
        assert parse_duration("1500ns") == (0, 0, 1)  # nanos truncate to micros
        with pytest.raises(InvalidRequest):
            parse_duration("not a duration")

    def test_calendar_aware_arithmetic(self, spark):
        from cassandra_pmem_spark.functions.duration import ts_plus_duration

        df = spark.createDataFrame(
            [("2024-01-31 00:00:00",)], ["s"]
        ).select(F.to_timestamp("s").alias("ts"))
        got = df.select(ts_plus_duration("ts", "1mo").alias("t")).collect()[0]["t"]
        assert str(got) == "2024-02-29 00:00:00"  # month-end clamp, leap year

    def test_duration_not_orderable(self, fixture_df):
        from cassandra_pmem_spark.functions.duration import assert_comparable

        with pytest.raises(InvalidRequest, match="no total order"):
            assert_comparable("interval day", "ORDER BY")
        # wired into CqlTable: ordering on an interval column raises
        df = fixture_df.withColumn("dur", F.expr("INTERVAL 1 DAY"))
        meta2 = TableMeta("t3", df.schema, partition_key=("pk",))
        t = CqlTable(df, meta2)
        with pytest.raises(InvalidRequest, match="no total order"):
            t.order_by(("dur", True)).df()


# ---- CQL typed aggregates (AggregateFcts) -----------------------------------


class TestTypedAggregates:
    def test_int_avg_truncates(self, spark):
        df = spark.createDataFrame([(1,), (2,), (2,)], T.StructType([T.StructField("v", T.LongType())]))
        got = df.agg(cql_avg("v", "bigint").alias("a")).collect()[0]["a"]
        assert got == 1  # (1+2+2)/3 = 1.67 → truncates to 1 like CQL/Java int div

    def test_sum_keeps_input_type(self, spark):
        df = spark.createDataFrame([(1,), (2,)], T.StructType([T.StructField("v", T.LongType())]))
        field = df.agg(cql_sum("v", "int").alias("s")).schema["s"]
        assert field.dataType.simpleString() == "int"


class TestTemporalOperators:
    def test_asof_semantics(self, spark):
        """Inclusive boundary, latest-wins, NULL before first right row."""
        import datetime as dt

        import pandas as pd

        from cassandra_pmem_spark.operators.temporal import asof_join

        t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
        left = spark.createDataFrame(
            pd.DataFrame(
                {"pid": [1, 2, 3, 4], "k": [1, 1, 1, 2],
                 "ts": [t(0), t(10), t(20), t(5)]}
            )
        )
        right = spark.createDataFrame(
            pd.DataFrame(
                {"k": [1, 1], "rts": [t(10), t(15)], "v": [100, 200]}
            )
        )
        got = {
            r["pid"]: (r["asof_rts"], r["asof_v"])
            for r in asof_join(
                left, right, key="k", left_ts="ts", right_ts="rts",
                value_cols=["v"],
            ).collect()
        }
        assert got[1] == (None, None)  # before any right row
        assert got[2] == (t(10), 100)  # exact-timestamp row IS visible
        assert got[3] == (t(15), 200)  # latest wins
        assert got[4] == (None, None)  # other key sees nothing

    def test_asof_forward_semantics(self, spark):
        """Inclusive boundary, nearest-next wins, NULL after last
        right row — the mirror of the backward contract."""
        import datetime as dt

        import pandas as pd

        from cassandra_pmem_spark.operators.temporal import asof_join

        t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
        left = spark.createDataFrame(
            pd.DataFrame(
                {"pid": [1, 2, 3, 4], "k": [1, 1, 1, 2],
                 "ts": [t(0), t(10), t(20), t(5)]}
            )
        )
        right = spark.createDataFrame(
            pd.DataFrame(
                {"k": [1, 1], "rts": [t(5), t(10)], "v": [50, 100]}
            )
        )
        got = {
            r["pid"]: (r["asof_rts"], r["asof_v"])
            for r in asof_join(
                left, right, key="k", left_ts="ts", right_ts="rts",
                value_cols=["v"], direction="forward",
            ).collect()
        }
        assert got[1] == (t(5), 50)  # nearest next wins
        assert got[2] == (t(10), 100)  # exact-timestamp row IS visible
        assert got[3] == (None, None)  # after the last right row
        assert got[4] == (None, None)  # other key sees nothing

    def test_range_join_boundaries_and_bucket_crossing(self, spark):
        import datetime as dt

        import pandas as pd

        from cassandra_pmem_spark.operators.temporal import range_join

        t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
        # interval [t(595), t(1195)) crosses the 600-second bucket edge
        intervals = spark.createDataFrame(
            pd.DataFrame(
                {"iid": [1], "k": [1], "s": [t(595)], "e": [t(1195)]}
            )
        )
        points = spark.createDataFrame(
            pd.DataFrame(
                {
                    "pid": [1, 2, 3, 4, 5],
                    "k": [1, 1, 1, 1, 2],
                    "ts": [t(594), t(595), t(700), t(1195), t(700)],
                }
            )
        )
        got = {
            r["pid"]
            for r in range_join(
                points, intervals, key="k", point_ts="ts",
                start_col="s", end_col="e",
            ).collect()
        }
        # start inclusive, end exclusive, key must match, bucket edge ok
        assert got == {2, 3}

    def test_rollup_partials_equal_direct(self, spark):
        from cassandra_pmem_spark.catalog import load_table
        from cassandra_pmem_spark.operators.temporal import rollup_cascade
        from tests.conftest import SF_SMALL

        ev = load_table(spark, "events", SF_SMALL).withColumn(
            "cents", F.floor(F.col("value") * 100).cast("long")
        )
        via_partials = {
            (r["event_type"], r["bucket"]): (r["n"], r["c"])
            for r in rollup_cascade(
                ev, "ts", ["event_type"], {"n": "count", "c": "cents"}
            ).collect()
        }
        direct = {
            (r["event_type"], r["bucket"]): (r["n"], r["c"])
            for r in ev.groupBy(
                "event_type", F.date_trunc("hour", "ts").alias("bucket")
            )
            .agg(F.count("*").alias("n"), F.sum("cents").alias("c"))
            .collect()
        }
        assert via_partials == direct

    def test_gapfill_locf_semantics(self, spark):
        """Grid spans each key's own [first, last] bucket; gaps carry
        the previous value forward and are flagged; keys don't leak."""
        import pandas as pd

        from cassandra_pmem_spark.operators.temporal import gapfill_locf

        sparse = spark.createDataFrame(
            pd.DataFrame(
                {
                    "k": ["a", "a", "a", "b"],
                    "b": [100, 101, 104, 200],
                    "v": [10, 20, 50, 7],
                }
            )
        )
        rows = gapfill_locf(
            sparse, ["k"], "b", ["v"], bucket_seconds=3600
        ).collect()
        got = {
            (r["k"], int(r["bucket"].timestamp()) // 3600): (
                r["v"], r["is_gap"],
            )
            for r in rows
        }
        # key a: dense 100..104 — 102/103 are LOCF'd gaps
        assert got[("a", 100)] == (10, False)
        assert got[("a", 101)] == (20, False)
        assert got[("a", 102)] == (20, True)
        assert got[("a", 103)] == (20, True)
        assert got[("a", 104)] == (50, False)
        # key b: a single observation ⇒ single-row grid, no leakage
        assert got[("b", 200)] == (7, False)
        assert len(got) == 6


class TestOverlapJoin:
    def test_boundary_semantics(self, spark):
        import datetime as dt

        import pandas as pd

        from cassandra_pmem_spark.operators.temporal import (
            interval_overlap_join,
        )

        t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
        left = spark.createDataFrame(
            pd.DataFrame(
                {"lid": [1, 2], "k": [1, 1],
                 "ls": [t(0), t(2000)], "le": [t(600), t(2600)]}
            )
        )
        right = spark.createDataFrame(
            pd.DataFrame(
                {"rid": [10, 11, 12], "k": [1, 1, 1],
                 "rs": [t(600), t(599), t(2599)],
                 "re": [t(1200), t(1199), t(3199)]}
            )
        )
        got = {
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                left, right, "k", "ls", "le", "rs", "re"
            ).collect()
        }
        # half-open: [0,600) and [600,1200) do NOT overlap; one second
        # of overlap does; multi-bucket candidates dedupe to one pair
        assert got == {(1, 11), (2, 12)}

    def test_duplicate_rows_and_degenerate_intervals(self, spark):
        import datetime as dt

        import pandas as pd

        from cassandra_pmem_spark.operators.temporal import (
            interval_overlap_join,
            range_join,
        )

        t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
        # two IDENTICAL left rows spanning many buckets: the first-common-
        # bucket dedup must keep both (a dropDuplicates would collapse
        # them), and each must pair with the right row exactly once
        left = spark.createDataFrame(
            pd.DataFrame(
                {"k": [1, 1, 1], "ls": [t(0), t(0), t(5000)],
                 "le": [t(3000), t(3000), t(4000)]}  # third: end < start
            )
        )
        right = spark.createDataFrame(
            pd.DataFrame({"k": [1], "rs": [t(100)], "re": [t(2900)]})
        )
        got = interval_overlap_join(
            left, right, "k", "ls", "le", "rs", "re"
        ).collect()
        assert len(got) == 2  # both duplicates survive, once each
        # the degenerate interval [5000, 4000) matched nothing and did
        # not explode (sequence would count DOWN for end < start)
        pts = spark.createDataFrame(
            pd.DataFrame({"k": [1], "ts": [t(4500)]})
        )
        ivl = spark.createDataFrame(
            pd.DataFrame({"k": [1], "s": [t(5000)], "e": [t(4000)]})
        )
        assert range_join(pts, ivl, "k", "ts", "s", "e").count() == 0


class TestCollectionCellLiveness:
    """Per-cell liveness on multi-cell collections (db/rows/Cell.java,
    Cells.reconcile, db/LivenessInfo.java): each map cell carries its own
    writetime + expiry, reconciled and expired independently."""

    def _merge(self, spark, rows, **kw):
        from cassandra_pmem_spark.operators.collections import merge_collection_cells

        df = spark.createDataFrame(
            rows, "pk long, ck string, v long, writetime long, expiry_ts timestamp"
        )
        out = merge_collection_cells(
            df, key=["pk"], expiry_col="expiry_ts", now="2024-01-10 00:00:00", **kw
        )
        return {(r.pk, r.ck): (r.v, r.writetime) for r in out.collect()}

    def test_per_cell_lww_and_tombstone(self, spark):
        rows = [
            (1, "a", 10, 100, None),
            (1, "a", 20, 200, None),   # newer write to the same cell wins
            (1, "b", 30, 100, None),
            (1, "b", None, 200, None), # newer cell tombstone deletes only b
            (1, "c", None, 100, None),
            (1, "c", 40, 200, None),   # write newer than tombstone survives
        ]
        got = self._merge(spark, rows)
        assert got == {(1, "a"): (20, 200), (1, "c"): (40, 200)}

    def test_timestamp_tie_prefers_tombstone(self, spark):
        # Cells.reconcile: equal timestamps -> tombstone wins; both live ->
        # greater value wins
        rows = [
            (1, "a", 10, 100, None),
            (1, "a", None, 100, None),
            (1, "b", 7, 100, None),
            (1, "b", 9, 100, None),
        ]
        got = self._merge(spark, rows)
        assert got == {(1, "b"): (9, 100)}

    def test_per_cell_ttl_expiry(self, spark):
        import datetime

        exp_past = datetime.datetime(2024, 1, 5)
        exp_future = datetime.datetime(2024, 1, 20)
        rows = [
            (1, "a", 10, 100, exp_past),    # expired at now=Jan 10
            (1, "b", 20, 100, exp_future),  # sibling cell survives
            (1, "c", 30, 100, None),        # no TTL
        ]
        got = self._merge(spark, rows)
        assert got == {(1, "b"): (20, 100), (1, "c"): (30, 100)}


class TestEmptyAggregateZero:
    """CQL sum/avg return typed 0 for empty (or all-null) input, not null
    (AggregateFcts.java — every numeric fold starts from a zero state);
    count already returns 0; min/max stay null (r10 ADVICE fix)."""

    def test_sum_avg_empty_and_all_null(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE agg0 WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE agg0")
        db.execute("CREATE TABLE t (k int PRIMARY KEY, n int, d double)")
        r = db.execute("SELECT sum(n) AS s, avg(n) AS a, avg(d) AS ad, "
                       "count(n) AS c, min(n) AS mn FROM t").collect()[0]
        assert (r.s, r.a, r.ad, r.c, r.mn) == (0, 0, 0.0, 0, None)
        # int avg keeps the integral fold's dtype (no double widening)
        assert isinstance(r.a, int) and isinstance(r.ad, float)
        db.execute("INSERT INTO t (k) VALUES (1)")  # all-null value columns
        r = db.execute("SELECT sum(n) AS s, avg(n) AS a FROM t").collect()[0]
        assert (r.s, r.a) == (0, 0)
