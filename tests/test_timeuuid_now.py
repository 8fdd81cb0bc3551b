"""Round-10 timeuuid fidelity: now()-family write terms folded from the
session's coordinator clock (TimeFcts.java:39-57, UuidFcts.java:29 —
the reference executes them coordinator-side at statement execution),
v1-embedded-timestamp semantics for declared timeuuid columns
(UUIDGen.java:52,68-69,198,209,353; TimeUUIDType timestamp-first
ordering), and the reference's fake extreme uuids for min/maxTimeuuid
in write positions."""

from __future__ import annotations

import uuid as _uuid

import pytest

from cassandra_pmem_spark.cql.terms import (
    MAX_CLOCK_SEQ_AND_NODE,
    MIN_CLOCK_SEQ_AND_NODE,
    SessionClockFold,
    ticks_from_unix_ms,
    ticks_of_uuid_text,
    unix_ms_from_ticks,
    v1_uuid_text,
)
from cassandra_pmem_spark.cql.validator import InvalidRequest


def _db(spark, ks):
    from cassandra_pmem_spark.cql.ddl import CqlDatabase

    db = CqlDatabase(spark)
    db.execute(f"CREATE KEYSPACE {ks} WITH REPLICATION = {{'class': 'SimpleStrategy'}}")
    db.execute(f"USE {ks}")
    return db


class TestV1UuidArithmetic:
    def test_text_ticks_roundtrip(self):
        for ms in (0, 1, 1704067200123, 4102444800000):
            for sub in (0, 1, 9999):
                ticks = ticks_from_unix_ms(ms, sub)
                u = v1_uuid_text(ticks, MIN_CLOCK_SEQ_AND_NODE)
                assert ticks_of_uuid_text(u) == ticks
                assert unix_ms_from_ticks(ticks) == ms
                # well-formed v1: version nibble is '1'
                assert u[14] == "1"
                assert _uuid.UUID(u).version == 1

    def test_extreme_layout_matches_uuidgen(self):
        # UUIDGen.minTimeUUID(ts): createTime(fromUnixTimestamp(ts)) with
        # MIN_CLOCK_SEQ_AND_NODE; maxTimeUUID: fromUnixTimestamp(ts+1)-1
        # with MAX (UUIDGen.java:198-217)
        ms = 1704067200000
        lo = v1_uuid_text(ticks_from_unix_ms(ms), MIN_CLOCK_SEQ_AND_NODE)
        hi = v1_uuid_text(ticks_from_unix_ms(ms + 1) - 1, MAX_CLOCK_SEQ_AND_NODE)
        assert lo.endswith("-8080-808080808080")
        assert hi.endswith("-7f7f-7f7f7f7f7f7f")
        # every real timeuuid in millisecond `ms` sits strictly between
        # the extremes in (ticks, clockSeqAndNode) order
        for sub in (0, 1, 9999):
            real = v1_uuid_text(ticks_from_unix_ms(ms, sub), 0x8000000000000001)
            assert ticks_of_uuid_text(lo) <= ticks_of_uuid_text(real) <= ticks_of_uuid_text(hi)

    def test_session_clock_fold_determinism(self):
        a = SessionClockFold(lambda: 7)
        b = SessionClockFold(lambda: 7)
        for _ in range(3):
            assert a.fold("now") == b.fold("now")
        # distinct occurrences within one statement mint distinct uuids
        c = SessionClockFold(lambda: 7)
        assert c.fold("now") != c.fold("now")
        # uuid() is v4-shaped and deterministic
        d1 = SessionClockFold(lambda: 9).fold("uuid")
        d2 = SessionClockFold(lambda: 9).fold("uuid")
        assert d1 == d2 and _uuid.UUID(d1).version == 4


class TestNowWriteTerms:
    def test_now_statement_sequence_replays_identically(self, spark):
        rows = []
        for ks in ("nrep1", "nrep2"):
            db = _db(spark, ks)
            db.execute("CREATE TABLE t (k int, id timeuuid, PRIMARY KEY (k, id))")
            db.execute("INSERT INTO t (k, id) VALUES (1, now())")
            db.execute("INSERT INTO t (k, id) VALUES (1, now())")
            rows.append(sorted(r.id for r in db.execute("SELECT id FROM t").collect()))
        assert rows[0] == rows[1]
        assert len(rows[0]) == 2 and rows[0][0] != rows[0][1]

    def test_current_family_values(self, spark):
        db = _db(spark, "ncur")
        db.execute(
            "CREATE TABLE t (k int PRIMARY KEY, ts timestamp, d date, tm bigint, u uuid)"
        )
        db.execute(
            "INSERT INTO t (k, ts, d, tm, u) VALUES "
            "(1, currenttimestamp(), currentdate(), currenttime(), uuid())"
        )
        r = db.execute("SELECT ts, d, tm, u FROM t").collect()[0]
        # tick 1 -> EPOCH + 1ms = 2024-01-01T00:00:00.001Z
        assert r.ts.year == 2024 and r.ts.microsecond == 1000
        assert str(r.d) == "2024-01-01"
        assert r.tm == 1_000_000  # nanos since midnight
        assert _uuid.UUID(r.u).version == 4

    def test_multiple_now_in_one_statement_distinct(self, spark):
        db = _db(spark, "nmulti")
        db.execute("CREATE TABLE t (k int PRIMARY KEY, a timeuuid, b timeuuid)")
        db.execute("INSERT INTO t (k, a, b) VALUES (1, now(), now())")
        r = db.execute("SELECT a, b FROM t").collect()[0]
        assert r.a != r.b
        # same millisecond, adjacent 100ns ticks
        assert ticks_of_uuid_text(r.b) == ticks_of_uuid_text(r.a) + 1

    def test_batch_statements_share_the_instant(self, spark):
        db = _db(spark, "nbatch")
        db.execute("CREATE TABLE t (k int PRIMARY KEY, id timeuuid)")
        db.execute(
            "BEGIN BATCH "
            "INSERT INTO t (k, id) VALUES (1, now()); "
            "INSERT INTO t (k, id) VALUES (2, now()); "
            "APPLY BATCH"
        )
        rows = {r.k: r.id for r in db.execute("SELECT k, id FROM t").collect()}
        # one batch tick -> one folded INSTANT (CASSANDRA-14361
        # consistent-batch direction) but DISTINCT uuids: the session-wide
        # occurrence counter advances per fold across statements sharing a
        # tick — identical uuids would let LWW silently absorb the second
        # write (the reference always mints distinct now() values)
        assert rows[1] != rows[2]
        assert ticks_of_uuid_text(rows[2]) == ticks_of_uuid_text(rows[1]) + 1
        assert unix_ms_from_ticks(
            ticks_of_uuid_text(rows[1])
        ) == unix_ms_from_ticks(ticks_of_uuid_text(rows[2]))

    def test_now_after_using_timestamp_mints_distinct_uuids(self, spark):
        """An explicit USING TIMESTAMP never advances the coordinator
        clock, so consecutive statements can fold now() at the SAME peeked
        tick — the occurrence counter must keep the minted uuids distinct
        or LWW silently absorbs the second insert (both rows share the
        timeuuid PK)."""
        db = _db(spark, "nusing")
        db.execute("CREATE TABLE t (k int, id timeuuid, v int, PRIMARY KEY (k, id))")
        db.execute("INSERT INTO t (k, id, v) VALUES (1, now(), 0) USING TIMESTAMP 99")
        db.execute("INSERT INTO t (k, id, v) VALUES (1, now(), 1)")
        rows = db.execute("SELECT v FROM t").collect()
        assert sorted(r.v for r in rows) == [0, 1]

    def test_multi_table_batch_accepts_now(self, spark):
        """The multi-table batch dry pass folds now() through a throwaway
        clock exactly like the single-table path (a batch containing
        now() is valid)."""
        db = _db(spark, "nmtb")
        db.execute("CREATE TABLE a (k int PRIMARY KEY, id timeuuid)")
        db.execute("CREATE TABLE b (k int PRIMARY KEY, id timeuuid)")
        db.execute(
            "BEGIN BATCH "
            "INSERT INTO a (k, id) VALUES (1, now()); "
            "INSERT INTO b (k, id) VALUES (1, now()); "
            "APPLY BATCH"
        )
        ua = db.execute("SELECT id FROM a").collect()[0].id
        ub = db.execute("SELECT id FROM b").collect()[0].id
        # one shared batch instant, distinct uuids across tables too
        assert ua != ub
        assert unix_ms_from_ticks(
            ticks_of_uuid_text(ua)
        ) == unix_ms_from_ticks(ticks_of_uuid_text(ub))

    def test_rejected_statement_does_not_consume_the_clock(self, spark):
        db = _db(spark, "nroll")
        db.execute("CREATE TABLE t (k int, id timeuuid, PRIMARY KEY (k, id))")
        db.execute("INSERT INTO t (k, id) VALUES (1, now())")
        with pytest.raises(InvalidRequest):
            db.execute("INSERT INTO t (k, id, nope) VALUES (1, now(), 1)")
        db.execute("INSERT INTO t (k, id) VALUES (1, now())")
        ids = sorted(r.id for r in db.execute("SELECT id FROM t").collect())
        # ticks 1 and 2 — the rejected statement rolled its tick back
        assert [ticks_of_uuid_text(u) % 10000 for u in ids] == [0, 0]
        ms = sorted(unix_ms_from_ticks(ticks_of_uuid_text(u)) for u in ids)
        assert ms[1] - ms[0] == 1

    def test_now_still_rejects_without_a_session(self, spark):
        from cassandra_pmem_spark.cql.parser import execute_cql

        with pytest.raises(InvalidRequest, match="non-deterministic"):
            execute_cql(
                spark,
                "SELECT c_custkey FROM customer WHERE c_custkey = blobAsInt(intAsBlob(1)) AND c_name = now()",
                None,
            )


class TestTimeuuidColumnSemantics:
    def test_write_bound_stores_fake_extreme_uuid(self, spark):
        db = _db(spark, "twrite")
        db.execute("CREATE TABLE t (k int PRIMARY KEY, id timeuuid)")
        db.execute("INSERT INTO t (k, id) VALUES (1, minTimeuuid('2024-05-01 00:00:00'))")
        db.execute("INSERT INTO t (k, id) VALUES (2, maxTimeuuid('2024-05-01 00:00:00'))")
        rows = {r.k: r.id for r in db.execute("SELECT k, id FROM t").collect()}
        assert rows[1].endswith("-8080-808080808080")
        assert rows[2].endswith("-7f7f-7f7f7f7f7f7f")
        lo, hi = ticks_of_uuid_text(rows[1]), ticks_of_uuid_text(rows[2])
        assert hi - lo == 9999  # max = fromUnixTimestamp(ms+1) - 1

    def test_order_by_timeuuid_is_time_order(self, spark):
        db = _db(spark, "torder")
        db.execute("CREATE TABLE t (k int, id timeuuid, v int, PRIMARY KEY (k, id))")
        for i in range(6):
            db.execute(f"INSERT INTO t (k, id, v) VALUES (1, now(), {i})")
        rows = db.execute("SELECT v FROM t WHERE k = 1 ORDER BY id DESC").collect()
        assert [r.v for r in rows] == [5, 4, 3, 2, 1, 0]
        rows = db.execute("SELECT v FROM t PER PARTITION LIMIT 2").collect()
        assert sorted(r.v for r in rows) == [0, 1]

    def test_range_on_timeuuid_literal_compares_embedded_time(self, spark):
        db = _db(spark, "tlit")
        db.execute("CREATE TABLE t (k int, id timeuuid, v int, PRIMARY KEY (k, id))")
        for i in range(4):
            db.execute(f"INSERT INTO t (k, id, v) VALUES (1, now(), {i})")
        pivot = {r.v: r.id for r in db.execute("SELECT v, id FROM t").collect()}[1]
        r = db.execute(f"SELECT v FROM t WHERE k = 1 AND id > '{pivot}'").collect()
        assert sorted(x.v for x in r) == [2, 3]

    def test_delete_range_by_bound_on_timeuuid(self, spark):
        db = _db(spark, "tdel")
        db.execute("CREATE TABLE t (k int, id timeuuid, v int, PRIMARY KEY (k, id))")
        for i in range(4):  # ticks 1..4
            db.execute(f"INSERT INTO t (k, id, v) VALUES (1, now(), {i})")
        db.execute("DELETE FROM t WHERE k = 1 AND id > minTimeuuid('2024-01-01 00:00:00.003')")
        r = sorted(x.v for x in db.execute("SELECT v FROM t").collect())
        assert r == [0, 1]

    def test_lwt_bound_and_literal_conditions(self, spark):
        db = _db(spark, "tlwt")
        db.execute("CREATE TABLE t (k int PRIMARY KEY, id timeuuid, v int)")
        db.execute("INSERT INTO t (k, id, v) VALUES (1, now(), 0)")  # tick 1
        ok = db.execute(
            "UPDATE t SET v = 1 WHERE k = 1 "
            "IF id < maxTimeuuid('2024-01-01 00:00:00.001')"
        )
        assert ok is True
        ok = db.execute(
            "UPDATE t SET v = 2 WHERE k = 1 "
            "IF id > maxTimeuuid('2024-01-01 00:00:00.001')"
        )
        assert ok is False
        cur = db.execute("SELECT id FROM t").collect()[0].id
        later = v1_uuid_text(ticks_of_uuid_text(cur) + 123456, 0x8000000000000002)
        ok = db.execute(f"UPDATE t SET v = 3 WHERE k = 1 IF id < '{later}'")
        assert ok is True
        assert db.execute("SELECT v FROM t").collect()[0].v == 3


class TestTimeFunctionSelectors:
    def test_dateof_and_conversions_over_timeuuid(self, spark):
        db = _db(spark, "tsel")
        db.execute("CREATE TABLE t (k int PRIMARY KEY, id timeuuid)")
        db.execute("INSERT INTO t (k, id) VALUES (1, now())")  # tick 1
        r = db.execute(
            "SELECT dateof(id) AS d, tounixtimestamp(id) AS ms, "
            "totimestamp(id) AS ts, todate(id) AS dt, "
            "unixtimestampof(id) AS ms2 FROM t"
        ).collect()[0]
        assert r.ms == r.ms2 == 1704067200001
        assert r.d == r.ts and r.ts.microsecond == 1000
        assert str(r.dt) == "2024-01-01"

    def test_conversions_over_timestamp_and_date(self, spark):
        db = _db(spark, "tsel2")
        db.execute("CREATE TABLE t (k int PRIMARY KEY, ts timestamp, d date)")
        db.execute(
            "INSERT INTO t (k, ts, d) VALUES "
            "(1, toTimestamp('2024-03-01 12:30:00'), toDate('2024-03-01'))"
        )
        r = db.execute(
            "SELECT tounixtimestamp(ts) AS ms, todate(ts) AS dt, "
            "totimestamp(d) AS midnight FROM t"
        ).collect()[0]
        assert r.ms == 1709296200000
        assert str(r.dt) == "2024-03-01"
        assert r.midnight.hour == 0
        # the deprecated timeuuid-only forms reject other sources
        with pytest.raises(InvalidRequest, match="timeuuid column"):
            db.execute("SELECT dateof(ts) FROM t")
        with pytest.raises(InvalidRequest, match="timeuuid column"):
            db.execute("SELECT unixtimestampof(d) FROM t")


class TestExtremeEquality:
    """Equality/IN against a min/maxTimeuuid extreme on a DECLARED
    timeuuid column compares against the fake extreme uuid — matching a
    row only if one stored it (the reference's behavior: usually empty,
    never an error). Non-timeuuid columns keep the guided rejection."""

    def test_select_eq_and_in_match_stored_extreme(self, spark):
        db = _db(spark, "teq")
        db.execute("CREATE TABLE t (k int, id timeuuid, v int, PRIMARY KEY (k, id))")
        db.execute(
            "INSERT INTO t (k, id, v) VALUES (1, minTimeuuid('2024-05-01 00:00:00'), 7)"
        )
        db.execute("INSERT INTO t (k, id, v) VALUES (1, now(), 8)")
        r = db.execute(
            "SELECT v FROM t WHERE k = 1 AND id = minTimeuuid('2024-05-01 00:00:00')"
        ).collect()
        assert [x.v for x in r] == [7]
        r = db.execute(
            "SELECT v FROM t WHERE k = 1 AND id = maxTimeuuid('2024-05-01 00:00:00')"
        ).collect()
        assert r == []  # empty, not an error
        r = db.execute(
            "SELECT v FROM t WHERE k = 1 AND id IN "
            "(minTimeuuid('2024-05-01 00:00:00'), maxTimeuuid('2020-01-01'))"
        ).collect()
        assert [x.v for x in r] == [7]

    def test_lwt_eq_and_in_against_extremes(self, spark):
        db = _db(spark, "teqlwt")
        db.execute("CREATE TABLE s (k int PRIMARY KEY, id timeuuid)")
        db.execute("INSERT INTO s (k, id) VALUES (1, minTimeuuid('2024-05-01 00:00:00'))")
        assert db.execute(
            "UPDATE s SET id = now() WHERE k = 1 "
            "IF id = minTimeuuid('2024-05-01 00:00:00')"
        ) is True
        assert db.execute(
            "UPDATE s SET id = now() WHERE k = 1 "
            "IF id IN (maxTimeuuid('2024-05-01 00:00:00'))"
        ) is False

    def test_non_timeuuid_columns_still_reject(self, spark):
        db = _db(spark, "teqrej")
        db.execute("CREATE TABLE w (k int PRIMARY KEY, ts timestamp)")
        with pytest.raises(InvalidRequest, match="not declared timeuuid"):
            db.execute(
                "SELECT k FROM w WHERE ts = minTimeuuid('2024-01-01') ALLOW FILTERING"
            )
        with pytest.raises(InvalidRequest, match="range bound"):
            db.execute(
                "SELECT k FROM w WHERE ts IN (minTimeuuid('2024-01-01')) "
                "ALLOW FILTERING"
            )
        db.execute("INSERT INTO w (k, ts) VALUES (1, toTimestamp('2024-01-01 00:00:00'))")
        with pytest.raises(InvalidRequest, match="range bound"):
            db.execute(
                "UPDATE w SET ts = toTimestamp('2025-01-01 00:00:00') WHERE k = 1 "
                "IF ts = minTimeuuid('2024-01-01')"
            )


class TestStoredExtremeBoundaries:
    """Range comparisons stay exact even against a STORED extreme uuid
    (TimeuuidBound.edge_full): the tick-edge translation alone would
    wrongly include the stored min extreme in `> min(t)` / the max in
    `< max(t)` and drop them from `<= min(t)` / `>= max(t)` — the
    reference's TimeUUIDType comparison never does."""

    T = "'2024-05-01 00:00:00'"

    def _tbl(self, spark, ks):
        db = _db(spark, ks)
        db.execute("CREATE TABLE t (k int, id timeuuid, v int, PRIMARY KEY (k, id))")
        db.execute(f"INSERT INTO t (k, id, v) VALUES (1, minTimeuuid({self.T}), 1)")
        db.execute(f"INSERT INTO t (k, id, v) VALUES (1, maxTimeuuid({self.T}), 2)")
        db.execute("INSERT INTO t (k, id, v) VALUES (1, now(), 3)")  # 2024-01-01
        return db

    def _sel(self, db, rel=None):
        q = "SELECT v FROM t WHERE k = 1"
        if rel is not None:
            q += f" AND id {rel}"
        return sorted(x.v for x in db.execute(q).collect())

    def test_select_boundaries(self, spark):
        db = self._tbl(spark, "sxb")
        # strict > min excludes the stored min extreme but keeps the max
        assert self._sel(db, f"> minTimeuuid({self.T})") == [2]
        assert self._sel(db, f">= minTimeuuid({self.T})") == [1, 2]
        # <= min includes exactly the extreme (plus anything earlier)
        assert self._sel(db, f"<= minTimeuuid({self.T})") == [1, 3]
        assert self._sel(db, f"< minTimeuuid({self.T})") == [3]
        # strict < max excludes the stored max extreme but keeps the min
        assert self._sel(db, f"< maxTimeuuid({self.T})") == [1, 3]
        assert self._sel(db, f"<= maxTimeuuid({self.T})") == [1, 2, 3]
        assert self._sel(db, f">= maxTimeuuid({self.T})") == [2]
        assert self._sel(db, f"> maxTimeuuid({self.T})") == []

    def test_delete_slice_boundaries_match_select(self, spark):
        db = self._tbl(spark, "dxb")
        db.execute(f"DELETE FROM t WHERE k = 1 AND id > minTimeuuid({self.T})")
        # only the max extreme (strictly above min) died
        assert self._sel(db) == [1, 3]
        db.execute(f"DELETE FROM t WHERE k = 1 AND id <= minTimeuuid({self.T})")
        # <= min kills the stored min extreme AND the earlier real uuid
        assert self._sel(db) == []

    def test_update_and_delete_address_stored_extremes(self, spark):
        db = self._tbl(spark, "uxb")
        db.execute(f"UPDATE t SET v = 9 WHERE k = 1 AND id = minTimeuuid({self.T})")
        assert self._sel(db, f"= minTimeuuid({self.T})") == [9]
        db.execute(
            f"DELETE FROM t WHERE k = 1 AND id IN (maxTimeuuid({self.T}))"
        )
        assert self._sel(db) == [3, 9]

    def test_update_key_extreme_on_non_timeuuid_rejects(self, spark):
        db = _db(spark, "uxr")
        db.execute("CREATE TABLE w (k int, ts timestamp, v int, PRIMARY KEY (k, ts))")
        with pytest.raises(InvalidRequest, match="range bound"):
            db.execute(
                "UPDATE w SET v = 1 WHERE k = 1 AND ts = minTimeuuid('2024-01-01')"
            )

    def test_lwt_range_fixups_and_timestamp_gate(self, spark):
        db = _db(spark, "lxb")
        db.execute("CREATE TABLE s (k int PRIMARY KEY, id timeuuid)")
        db.execute(f"INSERT INTO s (k, id) VALUES (1, minTimeuuid({self.T}))")
        # the stored cell IS the min extreme: strictly-greater is False,
        # >= is True (the tick-only compare would say True for both)
        assert db.execute(
            f"UPDATE s SET id = now() WHERE k = 1 IF id > minTimeuuid({self.T})"
        ) is False
        assert db.execute(
            f"UPDATE s SET id = now() WHERE k = 1 IF id >= minTimeuuid({self.T})"
        ) is True
        db.execute("CREATE TABLE w (k int PRIMARY KEY, ts timestamp)")
        db.execute("INSERT INTO w (k, ts) VALUES (1, toTimestamp('2024-01-01 00:00:00'))")
        with pytest.raises(InvalidRequest, match="not declared timeuuid"):
            db.execute(
                "UPDATE w SET ts = toTimestamp('2025-01-01 00:00:00') WHERE k = 1 "
                "IF ts < maxTimeuuid('2024-06-01')"
            )


class TestClockFoldUnits:
    def test_currenttime_is_integer_exact(self):
        # 256229 ms-of-day was off by 1000ns through float total_seconds()
        for tick in (1, 256229, 86399999):
            fold = SessionClockFold(lambda: tick)
            ns = fold.fold("currenttime")
            ms_of_day = (SessionClockFold.EPOCH_MS + tick) % 86_400_000
            assert ns == ms_of_day * 1_000_000

    def test_ticks_of_non_hex_uuid_is_invalid_request(self):
        with pytest.raises(InvalidRequest, match="not a uuid"):
            ticks_of_uuid_text("zzzzzzzz-zzzz-zzzz-zzzz-zzzzzzzzzzzz")

    def test_non_hex_uuid_range_literal_rejects_cleanly(self, spark):
        db = _db(spark, "nhx")
        db.execute("CREATE TABLE t (k int, id timeuuid, PRIMARY KEY (k, id))")
        db.execute("INSERT INTO t (k, id) VALUES (1, now())")
        with pytest.raises(InvalidRequest, match="not a uuid"):
            db.execute(
                "SELECT k FROM t WHERE k = 1 AND "
                "id > 'zzzzzzzz-zzzz-zzzz-zzzz-zzzzzzzzzzzz'"
            )


class TestFullRoundReviewRegressions:
    def test_batch_with_explicit_user_timestamp_folds_from_the_clock(self, spark):
        """An explicit BATCH USING TIMESTAMP is an arbitrary user value
        (epoch micros by convention) — it stamps the WRITES but must not
        drive the now()-fold instant (a 1.7e15 'tick' used to overflow
        datetime with a raw ValueError)."""
        db = _db(spark, "nbigts")
        db.execute("CREATE TABLE t (k int PRIMARY KEY, id timeuuid, ts timestamp)")
        db.execute(
            "BEGIN BATCH USING TIMESTAMP 1700000000000000 "
            "INSERT INTO t (k, id, ts) VALUES (1, now(), currenttimestamp()); "
            "INSERT INTO t (k, id) VALUES (2, now()); "
            "APPLY BATCH"
        )
        rows = {r.k: r for r in db.execute("SELECT k, id, ts FROM t").collect()}
        # distinct uuids, sane session-epoch instants, user write timestamp
        assert rows[1].id != rows[2].id
        assert rows[1].ts.year == 2024
        wt = db.execute("SELECT writetime(ts) AS w FROM t WHERE k = 1").collect()
        assert wt[0].w == 1700000000000000

    def test_sub_tick_overflow_never_collides(self):
        """The 10,000th fold at one instant spills into the next
        millisecond's tick range; the allocator's monotonic last-mint
        (UUIDGen lastTimestamp analog) keeps every mint distinct."""
        from cassandra_pmem_spark.cql.terms import (
            SESSION_CLOCK_SEQ_AND_NODE,
            SessionClockFold,
            ticks_from_unix_ms,
        )
        from cassandra_pmem_spark.cql.writes import NowOccs

        occs = NowOccs()
        minted = set()
        fold1 = SessionClockFold(lambda: 1, alloc=occs.alloc)
        for _ in range(10_001):  # overflows past tick 1's 10k sub-ticks
            minted.add(fold1.fold("now"))
        fold2 = SessionClockFold(lambda: 2, alloc=occs.alloc)
        u = fold2.fold("now")
        assert u not in minted  # the spill must not alias tick 2's mints
        minted.add(u)
        assert len(minted) == 10_002
        assert ticks_of_uuid_text(u) > max(
            ticks_of_uuid_text(x) for x in minted - {u}
        )

    def test_lwt_timeuuid_gate_fires_on_null_cells_too(self, spark):
        """The declared-type gate is a PREPARE error — never
        data-dependent: a null cell must not bypass the rejection."""
        db = _db(spark, "ngate")
        db.execute("CREATE TABLE w (k int PRIMARY KEY, ts timestamp)")
        db.execute("INSERT INTO w (k) VALUES (1)")  # ts is null
        with pytest.raises(InvalidRequest, match="not declared timeuuid"):
            db.execute(
                "UPDATE w SET ts = toTimestamp('2025-01-01 00:00:00') "
                "WHERE k = 1 IF ts < maxTimeuuid('2024-01-01')"
            )

    def test_lwt_shape_errors_fire_when_an_earlier_condition_fails(self, spark):
        """UDT-field/element-access typos are PREPARE errors for the
        whole clause — an earlier-false condition must not short-circuit
        them into a silent [applied=False]."""
        db = _db(spark, "ngate2")
        db.execute("CREATE TYPE addr (street text, city text)")
        db.execute("CREATE TABLE t (k int PRIMARY KEY, v int, u frozen<addr>)")
        db.execute("INSERT INTO t (k, v, u) VALUES (1, 5, {street: 's'})")
        with pytest.raises(InvalidRequest, match="does not have a field"):
            db.execute(
                "UPDATE t SET v = 6 WHERE k = 1 "
                "IF v = 999 AND u.nofield = 'x'"
            )
        with pytest.raises(InvalidRequest, match="Invalid comparison with null"):
            db.execute("UPDATE t SET v = 6 WHERE k = 1 IF v = 999 AND v < null")
