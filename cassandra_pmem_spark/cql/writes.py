"""CQL write statements — INSERT / UPDATE / DELETE / BATCH parsed and
applied with mutation-log semantics (SURVEY §2.9).

References: ModificationStatement.java:66 (INSERT/UPDATE = upsert by key),
UpdateStatement.java (counter branch), DeleteStatement.java +
db/DeletionTime.java (row and cell tombstones shadow by timestamp),
Attributes.java / ModificationStatement.java:220,230 (USING TIMESTAMP/TTL),
BatchStatement.java:56 (BATCH grouping), grammar Parser.g:478,544,578.

Two tiers, mirroring the reference's two write paths:

- `CqlWriteSession` (this module) — the *statement* path: parses CQL text,
  accumulates mutations/tombstones driver-side (statement workloads are
  small by nature), and materializes visible state through the SAME
  distributed operators the bulk path uses (upsert_lww_cells,
  apply_row_tombstones). This is what runs the reference's
  InsertTest/UpdateTest/DeleteTest/TTLTest-style corpus.
- bulk loading — operators/upsert.py directly over mutation-log
  DataFrames; fully distributed (the CqlBulkRecordWriter analog).

Timestamps: USING TIMESTAMP wins; otherwise a session-monotonic counter
stamps statement order (the reference stamps coordinator micros). TTL is
modeled in the same unit as writetime: a cell written at t with TTL d is
visible while now <= t + d, matching read-time expiry semantics
(db/LivenessInfo.java); CQL's per-cell TTL granularity is preserved because
expiry rides with each mutation's cells.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_pmem_spark.catalog import TableMeta
from cassandra_pmem_spark.cql.parser import _Parser, _tokenize
from cassandra_pmem_spark.cql.validator import InvalidRequest
from cassandra_pmem_spark.operators.upsert import upsert_lww_cells


@dataclass
class Mutation:
    key: tuple                 # full primary key values, in PK order
    cells: dict                # column -> value (absent = cell untouched)
    writetime: int
    ttl: int | None = None     # relative TTL for this mutation's cells
    counter_deltas: dict = field(default_factory=dict)


@dataclass
class RowTombstone:
    key: tuple
    writetime: int


@dataclass
class CellTombstone:
    key: tuple
    columns: list[str]
    writetime: int


@dataclass
class RangeTombstoneStmt:
    """Clustering-range delete (db/RangeTombstone.java; DELETE ... WHERE
    pk = ? AND ck > ? AND ck <= ?): shadows whole rows in the range."""

    eq: dict
    ranges: dict  # col -> ((lo, incl) | None, (hi, incl) | None)
    writetime: int


class _WriteParser(_Parser):
    """Statement parsers for the write grammar (Parser.g:478,544,578)."""

    def insert_statement(self, params: list[Any]):
        cursor = [0]
        self.expect_kw("insert")
        self.expect_kw("into")
        table = self._table_name()
        if self.accept_kw("json"):
            # INSERT ... JSON '<row>' (Parser.g:478 jsonInsertStatement;
            # cql3/Json.parseJson:281 — keys are column names)
            import json as _json

            t = self.next()
            if t.kind == "punct" and t.text == "?":
                raw = params[cursor[0]]
                cursor[0] += 1
            elif t.kind == "string":
                raw = t.text[1:-1].replace("''", "'")
            else:
                raise InvalidRequest("INSERT JSON expects a JSON string literal or ?")
            try:
                cells = _json.loads(raw)
            except ValueError as exc:
                raise InvalidRequest(f"invalid JSON row: {exc}") from exc
            if not isinstance(cells, dict):
                raise InvalidRequest("INSERT JSON row must be a JSON object")
            cond = self.if_clause(params, cursor)
            if cond is not None and cond[0] != "not_exists":
                raise InvalidRequest("INSERT supports only IF NOT EXISTS")
            using = self._using(params, cursor)
            self._end()
            return table, cells, using, cond
        self.expect_punct("(")
        cols = [self.ident()]
        while self.accept_punct(","):
            cols.append(self.ident())
        self.expect_punct(")")
        self.expect_kw("values")
        self.expect_punct("(")
        vals = [self.literal(params, cursor)]
        while self.accept_punct(","):
            vals.append(self.literal(params, cursor))
        self.expect_punct(")")
        if len(cols) != len(vals):
            raise InvalidRequest("INSERT column/value count mismatch")
        cond = self.if_clause(params, cursor)
        if cond is not None and cond[0] != "not_exists":
            raise InvalidRequest("INSERT supports only IF NOT EXISTS")
        using = self._using(params, cursor)
        self._end()
        return table, dict(zip(cols, vals)), using, cond

    def update_statement(self, params: list[Any]):
        cursor = [0]
        self.expect_kw("update")
        table = self._table_name()
        using = self._using(params, cursor)
        self.expect_kw("set")
        sets, deltas = {}, {}
        while True:
            col = self.ident()
            t = self.next()
            if t.kind != "op" or t.text != "=":
                raise InvalidRequest(f"expected = in SET, got {t.text!r}")
            nxt = self.peek()
            if nxt.kind == "ident" and nxt.text == col:
                # counter update: SET c = c + n | c = c - n
                self.next()
                sign = self.next()
                if sign.text not in ("+", "-"):
                    raise InvalidRequest("counter update must be col = col +/- n")
                n = self.literal(params, cursor)
                deltas[col] = n if sign.text == "+" else -n
            else:
                sets[col] = self.literal(params, cursor)
            if not self.accept_punct(","):
                break
        self.expect_kw("where")
        key = self._key_relations(params, cursor)
        cond = self.if_clause(params, cursor)
        self._end()
        return table, sets, deltas, key, using, cond

    def delete_statement(self, params: list[Any]):
        cursor = [0]
        self.expect_kw("delete")
        cols = []
        if not (self.peek().kind == "ident" and self.peek().text.lower() == "from"):
            cols.append(self.ident())
            while self.accept_punct(","):
                cols.append(self.ident())
        self.expect_kw("from")
        table = self._table_name()
        using = self._using(params, cursor)
        self.expect_kw("where")
        key, ranges = self._key_relations_with_ranges(params, cursor)
        cond = self.if_clause(params, cursor)
        self._end()
        return table, cols, key, ranges, using, cond

    def _table_name(self) -> str:
        t = self.ident()
        if self.accept_punct("."):
            t = self.ident()
        return t

    def if_clause(self, params, cursor):
        """LWT condition (Parser.g updateConditions; ColumnCondition.java:213):
        IF EXISTS | IF NOT EXISTS | IF col op lit [AND ...]."""
        if not self.accept_kw("if"):
            return None
        if self.accept_kw("exists"):
            return ("exists",)
        if self.accept_kw("not"):
            self.expect_kw("exists")
            return ("not_exists",)
        conds = []
        while True:
            col = self.ident()
            op = self.next()
            if op.kind != "op" or op.text not in ("=", "!=", "<", "<=", ">", ">="):
                raise InvalidRequest(f"unsupported LWT condition operator {op.text!r}")
            conds.append((col, op.text, self.literal(params, cursor)))
            if not self.accept_kw("and"):
                break
        return ("conds", conds)

    def _key_relations(self, params, cursor) -> dict:
        out = {}
        while True:
            col = self.ident()
            t = self.next()
            if t.kind != "op" or t.text != "=":
                raise InvalidRequest("write WHERE clauses support = on key columns only")
            out[col] = self.literal(params, cursor)
            if not self.accept_kw("and"):
                break
        return out

    def _key_relations_with_ranges(self, params, cursor):
        """DELETE WHERE clauses: EQ on key columns plus optional range
        restrictions on a clustering column (range tombstones —
        db/RangeTombstone.java; DeleteStatement slice deletes)."""
        eq, ranges = {}, {}
        while True:
            col = self.ident()
            t = self.next()
            if t.kind != "op":
                raise InvalidRequest("expected comparison in WHERE")
            if t.text == "=":
                eq[col] = self.literal(params, cursor)
            elif t.text in ("<", "<=", ">", ">="):
                lo, hi = ranges.get(col, (None, None))
                v = self.literal(params, cursor)
                if t.text in (">", ">="):
                    lo = (v, t.text == ">=")
                else:
                    hi = (v, t.text == "<=")
                ranges[col] = (lo, hi)
            else:
                raise InvalidRequest(f"unsupported operator {t.text!r} in DELETE WHERE")
            if not self.accept_kw("and"):
                break
        return eq, ranges

    def _using(self, params, cursor) -> dict:
        out = {}
        if self.accept_kw("using"):
            while True:
                if self.accept_kw("timestamp"):
                    out["timestamp"] = int(self.literal(params, cursor))
                elif self.accept_kw("ttl"):
                    out["ttl"] = int(self.literal(params, cursor))
                else:
                    raise InvalidRequest("USING supports TIMESTAMP and TTL")
                if not self.accept_kw("and"):
                    break
        return out

    def _end(self) -> None:
        if self.peek().kind != "eof":
            raise InvalidRequest(f"trailing input near {self.peek().text!r}")


# `+`/`-` operators (counter updates) aren't in the SELECT token set; widen
# the shared tokenizer once at import
import re as _re

from cassandra_pmem_spark.cql import parser as _pmod

_pmod._TOKEN_RE = _re.compile(
    r"""\s*(?:
        (?P<string>'(?:[^']|'')*')
      | (?P<number>-?\d+\.\d+|-?\d+)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op><=|>=|!=|=|<|>|\+|-)
      | (?P<punct>[(),.*?])
    )""",
    _re.VERBOSE,
)


class CqlWriteSession:
    """Mutable table state driven by CQL write statements.

    `table(now)` materializes the visible state, applying in order:
    cell-level LWW merge → counter folding → cell tombstones → row
    tombstones → TTL expiry. `now` (same unit as writetime) is injectable
    for deterministic TTL tests (TTLTest.java style)."""

    def __init__(self, spark: SparkSession, meta: TableMeta, base: DataFrame | None = None):
        self.spark = spark
        self.meta = meta
        self._mutations: list[Mutation] = []
        self._row_tombs: list[RowTombstone] = []
        self._cell_tombs: list[CellTombstone] = []
        self._range_tombs: list[RangeTombstoneStmt] = []
        self._clock = 0
        self._base = base

    # -- statement entry (ModificationStatement.execute analog) ---------------

    def execute(self, cql: str, params: list[Any] | None = None) -> bool:
        """Apply one statement. Returns the LWT [applied] flag — True for
        unconditional writes, the condition outcome for IF statements."""
        params = params or []
        head = cql.strip().split(None, 1)[0].lower()
        if head == "begin":  # BEGIN BATCH stmt; stmt; APPLY BATCH
            low = cql.lower()
            inner = cql[low.index("batch") + 5 : low.rindex("apply")]
            for stmt in inner.split(";"):
                if stmt.strip():
                    self.execute(stmt.strip(), params)
            return True
        if head == "truncate":
            # TRUNCATE (cql3/statements/TruncateStatement.java): drop all
            # data — mutations, tombstones, and the base table
            self._mutations.clear()
            self._row_tombs.clear()
            self._cell_tombs.clear()
            self._range_tombs.clear()
            self._base = None
            return True
        p = _WriteParser(_tokenize(cql))
        if head == "insert":
            _, cells, using, cond = p.insert_statement(params)
            if not self._condition_holds(cond, self._key_of(cells)):
                return False
            self._record(cells, using)
        elif head == "update":
            _, sets, deltas, key, using, cond = p.update_statement(params)
            if not self._condition_holds(cond, self._key_of(key)):
                return False
            cells = dict(key)
            cells.update(sets)
            self._record(cells, using, deltas=deltas)
        elif head == "delete":
            _, cols, key, ranges, using, cond = p.delete_statement(params)
            wt = using.get("timestamp", self._tick())
            if ranges:
                # range tombstone: partition key fully EQ, no LWT, no columns
                if cond is not None:
                    raise InvalidRequest("IF conditions are not supported on range deletes")
                if cols:
                    raise InvalidRequest("column deletes cannot carry clustering ranges")
                missing = [k for k in self.meta.partition_key if k not in key]
                if missing:
                    raise InvalidRequest(
                        f"range delete requires the full partition key; missing {missing}"
                    )
                bad = [c for c in ranges if c not in {c.name for c in self.meta.clustering}]
                if bad:
                    raise InvalidRequest(f"range delete only on clustering columns; got {bad}")
                self._range_tombs.append(RangeTombstoneStmt(dict(key), dict(ranges), wt))
                return True
            if not self._condition_holds(cond, self._key_of(key)):
                return False
            if cols:
                self._cell_tombs.append(CellTombstone(self._key_of(key), cols, wt))
            else:
                self._row_tombs.append(RowTombstone(self._key_of(key), wt))
        else:
            raise InvalidRequest(f"unsupported write statement {head!r}")
        return True

    def _condition_holds(self, cond, key: tuple) -> bool:
        """LWT condition evaluation (ColumnCondition.Bound.appliesTo:228;
        ModificationStatement.executeWithCondition:480): read the current
        visible row for the key, decide applied/not-applied. The Paxos
        machinery itself is consensus plumbing with no analytics analog —
        only the compare semantics carry over."""
        if cond is None:
            return True
        current = self.table()
        flt = F.lit(True)
        for kc, kv in zip(self.meta.primary_key, key):
            flt = flt & (F.col(kc) == F.lit(kv))
        row = current.filter(flt).limit(1).collect()
        if cond[0] == "exists":
            return bool(row)
        if cond[0] == "not_exists":
            return not row
        if not row:
            return False  # column conditions on a missing row never apply
        import operator

        ops = {"=": operator.eq, "!=": operator.ne, "<": operator.lt,
               "<=": operator.le, ">": operator.gt, ">=": operator.ge}
        r = row[0].asDict()
        for col, op, val in cond[1]:
            cur = r.get(col)
            if cur is None:
                return False
            if not ops[op](cur, val):
                return False
        return True

    def _tick(self) -> int:
        self._clock += 1
        return self._clock

    def _key_of(self, cells: dict) -> tuple:
        missing = [k for k in self.meta.primary_key if k not in cells]
        if missing:
            raise InvalidRequest(f"primary key columns {missing} must be specified")
        return tuple(cells[k] for k in self.meta.primary_key)

    def _record(self, cells: dict, using: dict, deltas: dict | None = None) -> None:
        known = {f.name for f in self.meta.schema.fields}
        unknown = (set(cells) | set(deltas or {})) - known
        if unknown:
            raise InvalidRequest(f"unknown columns {sorted(unknown)}")
        self._mutations.append(
            Mutation(
                self._key_of(cells),
                cells,
                using.get("timestamp", self._tick()),
                ttl=using.get("ttl"),
                counter_deltas=deltas or {},
            )
        )

    # -- read path ------------------------------------------------------------

    def table(self, now: int | None = None) -> DataFrame:
        """Visible state — what a SELECT over this table reads."""
        meta = self.meta
        fields = [f.name for f in meta.schema.fields]
        key_cols = list(meta.primary_key)
        value_cols = [c for c in fields if c not in key_cols]

        # mutation log rows: values + per-mutation writetime/expiry shadows
        log_schema = T.StructType(
            list(meta.schema.fields)
            + [
                T.StructField("__writetime", T.LongType()),
                T.StructField("__expiry", T.LongType()),
            ]
        )
        rows = []
        for m in self._mutations:
            row = dict.fromkeys(fields)
            row.update(m.cells)
            expiry = (m.writetime + m.ttl) if m.ttl is not None else None
            rows.append(tuple(row[c] for c in fields) + (m.writetime, expiry))

        log = self.spark.createDataFrame(rows, log_schema) if rows else None
        if self._base is not None:
            base = (
                self._base.select(*fields)
                .withColumn("__writetime", F.lit(0).cast("long"))
                .withColumn("__expiry", F.lit(None).cast("long"))
            )
            log = base.unionByName(log) if log is not None else base
        if log is None:
            return self.spark.createDataFrame([], meta.schema)

        # TTL expiry is per-cell at read time: expired mutations simply
        # vanish from the log before the merge (PurgeFunction analog)
        if now is not None:
            log = log.filter(F.col("__expiry").isNull() | (F.col("__expiry") > F.lit(now)))

        merged = upsert_lww_cells(
            log, key=key_cols, value_cols=value_cols, writetime_col="__writetime"
        )

        # counter folding (CounterMutation.java:49): deltas replayed on top
        for m in self._mutations:
            for col, d in m.counter_deltas.items():
                cond = F.lit(True)
                for kc, kv in zip(key_cols, m.key):
                    cond = cond & (F.col(kc) == F.lit(kv))
                merged = merged.withColumn(
                    col,
                    F.when(cond, F.coalesce(F.col(col), F.lit(0)) + F.lit(d)).otherwise(
                        F.col(col)
                    ),
                )

        # cell tombstones: null out cells whose surviving writetime <= delete ts
        for ct in self._cell_tombs:
            cond = F.lit(True)
            for kc, kv in zip(key_cols, ct.key):
                cond = cond & (F.col(kc) == F.lit(kv))
            for col in ct.columns:
                dead = cond & (
                    F.col(f"_writetime_{col}").isNull()
                    | (F.col(f"_writetime_{col}") <= F.lit(ct.writetime))
                )
                merged = merged.withColumn(
                    col, F.when(dead, F.lit(None)).otherwise(F.col(col))
                )

        # row + range tombstones (db/DeletionTime.java, RangeTombstone.java):
        # a delete at t shadows every matching cell with writetime <= t — so
        # delete-then-reinsert keeps only the newer cells. Rows whose cells
        # are all shadowed disappear.
        shadow_preds = []
        for rt in self._row_tombs:
            cond = F.lit(True)
            for kc, kv in zip(key_cols, rt.key):
                cond = cond & (F.col(kc) == F.lit(kv))
            shadow_preds.append((cond, rt.writetime))
        for rg in self._range_tombs:
            cond = F.lit(True)
            for kc, kv in rg.eq.items():
                cond = cond & (F.col(kc) == F.lit(kv))
            for col, (lo, hi) in rg.ranges.items():
                if lo is not None:
                    v, incl = lo
                    cond = cond & ((F.col(col) >= v) if incl else (F.col(col) > v))
                if hi is not None:
                    v, incl = hi
                    cond = cond & ((F.col(col) <= v) if incl else (F.col(col) < v))
            shadow_preds.append((cond, rg.writetime))
        if shadow_preds:
            any_key_cond = F.lit(False)
            for cond, wt in shadow_preds:
                any_key_cond = any_key_cond | cond
                for col in value_cols:
                    dead = cond & (
                        F.col(f"_writetime_{col}").isNull()
                        | (F.col(f"_writetime_{col}") <= F.lit(wt))
                    )
                    merged = merged.withColumn(
                        col, F.when(dead, F.lit(None)).otherwise(F.col(col))
                    ).withColumn(
                        f"_writetime_{col}",
                        F.when(dead, F.lit(None)).otherwise(F.col(f"_writetime_{col}")),
                    )
            all_null = F.lit(True)
            for col in value_cols:
                all_null = all_null & F.col(f"_writetime_{col}").isNull()
            merged = merged.filter(~(any_key_cond & all_null))

        return merged.select(*fields)
