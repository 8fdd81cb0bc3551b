"""Constant FUNCTION TERMS in write statements (grammar Parser.g term :=
function '(' terms ')'; cql3/functions/BytesConversionFcts.java:36,
TimeFcts.java). The reference evaluates pure function terms at prepare
time on the coordinator; the analog here is driver-side Python constant
folding — the resulting VALUE then rides the ordinary mutation path, so
nothing row-at-a-time ever reaches executors.

Covers the deterministic native functions over the engine's type model
(see functions/blob.py for the column-side pairs and the byte-layout
contract these must match):

- XAsBlob / blobAsX for text|ascii|varchar, bigint, int, smallint,
  tinyint, boolean, double, float (big-endian two's-complement /
  IEEE-754, exactly the marshal forms);
- toUnixTimestamp / toTimestamp / toDate over string literals;
- minTimeuuid / maxTimeuuid over string literals — the shadow-model
  timestamp bound (SURVEY §1.2; functions/timefcts.py).

Non-deterministic terms (now(), uuid()) are deliberately absent — the
statement surface rejects them with a clear message instead of producing
un-reproducible mutations.
"""

from __future__ import annotations

import datetime as _dtmod
import struct
from typing import Any

from cassandra_pmem_spark.cql.validator import InvalidRequest

_INT_WIDTHS = {"bigint": 8, "int": 4, "smallint": 2, "tinyint": 1}


def _int_as_blob(v: Any, width: int, name: str) -> bytes:
    if not isinstance(v, int) or isinstance(v, bool):
        raise InvalidRequest(f"{name}() takes an integer literal, got {v!r}")
    try:
        return int(v).to_bytes(width, "big", signed=True)
    except OverflowError as exc:
        raise InvalidRequest(f"{name}({v}) out of range") from exc


def _blob_as_int(v: Any, width: int, name: str) -> int:
    if not isinstance(v, (bytes, bytearray)) or len(v) != width:
        raise InvalidRequest(
            f"{name}() takes a {width}-byte blob, got {v!r}"
        )
    return int.from_bytes(bytes(v), "big", signed=True)


class TimeuuidBound(_dtmod.datetime):
    """A min/maxTimeuuid fold: the exact instant, tagged with which
    extreme it is (TimeFcts.java:69,81 — the extremes compare strictly
    below/above every REAL timeuuid in the named millisecond). The
    engine's contract: extremes are RANGE BOUNDS — single-column range
    contexts (SELECT relations, DELETE slice bounds, LWT conditions)
    translate per operator via bound_for(); WRITE positions store the
    plain instant; every other value position (equality, IN, CONTAINS,
    tuple relations) rejects with reject() — a clear error instead of a
    silently-divergent comparison against a value no real timeuuid
    equals."""

    kind: str = ""

    @classmethod
    def make(cls, dt, kind: str) -> "TimeuuidBound":
        b = cls(
            dt.year, dt.month, dt.day, dt.hour, dt.minute, dt.second,
            dt.microsecond, tzinfo=dt.tzinfo,
        )
        b.kind = kind
        return b

    def instant(self) -> _dtmod.datetime:
        return _dtmod.datetime(
            self.year, self.month, self.day, self.hour, self.minute,
            self.second, self.microsecond, tzinfo=self.tzinfo,
        )

    def bound_for(self, op: str) -> tuple[str, _dtmod.datetime]:
        """(op, datetime) for a shadow-timestamp RANGE comparison."""
        edge = self.instant() + (
            _dtmod.timedelta(milliseconds=1)
            if self.kind == "max"
            else _dtmod.timedelta()
        )
        if op in (">", ">="):
            return (">=", edge)
        if op in ("<", "<="):
            return ("<", edge)
        self.reject(op)

    def reject(self, where: str) -> None:
        raise InvalidRequest(
            f"{self.kind}Timeuuid() is a range bound (no real timeuuid "
            f"ever equals the extreme) and cannot be used with {where!r}; "
            "compare with </<=/>/>= or bind a timestamp value instead"
        )


def evaluate_fn(name: str, args: list[Any]) -> Any:
    """Evaluate one constant function term; raises InvalidRequest for
    unknown names, non-deterministic functions, and arity/type errors."""
    low = name.lower()
    if low in ("now", "uuid", "currenttimestamp", "currentdate",
               "currenttime", "currenttimeuuid"):
        raise InvalidRequest(
            f"{name}() is non-deterministic and not supported as a write "
            "term in this engine (bind the value instead)"
        )
    if low not in _KNOWN_FNS:
        raise InvalidRequest(f"unknown function {name!r} in term")
    if len(args) != 1:
        # every supported term function is unary — validated BEFORE the
        # null shortcut so a misspelled name or wrong arity rejects at
        # prepare even when a bound value is None
        raise InvalidRequest(f"{name}() takes 1 argument, got {len(args)}")
    if args[0] is None:
        # the reference's native conversion/time functions are RETURNS
        # NULL ON NULL INPUT (NativeScalarFunction) — fn(null) is null,
        # not an error (a bound None must not reject the statement)
        return None

    def one() -> Any:
        return args[0]

    for t, w in _INT_WIDTHS.items():
        if low == f"{t}asblob":
            return _int_as_blob(one(), w, name)
        if low == f"blobas{t}":
            return _blob_as_int(one(), w, name)
    if low in ("textasblob", "asciiasblob", "varcharasblob"):
        v = one()
        if not isinstance(v, str):
            raise InvalidRequest(f"{name}() takes a string literal")
        if low == "asciiasblob" and not v.isascii():
            # AsciiType rejects code points above 0x7F
            raise InvalidRequest(f"{name}() takes an ASCII string literal")
        return v.encode("utf-8")
    if low in ("blobastext", "blobasascii", "blobasvarchar"):
        v = one()
        if not isinstance(v, (bytes, bytearray)):
            raise InvalidRequest(f"{name}() takes a blob")
        if low == "blobasascii" and any(b > 0x7F for b in v):
            # AsciiSerializer.validate rejects bytes above 0x7F
            raise InvalidRequest(f"{name}() takes an ASCII blob")
        try:
            return bytes(v).decode("utf-8")
        except UnicodeDecodeError as exc:
            raise InvalidRequest(f"{name}(): invalid UTF-8 blob") from exc
    if low == "booleanasblob":
        v = one()
        if not isinstance(v, bool):
            raise InvalidRequest(f"{name}() takes a boolean literal")
        return b"\x01" if v else b"\x00"
    if low == "blobasboolean":
        v = one()
        if not isinstance(v, (bytes, bytearray)) or len(v) != 1:
            raise InvalidRequest(f"{name}() takes a 1-byte blob")
        return v[0] != 0
    if low == "doubleasblob":
        v = one()
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise InvalidRequest(f"{name}() takes a numeric literal")
        return struct.pack(">d", float(v))
    if low == "blobasdouble":
        v = one()
        if not isinstance(v, (bytes, bytearray)) or len(v) != 8:
            raise InvalidRequest(f"{name}() takes an 8-byte blob")
        return struct.unpack(">d", bytes(v))[0]
    if low == "floatasblob":
        v = one()
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise InvalidRequest(f"{name}() takes a numeric literal")
        return struct.pack(">f", float(v))
    if low == "blobasfloat":
        v = one()
        if not isinstance(v, (bytes, bytearray)) or len(v) != 4:
            raise InvalidRequest(f"{name}() takes a 4-byte blob")
        return struct.unpack(">f", bytes(v))[0]
    if low in ("totimestamp", "tounixtimestamp", "todate",
               "mintimeuuid", "maxtimeuuid"):
        # TimeFcts over string literals: 'YYYY-MM-DD[ hh:mm:ss]' — the
        # deterministic subset (the timeuuid/now forms are not terms here)
        import datetime as _dt

        v = one()
        if not isinstance(v, str):
            raise InvalidRequest(f"{name}() takes a date/timestamp string here")
        try:
            if len(v) == 10:
                dt = _dt.datetime.strptime(v, "%Y-%m-%d")
            else:
                dt = _dt.datetime.strptime(v, "%Y-%m-%d %H:%M:%S")
        except ValueError as exc:
            raise InvalidRequest(f"{name}({v!r}): {exc}") from exc
        if low == "todate":
            return dt.date()
        # one UTC parse serves both functions (the engine session pins
        # spark.sql.session.timeZone=UTC — session.py — and an AWARE
        # datetime denotes the same instant under any session timezone,
        # so toTimestamp and toUnixTimestamp always agree)
        dt = dt.replace(tzinfo=_dt.timezone.utc)
        if low == "tounixtimestamp":
            return int(dt.timestamp() * 1000)
        # min/maxTimeuuid on the shadow model (SURVEY §1.2 — timeuuids
        # as (uuid, timestamp shadow) pairs): the fold is the EXACT
        # instant t, tagged with which extreme it is. A write position
        # stores t (the reference stores a fake timeuuid whose timestamp
        # IS t); relation compilation translates the extreme per
        # OPERATOR (TimeuuidBound.bound_for) — the reference extremes
        # sit strictly outside every real timeuuid in millisecond t, so
        # e.g. `> minTimeuuid(t)` means `>= t` and `< maxTimeuuid(t)`
        # means `< t + 1ms`.
        if low == "mintimeuuid":
            return TimeuuidBound.make(dt, "min")
        if low == "maxtimeuuid":
            return TimeuuidBound.make(dt, "max")
        return dt
    raise AssertionError(f"_KNOWN_FNS out of sync for {name!r}")  # pragma: no cover


_KNOWN_FNS = frozenset(
    [f"{t}asblob" for t in _INT_WIDTHS] + [f"blobas{t}" for t in _INT_WIDTHS]
    + ["textasblob", "asciiasblob", "varcharasblob",
       "blobastext", "blobasascii", "blobasvarchar",
       "booleanasblob", "blobasboolean",
       "doubleasblob", "blobasdouble", "floatasblob", "blobasfloat",
       "totimestamp", "tounixtimestamp", "todate",
       "mintimeuuid", "maxtimeuuid"]
)
