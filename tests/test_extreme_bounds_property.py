"""Property sweep for TimeuuidBound.edge_full against an independent
model of TimeUUIDType's order (UUIDGen.java:198,209 extremes;
TimeUUIDType timestamp-first comparison, with the min/max extremes'
clockSeqAndNode bracketing every real value at the same tick).

The model ranks every value as (v1 ticks, band) where band 0 = the min
extreme, 1 = any real timeuuid, 2 = the max extreme — exactly how the
reference's comparator places the fake extremes relative to real uuids.
edge_full's (op, tick edge, fixup) translation must reproduce the model
for every operator, every candidate value class, and both bound kinds,
including candidates that ARE a stored extreme (the case a tick-only
comparison gets wrong)."""

from __future__ import annotations

import datetime as dt
import operator

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_pmem_spark.cql.terms import (
    MAX_CLOCK_SEQ_AND_NODE,
    MIN_CLOCK_SEQ_AND_NODE,
    SESSION_CLOCK_SEQ_AND_NODE,
    TimeuuidBound,
    ticks_from_unix_ms,
    ticks_of_uuid_text,
    v1_uuid_text,
)

_OPS = {"<": operator.lt, "<=": operator.le, ">": operator.gt, ">=": operator.ge}


def _bound(ms: int, kind: str) -> TimeuuidBound:
    inst = dt.datetime.fromtimestamp(ms / 1000.0, tz=dt.timezone.utc)
    return TimeuuidBound.make(inst, kind)


def _rank(ticks: int, band: int) -> tuple:
    return (ticks, band)


def _candidate(ms: int, sub: int, band: int) -> tuple[str, tuple]:
    """(uuid text, model rank) for one candidate value."""
    if band == 0:
        t = ticks_from_unix_ms(ms)
        return v1_uuid_text(t, MIN_CLOCK_SEQ_AND_NODE), _rank(t, 0)
    if band == 2:
        t = ticks_from_unix_ms(ms + 1) - 1
        return v1_uuid_text(t, MAX_CLOCK_SEQ_AND_NODE), _rank(t, 2)
    t = ticks_from_unix_ms(ms, sub)
    return v1_uuid_text(t, SESSION_CLOCK_SEQ_AND_NODE), _rank(t, 1)


@settings(max_examples=400, deadline=None)
@given(
    bound_ms=st.integers(min_value=0, max_value=4_102_444_800_000),
    cand_delta_ms=st.integers(min_value=-3, max_value=3),
    cand_sub=st.integers(min_value=0, max_value=9_999),
    cand_band=st.integers(min_value=0, max_value=2),
    kind=st.sampled_from(["min", "max"]),
    op=st.sampled_from(["<", "<=", ">", ">="]),
)
def test_edge_full_matches_the_order_model(
    bound_ms, cand_delta_ms, cand_sub, cand_band, kind, op
):
    # bound_ms must land on a whole millisecond (the fold parses string
    # literals at ms grain); candidates roam ±3ms around it at any
    # sub-tick, in all three bands
    b = _bound(bound_ms, kind)
    cand_text, cand_rank = _candidate(
        bound_ms + cand_delta_ms, cand_sub, cand_band
    )
    bound_rank = _rank(
        ticks_from_unix_ms(bound_ms)
        if kind == "min"
        else ticks_from_unix_ms(bound_ms + 1) - 1,
        0 if kind == "min" else 2,
    )
    want = _OPS[op](cand_rank, bound_rank)

    op2, edge, fix = b.edge_full(op)
    if fix is not None and cand_text == fix[1]:
        got = fix[0] == "include"
    else:
        got = _OPS[op2](ticks_of_uuid_text(cand_text), edge)
    assert got == want, (
        f"{kind}Timeuuid op {op}: candidate band {cand_band} "
        f"delta {cand_delta_ms}ms sub {cand_sub} -> {got}, model {want}"
    )


def test_extreme_uuid_texts_are_the_reference_values():
    # UUIDGen.minTimeUUID(0)/maxTimeUUID(0) canonical forms
    lo, _ = _candidate(0, 0, 0)
    hi, _ = _candidate(0, 0, 2)
    assert lo == _bound(0, "min").uuid_text()
    assert hi == _bound(0, "max").uuid_text()
    with pytest.raises(Exception):
        _bound(0, "min").edge_full("=")  # non-range ops keep rejecting
