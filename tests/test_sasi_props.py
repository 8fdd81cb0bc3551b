"""Property sweep of the SASI support matrix against a line-level
transliteration of the reference model, so the matrix cannot drift
(VERDICT r11 task 7).

Reference model: ColumnIndex.supports (index/sasi/conf/ColumnIndex.java:
219-230) over Expression.Op.valueOf's Operator->Op mapping
(plan/Expression.java:52-83), with the mode op sets from
OnDiskIndexBuilder.Mode (disk/OnDiskIndexBuilder.java:53-55).

One documented engine extension: the reference gates a bare
``Operator.LIKE`` (bind-marker pattern, shape unknown at prepare) on
isLiteral() alone (:221-222); the engine's CQL layer always KNOWS the
shape (LikeRestriction resolves it from the constant pattern), so it
applies that literal gate to every shaped LIKE op as the prepare-time
equivalent. The sweep therefore asserts
``sasi_supports(shape) == reference_supports(shape) and literal``
for the LIKE family and exact equality everywhere else.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_pmem_spark.cql.validator import (
    SASI_MODE_OPS,
    ConfigurationException,
    sasi_index_mode,
    sasi_supports,
    validate_sasi_mode,
)

_MODE_OPS_REF = {
    # OnDiskIndexBuilder.java:53-55, verbatim
    "PREFIX": {"EQ", "MATCH", "PREFIX", "NOT_EQ", "RANGE"},
    "CONTAINS": {"EQ", "MATCH", "CONTAINS", "PREFIX", "SUFFIX", "NOT_EQ"},
    "SPARSE": {"EQ", "NOT_EQ", "RANGE"},
}

# Expression.Op.valueOf (Expression.java:52-83): the Operator domain
# ColumnIndex.supports can see, mapped to Expression.Op names
_OPERATOR_TO_OP = {
    "EQ": "EQ",
    "NEQ": "NOT_EQ",
    "LT": "RANGE",
    "GT": "RANGE",
    "LTE": "RANGE",
    "GTE": "RANGE",
    "LIKE_PREFIX": "PREFIX",
    "LIKE_SUFFIX": "SUFFIX",
    "LIKE_CONTAINS": "CONTAINS",
    "LIKE_MATCHES": "MATCH",
}
_LIKE_FAMILY = {"PREFIX", "SUFFIX", "CONTAINS", "MATCH"}


def _reference_supports(operator: str, mode: str, tokenized: bool,
                        literal: bool) -> bool:
    """Direct transliteration of ColumnIndex.supports
    (ColumnIndex.java:219-230)."""
    if operator == "LIKE":  # bare marker-pattern LIKE (:221-222)
        return literal
    op = _OPERATOR_TO_OP[operator]
    return (
        not (tokenized and op == "EQ")                      # :225
        and not (tokenized and mode == "CONTAINS" and op == "PREFIX")  # :226
        and not (literal and op == "RANGE")                 # :227
        and op in _MODE_OPS_REF[mode]                       # :228
    )


def _mode_info(mode: str, tokenized: bool, literal: bool) -> dict:
    return {
        "mode": mode,
        "analyzed": tokenized,
        "tokenized": tokenized,
        "is_literal": literal,
    }


class TestSupportsSweep:
    def test_mode_op_sets_pinned(self):
        assert {k: set(v) for k, v in SASI_MODE_OPS.items()} == _MODE_OPS_REF

    @given(
        operator=st.sampled_from(sorted(_OPERATOR_TO_OP)),
        mode=st.sampled_from(["PREFIX", "CONTAINS", "SPARSE"]),
        tokenized=st.booleans(),
        literal=st.booleans(),
    )
    @settings(max_examples=500, deadline=None)
    def test_supports_matches_reference_model(
        self, operator, mode, tokenized, literal
    ):
        op = _OPERATOR_TO_OP[operator]
        ref = _reference_supports(operator, mode, tokenized, literal)
        got = sasi_supports(op, _mode_info(mode, tokenized, literal))
        if op in _LIKE_FAMILY:
            # shaped LIKE inherits the Operator.LIKE literal gate (see
            # module docstring)
            assert got == (ref and literal), (operator, mode, tokenized, literal)
        else:
            assert got == ref, (operator, mode, tokenized, literal)

    def test_exhaustive_non_like_grid_equals_reference(self):
        # the boolean grid is tiny — also check it exhaustively so a
        # hypothesis shrink can never mask a miss
        for operator in _OPERATOR_TO_OP:
            op = _OPERATOR_TO_OP[operator]
            if op in _LIKE_FAMILY:
                continue
            for mode in _MODE_OPS_REF:
                for tokenized in (False, True):
                    for literal in (False, True):
                        assert sasi_supports(
                            op, _mode_info(mode, tokenized, literal)
                        ) == _reference_supports(
                            operator, mode, tokenized, literal
                        ), (operator, mode, tokenized, literal)


class TestIndexModeOptionSweep:
    """IndexMode.getMode (conf/IndexMode.java:134-196) +
    SASIIndex.validateOptions' SPARSE gates (SASIIndex.java:156-164)
    under randomly drawn option dicts."""

    @given(
        mode=st.sampled_from(["PREFIX", "CONTAINS", "SPARSE",
                              "prefix", "sparse"]),
        analyzed=st.sampled_from([None, "true", "false", "TRUE", "x"]),
        is_literal=st.sampled_from([None, "true", "false"]),
        default_literal=st.booleans(),
    )
    @settings(max_examples=300, deadline=None)
    def test_sparse_gates_fire_exactly_when_reference_says(
        self, mode, analyzed, is_literal, default_literal
    ):
        opts: dict = {"mode": mode}
        if analyzed is not None:
            opts["analyzed"] = analyzed
        if is_literal is not None:
            opts["is_literal"] = is_literal
        info = sasi_index_mode(opts, default_literal)
        # Boolean.parseBoolean semantics
        want_analyzed = (analyzed or "").lower() == "true"
        want_literal = (
            default_literal if is_literal is None else is_literal == "true"
        )
        assert info["analyzed"] is want_analyzed
        assert info["is_literal"] is want_literal
        assert info["mode"] == mode.upper()
        if mode.upper() != "SPARSE":
            validate_sasi_mode(info)  # must not raise
        elif want_literal:
            with pytest.raises(
                ConfigurationException,
                match="SPARSE mode is only supported on non-literal",
            ):
                validate_sasi_mode(info)
        elif want_analyzed:
            with pytest.raises(
                ConfigurationException,
                match="SPARSE mode doesn't support analyzers.",
            ):
                validate_sasi_mode(info)
        else:
            validate_sasi_mode(info)

    def test_unknown_mode_message(self):
        with pytest.raises(
            ConfigurationException, match="Incorrect index mode: wat"
        ):
            sasi_index_mode({"mode": "wat"}, True)
