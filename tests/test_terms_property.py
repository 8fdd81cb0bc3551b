"""Property tests for constant function-term folding (cql/terms.py vs the
reference's BytesConversionFcts marshal contract): XAsBlob/blobAsX must be
exact inverses over each type's full domain, the byte layouts must be the
marshal forms (big-endian two's-complement / IEEE-754), and the time
functions must agree with each other on every parseable literal. Pure
driver-side — no SparkSession needed, so the sweep is wide and fast."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given
from hypothesis import strategies as st

from cassandra_pmem_spark.cql.terms import evaluate_fn
from cassandra_pmem_spark.cql.validator import InvalidRequest

_WIDTHS = {"bigint": 64, "int": 32, "smallint": 16, "tinyint": 8}


class TestIntBlobRoundTrip:
    @given(st.integers(-(2**63), 2**63 - 1))
    def test_bigint(self, v):
        b = evaluate_fn("bigintAsBlob", [v])
        assert b == struct.pack(">q", v)
        assert evaluate_fn("blobAsBigint", [b]) == v

    @given(st.integers(-(2**31), 2**31 - 1))
    def test_int(self, v):
        b = evaluate_fn("intAsBlob", [v])
        assert b == struct.pack(">i", v)
        assert evaluate_fn("blobAsInt", [b]) == v

    @given(st.integers(-(2**15), 2**15 - 1))
    def test_smallint(self, v):
        assert evaluate_fn("blobAsSmallint", [evaluate_fn("smallintAsBlob", [v])]) == v

    @given(st.integers(-(2**7), 2**7 - 1))
    def test_tinyint(self, v):
        assert evaluate_fn("blobAsTinyint", [evaluate_fn("tinyintAsBlob", [v])]) == v

    @given(st.sampled_from(sorted(_WIDTHS)), st.integers())
    def test_out_of_range_rejects_instead_of_wrapping(self, t, v):
        bits = _WIDTHS[t]
        if -(2 ** (bits - 1)) <= v < 2 ** (bits - 1):
            return
        with pytest.raises(InvalidRequest, match="out of range"):
            evaluate_fn(f"{t}AsBlob", [v])


class TestFloatTextBoolRoundTrip:
    @given(st.floats(allow_nan=False))
    def test_double(self, v):
        b = evaluate_fn("doubleAsBlob", [v])
        assert b == struct.pack(">d", v)
        assert evaluate_fn("blobAsDouble", [b]) == v

    @given(st.floats(allow_nan=False, width=32))
    def test_float(self, v):
        back = evaluate_fn("blobAsFloat", [evaluate_fn("floatAsBlob", [v])])
        assert back == v or (math.isinf(back) and math.isinf(v))

    @given(st.text())
    def test_text(self, s):
        b = evaluate_fn("textAsBlob", [s])
        assert b == s.encode("utf-8")
        assert evaluate_fn("blobAsText", [b]) == s

    @given(st.text(alphabet=st.characters(max_codepoint=0x7F)))
    def test_ascii(self, s):
        assert evaluate_fn("blobAsAscii", [evaluate_fn("asciiAsBlob", [s])]) == s

    @given(st.booleans())
    def test_boolean(self, v):
        b = evaluate_fn("booleanAsBlob", [v])
        assert b == (b"\x01" if v else b"\x00")
        assert evaluate_fn("blobAsBoolean", [b]) is v


class TestTimeFunctionsAgree:
    @given(
        st.datetimes(
            min_value=__import__("datetime").datetime(1970, 1, 1),
            max_value=__import__("datetime").datetime(2260, 12, 31),
        ).map(lambda d: d.replace(microsecond=0))
    )
    def test_to_timestamp_and_unix_agree(self, dt):
        lit = dt.strftime("%Y-%m-%d %H:%M:%S")
        ts = evaluate_fn("toTimestamp", [lit])
        un = evaluate_fn("toUnixTimestamp", [lit])
        assert ts.tzinfo is not None
        assert int(ts.timestamp() * 1000) == un
        assert evaluate_fn("toDate", [lit[:10]]) == dt.date()

    @given(st.sampled_from(["toTimestamp", "toUnixTimestamp", "toDate"]))
    def test_null_propagates(self, fn):
        assert evaluate_fn(fn, [None]) is None
