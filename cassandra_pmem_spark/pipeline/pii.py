"""PII detection and redaction for training-data pipelines.

Large-corpus pipelines (C4, Dolma, CCNet and friends) scrub personally
identifiable information — emails, phone numbers, IP addresses,
SSN-shaped ids, card-shaped numbers — before any text reaches a
trainer. The detectors here are the standard regex family those
pipelines use, written as pure JVM-side `regexp_count` /
`regexp_replace` expressions so the scrub runs inside whole-stage
codegen at scan speed: zero shuffles, zero Python in the hot path, and
the plan scales to 100 TB exactly like a filter.

Every pattern is RE2-compatible (no backreferences, no lookaround) so
the DuckDB oracle can run the IDENTICAL pattern text — cross-engine
equality is part of the contract, same as `html_to_text`.

Reference relative: the reference has no PII tooling (it is a storage
engine); this is part of the LLM-pipeline extension surface the build
brief requires alongside dedup/similarity (SURVEY §2 pipeline rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered detector chain. Order matters for redaction: SSN- and
# card-shaped numbers must be rewritten before the looser phone
# pattern can eat their digit groups; emails before IPs never overlap
# but stay first for determinism. The SAME order is mirrored in
# `redaction_sql()` so Spark and the oracle produce identical text.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("card", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\(\d{3}\) ?\d{3}[-.]\d{4}|\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts, one `n_<kind>` int column per
    detector. Pure expressions — Catalyst fuses all five counters into
    one codegen stage over the scan."""
    c = _c(text_col)
    return df.select(
        "*",
        *[
            F.regexp_count(c, F.lit(pat)).alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS
        ],
    )


def redact_pii(col: Column | str) -> Column:
    """Replace every detector hit with its typed token (`<EMAIL>`,
    `<SSN>`, ...). Applied in PII_PATTERNS order; each later pattern
    sees the earlier rewrites, which is what makes the chain
    deterministic across engines."""
    out = _c(col)
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def counts_sql(text_expr: str) -> list[str]:
    """DuckDB twins of `pii_counts` — `len(regexp_extract_all(...))`
    is RE2's regexp_count. Pattern text is byte-identical to Spark's."""
    return [
        f"len(regexp_extract_all({text_expr}, '{pat}')) AS n_{kind}"
        for kind, pat in PII_PATTERNS
    ]


def redaction_sql(text_expr: str) -> str:
    """DuckDB twin of `redact_pii`: the same ordered regexp_replace
    chain ('g' flag — Spark's regexp_replace is global by default)."""
    out = text_expr
    for kind, pat in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '<{kind.upper()}>', 'g')"
    return out
