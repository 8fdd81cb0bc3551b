"""URL canonicalization for crawl-corpus pipelines.

Web-scale training pipelines dedup and sample BY URL before any text
comparison runs (CCNet, C4, RefinedWeb all start with a URL-normalize →
exact-dedup pass): lowercase the scheme and host, drop the default
port, drop the fragment, normalize the empty path to "/", and sort the
query parameters so param order can't split one logical page into many
keys. Everything here is pure JVM-side expressions (regexp_extract /
array_sort / concat), so canonicalization fuses into the scan's codegen
stage — no shuffle, no Python, 100 TB-safe — and every regex is
RE2-compatible so the DuckDB oracle runs the IDENTICAL pattern text.

Reference relative: no analog (the reference is a storage engine); this
belongs to the LLM-pipeline extension tier next to WARC ingestion
(`sources/warc.py` — the producer of these URLs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# One decomposition pattern, used by BOTH engines: scheme, host[:port],
# path, optional ?query. The fragment is removed before this runs.
URL_PARTS = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?"

# Multi-label public suffixes the fixture universe can produce; real
# deployments swap in the full public-suffix list as a broadcast table.
TWO_LEVEL_TLDS = ("co.uk", "ac.uk", "com.au", "co.jp", "org.uk")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(col: Column | str) -> Column:
    """Lowercased host with any port stripped."""
    no_frag = F.regexp_replace(_c(col), r"#.*$", "")
    host_port = F.lower(F.regexp_extract(no_frag, URL_PARTS, 2))
    return F.regexp_replace(host_port, r":\d+$", "")


def registered_domain(host: Column) -> Column:
    """eTLD+1 under the small built-in suffix list: one extra label for
    the known two-level TLDs, else the last two labels."""
    alt = "|".join(t.replace(".", r"\.") for t in TWO_LEVEL_TLDS)
    two = F.regexp_extract(host, rf"([^.]+\.(?:{alt}))$", 1)
    return F.when(two != "", two).otherwise(
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    )


def normalize_url(col: Column | str) -> Column:
    """Canonical form: drop fragment; lowercase scheme + host; strip
    the scheme's default port (80/443); empty path → "/"; query params
    sorted bytewise. Malformed URLs (no scheme://) pass through
    trimmed — the caller decides whether to quarantine them."""
    raw = F.trim(_c(col))
    no_frag = F.regexp_replace(raw, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, URL_PARTS, 1))
    host_port = F.lower(F.regexp_extract(no_frag, URL_PARTS, 2))
    host = F.regexp_replace(host_port, r":\d+$", "")
    port = F.regexp_extract(host_port, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(no_frag, URL_PARTS, 3)
    query = F.regexp_extract(no_frag, URL_PARTS, 4)
    sorted_q = F.concat(
        F.lit("?"),
        F.array_join(
            F.array_sort(F.split(F.substring(query, 2, 1 << 30), "&")), "&"
        ),
    )
    return F.when(scheme == "", raw).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            F.when(path == "", F.lit("/")).otherwise(path),
            F.when(query == "", F.lit("")).otherwise(sorted_q),
        )
    )


def normalize_sql(url_expr: str) -> str:
    """DuckDB twin of `normalize_url` — same decomposition pattern, same
    rules, RE2 engine. Returns one scalar SQL expression."""
    nf = f"regexp_replace({url_expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nf}, '{URL_PARTS}', 1))"
    hp = f"lower(regexp_extract({nf}, '{URL_PARTS}', 2))"
    host = f"regexp_replace({hp}, ':\\d+$', '')"
    port = f"regexp_extract({hp}, ':(\\d+)$', 1)"
    path = f"regexp_extract({nf}, '{URL_PARTS}', 3)"
    query = f"regexp_extract({nf}, '{URL_PARTS}', 4)"
    sorted_q = (
        f"'?' || array_to_string(list_sort(string_split({query}[2:], '&')), '&')"
    )
    keep = (
        f"({port} <> '' AND NOT (({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443')))"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN trim({url_expr}) ELSE "
        f"{scheme} || '://' || {host} "
        f"|| CASE WHEN {keep} THEN ':' || {port} ELSE '' END "
        f"|| CASE WHEN {path} = '' THEN '/' ELSE {path} END "
        f"|| CASE WHEN {query} = '' THEN '' ELSE {sorted_q} END END"
    )


def host_sql(url_expr: str) -> str:
    nf = f"regexp_replace({url_expr}, '#.*$', '')"
    hp = f"lower(regexp_extract({nf}, '{URL_PARTS}', 2))"
    return f"regexp_replace({hp}, ':\\d+$', '')"


def domain_sql(host_expr: str) -> str:
    alt = "|".join(t.replace(".", r"\.") for t in TWO_LEVEL_TLDS)
    two = f"regexp_extract({host_expr}, '([^.]+\\.(?:{alt}))$', 1)"
    fall = f"regexp_extract({host_expr}, '([^.]+\\.[^.]+)$', 1)"
    return f"CASE WHEN {two} <> '' THEN {two} ELSE {fall} END"
