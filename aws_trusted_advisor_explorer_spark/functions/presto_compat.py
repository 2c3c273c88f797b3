"""Presto/Athena → Spark scalar-function semantics shims (SURVEY.md §2.5).

The reference's view layer is Athena (Presto) SQL
(/root/reference/source/create-athena-views-lambda.py:84-160). These
helpers reproduce the exact Presto semantics with built-in Spark
expressions — JVM-side, whole-stage-codegen'd; no Python UDFs.

| ref | Presto construct                      | shim                       |
|-----|---------------------------------------|----------------------------|
| F1  | date_parse(s, '%Y-%m-%d %T')          | date_parse_ymd_hms         |
| F2  | substr(s, pos[, len])                 | F.substring (same 1-based) |
| F3  | replace(s, search) 2-arg = delete     | presto_replace             |
| F4  | rtrim(s)                              | F.rtrim                    |
| F5  | CAST(x AS decimal(p,s))               | .cast(DecimalType(p,s))    |
| F8  | replace(CAST(x AS varchar),'0','1')   | zero_guard_decimal         |

CAST policy: Presto CAST throws on malformed input, and so does the
Spark these shims actually run under — ANSI mode is ON by default in
Spark 4 and this repo's session never disables it (review-verified:
``cast('$bad' as decimal(10,2))`` raises CAST_INVALID_INPUT). That
throw-on-malformed behavior is the FAITHFUL reproduction of the
reference's Athena semantics, not a divergence: a dirty cell fails
the view query in both systems. A deployment preferring
land-NULL-and-continue would swap these casts for ``try_cast`` —
a deliberate loosening vs the reference, so it is not the default.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql.types import DecimalType


def date_parse_ymd_hms(col: Column) -> Column:
    """Presto ``date_parse(substr(x,1,19), '%Y-%m-%d %T')``.

    ``%T`` ≡ ``HH:mm:ss``. Reproduces the substr-to-19-chars truncation
    the reference applies in every view. Returns TIMESTAMP_NTZ: Presto
    timestamps carry no zone, and NTZ keeps values session-TZ-independent
    (matches DuckDB's naive TIMESTAMP in the oracle compare).
    """
    return F.to_timestamp_ntz(F.substring(col, 1, 19), F.lit("yyyy-MM-dd HH:mm:ss"))


def presto_replace(col: Column, search: str, replacement: str = "") -> Column:
    """Presto ``replace(s, search[, replacement])``; the 2-arg form deletes.

    Literal (non-regex) replacement, matching Presto.
    """
    return F.replace(col, F.lit(search), F.lit(replacement))


def money_to_decimal(col: Column, precision: int = 18, scale: int = 2,
                     substr_first: bool = True, strip_quote: bool = False) -> Column:
    """``'$123.45  '`` → decimal.

    Standard form (create-athena-views-lambda.py:90):
    ``CAST(rtrim(replace(substr(x, 2), '$')) AS decimal(18,2))`` — the
    substr(2) drops the leading '$', the 2-arg replace catches any
    further '$'.

    RDS form (:116, ``substr_first=False, strip_quote=True``):
    ``CAST(rtrim(replace(replace(x, '$'), '"')) AS decimal(10,2))``.
    """
    c = F.substring(col, 2, 2147483647) if substr_first else col
    c = presto_replace(c, "$")
    if strip_quote:
        c = presto_replace(c, '"')
    return F.rtrim(c).cast(DecimalType(precision, scale))


def zero_guard_decimal(col: Column) -> Column:
    """The summary_view divide-by-zero guard quirk, reproduced bit-for-bit.

    ``CAST(replace(CAST(x AS varchar), '0', '1') AS decimal(10,2))``
    (create-athena-views-lambda.py:147-148) — replaces EVERY '0' digit,
    so 0→1, 10→11, 100→111, 200→211. Mathematically wrong but required
    for oracle parity with the reference.
    """
    return presto_replace(col.cast("string"), "0", "1").cast(DecimalType(10, 2))


def pct_substr_decimal(col: Column, length: int) -> Column:
    """``CAST(substr(x, 1, n) AS decimal(10,4))`` — positional truncation
    of percent-ish strings ('2.3%  Low' → 2.3), create-athena-views:88-89."""
    return F.substring(col, 1, length).cast(DecimalType(10, 4))


def iso_expiration_to_timestamp(col: Column) -> Column:
    """``date_parse(substr(replace(x,'T',' '),1,19), '%Y-%m-%d %T')`` —
    ISO-8601 expiration date, 'T' → ' ' then parse (create-athena-views:133)."""
    return date_parse_ymd_hms(presto_replace(col, "T", " "))
