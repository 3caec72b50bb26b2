"""PII detection / redaction for training-data pipelines.

Before text reaches a training mix, emails, phone numbers and IP
addresses must be found (for per-source audit metrics) and replaced
with stable placeholder tokens (so the redacted text still dedups and
shingles deterministically). The reference engine has no such stage —
this belongs to the "operations a large-scale training-data pipeline
needs" layer of the brief.

Everything is JVM-side regexp (whole-stage codegen): detection via
``regexp_extract_all`` + ``size``, redaction via ``regexp_replace``.
The patterns are written in the common subset of Java regex (Spark)
and RE2 (DuckDB) — no backreferences, no lookaround — so the DuckDB
oracle computes bit-identical counts and redacted text.

Scale: map-only (no shuffle at all until the caller aggregates);
cost is O(bytes scanned), the regex state machines are linear-time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 common-subset patterns. \b is an ASCII word
# boundary in both dialects.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — conservative, no quoted local parts
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted-quad with 1-3 digit octets (range check is out of regex
    # scope on purpose: audit pipelines over-match, then filter)
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # optional +country prefix, then NANP-shaped 3-3-4 with single
    # separators; (?:...) is legal in both Java regex and RE2.
    # Both arms carry a leading boundary (\b after the optional '+',
    # '(' or \b before the area code) so a match can never START
    # mid-digit-run: 14+-digit runs (card numbers, timestamps) are
    # left whole instead of partially redacted. The first alternative
    # only spans bare runs of EXACTLY 10 digits (\b needed on both
    # sides of the 3-3-4 core), so a second alternative covers bare
    # 11-13 digit runs (unformatted international numbers) in full —
    # audit pipelines over-match, then filter (same tradeoff as the
    # ipv4 octet range). (ADVICE r6: the boundary fix had silently
    # dropped bare 11-13 digit runs.)
    "phone": r"(?:\+?\b[0-9]{1,3}[-. ]?)?(?:\(|\b)[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b|\b[0-9]{11,13}\b",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}

# Redaction order matters: phone patterns can match the digits inside
# a dotted quad, so IPs are replaced before phones; emails first since
# their local parts may contain digits a phone regex would chew on.
REDACTION_ORDER: tuple[str, ...] = ("email", "ipv4", "phone")


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append one ``n_<kind>`` count column per PII pattern."""
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)),
        )
    return out


def redact(text: Column) -> Column:
    """Replace every PII match with its stable placeholder token."""
    out = text
    for kind in REDACTION_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], REDACTION_TOKENS[kind])
    return out


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII audit + redaction.

    Returns the input plus ``n_email/n_ipv4/n_phone``, ``n_pii`` and a
    ``redacted`` text column. Map-only; callers aggregate per source
    for audit dashboards or feed ``redacted`` onward to dedup.
    """
    out = pii_counts(df, text_col)
    n_total = sum(F.col(f"n_{k}") for k in PII_PATTERNS)
    return out.withColumn("n_pii", n_total).withColumn(
        "redacted", redact(F.col(text_col))
    )


def sql_pii_count(expr: str, kind: str) -> str:
    """DuckDB-side twin of one pii count column."""
    pat = PII_PATTERNS[kind].replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def sql_redact(expr: str) -> str:
    """DuckDB-side twin of redact() (global replace, same order)."""
    out = expr
    for kind in REDACTION_ORDER:
        pat = PII_PATTERNS[kind].replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{REDACTION_TOKENS[kind]}', 'g')"
    return out
