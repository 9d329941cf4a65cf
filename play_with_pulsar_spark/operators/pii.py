"""PII detection and redaction over text columns.

A large-scale training-data pipeline screens every document for
personally identifiable information before the corpus ships; at
100 TB that screen must be a pure JVM column expression (regex inside
whole-stage codegen), never a per-row Python pass. Everything here is
``regexp_extract_all`` / ``regexp_replace`` on built-in functions —
zero Python in the hot path, fully pushdown/prune-friendly.

Pattern dialect: every pattern is written in the subset where Java's
``java.util.regex`` (Spark) and RE2 (DuckDB, the oracle) agree — no
lookaround, no backreferences, ASCII ``\\d``/``\\b`` only — the same
portability contract the BPE-ish tokenizer regex in
``textops.bpe_ish_token_count`` follows. That is what lets the DuckDB
oracle hash-check redaction output byte-for-byte.

Redaction is SEQUENTIAL in the declared ``PII_PATTERNS`` order
(email → ssn → phone → ipv4). Order matters when spans overlap — an
earlier replacement can consume characters a later pattern would have
matched — so the order is part of the operator contract and the
oracle applies the identical sequence.

Detection counts are computed per-pattern on the ORIGINAL text
(independent, possibly overlapping counts), which is what an audit
dashboard wants; redaction is what the shipped corpus wants.

Reference scope note: the reference engine has no PII surface (it is
a game-event bus); this operator belongs to the training-data
curation family the brief adds on top (same tier as dedup /
contamination / packing in ``curation.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies these top to bottom. Keys are the
# placeholder names; ``<EMAIL>`` etc. contain no digits or ``@`` so a
# replacement can never create a fresh match for a later pattern.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # US SSN before phone: both are dash-joined digit runs and the
    # 3-2-4 shape must not be half-eaten by the 3-3-4 phone pattern.
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(col: Column | str, pattern: str) -> Column:
    """Number of (non-overlapping) matches of one PII pattern.
    Long-typed to align with the DuckDB oracle's BIGINT ``len()``."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(pattern), F.lit(0))).cast("long")


def redact_pii(col: Column | str, patterns: dict[str, str] | None = None) -> Column:
    """Replace every PII match with ``<NAME>``, applying patterns
    sequentially in dict order (see module docstring on ordering)."""
    out = _c(col)
    for name, pat in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def scan_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document PII audit + redacted text.

    Output: (id_col, n_<name> per pattern, pii_total, redacted).
    Narrow projection, no shuffle — the whole scan is one codegen
    stage over the input partitioning, so it parallelizes trivially
    to any corpus size and composes with downstream filters
    (``pii_total == 0`` selects the clean subset with the predicate
    pushed into the scan).
    """
    pats = patterns or PII_PATTERNS
    counts = [pii_count(text_col, pat).alias(f"n_{name}") for name, pat in pats.items()]
    total = sum((F.col(f"n_{name}") for name in pats), F.lit(0))
    return docs.select(
        id_col,
        *counts,
        redact_pii(text_col, pats).alias("redacted"),
    ).withColumn("pii_total", total.cast("long"))


def oracle_redact_sql(expr: str, patterns: dict[str, str] | None = None) -> str:
    """DuckDB expression applying the identical redaction sequence —
    generated from the same ``PII_PATTERNS`` constants so the Spark
    path and the oracle can never drift apart."""
    out = expr
    for name, pat in (patterns or PII_PATTERNS).items():
        out = f"regexp_replace({out}, '{pat}', '<{name.upper()}>', 'g')"
    return out


def oracle_count_sql(expr: str, pattern: str) -> str:
    """DuckDB expression counting matches of one pattern."""
    return f"len(regexp_extract_all({expr}, '{pattern}'))"
