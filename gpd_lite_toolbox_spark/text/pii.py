"""PII detection and redaction over a text corpus.

The reference (mthh/gpd_lite_toolbox) has no text surface; this family
comes from the builder's LLM-training-data brief: before text reaches a
training corpus, personally-identifying strings (emails, phone numbers,
SSNs, IP addresses) must be counted (for corpus audits) and replaced
with typed placeholder tokens (for the training copy).

Engine design
-------------
Everything is a native column expression — ``regexp_extract_all`` for
the counts and chained ``regexp_replace`` for the redaction — so the
whole scan is one zero-shuffle projection inside whole-stage codegen.
At 100 TB this is a single map pass over the corpus with filters and
column pruning reaching the parquet scan; there is no Python, no state,
and no exchange anywhere in the plan.

The patterns are deliberately restricted to the regex intersection of
Java (Spark) and RE2 (DuckDB): no lookaround, no backreferences, no
unicode classes. The DuckDB oracle (oracles.PII_SCAN) uses the same
pattern strings character-for-character.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) in application order. Order is part of
# the contract: replacements are applied top to bottom, and counts are
# always taken on the ORIGINAL text. Patterns are mutually disjoint on
# well-formed input (an SSN's 3-2-4 digit shape cannot match the 3-3-4
# phone shape; an IPv4 needs four dot-separated octets).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast(
        "bigint"
    )


def redact_expr(text: Column) -> Column:
    """The redacted text as a single chained-replace column expression
    (usable on batch and streaming frames alike)."""
    out = text
    for _name, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_scan(
    corpus: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    redact: bool = True,
) -> DataFrame:
    """Per-document PII audit: one row per input row with a count per
    PII class (on the original text) and, when ``redact``, the text
    with every match replaced by its typed placeholder.

    Columns: ``id, n_email, n_ssn, n_phone, n_ipv4, n_pii[, text]``.
    """
    text = F.col(text_col)
    counts = {name: _count(text, pat) for name, pat, _ in PII_PATTERNS}
    cols = [F.col(id_col).alias("id")]
    cols += [counts[name].alias(f"n_{name}") for name, _, _ in PII_PATTERNS]
    total = None
    for name, _, _ in PII_PATTERNS:
        total = counts[name] if total is None else total + counts[name]
    cols.append(total.alias("n_pii"))
    if redact:
        cols.append(redact_expr(text).alias("text"))
    return corpus.select(*cols)
