"""PII detection / redaction operators — pure JVM-side expressions.

The scrubbing pass every pre-training curation pipeline runs before
anything else (cf. the C4 / RefinedWeb / Dolma cleaning steps; in the
reference's vocabulary this is the ``column_values_to_not_match_regex``
family specialised to the classic PII classes, reference
``great_expectations/expectations/metrics/column_map_metrics/`` —
unverified upstream citation per SURVEY.md §0):

- **email** addresses
- **ipv4** addresses (per-octet 0–255 range enforced in the pattern)
- **phone** numbers (NANP-ish + international prefix, separator-tolerant)
- **ssn** — US social security shaped ``###-##-####`` (no lookahead
  area/group zero-exclusion: RE2 — and therefore the DuckDB oracle — has
  no lookahead, so the pattern over-matches 000-areas; acceptable for a
  scrubbing gate, documented false-positive direction)
- **credit_card** — 13–19 digits with optional space/dash separators,
  **Luhn-verified** via higher-order functions (no Python in the hot
  path; invalid checksums are NOT counted)

Every pattern is RE2-compatible (no lookbehind/lookahead/backreference)
so the identical regex string runs unchanged on Spark (Java regex) and
the DuckDB oracle — the driver value-hashes both sides.

Scale shape: everything here is a per-row codegen expression — map-only,
no shuffle, no Python. A ``scan_pii(df).filter(...)`` runs inside the
same whole-stage-codegen span as the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: type -> RE2-safe pattern (identical semantics under Java regex and RE2).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"
    ),
    # +country? (area) local-local, NANP-core: the area group is EXACTLY 3
    # digits behind a \b and the first separator is mandatory — together
    # these stop the pattern from firing inside longer digit runs (card
    # numbers, IDs). Some international groupings (e.g. +44 20 7946 0958)
    # are missed by design; false negatives beat card-number false hits.
    "phone": (
        r"(?:\+[0-9]{1,3}[ .\-]?)?\(?\b[0-9]{3}\)?[ .\-][0-9]{3}[ .\-]?"
        r"[0-9]{4}\b"
    ),
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "credit_card": r"\b[0-9](?:[ \-]?[0-9]){12,18}\b",
}

#: redaction order — email first (contains digits/dots that later patterns
#: could partially shadow), then the digit-run patterns longest-first so a
#: card number is never half-eaten by the phone pattern.
REDACT_ORDER = ["email", "credit_card", "ssn", "ipv4", "phone"]

# a PII class that is countable but silently un-redactable would fail in
# the one direction this module promises not to — keep the two in lockstep
assert set(REDACT_ORDER) == set(PII_PATTERNS), (
    "REDACT_ORDER must cover every PII_PATTERNS class"
)


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def luhn_valid(candidate: Column) -> Column:
    """Luhn checksum over the digits of ``candidate`` — pure HOF chain
    (strip non-digits → reverse → double every 2nd digit, −9 if >9 → sum
    % 10 == 0), plus the 13–19 digit length gate. The same arithmetic is
    replayed by the DuckDB oracle with ``list_transform``/``list_sum``."""
    digits = F.regexp_replace(candidate, "[^0-9]", "")
    chars = F.filter(F.split(F.reverse(digits), ""), lambda ch: ch != F.lit(""))
    terms = F.transform(
        chars,
        lambda ch, i: F.when(
            i % 2 == 1,
            F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9)
            .otherwise(ch.cast("int") * 2),
        ).otherwise(ch.cast("int")),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return (total % 10 == 0) & F.length(digits).between(13, 19)


def _check_types(types: list[str] | None) -> list[str]:
    ts = list(PII_PATTERNS) if types is None else list(types)
    unknown = [t for t in ts if t not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII types {unknown}; known: {sorted(PII_PATTERNS)}"
        )
    return ts


def pii_matches(text_col: str | Column, pii_type: str) -> Column:
    """Array of matches of one PII class. ``credit_card`` matches are
    Luhn-filtered — a 16-digit run with a bad checksum is NOT PII."""
    _check_types([pii_type])
    found = F.regexp_extract_all(_c(text_col), F.lit(PII_PATTERNS[pii_type]), 0)
    if pii_type == "credit_card":
        found = F.filter(found, luhn_valid)
    return found


def pii_count(text_col: str | Column, pii_type: str) -> Column:
    """Match count of one PII class (0 on null text; ``size`` alone
    returns -1 for null arrays under non-ANSI Spark semantics)."""
    c = _c(text_col)
    return F.when(
        c.isNotNull(), F.size(pii_matches(c, pii_type))
    ).otherwise(F.lit(0))


def pii_total(text_col: str | Column, types: list[str] | None = None) -> Column:
    """Total PII matches across ``types`` (default: all classes)."""
    ts = _check_types(types)
    total = F.lit(0)
    for t in ts:
        total = total + pii_count(text_col, t)
    return total


def pii_types_found(text_col: str | Column,
                    types: list[str] | None = None) -> Column:
    """Comma-joined list of the PII classes present — the observed value
    surfaced in violation rows (e.g. ``"email,ipv4"``; ``""`` if clean)."""
    ts = _check_types(types)
    labels = [
        F.when(pii_count(text_col, t) > 0, F.lit(t)) for t in ts
    ]
    return F.concat_ws(",", F.filter(F.array(*labels), lambda x: x.isNotNull()))


def scan_pii(
    df: DataFrame,
    text_col: str = "text",
    types: list[str] | None = None,
) -> DataFrame:
    """Append ``pii_<type>_count`` columns plus ``pii_total_count``.

    Map-only: composes with predicate pushdown, so
    ``scan_pii(df).filter("pii_total_count = 0")`` is one codegen stage.
    """
    ts = _check_types(types)
    out = df
    total = F.lit(0)
    for t in ts:
        cnt = pii_count(F.col(text_col), t)
        out = out.withColumn(f"pii_{t}_count", cnt)
        total = total + F.col(f"pii_{t}_count")
    return out.withColumn("pii_total_count", total)


def redact_pii(
    text_col: str | Column,
    types: list[str] | None = None,
    replacement: str = "[{TYPE}]",
) -> Column:
    """Redacted text: every match replaced with ``replacement`` (the
    ``{TYPE}`` placeholder becomes the upper-cased class name).

    Redaction is PATTERN-based for all classes including credit_card —
    a conditional (Luhn-gated) replacement is not expressible as a single
    regexp_replace, and for privacy the right failure direction is
    over-redaction: a digit run that LOOKS like a card is removed even
    when its checksum is bad. Counting (:func:`pii_count`) stays
    Luhn-verified, so gates don't fire on non-PII digit runs.

    Replacement order is :data:`REDACT_ORDER` (email before the digit
    patterns; card before phone) so no class half-consumes another's
    match.
    """
    ts = _check_types(types)
    out = _c(text_col)
    for t in REDACT_ORDER:
        if t in ts:
            out = F.regexp_replace(
                out, PII_PATTERNS[t], replacement.replace("{TYPE}", t.upper())
            )
    return out
