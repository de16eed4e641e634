"""URL extraction, domain statistics, and blocklist gating.

The provenance/compliance pass of a web-corpus pipeline: pull the URLs a
document cites, reduce them to registrable-host form, report corpus-level
domain frequencies, and flag documents that reference blocklisted domains
(cf. the URL-blocklist filtering steps of C4/RefinedWeb; the reference has
no URL operators — extension per SURVEY.md §2.11's curation family).

Parity: the URL and host regexes are RE2-safe and used verbatim by the
DuckDB oracle (Spark's ``parse_url`` has no DuckDB counterpart, so host
extraction is a regex both engines run identically).

Scale shape: extraction is per-row codegen (map-only). ``domain_counts``
is one shuffle of slim ``(domain)`` rows with map-side partial
aggregation. ``flag_blocklisted_domains`` ships only ``(id, domain)``
pairs into a semi-join — the blocklist side is AQE-broadcast when small
(``broadcast=None`` lets AQE decide; True/False force/forbid, the
``exist_in`` pattern) — and the corpus text never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: scheme-anchored URL; stops at whitespace and common delimiters.
URL_PATTERN = r"https?://[^\s<>\"')\]]+"

#: group 1 = host: skip optional userinfo, stop at port/path/query/frag.
#: ``,`` is excluded from the host class — it is never legal in a hostname,
#: and an unspaced token like ``https://evil.org,mirror.com`` must yield
#: host ``evil.org`` (not a phantom ``evil.org,mirror.com`` that would also
#: evade the blocklist gate). Imported verbatim by the DuckDB oracle.
HOST_PATTERN = r"^https?://(?:[^/@?#]*@)?([^/:?#,]+)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def extract_urls(text_col: str | Column) -> Column:
    """Array of URLs found in the text (empty array on no match)."""
    return F.regexp_extract_all(_c(text_col), F.lit(URL_PATTERN), 0)


#: trailing prose punctuation that can never end a hostname — stripped
#: from the HOST (not the URL: ``,`` etc. are legal in paths) so
#: ``see https://evil.org, here`` neither mints a phantom domain nor
#: slips past the blocklist gate. Shared verbatim with the DuckDB oracle.
HOST_TRAILING_PUNCT = r"[.,;:!?]+$"


def _normalize_host(host: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(F.lower(host), HOST_TRAILING_PUNCT, ""),
        r"^www\.", "",
    )


def url_domain(url_col: str | Column) -> Column:
    """Normalized host of one URL: lower-cased; ``www.`` prefix, any
    userinfo/port, and trailing prose punctuation (dots, commas, ...)
    stripped. Empty string when the URL has no host."""
    return _normalize_host(F.regexp_extract(_c(url_col), HOST_PATTERN, 1))


def extract_domains(text_col: str | Column, distinct: bool = True) -> Column:
    """Normalized domains referenced by the text (per-row codegen)."""
    doms = F.transform(extract_urls(text_col), url_domain)
    doms = F.filter(doms, lambda d: d != F.lit(""))
    return F.array_distinct(doms) if distinct else doms


def domain_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level domain table: ``(domain, n_urls, n_docs)``.

    ``n_urls`` counts every URL occurrence; ``n_docs`` counts distinct
    documents citing the domain. One explode + one shuffle of slim rows.
    """
    urls = df.select(
        F.col(id_col).alias("__id"),
        F.explode(extract_urls(F.col(text_col))).alias("__url"),
    )
    return (
        urls.select("__id", url_domain(F.col("__url")).alias("domain"))
        .filter(F.col("domain") != "")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("__id").alias("n_docs"),
        )
    )


def flag_blocklisted_domains(
    df: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocklist_col: str = "domain",
    flag_col: str = "blocklisted",
    broadcast: bool | None = None,
) -> DataFrame:
    """Append boolean ``flag_col``: the document cites ≥1 blocklisted
    domain. Matching is on normalized hosts (:func:`url_domain` applied
    to both sides). ``broadcast=None`` → AQE decides; True forces the
    hint (only for known-small blocklists); False forbids it."""
    bl = blocklist.select(
        _normalize_host(F.col(blocklist_col)).alias("__bl_domain")
    ).distinct()
    if broadcast is True:
        bl = F.broadcast(bl)
    elif broadcast is False:
        bl = bl.hint("merge")

    doc_domains = df.select(
        F.col(id_col).alias("__id"),
        F.explode(extract_domains(F.col(text_col))).alias("__domain"),
    )
    hits = (
        doc_domains.join(bl, doc_domains["__domain"] == bl["__bl_domain"],
                         "left_semi")
        .select("__id")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    out = df.join(hits, df[id_col] == hits["__id"], "left").drop("__id")
    return out.withColumn(
        flag_col, F.coalesce(F.col("__hit"), F.lit(False))
    ).drop("__hit")
