"""Data splitters — carve a table into batch slices by predicate.

Reference: ``SparkDataSplitter``
(great_expectations/execution_engine/split_and_sample/
sparkdf_data_splitter.py, ≈400 LoC, unverified — SURVEY.md §2.2): the
reference implements each split as a filter over the full DataFrame; date
splits there convert via per-row ``F.year``/``F.month``/… comparisons, and
``split_on_hashed_column`` uses a *Python UDF* around ``hashlib``. Ours keeps
every predicate a native Column expression — ``F.md5`` / ``F.crc32`` are
JVM-side — so splits prune partitions and push down to the scan (at 10^12
rows a split predicate that can't reach the Iceberg manifest is a full-table
scan per batch).

Each ``split_on_*`` returns the filtered DataFrame. ``list_split_values``
enumerates the distinct batch identifiers (the data-connector "discovery"
step, SURVEY.md §2.1 filesystem-discovery row).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

_DATE_PARTS = ("year", "month", "day", "hour", "minute")


def split_on_whole_table(df: DataFrame) -> DataFrame:
    return df


def split_on_column_value(
    df: DataFrame, column: str, batch_identifiers: dict[str, Any]
) -> DataFrame:
    return df.filter(F.col(column).eqNullSafe(F.lit(batch_identifiers[column])))


def _date_part_predicate(column: str, parts: dict[str, int]) -> Column:
    exprs = []
    for part, value in parts.items():
        if part not in _DATE_PARTS:
            raise ValueError(f"unsupported date part {part!r}")
        exprs.append(getattr(F, part)(F.col(column)) == F.lit(int(value)))
    pred = exprs[0]
    for e in exprs[1:]:
        pred = pred & e
    return pred


def split_on_date_parts(
    df: DataFrame, column: str, batch_identifiers: dict[str, Any]
) -> DataFrame:
    """Generic date-part split; ``batch_identifiers`` may nest under the
    column name ({"ts": {"year": 2025, "month": 6}}) or be flat."""
    parts = batch_identifiers.get(column, batch_identifiers)
    return df.filter(_date_part_predicate(column, parts))


def split_on_year(df: DataFrame, column: str, batch_identifiers: dict) -> DataFrame:
    return split_on_date_parts(df, column, batch_identifiers)


def split_on_year_and_month(
    df: DataFrame, column: str, batch_identifiers: dict
) -> DataFrame:
    return split_on_date_parts(df, column, batch_identifiers)


def split_on_year_and_month_and_day(
    df: DataFrame, column: str, batch_identifiers: dict
) -> DataFrame:
    return split_on_date_parts(df, column, batch_identifiers)


def split_on_divided_integer(
    df: DataFrame, column: str, divisor: int, batch_identifiers: dict[str, Any]
) -> DataFrame:
    group = int(batch_identifiers[column])
    return df.filter(
        F.floor(F.col(column).cast("long") / F.lit(int(divisor))) == F.lit(group)
    )


def split_on_mod_integer(
    df: DataFrame, column: str, mod: int, batch_identifiers: dict[str, Any]
) -> DataFrame:
    residue = int(batch_identifiers[column])
    return df.filter(F.pmod(F.col(column).cast("long"), F.lit(int(mod))) == residue)


def split_on_multi_column_values(
    df: DataFrame, column_names: list[str], batch_identifiers: dict[str, Any]
) -> DataFrame:
    pred = None
    for c in column_names:
        e = F.col(c).eqNullSafe(F.lit(batch_identifiers[c]))
        pred = e if pred is None else (pred & e)
    return df.filter(pred)


def split_on_hashed_column(
    df: DataFrame,
    column: str,
    hash_digits: int,
    batch_identifiers: dict[str, Any],
) -> DataFrame:
    """Rows whose md5(column) hex digest ENDS with the given digits.

    Reference uses a hashlib Python UDF; ``F.md5`` is bit-identical for the
    utf8 string encoding and stays in codegen.
    """
    want = str(batch_identifiers.get("hash_value", batch_identifiers.get(column)))
    return df.filter(
        F.substring(F.md5(F.col(column).cast("string")), 33 - int(hash_digits),
                    int(hash_digits)) == F.lit(want)
    )


# ---------------------------------------------------------------- discovery

def list_split_values(
    df: DataFrame, splitter_method: str, column: str | None = None, **kwargs: Any
) -> list[dict[str, Any]]:
    """Enumerate distinct batch identifiers a splitter would produce.

    One ``groupBy().agg()`` job (shuffle on the identifier — tiny output);
    replaces the reference's path-regex DataConnector discovery with table
    metadata (SURVEY.md §2.1).
    """
    if splitter_method in ("split_on_whole_table", "whole_table"):
        return [{}]
    if splitter_method.endswith("column_value"):
        rows = df.select(column).distinct().collect()
        return [{column: r[0]} for r in rows]
    if "date" in splitter_method or splitter_method.startswith("split_on_year"):
        parts = kwargs.get("date_parts")
        if parts is None:
            name = splitter_method.removeprefix("split_on_").removeprefix(
                "date_parts"
            )
            parts = [p for p in _DATE_PARTS if p in name] or ["year", "month"]
        cols = [getattr(F, p)(F.col(column)).alias(p) for p in parts]
        rows = df.select(*cols).distinct().orderBy(*parts).collect()
        return [{column: r.asDict()} for r in rows]
    if splitter_method.endswith("divided_integer"):
        d = int(kwargs["divisor"])
        rows = (
            df.select(F.floor(F.col(column).cast("long") / d).alias("g"))
            .distinct().orderBy("g").collect()
        )
        return [{column: r["g"]} for r in rows]
    if splitter_method.endswith("mod_integer"):
        m = int(kwargs["mod"])
        rows = (
            df.select(F.pmod(F.col(column).cast("long"), F.lit(m)).alias("g"))
            .distinct().orderBy("g").collect()
        )
        return [{column: r["g"]} for r in rows]
    if splitter_method.endswith("multi_column_values"):
        cols = kwargs["column_names"]
        rows = df.select(*cols).distinct().collect()
        return [r.asDict() for r in rows]
    if splitter_method.endswith("hashed_column"):
        n = int(kwargs["hash_digits"])
        rows = (
            df.select(
                F.substring(F.md5(F.col(column).cast("string")), 33 - n, n).alias("h")
            ).distinct().orderBy("h").collect()
        )
        return [{"hash_value": r["h"]} for r in rows]
    raise ValueError(f"unknown splitter {splitter_method!r}")
