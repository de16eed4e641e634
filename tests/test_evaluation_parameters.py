"""Evaluation parameters — ``{"$PARAMETER": name}`` kwargs resolved at
validation time (reference: great_expectations/core/evaluation_parameters.py,
e.g. a row count recorded by an upstream table's run)."""

from __future__ import annotations

import pytest

from great_expectations_spark import (
    ExpectationSuite,
    SuiteRunner,
    bind_evaluation_parameters,
)


def _suite():
    s = ExpectationSuite("p")
    s.add("expect_table_row_count_to_equal", value={"$PARAMETER": "upstream_count"})
    s.add("expect_column_values_to_be_in_set", column="role",
          value_set={"$PARAMETER": "allowed_roles"})
    return s


def test_bind_substitutes_and_changes_hash():
    s = _suite()
    bound = bind_evaluation_parameters(
        s, {"upstream_count": 4, "allowed_roles": ["user", "assistant"]}
    )
    assert bound.expectations[0].kwargs["value"] == 4
    assert bound.expectations[1].kwargs["value_set"] == ["user", "assistant"]
    assert bound.suite_hash != s.suite_hash
    # original untouched
    assert s.expectations[0].kwargs["value"] == {"$PARAMETER": "upstream_count"}


def test_missing_parameter_raises():
    with pytest.raises(KeyError, match="upstream_count"):
        bind_evaluation_parameters(_suite(), {"allowed_roles": []})


def test_validate_with_parameters(spark):
    df = spark.createDataFrame(
        [("user",), ("assistant",), ("user",), ("tool",)], "role string"
    )
    res = SuiteRunner(spark).validate(
        df, _suite(),
        evaluation_parameters={
            "upstream_count": 4,
            "allowed_roles": ["user", "assistant", "tool"],
        },
    )
    assert res.success
    res2 = SuiteRunner(spark).validate(
        df, _suite(),
        evaluation_parameters={
            "upstream_count": 3,
            "allowed_roles": ["user"],
        },
    )
    assert not res2.success
    assert sum(1 for r in res2.results if not r.success) == 2
