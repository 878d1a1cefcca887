"""Data-quality validation: each check type against planted violations,
and the one-pass plan contract."""

import pytest

from hobbes_spark.functions import validate as V


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, 10.0, "F", "1-URGENT"),
        (2, -5.0, "O", "2-HIGH"),      # range violation
        (2, 20.0, "X", "3-MEDIUM"),    # dup id + bad status
        (None, 30.0, "P", "oops"),     # null id + bad priority
    ]
    return spark.createDataFrame(rows, "id long, price double, status string, prio string")


def test_each_check_counts_planted_violations(spark, dirty):
    report = V.validate(
        dirty,
        [
            V.not_null("id"),
            V.unique("id"),
            V.in_range("price", 0.0, 100.0),
            V.accepted_values("status", ["F", "O", "P"]),
            V.matches("prio", "^[1-5]-"),
        ],
    )
    got = {r["check"]: (r["n_violations"], r["passed"]) for r in report.collect()}
    assert got["not_null(id)"] == (1, False)
    assert got["unique(id)"] == (1, False)       # one extra copy of id=2
    assert got["in_range(price,0.0,100.0)"] == (1, False)
    assert got["accepted_values(status,[F,O,P])"] == (1, False)
    assert got["matches(prio,^[1-5]-)"] == (1, False)


def test_clean_table_passes_and_null_skips_row_checks(spark):
    rows = [(1, None, None)]  # NULLs are not range/enum violations
    df = spark.createDataFrame(rows, "id long, price double, status string")
    report = V.validate(
        df,
        [V.in_range("price", 0, 1), V.accepted_values("status", ["F"])],
    )
    assert all(r["passed"] for r in report.collect())


def test_validate_is_one_aggregate_pass(spark, dirty):
    report = V.validate(
        dirty,
        [V.not_null("id"), V.in_range("price", 0, 100), V.matches("prio", "^[1-5]-")],
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    # one scan feeding one (partial+final) aggregate — not N scans
    assert plan.count("Scan ExistingRDD") == 1


def test_validate_empty_frame_passes_all_checks(spark):
    """SUM over zero rows is NULL — the gate must report 0 violations /
    passed=true on an empty frame, never a NULL that slips both a
    `passed == False` filter and a `passed == True` gate."""
    from hobbes_spark.functions.validate import in_range, not_null, unique, validate

    empty = spark.createDataFrame([], "x bigint, y string")
    rows = validate(
        empty, [not_null("x"), in_range("x", 0, 10), unique("x", "y")]
    ).collect()
    assert all(r["n_violations"] == 0 for r in rows)
    assert all(r["passed"] is True for r in rows)


def test_validate_handles_dot_path_columns(spark):
    from hobbes_spark.functions.validate import not_null, unique, validate

    df = spark.createDataFrame([(1, "a"), (2, None)], ["id", "Iteration.Name"])
    rows = {r["check"]: r["n_violations"] for r in validate(
        df, [not_null("Iteration.Name"), unique("Iteration.Name")]
    ).collect()}
    assert rows["not_null(Iteration.Name)"] == 1
