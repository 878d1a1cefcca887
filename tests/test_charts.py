"""Chart payload layer vs the reference's Chart.fs semantics
(`tools/visualizer/cli/src/Chart.fs:6-120`, `render`: 183-229)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from hobbes_spark.sources.charts import (
    CHART_TYPES,
    chart_spec,
    gauge_series,
    render_inline_html,
    series_table,
)


def _df(spark):
    rows = [
        ("2020-01-01", "a", 1.0, 10.0),
        ("2020-01-02", "a", 2.0, 20.0),
        ("2020-01-03", "b", 3.0, 30.0),
    ]
    return spark.createDataFrame(rows, "d string, g string, x double, y double")


# --------------------------------------------------------------------- #
# series_table — the DataMatrix.AsTable analog
# --------------------------------------------------------------------- #

def test_series_table_keyed_and_ordinal(spark):
    df = _df(spark)
    t = series_table(df, "d")
    assert [n for n, _ in t] == ["g", "x", "y"]
    assert t[1] == ("x", [("2020-01-01", 1.0), ("2020-01-02", 2.0),
                          ("2020-01-03", 3.0)])
    # ordinal keys when unkeyed (un-indexed DataMatrix)
    t0 = series_table(df.select("x"))
    assert t0 == [("x", [(0, 1.0), (1, 2.0), (2, 3.0)])]
    # compound keys dot-join (the KeyType.List branch, Chart.fs:186-195)
    tc = series_table(df, ["d", "g"])
    assert tc[0][1][0][0] == "2020-01-01.a"
    with pytest.raises(ValueError, match="key column"):
        series_table(df, "nope")


def test_series_table_encodes_dates_and_decimals(spark):
    df = spark.sql(
        "SELECT DATE '2020-03-01' AS d, CAST(1.5 AS DECIMAL(5,2)) AS v"
    )
    t = series_table(df, "d")
    assert t == [("v", [("2020-03-01", 1.5)])]


# --------------------------------------------------------------------- #
# plotly-backed types (Chart.fs:43-79, 106-118)
# --------------------------------------------------------------------- #

def test_line_scatter_area_column_bar_traces(spark):
    t = series_table(_df(spark).select("d", "x", "y"), "d")
    fig = chart_spec(t, "line", title="T")
    assert fig["layout"] == {"showlegend": True, "title": "T"}
    assert [tr["name"] for tr in fig["data"]] == ["x", "y"]
    assert fig["data"][0]["mode"] == "lines"
    assert fig["data"][0]["x"] == ["2020-01-01", "2020-01-02", "2020-01-03"]
    assert fig["data"][1]["y"] == [10.0, 20.0, 30.0]
    assert chart_spec(t, "scatter")["data"][0]["mode"] == "markers"
    assert chart_spec(t, "area")["data"][0]["fill"] == "tozeroy"
    assert chart_spec(t, "column")["data"][0]["type"] == "bar"
    assert chart_spec(t, "bar")["data"][0]["orientation"] == "h"
    assert chart_spec(t, "line", legend=False)["layout"]["showlegend"] is False


def test_candlestick_takes_first_five_series_positionally(spark):
    # Chart.fs:69-79 — Seq.take 5, positional (x, open, high, low, close)
    rows = [(i, float(i), i + 2.0, i - 1.0, i + 1.0, 99.0) for i in range(4)]
    df = spark.createDataFrame(
        rows, "t int, open double, high double, low double, close double, extra double"
    )
    fig = chart_spec(series_table(df), "candlestick")
    tr = fig["data"][0]
    assert tr["type"] == "candlestick"
    assert tr["x"] == [0, 1, 2, 3]
    assert tr["high"] == [2.0, 3.0, 4.0, 5.0]
    assert "extra" not in json.dumps(fig)  # sixth series dropped
    with pytest.raises(ValueError, match="5 series"):
        chart_spec(series_table(df.select("t", "open")), "candlestick")


def test_pie_uses_head_series_only(spark):
    # Chart.fs:106-109 — Seq.head
    t = series_table(_df(spark).select("d", "x", "y"), "d")
    fig = chart_spec(t, "pie")
    assert len(fig["data"]) == 1
    assert fig["data"][0]["labels"] == ["2020-01-01", "2020-01-02", "2020-01-03"]
    assert fig["data"][0]["values"] == [1.0, 2.0, 3.0]


def test_bubble_y_and_size(spark):
    t = series_table(_df(spark).select("d", "x", "y"), "d")
    fig = chart_spec(t, "bubble")
    tr = fig["data"][0]
    assert tr["y"] == [1.0, 2.0, 3.0]
    assert tr["marker"]["size"] == [10.0, 20.0, 30.0]
    with pytest.raises(ValueError, match="2 series"):
        chart_spec([("only", [(0, 1)])], "bubble")


# --------------------------------------------------------------------- #
# google-backed types (Chart.fs:80-105, 119-166)
# --------------------------------------------------------------------- #

def test_gauge_averages_and_truncates(spark):
    # Chart.fs:96-105 — averageBy ... |> int (truncation, not rounding)
    t = [("cpu", [(0, 91.9), (1, 92.9)]), ("mem", [(0, 10.2), (1, 11.0)]),
         ("empty", [])]
    g = chart_spec(t, "gauge", title="vitals")
    assert g["chartType"] == "Gauge"
    rows = {r[0]["v"]: r[1]["v"] for r in g["dataTable"]["rows"]}
    assert rows == {"cpu": 92, "mem": 10}  # empty series filtered
    # the reference's fixed Options block (Chart.fs:85-93)
    for k, v in {"width": 400, "height": 120, "redFrom": 90, "redTo": 100,
                 "yellowFrom": 75, "yellowTo": 90, "minorTicks": 5}.items():
        assert g["options"][k] == v
    with pytest.raises(ValueError, match="empty"):
        chart_spec([("a", [])], "gauge")


def test_gauge_dataframe_path_aggregates_in_spark(spark):
    df = spark.range(100).select(
        F.col("id").cast("double").alias("v"),
        (F.col("id") * 2).cast("double").alias("w"),
        F.lit(None).cast("double").alias("allnull"),
        F.lit("s").alias("label_col"),
    )
    dials = {r["label"]: r["value"] for r in gauge_series(df).collect()}
    assert dials == {"v": 49, "w": 99}  # avg 49.5→49, 99.0→99; all-NULL dropped
    g = chart_spec(df, "gauge")
    assert {r[0]["v"]: r[1]["v"] for r in g["dataTable"]["rows"]} == {"v": 49, "w": 99}
    with pytest.raises(ValueError, match="no numeric"):
        gauge_series(df.select("label_col"))


def test_gauge_series_quotes_dotted_names(spark):
    df = spark.range(10).select(F.col("id").cast("double").alias("a.b"))
    assert gauge_series(df).collect()[0]["label"] == "a.b"


def test_calendar_dates_from_first_series_values(spark):
    # Chart.fs:119-139 — series VALUES (not keys): first are the dates
    df = spark.createDataFrame(
        [(i, dt.date(2020, 1, i + 1), float(i)) for i in range(3)],
        "k int, d date, v double",
    )
    g = chart_spec(series_table(df, "k"), "calendar")
    assert g["chartType"] == "Calendar"
    assert [r[0]["v"] for r in g["dataTable"]["rows"]] == [
        "2020-01-01", "2020-01-02", "2020-01-03"]
    assert [r[1]["v"] for r in g["dataTable"]["rows"]] == [0.0, 1.0, 2.0]
    with pytest.raises(TypeError, match="calendar date"):
        chart_spec([("d", [(0, 7)]), ("v", [(0, 1.0)])], "calendar")


def test_geo_countries_and_float_ladder(spark):
    # Chart.fs:140-161 — first series values → country strings, second →
    # floats via the IConvertible ladder (strings parse; junk fails loudly)
    t = [("country", [(0, "Denmark"), (1, "Sweden")]),
         ("v", [(0, "12.5"), (1, 3)])]
    g = chart_spec(t, "geo")
    assert g["chartType"] == "GeoChart"
    assert g["dataTable"]["rows"] == [
        [{"v": "Denmark"}, {"v": 12.5}], [{"v": "Sweden"}, {"v": 3.0}]]
    with pytest.raises((TypeError, ValueError)):
        chart_spec([("c", [(0, "DK")]), ("v", [(0, "not-a-number")])], "geo")


def test_table_all_series_column_major(spark):
    t = series_table(_df(spark).select("d", "g", "x"), "d")
    g = chart_spec(t, "table")
    assert g["chartType"] == "Table"
    assert [c["label"] for c in g["dataTable"]["cols"]] == ["g", "x"]
    assert g["dataTable"]["rows"][0] == [{"v": "a"}, {"v": 1.0}]
    # ragged series pad with None
    g2 = chart_spec([("a", [(0, 1), (1, 2)]), ("b", [(0, 9)])], "table")
    assert g2["dataTable"]["rows"][1] == [{"v": 2}, {"v": None}]


# --------------------------------------------------------------------- #
# envelope
# --------------------------------------------------------------------- #

def test_unknown_type_rejected(spark):
    with pytest.raises(ValueError, match="chart type"):
        chart_spec([("a", [(0, 1)])], "sparkline")
    assert set(CHART_TYPES) >= {
        "scatter", "line", "column", "area", "candlestick", "pie",
        "bubble", "gauge", "calendar", "geo", "table"}  # ChartType, Chart.fs:6-17


def test_render_inline_html_picks_backend(spark):
    plotly = render_inline_html(chart_spec([("a", [(0, 1)])], "line"), "p1")
    assert "Plotly.newPlot('p1'" in plotly and '<div id="p1">' in plotly
    google = render_inline_html(
        chart_spec([("a", [(0, 50.0)])], "gauge"), "g_1")
    assert "google.visualization[payload.chartType]" in google
    assert '<div id="g_1">' in google
    # payload embeds as valid JSON
    blob = plotly.split("var fig = ")[1].split(";\n")[0]
    assert json.loads(blob)["data"][0]["y"] == [1]
    # div_id lands in BOTH an HTML attribute and a JS string literal —
    # anything outside the identifier charset is rejected (ADVICE r5)
    for bad in ("g&1", "x'); alert(1);//", 'a" onload="x', ""):
        with pytest.raises(ValueError, match="div_id"):
            render_inline_html(chart_spec([("a", [(0, 1)])], "line"), bad)


def test_render_inline_html_script_injection_safe(spark):
    """A payload value containing '</script>' must not terminate the
    script element (ADVICE r5: chart text can carry attacker-influenced
    strings such as commit messages)."""
    spec = chart_spec([("</script><script>alert(1)</script>", [(0, 1)])], "line")
    html = render_inline_html(spec, "safe")
    body = html.split("<script>", 1)[1]
    assert "</script>" not in body.rsplit("</script>", 1)[0]  # only the closer remains
    assert "<\\/script>" in html  # escaped for script context
    # the escaped blob still round-trips as the original JSON
    blob = html.split("var fig = ")[1].split(";\n")[0]
    assert json.loads(blob)["data"][0]["name"].startswith("</script>")
