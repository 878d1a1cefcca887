"""OData serving semantics (`hobbes_spark/sources/odata_serve.py`):
$filter compilation to native predicates, option evaluation order,
and the response envelope the reference's clients consume
(`tools/visualizer/cli/src/ODataProvider.fs:18-22`)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hobbes_spark.pipeline import Pipeline
from hobbes_spark.sources.odata_serve import (
    apply_odata_options,
    odata_response,
    parse_filter,
)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return Pipeline.table(spark, sf_dir, "orders").df


# --------------------------------------------------------------------- #
# $filter parser
# --------------------------------------------------------------------- #


def test_filter_comparisons_and_logic(spark, orders):
    got = orders.filter(
        parse_filter("o_orderstatus eq 'O' and o_totalprice gt 100000")
    ).count()
    want = orders.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000)
    ).count()
    assert got == want > 0


def test_filter_or_not_parens(orders):
    expr = "not (o_orderstatus eq 'O') or o_orderpriority eq '1-URGENT'"
    got = orders.filter(parse_filter(expr)).count()
    want = orders.filter(
        ~(F.col("o_orderstatus") == "O") | (F.col("o_orderpriority") == "1-URGENT")
    ).count()
    assert got == want


def test_filter_string_functions(orders):
    got = orders.filter(
        parse_filter("contains(o_orderpriority, 'URGENT') "
                     "and startswith(o_orderstatus, 'F')")
    ).count()
    want = orders.filter(
        F.col("o_orderpriority").contains("URGENT")
        & F.col("o_orderstatus").startswith("F")
    ).count()
    assert got == want > 0


def test_filter_date_literals_reference_form(orders):
    # the reference's own feed spelling: `StartDate gt 2019-01-01Z`
    # (ODataProvider.fs:21) — bare date with a Z marker
    got = orders.filter(parse_filter("o_orderdate ge 1995-06-01Z")).count()
    want = orders.filter(F.col("o_orderdate") >= F.lit("1995-06-01")).count()
    assert got == want > 0


def test_filter_arithmetic_precedence(spark):
    df = spark.range(10).select(F.col("id").cast("long").alias("x"))
    # 2 add 3 mul x  ==  2 + (3*x)
    got = df.filter(parse_filter("2 add 3 mul x eq 17")).collect()
    assert [r["x"] for r in got] == [5]
    got = df.filter(parse_filter("x mod 3 eq 0 and x ne 0")).collect()
    assert sorted(r["x"] for r in got) == [3, 6, 9]


def test_filter_in_list(orders):
    got = orders.filter(
        parse_filter("o_orderstatus in ('F', 'P')")
    ).count()
    want = orders.filter(F.col("o_orderstatus").isin("F", "P")).count()
    assert got == want > 0


def test_filter_year_function_and_escaped_quote(spark, orders):
    got = orders.filter(parse_filter("year(o_orderdate) eq 1995")).count()
    want = orders.filter(F.year("o_orderdate") == 1995).count()
    assert got == want > 0
    df = spark.createDataFrame([("it's",), ("not",)], ["s"])
    assert df.filter(parse_filter("s eq 'it''s'")).count() == 1


def test_filter_nav_path_maps_to_dot_column(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "Iteration.Name"])
    got = df.filter(parse_filter("Iteration/Name eq 'b'")).collect()
    assert [r["id"] for r in got] == [2]


def test_filter_null_literal(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)], ["id", "v"])
    # OData: `v ne null` — SQL three-valued logic applies, like the spec
    assert df.filter(parse_filter("v ne null").isNotNull()).count() == 0


def test_filter_errors_name_the_problem():
    with pytest.raises(ValueError, match="tokenize"):
        parse_filter("o_x eq @bad")
    with pytest.raises(ValueError, match="trailing"):
        parse_filter("a eq 1 b")
    with pytest.raises(ValueError, match="takes 2 args"):
        parse_filter("contains(a)")


# --------------------------------------------------------------------- #
# Option application
# --------------------------------------------------------------------- #


def test_options_evaluation_order(orders):
    # $filter may use columns $select drops — filter must run first
    out = apply_odata_options(
        orders,
        {
            "$filter": "o_orderstatus eq 'F'",
            "$select": "o_orderkey,o_totalprice",
            "$orderby": "o_totalprice desc",
            "$top": "5",
        },
    )
    rows = out.collect()
    assert len(rows) == 5
    assert out.columns == ["o_orderkey", "o_totalprice"]
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_skip_top_page_through_ordered_set(spark):
    df = spark.range(100).select(F.col("id"))
    p1 = apply_odata_options(df, {"$orderby": "id", "$top": "10"})
    p2 = apply_odata_options(df, {"$orderby": "id", "$skip": "10", "$top": "10"})
    assert [r["id"] for r in p1.collect()] == list(range(10))
    assert [r["id"] for r in p2.collect()] == list(range(10, 20))


def test_filter_pushdown_reaches_scan(orders):
    # a SERVED filter is still a scan-pruning filter: PushedFilters
    # carries the comparison down to parquet
    out = apply_odata_options(
        orders.select("o_orderkey", "o_orderstatus"),
        {"$filter": "o_orderstatus eq 'F'"},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "o_orderstatus" in plan.split("PushedFilters:")[1].splitlines()[0]


# --------------------------------------------------------------------- #
# Envelope
# --------------------------------------------------------------------- #


def test_envelope_shape_and_count(spark):
    df = spark.range(30).select(
        F.col("id"),
        F.to_date(F.lit("2020-01-01")).alias("d"),
    )
    resp = odata_response(
        df,
        {"$filter": "id lt 20", "$orderby": "id", "$top": "3", "$count": "true"},
        context="https://svc/$metadata#things",
    )
    assert resp["@odata.context"] == "https://svc/$metadata#things"
    assert resp["@odata.count"] == 20  # after filter, before $top
    assert [r["id"] for r in resp["value"]] == [0, 1, 2]
    assert resp["value"][0]["d"] == "2020-01-01"  # JSON-safe cells
    assert "@odata.nextLink" not in resp


def test_envelope_server_paging_next_link(spark):
    df = spark.range(25).select(F.col("id"))
    resp = odata_response(
        df,
        {"$orderby": "id", "$skip": "10"},
        base_url="https://svc/things",
        page_size=10,
    )
    assert [r["id"] for r in resp["value"]] == list(range(10, 20))
    link = resp["@odata.nextLink"]
    assert link.startswith("https://svc/things?")
    assert "$skip=20" in link and "$orderby=id" in link
    # last page: no nextLink
    resp2 = odata_response(
        df,
        {"$orderby": "id", "$skip": "20"},
        base_url="https://svc/things",
        page_size=10,
    )
    assert [r["id"] for r in resp2["value"]] == list(range(20, 25))
    assert "@odata.nextLink" not in resp2


def test_envelope_roundtrips_through_ingest(spark):
    """Serve → re-ingest: the envelope this module emits is readable by
    the engine's own OData *client* (`sources/odata.read_odata`), the
    full loop the reference runs between its odata service and the
    visualizer."""
    import json

    from hobbes_spark.sources.odata import read_odata

    df = spark.range(12).select(F.col("id"), (F.col("id") * 2).alias("y"))
    pages = {}
    for skip in (0, 5, 10):
        pages[skip] = odata_response(
            df,
            {"$orderby": "id", "$skip": str(skip)},
            base_url="https://svc/things",
            page_size=5,
        )

    def fetch(url):
        if "$skip=10" in url:
            return json.dumps(pages[10])
        if "$skip=5" in url:
            return json.dumps(pages[5])
        return json.dumps(pages[0])

    back = read_odata(spark, "https://svc/things?$orderby=id", fetch)
    assert back.count() == 12
    assert sorted(r["y"] for r in back.collect()) == [i * 2 for i in range(12)]


# --------------------------------------------------------------------- #
# Review-hardening regressions
# --------------------------------------------------------------------- #


def test_client_top_never_over_delivered_across_pages(spark):
    """Server paging must respect the client's $top: following every
    nextLink delivers exactly $top rows in total, not page_size-sized
    refills forever."""
    df = spark.range(100).select(F.col("id"))
    options = {"$orderby": "id", "$top": "50"}
    served = []
    for _ in range(20):  # bounded loop guard
        resp = odata_response(
            df, options, base_url="https://svc/t", page_size=20
        )
        served.extend(r["id"] for r in resp["value"])
        link = resp.get("@odata.nextLink")
        if not link:
            break
        from urllib.parse import parse_qs, unquote, urlparse

        qs = parse_qs(urlparse(link).query)
        options = {k: unquote(v[0]) for k, v in qs.items()}
    assert served == list(range(50))  # exactly $top, in order


def test_div_integral_vs_fractional(spark):
    """OData `div` splits on operand type: integral -> truncating
    integral division, fractional -> fractional. Schema-aware when
    applied to a frame."""
    df = spark.range(10).select(
        F.col("id").alias("n"), (F.col("id").cast("double")).alias("x")
    )
    # 3 div 2 == 1 for Edm.Int64 — matches n == 3
    got = apply_odata_options(df, {"$filter": "n div 2 eq 1"})
    assert sorted(r["n"] for r in got.collect()) == [2, 3]
    # negative truncates toward zero: -7 div 2 == -3
    got2 = apply_odata_options(df, {"$filter": "0 sub 7 div 2 eq 0 sub 3"})
    assert got2.count() == 10  # constant-true predicate
    # fractional operand -> fractional division
    got3 = apply_odata_options(df, {"$filter": "x div 2 eq 1.5"})
    assert [r["n"] for r in got3.collect()] == [3]


def test_in_list_accepts_negative_literals(spark):
    df = spark.range(5).select((F.col("id") - 2).alias("d"))
    got = apply_odata_options(df, {"$filter": "d in (-2, -1, 2)"})
    assert sorted(r["d"] for r in got.collect()) == [-2, -1, 2]


def test_unsupported_options_raise(spark):
    df = spark.range(3)
    for bad in ("$skiptoken", "$search", "$apply", "$compute"):
        with pytest.raises(ValueError, match="not supported"):
            apply_odata_options(df, {bad: "x"})
    # $expand is satisfied by the flat model — must NOT raise
    assert apply_odata_options(df, {"$expand": "Iteration"}).count() == 3


def test_filter_parser_precedence_property(spark):
    """Property (round 6, VERDICT r5 item 8): UNPARENTHESIZED
    mixed-operator filters follow OData precedence — mul/div/mod over
    add/sub over comparisons over not over and over or. The random-tree
    test above parenthesizes every node, so it can never catch a
    precedence slip; here the reference is an independent
    precedence-climbing interpreter over Python ints (trunc-toward-zero
    div, C-style mod — the Edm semantics), evaluated row by row."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from hobbes_spark.sources.odata_serve import parse_filter

    rows = [(i, i % 7 - 3) for i in range(40)]  # x spans negatives
    df = spark.createDataFrame(rows, ["id", "x"]).cache()
    df.count()
    schema = dict(df.dtypes)

    CMP = ["eq", "ne", "gt", "ge", "lt", "le"]

    @st.composite
    def arith(draw):
        # operand (op operand)*, FLAT — precedence must sort it out;
        # div/mod right side forced to a nonzero literal (ANSI mode)
        def operand():
            return draw(st.sampled_from(["x"])) if draw(st.booleans()) \
                else str(draw(st.integers(min_value=0, max_value=8)))

        toks = [operand()]
        for _ in range(draw(st.integers(min_value=0, max_value=3))):
            op = draw(st.sampled_from(["mul", "div", "mod", "add", "sub"]))
            toks.append(op)
            toks.append(str(draw(st.integers(min_value=2, max_value=5)))
                        if op in ("div", "mod") else operand())
        return toks

    @st.composite
    def boolexpr(draw):
        toks: list[str] = []
        for i in range(draw(st.integers(min_value=1, max_value=4))):
            if i:
                toks.append(draw(st.sampled_from(["and", "or"])))
            if draw(st.booleans()):
                toks.append("not")
            toks += draw(arith()) + [draw(st.sampled_from(CMP))] + draw(arith())
        return toks

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def evaluate(toks, x):
        """Independent interpreter: or < and < not < cmp < add < mul."""
        pos = 0

        def peek():
            return toks[pos] if pos < len(toks) else None

        def advance():
            nonlocal pos
            pos += 1
            return toks[pos - 1]

        def p_or():
            v = p_and()
            while peek() == "or":
                advance()
                v = p_and() or v  # evaluate both: no short-circuit subtleties
            return v

        def p_and():
            v = p_not()
            while peek() == "and":
                advance()
                v = p_not() and v
            return v

        def p_not():
            if peek() == "not":
                advance()
                return not p_not()
            return p_cmp()

        def p_cmp():
            left = p_add()
            if peek() in CMP:
                op = advance()
                right = p_add()
                return {
                    "eq": left == right, "ne": left != right,
                    "gt": left > right, "ge": left >= right,
                    "lt": left < right, "le": left <= right,
                }[op]
            return left

        def p_add():
            v = p_mul()
            while peek() in ("add", "sub"):
                op = advance()
                r = p_mul()
                v = v + r if op == "add" else v - r
            return v

        def p_mul():
            v = p_operand()
            while peek() in ("mul", "div", "mod"):
                op = advance()
                r = p_operand()
                if op == "mul":
                    v = v * r
                elif op == "div":
                    v = trunc_div(v, r)  # Edm integral division
                else:
                    v = v - trunc_div(v, r) * r  # C-style mod (Spark %)
            return v

        def p_operand():
            t = advance()
            return x if t == "x" else int(t)

        out = p_or()
        assert pos == len(toks)
        return bool(out)

    @settings(
        max_examples=40, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(boolexpr())
    def check(toks):
        text = " ".join(toks)
        got = sorted(
            r["id"] for r in df.filter(parse_filter(text, schema)).collect()
        )
        want = sorted(i for i, x in rows if evaluate(toks, x))
        assert got == want, f"precedence divergence on {text!r}"

    check()
    df.unpersist()


def test_filter_parser_property_random_trees(spark):
    """Property: for randomly composed filter trees, parse_filter(text)
    selects exactly the rows of the equivalent hand-built Column."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    df = spark.createDataFrame(
        [(i, i % 7, f"s{i % 5}") for i in range(60)], ["id", "x", "s"]
    ).cache()
    df.count()

    # leaf comparisons: (odata text, equivalent Column builder)
    def leaf(draw):
        kind = draw(st.sampled_from(["num", "str", "fn"]))
        if kind == "num":
            op = draw(st.sampled_from(["eq", "ne", "gt", "ge", "lt", "le"]))
            v = draw(st.integers(min_value=-2, max_value=8))
            neg = "- " if v < 0 else ""
            text = f"x {op} {neg}{abs(v)}" if v < 0 else f"x {op} {v}"
            col = {
                "eq": F.col("x") == v, "ne": F.col("x") != v,
                "gt": F.col("x") > v, "ge": F.col("x") >= v,
                "lt": F.col("x") < v, "le": F.col("x") <= v,
            }[op]
            return text, col
        if kind == "str":
            v = draw(st.sampled_from(["s0", "s1", "s9"]))
            return f"s eq '{v}'", F.col("s") == v
        fn = draw(st.sampled_from(["contains", "startswith", "endswith"]))
        v = draw(st.sampled_from(["s", "0", "1", "zz"]))
        text = f"{fn}(s, '{v}')"
        col = {
            "contains": F.col("s").contains(v),
            "startswith": F.col("s").startswith(v),
            "endswith": F.col("s").endswith(v),
        }[fn]
        return text, col

    @st.composite
    def tree(draw, depth=0):
        if depth >= 3 or draw(st.booleans()):
            return leaf(draw)
        shape = draw(st.sampled_from(["and", "or", "not", "paren"]))
        if shape == "not":
            t, c_ = draw(tree(depth + 1))
            return f"not ({t})", ~c_
        if shape == "paren":
            t, c_ = draw(tree(depth + 1))
            return f"({t})", c_
        lt_, lc = draw(tree(depth + 1))
        rt_, rc = draw(tree(depth + 1))
        if shape == "and":
            return f"({lt_}) and ({rt_})", lc & rc
        return f"({lt_}) or ({rt_})", lc | rc

    from hobbes_spark.sources.odata_serve import parse_filter

    @settings(
        max_examples=25, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(tree())
    def check(tc):
        text, col = tc
        got = sorted(r["id"] for r in df.filter(parse_filter(text)).collect())
        want = sorted(r["id"] for r in df.filter(col).collect())
        assert got == want, text

    check()


def test_non_string_option_values_work_and_reject(spark):
    """Option values arriving as native JSON types (int $top, bool
    $count) coerce via str() instead of being silently ignored — and an
    unsupported option with a non-string value still RAISES (a
    non-string value must not sneak past _check_supported)."""
    df = spark.range(20).withColumnRenamed("id", "n")
    out = apply_odata_options(df, {"$orderby": "n", "$skip": 5, "$top": 3})
    assert [r["n"] for r in out.collect()] == [5, 6, 7]
    body = odata_response(df, {"$orderby": "n", "$top": 2, "$count": True})
    assert body["@odata.count"] == 20
    with pytest.raises(ValueError, match="not supported"):
        apply_odata_options(df, {"$skiptoken": 3})
