"""Code-corpus ingest family (round 11): markdown-to-text, notebook
cell extraction, code-likeness routing."""

import json

from pyspark.sql import functions as F


class TestMarkdownToText:
    def _t(self, spark, md):
        from hobbes_spark.functions.markdown import markdown_to_text

        df = spark.createDataFrame([(md,)], "raw string")
        return df.select(markdown_to_text("raw").alias("t")).first()["t"]

    def test_fences_drop_code_body_survives(self, spark):
        got = self._t(spark, "```python\ndef f(x):\n    return x\n```\n")
        assert got == "def f(x):\nreturn x"

    def test_links_images_emphasis_headers(self, spark):
        got = self._t(spark, (
            "# Title\n\nSome **bold** and *em* with [a link](https://x) "
            "and ![alt](u.png), ref [txt][1].\n\n[1]: https://ref\n"))
        assert got == "Title\n\nSome bold and em with a link and alt, ref txt."

    def test_quotes_lists_tables_setext(self, spark):
        got = self._t(spark, (
            "> quoted\n> > nested\n\n- item\n2) ordered\n\n"
            "a | b\n---|---\n1 | 2\n\nSetext\n=====\n"))
        assert got == "quoted\nnested\n\nitem\nordered\n\na b\n\n1 2\n\nSetext"

    def test_snake_case_survives_null_propagates(self, spark):
        assert self._t(spark, "keep snake_case and `inline`") == \
            "keep snake_case and inline"
        from hobbes_spark.functions.markdown import markdown_to_text

        df = spark.createDataFrame([(None,)], "raw string")
        assert df.select(markdown_to_text("raw").alias("t")).first()["t"] is None


class TestNotebookCells:
    def test_array_string_and_mixed_sources(self, spark):
        from hobbes_spark.functions.notebooks import notebook_cells

        nb_arr = json.dumps({
            "nbformat": 4,
            "metadata": {"kernelspec": {"language": "python"}},
            "cells": [
                {"cell_type": "markdown", "source": ["# T\n", "prose"]},
                {"cell_type": "code", "source": ["x = 1\n", "print(x)"]},
            ]})
        nb_str = json.dumps({
            "nbformat": 4,
            "metadata": {"kernelspec": {"language": "julia"}},
            "cells": [{"cell_type": "code", "source": "a = 2\nb = 3"}]})
        nb_mixed = json.dumps({
            "nbformat": 4, "metadata": {},
            "cells": [{"cell_type": "markdown", "source": "one string"},
                      {"cell_type": "code", "source": ["arr\n", "lines"]}]})
        rows = [(1, nb_arr), (2, nb_str), (3, nb_mixed),
                (4, "not json"), (5, '{"other": 1}')]
        df = spark.createDataFrame(rows, "doc_id long, raw string")
        got = [tuple(r) for r in
               notebook_cells(df).orderBy("doc_id", "cell_index").collect()]
        assert got == [
            (1, 0, "markdown", "python", "# T\nprose", 2),
            (1, 1, "code", "python", "x = 1\nprint(x)", 2),
            (2, 0, "code", "julia", "a = 2\nb = 3", 2),
            (3, 0, "markdown", None, "one string", 1),
            (3, 1, "code", None, "arr\nlines", 2),
        ]

    def test_plan_stays_jvm_side(self, spark):
        from hobbes_spark.functions.notebooks import notebook_cells

        df = spark.createDataFrame([(1, "{}")], "doc_id long, raw string")
        plan = notebook_cells(df)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan


class TestDetectLicense:
    def _d(self, spark, text):
        from hobbes_spark.functions.markdown import detect_license

        df = spark.createDataFrame([(text,)], "text string")
        cols = detect_license("text")
        return df.select(*[v.alias(k) for k, v in cols.items()]).first().asDict()

    def test_spdx_tag_wins_over_phrases(self, spark):
        got = self._d(spark, (
            "// SPDX-License-Identifier: Apache-2.0 OR MIT\n"
            "// Permission is hereby granted, free of charge\ncode()"))
        assert got == {"spdx": "Apache-2.0 OR MIT",
                       "family": "Apache-2.0 OR MIT", "licensed": True}

    def test_header_phrase_families(self, spark):
        cases = {
            "Licensed under the Apache License, Version 2.0": "Apache-2.0",
            "under the GNU General Public License as published": "GPL",
            "GNU Lesser Public License text": None,  # not a family phrase
            "GNU Lesser General Public License": "GPL",
            "Permission is hereby granted, free of charge": "MIT",
            "Redistribution and use in source and binary forms": "BSD",
            "This is free and unencumbered software": "Unlicense",
            "no license text at all": None,
        }
        for text, want in cases.items():
            got = self._d(spark, text)
            assert got["family"] == want, (text, got)
            assert got["spdx"] is None
            assert got["licensed"] is (want is not None)


class TestCodeLikeness:
    def _score(self, spark, text):
        from hobbes_spark.functions.text import code_likeness

        df = spark.createDataFrame([(text,)], "text string")
        cols = code_likeness("text")
        return df.select(*[v.alias(k) for k, v in cols.items()]).first().asDict()

    def test_routes_code_and_prose(self, spark):
        prose = ("The quick brown fox jumps over the lazy dog. It was a "
                 "bright cold day in April and the clocks were striking.")
        python = ("def f(x):\n    y = x * 2\n    return y\n\n"
                  "class A:\n    def g(self):\n        import os\n"
                  "        return os.name\n")
        c_code = ('#include <stdio.h>\nint main() {\n    printf("hi");\n'
                  "    return 0;\n}\n")
        assert self._score(spark, prose)["is_code"] is False
        assert self._score(spark, python)["is_code"] is True
        assert self._score(spark, c_code)["is_code"] is True

    def test_empty_scores_zero_not_null(self, spark):
        got = self._score(spark, "")
        assert got == {"symbol_frac": 0.0, "keyword_hits": 0.0,
                       "indent_frac": 0.0, "eol_frac": 0.0,
                       "score": 0.0, "is_code": False}
