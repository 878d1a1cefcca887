"""Serving side of the OData surface: evaluate OData query options
against a DataFrame and shape the JSON response envelope.

The reference deploys a dedicated ``odata`` service
(`kubernetes/overlays/prod/odata.yaml:1-18`; its image source is a
private submodule), so the implemented contract is the PUBLIC OData
URL-conventions subset its own clients demonstrably issue — the
visualizer's feed URLs carry ``$filter=Iteration/StartDate gt
2019-01-01Z``, ``$select``, ``$expand``, ``$skiptoken`` paging and the
``{"@odata.context", "value", "@odata.nextLink"}`` envelope
(`tools/visualizer/cli/src/ODataProvider.fs:18-22,76-95`).

Everything here is engine-side semantics, not transport: ``$filter``
compiles to a native Column predicate (codegen, pushdown-eligible —
a served filter prunes the parquet scan like any other), ``$select``
prunes columns, ``$orderby``/``$top``/``$skip`` become
sort/limit/offset, and the envelope emitter streams ``toLocalIterator``
so serving a page never collects the full table to the driver. An HTTP
wrapper is a ~10-line flask/fastapi handler around
:func:`odata_response`; it is deliberately NOT included (no server
dependencies in the engine), matching the reference's split between the
engine core and the serving deployment.

Path segments use OData's ``/`` (``Iteration/StartDate``) and map onto
the uniform flat model's dot-path columns (``Iteration.StartDate``) —
the same spelling the ingest cascade produces (`Reader.fs:20-50`).
"""

from __future__ import annotations

import re
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_filter", "apply_odata_options", "odata_response"]


# --------------------------------------------------------------------- #
# $filter expression language
#
# Grammar (the OData v4 common core, precedence low -> high):
#   or_expr   := and_expr ('or' and_expr)*
#   and_expr  := not_expr ('and' not_expr)*
#   not_expr  := 'not' not_expr | cmp_expr
#   cmp_expr  := add_expr (('eq'|'ne'|'gt'|'ge'|'lt'|'le') add_expr)?
#              | add_expr 'in' '(' literal (',' literal)* ')'
#   add_expr  := mul_expr (('add'|'sub') mul_expr)*
#   mul_expr  := unary (('mul'|'div'|'mod') unary)*
#   unary     := '-' unary | primary
#   primary   := literal | func '(' args ')' | path | '(' or_expr ')'
# --------------------------------------------------------------------- #

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<datetime>\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}(?::\d{2}(?:\.\d+)?)?)?
            (?:Z|[+-]\d{2}:\d{2})?)
      | (?P<number>\d+(?:\.\d+)?)
      | (?P<string>'(?:[^']|'')*')
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:[./][A-Za-z_][A-Za-z0-9_]*)*)
      | (?P<punct>\(|\)|,|-)
    )""",
    re.X,
)

_CMP = {"eq": "==", "ne": "!=", "gt": ">", "ge": ">=", "lt": "<", "le": "<="}

# function name -> (arity, Column builder)
_FUNCS = {
    "contains": (2, lambda a, b: a.contains(b)),
    "startswith": (2, lambda a, b: a.startswith(b)),
    "endswith": (2, lambda a, b: a.endswith(b)),
    "tolower": (1, F.lower),
    "toupper": (1, F.upper),
    "trim": (1, F.trim),
    "length": (1, F.length),
    "indexof": (2, lambda a, b: F.instr(a, b) - F.lit(1)),  # OData is 0-based
    "substring": (
        2,
        lambda a, b: F.substring(a, b + F.lit(1), F.lit(2 ** 31 - 1)),
    ),
    "concat": (2, lambda a, b: F.concat(a, b)),
    "year": (1, F.year),
    "month": (1, F.month),
    "day": (1, F.dayofmonth),
    "hour": (1, F.hour),
    "minute": (1, F.minute),
    "second": (1, F.second),
    "date": (1, F.to_date),
    "round": (1, lambda a: F.round(a, 0)),
    "floor": (1, F.floor),
    "ceiling": (1, F.ceil),
}


def _col(path: str) -> Column:
    # OData nav path -> flat dot column; backtick-quote each flat name
    return F.col(f"`{path.replace('/', '.')}`")


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.tok: str | None = None
        self.kind: str | None = None
        self._advance()

    def _advance(self) -> None:
        if self.pos >= len(self.text.rstrip()):
            self.tok, self.kind = None, None
            return
        m = _TOKEN.match(self.text, self.pos)
        if not m:
            raise ValueError(
                f"$filter: cannot tokenize at {self.text[self.pos:][:30]!r}"
            )
        self.pos = m.end()
        self.kind = m.lastgroup
        self.tok = m.group(m.lastgroup)

    def _expect(self, tok: str) -> None:
        if self.tok != tok:
            raise ValueError(f"$filter: expected {tok!r}, got {self.tok!r}")
        self._advance()

    # ---- literals ----------------------------------------------------- #

    def _literal_col(self) -> Column | None:
        if self.kind == "number":
            v = float(self.tok) if "." in self.tok else int(self.tok)
            self._advance()
            return F.lit(v)
        if self.kind == "string":
            v = self.tok[1:-1].replace("''", "'")
            self._advance()
            return F.lit(v)
        if self.kind == "datetime":
            tok = self.tok
            self._advance()
            # bare `2019-01-01Z` (the reference's own feed URLs,
            # ODataProvider.fs:21) and full ISO both parse; strip a bare
            # date's zone marker so it compares as a date
            if re.fullmatch(r"\d{4}-\d{2}-\d{2}Z?", tok):
                return F.lit(tok.rstrip("Z")).cast("date")
            return F.lit(tok.replace("Z", "+00:00")).cast("timestamp")
        if self.tok == "null":
            self._advance()
            return F.lit(None)
        if self.tok == "true":
            self._advance()
            return F.lit(True)
        if self.tok == "false":
            self._advance()
            return F.lit(False)
        return None

    # ---- precedence climb --------------------------------------------- #

    def parse(self) -> Column:
        out = self._or()
        if self.tok is not None:
            raise ValueError(f"$filter: trailing input at {self.tok!r}")
        return out

    def _or(self) -> Column:
        left = self._and()
        while self.tok == "or":
            self._advance()
            left = left | self._and()
        return left

    def _and(self) -> Column:
        left = self._not()
        while self.tok == "and":
            self._advance()
            left = left & self._not()
        return left

    def _not(self) -> Column:
        if self.tok == "not":
            self._advance()
            return ~self._not()
        return self._cmp()

    def _cmp(self) -> Column:
        left = self._add()
        if self.tok in _CMP:
            op = self.tok
            self._advance()
            right = self._add()
            if op == "eq":
                return left == right
            if op == "ne":
                return left != right
            if op == "gt":
                return left > right
            if op == "ge":
                return left >= right
            if op == "lt":
                return left < right
            return left <= right
        if self.tok == "in":
            self._advance()
            self._expect("(")
            items = [self._literal_or_fail()]
            while self.tok == ",":
                self._advance()
                items.append(self._literal_or_fail())
            self._expect(")")
            return left.isin(items)
        return left

    def _literal_or_fail(self):
        lit = self._literal_col()
        if lit is None:
            raise ValueError(f"$filter: `in` list needs literals, got {self.tok!r}")
        return lit

    def _add(self) -> Column:
        left = self._mul()
        while self.tok in ("add", "sub"):
            op = self.tok
            self._advance()
            right = self._mul()
            left = left + right if op == "add" else left - right
        return left

    def _mul(self) -> Column:
        left = self._unary()
        while self.tok in ("mul", "div", "mod"):
            op = self.tok
            self._advance()
            right = self._unary()
            if op == "mul":
                left = left * right
            elif op == "div":
                left = left / right
            else:
                left = left % right
        return left

    def _unary(self) -> Column:
        if self.tok == "-":
            self._advance()
            return -self._unary()
        return self._primary()

    def _primary(self) -> Column:
        lit = self._literal_col()
        if lit is not None:
            return lit
        if self.tok == "(":
            self._advance()
            inner = self._or()
            self._expect(")")
            return inner
        if self.kind == "ident":
            name = self.tok
            self._advance()
            if self.tok == "(" and name in _FUNCS:
                arity, fn = _FUNCS[name]
                self._advance()
                args = [self._or()]
                while self.tok == ",":
                    self._advance()
                    args.append(self._or())
                self._expect(")")
                if len(args) != arity:
                    raise ValueError(
                        f"$filter: {name}() takes {arity} args, got {len(args)}"
                    )
                return fn(*args)
            return _col(name)
        raise ValueError(f"$filter: unexpected token {self.tok!r}")


def parse_filter(expr: str) -> Column:
    """OData ``$filter`` text -> native Column predicate. Stays inside
    codegen and is pushdown-eligible: a served filter prunes the scan
    exactly like a hand-written ``df.filter``."""
    return _Parser(expr).parse()


# --------------------------------------------------------------------- #
# Option application + envelope
# --------------------------------------------------------------------- #


def apply_odata_options(df: DataFrame, options: Mapping[str, str]) -> DataFrame:
    """Apply ``$filter`` / ``$select`` / ``$orderby`` / ``$skip`` /
    ``$top`` in OData's prescribed evaluation order (filter before
    select — the filter may use unselected columns; paging last).

    ``$orderby`` without an explicit direction is ``asc`` (the spec
    default). ``$skip`` needs a deterministic order to be meaningful,
    but that is the caller's contract (same as the spec's).
    """
    def opt(name: str) -> str | None:
        v = options.get(name) or options.get(name.lstrip("$"))
        return v.strip() if isinstance(v, str) and v.strip() else None

    if flt := opt("$filter"):
        df = df.filter(parse_filter(flt))
    if order := opt("$orderby"):
        cols = []
        for part in order.split(","):
            toks = part.split()
            if not toks or len(toks) > 2:
                raise ValueError(f"$orderby: bad term {part!r}")
            c = _col(toks[0])
            if len(toks) == 2:
                if toks[1] not in ("asc", "desc"):
                    raise ValueError(f"$orderby: bad direction {toks[1]!r}")
                c = c.desc() if toks[1] == "desc" else c.asc()
            cols.append(c)
        df = df.orderBy(*cols)
    if select := opt("$select"):
        df = df.select(
            *[_col(s.strip()) for s in select.split(",") if s.strip()]
        )
    if skip := opt("$skip"):
        df = df.offset(int(skip))
    if top := opt("$top"):
        df = df.limit(int(top))
    return df


def _json_cell(v):
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, bytearray):
        return bytes(v).hex()
    if isinstance(v, bytes):
        return v.hex()
    return v


def odata_response(
    df: DataFrame,
    options: Mapping[str, str] | None = None,
    context: str = "$metadata",
    base_url: str | None = None,
    page_size: int | None = None,
) -> dict:
    """The response envelope the reference's clients consume
    (`ODataProvider.fs:18-22`): ``@odata.context`` + ``value`` rows,
    ``@odata.count`` when ``$count=true``, and ``@odata.nextLink`` when
    a server ``page_size`` truncates the result.

    Rows stream via ``toLocalIterator`` — one partition in driver
    memory at a time, so serving page N of a 100 TB table materializes
    one page, not the table. ``base_url`` is only needed when paging
    (the nextLink must point somewhere).
    """
    options = options or {}
    out: dict = {"@odata.context": context}

    def opt(name: str) -> str | None:
        v = options.get(name) or options.get(name.lstrip("$"))
        return v.strip() if isinstance(v, str) and v.strip() else None

    shaped = apply_odata_options(df, options)
    if (opt("$count") or "").lower() == "true":
        # count AFTER filter, BEFORE paging, per spec
        counted = df
        if flt := opt("$filter"):
            counted = counted.filter(parse_filter(flt))
        out["@odata.count"] = counted.count()

    if page_size is not None:
        probe = shaped.limit(page_size + 1)
    else:
        probe = shaped
    cols = probe.columns
    rows = []
    truncated = False
    for row in probe.toLocalIterator():
        if page_size is not None and len(rows) >= page_size:
            truncated = True
            break
        rows.append({c: _json_cell(v) for c, v in zip(cols, row)})
    out["value"] = rows
    if truncated:
        if base_url is None:
            raise ValueError("page_size paging needs base_url for @odata.nextLink")
        from urllib.parse import quote

        skip = int(opt("$skip") or 0) + page_size
        keep = [
            f"{k if k.startswith('$') else '$' + k}={quote(str(v), safe='$,()')}"
            for k, v in options.items()
            if k.lstrip("$") not in ("skip",)
        ]
        sep = "&" if "?" in base_url else "?"
        out["@odata.nextLink"] = base_url + sep + "&".join(
            [*keep, f"$skip={skip}"]
        )
    return out
