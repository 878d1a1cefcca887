"""Parser for the reference's ``.hb`` transformation language.

Grammar surface fixed by the reference's TextMate grammar
(`tools/hobbes-vscode/syntaxes/hobbes.YAML-tmLanguage:6-18`) and the
autocomplete snippets; every construct below is exercised by the 7 real
programs in `tests/transformations/*.hb`.

A program is::

    <yaml-ish header lines>      (provider config — until first blank line)
    <blank>
    statements, one per line
    !## markdown blocks … !#     (flow through as comments)

Statements produce a small AST of tuples; the compiler maps them onto
Pipeline methods. Expressions parse to closures
``(pipeline) -> Column-or-marker`` so ``keys``/``moving`` can see the
pipeline state they execute against (the reference likewise evaluates
statements against the current matrix).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["parse_program", "parse_statement", "HbProgram", "HbParseError"]


class HbParseError(ValueError):
    pass


def _int_tok(tok, line: str) -> int:
    """Integer statement argument -> int, failing with the parser's own
    error type (a bare int() would leak ValueError/TypeError past
    callers that catch HbParseError)."""
    text = tok[1] if isinstance(tok, tuple) else tok
    try:
        return int(text)
    except (TypeError, ValueError):
        raise HbParseError(f"expected an integer, got {text!r} in: {line}") from None


@dataclass
class HbProgram:
    properties: dict[str, object] = field(default_factory=dict)
    statements: list[tuple] = field(default_factory=list)
    comments: list[str] = field(default_factory=list)
    statement_sources: list[str] = field(default_factory=list)


# ------------------------------------------------------------------ #
# tokenizer
# ------------------------------------------------------------------ #

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<dstring>"(?:[^"\\]|\\.)*")
  | (?P<sstring>'(?:[^'\\]|\\.)*')
  | (?P<group>\$\d+)
  | (?P<arrow>->)
  | (?P<op>==|!=|>=|<=|&&|\|\||[=<>!+\-*/()\[\]{};])
  | (?P<kmeans>k-means)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
    """,
    re.VERBOSE,
)


def tokenize(line: str) -> list[tuple[str, str]]:
    """Tokens as (kind, text). The ``/pattern/`` regex literal is scanned
    contextually (after the ``regex [expr]`` head) because ``/`` is also
    division."""
    out: list[tuple[str, str]] = []
    i = 0
    n = len(line)
    while i < n:
        # contextual regex literal: '/.../' directly after `regex [...]`
        if (
            line[i] == "/"
            and len(out) >= 2
            and out[-1][1] == "]"
            and _regex_head(out)
        ):
            j = i + 1
            buf = []
            while j < n and line[j] != "/":
                if line[j] == "\\" and j + 1 < n:
                    buf.append(line[j : j + 2])
                    j += 2
                    continue
                buf.append(line[j])
                j += 1
            if j >= n:
                raise HbParseError(f"unterminated /regex/ literal in: {line}")
            out.append(("regexlit", "".join(buf)))
            i = j + 1
            continue
        m = _TOKEN_RE.match(line, i)
        if not m:
            raise HbParseError(f"cannot tokenize at {line[i:]!r} in: {line}")
        kind = m.lastgroup
        if kind == "kmeans":
            kind = "ident"  # keyword with a hyphen; '-' is otherwise minus
        if kind != "ws":
            text = m.group()
            # the number pattern greedily eats a leading '-', but after
            # a value-producing token ('ordinals-1', '5-2') that '-' is
            # binary subtraction — split it back out or every unspaced
            # subtraction fails with "trailing tokens"
            if (
                kind == "number"
                and text.startswith("-")
                and out
                and (
                    out[-1][0] in ("number", "ident", "group", "dstring", "sstring")
                    or out[-1][1] in (")", "]", "}")
                )
            ):
                out.append(("op", "-"))
                text = text[1:]
            out.append((kind, text))
        i = m.end()
    return out


def _regex_head(tokens: list[tuple[str, str]]) -> bool:
    """True if the token stream ends with ``regex [ ... ]``."""
    depth = 0
    for k, t in reversed(tokens):
        if t == "]":
            depth += 1
        elif t == "[":
            depth -= 1
            if depth == 0:
                continue
        elif depth == 0:
            return k == "ident" and t == "regex"
    return False


# ------------------------------------------------------------------ #
# expression parser  (precedence: || < && < cmp < add < mul < unary)
# ------------------------------------------------------------------ #

_REDUCTIONS = {
    "count", "distinct", "max", "mean", "median", "min", "stddev", "sum", "variance",
}
_DATE_PARTS = {"date", "day", "week", "weekday", "month", "year"}


class _P:
    def __init__(self, tokens: list[tuple[str, str]], src: str):
        self.toks = tokens
        self.i = 0
        self.src = src

    def peek(self, off: int = 0):
        j = self.i + off
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, text: str):
        k, t = self.next()
        if t != text:
            raise HbParseError(f"expected {text!r}, got {t!r} in: {self.src}")
        return t

    def at_end(self) -> bool:
        return self.i >= len(self.toks)

    # -- expressions ------------------------------------------------ #

    def expr(self):
        return self._or()

    def _or(self):
        node = self._and()
        while self.peek()[1] == "||":
            self.next()
            node = ("or", node, self._and())
        return node

    def _and(self):
        node = self._cmp()
        while self.peek()[1] == "&&":
            self.next()
            node = ("and", node, self._cmp())
        return node

    def _cmp(self):
        node = self._add()
        while self.peek()[1] in ("=", "==", "!=", ">", "<", ">=", "<="):
            op = self.next()[1]
            node = ("cmp", "=" if op == "==" else op, node, self._add())
        return node

    def _add(self):
        node = self._mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("arith", op, node, self._mul())
        return node

    def _mul(self):
        node = self._unary()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            node = ("arith", op, node, self._unary())
        return node

    def _unary(self):
        k, t = self.peek()
        if t == "!":
            self.next()
            return ("not", self._unary())
        return self._primary()

    def _bracketed_expr(self):
        self.expect("[")
        e = self.expr()
        self.expect("]")
        return e

    def _primary(self):
        k, t = self.next()
        if k == "number":
            return ("lit", float(t) if "." in t else int(t))
        if k == "sstring":
            return ("lit", _unquote(t))
        if k == "dstring":
            return ("col", _unquote(t))
        if t == "(":
            e = self.expr()
            self.expect(")")
            return e
        if k == "ident":
            return self._ident_primary(t)
        raise HbParseError(f"unexpected token {t!r} in: {self.src}")

    def _ident_primary(self, t: str):
        if t == "missing":
            return ("missing",)
        if t == "keys":
            return ("keys",)
        if t == "ordinals":
            return ("ordinals",)
        if t == "true":
            return ("lit", True)
        if t == "false":
            return ("lit", False)
        if t == "if":
            # if [cond] {a} else {b}   (nestable — flowerpot.hb:17)
            cond = self._bracketed_expr()
            self.expect("{")
            then = self.expr()
            self.expect("}")
            self.expect("else")
            self.expect("{")
            other = self.expr()
            self.expect("}")
            return ("if", cond, then, other)
        if t == "int":
            self.expect("(")
            e = self.expr()
            self.expect(")")
            return ("int", e)
        if t == "regex":
            src = self._bracketed_expr()
            k2, pat = self.next()
            if k2 != "regexlit":
                raise HbParseError(f"expected /pattern/ after regex [...] in: {self.src}")
            self.expect("[")
            tokens: list[str] = []
            while self.peek()[1] != "]":
                kk, tt = self.next()
                if kk == "group":
                    tokens.append(tt)
                elif kk in ("sstring", "dstring"):
                    tokens.append(_unquote(tt))
                elif kk == "ident":
                    tokens.append(tt)
                else:
                    raise HbParseError(f"bad regex output token {tt!r} in: {self.src}")
            self.expect("]")
            return ("regex", src, pat, tokens)
        if t == "format":
            self.expect("date")
            col = self._primary()
            k2, part = self.next()
            if part not in _DATE_PARTS:
                raise HbParseError(f"bad date part {part!r} in: {self.src}")
            return ("formatdate", col, part)
        if t == "contains":
            col = self._primary()
            self.expect("[")
            vals = []
            while self.peek()[1] != "]":
                kk, tt = self.next()
                if kk == "number":
                    vals.append(float(tt) if "." in tt else int(tt))
                elif kk in ("sstring", "dstring"):
                    vals.append(_unquote(tt))
                elif tt == ";":
                    continue
                else:
                    raise HbParseError(f"bad contains value {tt!r} in: {self.src}")
            self.expect("]")
            return ("contains", col, vals)
        if t == "moving":
            red = self._reduction()
            k2, n = self.next()
            if k2 != "number":
                raise HbParseError(f"moving needs a window size in: {self.src}")
            val = self._bracketed_expr()
            return ("moving", red, int(n), val)
        if t == "expanding":
            red = self._reduction()
            val = self._bracketed_expr()
            return ("expanding", red, val)
        # bare identifier = column reference
        return ("col", t)

    def _reduction(self) -> str:
        k, t = self.next()
        if t not in _REDUCTIONS:
            raise HbParseError(f"unknown reduction {t!r} in: {self.src}")
        return t


def _unquote(t: str) -> str:
    body = t[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


# ------------------------------------------------------------------ #
# statements
# ------------------------------------------------------------------ #

def _name_token(p: _P) -> str:
    k, t = p.next()
    if k in ("dstring", "sstring"):
        return _unquote(t)
    if k in ("ident", "number"):
        return t
    raise HbParseError(f"expected a column name, got {t!r} in: {p.src}")


def parse_statement(line: str) -> tuple:
    """Parse one statement line into an AST tuple. Trailing tokens are
    an error — silently dropping them turns a typo like
    ``only (a = 1) (b = 2)`` into a half-applied filter."""
    p = _P(tokenize(line), line)
    ast = _parse_statement_inner(p)
    if not p.at_end():
        raise HbParseError(
            f"trailing tokens {[t for _, t in p.toks[p.i:]]} after statement in: {line}"
        )
    return ast


def _parse_statement_inner(p: _P) -> tuple:
    line = p.src
    k, t = p.next()
    if t == "only":
        if p.peek()[1] == "true" and p.peek(1)[0] is None:
            p.next()
            return ("only_true",)
        return ("only", p.expr())
    if t == "slice":
        k2, what = p.next()
        if what == "columns":
            names = []
            while not p.at_end():
                names.append(_name_token(p))
            return ("slice_columns", names)
        if what == "rows":
            a = _int_tok(p.next(), line)
            b = _int_tok(p.next(), line)
            return ("slice_rows", a, b)
        raise HbParseError(f"slice what? {what!r} in: {line}")
    if t == "rename":
        p.expect("column")
        return ("rename", _name_token(p), _name_token(p))
    if t == "create":
        p.expect("column")
        name = _name_token(p)
        return ("create", name, p.expr())
    if t == "dense":
        k2, what = p.next()
        if what in ("columns", "rows"):
            return (f"dense_{what}",)
        raise HbParseError(f"dense what? {what!r} in: {line}")
    if t == "numeric":
        p.expect("columns")
        return ("numeric_columns",)
    if t == "group":
        p.expect("by")
        keys = []
        while p.peek()[1] != "->":
            keys.append(_name_token(p))
        p.expect("->")
        k2, sel = p.next()
        if sel in ("maxby", "minby"):
            return ("group_selector", keys, sel, p.expr())
        if sel in _REDUCTIONS:
            return ("group_reduce", keys, sel)
        raise HbParseError(f"bad group-by tail {sel!r} in: {line}")
    if t == "pivot":
        rows = p._bracketed_expr()
        cols = p._bracketed_expr()
        p.expect("->")
        red = p._reduction()
        val = None
        if not p.at_end():
            val = p._bracketed_expr()
        return ("pivot", rows, cols, red, val)
    if t == "sort":
        p.expect("by")
        if p.peek()[1] == "column":
            p.next()
        names = []
        while not p.at_end():
            names.append(_name_token(p))
        return ("sort_by", names)
    if t == "index":
        if p.peek()[1] == "rows":
            p.next()
        p.expect("by")
        names = []
        while not p.at_end():
            names.append(_name_token(p))
        return ("index_by", names)
    if t == "buckets":
        n = _int_tok(p.next(), line)
        p.expect("->")
        return ("buckets", n, p._reduction())
    if t == "k-means":
        n = _int_tok(p.next(), line)
        p.expect("->")
        return ("kmeans", n, p._reduction())
    if t == "each":
        return ("each", p._reduction())
    if t == "linear":
        k2, what = p.next()
        if what == "regression":
            x = p._bracketed_expr()
            y = p._bracketed_expr()
            return ("linear_regression", x, y)
        if what == "extrapolation":
            col = p._bracketed_expr()
            n_pred = _int_tok(p.next(), line)
            n_train = _int_tok(p.next(), line)
            return ("linear_extrapolation", col, n_pred, n_train)
        raise HbParseError(f"linear what? {what!r} in: {line}")
    raise HbParseError(f"unknown statement {t!r} in: {line}")


# ------------------------------------------------------------------ #
# program
# ------------------------------------------------------------------ #

def parse_program(text: str) -> HbProgram:
    """Full ``.hb`` file: YAML-ish provider header (until the first blank
    line, if it looks like ``key: value``), ``!## … !#`` markdown comment
    blocks (captured, not executed — they are part of the language,
    `MTTR.hb:11-16`), statements one per line."""
    prog = HbProgram()
    lines = text.splitlines()
    i = 0
    # tolerate leading blank lines: without the skip, the header keys
    # would fall through to parse_statement and die on ": odata"
    while i < len(lines) and not lines[i].strip():
        i += 1
    # header: leading `key: value` lines up to the first blank line;
    # an INDENTED line only continues the header when a key line came
    # before it — otherwise an indented statement would be swallowed
    # into properties and silently dropped from the program
    header: list[str] = []
    j = i
    while j < len(lines) and lines[j].strip():
        if re.match(r"^[A-Za-z_][\w.-]*\s*:(\s|$)", lines[j]) or (
            header and re.match(r"^\s+\S", lines[j])
        ):
            header.append(lines[j])
            j += 1
        else:
            break
    if header and j <= len(lines) and (j == len(lines) or not lines[j].strip()):
        prog.properties = _parse_header(header)
        i = j
    in_comment = False
    comment_buf: list[str] = []
    for line in lines[i:]:
        s = line.strip()
        if in_comment:
            if s.endswith("!#") or s == "!#":
                comment_buf.append(s[:-2].rstrip())
                prog.comments.append("\n".join(b for b in comment_buf if b))
                comment_buf = []
                in_comment = False
            else:
                comment_buf.append(s)
            continue
        if s.startswith("!#"):
            body = s.lstrip("!#").strip()
            if s.startswith("!##") and not (s.endswith("!#") and len(s) > 3):
                in_comment = True  # only '!##' OPENS a block (MTTR.hb:11)
                comment_buf = [body]
            else:
                # one-line '!## ... !#' or a stray '!#...' line: a comment,
                # never a block opener (a bare opener would silently
                # swallow every following statement)
                prog.comments.append(body.removesuffix("!#").strip())
            continue
        if not s:
            continue
        prog.statements.append(parse_statement(s))
        prog.statement_sources.append(s)
    if in_comment and comment_buf:
        prog.comments.append("\n".join(b for b in comment_buf if b))
    return prog


def _parse_header(lines: list[str]) -> dict[str, object]:
    """Minimal YAML-ish header parse: flat keys, one nesting level of
    ``key: value`` maps, and ``- item`` lists (the multi-URL rest source,
    `Logic Commit Frequency.hb:2-18`)."""
    out: dict[str, object] = {}
    last_key = None
    for raw in lines:
        indent = len(raw) - len(raw.lstrip())
        stripped = raw.strip()
        if indent > 0 and last_key is not None:
            if stripped.startswith("- "):
                cur = out.get(last_key)
                if not isinstance(cur, list):
                    cur = [] if not cur else [cur]
                    out[last_key] = cur
                cur.append(stripped[2:].strip())
                continue
            key, _, val = stripped.partition(":")
            if not isinstance(out.get(last_key), dict):
                out[last_key] = {}
            out[last_key][key.strip()] = val.strip()  # type: ignore[index]
            continue
        key, _, val = stripped.partition(":")
        out[key.strip()] = val.strip()
        last_key = key.strip()
    return out
