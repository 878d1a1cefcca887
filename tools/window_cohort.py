"""Compute the CHANGE-AWARE staleness cohort for the driver gate window.

The driver's correctness gate signs the FIRST 50 catalog entries each
round.  With the whole catalog driver-signed at least once, the window
rotates by staleness — but pure age misses the real risk: a query whose
IMPLEMENTING CODE changed after its last signature is unverified-by-the-
driver regardless of how recent that signature is (round-6 example:
``bpe_merges`` was signed in r5, then ``functions/bpe.py`` was rewritten
in r6).  This tool ranks the catalog by

    (changed-since-last-signature DESC, last-signed round ASC, name ASC)

and prints the top-50 cohort.  "Changed" means: a ``git diff`` between
the commit that recorded the query's last signature
(``CORRECTNESS_r{N}.json``'s introducing commit) and HEAD touches the
CURRENT line range of any hobbes_spark function the query's callable
references — directly, or through one level of helpers defined in
``hobbes_spark.queries`` (``_t``, SQL builders, …).  Diff hunks use
HEAD-side line numbers, and ``inspect`` reports HEAD line ranges, so the
overlap test is exact on the +side; granularity is the referenced
function, so APPENDING new functions to a shared module does NOT flag
every query that imports the module.

``hobbes_spark/queries.py`` itself is excluded from change detection:
it is edited every round (new catalog entries), and its per-query bodies
are what the driver gate itself exercises.

Usage:  python tools/window_cohort.py [--top 50]
Exit: prints one name per line (the cohort, in window order).
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import subprocess
import sys
import types

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def last_signed_rounds(as_of: int | None = None) -> dict[str, int]:
    """query name -> most recent round with a fully-green signed row.

    ``as_of`` restricts the ledger to records from rounds <= as_of, so a
    cohort frozen against ``CORRECTNESS_r08`` stays byte-identical after
    the round-9 record lands (the r8 boundary red the r8 verdict names)."""
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        if as_of is not None and rnd > as_of:
            continue
        with open(path) as f:
            d = json.load(f)
        for k, v in d.get("queries", d).items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match") in (True, None)
                and v.get("hash_match") in (True, None)
            ):
                out[k] = max(out.get(k, 0), rnd)
    return out


def record_commits() -> dict[int, str]:
    """round -> commit hash that ADDED that round's CORRECTNESS file."""
    out: dict[int, str] = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        rel = os.path.relpath(path, ROOT)
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", rel).group(1))
        try:
            log = subprocess.run(
                ["git", "log", "--format=%H", "--diff-filter=A", "--", rel],
                cwd=ROOT, capture_output=True, text=True, check=True,
            ).stdout.split()
        except (subprocess.CalledProcessError, FileNotFoundError):
            return {}
        if log:
            out[rnd] = log[-1]
    return out


def _referenced_functions(fn, _seen=None) -> set:
    """hobbes_spark functions reachable from ``fn``'s code: globals named
    in co_names, attributes resolved on referenced hobbes_spark modules,
    plus one-level-deep recursion through helpers defined in
    hobbes_spark.queries (SQL builders, ``_t``)."""
    if _seen is None:
        _seen = set()
    if fn in _seen:
        return set()
    _seen.add(fn)
    # unwrap the @q decorator
    fn = inspect.unwrap(fn)
    out = set()
    try:
        code = fn.__code__
        g = fn.__globals__
    except AttributeError:
        return out
    names = set(code.co_names)
    # nested code objects (lambdas, comprehensions) reference globals too
    stack = [code]
    while stack:
        c = stack.pop()
        names.update(c.co_names)
        for const in c.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    modules = []
    for name in names:
        obj = g.get(name)
        if obj is None:
            continue
        if isinstance(obj, types.ModuleType):
            if (obj.__name__ or "").startswith("hobbes_spark"):
                modules.append(obj)
        elif callable(obj):
            mod = getattr(obj, "__module__", "") or ""
            if mod.startswith("hobbes_spark"):
                out.add(obj)
                if mod == "hobbes_spark.queries":
                    out |= _referenced_functions(obj, _seen)
    for mod in modules:
        for name in names:
            obj = getattr(mod, name, None)
            if callable(obj) and (getattr(obj, "__module__", "") or "").startswith(
                "hobbes_spark"
            ):
                out.add(obj)
    # Function-LOCAL imports (``from hobbes_spark.functions.bpe import
    # learn_bpe`` inside the body) bind locals, not globals — walk the
    # AST for them.
    import ast
    import importlib

    try:
        tree = ast.parse(inspect.getsource(fn))
    except (OSError, SyntaxError, IndentationError):
        return out
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and (node.module or "").startswith(
            "hobbes_spark"
        ):
            try:
                mod = importlib.import_module(node.module)
            except ImportError:
                continue
            for alias in node.names:
                obj = getattr(mod, alias.name, None)
                if callable(obj) and (
                    getattr(obj, "__module__", "") or ""
                ).startswith("hobbes_spark"):
                    out.add(obj)
                elif isinstance(obj, types.ModuleType) and (
                    obj.__name__ or ""
                ).startswith("hobbes_spark"):
                    # ``from hobbes_spark.functions import text as TX``
                    # binds a MODULE local; resolve co_names attribute
                    # accesses on it just like module globals (the r12
                    # lang_id_counts miss: TX.lang_id_ngram was never
                    # reached because the alias is not callable).
                    for name in names:
                        attr = getattr(obj, name, None)
                        if callable(attr) and (
                            getattr(attr, "__module__", "") or ""
                        ).startswith("hobbes_spark"):
                            out.add(attr)
    return out


def _fn_files_and_names(fns) -> dict[str, set[str]]:
    """repo-relative file -> {function __name__s referenced there}, with
    hobbes_spark/queries.py excluded (edited every round by design)."""
    out: dict[str, set[str]] = {}
    for fn in fns:
        try:
            target = inspect.unwrap(fn)
            src_file = inspect.getsourcefile(target)
        except (TypeError, OSError):
            continue
        if not src_file:
            continue
        rel = os.path.relpath(os.path.abspath(src_file), ROOT)
        if rel.startswith("..") or rel == os.path.join("hobbes_spark", "queries.py"):
            continue
        out.setdefault(rel, set()).add(getattr(target, "__name__", ""))
    return out


def _ranges_at_commit(commit: str, rel_file: str) -> dict[str, list[tuple[int, int]]]:
    """def name -> [(start, end)] line ranges in ``rel_file`` AS OF
    ``commit`` (so hunk positions and ranges live in the same revision
    — inspect-at-HEAD ranges would drift as the working tree evolves
    during a round).  Missing file at the commit -> empty (new module:
    every referenced function there counts as changed via the all-added
    diff against an absent base)."""
    import ast

    try:
        src = subprocess.run(
            ["git", "show", f"{commit}:{rel_file}"],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout
    except (subprocess.CalledProcessError, FileNotFoundError):
        return {}
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return {}
    out: dict[str, list[tuple[int, int]]] = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            out.setdefault(node.name, []).append(
                (node.lineno, node.end_lineno or node.lineno)
            )
    return out


def _boundary_side_hunks(
    base: str, boundary: str, rel_file: str
) -> list[tuple[int, int]]:
    """boundary-side line ranges touched by ``git diff base..boundary``."""
    try:
        diff = subprocess.run(
            ["git", "diff", "--unified=0", f"{base}..{boundary}", "--", rel_file],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout
    except (subprocess.CalledProcessError, FileNotFoundError):
        return []
    hunks = []
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", diff, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        # a pure deletion (+N,0) still marks the surrounding line
        hunks.append((start, start + max(count, 1) - 1))
    return hunks


def changed_since_signature(
    spec_fn, base: str, boundary: str, _cache: dict
) -> bool:
    """True iff ``git diff base..boundary`` touches the boundary-revision
    line range of any function the query references.  A function absent
    from the boundary file (renamed/new since) is conservatively treated
    as changed."""
    refs = _fn_files_and_names(_referenced_functions(spec_fn))
    for rel, names in refs.items():
        hkey = ("hunks", base, boundary, rel)
        if hkey not in _cache:
            _cache[hkey] = _boundary_side_hunks(base, boundary, rel)
        hunks = _cache[hkey]
        if not hunks:
            continue
        rkey = ("ranges", boundary, rel)
        if rkey not in _cache:
            _cache[rkey] = _ranges_at_commit(boundary, rel)
        ranges = _cache[rkey]
        for name in names:
            spans = ranges.get(name)
            if spans is None:
                return True  # not at boundary revision: new/renamed = changed
            for hs, he in hunks:
                for fs, fe in spans:
                    if hs <= fe and fs <= he:
                        return True
    return False


def compute_cohort(top: int = 50, as_of: int | None = None) -> list[str]:
    """The expected gate window: change-aware staleness cohort, FROZEN at
    the ``as_of`` correctness record's commit (default: the latest) so
    mid-round commits don't shift the expectation (they roll into the
    NEXT round's cohort once that round's record lands).

    Passing ``as_of`` explicitly (from ``queries.WINDOW_FROZEN_AT``)
    keeps the expectation stable even after a NEWER record lands — the
    pytest window contract pins against the stamped round and stays
    green across the round boundary; rotation-due enforcement lives in
    ``tools/gate_check.py`` instead (r8 verdict item 1).  Catalog
    entries never signed as of that round (e.g. added mid-round) always
    lead, so adding a query means adding it to the static window too —
    the contract test enforces exactly that."""
    from hobbes_spark.queries import QUERIES

    # Manual escalations the diff-based detector cannot see (r13 verdict
    # item 1): results-producing edits that live in queries.py (excluded
    # from change detection by design — it is edited every round), edits
    # routed through module-PRIVATE helpers the one-level reference walk
    # does not reach (the _keep_scored_pairs family), and edits landed
    # AFTER the boundary commit (the current round's own rewrites, which
    # the frozen diff window cannot include).  Names here rank as
    # changed; the set lives next to the window it feeds.
    forced: frozenset = getattr(
        __import__("hobbes_spark.queries", fromlist=["WINDOW_FORCE_CHANGED"]),
        "WINDOW_FORCE_CHANGED",
        frozenset(),
    )

    signed = last_signed_rounds(as_of)
    commits = record_commits()
    if as_of is not None:
        commits = {r: c for r, c in commits.items() if r <= as_of}
    boundary = commits.get(max(commits), None) if commits else None
    cache: dict = {}
    keyed = []
    for name, spec in QUERIES.items():
        if not spec.oracle:
            continue  # rows-only entries waste a signing slot
        rnd = signed.get(name, 0)
        base = commits.get(rnd)
        changed = name in forced or (
            bool(base)
            and bool(boundary)
            and base != boundary
            and changed_since_signature(spec.spark, base, boundary, cache)
        )
        # Manual escalations outrank auto-detected changes (r14): when
        # more queries changed than a window holds, the FORCED names are
        # the round's actual results-producing rewrites — they must not
        # be displaced by detector-flagged rows whose own forced slots
        # already came and went in an earlier window.
        tier = 0 if name in forced else (1 if (changed or rnd == 0) else 2)
        keyed.append((tier, rnd, name))
    keyed.sort()
    return [name for _, _, name in keyed[:top]]


if __name__ == "__main__":
    top = 50
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    as_of = None
    if "--as-of" in sys.argv:
        as_of = int(sys.argv[sys.argv.index("--as-of") + 1])
    sys.path.insert(0, ROOT)
    for name in compute_cohort(top, as_of):
        print(name)
