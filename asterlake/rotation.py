"""Mechanical scoring-front promotion: derive "queries touched since the
last scoring freeze" from ``git diff``, not a hand-maintained list.

Two rounds in a row (r5: ngram; r6: pagerank + 3) operators changed AFTER
the round's driver scoring front was frozen, leaving green driver rows
that predate the code they vouch for. The r6 verdict's fix: make
"operator touched this round" promotion automatic and continuously
enforced. This module computes it; ``tests/test_rotation.py`` asserts
every touched query (minus explicitly-justified bit-identical exemptions
declared next to the front in queries.py) sits inside the first
``FRONT_BUDGET`` positions of the QUERIES order the driver scores. The
test runs against the WORKING TREE, so an operator edit landing after
the front was last frozen turns the suite red until the front is
re-frozen — the freeze is provably no older than the last operator
commit.

How a change maps to queries:

- Each top-level statement in queries.py that declares a query (a
  ``@query("name", ...)``-decorated def, or a ``QUERIES["name"] =
  QueryDef(...)`` assignment) owns a line span; a diff hunk overlapping
  the span touches that query.
- Helper statements (module constants like ``_DUCK_MEDIA_GEN``, helper
  defs, imports) propagate: a hunk touching a helper touches every query
  whose declaration text references the helper's name (closed
  transitively through helper-to-helper references).
- A change to any other ``asterlake/*.py`` module is attributed at the
  STATEMENT level the same way (diff spans -> touched top-level names,
  closed over intra-module references), then propagated name-wise along
  the import graph: a downstream module's statement is touched only if
  it references a touched NAME of a module it imports — so adding an
  unrelated constant to a widely-imported module does not promote every
  consumer. A query is touched when its declaration text (plus the text
  of helpers it references) names both a touched module and one of that
  module's touched names.

The baseline is the commit that last touched a ``CORRECTNESS_r*.json``
file — the driver lands one per round, so "diff since then" is exactly
"changed this round".
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
from dataclasses import dataclass

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES_REL = os.path.join("asterlake", "queries.py")
QUERIES_PATH = os.path.join(REPO_ROOT, QUERIES_REL)

# Statements at/below this marker in queries.py form the scoring-order
# block itself (the front lists, exemptions, and the QUERIES rebind).
# They are EXCLUDED from touch attribution: re-freezing the front must
# not count as an operator change, or every freeze would immediately
# re-trigger the promotion it just satisfied (and the QUERIES rebind
# would cascade through the ``query`` decorator helper to every query).
ORDERING_MARKER = "# Driver scoring order"

# The correctness driver scores exactly this many queries per round, in
# QUERIES declaration order (observed rounds 1-6).
FRONT_BUDGET = 50

_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_MODULE_RE = re.compile(r"asterlake(?:\.[a-z_0-9]+)+")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args],
        cwd=REPO_ROOT,
        check=True,
        capture_output=True,
        text=True,
    ).stdout


def scoring_freeze_base() -> str | None:
    """The commit hash the current round's diff is measured against: the
    last commit that touched a CORRECTNESS_r*.json (the driver's
    round-end commit). None before the first round lands."""
    out = _git(
        "log", "-n", "1", "--format=%H", "--", "CORRECTNESS_r*.json"
    ).strip()
    return out or None


@dataclass
class _Stmt:
    names: tuple[str, ...]  # names this statement defines
    queries: tuple[str, ...]  # query names this statement declares
    span: tuple[int, int]  # 1-based inclusive line range incl. decorators
    text: str


def _literal_str(node: ast.AST) -> str | None:
    return node.value if isinstance(node, ast.Constant) and isinstance(
        node.value, str
    ) else None


def _declared_queries(stmt: ast.stmt) -> tuple[str, ...]:
    """Query names a top-level statement declares."""
    found: list[str] = []
    if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef)):
        for dec in stmt.decorator_list:
            if (
                isinstance(dec, ast.Call)
                and isinstance(dec.func, ast.Name)
                and dec.func.id == "query"
                and dec.args
            ):
                name = _literal_str(dec.args[0])
                if name:
                    found.append(name)
    if isinstance(stmt, ast.Assign):
        for tgt in stmt.targets:
            if (
                isinstance(tgt, ast.Subscript)
                and isinstance(tgt.value, ast.Name)
                and tgt.value.id == "QUERIES"
            ):
                name = _literal_str(tgt.slice)
                if name:
                    found.append(name)
    return tuple(found)


def _defined_names(stmt: ast.stmt) -> tuple[str, ...]:
    if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return (stmt.name,)
    if isinstance(stmt, ast.Assign):
        return tuple(
            t.id for t in stmt.targets if isinstance(t, ast.Name)
        )
    if isinstance(stmt, (ast.Import, ast.ImportFrom)):
        return tuple(
            (a.asname or a.name).split(".")[0] for a in stmt.names
        )
    return ()


def _statements(source: str) -> list[_Stmt]:
    tree = ast.parse(source)
    lines = source.splitlines()
    out: list[_Stmt] = []
    for stmt in tree.body:
        start = stmt.lineno
        if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for dec in stmt.decorator_list:
                start = min(start, dec.lineno)
        end = stmt.end_lineno or stmt.lineno
        out.append(
            _Stmt(
                names=_defined_names(stmt),
                queries=_declared_queries(stmt),
                span=(start, end),
                text="\n".join(lines[start - 1 : end]),
            )
        )
    return out


def _module_import_graph() -> dict[str, set[str]]:
    """asterlake-internal module -> set of asterlake modules it imports."""
    graph: dict[str, set[str]] = {}
    pkg_root = os.path.join(REPO_ROOT, "asterlake")
    for dirpath, _dirs, files in os.walk(pkg_root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            mod = _path_to_module(os.path.relpath(path, REPO_ROOT))
            try:
                tree = ast.parse(open(path).read())
            except SyntaxError:
                continue
            deps: set[str] = set()
            for node in ast.walk(tree):
                if isinstance(node, ast.ImportFrom) and node.module:
                    if node.module.startswith("asterlake"):
                        deps.add(node.module)
                elif isinstance(node, ast.Import):
                    for a in node.names:
                        if a.name.startswith("asterlake"):
                            deps.add(a.name)
            graph[mod] = deps
    return graph


def _path_to_module(rel_path: str) -> str:
    mod = rel_path[: -len(".py")].replace(os.sep, ".")
    if mod.endswith(".__init__"):
        mod = mod[: -len(".__init__")]
    return mod


def _module_touched_names(path: str, base: str) -> set[str]:
    """Top-level names of ``path`` whose defining statements overlap the
    diff since ``base``, closed over intra-module statement references
    (a changed private helper touches every public def that uses it)."""
    rel = os.path.relpath(path, REPO_ROOT)
    spans = _diff_new_side_spans(base, rel)
    if not spans:
        return set()
    try:
        stmts = _statements(open(path).read())
    except (OSError, SyntaxError):
        return set()

    def overlaps(span: tuple[int, int]) -> bool:
        return any(a <= span[1] and span[0] <= b for a, b in spans)

    touched = {n for s in stmts if overlaps(s.span) for n in s.names}
    grew = True
    while grew:
        grew = False
        for s in stmts:
            if set(s.names) <= touched:
                continue
            if set(_NAME_RE.findall(s.text)) & touched:
                touched.update(s.names)
                grew = True
    return touched


def _propagate_names(
    touched_by_mod: dict[str, set[str]], graph: dict[str, set[str]]
) -> dict[str, set[str]]:
    """Name-wise cross-module propagation: a module's statement is
    touched if it references a touched name of a module it imports;
    iterate to a fixpoint. Module sources are read lazily once."""
    stmt_cache: dict[str, list[_Stmt]] = {}

    def stmts_of(mod: str) -> list[_Stmt]:
        if mod not in stmt_cache:
            path = os.path.join(REPO_ROOT, mod.replace(".", os.sep) + ".py")
            if not os.path.exists(path):
                path = os.path.join(
                    REPO_ROOT, mod.replace(".", os.sep), "__init__.py"
                )
            try:
                stmt_cache[mod] = _statements(open(path).read())
            except (OSError, SyntaxError):
                stmt_cache[mod] = []
        return stmt_cache[mod]

    out = {m: set(ns) for m, ns in touched_by_mod.items()}
    grew = True
    while grew:
        grew = False
        for mod, deps in graph.items():
            relevant: set[str] = set(out.get(mod, set()))
            for dep in deps:
                relevant |= out.get(dep, set())
            if not relevant:
                continue
            for s in stmts_of(mod):
                if set(s.names) <= out.get(mod, set()):
                    continue
                if set(_NAME_RE.findall(s.text)) & relevant:
                    out.setdefault(mod, set()).update(s.names)
                    grew = True
    return out


def _parse_hunk_spans(diff_text: str) -> list[tuple[int, int]]:
    """New-file line ranges from unified-diff hunk headers. A pure
    deletion hunk is treated as touching the line it collapsed onto."""
    spans: list[tuple[int, int]] = []
    for m in re.finditer(r"^@@ [^+]*\+(\d+)(?:,(\d+))? @@", diff_text, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        if count == 0:
            spans.append((max(start, 1), max(start, 1)))
        else:
            spans.append((start, start + count - 1))
    return spans


def _diff_new_side_spans(base: str, rel_path: str) -> list[tuple[int, int]]:
    """New-file line ranges changed since ``base`` (working tree
    included)."""
    try:
        diff = _git("diff", "-U0", base, "--", rel_path)
    except subprocess.CalledProcessError:
        return []
    return _parse_hunk_spans(diff)


def _changed_files(base: str) -> set[str]:
    return {
        p
        for p in _git("diff", "--name-only", base).splitlines()
        if p.strip()
    }


def queries_touched(base: str | None = None) -> set[str]:
    """Names of declared queries whose behavior may have changed since
    ``base`` (default: the last driver round commit). Conservative in
    the promote direction: docstring-only edits inside a query's span
    count as touched (rescoring a query is cheap; a stale green row is
    not)."""
    if base is None:
        base = scoring_freeze_base()
    if base is None:
        return set()

    source = open(QUERIES_PATH).read()
    stmts = _statements(source)
    marker_line = None
    for i, line in enumerate(source.splitlines(), start=1):
        if ORDERING_MARKER in line:
            marker_line = i
            break
    if marker_line is not None:
        stmts = [s for s in stmts if s.span[0] < marker_line]
    helper_by_name = {n: s for s in stmts for n in s.names if not s.queries}

    # helper -> helpers referencing it (one fixpoint pass below handles
    # chains); then queries referencing any (transitively) touched helper
    def refs(text: str) -> set[str]:
        return set(_NAME_RE.findall(text))

    changed = _changed_files(base)
    changed_py = {
        p
        for p in changed
        if p.startswith("asterlake/") and p.endswith(".py")
    }

    touched: set[str] = set()
    touched_helpers: set[str] = set()

    # 1) line-level attribution inside queries.py
    qrel = QUERIES_REL
    if qrel in changed_py:
        spans = _diff_new_side_spans(base, qrel)

        def overlaps(span: tuple[int, int]) -> bool:
            return any(a <= span[1] and span[0] <= b for a, b in spans)

        for s in stmts:
            if not overlaps(s.span):
                continue
            if s.queries:
                touched.update(s.queries)
            else:
                touched_helpers.update(s.names)

    # 2) statement-level attribution for every other changed asterlake
    # file, propagated name-wise along the import graph
    touched_by_mod = {
        _path_to_module(p): _module_touched_names(
            os.path.join(REPO_ROOT, p), base
        )
        for p in changed_py
        if p != qrel
    }
    touched_by_mod = {m: ns for m, ns in touched_by_mod.items() if ns}
    if touched_by_mod:
        graph = _module_import_graph()
        graph.pop(_path_to_module(qrel), None)  # queries.py handled above
        affected = _propagate_names(touched_by_mod, graph)
        for s in stmts:
            text = s.text
            mods_in_text = set(_MODULE_RE.findall(text))
            names_in_text = refs(text)
            # helper statements referenced by this query pull in their
            # module references too (e.g. load_table -> asterlake.tables)
            for name in names_in_text & set(helper_by_name):
                helper_text = helper_by_name[name].text
                mods_in_text.update(_MODULE_RE.findall(helper_text))
                names_in_text |= refs(helper_text)
            hit = any(
                mod in mods_in_text and (affected[mod] & names_in_text)
                for mod in affected
            )
            if hit:
                if s.queries:
                    touched.update(s.queries)
                else:
                    touched_helpers.update(s.names)

    # 3) close helper touches over helper->helper references, then map
    # touched helpers onto the queries that reference them
    grew = True
    while grew:
        grew = False
        for s in stmts:
            if s.queries or not s.names:
                continue
            if set(s.names) <= touched_helpers:
                continue
            if refs(s.text) & touched_helpers:
                touched_helpers.update(s.names)
                grew = True
    if touched_helpers:
        for s in stmts:
            if s.queries and refs(s.text) & touched_helpers:
                touched.update(s.queries)

    return touched


def latest_scored_rounds() -> dict[str, int]:
    """Per-query latest driver-scored round, aggregated over every
    CORRECTNESS_r*.json in the repo root. Queries never scored are
    absent from the result."""
    import glob
    import json

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        for q in rows:
            latest[q] = max(latest.get(q, 0), rnd)
    return latest


def suggest_front(
    declared: list[str],
    exempt: set[str] | None = None,
    budget: int = FRONT_BUDGET,
    base: str | None = None,
) -> list[str]:
    """The next round's scoring front, derived mechanically: touched
    queries first (minus justified exemptions), then never-scored
    queries (new declarations need a first hard signal), then
    longest-unverified-first; ties break by name for a stable output.
    Returns exactly ``budget`` names (or all of ``declared`` if fewer).

    This is the freeze procedure: run it AFTER the round's last operator
    commit, paste the result into the ordering block, and the
    enforcement test keeps it honest from then on.

    Known limitation: churn that happened BEFORE ``base`` (e.g. the
    previous round's post-freeze changes, called out in its VERDICT) is
    invisible to the diff — carry those promotions over by hand, as the
    r7 front does for the r6 post-freeze four."""
    exempt = exempt or set()
    latest = latest_scored_rounds()
    touched = queries_touched(base) - exempt

    def rank(q: str) -> tuple:
        return (
            0 if q in touched else 1,
            # never-scored before oldest-scored, then ascending round
            latest.get(q, -1),
            q,
        )

    ordered = sorted(declared, key=rank)
    return ordered[:budget]
