"""The mechanical scoring-front guarantee (asterlake/rotation.py).

The driver scores the first FRONT_BUDGET entries of QUERIES order per
round. These tests make the front freeze self-enforcing: if an operator
edit lands AFTER the front was last frozen, the touched query falls
outside the front and the suite goes red until the front is re-frozen —
so a green suite proves the freeze is no older than the last operator
commit (r6 verdict asks #1 and #6). Pure-Python tests; no SparkSession.
"""

from __future__ import annotations

import subprocess
import textwrap

import pytest

from asterlake.rotation import (
    FRONT_BUDGET,
    _parse_hunk_spans,
    _statements,
    queries_touched,
    scoring_freeze_base,
)


def _git_available() -> bool:
    try:
        return scoring_freeze_base() is not None
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


# ---------------------------------------------------------------------------
# The enforcement gate itself
# ---------------------------------------------------------------------------


def test_touched_queries_sit_in_the_scoring_front():
    """Every query whose code changed since the last driver round commit
    must be inside the first-FRONT_BUDGET scoring positions, or carry an
    explicit bit-identical justification in _AUTO_PROMOTE_EXEMPT."""
    if not _git_available():
        pytest.skip("no git history / round baseline in this environment")
    from asterlake.queries import _AUTO_PROMOTE_EXEMPT, QUERIES

    front = set(list(QUERIES)[:FRONT_BUDGET])
    touched = queries_touched()
    unknown_exempt = set(_AUTO_PROMOTE_EXEMPT) - set(QUERIES)
    assert not unknown_exempt, (
        f"exemptions for undeclared queries: {sorted(unknown_exempt)}"
    )
    missing = touched - front - set(_AUTO_PROMOTE_EXEMPT)
    assert not missing, (
        "queries touched since the scoring freeze but not promoted to "
        f"the front (re-freeze the rotation block or add a justified "
        f"exemption): {sorted(missing)}"
    )


def test_front_is_exactly_the_budget():
    """The driver cuts at FRONT_BUDGET: a longer hand-picked front ages
    its tail out silently (r5 lost 6 rows that way), a shorter one
    wastes scoring slots."""
    from asterlake.queries import _FRONT

    assert len(_FRONT) == FRONT_BUDGET


def test_exemptions_carry_justifications():
    from asterlake.queries import _AUTO_PROMOTE_EXEMPT

    for name, why in _AUTO_PROMOTE_EXEMPT.items():
        assert isinstance(why, str) and len(why) >= 10, name


def test_exemptions_are_round_scoped():
    """Exemptions justify diffs against ONE freeze base (r14 ADVICE):
    once the driver's next CORRECTNESS commit advances the base, a
    leftover exemption would silently excuse a FUTURE semantic edit to
    that query from front promotion — so a non-empty exemption dict must
    pin the exact base it was justified against, and goes red (drop or
    re-justify) the round after."""
    if not _git_available():
        pytest.skip("no git history / round baseline in this environment")
    from asterlake.queries import _AUTO_PROMOTE_EXEMPT, _EXEMPT_FREEZE_BASE

    if _AUTO_PROMOTE_EXEMPT:
        assert _EXEMPT_FREEZE_BASE == scoring_freeze_base(), (
            "the scoring freeze base advanced past the recorded exemption "
            "base: these exemptions justify a PREVIOUS round's diffs and "
            "must be dropped (or re-justified against the new base): "
            f"{sorted(_AUTO_PROMOTE_EXEMPT)}"
        )


# ---------------------------------------------------------------------------
# Machinery unit tests (git-independent)
# ---------------------------------------------------------------------------


def test_hunk_span_parsing():
    diff = textwrap.dedent(
        """\
        --- a/x.py
        +++ b/x.py
        @@ -10,2 +12,3 @@ def f():
        +a
        @@ -20 +25 @@
        +b
        @@ -30,4 +33,0 @@
        -gone
        """
    )
    assert _parse_hunk_spans(diff) == [(12, 14), (25, 25), (33, 33)]


_SAMPLE = textwrap.dedent(
    '''\
    from asterlake.tables import load_table

    _HELPER = "SELECT 1"


    def _chain():
        return _HELPER + "!"


    @query(
        "q_alpha",
        f"{_chain()}",
    )
    def q_alpha(spark, sf_dir):
        from asterlake.operators.dedup import exact_dedup

        return exact_dedup(load_table(spark, sf_dir, "documents"))


    QUERIES["q_beta"] = QueryDef(q_alpha, _HELPER)
    '''
)


def test_statement_spans_and_query_names():
    stmts = _statements(_SAMPLE)
    by_query = {q: s for s in stmts for q in s.queries}
    assert set(by_query) == {"q_alpha", "q_beta"}
    # decorator lines are part of the q_alpha span (the oracle string
    # lives there — an oracle edit must touch the query)
    alpha = by_query["q_alpha"]
    assert alpha.span[0] == _SAMPLE.splitlines().index("@query(") + 1
    # helper statements expose their defined names
    helpers = {n for s in stmts if not s.queries for n in s.names}
    assert {"load_table", "_HELPER", "_chain"} <= helpers


def test_helper_reference_closure_reaches_queries(tmp_path, monkeypatch):
    """Editing a helper (_HELPER) touches q_beta directly AND q_alpha
    through the _chain -> _HELPER reference chain."""
    import asterlake.rotation as rotation

    qfile = tmp_path / "queries.py"
    qfile.write_text(_SAMPLE)
    monkeypatch.setattr(rotation, "QUERIES_PATH", str(qfile))
    monkeypatch.setattr(
        rotation,
        "_changed_files",
        lambda base: {"asterlake/queries.py"},
    )
    helper_line = _SAMPLE.splitlines().index('_HELPER = "SELECT 1"') + 1
    monkeypatch.setattr(
        rotation,
        "_diff_new_side_spans",
        lambda base, rel: [(helper_line, helper_line)],
    )
    assert rotation.queries_touched(base="IGNORED") == {"q_alpha", "q_beta"}


def test_suggest_front_orders_touched_then_new_then_oldest(monkeypatch):
    """The freeze procedure's ordering contract: touched (non-exempt)
    first, then never-scored, then longest-unverified, name ties
    stable."""
    import asterlake.rotation as rotation

    monkeypatch.setattr(
        rotation, "queries_touched", lambda base=None: {"q_t", "q_ex"}
    )
    monkeypatch.setattr(
        rotation,
        "latest_scored_rounds",
        lambda: {"q_t": 6, "q_old": 3, "q_older": 2, "q_mid": 5, "q_ex": 6},
    )
    declared = ["q_mid", "q_new", "q_older", "q_t", "q_old", "q_ex"]
    got = rotation.suggest_front(declared, exempt={"q_ex"}, budget=4)
    # q_t touched; q_new never scored; then oldest rounds ascending
    assert got == ["q_t", "q_new", "q_older", "q_old"]
    # budget > declared: everything, exempt ranked by age like the rest
    assert rotation.suggest_front(declared, exempt={"q_ex"}, budget=10)[-1] in (
        "q_ex",
        "q_t",
    )


def test_unrelated_module_constant_does_not_promote(monkeypatch, tmp_path):
    """Name-level propagation: a module change whose touched names are
    never referenced by a query must not promote it (adding SIG_ENCODING
    to integrity.py must not drag in every checksum consumer)."""
    import asterlake.rotation as rotation

    qfile = tmp_path / "queries.py"
    qfile.write_text(_SAMPLE)
    monkeypatch.setattr(rotation, "QUERIES_PATH", str(qfile))
    monkeypatch.setattr(
        rotation,
        "_changed_files",
        lambda base: {"asterlake/operators/dedup.py"},
    )
    # pretend the diff touched only a name q_alpha never references
    monkeypatch.setattr(
        rotation,
        "_module_touched_names",
        lambda path, base: {"_SOME_PRIVATE_CONST"},
    )
    monkeypatch.setattr(
        rotation, "_module_import_graph", lambda: {
            "asterlake.operators.dedup": set(),
        }
    )
    assert rotation.queries_touched(base="IGNORED") == set()
    # ...but a touched name the query DOES reference promotes it
    monkeypatch.setattr(
        rotation,
        "_module_touched_names",
        lambda path, base: {"exact_dedup"},
    )
    assert rotation.queries_touched(base="IGNORED") == {"q_alpha"}
