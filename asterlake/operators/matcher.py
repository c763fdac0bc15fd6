"""Aho-Corasick multi-pattern scanning — the scalable form of the
denylist/PII/keyword pass (textstats.redact_terms is the regex form;
an alternation regex degrades superlinearly with pattern count, while
Aho-Corasick 1975 matches ALL patterns in one O(len(text)) automaton
walk — the 10k-pattern denylist every corpus-compliance pass runs).

Spark shape: the automaton is built ONCE on the driver from the
pattern list (patterns are a model artifact, like a tokenizer — the
build is pattern-sized, never data-sized) and rides into an
Arrow-batched pandas UDF by closure broadcast. Scanning is row-local:
no shuffle, no join, one pass per document at 100 TB. Counts are exact
integers (END-POSITION semantics: every occurrence of every pattern is
counted, overlaps included — the well-defined count DuckDB can restate
with a substring position scan, which is the oracle contract).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["ac_build", "ac_scan_text", "ac_match_counts"]


def ac_build(patterns: list[str]) -> dict:
    """Build the Aho-Corasick automaton: goto trie + failure links +
    per-node output pattern ids (failure-closed, so emitting at a node
    needs no link chasing at scan time). Pure Python, pattern-sized.
    Duplicate or empty patterns are rejected loudly — both silently
    corrupt counts."""
    if len(set(patterns)) != len(patterns):
        raise ValueError("duplicate patterns")
    if any(not p for p in patterns):
        raise ValueError("empty pattern")
    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for pid, pat in enumerate(patterns):
        node = 0
        for ch in pat:
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        out[node].append(pid)
    fail = [0] * len(goto)
    queue: deque[int] = deque()
    for node in goto[0].values():
        queue.append(node)
    while queue:
        node = queue.popleft()
        for ch, nxt in goto[node].items():
            queue.append(nxt)
            f = fail[node]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[nxt] = goto[f].get(ch, 0)
            if fail[nxt] == nxt:  # root self-transition guard
                fail[nxt] = 0
            out[nxt] = out[nxt] + out[fail[nxt]]  # failure-closed output
    return {"goto": goto, "fail": fail, "out": out, "n": len(patterns)}


def ac_scan_text(auto: dict, text: str) -> list[int]:
    """Per-pattern occurrence counts in one automaton walk (end-position
    semantics: overlapping occurrences all count)."""
    goto, fail, out = auto["goto"], auto["fail"], auto["out"]
    counts = [0] * auto["n"]
    node = 0
    for ch in text:
        while node and ch not in goto[node]:
            node = fail[node]
        node = goto[node].get(ch, 0)
        for pid in out[node]:
            counts[pid] += 1
    return counts


def ac_match_counts(
    docs: DataFrame,
    patterns: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(document, pattern) exact occurrence counts:
    ``(id_col, pattern string, n_matches bigint)`` — rows only for
    matched patterns (the hit relation; a corpus-compliance pass then
    aggregates or gates on it). One automaton walk per document,
    Arrow-batched, row-local."""
    auto = ac_build(patterns)
    out_schema = f"{id_col} long, pattern string, n_matches long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            pats: list[str] = []
            ns: list[int] = []
            for doc_id, t in zip(pdf[id_col], pdf[text_col]):
                counts = ac_scan_text(auto, "" if t is None else t)
                for pid, n in enumerate(counts):
                    if n:
                        ids.append(int(doc_id))
                        pats.append(patterns[pid])
                        ns.append(n)
            yield pd.DataFrame(
                {id_col: ids, "pattern": pats, "n_matches": ns}
            )

    return docs.select(id_col, text_col).mapInPandas(run, out_schema)
