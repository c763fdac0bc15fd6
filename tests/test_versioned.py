"""Versioned dataset snapshots: commit-by-manifest atomicity, pinned
reads, and checksum audits (sources/versioned.py)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from asterlake.sources.versioned import (
    latest_version,
    read_manifest,
    read_version,
    verify_version,
    write_version,
)


def _corpus(spark, n, tag):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("body"),
    )


def test_versions_increment_and_pin(spark, tmp_path):
    root = str(tmp_path / "corpus")
    m1 = write_version(_corpus(spark, 100, "a"), root)
    m2 = write_version(_corpus(spark, 120, "b"), root, extra={"recipe": "v2"})
    assert (m1["version"], m2["version"]) == (1, 2)
    assert latest_version(root) == 2
    assert read_manifest(root, 2)["recipe"] == "v2"
    # pinned read returns the OLD snapshot unchanged after v2 landed
    assert read_version(spark, root, 1).count() == 100
    assert read_version(spark, root).count() == 120


def test_manifest_rides_the_write_action(spark, tmp_path):
    root = str(tmp_path / "corpus")
    df = _corpus(spark, 50, "x")
    m = write_version(df, root)
    assert m["n_rows"] == 50
    # manifest checksum equals an independent recomputation on read-back
    audit = verify_version(spark, root, 1)
    assert audit["ok"], audit


def test_uncommitted_version_is_invisible(spark, tmp_path):
    root = str(tmp_path / "corpus")
    write_version(_corpus(spark, 10, "a"), root)
    # simulate a crashed writer: data dir exists, manifest never landed
    _corpus(spark, 99, "crash").write.parquet(
        os.path.join(root, "v=2", "data")
    )
    assert latest_version(root) == 1
    assert read_version(spark, root).count() == 10
    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 2)
    # a new writer targets v2 (latest COMMITTED is 1) and must fail
    # loudly on the crashed writer's leftover rather than merge into it
    with pytest.raises(Exception):
        write_version(_corpus(spark, 11, "b"), root)


def test_verify_detects_file_tampering(spark, tmp_path):
    root = str(tmp_path / "corpus")
    write_version(_corpus(spark, 30, "a"), root)
    data = os.path.join(root, "v=1", "data")
    # drop one data file (partial replica / bad copy)
    parts = [f for f in os.listdir(data) if f.endswith(".parquet")]
    if len(parts) < 2:  # force a multi-file layout if needed
        write_version(_corpus(spark, 30, "a").repartition(4), root)
        data = os.path.join(root, "v=2", "data")
        parts = [f for f in os.listdir(data) if f.endswith(".parquet")]
    # delete the LARGEST part: a local[32] write of 30 rows can emit
    # empty part files, and removing an empty part leaves the audit
    # legitimately green (flake seen in-suite r9)
    victim = max(parts, key=lambda f: os.path.getsize(os.path.join(data, f)))
    os.remove(os.path.join(data, victim))
    audit = verify_version(spark, root)
    assert not audit["ok"]
    assert audit["actual"]["n_rows"] < audit["expected"]["n_rows"]


def test_verify_distinguishes_encoding_mismatch_from_tampering(
    spark, tmp_path
):
    """A manifest EXPLICITLY declaring an older row_signature encoding
    must fail verification with a sig_encoding_mismatch reason, NOT a
    checksum_mismatch that reads as data corruption (ADVICE r6). A
    manifest merely MISSING the field is NOT assumed old: the current
    encoding predates the field, so field-less stores with valid
    current-encoding signatures exist — they get the full checksum
    audit (intact -> ok; tampered -> checksum_mismatch), never a
    blessing-skip (ADVICE r7)."""
    import json

    root = str(tmp_path / "corpus")
    write_version(_corpus(spark, 20, "a"), root)
    assert read_manifest(root, 1)["sig_encoding"] >= 2
    # intact data, genuine checksum path: reason is None
    assert verify_version(spark, root, 1)["reason"] is None
    path = os.path.join(root, "v=1", "manifest.json")
    m = read_manifest(root, 1)
    # field absent, signatures current-encoding and intact: audited, ok
    m_absent = {k: v for k, v in m.items() if k != "sig_encoding"}
    with open(path, "w") as f:
        json.dump(m_absent, f)
    audit = verify_version(spark, root, 1)
    assert audit["ok"] and audit["reason"] is None
    # field absent AND signature corrupt: real corruption is REPORTED,
    # not masked behind an encoding guess
    m_bad = dict(m_absent)
    m_bad["xor_sig"] ^= 1
    with open(path, "w") as f:
        json.dump(m_bad, f)
    audit = verify_version(spark, root, 1)
    assert not audit["ok"] and audit["reason"] == "checksum_mismatch"
    # field PRESENT and differing: known format gap, short-circuit
    m_old = dict(m)
    m_old["sig_encoding"] = 1
    with open(path, "w") as f:
        json.dump(m_old, f)
    audit = verify_version(spark, root, 1)
    assert not audit["ok"]
    assert audit["reason"] == "sig_encoding_mismatch"
    assert audit["expected"] == {"sig_encoding": 1}


def test_verify_reports_checksum_mismatch_reason(spark, tmp_path):
    """Same-encoding manifest + altered data: reason names the checksum,
    so operators can route 'rewrite the store' vs 'investigate' alarms."""
    import json

    root = str(tmp_path / "corpus")
    write_version(_corpus(spark, 20, "a"), root)
    path = os.path.join(root, "v=1", "manifest.json")
    m = read_manifest(root, 1)
    m["xor_sig"] ^= 1  # flip one bit of the stored signature
    with open(path, "w") as f:
        json.dump(m, f)
    audit = verify_version(spark, root, 1)
    assert not audit["ok"]
    assert audit["reason"] == "checksum_mismatch"


def test_empty_snapshot_commits_and_verifies(spark, tmp_path):
    """An empty DataFrame is a legitimate snapshot: its manifest must
    carry the (0, 0) checksum identity (not NULLs), verify_version must
    report ok=True, and combine_checksums must fold it (ADVICE r5)."""
    from asterlake.operators.integrity import combine_checksums

    root = str(tmp_path / "corpus")
    empty = _corpus(spark, 100, "a").filter(F.lit(False))
    m = write_version(empty, root)
    assert (m["n_rows"], m["xor_sig"], m["sum_sig"]) == (0, 0, 0)
    assert verify_version(spark, root, 1)["ok"]
    m2 = write_version(_corpus(spark, 10, "b"), root)
    folded = combine_checksums(m, m2)
    assert folded["n_rows"] == 10 and folded["xor_sig"] == m2["xor_sig"]


def test_vacuum_keeps_newest_and_removes_rest(spark, tmp_path):
    from asterlake.sources.versioned import vacuum_versions

    root = str(tmp_path / "corpus")
    for i, tag in enumerate("abcd"):
        write_version(_corpus(spark, 10 + i, tag), root)
    out = vacuum_versions(root, keep_last=2)
    assert out == {"kept": [3, 4], "removed": [1, 2]}
    assert latest_version(root) == 4
    assert read_version(spark, root, 3).count() == 12
    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 1)
    # version numbers advance, never reuse a vacuumed slot
    m = write_version(_corpus(spark, 99, "e"), root)
    assert m["version"] == 5
    # vacuumed data dirs are actually gone from disk
    assert not os.path.isdir(os.path.join(root, "v=1"))


def test_vacuum_finishes_a_crashed_removal_and_validates(spark, tmp_path):
    from asterlake.sources.versioned import vacuum_versions

    root = str(tmp_path / "corpus")
    for tag in "ab":
        write_version(_corpus(spark, 10, tag), root)
    # simulate a vacuum that died after the manifest unlink
    os.remove(os.path.join(root, "v=1", "manifest.json"))
    assert latest_version(root) == 2  # invisible already
    out = vacuum_versions(root, keep_last=1)
    assert out["removed"] == [1] and out["kept"] == [2]
    assert not os.path.isdir(os.path.join(root, "v=1"))
    with pytest.raises(ValueError):
        vacuum_versions(root, keep_last=0)


def test_vacuum_spares_a_concurrent_writers_live_slot(spark, tmp_path):
    """write_version lands data files first and the manifest last, so a
    concurrent vacuum sees the in-flight snapshot as a manifest-less
    directory at latest_committed + 1. Vacuum must NOT sweep it as an
    'uncommitted leftover' (it would delete the new snapshot's data out
    from under the writer, ADVICE r7) — only manifest-less slots BELOW
    the newest commit (provably crashed/superseded) are reclaimed."""
    from asterlake.sources.versioned import vacuum_versions

    root = str(tmp_path / "corpus")
    for tag in "ab":
        write_version(_corpus(spark, 10, tag), root)
    # crashed-writer leftover BELOW the newest commit: reclaimable
    os.makedirs(os.path.join(root, "v=1", "junk"), exist_ok=True)
    os.remove(os.path.join(root, "v=1", "manifest.json"))
    # in-flight writer at latest+1: data landed, manifest not yet
    live = os.path.join(root, "v=3", "data")
    os.makedirs(live)
    with open(os.path.join(live, "part-0.parquet"), "w") as f:
        f.write("in-flight")
    out = vacuum_versions(root, keep_last=1)
    assert out == {"kept": [2], "removed": [1]}
    assert os.path.isfile(os.path.join(live, "part-0.parquet"))
    # after the writer would have committed (simulate), the slot is a
    # normal version again; a LATER vacuum with a newer commit reclaims
    # manifest-less leftovers below it as before
    assert not os.path.isdir(os.path.join(root, "v=1"))


# ---------------------------------------------------------------------------
# File-level min/max data skipping (scan_version, r8)
# ---------------------------------------------------------------------------


def _skippable(spark, n=400):
    """Range-layout table: 4 files partitioned by value, a string label,
    a date column, and a column with NULLs concentrated in one file —
    every pruning path exercisable."""
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).cast("double").alias("price"),
        F.concat(F.lit("u"), F.lpad(F.col("id").cast("string"), 4, "0")).alias(
            "label"
        ),
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias(
            "d"
        ),
        F.when(F.col("id") < 100, F.lit(None).cast("long"))
        .otherwise(F.col("id"))
        .alias("maybe"),
    )
    return df.repartitionByRange(4, "k")


def test_scan_version_equals_filter_twin_and_prunes_files(spark, tmp_path):
    from asterlake.sources.versioned import scan_version

    root = str(tmp_path / "corpus")
    write_version(
        _skippable(spark), root, stats_cols=["k", "price", "label", "d", "maybe"]
    )
    full = read_version(spark, root, 1)
    n_files = len(full.inputFiles())
    assert n_files == 4
    cases = [
        [("k", ">=", 300)],
        [("k", ">=", 150), ("k", "<", 250)],
        [("price", "<=", 500.0)],
        [("label", "==", "u0042")],
        [("d", ">", __import__("datetime").date(2024, 12, 1))],
        [("maybe", "is_null",)],
        [("maybe", "not_null",)],
    ]
    import datetime

    for conds in cases:
        got = scan_version(spark, root, conds, version=1)
        twin = full
        for c in conds:
            col = F.col(c[0])
            if c[1] == "is_null":
                twin_c = col.isNull()
            elif c[1] == "not_null":
                twin_c = col.isNotNull()
            else:
                ops = {"==": col == c[2], "<": col < c[2], "<=": col <= c[2],
                       ">": col > c[2], ">=": col >= c[2]}
                twin_c = ops[c[1]]
            twin = twin.where(twin_c)
        g = sorted(r.k for r in got.select("k").collect())
        t = sorted(r.k for r in twin.select("k").collect())
        assert g == t and len(g) > 0, conds
    # pruning is real: a one-file range reads one file, not four
    narrow = scan_version(spark, root, [("k", ">=", 350)], version=1)
    assert len(narrow.inputFiles()) < n_files
    assert len(narrow.inputFiles()) >= 1


def test_scan_version_provably_empty_range_reads_zero_files(spark, tmp_path):
    from asterlake.sources.versioned import scan_version

    root = str(tmp_path / "corpus")
    write_version(_skippable(spark), root, stats_cols=["k"])
    out = scan_version(spark, root, [("k", ">", 10_000)], version=1)
    assert out.count() == 0
    assert out.inputFiles() == []
    # schema survives the empty plan
    assert "price" in out.columns


def test_scan_version_never_prunes_without_stats(spark, tmp_path):
    """A column outside stats_cols must not prune anything — same rows
    as the filter twin, all files read."""
    from asterlake.sources.versioned import scan_version

    root = str(tmp_path / "corpus")
    write_version(_skippable(spark), root, stats_cols=["k"])
    got = scan_version(spark, root, [("price", ">=", 3500.0)], version=1)
    assert len(got.inputFiles()) == 4  # no stats for price: kept all
    want = read_version(spark, root, 1).where(F.col("price") >= 3500.0)
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in want.collect()
    )


def test_scan_version_null_semantics_prune_all_null_file(spark, tmp_path):
    """Comparison predicates never match NULL rows, so the file whose
    `maybe` column is entirely NULL is provably empty for `maybe >= 0`
    and must be skipped."""
    from asterlake.sources.versioned import scan_version

    root = str(tmp_path / "corpus")
    write_version(_skippable(spark), root, stats_cols=["maybe"])
    got = scan_version(spark, root, [("maybe", ">=", 0)], version=1)
    assert len(got.inputFiles()) < 4
    assert got.count() == 300  # ids 100..399


def test_scan_version_errors(spark, tmp_path):
    from asterlake.sources.versioned import scan_version

    root = str(tmp_path / "corpus")
    write_version(_skippable(spark), root)  # no stats_cols
    with pytest.raises(ValueError, match="no file_stats"):
        scan_version(spark, root, [("k", ">=", 1)], version=1)
    write_version(_skippable(spark), root, stats_cols=["k"])
    with pytest.raises(ValueError, match="unsupported skip predicate"):
        scan_version(spark, root, [("k", "!=", 1)], version=2)


def test_collect_file_stats_match_spark_per_file_minmax(spark, tmp_path):
    """The footer-harvested stats must equal an independent Spark
    per-file aggregation of the same files."""
    from asterlake.sources.versioned import collect_file_stats, _stat_decode

    root = str(tmp_path / "corpus")
    write_version(_skippable(spark), root, stats_cols=["k", "label"])
    data_dir = os.path.join(root, "v=1", "data")
    stats = collect_file_stats(data_dir, ["k", "label"])
    per_file = {
        os.path.basename(r.f): r
        for r in read_version(spark, root, 1)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("k").alias("kmin"),
            F.max("k").alias("kmax"),
            F.min("label").alias("lmin"),
            F.max("label").alias("lmax"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert len(per_file) == 4 and set(per_file) == set(stats)
    for name, finfo in stats.items():
        want = per_file[name]
        assert finfo["n_rows"] == want.n
        assert _stat_decode(finfo["cols"]["k"]["min"]) == want.kmin
        assert _stat_decode(finfo["cols"]["k"]["max"]) == want.kmax
        assert _stat_decode(finfo["cols"]["label"]["min"]) == want.lmin
        assert _stat_decode(finfo["cols"]["label"]["max"]) == want.lmax


def _categorical(spark):
    """4 files whose lang [min, max] ranges ALL straddle the probe value
    (each file pairs one low lang with one z-prefixed high lang, so every
    range contains "zh") but whose VALUE SETS differ: "zh" itself lives
    in only files 1 and 2 — the set-index scenario where equality
    pruning beats range pruning."""
    low = ["de", "en", "es", "fr"]
    high = ["zu", "zh", "zh", "zu"]  # "zh" only in files 1 and 2
    rows = []
    for f in range(4):
        pair = [low[f], high[f]]
        for i in range(100):
            rows.append((f * 1000 + i, i, pair[i % 2], float(i)))
    df = spark.createDataFrame(
        rows, "id long, k long, lang string, price double"
    )
    # partition by file index so each parquet file gets its own pair
    return df.repartitionByRange(4, "id")


def test_value_set_skipping_prunes_where_minmax_cannot(spark, tmp_path):
    """Equality on an unsorted categorical: every file's [min,max] on
    lang spans the domain (range stats keep all 4), but the recorded
    value sets prune to exactly the files holding the value — and the
    result stays row-for-row equal to the filter twin."""
    from asterlake.sources.versioned import scan_version

    root = str(tmp_path / "cat")
    write_version(
        _categorical(spark), root,
        stats_cols=["k", "lang"], set_cols=["lang"],
    )
    full = read_version(spark, root, 1)
    assert len(full.inputFiles()) == 4

    # range-only baseline: a second version WITHOUT sets keeps all 4
    root2 = str(tmp_path / "cat_nosets")
    write_version(_categorical(spark), root2, stats_cols=["k", "lang"])
    by_range = scan_version(spark, root2, [("lang", "==", "zh")], version=1)
    assert len(by_range.inputFiles()) == 4  # min/max can't help here

    # value sets prune: zh lives in exactly 2 of the 4 files
    by_set = scan_version(spark, root, [("lang", "==", "zh")], version=1)
    assert len(by_set.inputFiles()) == 2
    twin = full.where(F.col("lang") == "zh")
    assert sorted(r.id for r in by_set.collect()) == sorted(
        r.id for r in twin.collect()
    )

    # IN list: union of the member files, same row-for-row equality
    by_in = scan_version(
        spark, root, [("lang", "in", ["zh", "de"])], version=1
    )
    assert len(by_in.inputFiles()) == 3  # de: file 0; zh: files 1, 2
    twin_in = full.where(F.col("lang").isin("zh", "de"))
    assert sorted(r.id for r in by_in.collect()) == sorted(
        r.id for r in twin_in.collect()
    )

    # a value no file holds reads zero files, schema intact
    ghost = scan_version(spark, root, [("lang", "==", "xx")], version=1)
    assert ghost.count() == 0
    assert ghost.schema == full.schema

    # conjunction with a range predicate composes (set AND range prune)
    both = scan_version(
        spark, root, [("lang", "==", "zh"), ("k", ">=", 50)], version=1
    )
    twin_b = full.where((F.col("lang") == "zh") & (F.col("k") >= 50))
    assert sorted(r.id for r in both.collect()) == sorted(
        r.id for r in twin_b.collect()
    )


def test_value_set_cap_and_type_safety_never_misprune(spark, tmp_path):
    """Over-cap columns record None (never prune); cross-type probes
    (int equality against a double set) keep the file rather than
    trusting a Python type-sensitive membership test."""
    from asterlake.sources.versioned import (
        collect_file_value_sets,
        scan_version,
        _data_path,
    )

    root = str(tmp_path / "cap")
    write_version(
        _categorical(spark), root,
        set_cols=["lang", "id", "price"], set_max=5,
    )
    sets = collect_file_value_sets(_data_path(root, 1), ["id"], set_max=5)
    assert all(s["id"] is None for s in sets.values())  # 100 ids > cap

    # id: every file over cap -> nothing prunes, query still correct
    got = scan_version(spark, root, [("id", "==", 2050)], version=1)
    assert [r.id for r in got.collect()] == [2050]
    assert len(got.inputFiles()) == 4  # None sets keep everything

    # price (double) probed with a PYTHON INT: type category differs
    # from nothing — int vs float are the same category, so this DOES
    # prune correctly via numeric ==; the twin equality is the contract
    full = read_version(spark, root, 1)
    by_price = scan_version(spark, root, [("price", "==", 7)], version=1)
    twin = full.where(F.col("price") == 7)
    assert sorted(r.id for r in by_price.collect()) == sorted(
        r.id for r in twin.collect()
    )
    assert by_price.count() == 4  # one row per file holds price 7.0

    # empty IN list fails loudly rather than planning nonsense
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        scan_version(spark, root, [("lang", "in", [])], version=1).count()


def test_value_set_nan_probe_never_prunes(spark, tmp_path):
    """Spark SQL treats NaN = NaN (and isin with NaN) as a MATCH, while
    Python's nan == nan is False — a Python == membership judgment
    would wrongly prune the file whose recorded value set holds NaN
    (ADVICE r8). The NaN guard must keep that file, and the scan must
    stay row-for-row equal to the filter twin."""
    from asterlake.sources.versioned import scan_version

    nan = float("nan")
    root = str(tmp_path / "nanset")
    rows = [
        # file 0: plain doubles only
        (0, 1.0), (1, 2.0), (2, 3.0),
        # file 1: holds the NaN rows
        (1000, nan), (1001, 5.0), (1002, nan),
    ]
    df = spark.createDataFrame(rows, "id long, v double")
    write_version(
        df.repartitionByRange(2, "id"), root,
        stats_cols=["v"], set_cols=["v"],
    )
    full = read_version(spark, root, 1)
    assert len(full.inputFiles()) == 2

    # NaN probe: the NaN-holding file MUST survive pruning, and Spark's
    # NaN-normalized equality returns both NaN rows
    by_nan = scan_version(spark, root, [("v", "==", nan)], version=1)
    twin = full.where(F.col("v") == nan)
    assert sorted(r.id for r in twin.collect()) == [1000, 1002]
    assert sorted(r.id for r in by_nan.collect()) == [1000, 1002]

    # IN list mixing NaN with a value nowhere present: still no misprune
    by_in = scan_version(
        spark, root, [("v", "in", [nan, 99.0])], version=1
    )
    assert sorted(r.id for r in by_in.collect()) == [1000, 1002]

    # sanity: a plain probe still prunes to one file (sets still work)
    by_plain = scan_version(spark, root, [("v", "==", 2.0)], version=1)
    assert len(by_plain.inputFiles()) == 1
    assert [r.id for r in by_plain.collect()] == [1]


def _high_card(spark):
    """4 files of disjoint high-cardinality string keys (120 distinct
    per file — past the 64-value set cap, so the set index records
    None) whose [min, max] ranges all overlap: the bloom-index scenario
    where neither ranges nor value sets can prune an equality probe."""
    rows = []
    for f in range(4):
        for i in range(120):
            # urls interleave lexicographically across files -> every
            # file's [min, max] range spans every probe
            rows.append((f * 1000 + i, f"https://host{i % 60}.example/{f}/{i}"))
    df = spark.createDataFrame(rows, "id long, url string")
    return df.repartitionByRange(4, "id")


def test_bloom_skipping_prunes_high_cardinality_equality(spark, tmp_path):
    """Equality on a high-cardinality unsorted column: ranges keep all
    4 files (interleaved lexicographic spans) and the set index records
    None (120 distinct > 64 cap), but the per-file bloom bitmap prunes
    to exactly the files that can hold the probe — and the result stays
    row-for-row equal to the filter twin (false positives only ever
    KEEP files; the re-applied filter removes their rows)."""
    from asterlake.sources.versioned import read_manifest, scan_version

    root = str(tmp_path / "hc")
    write_version(
        _high_card(spark), root,
        stats_cols=["url"], set_cols=["url"], bloom_cols=["url"],
    )
    full = read_version(spark, root, 1)
    assert len(full.inputFiles()) == 4

    man = read_manifest(root, 1)
    for finfo in man["file_stats"].values():
        assert finfo["sets"]["url"] is None  # cap overflowed: sets unusable
        assert finfo["blooms"]["url"] is not None  # blooms stay bounded

    probe = "https://host7.example/2/7"  # lives only in file 2
    by_bloom = scan_version(spark, root, [("url", "==", probe)], version=1)
    # no false negatives: the match is found; pruning is real (fp rate
    # at 120 keys in 1024 bits / 4 probes is ~0.6%, so ~always 1 file)
    assert 1 <= len(by_bloom.inputFiles()) <= 2
    twin = full.where(F.col("url") == probe)
    assert sorted(r.id for r in by_bloom.collect()) == sorted(
        r.id for r in twin.collect()
    )

    # IN list spanning two files: union of the candidate files
    probes = [probe, "https://host3.example/0/3"]
    by_in = scan_version(spark, root, [("url", "in", probes)], version=1)
    assert 2 <= len(by_in.inputFiles()) <= 3
    twin_in = full.where(F.col("url").isin(probes))
    assert sorted(r.id for r in by_in.collect()) == sorted(
        r.id for r in twin_in.collect()
    )

    # a key no file holds: with overwhelming probability all 4 bitmaps
    # miss -> zero files, schema intact (keep the assert fp-tolerant)
    ghost = scan_version(
        spark, root, [("url", "==", "https://nowhere.example/x")], version=1
    )
    assert ghost.count() == 0
    assert ghost.schema == full.schema


def test_bloom_numeric_width_and_type_safety_never_misprune(spark, tmp_path):
    """The canonical-encoding contract: an int probe against a DOUBLE
    column must hash to the double's bloom positions (Spark's == casts
    across numeric widths — Fraction reduction makes 150 and 150.0 one
    key); cross-category probes, bool columns, and NaN members always
    keep the file."""
    from asterlake.sources.versioned import (
        _bloom_canonical,
        collect_file_blooms,
        scan_version,
    )

    # int 150 and double 150.0 canonicalize identically; 0.1 is exact
    assert _bloom_canonical(150) == _bloom_canonical(150.0)
    assert _bloom_canonical(0.1) == _bloom_canonical(0.1)
    assert _bloom_canonical(float("nan")) is None
    assert _bloom_canonical(float("inf")) is None
    assert _bloom_canonical(True) is None

    root = str(tmp_path / "num")
    df = spark.createDataFrame(
        [(i, float(i) / 2) for i in range(200)], "id long, price double"
    ).repartitionByRange(4, "id")
    write_version(df, root, stats_cols=["id"], bloom_cols=["price"])
    full = read_version(spark, root, 1)

    # integer-typed probe of a double member: 40.0 is in file 0 only;
    # probing with int 40 must NOT prune that file away
    by_int = scan_version(spark, root, [("price", "==", 40)], version=1)
    twin = full.where(F.col("price") == 40)
    assert sorted(r.id for r in by_int.collect()) == sorted(
        r.id for r in twin.collect()
    )
    assert twin.count() == 1 and by_int.count() == 1

    # NaN-poisoned column: one NaN member makes the file's bloom
    # unusable (None) rather than silently wrong — nothing prunes
    root2 = str(tmp_path / "nan")
    df2 = spark.createDataFrame(
        [(0, float("nan")), (1, 2.0), (2, 3.0), (3, 4.0)],
        "id long, v double",
    ).coalesce(1)
    write_version(df2, root2, bloom_cols=["v"])
    blooms = collect_file_blooms(
        str(tmp_path / "nan" / "v=1"), ["v"]
    )
    assert all(b["v"] is None for b in blooms.values())
    by_v = scan_version(spark, root2, [("v", "==", 2.0)], version=1)
    assert len(by_v.inputFiles()) == 1 and by_v.count() == 1


def test_bloom_empty_and_all_null_files_prune_for_equality(spark, tmp_path):
    """A file whose bloomed column is entirely NULL records an 'empty'
    bloom — equality/IN provably cannot match it, so it prunes; the
    null ops still route through null_count as before."""
    from asterlake.sources.versioned import scan_version

    root = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(i, None if i < 100 else f"k{i}") for i in range(200)],
        "id long, key string",
    ).repartitionByRange(2, "id")
    write_version(df, root, stats_cols=["key"], bloom_cols=["key"])
    full = read_version(spark, root, 1)
    assert len(full.inputFiles()) == 2

    hit = scan_version(spark, root, [("key", "==", "k150")], version=1)
    assert len(hit.inputFiles()) == 1  # the all-null file pruned
    assert [r.id for r in hit.collect()] == [150]


def test_ts_instant_canonical_aware_vs_naive():
    """ADVICE r9 (medium): a tz-aware datetime and the naive datetime
    of the SAME instant must judge equal everywhere the skipper hashes
    or compares — bloom canonical bytes, set membership — or a probe
    falsely prunes a file that holds the value."""
    from datetime import datetime, timedelta, timezone

    from asterlake.sources.versioned import (
        _bloom_canonical,
        _set_may_contain,
        _stat_decode,
        _stat_encode,
    )

    naive = datetime(2024, 1, 1, 0, 0, 0)
    aware = datetime(2024, 1, 1, 0, 0, 0, tzinfo=timezone.utc)
    offset = datetime(
        2024, 1, 1, 5, 30, tzinfo=timezone(timedelta(hours=5, minutes=30))
    )  # same instant as naive/aware, rendered in +05:30
    assert _bloom_canonical(naive) == _bloom_canonical(aware)
    assert _bloom_canonical(naive) == _bloom_canonical(offset)
    # a genuinely different instant still hashes differently
    assert _bloom_canonical(naive) != _bloom_canonical(
        datetime(2024, 1, 1, 0, 0, 1, tzinfo=timezone.utc)
    )
    # set membership: aware member, naive probe (and vice versa) match
    assert _set_may_contain([aware], naive)
    assert _set_may_contain([naive], aware)
    assert _set_may_contain([offset], naive)
    assert not _set_may_contain([aware], naive + timedelta(seconds=1))
    # encode/decode round-trips to the instant-canonical naive form
    assert _stat_decode(_stat_encode(aware)) == naive
    assert _stat_decode(_stat_encode(offset)) == naive
    # pre-fix manifests carrying aware isoformats decode canonical too
    assert _stat_decode({"_t": "ts", "v": "2024-01-01T00:00:00+00:00"}) == naive


def test_scan_version_timestamp_probe_tz_safe(spark, tmp_path):
    """End-to-end: snapshot a timestamp column written as
    TIMESTAMP_MICROS (isAdjustedToUTC -> pyarrow reads the stats back
    TZ-AWARE), then probe with NAIVE datetimes through every index tier
    (range, set, bloom). No false prune: the scan equals the filter
    twin row-for-row, and pruning still works across files."""
    from datetime import datetime

    from asterlake.sources.versioned import scan_version

    old = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df = spark.range(0, 200).select(
            F.col("id").alias("doc_id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(hours=F.col("id").cast("int"))
            ).alias("ts"),
        )
        root = str(tmp_path / "tsed")
        write_version(
            df.repartitionByRange(4, "doc_id"),
            root,
            stats_cols=["ts"],
            set_cols=["ts"],
            bloom_cols=["ts"],
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", old)

    man = read_manifest(root, 1)
    # the harvested stats really are instant-canonical (no tz suffix)
    for finfo in man["file_stats"].values():
        enc = finfo["cols"]["ts"]["min"]
        assert enc["_t"] == "ts" and "+" not in enc["v"], enc

    full = read_version(spark, root, 1)
    assert len(full.inputFiles()) == 4
    probe = datetime(2024, 1, 3, 7, 0, 0)  # hour 55: in exactly one file
    for conds in (
        [("ts", "==", probe)],
        [("ts", "in", [probe])],
        [("ts", ">=", probe), ("ts", "<=", probe)],
    ):
        got = scan_version(spark, root, conds, version=1)
        # the match is FOUND (no false negative) and pruning is real
        assert len(got.inputFiles()) == 1, conds
        assert [r.doc_id for r in got.collect()] == [55], conds
    ghost = scan_version(
        spark, root, [("ts", "==", datetime(2030, 1, 1))], version=1
    )
    assert ghost.count() == 0 and len(ghost.inputFiles()) == 0


def test_scan_version_non_utc_process_naive_probe(spark, tmp_path):
    """ADVICE r10: a NAIVE probe denotes wall time in the PYTHON
    PROCESS's local timezone — that is how PySpark's own filter
    converts the literal (TimestampType.toInternal -> time.mktime; NOT
    the session tz, NOT UTC) — so under a non-UTC process tz the
    pruner must localize it the same way before comparing against the
    manifest's naive-UTC bounds; assuming UTC would false-prune the
    file whose rows the filter keeps. Tokyo process tz: naive
    2024-01-03 11:00 JST == hour 50 UTC; the scan equals its filter
    twin row-for-row and still prunes to one file."""
    import os as _os
    import time as _time
    from datetime import datetime

    from asterlake.sources.versioned import scan_version

    df = spark.range(0, 96).select(
        F.col("id").alias("doc_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(hours=F.col("id").cast("int"))
        ).alias("ts"),
    )
    root = str(tmp_path / "tzproc")
    old_ott = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )  # INT96 carries no parquet min/max stats: range tier needs these
    try:
        write_version(
            df.repartitionByRange(4, "doc_id"),
            root,
            stats_cols=["ts"],
            set_cols=["ts"],
            bloom_cols=["ts"],
        )
    finally:
        if old_ott is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", old_ott)
    old_tz = _os.environ.get("TZ")
    try:
        _os.environ["TZ"] = "Asia/Tokyo"
        _time.tzset()
        # hour 50 UTC == 2024-01-03 02:00 UTC == 2024-01-03 11:00 JST
        probe = datetime(2024, 1, 3, 11, 0, 0)
        twin = read_version(spark, root, 1).where(F.col("ts") == probe)
        twin_ids = [r.doc_id for r in twin.collect()]
        assert twin_ids == [50]  # the filter semantics pruning must match
        for conds in (
            [("ts", "==", probe)],
            [("ts", "in", [probe])],
            [("ts", ">=", probe), ("ts", "<=", probe)],
        ):
            got = scan_version(spark, root, conds, version=1)
            assert [r.doc_id for r in got.collect()] == twin_ids, conds
            # and pruning is REAL, not prune-nothing: one file kept
            assert len(got.inputFiles()) == 1, conds
    finally:
        if old_tz is None:
            _os.environ.pop("TZ", None)
        else:
            _os.environ["TZ"] = old_tz
        _time.tzset()
