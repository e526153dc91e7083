"""Independent math check for BPE-merge vocabulary induction: the
relational gaps-and-islands formulation (Spark + the unrolled DuckDB
oracle) must reproduce the classic imperative algorithm — Sennrich
learn_bpe semantics re-implemented here in ~20 lines of pure Python
(Counter + a left-to-right scan, no SQL), so a mistake shared by both
engines' identical algebra cannot cancel out.

The micro-corpus cases pin the two spots where relational and
imperative formulations classically diverge: overlapping identical
pairs ("aaaa" must merge to (aa)(aa), not (aa)a a) and argmax
tie-breaks (count DESC, then lexicographic left/right ASC).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikistream_event_data_pipeline_aws_spark.plans.bpe import (  # noqa: E402
    BPE_MERGES,
    _bpe_sql,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def brute_bpe(freq: dict[str, int], k_rounds: int) -> list[tuple]:
    """Classic word-level BPE: k argmax-merge rounds over (word, freq)."""
    seqs = {w: list(w) + ["</w>"] for w in freq}
    merges = []
    for step in range(1, k_rounds + 1):
        pairs: Counter = Counter()
        for w, f in freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        # max count, then lexicographically smallest (left, right)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        merges.append((step, a, b, a + b, cnt))
        for w in freq:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def oracle_rows(con: duckdb.DuckDBPyConnection, k: int = BPE_MERGES) -> list[tuple]:
    return sorted(con.execute(_bpe_sql(k)).fetchall())


def test_bpe_oracle_matches_brute_force_on_testdata():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    freq = dict(
        con.execute(
            "SELECT word, COUNT(*) FROM (SELECT unnest("
            r"string_split_regex(trim(text), '\s+')) AS word FROM documents) "
            "WHERE length(word) >= 1 GROUP BY word"
        ).fetchall()
    )
    assert oracle_rows(con) == brute_bpe(freq, BPE_MERGES)


def _micro(con: duckdb.DuckDBPyConnection, rows: list[tuple[int, str]]) -> None:
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) t(doc_id, text)"
    )


def test_bpe_greedy_overlapping_runs():
    """'aaaa' with best pair (a,a): greedy left-to-right gives (aa)(aa)
    — the 1st and 3rd match positions merge, the 2nd is consumed. A
    non-overlap-aware rewrite would emit (aa) a a and diverge next
    round."""
    con = duckdb.connect()
    _micro(con, [(1, "aaaa aaaa aaa")])
    got = oracle_rows(con, 3)
    freq = {"aaaa": 2, "aaa": 1}
    assert got == brute_bpe(freq, 3)
    # round 1 merges (a,a) counted with overlaps: 3+3+2 occurrences
    assert got[0] == (1, "a", "a", "aa", 8)
    # round 2: 'aa aa </w>' x2 plus 'aa a </w>' -> (aa,aa) count 2,
    # beating (aa,a) count 1 and the </w> pairs' tie at 2 via tie-break
    assert got[1][1:3] == ("aa", "aa") or got[1][4] >= 2


def test_bpe_argmax_tiebreak_is_lexicographic():
    """Two pairs tie on count: the (left ASC, right ASC) smallest wins
    on both engines — 'ab' and 'cd' both appear twice; (a,b) < (c,d)."""
    con = duckdb.connect()
    _micro(con, [(1, "ab cd"), (2, "ab cd")])
    got = oracle_rows(con, 1)
    assert got == brute_bpe({"ab": 2, "cd": 2}, 1)
    assert got[0][1:4] == ("a", "b", "ab")


def test_bpe_spark_matches_oracle_on_micro_corpus(spark, tmp_path):
    """The Spark pipeline (broadcast argmax + gaps-and-islands rewrite)
    against the unrolled oracle on the adversarial overlap corpus."""
    from wikistream_event_data_pipeline_aws_spark.plans import bpe

    spark.createDataFrame(
        [(1, "aaaa aaaa aaa bb bb ab"), (2, "ab ab cd cd")],
        "doc_id int, text string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = sorted(
        tuple(r) for r in bpe.bpe_vocabulary_merges(spark, str(tmp_path)).collect()
    )
    freq = {"aaaa": 2, "aaa": 1, "bb": 2, "ab": 3, "cd": 2}
    expect = brute_bpe(freq, bpe.BPE_MERGES)
    assert got == expect, (got, expect)


def test_bpe_fertility_oracle_matches_brute_force():
    """Encode-side: segment every word with the brute-force learned
    merges, recompute per-source fertility in pure Python, compare."""
    from wikistream_event_data_pipeline_aws_spark.plans.bpe import (
        BPE_SEGMENTATION_FERTILITY_SQL,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    pairs = con.execute(
        "SELECT source, word, COUNT(*) FROM (SELECT source, unnest("
        r"string_split_regex(trim(text), '\s+')) AS word FROM documents) "
        "WHERE length(word) >= 1 GROUP BY source, word"
    ).fetchall()
    freq: Counter = Counter()
    for _, w, c in pairs:
        freq[w] += c
    merges = brute_bpe(dict(freq), BPE_MERGES)
    seqs = {w: list(w) + ["</w>"] for w in freq}
    for _, a, b, _, _ in merges:
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    by_src: dict[str, list] = {}
    for src, w, c in pairs:
        agg = by_src.setdefault(src, [0, 0, set()])
        agg[0] += c
        agg[1] += c * len(seqs[w])
        agg[2].update(seqs[w])
    got = {
        r[0]: r for r in con.execute(BPE_SEGMENTATION_FERTILITY_SQL).fetchall()
    }
    assert set(got) == set(by_src)
    for src, (nw, nsub, subs) in by_src.items():
        row = got[src]
        assert row[1] == nw and row[2] == nsub, (src, row)
        assert row[3] == pytest.approx(nsub / nw, abs=1e-12)
        assert row[4] == len(subs)


def test_bpe_plan_shape(spark, sf_dir):
    """Scale pins on an UNFENCED round (the production pipeline's lazy
    checkpoints hide each round's subplans from executedPlan): the
    argmax must compile to TakeOrderedAndProject (a global sort of the
    pair-count table would be the classic regression), the 1-row best
    must sit on the broadcast side of the match join, and no stage may
    plan a cartesian product."""
    from pyspark.sql import functions as F

    from wikistream_event_data_pipeline_aws_spark.catalog import load_table
    from wikistream_event_data_pipeline_aws_spark.operators.textops import (
        tokenize,
    )
    from wikistream_event_data_pipeline_aws_spark.plans import bpe

    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("word") >= 1)
    )
    seq = vocab.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"),
    ).select(
        "word", "freq", "pos", F.expr("substring(word, pos, 1)").alias("sym")
    )
    next_seq, record = bpe._bpe_round(seq, 1, fence=False)
    for df in (next_seq, record):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
    rewrite_plan = next_seq._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in rewrite_plan, rewrite_plan


def test_bpe_curve_matches_brute_force_and_is_monotone():
    """Training-curve oracle vs pure-Python segmentation replay: after
    each merge round, corpus symbol mass and distinct symbol types must
    match, corpus_symbols must fall monotonically, and each round's
    drop equals its number of MERGED occurrences (<= pair_count, with
    equality when left != right — overlap runs merge only every other
    match)."""
    from wikistream_event_data_pipeline_aws_spark.plans.bpe import (
        BPE_VOCABULARY_CURVE_SQL,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    freq = dict(
        con.execute(
            "SELECT word, COUNT(*) FROM (SELECT unnest("
            r"string_split_regex(trim(text), '\s+')) AS word FROM documents) "
            "WHERE length(word) >= 1 GROUP BY word"
        ).fetchall()
    )
    merges = brute_bpe(freq, BPE_MERGES)
    got = sorted(con.execute(BPE_VOCABULARY_CURVE_SQL).fetchall())
    n_word_tokens = sum(freq.values())
    seqs = {w: list(w) + ["</w>"] for w in freq}

    def state(step):
        return (
            sum(f * len(seqs[w]) for w, f in freq.items()),
            len({s for w in seqs for s in seqs[w]}),
        )

    sym0, dis0 = state(0)
    assert got[0] == (0, sym0, dis0, n_word_tokens, sym0 / n_word_tokens)
    prev = sym0
    for step, a, b, _, cnt in merges:
        for w in freq:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
        symk, disk = state(step)
        row = got[step]
        assert row[1] == symk and row[2] == disk, (step, row)
        assert row[4] == pytest.approx(symk / n_word_tokens, abs=1e-12)
        drop = prev - symk
        assert 0 < drop <= cnt, (step, drop, cnt)
        if a != b:
            assert drop == cnt, (step, drop, cnt)
        prev = symk
