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
    must sit on the BUILD side of the broadcast scalar combine (a
    CartesianProduct would be the regression), and — the r13
    array-grain invariant — the rewrite must shuffle NOTHING but the
    pair-count agg: no window Exchange over the sequence table, no
    Sort, no sequence-width shuffle join."""
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
    seq = vocab.select("word", "freq", F.expr(bpe._SYMS0_SQL).alias("syms"))
    next_seq, record = bpe._bpe_round(seq, 1, fence=False)
    for df in (next_seq, record):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
    rewrite_plan = next_seq._jdf.queryExecution().executedPlan().toString()
    # the 1-row argmax is the BUILD side of a broadcast nested-loop
    # scalar combine (Catalyst folds any constant join key to `true`,
    # so this is the canonical 1-row-broadcast shape engine-wide)
    assert "BroadcastNestedLoopJoin BuildRight" in rewrite_plan, rewrite_plan
    # the old row-grain shapes (heads/tails shuffle joins, the window
    # cascade's per-round Sort over the sequence table) must not come
    # back
    assert "SortMergeJoin" not in rewrite_plan, rewrite_plan
    assert "Window" not in rewrite_plan, rewrite_plan


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


def _split_of(doc_id: int) -> int:
    """Pure-Python twin of the md5 split hash (_SPLIT_HASH_SQL)."""
    import hashlib

    h = hashlib.md5(f"bpesplit{doc_id}".encode()).hexdigest()[:15]
    return int(h, 16) % 5


def brute_apply(merges: list[tuple], word: str) -> list[str]:
    """Sennrich ENCODE loop: repeatedly merge the lowest-rank bigram
    present (greedy left-to-right within a pass) until none applies —
    deliberately NOT the sequential-pass formulation the engine uses,
    so the test pins the documented equivalence between the two."""
    rank = {(a, b): i for i, (_, a, b, _, _) in enumerate(merges)}
    s = list(word) + ["</w>"]
    while True:
        present = {(s[i], s[i + 1]) for i in range(len(s) - 1) if (s[i], s[i + 1]) in rank}
        if not present:
            return s
        a, b = min(present, key=lambda p: rank[p])
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out


def test_bpe_heldout_encode_oracle_matches_brute_force():
    """Held-out encode oracle vs an independent imperative pipeline:
    train classic BPE on the ~80% md5 split, encode the held-out words
    with the min-rank-present Sennrich loop (not the engine's
    sequential passes), recompute per-source fertility + OOV mass."""
    from wikistream_event_data_pipeline_aws_spark.plans.bpe import (
        BPE_ENCODE_HELDOUT_SQL,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    rows = con.execute(
        "SELECT doc_id, source, word FROM (SELECT doc_id, source, unnest("
        r"string_split_regex(trim(text), '\s+')) AS word FROM documents) "
        "WHERE length(word) >= 1"
    ).fetchall()
    train_freq: Counter = Counter()
    held: Counter = Counter()  # (source, word) -> cnt
    for doc_id, src, w in rows:
        if _split_of(doc_id) != 0:
            train_freq[w] += 1
        else:
            held[(src, w)] += 1
    assert held, "sf0.001 must yield a non-empty held-out split"
    merges = brute_bpe(dict(train_freq), BPE_MERGES)
    seg = {w: brute_apply(merges, w) for w in {w for _, w in held}}
    by_src: dict[str, list] = {}
    for (src, w), c in held.items():
        agg = by_src.setdefault(src, [0, 0, 0, set()])
        agg[0] += c
        if w not in train_freq:
            agg[1] += c
        agg[2] += c * len(seg[w])
        agg[3].update(seg[w])
    got = {r[0]: r for r in con.execute(BPE_ENCODE_HELDOUT_SQL).fetchall()}
    assert set(got) == set(by_src)
    for src, (nw, oov, nsub, subs) in by_src.items():
        row = got[src]
        assert row[1:4] == (nw, oov, nsub), (src, row, (nw, oov, nsub))
        assert row[4] == pytest.approx(nsub / nw, abs=1e-12)
        assert row[5] == len(subs)


def test_bpe_heldout_oov_word_encodes_via_chars(spark, tmp_path):
    """An out-of-vocabulary held-out word (never seen in training) must
    still encode — decomposed to chars with learned merges applied
    where they match — and be counted in oov_word_tokens; Spark and the
    DuckDB oracle must agree on the result."""
    from wikistream_event_data_pipeline_aws_spark.plans import bpe

    train_id = next(i for i in range(1, 50) if _split_of(i) != 0)
    held_id = next(i for i in range(1, 50) if _split_of(i) == 0)
    docs = [
        (train_id, "abab abab abba", "src_t"),
        (held_id, "abab zq abba", "src_h"),  # 'zq' is OOV: z/q unseen
    ]
    spark.createDataFrame(
        docs, "doc_id int, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["source"]: r
        for r in bpe.bpe_encode_heldout_fertility(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"src_h"}
    row = out["src_h"]
    assert row["n_word_tokens"] == 3
    assert row["oov_word_tokens"] == 1  # 'zq'
    # independent check: train on the train doc, encode the held-out one
    merges = brute_bpe({"abab": 2, "abba": 1}, bpe.BPE_MERGES)
    nsub = sum(len(brute_apply(merges, w)) for w in ("abab", "zq", "abba"))
    assert row["n_subword_tokens"] == nsub
    subs = set()
    for w in ("abab", "zq", "abba"):
        subs.update(brute_apply(merges, w))
    assert row["distinct_subwords"] == len(subs)
    # oracle agreement on the same micro-corpus
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    orc = con.execute(bpe.BPE_ENCODE_HELDOUT_SQL).fetchall()
    assert sorted(tuple(r) for r in out.values()) == sorted(orc)


def test_bpe_memo_invalidated_on_rewritten_sf_dir(spark, tmp_path):
    """ADVICE r12: the pipeline memo keys on a file-identity fingerprint
    (path, size, mtime_ns), so rewriting an sf_dir IN PLACE must serve
    fresh results, never stale checkpoints."""
    import os as _os

    from wikistream_event_data_pipeline_aws_spark.plans import bpe

    path = str(tmp_path / "documents.parquet")

    def write(text: str) -> None:
        spark.createDataFrame(
            [(1, text, "s")], "doc_id int, text string, source string"
        ).coalesce(1).write.mode("overwrite").parquet(path)

    write("ab ab ab")
    first = sorted(
        tuple(r) for r in bpe.bpe_vocabulary_merges(spark, str(tmp_path)).collect()
    )
    write("cd cd cd")
    # force a distinct mtime_ns even on coarse-clock filesystems
    for dirpath, _, names in _os.walk(path):
        for n in names:
            p = _os.path.join(dirpath, n)
            st = _os.stat(p)
            _os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    second = sorted(
        tuple(r) for r in bpe.bpe_vocabulary_merges(spark, str(tmp_path)).collect()
    )
    assert first != second
    assert first[0][1:4] == ("a", "b", "ab")
    assert second[0][1:4] == ("c", "d", "cd")


def test_bpe_heldout_curve_matches_brute_force_and_final_step():
    """Held-out validation curve vs imperative replay: apply the first
    k train merges (sequential passes) to every held-out word, weight
    by held-out token counts; step K must equal the fertility query's
    total subword mass, and heldout_symbols must fall monotonically."""
    from wikistream_event_data_pipeline_aws_spark.plans.bpe import (
        BPE_ENCODE_CURVE_SQL,
        BPE_ENCODE_HELDOUT_SQL,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    rows = con.execute(
        "SELECT doc_id, word FROM (SELECT doc_id, unnest("
        r"string_split_regex(trim(text), '\s+')) AS word FROM documents) "
        "WHERE length(word) >= 1"
    ).fetchall()
    train_freq: Counter = Counter()
    held: Counter = Counter()
    for doc_id, w in rows:
        if _split_of(doc_id) != 0:
            train_freq[w] += 1
        else:
            held[w] += 1
    merges = brute_bpe(dict(train_freq), BPE_MERGES)
    got = sorted(con.execute(BPE_ENCODE_CURVE_SQL).fetchall())
    n_word_tokens = sum(held.values())
    seqs = {w: list(w) + ["</w>"] for w in held}

    def state():
        return (
            sum(c * len(seqs[w]) for w, c in held.items()),
            len({s for w in seqs for s in seqs[w]}),
        )

    sym, dis = state()
    assert got[0] == (0, sym, dis, n_word_tokens, sym / n_word_tokens)
    prev = sym
    applied = 0
    for step, a, b, _, _ in merges:
        for w in held:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
        applied = step
        sym, dis = state()
        row = got[step]
        assert row[1] == sym and row[2] == dis, (step, row, (sym, dis))
        assert row[4] == pytest.approx(sym / n_word_tokens, abs=1e-12)
        assert row[1] <= prev  # a merge can only shrink held-out mass
        prev = sym
    assert applied == BPE_MERGES
    # step-K mass equals the fertility readout's total subword mass
    fert = con.execute(BPE_ENCODE_HELDOUT_SQL).fetchall()
    assert got[BPE_MERGES][1] == sum(r[3] for r in fert)
