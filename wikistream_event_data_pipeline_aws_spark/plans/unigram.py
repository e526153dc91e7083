"""Unigram-LM Viterbi segmentation — the SentencePiece-family twin of
the BPE encoder (``plans/bpe.py``): where BPE segments by replaying a
merge table, a unigram LM scores EVERY segmentation of a word against
subword probabilities and keeps the most probable one (Kudo 2018, the
public ``sentencepiece`` unigram model). The operator reports, per
source, the corpus negative log-likelihood and fertility under the
optimal (Viterbi) segmentation — the number that compares tokenizer
inventories by how well they explain a corpus slice, not just how
finely they cut it.

Model: the subword inventory is the BPE pipeline's FINAL segmentation
symbols with add-one-smoothed frequency-weighted counts, unioned with
the base character alphabet (SentencePiece keeps base chars so every
string stays segmentable); p(s) = cnt_s / Σcnt. Subword costs are
integer-quantized bit-stable logs — ``floor(1e6·det_ln_ratio(total,
cnt) + 0.5)`` (``operators/detmath.py``) — so the DP is EXACT integer
min-plus with zero cross-engine float risk, and the (cost, n_tokens)
tie-break is folded into one BIGINT: ``w = cost·64 + 1`` per edge
(paths have < 64 edges by the length cap, so the combined sum orders
lexicographically).

Spark-first formulation (no per-word Python, no collect):

- Words are scored on the VOCABULARY grain (distinct words), then
  joined back to per-(source, word) counts — the corpus is touched
  once.
- Segmentations form a DAG over symbol positions 0..L+1 (position L+1
  is the ``</w>`` terminal, matched structurally — never by substring
  search, so a literal ``</w>`` inside a word cannot false-match).
  Edges are (i, j) pairs whose label is in the inventory — enumerated
  per word and equi-joined against the BROADCAST inventory (the
  inventory is tens of rows: base chars + K merges).
- Shortest path = min-plus matrix REPEATED SQUARING: ``VITERBI_ROUNDS
  = 6`` rounds of self-join + min cover paths of up to 2^6 = 64 edges
  — logarithmic in word length instead of linear, so the unrolled
  plan (and its oracle twin) stays fixed-depth while handling words to
  ``MAX_WORD_CHARS = 60`` chars (longer words are excluded on BOTH
  engines and reported in ``long_excluded_tokens``). Each round is
  fenced with a lazy localCheckpoint (consumed twice by the next
  round's self-join).

The DuckDB oracle unrolls the same algebra (inventory + edge CTEs +
6 squaring CTEs) on top of the shared BPE training chain, so the
driver's hash compare checks the inventory smoothing, the quantized
costs, every squaring round and the tie-break encoding.

Reference anchor: extends §2.9 (the reference's deepest text op is the
regexp chain in ``silver_batch_job.py:107-112``; it has no tokenizer
machinery at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.detmath import det_ln_ratio, ln_e_sql, ln_m_sql, ln_val_sql, ln_z_sql
from .bpe import _TOKS_SQL, _bpe_pipeline, _bpe_sql_parts, _EOW, BPE_MERGES

VITERBI_ROUNDS = 6  # covers paths of up to 2^6 = 64 edges
MAX_WORD_CHARS = 60  # L+1 <= 61 edges < 64: the cap the rounds guarantee
_SCALE = 1000000.0  # log quantization: nats * 1e6, floor(+0.5)


def unigram_viterbi_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus NLL + fertility under the optimal unigram-LM
    segmentation (module docstring has the full story)."""
    _, seqs, _ = _bpe_pipeline(spark, sf_dir)
    # r13: the pipeline's sequence tables are (word, freq, syms ARRAY) —
    # explode where the symbol grain is needed
    final = seqs[-1].select("freq", F.explode("syms").alias("sym"))

    # inventory: final-segmentation symbols + base alphabet, add-one
    # smoothed; tens of rows by construction -> broadcast everywhere
    base_syms = seqs[0].select(F.explode("syms").alias("sym")).distinct()
    final_cnt = final.groupBy("sym").agg(F.sum("freq").alias("c0"))
    inv = (
        base_syms.unionByName(final_cnt.select("sym"))
        .distinct()
        .join(final_cnt, "sym", "left")
        .select("sym", (F.coalesce(F.col("c0"), F.lit(0)) + F.lit(1)).alias("cnt"))
    )
    tot = inv.agg(F.sum("cnt").cast("long").alias("total"))
    invc = (
        inv.crossJoin(F.broadcast(tot))
        .select(
            "sym",
            F.floor(
                det_ln_ratio(F.col("total"), F.col("cnt").cast("long"))
                * F.lit(_SCALE)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cost"),
        )
        .localCheckpoint(eager=False)
    )

    # score the vocabulary grain: every distinct word once (the array
    # grain is ALREADY one row per word — no distinct, no exchange)
    vw = (
        seqs[0]
        .select("word")
        .filter(F.length("word") <= MAX_WORD_CHARS)
        .select("word", F.length("word").alias("L"))
    )
    pairs = (
        vw.select(
            "word", "L", F.explode(F.sequence(F.lit(0), F.col("L"))).alias("i")
        )
        .select(
            "word",
            "L",
            "i",
            F.explode(
                F.sequence(F.col("i") + F.lit(1), F.col("L") + F.lit(1))
            ).alias("j"),
        )
    )
    label = F.when(
        F.col("j") <= F.col("L"),
        F.expr("substring(word, i + 1, j - i)"),
    ).otherwise(F.concat(F.expr("substring(word, i + 1, L - i)"), F.lit(_EOW)))
    edges = pairs.join(
        F.broadcast(invc), label == F.col("sym")
    ).select(
        "word", "i", "j", (F.col("cost") * F.lit(64) + F.lit(1)).alias("w")
    )
    # r13/r14 (guide §2.4): hash-partition the DP table by word ONCE,
    # then every squaring round is exchange-free. The r13 shape still
    # paid one repartition per round because its full-outer
    # least-combine (min(dist ∪ via) = least(dist, min(via))) reports
    # UnknownPartitioning. r14 removes the combine altogether with the
    # standard doubling-with-identity trick: seed the DP table with
    # zero-weight self-loops (word, i, i, 0) for every position, and
    # each round becomes ONE self-join + min-agg —
    #   dist_{r+1}(i,j) = min_k dist_r(i,k) + dist_r(k,j)
    # where k = i (resp. k = j) pairs the self-loop with the existing
    # entry and reproduces dist_r(i,j) exactly, so per (word, i, j)
    # with i < j the value is IDENTICAL to min(dist ∪ via); self-loops
    # stay (i, i, 0) because real edges always have i < j (no cycles).
    # Under ``requireAllClusterKeysForCoPartition=false`` (engine
    # default, see session.py) the self-join on (word, k) reuses the
    # word-only clustering of both sides (word is high-cardinality by
    # construction — no skew risk), the min-agg on (word, i, j) reuses
    # it too (subset-key ClusteredDistribution), and the inner join +
    # agg both PRESERVE HashPartitioning(word), which localCheckpoint
    # carries into the next round's LogicalRDD: zero exchanges per
    # round vs 1 in r13 and 3 in r12. The per-round fence stays — the
    # next round consumes dist twice and there is no exchange left for
    # ReuseExchange to deduplicate.
    ident = vw.select(
        "word",
        F.explode(F.sequence(F.lit(0), F.col("L") + F.lit(1))).alias("i"),
    ).select("word", "i", F.col("i").alias("j"), F.lit(0).cast("long").alias("w"))
    dist = (
        edges.unionByName(ident).repartition("word").localCheckpoint(eager=False)
    )
    for _ in range(VITERBI_ROUNDS):
        a = dist.select("word", "i", F.col("j").alias("k"), F.col("w").alias("wa"))
        b = dist.select("word", F.col("i").alias("k"), "j", F.col("w").alias("wb"))
        dist = (
            a.join(b, ["word", "k"])
            .groupBy("word", "i", "j")
            .agg(F.min(F.col("wa") + F.col("wb")).alias("w"))
            .localCheckpoint(eager=False)
        )
    best = dist.filter(
        (F.col("i") == 0) & (F.col("j") == F.length("word") + F.lit(1))
    ).select(
        "word",
        (F.col("w") / F.lit(64)).cast("long").alias("cost"),
        (F.col("w") % F.lit(64)).alias("n_tok"),
    )

    # derived from the family's shared corpus grain (one tokenize pass
    # per session across all BPE/unigram queries — see bpe._word_grain)
    from .bpe import _word_grain

    ws = (
        _word_grain(spark, sf_dir)
        .groupBy("source", "word")
        .agg(F.sum("cnt").alias("cnt"))
    )
    scored = ws.join(best, "word", "left")
    is_long = F.length("word") > MAX_WORD_CHARS
    out = scored.groupBy("source").agg(
        F.sum(F.when(~is_long, F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_word_tokens"),
        F.sum(F.when(is_long, F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("long_excluded_tokens"),
        F.sum(F.when(~is_long, F.col("cnt") * F.col("cost")).otherwise(F.lit(0)))
        .cast("long")
        .alias("nll_scaled"),
        F.sum(F.when(~is_long, F.col("cnt") * F.col("n_tok")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_subword_tokens"),
    )
    return out.select(
        "source",
        "n_word_tokens",
        "long_excluded_tokens",
        "nll_scaled",
        (
            F.col("nll_scaled").cast("double")
            / F.lit(_SCALE)
            / F.col("n_word_tokens").cast("double")
        ).alias("avg_nll_nats"),
        (
            F.col("n_subword_tokens").cast("double")
            / F.col("n_word_tokens").cast("double")
        ).alias("unigram_fertility"),
    )


def _inv_chain_sql(k_rounds: int = BPE_MERGES) -> str:
    """BPE train chain + inventory CTEs (through ``invc``) — split out
    so tests can read the quantized sym -> cost table directly and run
    an independent imperative Viterbi against it."""
    chain, _ = _bpe_sql_parts(k_rounds, with_final_seq=True)
    final = f"seq_{k_rounds + 1}"
    return chain + (
        f""",
base_syms AS (SELECT DISTINCT sym FROM seq_1),
final_cnt AS MATERIALIZED (
  SELECT sym, CAST(SUM(freq) AS BIGINT) AS c0 FROM {final} GROUP BY sym
),
inv AS MATERIALIZED (
  SELECT s.sym, COALESCE(f.c0, 0) + 1 AS cnt
  FROM (SELECT sym FROM base_syms UNION SELECT sym FROM final_cnt) s
  LEFT JOIN final_cnt f ON s.sym = f.sym
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM inv),
inv1 AS (
  SELECT sym, CAST(cnt AS BIGINT) AS cnt, total,
         {ln_e_sql("total", "cnt")} AS e
  FROM inv, tot
),
inv2 AS (SELECT *, {ln_m_sql("total", "cnt", "e")} AS m FROM inv1),
inv3 AS (SELECT *, {ln_z_sql("m")} AS z FROM inv2),
invc AS MATERIALIZED (
  SELECT sym,
         CAST(FLOOR({ln_val_sql("e", "z", "(z * z)")}
              * CAST({_SCALE!r} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cost
  FROM inv3
)"""
    )


INVENTORY_DEBUG_SQL = _inv_chain_sql() + "\nSELECT sym, cost FROM invc"


def _unigram_sql(k_rounds: int = BPE_MERGES) -> str:
    """The same algebra for DuckDB: BPE train chain (shared) +
    inventory + edge enumeration + 6 unrolled squaring rounds."""
    parts = [
        _inv_chain_sql(k_rounds),
        f""",
vw AS (
  SELECT word, CAST(length(word) AS INTEGER) AS L
  FROM (SELECT DISTINCT word FROM seq_1)
  WHERE length(word) <= {MAX_WORD_CHARS}
),
p1 AS (
  SELECT word, L,
         CAST(unnest(range(0, CAST(L AS BIGINT) + 1)) AS INTEGER) AS i
  FROM vw
),
pairs AS (
  SELECT word, L, i,
         CAST(unnest(range(CAST(i AS BIGINT) + 1, CAST(L AS BIGINT) + 2)) AS INTEGER) AS j
  FROM p1
),
dist_0 AS MATERIALIZED (
  SELECT p.word, p.i, p.j, invc.cost * 64 + 1 AS w
  FROM pairs p JOIN invc ON invc.sym = CASE
    WHEN p.j <= p.L THEN substr(p.word, p.i + 1, p.j - p.i)
    ELSE substr(p.word, p.i + 1, p.L - p.i) || '{_EOW}'
  END
)""",
    ]
    for r in range(1, VITERBI_ROUNDS + 1):
        parts.append(
            f""",
dist_{r} AS MATERIALIZED (
  SELECT word, i, j, MIN(w) AS w FROM (
    SELECT word, i, j, w FROM dist_{r - 1}
    UNION ALL
    SELECT a.word, a.i, b.j, a.w + b.w
    FROM dist_{r - 1} a JOIN dist_{r - 1} b
      ON a.word = b.word AND a.j = b.i
  ) GROUP BY word, i, j
)""",
        )
    parts.append(
        f""",
best AS MATERIALIZED (
  SELECT word, CAST(w // 64 AS BIGINT) AS cost, CAST(w % 64 AS BIGINT) AS n_tok
  FROM dist_{VITERBI_ROUNDS}
  WHERE i = 0 AND j = length(word) + 1
),
ws AS MATERIALIZED (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT source, unnest({_TOKS_SQL}) AS word FROM documents)
  WHERE length(word) >= 1 GROUP BY source, word
),
agg AS (
  SELECT source,
         CAST(SUM(CASE WHEN length(w.word) <= {MAX_WORD_CHARS} THEN cnt ELSE 0 END) AS BIGINT)
           AS n_word_tokens,
         CAST(SUM(CASE WHEN length(w.word) > {MAX_WORD_CHARS} THEN cnt ELSE 0 END) AS BIGINT)
           AS long_excluded_tokens,
         CAST(SUM(CASE WHEN length(w.word) <= {MAX_WORD_CHARS} THEN cnt * b.cost ELSE 0 END) AS BIGINT)
           AS nll_scaled,
         CAST(SUM(CASE WHEN length(w.word) <= {MAX_WORD_CHARS} THEN cnt * b.n_tok ELSE 0 END) AS BIGINT)
           AS n_subword_tokens
  FROM ws w LEFT JOIN best b ON w.word = b.word
  GROUP BY source
)
SELECT source, n_word_tokens, long_excluded_tokens, nll_scaled,
       CAST(nll_scaled AS DOUBLE) / CAST({_SCALE!r} AS DOUBLE)
         / CAST(n_word_tokens AS DOUBLE) AS avg_nll_nats,
       CAST(n_subword_tokens AS DOUBLE) / CAST(n_word_tokens AS DOUBLE)
         AS unigram_fertility
FROM agg
""",
    )
    return "".join(parts)


UNIGRAM_VITERBI_NLL_SQL = _unigram_sql()


QUERIES = {
    "unigram_viterbi_nll": unigram_viterbi_nll,
}

ORACLES = {
    "unigram_viterbi_nll": UNIGRAM_VITERBI_NLL_SQL,
}
