"""Training-data preparation queries over the documents table — the
corpus-assembly steps an LLM data pipeline runs after dedup/quality
(north-star scope beyond the reference's operator surface):

* ``pack_sequences``   — concatenate-and-chunk token packing: assign each
  doc its span of fixed-budget training sequences via a partitioned
  cumulative-sum window (the distributed form of "concat the corpus and
  cut every N tokens").
* ``doc_chunk_overlap`` — fixed-size overlapping token chunks per doc
  (the RAG / long-context chunking grain): stride-grid starts, full
  coverage, exact-overlap invariants; chunks emitted as md5
  fingerprints so the result stays compact.
* ``decontaminate_ngram_overlap`` — benchmark decontamination: flag train
  docs sharing any 5-gram with the held-out set via a broadcast hash
  join on shingles (never a cross join).
* ``sample_stratified_hash`` — deterministic per-stratum downsampling
  from an md5-derived uniform; reproducible across engines and runs,
  no RNG state.
* ``redact_pii``       — regex PII scrubbing (emails/phones) with
  redaction counts; the synthetic corpus carries no PII, so the query
  plants deterministic PII derived from doc_id, then removes it.
* ``vocab_topk``       — tokenizer-vocabulary induction: corpus-wide
  word counts, top-k under a total (count desc, token asc) order so
  the cut is deterministic; TakeOrderedAndProject, never a global sort.
* ``text_repetition_filter`` — Gopher-style within-doc repetition
  signals (duplicate-token / duplicate-2-gram fractions) as pure array
  expressions; no explode, no shuffle.
* ``corpus_shuffle_hash`` — deterministic training-order shuffle: an
  md5 sort key split into (shard, position-within-shard) so the global
  order needs only partitioned windows, never a single-partition sort.
* ``domain_mixture_sample`` — mixture balancing: downsample every
  source to the smallest source's size via per-source keep-rates and
  the same md5-uniform; the 20-row rate table is broadcast.

All are pure column expressions / keyed joins — no UDFs — and each has
an exact DuckDB oracle twin.

Scale notes: the packing window partitions by (lang, shard) so no
single partition sees the whole corpus (shard count is the scale knob;
8 here for test-data visibility, thousands at 100 TB). Decontamination
broadcasts only the held-out side, which is small by construction in
any decontamination task. Sampling and redaction are embarrassingly
parallel row maps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.textops import exploded_shingles, hex_hash, shingles_expr, tokenize

_TOKS_SQL = r"string_split_regex(trim(text), '\s+')"

# -- sequence packing -----------------------------------------------------------

SEQ_BUDGET = 512  # tokens per training sequence
N_SHARDS = 8  # packing shards per lang (scale knob)


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each doc's position in the packed training stream: the corpus is
    ordered by doc_id within (lang, shard), token counts are
    cumulative-summed, and every ``SEQ_BUDGET``-token slice is one
    training sequence. ``seq_first``/``seq_last`` are the sequence ids
    the doc lands in (a doc may straddle a boundary)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    seq_first = F.floor(start / F.lit(SEQ_BUDGET))
    seq_last = F.floor((F.col("cum") - 1) / F.lit(SEQ_BUDGET))
    return c.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_last - seq_first + 1).alias("n_seqs"),
    )


PACK_SEQUENCES_SQL = rf"""
WITH t AS (
  SELECT doc_id, lang, doc_id % {N_SHARDS} AS shard,
         CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
         SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, lang, shard, n_tokens,
       CAST((cum - n_tokens) // {SEQ_BUDGET} AS BIGINT) AS seq_first,
       CAST((cum - 1) // {SEQ_BUDGET} AS BIGINT) AS seq_last,
       CAST(((cum - 1) // {SEQ_BUDGET}) - ((cum - n_tokens) // {SEQ_BUDGET}) + 1
            AS BIGINT) AS n_seqs
FROM c
"""

# -- overlapping document chunking ---------------------------------------------

CHUNK_TOKENS = 64  # tokens per chunk (the RAG/context-window grain)
CHUNK_OVERLAP = 16  # tokens shared between consecutive chunks
_CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into fixed-size token chunks with overlap —
    the chunking step every RAG indexing / long-context training
    pipeline runs between cleaning and embedding. Chunk starts are the
    stride grid ``0, S, 2S, ...`` with degenerate tails dropped (a
    start other than 0 must begin before ``n - overlap``, else its
    content is already covered by the previous chunk); the grid
    guarantees full coverage (last start >= n - chunk) and exactly
    ``overlap`` shared tokens between full consecutive chunks
    (invariants pinned in tests/test_operator_invariants.py).

    Shape: one narrow projection, a per-row start grid (tiny array —
    the generator wraps the START LIST, never the token array, per the
    generator-reevaluation trap documented in README), one posexplode,
    then pure per-row slicing — embarrassingly parallel, no shuffle at
    all below the (registry-level) ordering. Chunks are emitted as
    md5 fingerprints + token counts, not text, so the result stays
    compact and value-hash-checkable."""
    d = load_table(spark, sf_dir, "documents")
    t = (
        d.select(
            "doc_id",
            "lang",
            tokenize(F.col("text")).alias("__toks"),
        )
        .withColumn("n_tokens", F.size("__toks").cast("long"))
        .filter(F.col("n_tokens") > 0)
    )
    starts = F.filter(
        F.sequence(F.lit(0).cast("long"), F.col("n_tokens") - 1, F.lit(_CHUNK_STRIDE).cast("long")),
        lambda s: (s == 0) | (s < F.col("n_tokens") - CHUNK_OVERLAP),
    )
    chunked = t.select(
        "doc_id",
        "lang",
        "n_tokens",
        "__toks",
        F.explode(starts).alias("start_token"),
    )
    chunk = F.slice(F.col("__toks"), F.col("start_token") + 1, CHUNK_TOKENS)
    return chunked.select(
        "doc_id",
        "lang",
        (F.col("start_token") / _CHUNK_STRIDE).cast("long").alias("chunk_id"),
        "start_token",
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


DOC_CHUNK_OVERLAP_SQL = rf"""
WITH t AS (
  SELECT doc_id, lang, {_TOKS_SQL} AS toks,
         CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
  FROM documents
  WHERE len({_TOKS_SQL}) > 0
),
s AS (
  SELECT doc_id, lang, n_tokens, toks,
         CAST(u.s AS BIGINT) AS start_token
  FROM t, UNNEST(list_filter(range(0, n_tokens, {_CHUNK_STRIDE}),
                             x -> x = 0 OR x < n_tokens - {CHUNK_OVERLAP})) AS u(s)
)
SELECT doc_id, lang,
       CAST(start_token // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       start_token,
       CAST(len(list_slice(toks, start_token + 1, start_token + {CHUNK_TOKENS})) AS BIGINT)
         AS chunk_tokens,
       md5(array_to_string(list_slice(toks, start_token + 1, start_token + {CHUNK_TOKENS}), ' '))
         AS chunk_md5
FROM s
"""

# -- benchmark decontamination --------------------------------------------------

DECON_K = 5  # shingle width
DECON_MOD = 97  # doc_id % DECON_MOD == 0 -> held-out "benchmark" doc
DECON_PLANT_OFFSET = 200_000


def _decon_corpus(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """ONE copy of the decontamination plant discipline — (train, heldout)
    with every held-out doc's text re-entering train under
    doc_id + DECON_PLANT_OFFSET plus an appended token. Shared by both
    decontamination queries so a plant-rule tweak cannot make them
    disagree about what is contaminated (the SQL twins already share
    _DECON_TRAIN_SQL/_DECON_HELD_SQL the same way)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    heldout = d.filter(F.col("doc_id") % DECON_MOD == 0)
    planted = heldout.select(
        (F.col("doc_id") + DECON_PLANT_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" leaked benchmark copy")).alias("text"),
    )
    train = d.filter(F.col("doc_id") % DECON_MOD != 0).unionByName(planted)
    return train, heldout


def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train docs contaminated by the held-out slice: any shared
    ``DECON_K``-gram. Shingle sets hash-join on the shingle string with
    the (small) held-out side broadcast; output is per train doc with
    the overlap evidence. The synthetic corpus has few organic 5-gram
    collisions, so guaranteed leaks are planted: each held-out doc's
    text re-enters train under doc_id+offset with a token appended —
    those MUST all surface (same plant-then-find discipline as the
    near-dup queries)."""
    train, heldout = _decon_corpus(spark, sf_dir)
    train_sh = exploded_shingles(train, "doc_id", "text", k=DECON_K).distinct()
    held_sh = (
        exploded_shingles(heldout, "doc_id", "text", k=DECON_K)
        .distinct()
        .withColumnRenamed("doc_id", "heldout_doc_id")
    )
    return (
        train_sh.join(F.broadcast(held_sh), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hit_ngrams"),
            F.countDistinct("heldout_doc_id").alias("n_heldout_docs"),
        )
    )


_DECON_SHINGLES_SQL = rf"""
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(t) >= {DECON_K}
                     THEN list_transform(range(1, len(t) - {DECON_K - 2}),
                                         i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))
                     ELSE [] END) AS shingle
  FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM ({{src}}))
"""

_DECON_TRAIN_SQL = f"""
  SELECT doc_id, text FROM documents WHERE doc_id % {DECON_MOD} != 0
  UNION ALL
  SELECT doc_id + {DECON_PLANT_OFFSET} AS doc_id,
         concat(text, ' leaked benchmark copy') AS text
  FROM documents WHERE doc_id % {DECON_MOD} = 0
"""
_DECON_HELD_SQL = f"SELECT doc_id, text FROM documents WHERE doc_id % {DECON_MOD} = 0"

DECONTAMINATE_SQL = rf"""
WITH train_sh AS ({_DECON_SHINGLES_SQL.format(src=_DECON_TRAIN_SQL)}),
held_sh AS ({_DECON_SHINGLES_SQL.format(src=_DECON_HELD_SQL)})
SELECT t.doc_id,
       COUNT(DISTINCT t.shingle) AS n_hit_ngrams,
       COUNT(DISTINCT h.doc_id) AS n_heldout_docs
FROM train_sh t JOIN held_sh h ON t.shingle = h.shingle
GROUP BY t.doc_id
"""

# -- deterministic stratified sampling ------------------------------------------

_RATES_PER_MILLE = {"en": 100, "es": 300}  # other langs: 500
_DEFAULT_RATE = 500
_STRAT_SEED = "strat"


def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language downsampling with a deterministic md5-uniform: keep
    a doc iff hash(doc_id) mod 1000 < the stratum's rate. Reproducible
    on any engine (no RNG), stable under reruns/backfills — the
    property `sampleBy` lacks."""
    d = load_table(spark, sf_dir, "documents")
    u = hex_hash(F.col("doc_id").cast("string"), seed=_STRAT_SEED) % 1000
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in _RATES_PER_MILLE.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        d.select("doc_id", "lang", u.alias("strat_hash"), rate.alias("rate_per_mille"))
        .filter(F.col("strat_hash") < F.col("rate_per_mille"))
    )


_RATE_SQL = "CASE lang WHEN 'en' THEN 100 WHEN 'es' THEN 300 ELSE 500 END"

SAMPLE_STRATIFIED_SQL = rf"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(concat('{_STRAT_SEED}', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000 AS strat_hash,
         CAST({_RATE_SQL} AS BIGINT) AS rate_per_mille
  FROM documents
)
SELECT doc_id, lang, strat_hash, rate_per_mille
FROM t WHERE strat_hash < rate_per_mille
"""


_IMP_CAP = 200  # tokens at which the keep-probability saturates
_IMP_SEED = "imp"


def sample_importance_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ROW weighted (importance) sampling — the third sampling mode
    after per-group rates (stratified) and group equalization (mixture):
    keep-probability proportional to document length,
    ``p = min(n_tokens, CAP) / (2 * CAP)``, so token-heavy docs are
    favored in proportion to their training-token contribution. The
    keep predicate is PURE INTEGER — ``u mod (2*CAP*1000) <
    min(n_tokens, CAP) * 1000`` with the md5-uniform ``u`` — so the
    probabilistic decision is bit-reproducible on any engine, rerun, or
    backfill. Embarrassingly parallel row map, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokenize(F.col("text"))).cast("long")
    u = hex_hash(F.col("doc_id").cast("string"), seed=_IMP_SEED) % (2 * _IMP_CAP * 1000)
    w = F.least(n_tokens, F.lit(_IMP_CAP)) * 1000
    return (
        d.select(
            "doc_id",
            "lang",
            n_tokens.alias("n_tokens"),
            u.alias("draw"),
            w.alias("keep_threshold"),
        )
        .filter(F.col("draw") < F.col("keep_threshold"))
    )


SAMPLE_IMPORTANCE_SQL = rf"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
         CAST(concat('0x', substr(md5(concat('{_IMP_SEED}', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
           % {2 * _IMP_CAP * 1000} AS draw
  FROM documents
)
SELECT doc_id, lang, n_tokens, draw,
       LEAST(n_tokens, {_IMP_CAP}) * 1000 AS keep_threshold
FROM t WHERE draw < LEAST(n_tokens, {_IMP_CAP}) * 1000
"""

# -- PII redaction --------------------------------------------------------------

_EMAIL_RE = r"[a-zA-Z0-9._]+@[a-zA-Z0-9.]+\.[a-z]{2,}"
_PHONE_RE = r"555-[0-9]{4}"


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant doc_id-derived PII (one email, one 555-prefixed phone) in
    each doc, then scrub both with regexes and report counts plus a
    fingerprint of the redacted text. The plant step stands in for real
    corpus PII; the scrub expressions are the actual operator."""
    d = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    with_pii = d.select("doc_id", planted.alias("text_pii"))
    n_emails = F.regexp_count(F.col("text_pii"), F.lit(_EMAIL_RE))
    n_phones = F.regexp_count(F.col("text_pii"), F.lit(_PHONE_RE))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text_pii"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return with_pii.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"),
    )


REDACT_PII_SQL = rf"""
WITH p AS (
  SELECT doc_id,
         concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                '@example.com or 555-01',
                lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')) AS text_pii
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text_pii, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text_pii, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(text_pii, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
FROM p
"""


# -- vocabulary induction -------------------------------------------------------

VOCAB_K = 25


def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide word counts, top ``VOCAB_K`` — the counting pass of
    tokenizer-vocab induction. The (count desc, token asc) order is
    total, so the cut is deterministic; orderBy+limit compiles to
    TakeOrderedAndProject (per-partition heaps, k rows to the driver),
    not a global sort."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokenize(F.col("text"))).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(VOCAB_K)
    )


VOCAB_TOPK_SQL = rf"""
SELECT token, COUNT(*) AS n_occurrences
FROM (SELECT unnest({_TOKS_SQL}) AS token FROM documents)
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT {VOCAB_K}
"""


def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocab coverage curve — "how big must the vocabulary
    be to cover X% of corpus token occurrences?", the sizing diagnostic
    a tokenizer build runs right after the counting pass
    (``vocab_topk``). Tokens rank by (frequency desc, token) — a total
    order, so the curve is deterministic — and the cumulative
    occurrence share is emitted at power-of-two vocab sizes plus the
    full-vocab point (bounded output at any corpus size).

    Shape: one explode + hash agg collapses the corpus to the
    DISTINCT-TOKEN grain first; the global rank/cumsum window runs
    over that vocab-bounded grain only (same validity note as the KS
    ECDF — a production vocab is ~1e5-1e6 rows, never data-scale), and
    the single-row totals join is a broadcast. ``coverage`` is one
    fixed float expression over exact BIGINT counts."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.orderBy(F.col("tf").desc(), F.col("token").asc())
    ranked = tf.select(
        "token",
        F.row_number().over(w).alias("vocab_size"),
        F.sum("tf")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_occurrences"),
    )
    tot = tf.agg(
        F.sum("tf").alias("total_occurrences"),
        F.count(F.lit(1)).cast("int").alias("n_vocab"),
    )
    return (
        ranked.join(F.broadcast(tot))
        .filter(
            F.expr("(vocab_size & (vocab_size - 1)) = 0")
            | (F.col("vocab_size") == F.col("n_vocab"))
        )
        .select(
            "vocab_size",
            F.col("token").alias("boundary_token"),
            "cum_occurrences",
            "total_occurrences",
            (
                F.col("cum_occurrences").cast("double")
                / F.col("total_occurrences").cast("double")
            ).alias("coverage"),
        )
    )


VOCAB_COVERAGE_CURVE_SQL = rf"""
WITH tf AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT unnest({_TOKS_SQL}) AS token FROM documents)
  GROUP BY token
),
ranked AS (
  SELECT token,
         CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS INTEGER) AS vocab_size,
         CAST(SUM(tf) OVER (ORDER BY tf DESC, token
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_occurrences
  FROM tf
),
tot AS (
  SELECT CAST(SUM(tf) AS BIGINT) AS total_occurrences,
         CAST(COUNT(*) AS INTEGER) AS n_vocab
  FROM tf
)
SELECT vocab_size, token AS boundary_token, cum_occurrences, total_occurrences,
       CAST(cum_occurrences AS DOUBLE) / CAST(total_occurrences AS DOUBLE)
         AS coverage
FROM ranked, tot
WHERE (vocab_size & (vocab_size - 1)) = 0 OR vocab_size = n_vocab
"""


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training step's candidate table: corpus-wide counts of
    ADJACENT token pairs. The top pair is the merge a byte-pair-encoding
    trainer applies next; the ranked frontier is what you inspect when
    auditing a tokenizer build. Same shape as vocab_topk one n-gram up:
    per-doc pair arrays are a zero-shuffle projection, the count is one
    hash aggregation, the cut is TakeOrderedAndProject under the total
    (count desc, pair asc) order. A full BPE train is this query in a
    loop with pair-collapsed re-tokenization — each iteration stays
    this exact distributed shape."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(tokenize(F.col("text")).alias("toks"))
    pairs = t.select(F.explode(shingles_expr("toks", k=2)).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair"))
        .limit(VOCAB_K)
    )


BPE_MERGE_CANDIDATES_SQL = rf"""
SELECT pair, COUNT(*) AS n_occurrences
FROM (
  SELECT unnest(CASE WHEN len(t) >= 2
                     THEN list_transform(range(1, len(t)),
                                         i -> concat_ws(' ', t[i], t[i+1]))
                     ELSE [] END) AS pair
  FROM (SELECT {_TOKS_SQL} AS t FROM documents)
)
GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT {VOCAB_K}
"""

# -- within-doc repetition signals ----------------------------------------------

REPETITION_THRESHOLD = 0.2


def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: the fraction of tokens
    (and of 2-grams) that are repeats of an earlier occurrence in the
    same doc. Pure array expressions over the token list — no explode,
    no shuffle, embarrassingly parallel."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokenize(F.col("text")).alias("toks"))
    n = F.size("toks")
    nd = F.size(F.array_distinct("toks"))
    g2 = shingles_expr("toks", k=2)
    n2 = F.size(g2)
    nd2 = F.size(F.array_distinct(g2))
    dup_tok = (n - nd) / n
    dup_2g = F.when(n2 > 0, (n2 - nd2) / n2).otherwise(F.lit(0.0))
    return t.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        dup_tok.alias("dup_token_frac"),
        dup_2g.alias("dup_2gram_frac"),
        (dup_2g > REPETITION_THRESHOLD).alias("is_repetitive"),
    )


TEXT_REPETITION_SQL = rf"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
g AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)),
                                  i -> concat_ws(' ', toks[i], toks[i+1]))
              ELSE [] END AS g2
  FROM t
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       (len(toks) - len(list_distinct(toks))) / CAST(len(toks) AS DOUBLE) AS dup_token_frac,
       CASE WHEN len(g2) > 0
            THEN (len(g2) - len(list_distinct(g2))) / CAST(len(g2) AS DOUBLE)
            ELSE 0.0 END AS dup_2gram_frac,
       CASE WHEN len(g2) > 0
            THEN (len(g2) - len(list_distinct(g2))) / CAST(len(g2) AS DOUBLE)
            ELSE 0.0 END > {REPETITION_THRESHOLD} AS is_repetitive
FROM g
"""

# -- deterministic corpus shuffle -----------------------------------------------

SHUF_SEED = "shuf"
SHUF_SHARDS = 16


def corpus_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order shuffle without RNG state or a global sort: an
    md5-uniform per doc, split into (shard, position-within-shard).
    (shard, pos) is a reproducible total order; each shard orders
    independently, so the window is partitioned — at 100 TB this is a
    plain repartition + per-partition sort, no single-partition
    bottleneck."""
    d = load_table(spark, sf_dir, "documents")
    u = hex_hash(F.col("doc_id").cast("string"), seed=SHUF_SEED)
    t = d.select("doc_id", u.alias("shuffle_hash"), (u % SHUF_SHARDS).alias("shard"))
    w = Window.partitionBy("shard").orderBy("shuffle_hash", "doc_id")
    return t.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
        "shuffle_hash",
    )


_SHUF_HASH_SQL = (
    f"CAST(concat('0x', substr(md5(concat('{SHUF_SEED}', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)"
)

CORPUS_SHUFFLE_SQL = rf"""
WITH t AS (
  SELECT doc_id, {_SHUF_HASH_SQL} AS shuffle_hash,
         {_SHUF_HASH_SQL} % {SHUF_SHARDS} AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY shuffle_hash, doc_id) AS BIGINT) AS pos,
       shuffle_hash
FROM t
"""

# -- domain mixture balancing ---------------------------------------------------

_MIX_SEED = "mix"


def domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture balancing: every source downsampled to the smallest
    source's size. Per-source keep-rates come from one count
    aggregation (the rate table is sources-sized — broadcast), the
    keep decision from the deterministic md5-uniform. The synthetic
    sources are equal-sized, so imbalance is planted first (odd docs
    dropped from the single-digit sources) — the rates must then
    actually trim the larger sources."""
    d = load_table(spark, sf_dir, "documents").filter(
        ~((F.col("doc_id") % 2 == 1) & (F.length("source") == 4))
    )
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    min_n = counts.agg(F.min("n_source").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "source",
        F.floor(F.lit(1000) * F.col("min_n") / F.col("n_source")).alias(
            "rate_per_mille"
        ),
    )
    u = hex_hash(F.col("doc_id").cast("string"), seed=_MIX_SEED) % 1000
    return (
        d.select("doc_id", "source", u.alias("mix_hash"))
        .join(F.broadcast(rates), "source")
        .filter(F.col("mix_hash") < F.col("rate_per_mille"))
        .select("doc_id", "source", "mix_hash", "rate_per_mille")
    )


DOMAIN_MIXTURE_SQL = rf"""
WITH docs_imb AS (
  SELECT * FROM documents
  WHERE NOT (doc_id % 2 = 1 AND length(source) = 4)
),
counts AS (SELECT source, COUNT(*) AS n_source FROM docs_imb GROUP BY source),
rates AS (
  SELECT source,
         CAST(FLOOR(1000 * (SELECT MIN(n_source) FROM counts) / CAST(n_source AS DOUBLE)) AS BIGINT) AS rate_per_mille
  FROM counts
),
t AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(concat('{_MIX_SEED}', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000 AS mix_hash
  FROM docs_imb
)
SELECT doc_id, t.source, mix_hash, rate_per_mille
FROM t JOIN rates ON t.source = rates.source
WHERE mix_hash < rate_per_mille
"""


# -- content-defined chunking ----------------------------------------------------

CDC_DIVISOR = 16  # expected chunk length ~ divisor tokens


def doc_chunk_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: boundaries where a rolling polynomial
    hash of the last 4 tokens hits ``rh % CDC_DIVISOR == 0`` — unlike
    the fixed-stride chunker (``doc_chunk_overlap``), an insertion
    shifts only the chunks it touches, so chunk fingerprints stay
    stable across edits and dedup at the chunk grain survives document
    drift (the FastCDC/Rabin idea on token streams). All arithmetic is
    exact BIGINT (md5-derived token hashes, integer coefficients), the
    boundary predicate and segment ids resolve in ONE doc-partitioned
    window pass (lags + running sum share the frame), and chunks emit
    as md5 fingerprints + token counts so the output stays narrow."""
    return chunk_cdc(load_table(spark, sf_dir, "documents"))


def chunk_cdc(d: DataFrame) -> DataFrame:
    """The CDC segmentation core over any (doc_id, text) frame — shared
    by the published chunking query and the dedup-method-agreement
    artifact's chunk leg (which chunks the clone-augmented corpus)."""
    toks = d.select(
        "doc_id",
        # the SHARED token grain (textops.tokenize): chunk fingerprints
        # must stay comparable with every other tokenize()-based path
        F.posexplode(tokenize(F.col("text"))).alias("pos", "token"),
    )
    th = F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
    w = Window.partitionBy("doc_id").orderBy("pos")
    rh = (
        th
        + F.lit(31) * F.coalesce(F.lag(th, 1).over(w), F.lit(0))
        + F.lit(961) * F.coalesce(F.lag(th, 2).over(w), F.lit(0))
        + F.lit(29791) * F.coalesce(F.lag(th, 3).over(w), F.lit(0))
    )
    boundary = F.when((F.col("pos") == 0) | (rh % CDC_DIVISOR == 0), 1).otherwise(0)
    seg = toks.withColumn(
        "chunk_id",
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        seg.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("pos", "token"))),
                        lambda s: s["token"],
                    ),
                )
            ).alias("chunk_fp"),
        )
    )


# ONE copy of the CDC segmentation CTE chain: the chunking oracle, the
# chunk-dedup oracle and the method-agreement oracle's chunk leg MUST
# segment identically or chunk-grain dedup silently diverges from the
# published chunking (a boundary-rule tweak edited in one string but
# not the others). ``src`` parameterizes the corpus (documents, or the
# clone-augmented variant).
def _cdc_segmented_sql(src: str = "documents") -> str:
    return _CDC_SEGMENTED_TEMPLATE.replace("__CDC_SRC__", src)


_CDC_SEGMENTED_TEMPLATE = rf"""toks AS (
  SELECT doc_id, u.i - 1 AS pos, t[u.i] AS token
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM __CDC_SRC__),
       UNNEST(generate_series(1, len(t))) AS u(i)
),
hashed AS (
  SELECT doc_id, pos, token,
         CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT) AS th
  FROM toks
),
rolled AS (
  SELECT doc_id, pos, token,
         th
         + 31 * COALESCE(lag(th, 1) OVER w, 0)
         + 961 * COALESCE(lag(th, 2) OVER w, 0)
         + 29791 * COALESCE(lag(th, 3) OVER w, 0) AS rh
  FROM hashed
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
flagged AS (
  SELECT doc_id, pos, token,
         CASE WHEN pos = 0 OR rh % {CDC_DIVISOR} = 0 THEN 1 ELSE 0 END AS boundary
  FROM rolled
),
segmented AS (
  SELECT doc_id, pos, token,
         SUM(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id
  FROM flagged
)"""

_CDC_SEGMENTED_SQL = _cdc_segmented_sql()


DOC_CHUNK_CDC_SQL = rf"""
WITH {_CDC_SEGMENTED_SQL}
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       COUNT(*) AS n_tokens,
       md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_fp
FROM segmented GROUP BY doc_id, chunk_id
"""


CDC_MIN_CHUNK = 8  # chunks below this share trivially; drop from matching


def dedup_chunk_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-grain near-dup detection: document pairs sharing
    content-defined chunks. The candidate join is an EQUI-join on chunk
    fingerprints (never all-pairs), chunks under CDC_MIN_CHUNK tokens
    are dropped before pairing (tiny chunks match universally and would
    reintroduce the quadratic blow-up), and the containment score is
    shared / min(chunk counts). Because CDC boundaries are edit-local,
    this catches documents sharing long passages even when their
    fixed-stride alignments differ — the chunk-level complement of the
    passage-exact and MinHash doc-level paths (``plans/dedup.py``)."""
    # fence the CDC chain (posexplode + two window passes + collect_list):
    # it feeds BOTH self-join sides plus the size aggregation, and
    # exchange reuse across the differently-projected branches is not
    # guaranteed — same discipline as jaccard_pairs' 3-consumer shingles
    chunks = (
        doc_chunk_cdc(spark, sf_dir)
        .filter(F.col("n_tokens") >= CDC_MIN_CHUNK)
        .localCheckpoint(eager=False)
    )
    sizes = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    a = chunks.select(F.col("doc_id").alias("id_a"), F.col("chunk_fp").alias("fp"))
    b = chunks.select(F.col("doc_id").alias("id_b"), F.col("chunk_fp").alias("fp"))
    pairs = (
        a.join(b, (a.fp == b.fp) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_chunks").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_chunks").alias("nb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared_chunks",
            (
                F.col("shared_chunks")
                / F.least(F.col("na"), F.col("nb")).cast("double")
            ).alias("containment"),
        )
    )


DEDUP_CHUNK_SHARED_SQL = rf"""
WITH {_CDC_SEGMENTED_SQL},
chunks AS (
  SELECT doc_id, md5(string_agg(token, ' ' ORDER BY pos)) AS fp
  FROM segmented GROUP BY doc_id, chunk_id
  HAVING COUNT(*) >= {CDC_MIN_CHUNK}
),
sizes AS (SELECT doc_id, COUNT(*) AS n_chunks FROM chunks GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_chunks
  FROM chunks a JOIN chunks b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, shared_chunks,
       shared_chunks / CAST(least(sa.n_chunks, sb.n_chunks) AS DOUBLE) AS containment
FROM pairs
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
"""


# -- temperature-scaled mixture weights -----------------------------------------


def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language-mixture weights: p_i ∝ n_i^(1/T) with
    T = 2 (i.e. sqrt), the standard multilingual rebalancing that
    upsamples low-resource languages relative to proportional sampling.
    Float-parity design: sqrt is IEEE-correctly-rounded in both engines,
    and the normalizing total is folded over the *lang-sorted* weight
    array (``F.aggregate`` here, ``list_reduce`` in the oracle) so both
    engines add the same doubles in the same order — the per-group agg
    is one shuffle of ≤ |languages| rows; the scalar total is a 1-row
    broadcast join, never a collect."""
    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("weight", F.sqrt(F.col("n_docs").cast("double")))
    )
    total = counts.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("lang", "weight"))),
            F.lit(0.0),
            lambda acc, x: acc + x["weight"],
        ).alias("total_w")
    )
    budget = F.lit(1_000_000.0)
    return (
        counts.join(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            "weight",
            (F.col("weight") / F.col("total_w")).alias("share"),
            F.floor(budget * F.col("weight") / F.col("total_w"))
            .cast("bigint")
            .alias("budget_docs"),
        )
    )


MIXTURE_TEMPERATURE_SQL = """
WITH counts AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
), arr AS (
  SELECT list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang) AS ws FROM counts
), tot AS (
  SELECT list_reduce(ws, (a, b) -> a + b) AS total_w FROM arr
)
SELECT c.lang, c.n_docs,
       sqrt(CAST(c.n_docs AS DOUBLE)) AS weight,
       sqrt(CAST(c.n_docs AS DOUBLE)) / t.total_w AS share,
       CAST(floor(1000000.0 * sqrt(CAST(c.n_docs AS DOUBLE)) / t.total_w) AS BIGINT) AS budget_docs
FROM counts c, tot t
"""


def decontaminate_overlap_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded decontamination: for each contaminated train doc, the
    FRACTION of its distinct ``DECON_K``-grams found in the held-out
    set — the policy input for threshold-based removal (a 2% organic
    collision and a 95% planted leak should not get the same
    treatment). Same plant + broadcast shingle join as
    ``decontaminate_ngram_overlap``; adds the per-doc shingle totals
    (one extra hash agg at doc grain) and flags docs beyond a 10%
    removal threshold. The fraction is the single float division."""
    train, heldout = _decon_corpus(spark, sf_dir)
    train_sh = exploded_shingles(train, "doc_id", "text", k=DECON_K).distinct()
    held_sh = (
        exploded_shingles(heldout, "doc_id", "text", k=DECON_K)
        .select("shingle")
        .distinct()
    )
    sizes = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        train_sh.join(F.broadcast(held_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
    )
    frac = F.col("n_hit_ngrams").cast("double") / F.col("n_ngrams").cast("double")
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_ngrams",
        "n_hit_ngrams",
        frac.alias("overlap_frac"),
        (frac >= 0.1).alias("remove_at_10pct"),
    )


DECONTAMINATE_FRACTION_SQL = rf"""
WITH train_sh AS ({_DECON_SHINGLES_SQL.format(src=_DECON_TRAIN_SQL)}),
held_sh AS (
  SELECT DISTINCT shingle FROM ({_DECON_SHINGLES_SQL.format(src=_DECON_HELD_SQL)})
),
sizes AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM train_sh GROUP BY doc_id),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_hit_ngrams
  FROM train_sh t JOIN held_sh h ON t.shingle = h.shingle
  GROUP BY t.doc_id
)
SELECT h.doc_id, s.n_ngrams, h.n_hit_ngrams,
       CAST(h.n_hit_ngrams AS DOUBLE) / CAST(s.n_ngrams AS DOUBLE) AS overlap_frac,
       CAST(h.n_hit_ngrams AS DOUBLE) / CAST(s.n_ngrams AS DOUBLE) >= 0.1
         AS remove_at_10pct
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
"""


CV_FOLDS = 5
_CV_SEED = "cvfold"


def cv_fold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment with a
    stratification audit: every doc lands in fold ``md5-uniform mod
    {CV_FOLDS}``, and the output reports per (fold, lang) doc counts
    plus each fold's share of its language stratum — the balance check
    that decides whether hash folding is acceptable or per-stratum
    round-robin is needed. Folds are reproducible across engines,
    reruns and backfills (the same property as the train/val/test
    splitter above); the share is the single float division."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    fold = (hex_hash(F.col("doc_id").cast("string"), seed=_CV_SEED) % CV_FOLDS).alias(
        "fold"
    )
    cells = d.select("lang", fold).groupBy("lang", "fold").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    strata = cells.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    return cells.join(F.broadcast(strata), "lang").select(
        "lang",
        "fold",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("n_lang").cast("double")).alias(
            "share_of_stratum"
        ),
    )


CV_FOLD_ASSIGNMENT_SQL = f"""
WITH cells AS (
  SELECT lang,
         CAST(concat('0x', substr(md5(concat('{_CV_SEED}', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
           % {CV_FOLDS} AS fold,
         COUNT(*) AS n_docs
  FROM documents GROUP BY 1, 2
),
strata AS (SELECT lang, SUM(n_docs) AS n_lang FROM cells GROUP BY lang)
SELECT c.lang, c.fold, c.n_docs,
       CAST(c.n_docs AS DOUBLE) / CAST(s.n_lang AS DOUBLE) AS share_of_stratum
FROM cells c JOIN strata s ON c.lang = s.lang
"""


_SPLIT_SEED = "split"


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split leakage audit — the step a benchmark-honest
    corpus pipeline runs AFTER near-dup detection: assign every doc a
    deterministic md5-uniform split (8/1/1 per mille-free: buckets 0-7
    train, 8 val, 9 test), then count verified near-dup pairs
    (``dedup_minhash_pairs``: LSH candidates → exact Jaccard ≥ 0.5) by
    the canonical (split, split) cell. Any off-diagonal cell is
    contamination: a near-duplicate straddling a split boundary leaks
    eval content into training. Hash-based splits are exactly what make
    this auditable — re-runs and backfills land every doc in the same
    split, so the audit is reproducible on any engine.

    Scale: the pair list is the already-bounded LSH output (never
    all-pairs); the split label is a per-row expression; the final agg
    has ≤ 6 cells."""
    from .dedup import dedup_minhash_pairs

    pairs = dedup_minhash_pairs(spark, sf_dir)

    def split_of(c: Column) -> Column:
        u = hex_hash(c.cast("string"), seed=_SPLIT_SEED) % 10
        return (
            F.when(u < 8, F.lit("train"))
            .when(u == 8, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    sa, sb = split_of(F.col("id_a")), split_of(F.col("id_b"))
    return (
        pairs.select(
            F.least(sa, sb).alias("split_a"), F.greatest(sa, sb).alias("split_b")
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("is_leak", F.col("split_a") != F.col("split_b"))
    )


def _split_case_sql(idcol: str) -> str:
    h = (
        f"CAST(concat('0x', substr(md5(concat('{_SPLIT_SEED}', "
        f"CAST({idcol} AS VARCHAR))), 1, 15)) AS BIGINT) % 10"
    )
    return f"CASE WHEN {h} < 8 THEN 'train' WHEN {h} = 8 THEN 'val' ELSE 'test' END"


def _split_leakage_sql() -> str:
    from .dedup import DEDUP_MINHASH_PAIRS_SQL

    return f"""
WITH pairs AS ({DEDUP_MINHASH_PAIRS_SQL}),
lab AS (
  SELECT {_split_case_sql("id_a")} AS s_a, {_split_case_sql("id_b")} AS s_b
  FROM pairs
)
SELECT least(s_a, s_b) AS split_a, greatest(s_a, s_b) AS split_b,
       COUNT(*) AS n_pairs,
       least(s_a, s_b) <> greatest(s_a, s_b) AS is_leak
FROM lab GROUP BY 1, 2
"""


SPLIT_LEAKAGE_SQL = _split_leakage_sql()




_WOR_SEED = "wor"
WOR_K = 10  # sample size per language stratum
_WOR_MAXB = 16  # weight-exponent cap (docs >= 2^16 chars share the top weight)
_HEX60 = float(1 << 60)


def _iter_sqrt_col(col, n: int):
    for _ in range(n):
        col = F.sqrt(col)
    return col


def sample_weighted_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling WITHOUT replacement, per
    language stratum: each doc draws a deterministic md5-uniform
    u in (0, 1], forms the key u^(1/w), and the stratum keeps the
    {WOR_K} largest keys - inclusion probability proportional to
    weight, no replacement, ONE pass and one per-stratum top-k (the
    sampler a mixture-builder uses to overweight long/high-quality
    docs without a second scan).

    Float discipline (same policy as ``decayed_user_value``: pow/ln
    have no cross-engine bit guarantee, so neither appears): the
    weight is bucketed to a POWER OF TWO, w = 2^b with
    b = bitlen(n_chars), which turns the key u^(2^-b) into b ITERATED
    SQUARE ROOTS. sqrt is IEEE-754 correctly rounded on every engine,
    so the keys - and therefore the ranking AND the emitted key values
    - are bit-identical in Spark and DuckDB. b clamps at {_WOR_MAXB}
    (longer docs share the cap weight), keeping the expression tree
    bounded. At 100 TB: one narrow projection + one per-stratum
    window over K-bounded output - no shuffle beyond the stratum
    partitioning, no RNG state, rerun-stable."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        (hex_hash(F.col("doc_id").cast("string"), seed=_WOR_SEED) + 1).cast("double")
        / F.lit(_HEX60)
    ).alias("u")
    # true bit_length: conv/bin render 0 as the one-char string '0',
    # which would silently give an empty doc b=1 (weight 2) instead of
    # the documented b=0 (weight 1) — the CASE keeps both engines on the
    # python int.bit_length() reference the property test replays
    b = F.when(F.col("n_chars") == 0, F.lit(0)).otherwise(
        F.least(
            F.length(F.conv(F.col("n_chars").cast("string"), 10, 2)),
            F.lit(_WOR_MAXB),
        )
    )
    t = d.select("doc_id", "lang", b.alias("b"), u)
    key = _iter_sqrt_col(F.col("u"), _WOR_MAXB)
    for bb in range(_WOR_MAXB - 1, -1, -1):  # b = 0 -> zero sqrts, key = u
        key = F.when(F.col("b") == bb, _iter_sqrt_col(F.col("u"), bb)).otherwise(key)
    w = Window.partitionBy("lang").orderBy(
        F.col("sample_key").desc(), F.col("doc_id").asc()
    )
    return (
        t.select(
            "doc_id",
            "lang",
            F.col("b").cast("long").alias("weight_exponent"),
            key.alias("sample_key"),
        )
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= WOR_K)
    )


def _wor_key_sql() -> str:
    def nest(n: int) -> str:
        e = "u"
        for _ in range(n):
            e = f"sqrt({e})"
        return e

    cases = " ".join(
        f"WHEN b = {bb} THEN {nest(bb)}" for bb in range(0, _WOR_MAXB)
    )
    return f"CASE {cases} ELSE {nest(_WOR_MAXB)} END"


SAMPLE_WEIGHTED_WOR_SQL = rf"""
WITH t AS (
  SELECT doc_id, lang,
         CASE WHEN n_chars = 0 THEN 0
              ELSE LEAST(length(bin(n_chars)), {_WOR_MAXB}) END AS b,
         CAST(CAST(concat('0x', substr(md5(concat('{_WOR_SEED}', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) + 1 AS DOUBLE)
           / {_HEX60!r} AS u
  FROM documents
),
keyed AS (
  SELECT doc_id, lang, CAST(b AS BIGINT) AS weight_exponent,
         {{KEY}} AS sample_key
  FROM t
)
SELECT doc_id, lang, weight_exponent, sample_key, sample_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY sample_key DESC, doc_id ASC) AS sample_rank
  FROM keyed
) WHERE sample_rank <= {WOR_K}
""".replace("{KEY}", _wor_key_sql())


QUERIES = {
    "pack_sequences": pack_sequences,
    "split_leakage_audit": split_leakage_audit,
    "cv_fold_assignment": cv_fold_assignment,
    "mixture_temperature_weights": mixture_temperature_weights,
    "doc_chunk_overlap": doc_chunk_overlap,
    "doc_chunk_cdc": doc_chunk_cdc,
    "dedup_chunk_shared": dedup_chunk_shared,
    "decontaminate_ngram_overlap": decontaminate_ngram_overlap,
    "decontaminate_overlap_fraction": decontaminate_overlap_fraction,
    "sample_stratified_hash": sample_stratified_hash,
    "redact_pii": redact_pii,
    "vocab_topk": vocab_topk,
    "vocab_coverage_curve": vocab_coverage_curve,
    "bpe_merge_candidates": bpe_merge_candidates,
    "sample_importance_tokens": sample_importance_tokens,
    "text_repetition_filter": text_repetition_filter,
    "corpus_shuffle_hash": corpus_shuffle_hash,
    "domain_mixture_sample": domain_mixture_sample,
    "sample_weighted_wor": sample_weighted_wor,
}

ORACLES = {
    "pack_sequences": PACK_SEQUENCES_SQL,
    "split_leakage_audit": SPLIT_LEAKAGE_SQL,
    "cv_fold_assignment": CV_FOLD_ASSIGNMENT_SQL,
    "mixture_temperature_weights": MIXTURE_TEMPERATURE_SQL,
    "doc_chunk_overlap": DOC_CHUNK_OVERLAP_SQL,
    "doc_chunk_cdc": DOC_CHUNK_CDC_SQL,
    "dedup_chunk_shared": DEDUP_CHUNK_SHARED_SQL,
    "decontaminate_ngram_overlap": DECONTAMINATE_SQL,
    "decontaminate_overlap_fraction": DECONTAMINATE_FRACTION_SQL,
    "sample_stratified_hash": SAMPLE_STRATIFIED_SQL,
    "redact_pii": REDACT_PII_SQL,
    "vocab_topk": VOCAB_TOPK_SQL,
    "vocab_coverage_curve": VOCAB_COVERAGE_CURVE_SQL,
    "bpe_merge_candidates": BPE_MERGE_CANDIDATES_SQL,
    "sample_importance_tokens": SAMPLE_IMPORTANCE_SQL,
    "text_repetition_filter": TEXT_REPETITION_SQL,
    "corpus_shuffle_hash": CORPUS_SHUFFLE_SQL,
    "domain_mixture_sample": DOMAIN_MIXTURE_SQL,
    "sample_weighted_wor": SAMPLE_WEIGHTED_WOR_SQL,
}
