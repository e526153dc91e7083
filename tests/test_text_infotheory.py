"""Independent math checks for the round-11 detmath log-family queries.

The oracle-parity suite proves Spark == DuckDB; these tests prove the
SHARED algebra is the right algebra, by recomputing each statistic from
raw token counts in pure Python (math.log, defaultdicts, no SQL) and
comparing against the DuckDB oracle output:

* ``text_jsd_pairwise_sources`` folds tokens present in only one source
  of a pair in CLOSED FORM (p·ln2 mass from BIGINT shared-count sums,
  no vocab spine / full outer join) — the brute force here sums the
  union vocab term by term, so a folding mistake cannot cancel out.
* ``text_crossentropy_heldout_by_source`` claims its add-1-smoothed
  leave-one-source-out model normalizes exactly (Σ_vocab q_w = 1) and
  that H decomposes per-token — checked directly.

Pure Python + DuckDB only: no SparkSession, cheap enough to run
anywhere in the suite.
"""

from __future__ import annotations

import math
import os
import re
from collections import Counter, defaultdict

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def counts():
    """(source -> Counter(token)) from the raw parquet, tokenized the
    repo-wide way (whitespace split of trimmed text)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    by_src: dict[str, Counter] = defaultdict(Counter)
    for source, text in rows:
        by_src[source].update(re.split(r"\s+", text.strip()))
    return by_src


@pytest.fixture(scope="module")
def oracle(counts):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from wikistream_event_data_pipeline_aws_spark.plans.text import (
        TEXT_CROSSENTROPY_HELDOUT_BY_SOURCE_SQL,
        TEXT_JSD_PAIRWISE_SOURCES_SQL,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    jsd = {
        (r[0], r[1]): r
        for r in con.execute(TEXT_JSD_PAIRWISE_SOURCES_SQL).fetchall()
    }
    hx = {
        r[0]: r
        for r in con.execute(TEXT_CROSSENTROPY_HELDOUT_BY_SOURCE_SQL).fetchall()
    }
    return jsd, hx


def test_jsd_matches_union_vocab_brute_force(counts, oracle):
    jsd_oracle, _ = oracle
    srcs = sorted(counts)
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1 :]:
            c1, c2 = counts[s1], counts[s2]
            n1, n2 = sum(c1.values()), sum(c2.values())
            brute = 0.0
            for w in set(c1) | set(c2):
                p = c1.get(w, 0) / n1
                q = c2.get(w, 0) / n2
                m = 0.5 * (p + q)
                if p:
                    brute += 0.5 * p * math.log(p / m)
                if q:
                    brute += 0.5 * q * math.log(q / m)
            row = jsd_oracle[(s1, s2)]
            (_, _, rn1, rn2, shared, jsd_nats, jsd_norm) = row
            assert rn1 == n1 and rn2 == n2
            assert shared == len(set(c1) & set(c2))
            assert jsd_nats == pytest.approx(brute, abs=1e-9)
            assert jsd_norm == pytest.approx(brute / math.log(2), abs=1e-9)
            assert -1e-12 <= jsd_nats <= math.log(2) + 1e-12


def test_heldout_crossentropy_matches_brute_force(counts, oracle):
    _, hx_oracle = oracle
    vocab = set()
    for c in counts.values():
        vocab.update(c)
    V = len(vocab)
    N = sum(sum(c.values()) for c in counts.values())
    dw = Counter()
    for c in counts.values():
        dw.update(c)
    for s, c in counts.items():
        n_s = sum(c.values())
        denom = N - n_s + V
        # the add-1 held-out model must normalize over the corpus vocab
        total_q = sum((dw[w] - c.get(w, 0) + 1) / denom for w in vocab)
        assert total_q == pytest.approx(1.0, abs=1e-12)
        brute = sum(
            (cnt / n_s) * math.log(denom / (dw[w] - cnt + 1))
            for w, cnt in c.items()
        )
        row = hx_oracle[s]
        (_, n_tokens, vocab_size, ce_nats, bpt) = row
        assert n_tokens == n_s and vocab_size == len(c)
        assert ce_nats == pytest.approx(brute, abs=1e-9)
        assert bpt == pytest.approx(brute / math.log(2), abs=1e-9)


def test_jsd_emits_disjoint_vocabulary_pairs():
    """ADVICE r11: a source pair sharing ZERO tokens must still emit a
    row — shared_vocab = 0 and jsd_nats = ln 2 exactly (the closed-form
    single-source mass IS the whole divergence). The token-keyed inner
    join alone would silently omit the pair; the ns x ns pair spine +
    left join restores it. Three sources: a/b disjoint, c overlaps both,
    so the same query exercises disjoint and shared pairs side by side."""
    from wikistream_event_data_pipeline_aws_spark.plans.text import (
        TEXT_JSD_PAIRWISE_SOURCES_SQL,
    )

    con = duckdb.connect()
    con.execute(
        """
        CREATE VIEW documents AS
        SELECT * FROM (VALUES
          (1, 'a', 'alpha beta beta'),
          (2, 'b', 'gamma delta'),
          (3, 'c', 'alpha gamma epsilon')
        ) AS t(doc_id, source, text)
        """
    )
    rows = {(r[0], r[1]): r for r in con.execute(TEXT_JSD_PAIRWISE_SOURCES_SQL).fetchall()}
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    s1, s2, n1, n2, shared, jsd_nats, jsd_norm = rows[("a", "b")]
    assert (n1, n2, shared) == (3, 2, 0)
    assert jsd_nats == pytest.approx(math.log(2), abs=1e-12)
    assert jsd_norm == pytest.approx(1.0, abs=1e-12)
    # the mixed pairs still carry shared mass and stay strictly inside (0, ln 2)
    for key in (("a", "c"), ("b", "c")):
        _, _, _, _, shared_k, jsd_k, _ = rows[key]
        assert shared_k == 1
        assert 0.0 < jsd_k < math.log(2)


def test_mutual_information_matches_brute_force(counts):
    """I(source; token) from raw counts in pure Python vs the DuckDB
    oracle: MI = sum over observed cells of (c/N) ln(c N / (n_s d_w)),
    H(S) = sum (n_s/N) ln(N/n_s); the per-source decomposition must sum
    to the global MI exactly (it IS the (n_s/N)-weighted KL), and
    Theil's U = MI/H(S) must land in [0, 1]."""
    from wikistream_event_data_pipeline_aws_spark.plans.text import (
        TEXT_MUTUAL_INFORMATION_SQL,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    rows = {r[0]: r for r in con.execute(TEXT_MUTUAL_INFORMATION_SQL).fetchall()}
    ns = {s: sum(c.values()) for s, c in counts.items()}
    N = sum(ns.values())
    dw = Counter()
    for c in counts.values():
        dw.update(c)
    mi = sum(
        (cnt / N) * math.log(cnt * N / (ns[s] * dw[w]))
        for s, c in counts.items()
        for w, cnt in c.items()
    )
    h_s = sum((n / N) * math.log(N / n) for n in ns.values())
    assert set(rows) == set(counts)
    term_sum = 0.0
    for s, c in counts.items():
        (_, n_tokens, vocab, term, mi_o, h_o, u_o) = rows[s]
        assert n_tokens == ns[s] and vocab == len(c)
        brute_term = sum(
            (cnt / N) * math.log(cnt * N / (ns[s] * dw[w])) for w, cnt in c.items()
        )
        assert term == pytest.approx(brute_term, abs=1e-9)
        assert mi_o == pytest.approx(mi, abs=1e-9)
        assert h_o == pytest.approx(h_s, abs=1e-9)
        assert u_o == pytest.approx(mi / h_s, abs=1e-9)
        assert 0.0 <= u_o <= 1.0
        term_sum += term
    assert term_sum == pytest.approx(mi_o, abs=1e-9)
