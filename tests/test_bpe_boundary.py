"""Greedy-merge boundary tests for the iterative BPE trainer (r15).

The fixture's 31-word vocabulary never produces overlapping repeats of the
elected pair, so driver parity alone cannot distinguish TRUE greedy BPE
("aaaa" + merge (a,a) → [aa, aa], Sennrich et al.'s reference regex with
boundary lookarounds) from the plausible-but-wrong single-shared-separator
string rewrite — where the trailing boundary of one replace match is the
leading boundary of the next, so leftmost-non-overlapping replace yields
[aa, a, a] IN BOTH ENGINES and the oracle comparison passes on the shared
mistake. (Exactly the r11 lesson: never trust a claimed boundary behavior
two twins merely agree on — drive a synthetic fixture that hits it
dead-on.) These tests build a corpus where overlap decides rounds 2 and 3
and assert the full 3-merge trace against HAND-COMPUTED greedy BPE.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_ibm_mq_spark import registry

registry.load_all_modules()


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    """documents.parquet whose words make greedy-vs-naive diverge:

    corpus: 'aaaa' x5, 'aab' x3, 'ba' x2  (one doc per occurrence)

    Round 1 pair counts (overlapping adjacent, weighted):
      (a,a): 3 per 'aaaa' x5 + 1 per 'aab' x3 = 18   <- elected
      (a,b): 3   (b,a): 2
    Greedy rewrite: aaaa -> [aa, aa]   (naive shared-separator: [aa, a, a])
                    aab  -> [aa, b]    ba -> [b, a]
    Round 2 counts: (aa,aa): 5 <- elected (greedy); under the naive
      rewrite the top pair would instead be (aa,a) 5 / (a,a) 5 — ties
      broken to (a, a), a DIFFERENT winner, so round 2 alone convicts.
    Greedy rewrite: aaaa -> [aaaa]; aab unchanged [aa, b].
    Round 3 counts: (aa,b): 3 <- elected   (b,a): 2
    """
    d = tmp_path_factory.mktemp("bpe_boundary")
    texts = ["aaaa"] * 5 + ["aab"] * 3 + ["ba"] * 2
    rows = {
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["syn"] * len(texts),
        "n_chars": [len(t) for t in texts],
    }
    pq.write_table(pa.table(rows), os.path.join(str(d), "documents.parquet"))
    return str(d)


EXPECTED = [
    (1, "a", "a", "aa", 18),
    (2, "aa", "aa", "aaaa", 5),
    (3, "aa", "b", "aab", 3),
]


def test_spark_bpe_3merge_is_greedy(spark, bpe_dir):
    rows = registry.QUERIES["pipeline_bpe_3merge"](spark, bpe_dir).collect()
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.n_occurrences)
        for r in rows
    ]
    assert got == EXPECTED, got


def test_spark_bpe_3merge_rejects_separator_byte(spark, tmp_path):
    """The encoding precondition (U+001F absent from the corpus) is
    ENFORCED (ADVICE r15 #3): without the guard a token containing the
    separator would have that byte silently vanish from pair counting in
    BOTH engines — parity would pass on the deviation from true BPE."""
    texts = ["aaaa", "a\x1fb"]
    rows = {
        "doc_id": [0, 1],
        "text": texts,
        "lang": ["en"] * 2,
        "source": ["syn"] * 2,
        "n_chars": [len(t) for t in texts],
    }
    pq.write_table(pa.table(rows), os.path.join(str(tmp_path), "documents.parquet"))
    with pytest.raises(Exception, match="U\\+001F"):
        registry.QUERIES["pipeline_bpe_3merge"](spark, str(tmp_path)).collect()


def test_oracle_bpe_3merge_is_greedy(bpe_dir):
    con = duckdb.connect()
    path = os.path.join(bpe_dir, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    got = [tuple(r) for r in con.execute(registry.ORACLE["pipeline_bpe_3merge"]).fetchall()]
    assert got == EXPECTED, got
