"""Independent pure-Python replays of the r11 multimodal operators.
Oracle parity proves Spark == DuckDB; these prove both equal the textbook
definition computed a third way (the r7 water-filling lesson: two engines
can share the same wrong formula)."""

from __future__ import annotations

import hashlib
import os

import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _docs():
    return pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pylist()


def _digest(text: str) -> bytes:
    return hashlib.sha256(text.encode("utf-8")).digest()


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_phash_near_dup_matches_bruteforce(spark):
    """Full recall AND precision vs the brute-force all-pairs Hamming scan:
    the banded LSH must lose nothing at hamming <= 3 (pigeonhole over 4
    bands) and add nothing (the exact verify filter)."""
    from spark_ibm_mq_spark.operators.multimodal import mm_phash_near_dup

    ph = {}
    for r in _docs():
        d = _digest(r["text"])
        ph[r["doc_id"]] = (d[4] << 16) | (d[5] << 8) | d[6]
    ids = sorted(ph)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(ph[a] ^ ph[b]).count("1")
            if ham <= 3:
                want.add((a, b, ham))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in _rows(mm_phash_near_dup(spark, SF_DIR))
    }
    assert got == want


def test_resize_letterbox_geometry(spark):
    """Long edge lands exactly on 224; pads reconstruct the canvas; the
    floor'd short edge never exceeds the target."""
    from spark_ibm_mq_spark.operators.multimodal import mm_resize_letterbox_plan

    text_by_id = {x["doc_id"]: x["text"] for x in _docs()}
    for r in _rows(mm_resize_letterbox_plan(spark, SF_DIR)):
        d = _digest(text_by_id[r["doc_id"]])
        w, h = 64 + d[0], 64 + d[1]
        assert (r["width"], r["height"]) == (w, h)
        assert max(r["out_w"], r["out_h"]) == 224
        assert r["out_w"] == (w * 224) // max(w, h)
        assert r["out_w"] + r["pad_left"] + r["pad_right"] == 224
        assert r["out_h"] + r["pad_top"] + r["pad_bottom"] == 224
        assert 0 <= r["pad_right"] - r["pad_left"] <= 1  # odd pad goes right


def test_audio_chunks_cover_clip(spark):
    """Chunks start at hop multiples, cover [0, n_samples) with no gap
    (hop < win), and the last chunk ends exactly at n_samples."""
    from collections import defaultdict

    from spark_ibm_mq_spark.operators.multimodal import mm_audio_chunk_plan

    per_doc = defaultdict(list)
    for r in _rows(mm_audio_chunk_plan(spark, SF_DIR)):
        per_doc[r["doc_id"]].append(r)
    assert per_doc
    text_by_id = {x["doc_id"]: x["text"] for x in _docs()}
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        rate = chunks[0]["sample_rate"]
        n = chunks[0]["n_samples"]
        d = _digest(text_by_id[doc_id])
        assert rate == 8000 * (1 + d[12] % 3)
        assert n == (rate // 1000) * (1000 + 200 * d[13])
        win, hop = 30 * rate, 25 * rate
        assert chunks[0]["start_sample"] == 0
        assert chunks[-1]["end_sample"] == n
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i
            assert c["start_sample"] == i * hop
            assert c["end_sample"] == min(i * hop + win, n)
            assert c["start_sample"] < n  # no vacuous trailing chunk
        for prev, nxt in zip(chunks, chunks[1:]):
            assert nxt["start_sample"] < prev["end_sample"]  # 5 s overlap


def test_scene_cuts_partition_frames(spark):
    """Scenes tile [0, 30*n_frames) contiguously per doc, and every
    interior boundary is a genuine >= 128 luma jump (replayed from md5)."""
    from collections import defaultdict

    from spark_ibm_mq_spark.operators.multimodal import mm_video_scene_cut_plan

    def luma(doc_id: int, frame_no: int) -> int:
        return int(hashlib.md5(f"{doc_id}:{frame_no}".encode()).hexdigest()[:2], 16)

    per_doc = defaultdict(list)
    for r in _rows(mm_video_scene_cut_plan(spark, SF_DIR)):
        per_doc[r["doc_id"]].append(r)
    for r in _docs():
        d = _digest(r["text"])
        nvf = 30 * (1 + d[3] % 8)
        scenes = sorted(per_doc[r["doc_id"]], key=lambda s: s["scene_idx"])
        assert scenes[0]["start_frame"] == 0
        assert scenes[-1]["end_frame"] == nvf - 1
        assert sum(s["n_frames"] for s in scenes) == nvf
        for i, s in enumerate(scenes):
            assert s["scene_idx"] == i
            assert s["n_frames"] == s["end_frame"] - s["start_frame"] + 1
            if i:
                prev = scenes[i - 1]
                assert s["start_frame"] == prev["end_frame"] + 1
                jump = abs(
                    luma(r["doc_id"], s["start_frame"])
                    - luma(r["doc_id"], s["start_frame"] - 1)
                )
                assert jump >= 128
            # no interior frame may be a cut
            for f in range(s["start_frame"] + 1, s["end_frame"] + 1):
                assert abs(luma(r["doc_id"], f) - luma(r["doc_id"], f - 1)) < 128


def test_token_budget_buckets_consistent(spark):
    """Bucket accounting: padded_len is a power of two, capacity splits
    into used + waste exactly, utilization is the integer-ppm ratio, and
    doc counts tie back to the corpus."""
    from spark_ibm_mq_spark.operators.multimodal import mm_token_budget_plan

    rows = _rows(mm_token_budget_plan(spark, SF_DIR))
    assert sum(r["n_docs"] for r in rows) == len(_docs())
    for r in rows:
        p = r["padded_len"]
        assert p & (p - 1) == 0
        assert r["sum_total"] == r["sum_vision"] + r["sum_text"] + 3 * r["n_docs"]
        assert r["sum_total"] + r["sum_pad_waste"] == p * r["n_docs"]
        assert r["utilization_ppm"] == r["sum_total"] * 1_000_000 // (p * r["n_docs"])
        # every doc genuinely belongs in this bucket: total > p/2 (else it
        # would pad to the next smaller power) is implied by waste < n*p/2
        assert r["sum_pad_waste"] < r["n_docs"] * p / 2 + p  # loose sanity


def test_stream_decode_equals_batch(spark):
    """Stream/batch equivalence: the availableNow drain of the streaming
    decode is row-identical to the batch mm_decode_features output."""
    from spark_ibm_mq_spark.operators.multimodal import (
        mm_decode_features,
        stream_mm_decode_drain,
    )

    batch = sorted(
        map(tuple, mm_decode_features(spark, SF_DIR).collect())
    )
    stream = sorted(map(tuple, stream_mm_decode_drain(spark, SF_DIR).collect()))
    assert stream == batch


# --- Audio chunk geometry property (pure Python + Hypothesis) ---
# The planner's load-bearing claims, checked over the WHOLE (rate,
# duration) lattice rather than the fixture's sha-derived sample: chunks
# tile the clip with exactly hop-sized steps, every sample is covered,
# consecutive chunks overlap by exactly win-hop samples (except a short
# final tail), and the chunk count is the minimal cover.

from hypothesis import given, settings
from hypothesis import strategies as st


def _plan(rate: int, n: int, win_s: int = 30, hop_s: int = 25):
    """The operator's exact chunk rule, replayed in pure Python."""
    win, hop = win_s * rate, hop_s * rate
    n_chunks = 1 if n <= win else 1 + (n - win + hop - 1) // hop
    return [(k * hop, min(k * hop + win, n)) for k in range(n_chunks)]


@given(
    rate=st.sampled_from([8000, 16000, 24000]),
    dur_byte=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=200, deadline=None)
def test_audio_chunk_geometry_property(rate, dur_byte):
    n = (rate // 1000) * (1000 + 200 * dur_byte)
    chunks = _plan(rate, n)
    win, hop = 30 * rate, 25 * rate
    # tiling: starts are exact hop multiples, first at 0
    assert [s for s, _ in chunks] == [k * hop for k in range(len(chunks))]
    # coverage: union of [s, e) is [0, n) with no gap (hop < win)
    assert chunks[0][0] == 0 and chunks[-1][1] == n
    for (s1, e1), (s2, e2) in zip(chunks, chunks[1:]):
        assert s2 < e1  # overlap
        assert e1 - s2 == win - hop or e1 == n  # exactly 5 s, bar the tail
    # minimality: one fewer chunk would leave the tail uncovered
    if len(chunks) > 1:
        assert (len(chunks) - 2) * hop + win < n
    # no vacuous chunk: every chunk contains at least one sample
    assert all(s < e for s, e in chunks)


def test_crossmodal_superset_of_both_parents(spark):
    """mm_crossmodal_near_dup must contain EVERY pair either parent emits
    (union of generators + union of verification gates ⇒ superset of
    each), with the matching provenance flag set and identical verified
    metrics; and every emitted pair must carry at least one provenance
    flag and pass at least one gate."""
    from spark_ibm_mq_spark.operators.dedup import dedup_embedding_cosine
    from spark_ibm_mq_spark.operators.multimodal import (
        mm_crossmodal_near_dup,
        mm_phash_near_dup,
    )

    xm = {
        (r["doc_a"], r["doc_b"]): r
        for r in _rows(mm_crossmodal_near_dup(spark, SF_DIR))
    }

    for r in _rows(mm_phash_near_dup(spark, SF_DIR)):
        k = (r["doc_a"], r["doc_b"])
        assert k in xm, f"phash pair {k} missing from crossmodal"
        assert xm[k]["from_phash"] == 1
        assert xm[k]["hamming"] == r["hamming"]

    for r in _rows(dedup_embedding_cosine(spark, SF_DIR)):
        k = (r["vec_a"], r["vec_b"])
        assert k in xm, f"cosine pair {k} missing from crossmodal"
        assert xm[k]["from_cell"] == 1
        # dedup_embedding_cosine rounds without the signed-zero +0.0 term,
        # but cos >= 0.4 there so both rounds are positive and equal
        assert xm[k]["cos_sim"] == r["cos_sim"]

    for k, r in xm.items():
        assert r["from_phash"] == 1 or r["from_cell"] == 1, k
        ham_ok = r["hamming"] <= 3
        cos_ok = r["cos_sim"] is not None and r["cos_sim"] >= 0.4
        # cos_sim is rounded to 4 dp; a raw cos in [0.4, 0.40005) rounds
        # to 0.4 so the rounded check is faithful at this boundary
        assert ham_ok or cos_ok, (k, r)
