"""Fusion tests: RRF formula parity with the reference (Fusion.py:45-76)."""

import pytest

from rag_arc_tpu.utils import Document, RetrievalResult, RRFusion, WeightedScoreFusion


def path(docs_scores, source="p"):
    # ranks are 1-based, matching the reference's rank = i + 1
    return [
        RetrievalResult(document=Document(content=c), score=s, rank=i, source=source)
        for i, (c, s) in enumerate(docs_scores, start=1)
    ]


class TestRRF:
    def test_formula(self):
        # doc "x" at rank 1 in path1 and rank 2 in path2:
        #   score = 1/61 + 1/62
        p1 = path([("x", 0.9), ("y", 0.5)])
        p2 = path([("z", 10.0), ("x", 9.0)])
        fused = RRFusion(k=60).fuse([p1, p2], top_k=3)
        assert fused[0].content == "x"
        assert fused[0].metadata["fusion_score"] == pytest.approx(1 / 61 + 1 / 62)

    def test_dedup_by_content(self):
        d1 = Document(content="same", id="id1")
        d2 = Document(content="same", id="id2")
        p1 = [RetrievalResult(d1, 1.0, 1)]
        p2 = [RetrievalResult(d2, 1.0, 1)]
        fused = RRFusion().fuse([p1, p2], top_k=10)
        assert len(fused) == 1
        assert fused[0].id == "id1"  # first-seen wins

    def test_top_k_truncation(self):
        p1 = path([(f"d{i}", 1.0) for i in range(20)])
        assert len(RRFusion().fuse([p1], top_k=5)) == 5

    def test_rank_ordering_beats_score_scale(self):
        # BM25 scores in [0, 40], cosine in [0, 1]: RRF only sees ranks.
        dense = path([("a", 0.99), ("b", 0.98)])
        sparse = path([("b", 38.0), ("a", 2.0)])
        fused = RRFusion().fuse([dense, sparse], top_k=2)
        # a: 1/61 + 1/62 ; b: 1/62 + 1/61 — tie; stable order by dict insertion
        assert {d.content for d in fused} == {"a", "b"}

    def test_empty_paths(self):
        assert RRFusion().fuse([], top_k=5) == []
        assert RRFusion().fuse([[], []], top_k=5) == []

    def test_bad_k(self):
        with pytest.raises(ValueError):
            RRFusion(k=0)


class TestWeightedScore:
    def test_weights(self):
        p1 = path([("a", 1.0), ("b", 0.0)])
        p2 = path([("b", 1.0), ("a", 0.0)])
        fused = WeightedScoreFusion(weights=[2.0, 1.0]).fuse([p1, p2], top_k=2)
        assert fused[0].content == "a"  # 2*1 + 1*0 > 2*0 + 1*1

    def test_weight_count_mismatch(self):
        with pytest.raises(ValueError):
            WeightedScoreFusion(weights=[1.0]).fuse([[], []], top_k=1)
