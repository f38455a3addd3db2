"""Oracle self-checks: BM25 formula vs hand-computed values, tie-breaks."""

import math

import pytest

from escp_spark.oracle import B, K1, NaiveIndex, bm25_term, idf


def test_bm25_hand_computed():
    # One doc "a a b", one doc "b c". N=2, avgdl=2.5.
    ix = NaiveIndex({"u1": "a a b", "u2": "b c"})
    assert ix.n_docs == 2
    assert ix.avgdl == 2.5
    # query "a": df(a)=1, idf = ln(1 + (2-1+0.5)/(1+0.5)) = ln(2)
    w = idf(2, 1)
    assert math.isclose(w, math.log(2.0))
    # tf=2, dl=3 → contrib = w * 2*2.2 / (2 + 1.2*(1-0.75+0.75*3/2.5))
    expected = w * (2 * 2.2) / (2 + K1 * (1 - B + B * 3 / 2.5))
    res = ix.search("a", 10)
    assert res == [("u1", pytest.approx(expected, abs=1e-12))]


def test_tie_break_by_url():
    # Identical docs → identical scores; tie broken by url ascending.
    ix = NaiveIndex({"b": "x y", "a": "x y", "c": "z"})
    res = ix.search("x", 10)
    assert [u for u, _ in res] == ["a", "b"]
    assert res[0][1] == res[1][1]


def test_absent_term_and_empty_query():
    ix = NaiveIndex({"a": "x"})
    assert ix.search("nothere", 10) == []
    assert ix.search("", 10) == []
    assert ix.search("🙂", 10) == []


def test_duplicate_query_terms_double_weight():
    ix = NaiveIndex({"a": "x y", "b": "x z"})
    s1 = ix.search("x", 10)
    s2 = ix.search("x x", 10)
    assert s2[0][1] == pytest.approx(2 * s1[0][1])


def test_k_clamps():
    ix = NaiveIndex({"a": "x", "b": "x"})
    assert len(ix.search("x", 1)) == 1
    assert len(ix.search("x", 99)) == 2
