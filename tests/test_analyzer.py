"""Analyzer unit tests: tokenizer goldens + byte-identical extraction."""

from hypothesis import given, settings
from hypothesis import strategies as st

from escp_spark.analyzer import extract_text, tokenize, wrap_html


def test_tokenize_goldens():
    assert tokenize("The Quick  Fox!") == ["the", "quick", "fox"]
    assert tokenize("") == []
    assert tokenize("   ") == []
    assert tokenize("snake_case under_score") == ["snake", "case", "under", "score"]
    assert tokenize("café naïve") == ["café", "naïve"]
    assert tokenize("这是 一个 中文") == ["这是", "一个", "中文"]
    assert tokenize("emoji 🙂 x") == ["emoji", "x"]
    assert tokenize("a1 2b c") == ["a1", "2b", "c"]


def test_extract_roundtrip_goldens():
    for text in [
        "hello world",
        "",
        "with <tags> & ampersand \"quotes\" 'single'",
        "这是 中文 🙂",
        "line1\nline2\ttabbed",
    ]:
        assert extract_text(wrap_html("title", text)) == text


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=500))
def test_extract_roundtrip_property(text):
    """The byte-identical invariant (esdiff.go:80-82 analog): wrap→extract
    is the identity for arbitrary unicode text."""
    assert extract_text(wrap_html("t", text)) == text


def test_extract_fallback_strips_tags():
    raw = b"<div>hello <b>bold</b> &amp; more</div>"
    assert extract_text(raw) == "hello bold & more"


def test_extract_none():
    assert extract_text(None) == ""
