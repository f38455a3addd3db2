"""Text analysis chain shared by build, query engine, and oracle.

The reference moves document bodies as opaque bytes and never parses them
(estypes/estypes.go:17, esdiff/esdiff.go:80-82); analysis was Lucene's job.
Here the analyzer is ours and is deliberately tiny, pure, and versioned so
the build is reproducible and the pure-Python oracle tokenizes *identically*
to the Spark pipeline (both import these exact functions).

Everything in this module is plain Python/regex on strings — it is invoked
from Arrow-vectorized pandas UDFs (see build.py) so the per-batch overhead
is amortized; there is no per-row Python UDF anywhere in the engine.
"""

from __future__ import annotations

import html as _htmlmod
import re

ANALYZER_VERSION = "escp-spark-analyzer-1"

# Unicode word characters, excluding underscore. \w in Python re is
# unicode-aware, so CJK and accented letters tokenize as words; emoji are
# dropped (they are not \w). This rule is frozen — changing it changes
# every index and oracle hash.
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# The html wrapper the corpus generator produces (FIXTURES.md §1). The
# extractor must invert it byte-identically (esdiff.go:80-82's bytes.Equal
# fast path is the semantic ancestor of this invariant).
_HTML_RE = re.compile(
    r"<html><head><title>(?P<title>.*?)</title></head>"
    r"<body><p>(?P<body>.*?)</p></body></html>",
    re.DOTALL,
)


def tokenize(text: str) -> list[str]:
    """Lowercase + unicode-word tokenization. Frozen; versioned."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


# NOTE (round 4): an Arrow-compute batch tokenizer (string_is_ascii
# gate → utf8_lower → split_pattern_regex("[\\W_]+") → list_flatten →
# dictionary_encode) was implemented, property-tested output-identical
# to tokenize(), and A/B-benchmarked against the per-doc findall +
# pd.factorize path in the segment kernel: identical results, ~15%
# SLOWER on the bench corpus (RE2 split + list materialization costs
# more than CPython's findall here). Removed rather than kept as dead
# code; this note is the breadcrumb so it isn't re-attempted blind.


def token_count(text: str) -> int:
    """Document length (dl) under the frozen tokenizer."""
    return len(tokenize(text))


def extract_text(html_bytes: bytes) -> str:
    """html → text, byte-identical to the text that was wrapped.

    The generator html-escapes the body text before wrapping (corpus.py),
    so unescaping here restores the original bytes exactly. Pages that do
    not match the wrapper shape degrade to a tag-strip fallback (still
    deterministic).
    """
    if html_bytes is None:
        return ""
    s = html_bytes.decode("utf-8", errors="replace")
    m = _HTML_RE.search(s)
    if m:
        return _htmlmod.unescape(m.group("body"))
    # Fallback: strip tags, unescape entities.
    return _htmlmod.unescape(re.sub(r"<[^>]*>", "", s))


def wrap_html(title: str, text: str) -> bytes:
    """The inverse of extract_text — used by the corpus generator."""
    return (
        "<html><head><title>{}</title></head><body><p>{}</p></body></html>".format(
            _htmlmod.escape(title), _htmlmod.escape(text)
        )
    ).encode("utf-8")
