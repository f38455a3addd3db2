"""BM25 math shared by the Spark engine, the serving path, and tests.

Frozen constants (k1=1.2, b=0.75) and Lucene-style idf, matching the
pure-Python oracle (oracle.py) exactly: both call into numpy/math with the
same formula so scores agree to float64 rounding.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf_lucene(n_docs: int, df) :
    """ln(1 + (N - df + 0.5)/(df + 0.5)) — elementwise over numpy arrays."""
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def bm25_contrib(tf, dl, avgdl: float, idf_val):
    """Per-(doc,term) BM25 contribution; vectorized."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return idf_val * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def bm25_upper_bound(max_tf, min_dl, avgdl: float, idf_val):
    """True upper bound of any contribution from a posting block: the
    contribution is increasing in tf and decreasing in dl, so
    (max_tf, min_dl) bounds it. This is the block-max metadata → score
    bound used by the pruning in query.py."""
    return bm25_contrib(max_tf, min_dl, avgdl, idf_val)
