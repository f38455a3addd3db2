from .bm25 import K1, B, idf_lucene, bm25_contrib, bm25_upper_bound
from .fmt import iec_format

__all__ = [
    "K1", "B", "idf_lucene", "bm25_contrib", "bm25_upper_bound",
    "iec_format",
]
