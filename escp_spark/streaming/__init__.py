from .ingest import stream_ingest_once, finalize_streamed_index

__all__ = ["stream_ingest_once", "finalize_streamed_index"]
