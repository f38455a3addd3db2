"""BM25 top-k query engine over the published index.

Two execution paths, both rank-identical to the exhaustive oracle:

1. **Serving path** (`search_topk`): latency-oriented, reads posting
   blocks for the query terms straight from the segment Parquet via
   pyarrow dataset filters (term-sorted files → row-group pruning is the
   dictionary-seek analog), scores in numpy with **block-max pruning**:
   a seeded lower bound θ of the kth score prunes every block whose
   docid-range score envelope (block ub + Σ other-term max ub) stays
   below θ — a vectorized MaxScore/Block-Max-WAND family algorithm with a
   correctness proof in `_prune_and_score`'s docstring. This is what a
   query node would run per request; Spark is not in the request path.

2. **Batch path** (`search_topk_spark`): throughput-oriented, runs a whole
   query set as one distributed DataFrame job — term-pushdown scan of
   postings → `mapInPandas` block scoring with in-task partial
   aggregation (map-side combine) → `groupBy(query_id, doc_id).sum` →
   per-query top-k with tie-complete `rank()` → docmap join for urls →
   deterministic (score desc, url asc) final ranking.

Tie-break contract (FIXTURES.md §2): final order is (score desc, url asc);
ranking first takes a tie-complete candidate set (`rank() <= k`, which
keeps all boundary ties) and only then resolves ties by url, so the result
is independent of internal docid assignment and of parallelism.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

from .analyzer import tokenize
from .codec import decode_block, decode_blocks_bulk
from .functions.bm25 import bm25_contrib, bm25_upper_bound, idf_lucene
from .sources.tables import load_manifest

POSTING_COLS = ["term", "n", "doc_id_lo", "doc_id_hi", "max_tf", "min_dl",
                "doc_ids", "tfs", "dls"]

# Pruning telemetry of the most recent _prune_and_score call (the M1/M2
# metering analog for the query side; tests assert pruning actually fires).
last_prune_stats: dict = {}


# --------------------------------------------------------------------------
# Serving path (pyarrow + numpy; no Spark in the request path)
# --------------------------------------------------------------------------

class IndexReader:
    """Reads the published index artifacts (manifest-gated — an index that
    was never atomically published refuses to load; the D3 analog)."""

    def __init__(self, index_dir: str):
        self.manifest = load_manifest(index_dir)
        p = self.manifest["paths"]
        self._postings = pads.dataset(p["postings"], format="parquet",
                                      partitioning="hive")
        self._dictionary = pads.dataset(p["dictionary"], format="parquet")
        self._docmap = pads.dataset(p["docmap"], format="parquet")
        self.n_docs = self.manifest["n_docs"]
        self.avgdl = self.manifest["avgdl"]

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        if not terms:
            return {}
        t = self._dictionary.to_table(
            columns=["term", "df"], filter=pads.field("term").isin(terms)
        )
        return dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))

    def blocks_for_terms(self, terms: list[str]) -> pd.DataFrame:
        if not terms:
            return pd.DataFrame(columns=POSTING_COLS)
        t = self._postings.to_table(
            columns=POSTING_COLS, filter=pads.field("term").isin(terms)
        )
        return t.to_pandas()

    def urls_for(self, doc_ids: np.ndarray) -> dict[int, str]:
        if doc_ids.size == 0:
            return {}
        t = self._docmap.to_table(
            columns=["doc_id", "url"],
            filter=pads.field("doc_id").isin([int(d) for d in doc_ids]),
        )
        return dict(zip(t["doc_id"].to_pylist(), t["url"].to_pylist()))


def _aggregate(doc_ids: np.ndarray, contribs: np.ndarray):
    """Sum contributions per docid — sort + reduceat (vectorized)."""
    if doc_ids.size == 0:
        return doc_ids, contribs
    order = np.argsort(doc_ids, kind="stable")
    d, c = doc_ids[order], contribs[order]
    starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
    return d[starts], np.add.reduceat(c, starts)


def _prune_and_score(blocks: pd.DataFrame, term_weights: dict[str, float],
                     idf: dict[str, float], avgdl: float, k: int):
    """Block-max pruned scoring for ONE query — bucket-at-a-time WAND.

    Key structural fact: docids are bucket<<40|rank, so every doc's
    postings live entirely inside one bucket — a bucket is a complete,
    independent docid window. The algorithm is therefore the block-max
    WAND loop at bucket granularity, fully vectorized inside each step:

    1. For each bucket w: envelope(w) = Σ_terms max ub of that term's
       blocks in w — a true upper bound on any single doc score in w.
    2. Visit buckets in descending envelope order, maintaining θ = kth
       best *exact* score collected so far (scores within a visited
       bucket are complete, so θ is exact and only rises).
    3. Skip a whole bucket when envelope(w) < θ. Inside a kept bucket,
       additionally skip block b of term t when
       ub(b) + Σ_{t'≠t} max_ub_in_bucket(t') < θ.

    Rank-identity proof: a skipped bucket/block only hides docs whose
    total score is STRICTLY below θ ≤ (final kth best), so they cannot
    enter the top-k; any doc with final score ≥ θ has every covering
    block's envelope ≥ its own score ≥ θ, hence is scored exactly.
    """
    global last_prune_stats
    weights = {t: term_weights[t] * idf[t] for t in term_weights if t in idf}
    if blocks.empty or not weights:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)

    blocks = blocks[blocks["term"].isin(weights)].reset_index(drop=True)
    w_arr = blocks["term"].map(weights).to_numpy(dtype=np.float64)
    ub = bm25_upper_bound(
        blocks["max_tf"].to_numpy(), blocks["min_dl"].to_numpy(), avgdl, w_arr
    )
    term_codes, term_uniq = pd.factorize(blocks["term"], sort=True)
    n_terms = len(term_uniq)
    bucket = (
        blocks["doc_id_lo"].to_numpy(dtype=np.int64) >> 40
    )

    id_bufs = blocks["doc_ids"].to_numpy()
    tf_bufs = blocks["tfs"].to_numpy()
    dl_bufs = blocks["dls"].to_numpy()
    ns = blocks["n"].to_numpy()

    def score_rows(idx: np.ndarray):
        if idx.size == 0:
            return np.empty(0, dtype=np.uint64), np.empty(0)
        ids, tfs, dls, blk = decode_blocks_bulk(
            list(id_bufs[idx]), list(tf_bufs[idx]), list(dl_bufs[idx]), ns[idx]
        )
        contribs = bm25_contrib(tfs, dls, avgdl, w_arr[idx][blk])
        return _aggregate(ids, contribs)

    # Per-(bucket, term) max ub  →  per-bucket envelope.
    buckets_uniq, bucket_code = np.unique(bucket, return_inverse=True)
    key = bucket_code * n_terms + term_codes
    per_bt_max = np.zeros(buckets_uniq.size * n_terms)
    np.maximum.at(per_bt_max, key, ub)
    per_bt_max = per_bt_max.reshape(buckets_uniq.size, n_terms)
    bucket_env = per_bt_max.sum(axis=1)

    visit_order = np.argsort(bucket_env)[::-1]
    theta = -np.inf
    all_ids, all_scores = [], []
    total_collected = 0
    pruned = 0
    for bc in visit_order:
        if total_collected >= k and bucket_env[bc] < theta:
            pruned += int(np.count_nonzero(bucket_code == bc))
            continue
        sel = np.flatnonzero(bucket_code == bc)
        if total_collected >= k:
            blk_env = ub[sel] + (bucket_env[bc] - per_bt_max[bc, term_codes[sel]])
            keep_mask = blk_env >= theta
            pruned += int(np.count_nonzero(~keep_mask))
            sel = sel[keep_mask]
        ids, scores = score_rows(sel)
        if ids.size:
            all_ids.append(ids)
            all_scores.append(scores)
            total_collected += ids.size
            if total_collected >= k:
                flat = np.concatenate(all_scores)
                theta = np.partition(flat, -k)[-k]

    last_prune_stats = {
        "total_blocks": int(len(blocks)),
        "kept_blocks": int(len(blocks) - pruned),
        "pruned_blocks": int(pruned),
        "theta": float(theta),
        "n_buckets": int(buckets_uniq.size),
    }
    if not all_ids:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
    # Buckets are disjoint docid spaces — concatenation needs no re-agg.
    return np.concatenate(all_ids), np.concatenate(all_scores)


def search_topk(index_dir: str, queries: list[dict],
                reader: IndexReader | None = None) -> list[dict]:
    """Serving-path top-k for a query set.

    queries: [{query_id, query_text, k}] → rows [{query_id, rank,
    doc_url, score}] with (score desc, url asc) deterministic order.
    """
    reader = reader or IndexReader(index_dir)
    all_terms = sorted({t for q in queries for t in tokenize(q["query_text"])})
    dfs = reader.term_dfs(all_terms)
    idf = {t: float(idf_lucene(reader.n_docs, d)) for t, d in dfs.items()}
    blocks = reader.blocks_for_terms([t for t in all_terms if t in dfs])
    by_term = {t: g for t, g in blocks.groupby("term")} if len(blocks) else {}

    rows = []
    for q in queries:
        weights = dict(Counter(tokenize(q["query_text"])))
        qblocks = pd.concat(
            [by_term[t] for t in weights if t in by_term], ignore_index=True
        ) if any(t in by_term for t in weights) else pd.DataFrame(columns=POSTING_COLS)
        doc_ids, scores = _prune_and_score(
            qblocks, weights, idf, reader.avgdl, q["k"]
        )
        if doc_ids.size == 0:
            continue
        k = q["k"]
        if doc_ids.size > k:
            # Tie-complete candidate cut: keep everything ≥ kth score.
            kth = np.partition(scores, -k)[-k]
            mask = scores >= kth
            doc_ids, scores = doc_ids[mask], scores[mask]
        urls = reader.urls_for(doc_ids)
        ranked = sorted(
            zip(scores.tolist(), (urls[int(d)] for d in doc_ids)),
            key=lambda sv: (-sv[0], sv[1]),
        )[:k]
        for rank, (score, url) in enumerate(ranked, 1):
            rows.append(
                {"query_id": q["query_id"], "rank": rank,
                 "doc_url": url, "score": score}
            )
    return rows


# --------------------------------------------------------------------------
# Batch path (distributed Spark job over the whole query set)
# --------------------------------------------------------------------------

def search_topk_spark(spark, index_dir: str, queries: list[dict]):
    """Distributed batch scoring of a query set → DataFrame
    (query_id int, rank int, doc_url string, score double).

    Scale shape: the postings scan is term-pushdown-pruned (Parquet
    row-group stats on the sorted term column), scoring happens in
    `mapInPandas` with in-task partial aggregation so the shuffle into
    `groupBy(query_id, doc_id)` carries one row per (query, doc, task) —
    the map-side-combine analog. The aggregated scores then pass a
    partition-local tie-complete top-k (narrow, rank-safe — see inline
    proof) so the per-query rank window ranks ≤ n_partitions × k rows,
    never a hot query's full candidate set. The docmap join only sees the
    tiny tie-complete candidate set (broadcast), never the full doc space.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    manifest = load_manifest(index_dir)
    paths = manifest["paths"]
    n_docs, avgdl = manifest["n_docs"], manifest["avgdl"]

    # Driver-side query planning (tiny): terms, dfs, idf weights.
    q_terms: dict[str, list[tuple[int, float]]] = defaultdict(list)
    all_terms = sorted({t for q in queries for t in tokenize(q["query_text"])})
    if not all_terms:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_url string, score double"
        )
    dfs_rows = (
        spark.read.parquet(paths["dictionary"])
        .filter(F.col("term").isin(all_terms))
        .collect()
    )
    dfs = {r.term: r.df for r in dfs_rows}
    for q in queries:
        for t, c in Counter(tokenize(q["query_text"])).items():
            if t in dfs:
                q_terms[t].append(
                    (q["query_id"], float(c) * float(idf_lucene(n_docs, dfs[t])))
                )
    plan_bc = spark.sparkContext.broadcast(dict(q_terms))
    avgdl_bc = avgdl

    def score_partition(batches):
        for pdf in batches:
            plan = plan_bc.value
            qids_out, dids_out, contribs_out = [], [], []
            # Group rows by term: one bulk vectorized decode per term, then
            # one (qid, weight) broadcast per query containing it.
            for term, g in pdf.groupby("term", sort=False):
                targets = plan.get(term)
                if not targets:
                    continue
                ids, tfs, dls, _ = decode_blocks_bulk(
                    list(g["doc_ids"]), list(g["tfs"]), list(g["dls"]),
                    g["n"].to_numpy(),
                )
                base = bm25_contrib(tfs, dls, avgdl_bc, 1.0)
                ids64 = ids.astype(np.int64)
                for qid, w in targets:
                    qids_out.append(np.full(ids64.size, qid, dtype=np.int64))
                    dids_out.append(ids64)
                    contribs_out.append(base * w)
            if not qids_out:
                continue
            qid = np.concatenate(qids_out)
            did = np.concatenate(dids_out)
            con = np.concatenate(contribs_out)
            # In-task partial aggregation (map-side combine).
            order = np.lexsort((did, qid))
            qid, did, con = qid[order], did[order], con[order]
            new = np.concatenate(
                ([True], (qid[1:] != qid[:-1]) | (did[1:] != did[:-1]))
            )
            starts = np.flatnonzero(new)
            yield pd.DataFrame(
                {
                    "query_id": qid[starts],
                    "doc_id": did[starts],
                    "partial": np.add.reduceat(con, starts),
                }
            )

    postings = (
        spark.read.parquet(paths["postings"])
        .filter(F.col("term").isin(all_terms))
        .select("term", "n", "doc_ids", "tfs", "dls")
    )
    partials = postings.mapInPandas(
        score_partition, "query_id int, doc_id long, partial double"
    )
    scores = partials.groupBy("query_id", "doc_id").agg(
        F.sum("partial").alias("score")
    )

    # Partition-local tie-complete top-k BEFORE the per-query rank window.
    # After the groupBy, every (query_id, doc_id) score is FINAL, so a
    # local cut at the k-th largest local score is rank-safe: a row cut
    # locally has ≥ k local rows strictly above it, hence ≥ k global rows
    # above it, hence it can never be in the global tie-complete top-k.
    # This bounds the window's input to ≤ n_partitions × k rows per query
    # — without it, a hot single-term query ships its entire candidate
    # set (≈ all docs at 100×) into ONE window partition for sorting.
    k_max = max(q["k"] for q in queries)

    def local_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = []
            for _, g in pdf.groupby("query_id", sort=False):
                s = g["score"].to_numpy()
                if s.size > k_max:
                    kth = np.partition(s, -k_max)[-k_max]
                    g = g[s >= kth]          # ≥ keeps boundary ties
                keep.append(g)
            yield pd.concat(keep)

    bounded = scores.mapInPandas(
        local_topk, "query_id int, doc_id long, score double"
    )

    kdf = spark.createDataFrame(
        [(q["query_id"], q["k"]) for q in queries], "query_id int, k int"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc())
    cand = (
        bounded.join(F.broadcast(kdf), "query_id")
        .withColumn("rk", F.rank().over(w))         # rank() keeps boundary ties
        .filter(F.col("rk") <= F.col("k"))
    )
    docmap = spark.read.parquet(paths["docmap"]).select("doc_id", "url")
    joined = docmap.join(F.broadcast(cand), "doc_id")
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("url").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= F.col("k"))
        .select(
            F.col("query_id").cast("int"),
            F.col("rank").cast("int"),
            F.col("url").alias("doc_url"),
            F.col("score"),
        )
        .orderBy("query_id", "rank")
    )
