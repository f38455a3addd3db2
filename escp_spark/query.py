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
    """Block-max pruned exhaustive scoring for ONE query.

    θ-seeding + envelope pruning, provably rank-identical to exhaustive:
    let θ be the kth best *partial* score over a seeded block subset
    (partial ≤ real, so ≥k docs have real score ≥ θ). A block b of term t
    is pruned only if ub_t(b) + Σ_{t'≠t} max_ub(t') < θ — for every doc in
    b this upper-bounds its total score, so pruned docs cannot reach the
    top-k; and every doc with real score ≥ θ has all its blocks kept
    (each such block's envelope ≥ the doc's real score ≥ θ), so every
    candidate's final score is exact.
    """
    weights = {t: term_weights[t] * idf[t] for t in term_weights if t in idf}
    if blocks.empty or not weights:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)

    blocks = blocks[blocks["term"].isin(weights)].reset_index(drop=True)
    w_arr = blocks["term"].map(weights).to_numpy(dtype=np.float64)
    ub = bm25_upper_bound(
        blocks["max_tf"].to_numpy(), blocks["min_dl"].to_numpy(), avgdl, w_arr
    )
    term_codes, term_uniq = pd.factorize(blocks["term"], sort=True)
    max_ub_per_term = np.zeros(len(term_uniq))
    np.maximum.at(max_ub_per_term, term_codes, ub)
    sum_max_ub = max_ub_per_term.sum()

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

    # Seed: per term, the few highest-ub blocks.
    n_seed = max(1, math.ceil((k + 8) / 128) + 1)
    seed_idx = []
    for tc in range(len(term_uniq)):
        cand = np.flatnonzero(term_codes == tc)
        top = cand[np.argsort(ub[cand])[::-1][:n_seed]]
        seed_idx.extend(top.tolist())
    _, seed_scores = score_rows(np.array(seed_idx, dtype=np.int64))
    if seed_scores.size >= k:
        theta = np.partition(seed_scores, -k)[-k]
    else:
        theta = -np.inf

    envelope = ub + (sum_max_ub - max_ub_per_term[term_codes])
    keep = np.flatnonzero(envelope >= theta)
    return score_rows(keep)


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
    the map-side-combine analog. The docmap join only sees the tiny
    tie-complete candidate set (broadcast), never the full doc space.
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

    kdf = spark.createDataFrame(
        [(q["query_id"], q["k"]) for q in queries], "query_id int, k int"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc())
    cand = (
        scores.join(F.broadcast(kdf), "query_id")
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
