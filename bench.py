#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs the engine's headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {...}, "sf", ...}.

Headline queries:
- index_build      — full pipeline (dedup→extract→segments→merge→publish)
                     over a deterministic synthetic web_pages corpus sized
                     rows = 500_000 * sf (FIXTURES.md 'small' at sf=0.1).
- bm25_batch       — the 50-query reference set through the distributed
                     Spark batch path.
- bm25_serving_p50 — per-query serving-path latency, p50 over the set.
- plus relational headliners on the sf tables (tpch_q1, term_df_stats,
  ann_cosine).

Extra keys: docs_per_sec (build throughput), n_docs, cpus.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORK = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".work")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(os.path.normpath(d))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_corpus(n_rows: int) -> str:
    from escp_spark.corpus import write_web_pages_parquet

    # Layout-versioned cache name: corpora written before the 64k-rows/
    # row-group change would otherwise be reused with the old 1M-row
    # layout and silently serialize the scan (ADVICE r02).
    path = os.path.join(WORK, f"web_pages_{n_rows}_rg64k.parquet")
    if not os.path.exists(path):
        os.makedirs(WORK, exist_ok=True)
        write_web_pages_parquet(path, n_rows)
    return path


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    n_rows = max(1000, int(500_000 * sf))

    from escp_spark.build import build_index
    from escp_spark.corpus import reference_queries
    from escp_spark.query import IndexReader, search_topk, search_topk_spark
    from escp_spark.session import get_spark, warm_python_workers

    import __spark_entry__ as entrymod

    spark = get_spark("escp_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    # Steady-state measurement: JIT/codegen + python-worker arenas warmed
    # (long-lived executors are the production condition; cold worker
    # first-touch costs ~13s sys per worker on this microVM host).
    spark.range(0, 1000).selectExpr("md5(cast(id as string)) h").count()
    warm_python_workers(spark)
    corpus_path = ensure_corpus(n_rows)
    qset = reference_queries()

    index_dir = os.path.join(WORK, f"bench_index_{n_rows}_{cpus}")

    def build_once():
        if os.path.isdir(index_dir):
            shutil.rmtree(index_dir)
        t0 = time.perf_counter()
        manifest = build_index(
            spark, corpus_path, index_dir,
            n_buckets=max(cpus * 2, 16), max_segments=5, n_groups=2,
        )
        import escp_spark.build as B

        return (
            time.perf_counter() - t0, manifest["n_docs"],
            dict(B.last_build_timings),
        )

    def queries_once():
        timings = {}
        t0 = time.perf_counter()
        search_topk_spark(spark, index_dir, qset).collect()
        timings["bm25_batch"] = time.perf_counter() - t0

        # Mixed-frequency 200-query batch (VERDICT r05 next-#7): distinct
        # uniform-vocabulary-rank term draws, the same generator the
        # scaling record uses — per-query work grows with the batch the
        # way a real multi-tenant mix does, unlike tiling the reference
        # set. Reported alongside bm25_batch (one round of history keeps
        # the old number comparable).
        from escp_spark.corpus import scale_queries

        qmix = scale_queries(200)
        t0 = time.perf_counter()
        search_topk_spark(spark, index_dir, qmix).collect()
        timings["bm25_batch_mixed200"] = time.perf_counter() - t0

        import escp_spark.query as Q

        reader = IndexReader(index_dir)
        lat = []
        prune_tot = {"total": 0, "pruned": 0, "bytes": 0}
        for q in qset:
            t0 = time.perf_counter()
            search_topk(index_dir, [q], reader=reader)
            lat.append(time.perf_counter() - t0)
            st = Q.last_prune_stats
            prune_tot["total"] += st.get("total_blocks", 0)
            prune_tot["pruned"] += st.get("pruned_blocks", 0)
            prune_tot["bytes"] += st.get("payload_bytes_fetched", 0)
        lat.sort()
        timings["bm25_serving_p50"] = lat[len(lat) // 2]
        # p99 over the set = the hot-term queries (VERDICT r02 #8).
        timings["bm25_serving_p99"] = lat[min(int(len(lat) * 0.99), len(lat) - 1)]
        extras = {
            "serving_pruned_block_ratio": round(
                prune_tot["pruned"] / max(prune_tot["total"], 1), 3
            ),
            "serving_payload_bytes_fetched": prune_tot["bytes"],
        }

        for name in ("tpch_q1", "term_df_stats", "ann_cosine"):
            fn = entrymod.queries()[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            timings[name] = time.perf_counter() - t0

        # MinHash v2 signature throughput over the bench corpus (the
        # vectorized-shingle-hash evidence; v1 per-shingle-md5 baseline
        # in BENCH.md).
        from pyspark.sql import functions as F

        from escp_spark.operators.dedup import minhash_signatures

        # The bench corpus is ONE 34 MB parquet file = one input split,
        # which would run the kernel single-core; a real 100 TB corpus
        # is thousands of splits. Repartition to restore representative
        # input parallelism (the shuffle is ~2 orders cheaper than the
        # kernel).
        docs_df = (
            spark.read.parquet(corpus_path)
            .select(F.abs(F.xxhash64("url")).alias("doc_id"), "text")
            .repartition(cpus * 2)
        )
        t0 = time.perf_counter()
        minhash_signatures(docs_df).count()
        timings["minhash_sigs"] = time.perf_counter() - t0
        return timings, extras

    # This sandbox's shared microVM host serializes concurrent
    # first-touch page faults in unpredictable bursts (BENCH.md
    # environment note): an identical run measures 2-5x slower when a
    # burst hits. Per-metric MIN over repeats is the reproducible
    # steady-state number; single samples are lottery tickets. Build
    # repeats run BACK-TO-BACK (measured: a build sampled after the
    # query workload runs ~1.4× slower than one sampled right after the
    # previous build — grown worker arenas / JVM heap churn — and
    # back-to-back is the steady-state condition a dedicated build
    # cluster sees). Set SPARK_GRAFT_REPEATS=1 for a single-shot.
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    best, extras = {}, {}
    n_docs, build_stages, all_builds = 0, {}, []
    # Adaptive burst insurance: when the samples spread >1.4× the host
    # is mid-burst — take up to 2 extra samples so the min is a real
    # steady-state observation, not the least-bad burst sample.
    max_builds = repeats + 2
    while len(all_builds) < repeats or (
        len(all_builds) < max_builds
        and max(all_builds) > 1.4 * min(all_builds)
    ):
        tb, n_docs, stages = build_once()
        all_builds.append(round(tb, 3))
        if "index_build" not in best or tb < best["index_build"]:
            best["index_build"] = tb
            build_stages = stages  # stages attribute the reported number
    for _ in range(repeats):
        timings, run_extras = queries_once()
        if not extras:
            extras = run_extras
        for k, v in timings.items():
            best[k] = min(best.get(k, v), v)
    # Per-stage build attribution in the headline record (VERDICT r03
    # #1: a regression shipped unattributed because these were recorded
    # but not reported).
    extras["build_stages"] = {k: round(v, 3) for k, v in build_stages.items()}
    extras["all_index_build"] = all_builds

    # Headline total stays the r01-r05 metric set so round-over-round
    # comparisons hold; the new mixed-frequency batch is reported as its
    # own key (it measures a 4× larger workload than bm25_batch).
    total = sum(v for k, v in best.items() if k != "bm25_batch_mixed200")
    print(
        json.dumps(
            {
                "metric": "escp_spark_headline_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in best.items()},
                "sf": sf,
                "n_docs": n_docs,
                "docs_per_sec": round(n_docs / best["index_build"], 1),
                "cpus": cpus,
                "repeats": repeats,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
