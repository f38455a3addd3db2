#!/usr/bin/env python3
"""Per-operator isolation benchmarks + plan dumps (guide §1.4/§1.5).

NOT the driver contract — bench.py is frozen for measurement; this file
exists so optimization work can time one operator at a time (noop sink,
phase breakdowns) and capture `.explain("formatted")` into plans/r07/.

Usage:
  python bench_extra.py [targets...] [--plans-tag before|after]

Targets (default: all):
  relational  — tpch_q1, term_df_stats, ann_cosine (+ explains, noop timing)
  minhash     — scan-only vs full-kernel split for minhash_sigs
  batch       — search_topk_spark with last_batch_timings phase breakdown
  build       — one build_index with last_build_timings/_detail
  plans       — dump explain("formatted") for every declared query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     SPARK_GRAFT_REPEATS (default 3 timing repeats, min reported).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORK = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".work")
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timeit(fn, repeats):
    out = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n_rows = max(1000, int(500_000 * float(sf)))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    targets = set(args) or {"relational", "minhash", "batch", "build"}
    tag = "before"
    for a in sys.argv[1:]:
        if a.startswith("--plans-tag="):
            tag = a.split("=", 1)[1]

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from escp_spark.session import get_spark, warm_python_workers

    spark = get_spark("escp_spark_bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.range(0, 1000).selectExpr("md5(cast(id as string)) h").count()
    warm_python_workers(spark)
    results = {"sf": sf, "cpus": cpus, "repeats": repeats}

    def dump_plan(name, df):
        os.makedirs(PLANS_DIR, exist_ok=True)
        p = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))
        return p

    if "plans" in targets:
        for name, fn in entrymod.queries().items():
            if name in ("bm25_topk", "bm25_serving", "ann_lsh"):
                continue  # need an index build / side artifacts; handled ad hoc
            try:
                dump_plan(name, fn(spark, sf_dir))
            except Exception as e:  # noqa: BLE001
                print(f"plan {name}: FAILED {e}", file=sys.stderr)
        print("plans dumped to", PLANS_DIR)

    if "relational" in targets:
        for name in ("tpch_q1", "term_df_stats", "ann_cosine"):
            fn = entrymod.queries()[name]
            spark.sparkContext.setJobDescription(f"x:{name}")
            results[name] = _timeit(lambda: fn(spark, sf_dir).collect(), repeats)
            dump_plan(name, fn(spark, sf_dir))
        spark.sparkContext.setJobDescription(None)

    if "minhash" in targets:
        from escp_spark.operators.dedup import minhash_signatures

        corpus_path = os.path.join(WORK, f"web_pages_{n_rows}_rg64k.parquet")
        if not os.path.exists(corpus_path):
            from escp_spark.corpus import write_web_pages_parquet

            os.makedirs(WORK, exist_ok=True)
            write_web_pages_parquet(corpus_path, n_rows)
        docs_df = (
            spark.read.parquet(corpus_path)
            .select(F.abs(F.xxhash64("url")).alias("doc_id"), "text")
            .repartition(cpus * 2)
        )
        spark.sparkContext.setJobDescription("x:minhash_scan_only")
        results["minhash_scan_only"] = _timeit(
            lambda: _noop(docs_df), repeats)
        spark.sparkContext.setJobDescription("x:minhash_full")
        results["minhash_full_count"] = _timeit(
            lambda: minhash_signatures(docs_df).count(), repeats)
        spark.sparkContext.setJobDescription(None)
        dump_plan("minhash_sigs", minhash_signatures(docs_df))

    if "batch" in targets:
        import escp_spark.query as Q
        from escp_spark.build import build_index
        from escp_spark.corpus import reference_queries, scale_queries
        from escp_spark.query import search_topk_spark

        corpus_path = os.path.join(WORK, f"web_pages_{n_rows}_rg64k.parquet")
        index_dir = os.path.join(WORK, f"bench_index_{n_rows}_{cpus}")
        if not os.path.isdir(index_dir):
            build_index(spark, corpus_path, index_dir,
                        n_buckets=max(cpus * 2, 16), max_segments=5,
                        n_groups=2)
        qset = reference_queries()
        spark.sparkContext.setJobDescription("x:bm25_batch")
        phases = []

        def run_batch(qs):
            search_topk_spark(spark, index_dir, qs).collect()
            phases.append(dict(Q.last_batch_timings))

        results["bm25_batch"] = _timeit(lambda: run_batch(qset), repeats)
        results["bm25_batch_phases"] = phases[:]
        phases.clear()
        qmix = scale_queries(200)
        spark.sparkContext.setJobDescription("x:bm25_mixed200")
        results["bm25_batch_mixed200"] = _timeit(lambda: run_batch(qmix), repeats)
        results["bm25_mixed200_phases"] = phases[:]
        spark.sparkContext.setJobDescription(None)

    if "build" in targets:
        import escp_spark.build as B
        from escp_spark.build import build_index

        corpus_path = os.path.join(WORK, f"web_pages_{n_rows}_rg64k.parquet")
        index_dir = os.path.join(WORK, f"bench_index_{n_rows}_{cpus}")
        walls, stages, details = [], [], []
        for _ in range(repeats):
            if os.path.isdir(index_dir):
                shutil.rmtree(index_dir)
            t0 = time.perf_counter()
            build_index(spark, corpus_path, index_dir,
                        n_buckets=max(cpus * 2, 16), max_segments=5,
                        n_groups=2)
            walls.append(round(time.perf_counter() - t0, 3))
            stages.append(dict(B.last_build_timings))
            details.append(dict(B.last_build_detail))
        results["index_build"] = walls
        results["build_stages"] = stages
        results["build_detail"] = details

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
