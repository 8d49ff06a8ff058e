"""Data-bound core-scaling probe (r11 verdict item #6).

At sf0.1 every gate is fixed-cost-bound (8-core suite time ~= 32-core),
so the driver's core-ratio block cannot evidence parallel scaling. This
probe builds a DETERMINISTIC ~16x corpus (perturbed clones of the sf0.1
documents — distinct texts, so nothing collapses to exact-dup reps) and
~32x embeddings, then times the heaviest operator kernels at the
current ``SPARK_GRAFT_CPUS``. Run it once at 8 and once at 32 cores and
compare: a data-bound, well-parallelized operator should approach the
core ratio; results are committed in SCALING.md.

Usage:
    SPARK_GRAFT_CPUS=8  python tools/scaling_probe.py /tmp/scaling_corpus
    SPARK_GRAFT_CPUS=32 python tools/scaling_probe.py /tmp/scaling_corpus

The corpus directory is built on first use (deterministic content, so
both runs see identical inputs). Prints one JSON line per operator and
a summary JSON line at the end. Diagnostic only; not part of the bench
contract and never touched by bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
DOC_COPIES = 16
EMB_COPIES = 8


def build_corpus(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    parts = []
    for k in range(DOC_COPIES):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
                # perturb: distinct text per copy (no exact-dup collapse),
                # deterministic (no rand())
                F.concat(
                    F.col("text"), F.lit(f" probe{k} tail"),
                    (F.col("doc_id") % 997).cast("string"),
                ).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    # 32 files so an 8- and a 32-core session both see enough splits
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    eparts = []
    for k in range(EMB_COPIES):
        eparts.append(
            embs.select(
                (F.col("vec_id") + F.lit(k * 1_000_000)).alias("vec_id"),
                "embedding",
            )
        )
    big_embs = eparts[0]
    for p in eparts[1:]:
        big_embs = big_embs.unionByName(p)
    big_embs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_corpus"
    from kartothek_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("kartothek_spark_scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism

    if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
        print(f"# building scaled corpus in {out_dir}", file=sys.stderr)
        build_corpus(spark, out_dir)

    docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(out_dir, "embeddings.parquet"))
    bench = docs.where(F.col("doc_id") % 11 == 0).select(
        "doc_id", F.expr("substring(text, 12)").alias("text")
    )

    from kartothek_spark.operators.clustering import kmeans_assign
    from kartothek_spark.operators.contamination import contamination_hits
    from kartothek_spark.operators.dedup import (
        dedup_exact,
        minhash_lsh_pairs,
        ngram_containment_pairs,
        simhash_pairs,
        winnow_fingerprints,
    )
    from kartothek_spark.operators.pipeline import clean_corpus
    from kartothek_spark.operators.text import gopher_filter

    centroids = [r["embedding"] for r in embs.orderBy("vec_id").limit(8).collect()]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    ops = {
        # narrow per-row kernels (should scale ~linearly with cores)
        "gopher_filter": lambda: noop(gopher_filter(docs)),
        "winnow_fingerprints": lambda: noop(winnow_fingerprints(docs)),
        "kmeans_assign": lambda: noop(kmeans_assign(embs, centroids)),
        # one-shuffle aggregations
        "dedup_exact": lambda: noop(dedup_exact(docs)),
        "contamination_hits": lambda: noop(contamination_hits(docs, bench)),
        # banding + self-join + verify cascades (shuffle-heavy)
        "minhash_lsh_pairs": lambda: noop(minhash_lsh_pairs(docs)),
        "simhash_pairs": lambda: noop(simhash_pairs(docs)),
        "ngram_containment_pairs": lambda: noop(ngram_containment_pairs(docs)),
        # composed pipeline
        "clean_corpus": lambda: noop(
            clean_corpus(docs, bench, n=8,
                         gopher={"min_words": 20, "min_stopwords": 1})
        ),
    }

    # single timed run per op: at this corpus size every op is multi-second
    # data-bound work, where run-to-run noise is a few percent — irrelevant
    # to the core-RATIO question — and a warm + best-of-N protocol would
    # multiply a multi-minute 8-core sweep by 3
    only = os.environ.get("SCALING_PROBE_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        ops = {k: v for k, v in ops.items() if k in keep}
    # one cheap session warm-up (parquet footers, scan codegen, python
    # workers) so the FIRST op doesn't absorb the session's fixed costs
    docs.count()
    embs.count()
    bench.count()
    results = {}
    for name, fn in ops.items():
        spark.sparkContext.setJobDescription(f"scaling_probe:{name}")
        t0 = time.perf_counter()
        fn()
        results[name] = round(time.perf_counter() - t0, 3)
        print(json.dumps({"op": name, "cpus": cpus, "sec": results[name]}), flush=True)
    print(json.dumps({"probe": "summary", "cpus": cpus, "results": results}))


if __name__ == "__main__":
    main()
