"""Stage-by-stage wall profile of the KG pipeline — finds the fixed
job-chain latency (the serial term that caps same-input scaling).

Usage: python tools/profile_pipeline.py [n_convs] [cores] [buckets]
Small n_convs ≈ pure fixed cost; compare against a big run to split
fixed vs compute.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("profile_pipeline")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from kr_spark.pipeline.extract import mentions_from_extractions
    from kr_spark.pipeline.link import (
        canonical_surface_mapping,
        link_entities,
        lsh_candidate_pairs,
        score_candidates_expr,
    )
    from kr_spark.pipeline import materialize as M
    from kr_spark.pipeline.transcripts import generate_transcripts

    out = tempfile.mkdtemp(prefix="kr_prof_")
    marks: list[tuple[str, float]] = []
    t_prev = time.time()

    def mark(name: str) -> None:
        nonlocal t_prev
        now = time.time()
        marks.append((name, now - t_prev))
        t_prev = now

    # warm-up: one tiny end-to-end pass absorbs JVM/codegen/Arrow startup
    warm = tempfile.mkdtemp(prefix="kr_prof_warm_")
    M.run_pipeline(spark, generate_transcripts(spark, 200), warm, n_buckets=2)
    shutil.rmtree(warm, ignore_errors=True)
    mark("warmup")

    transcripts = generate_transcripts(spark, n_convs)
    snapshot = M.ingest_transcripts(spark, transcripts, out, n_buckets=buckets)
    mark("ingest_snapshot")

    M.run_extract_stage(spark, snapshot, out, n_buckets=buckets)
    mark("extract_stage")

    extracted = M.load_extracted(spark, out)
    mentions = mentions_from_extractions(extracted)
    cand = lsh_candidate_pairs(mentions)
    n_cand = cand.count()
    mark(f"lsh_candidates({n_cand})")

    edges = score_candidates_expr(cand).select(
        F.col("surface_a").alias("a"), F.col("surface_b").alias("b")
    )
    n_edges = edges.count()
    mark(f"score_edges({n_edges})")

    mapping = canonical_surface_mapping(mentions, edges)
    n_map = mapping.count()
    mark(f"canonical_mapping_cc({n_map})")

    triples = M.materialize_triples(spark, out)
    n = triples.count()
    mark(f"materialize_write({n})")

    total = sum(d for _, d in marks)
    print(f"\n=== profile n_convs={n_convs} cores={cores} buckets={buckets} ===")
    for name, d in marks:
        print(f"{name:32s} {d:7.2f}s")
    print(f"{'TOTAL (post-warmup)':32s} {total - marks[0][1]:7.2f}s")
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
