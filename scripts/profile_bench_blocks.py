"""Isolated profiler for bench.py-internal blocks (not registry rows):
the build_once/probe pairs, the scaled dedup configs, and the streaming
soaks — min-of-N after one untimed warm rep, mirroring bench.py's exact
methodology per block.

    PYTHONPATH=/root/repo python scripts/profile_bench_blocks.py block...
Blocks: minhash_k128 semantic_scaled sketch_build url_build stream_soaks
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    blocks = sys.argv[1:] or [
        "minhash_k128", "semantic_scaled", "sketch_build", "url_build",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from lotad_spark.session import get_spark
    from lotad_spark.sources.parquet import read_table

    spark = get_spark("profile_blocks")
    T = time.perf_counter

    def reps(name, fn, n=3):
        fn()  # warm
        times = []
        for _ in range(n):
            t0 = T(); fn(); times.append(T() - t0)
        print(f"{name}: min={min(times):.3f}s all={[round(t,3) for t in times]}",
              flush=True)

    if "minhash_k128" in blocks:
        from lotad_spark.pipeline.dedup import near_dup_pairs
        docs = read_table(spark, f"{sf_dir}/documents.parquet")
        reps("dedup_near_minhash_k128", lambda: near_dup_pairs(
            docs, num_perms=128, bands=16, threshold=0.6
        ).foreach(lambda _: None))

    if "semantic_scaled" in blocks:
        from lotad_spark.pipeline.similarity import semantic_dedup_corpus
        sem_corpus = entry_mod._embedding_dup_corpus(spark, sf_dir)
        sem_k = max(8, sem_corpus.count() // 250)
        reps("dedup_semantic_scaled", lambda: semantic_dedup_corpus(
            sem_corpus, n_clusters=sem_k, threshold=0.99, kernel="arrow"
        ).foreach(lambda _: None))

    if "sketch_build" in blocks:
        from lotad_spark.pipeline.sketch import write_sketch_index
        def go():
            d = tempfile.mkdtemp(prefix="prof_sketch_")
            write_sketch_index(read_table(spark, f"{sf_dir}/documents.parquet"), d)
            shutil.rmtree(d, ignore_errors=True)
        reps("sketch_index_build_once", go)

    if "url_build" in blocks:
        from lotad_spark.pipeline.urls import write_url_index
        url_corpus = entry_mod._url_corpus(spark, sf_dir)
        def go():
            d = tempfile.mkdtemp(prefix="prof_urlidx_")
            write_url_index(url_corpus, d)
            shutil.rmtree(d, ignore_errors=True)
        reps("url_index_build_once", go)

    if "stream_soaks" in blocks:
        from lotad_spark.streaming import (
            key_lifetime_stats, sliding_window_agg, windowed_event_agg,
        )
        work = f"/tmp/lotad_bench_sf{float(sf_dir.rstrip('/').split('sf')[-1])}"
        stream_src = os.path.join(work, "stream_src")
        if not os.path.exists(stream_src):
            read_table(spark, f"{sf_dir}/events.parquet").repartition(8)\
                .write.mode("overwrite").parquet(stream_src)
        stream_schema = spark.read.parquet(stream_src).schema
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        for bench_name, op in (
            ("stream_windowed_agg_soak", windowed_event_agg),
            ("stream_sliding_agg_soak", sliding_window_agg),
            ("stream_stateful_soak", key_lifetime_stats),
        ):
            def go(op=op, bench_name=bench_name):
                ckpt = tempfile.mkdtemp(prefix=f"prof_ckpt_{bench_name}_")
                stream = (spark.readStream.schema(stream_schema)
                          .option("maxFilesPerTrigger", 1).parquet(stream_src))
                sq = (op(stream).writeStream.format("noop")
                      .outputMode("update")
                      .option("checkpointLocation", ckpt)
                      .trigger(availableNow=True).start())
                sq.awaitTermination()
                shutil.rmtree(ckpt, ignore_errors=True)
            reps(bench_name, go, n=2)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return 0


if __name__ == "__main__":
    sys.exit(main())
