#!/usr/bin/env python
"""spark-submit worker: build the full index over a parquet corpus, print
one JSON line with the wall time. Master comes from spark-submit --master
(never set in code), the package from --py-files.

Usage:
  spark-submit --master local[8] --py-files lucene_spark.zip \
      scale_worker.py <corpus_parquet> <index_dir> <num_segments>
"""

import json
import shutil
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    import os

    # same worker-env tuning as lucene_spark.session.get_spark (must be set
    # before the JVM starts so pyspark daemons inherit it)
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(512 * 1024 * 1024))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(512 * 1024 * 1024))
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

    corpus, index_dir, nseg = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = (
        SparkSession.builder.appName("lucene_spark_scale")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.files.openCostInBytes", "2m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 8)))

    from lucene_spark.index.builder import IndexConfig, build_index

    shutil.rmtree(index_dir, ignore_errors=True)
    docs = spark.read.parquet(corpus)
    n_docs = docs.count()
    cfg = IndexConfig(
        num_segments=nseg,
        hot_df_threshold=max(1000, n_docs // 20),
        merge_bucket_segments=max(2, nseg // 16),
    )
    t0 = time.perf_counter()
    build_index(spark, docs, index_dir, cfg)
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_docs,
                "build_sec": round(sec, 2),
                "docs_per_sec": round(n_docs / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
