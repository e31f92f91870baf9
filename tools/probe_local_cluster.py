"""Multi-JVM probe: run a representative query slice under
``local-cluster[2,4,4096]`` — two REAL executor JVMs with real
serialization/broadcast/shuffle boundaries — and compare against the
same DuckDB oracles as the sf0.01 gate (VERDICT r6 next-steps #3).

``local[32]`` runs everything inside one JVM, so executor-boundary
hazards (py4j-only state, driver-local paths the executors can't see,
broadcast sizing, the columnar checkpoint's cross-process file
contract, the file-backed vocabulary read) never fire. local-cluster
mode on one box keeps /tmp shared (matching the POSIX-shared-storage
contract checkpoint_wide documents for multi-node) while making every
task cross a process boundary.

Slice (one query per MAS physical strategy + the surfaces VERDICT r6
called out + one real readStream flow):

- mas_firth_fanout_golden    packed fan-out (applyInPandas kernel)
- mas_linear_fanout          classic unpivot fan-out
- mas_linear_moments         sufficient-statistics shuffle
- mas_firth_columnar_golden  checkpoint_wide mapInArrow writers ->
                             per-task pruned pyarrow reads, now
                             writing/reading across executor JVMs
- vocab_encode_sources       file-backed fit_vocabulary (r7 rework)
- image_neardup_pairs        mapInPandas encode/decode + segment join
- streaming                  windowed_event_counts stream == batch

Usage: python tools/probe_local_cluster.py
Writes nothing; exits non-zero on any divergence. Results are
summarized in SCALING.md (r7 section).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import duckdb

from check_oracles import SF_DIR, TABLES, _check_one

ORACLE_QUERIES = [
    "mas_firth_fanout_golden",
    "mas_linear_fanout",
    "mas_linear_moments",
    "mas_firth_columnar_golden",
    "vocab_encode_sources",
    "image_neardup_pairs",
    # applyInPandasWithState: the state store + timeout machinery now
    # partitions user state across executor JVMs.
    "stateful_user_stats",
    # r8 additions: the r8 Firth CI path (tangent predictor + Hermite
    # root find) inside cross-process kernels, the packed logistic
    # golden, the derived-partsupp wave (scalar-total collect + derived
    # view across executors), and the canonical-URL groupBy.
    "mas_logistic_fanout_golden",
    "tpch_q11ish",
    "url_dedup_summary",
    # The r8 audio/video modalities: same mapInPandas decode shape as
    # image, but the container walk + inverted-index pairing deserve a
    # cross-JVM run of their own.
    "audio_neardup_pairs",
    "video_neardup_pairs",
    # r9 additions: the 180-wide columnar golden (checkpoint_wide +
    # 180 pruned per-task reads hop executors at width), stride-1 span
    # dedup (fingerprint rank + position anti-join cross-JVM),
    # incremental near-dup (band-key semi-join across executors), and
    # the BPE trainer (N-iteration driver loop collecting top pairs
    # from executor-side aggregations).
    "mas_phewas_firth_180_golden",
    "span_dedup",
    "incremental_minhash_dedup",
    "bpe_learn_golden",
    # r9 late additions: DSIR (n-gram bucket stats shuffle + broadcast
    # log-ratio join + TakeOrderedAndProject top-k across JVMs) and the
    # kNN graph (Arrow centroid UDFs + bucket shuffle join + salted
    # two-phase top-k all hop executors).
    "dsir_select",
    "knn_graph",
    # r9 final wave: the dedup cascade's eager localCheckpoints must
    # hold across executor JVMs (checkpoint blocks are executor-local),
    # span decontamination's broadcast fingerprint semi join, the
    # curriculum two-phase rank's driver offset lookup, and the label
    # vote's left-join totality.
    "dedup_cascade",
    "span_decontaminate",
    "curriculum_stages",
    "knn_label_vote",
    "html_extract_docs",
]

# Rows-only under the gate too (iterative MLE, no SQL closed form) but
# the headline columnar PheWAS shape deserves a cross-process run:
# mapInArrow table generation, checkpoint, per-task pruned reads and
# the Firth kernel all hop executors. Expected exactly n_phecodes rows.
ROWS_QUERIES = {"mas_phewas_firth_180": 180}


def probe_streaming(spark) -> tuple[str, bool]:
    """windowed_event_counts as a REAL readStream over the testdata
    events, compared with its batch twin — state + watermark machinery
    across executor JVMs."""
    from pyspark.sql import functions as F

    from polars_mas_spark.streaming.events import windowed_event_counts

    t0 = time.time()
    src = f"{SF_DIR}/events.parquet"
    tmp = tempfile.mkdtemp(prefix="pms_lc_stream_")
    try:
        # Generated events.ts is TIMESTAMP_NTZ; watermarks require
        # TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — same cast
        # the batch queries' _t helper applies.
        (
            spark.read.parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        schema = spark.read.parquet(tmp).schema
        stream = spark.readStream.schema(schema).parquet(tmp)
        out = windowed_event_counts(stream, window_duration="1 hour")
        q = (
            out.writeStream.format("memory")
            .queryName("lc_windowed_sink")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {tuple(r) for r in spark.sql("SELECT * FROM lc_windowed_sink").collect()}
        want = {
            tuple(r)
            for r in windowed_event_counts(
                spark.read.parquet(tmp), window_duration="1 hour"
            ).collect()
        }
        if got != want or not want:
            return (
                f"FAIL  streaming: stream {len(got)} rows != batch "
                f"{len(want)} rows ({time.time()-t0:.1f}s)",
                True,
            )
        return f"OK    streaming: {len(got)} windows ({time.time()-t0:.1f}s)", False
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    from polars_mas_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="pms-local-cluster-probe",
        master="local-cluster[2,4,4096]",
        shuffle_partitions=8,
        # FIRST multi-JVM finding (r7): executor Python workers do NOT
        # inherit the driver's sys.path, so every applyInPandas/
        # mapInPandas kernel that imports polars_mas_spark dies with
        # ModuleNotFoundError — invisible under local[*], where workers
        # fork from the driver process. On one box executorEnv
        # PYTHONPATH is the fix; on a real cluster, install the package
        # on executors or ship it via spark.submit.pyFiles (see
        # deploy/spark-defaults-cluster.conf).
        extra_conf={"spark.executorEnv.PYTHONPATH": "/root/repo"},
    )
    # Same session config as the driver's gate (check_oracles docstring).
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    master = spark.sparkContext.master
    assert master.startswith("local-cluster"), f"got master {master!r}"
    print(f"master={master} defaultParallelism={spark.sparkContext.defaultParallelism}")

    from polars_mas_spark.queries_ext import BENCH_ONLY

    qs = {**entry_mod.queries(), **BENCH_ONLY}
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = []
    for name in ORACLE_QUERIES:
        line, failed = _check_one(spark, con, name, qs[name], oracles)
        print(line)
        if failed:
            failures.append(name)

    for name, want_rows in ROWS_QUERIES.items():
        t0 = time.time()
        try:
            n = qs[name](spark, SF_DIR).count()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if n != want_rows:
            print(f"FAIL  {name}: {n} rows != expected {want_rows}")
            failures.append(name)
        else:
            print(f"OK    {name}: {n} rows ({time.time()-t0:.1f}s) [rows-only]")

    line, failed = probe_streaming(spark)
    print(line)
    if failed:
        failures.append("streaming")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
