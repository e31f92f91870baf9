"""Synthesize a 10x scale step BEYOND the driver's largest testdata
(sf0.1) for the scaling probe: build /tmp/sfx0.1 (1 replica) and
/tmp/sfx1 (10 replicas) of the six tables the shuffle-heaviest probe
queries read (documents, embeddings, customer, orders, lineitem,
events).

Replication is workload-faithful, not naive duplication:

- Keys (doc_id, vec_id, c_custkey, o_orderkey/o_custkey, l_orderkey)
  shift by replica * 1e9 so key cardinality grows 10x like real data.
- Document text gets a per-replica PER-WORD prefix (``r<i>x``), so
  every shingle is replica-distinct: naive copies would turn every doc
  into a 10-member near-dup cluster and quadratically inflate the pair
  stage — the opposite of how real corpora grow. Per-word prefixing
  keeps token counts and INTRA-replica near-dup structure identical
  while making replicas disjoint, i.e. duplicate-cluster size stays
  constant as volume grows. The SAME transform is applied to the
  1-replica small side so the t(big)/t(small) ratio isolates data
  volume, not the transform.
- Embedding vectors get their first component shifted by 10*replica,
  placing each replica in a distinct region (cluster structure repeats
  per replica; total cluster count grows with data, per-cluster size
  constant — again matching real corpus growth). CAVEAT (SCALING.md
  r9): the shift makes replicas nearly COLLINEAR under COSINE (the
  shifted component dominates, everything points ~e1) — fine for
  euclidean/label-blocked probes, invalid for cosine-space ops
  (knn/ANN/semantic dedup). For those pass ``--emb-transform roll``:
  each replica's vectors rotate by 6*replica coordinate positions
  (np.roll semantics — a permutation, so intra-replica geometry is
  bit-identical while replica directions stay mutually distinct).

Usage: python tools/make_scale_data.py [--replicas 10]
       [--small /tmp/sfx0.1] [--big /tmp/sfx1]
       [--emb-transform shift|roll]
Then:  SCALE_PROBE_SMALL=/tmp/sfx0.1 SCALE_PROBE_BIG=/tmp/sfx1 \
       python tools/scale_probe.py minhash_dedup semantic_dedup ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEY_STRIDE = 1_000_000_000
EMB_TRANSFORM = "shift"

TABLES = ["documents", "embeddings", "customer", "orders", "lineitem", "events"]


def _replica(spark, table: str, r: int):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SRC}/{table}.parquet")
    off = F.lit(r * KEY_STRIDE).cast("long")
    tag = f"r{r}x"
    if table == "documents":
        return df.select(
            (F.col("doc_id") + off).alias("doc_id"),
            F.regexp_replace("text", r"(\w+)", tag + "$1").alias("text"),
            "lang", "source", "n_chars",
        )
    if table == "embeddings":
        e = F.col("embedding")
        if EMB_TRANSFORM == "roll":
            # np.roll(v, 6r): result = concat(last 6r, first n-6r). A
            # coordinate permutation — intra-replica cosines identical,
            # replica directions mutually distinct (the r9 knn-knob
            # fixture; SCALING.md r9). The dim is READ from the data
            # (review r11: a hard-coded 64 would silently return [] from
            # slice if the driver regenerates testdata at another dim,
            # degenerating the fixture into exact copies).
            dim = len(
                spark.read.parquet(f"{SRC}/embeddings.parquet")
                .select("embedding").first()[0]
            )
            k = (6 * r) % dim
            moved = e if k == 0 else F.concat(
                F.slice(e, dim - k + 1, k), F.slice(e, 1, dim - k)
            )
        else:
            moved = F.concat(
                F.array(
                    (F.element_at(e, 1) + F.lit(float(10 * r))).cast("float")
                ),
                F.slice(e, 2, 1 << 20),
            )
        return df.select(
            (F.col("vec_id") + off).alias("vec_id"),
            moved.alias("embedding"),
            # Labels shift per replica too: 10x data must mean 10x label
            # BLOCKS of constant size (real corpus growth), not 10x
            # bigger blocks — otherwise every label-blocked quadratic
            # (embedding_neardup) measures a 100x pair blow-up that no
            # real corpus produces (r9: the un-shifted version wedged
            # the sf1 gate on 20M in-block pairs).
            (F.col("label") + F.lit(r * 1000).cast("int")).alias("label"),
        )
    if table == "customer":
        return df.select(
            (F.col("c_custkey") + off).alias("c_custkey"),
            F.concat(F.lit(tag), F.col("c_name")).alias("c_name"),
            "c_nationkey", "c_acctbal", "c_mktsegment",
        )
    if table == "orders":
        return df.select(
            (F.col("o_orderkey") + off).alias("o_orderkey"),
            (F.col("o_custkey") + off).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        )
    if table == "lineitem":
        return df.withColumn("l_orderkey", F.col("l_orderkey") + off)
    if table == "events":
        # Shift user_id (and event_id) so 10x data = 10x USERS with the
        # same per-user session-length distribution — real traffic
        # growth. Keeping ts/event_type/value as-is preserves gap
        # structure, so sessionize/window costs scale with user count,
        # the exact claim the session/transition probes test.
        return df.select(
            (F.col("event_id") + off).alias("event_id"),
            "ts",
            (F.col("user_id") + off).alias("user_id"),
            "event_type", "value", "props",
        )
    raise ValueError(table)


def build(spark, out_dir: str, replicas: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        parts = [_replica(spark, t, r) for r in range(replicas)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{out_dir}/{t}.parquet: {replicas} replicas", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--small", default="/tmp/sfx0.1")
    ap.add_argument("--big", default="/tmp/sfx1")
    ap.add_argument(
        "--emb-transform", choices=("shift", "roll"), default="shift",
        help="embedding replica transform: shift (euclidean probes) or "
             "roll (cosine-space probes — see module docstring)",
    )
    args = ap.parse_args()
    global EMB_TRANSFORM
    EMB_TRANSFORM = args.emb_transform

    from polars_mas_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, args.small, 1)
    build(spark, args.big, args.replicas)


if __name__ == "__main__":
    main()
