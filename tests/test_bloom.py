"""KeyBloom epoch artifacts (operators/bloom.py) and their routing
contract inside incremental_exact_dedup: the filter ROUTES rows, the
exact join DECIDES them — output equality with the unrouted path must
hold at every fpp, including a degenerate all-positive filter."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_mas_spark.operators.bloom import KeyBloom, build_key_bloom
from polars_mas_spark.operators.dedup import (
    content_digest,
    incremental_exact_dedup,
)


def _digest_frame(spark, texts):
    return spark.createDataFrame(
        [(t,) for t in texts], ["text"]
    ).select(content_digest(F.col("text")).alias("digest"))


def test_bloom_no_false_negatives_and_sized_fpp(spark):
    members = [f"member text {i}" for i in range(500)]
    others = [f"other text {i}" for i in range(2000)]
    bloom = build_key_bloom(_digest_frame(spark, members), "digest")
    assert bloom.n_keys == 500 and bloom.n_bits == 5000
    assert 0.0 < bloom.fpp_estimate() < 0.05
    # explicit n_bits skips the sizing count — no hidden scan, no stats
    explicit = build_key_bloom(
        _digest_frame(spark, members), "digest", n_bits=4096
    )
    assert explicit.n_keys is None and explicit.fpp_estimate() is None

    got = {
        r["digest"]: r["maybe"]
        for r in _digest_frame(spark, members + others)
        .withColumn("maybe", bloom.might_contain(F.col("digest")))
        .collect()
    }
    member_digests = {r["digest"] for r in _digest_frame(spark, members).collect()}
    # Bloom invariant: NO false negative, ever.
    assert all(got[d] for d in member_digests)
    # Sized at 10 bits/key, non-members come back mostly negative.
    fp = sum(1 for d, m in got.items() if m and d not in member_digests)
    assert fp / 2000 < 0.05


def test_bloom_single_word_exercises_every_bit(spark):
    """n_bits=64 packs the whole filter into one long, driving
    positions across bit 0..63 — incl. bit 63, whose mask is the long
    SIGN bit (shiftleft(1L, 63) < 0): the bit_or aggregate and the
    unsigned numpy reinterpretation must round-trip it."""
    keys = [f"k{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    bloom = build_key_bloom(df, "k", n_bits=64, n_hashes=3)
    assert bloom.words.shape == (1,)
    # 200 keys x 3 hashes over 64 bits: the word saturates, incl. bit 63
    assert bloom.words[0] == np.uint64(0xFFFFFFFFFFFFFFFF)
    out = df.withColumn("m", bloom.might_contain(F.col("k"))).collect()
    assert all(r["m"] for r in out)


def test_bloom_rejects_tiny_bitmap(spark):
    with pytest.raises(ValueError):
        build_key_bloom(
            spark.createDataFrame([("a",)], "k string"), "k", n_bits=63
        )


def test_incremental_dedup_bloom_routes_identically(spark):
    """Bloom-routed incremental_exact_dedup returns EXACTLY the
    unrouted rows — with a realistically-sized filter AND with a
    64-bit degenerate one (every row a false-positive candidate)."""
    seen_rows = [(i, f"seen doc {i}") for i in range(50)]
    seen = spark.createDataFrame(seen_rows, ["doc_id", "text"])
    new = spark.createDataFrame(
        [(100, "seen doc 7"), (101, "fresh alpha"), (102, "fresh alpha"),
         (103, "fresh beta"), (104, "seen doc 49"), (105, None)],
        ["doc_id", "text"],
    )
    baseline = sorted(
        (r["doc_id"], r["text"])
        for r in incremental_exact_dedup(new, seen, "doc_id", "text").collect()
    )
    assert [d for d, _ in baseline] == [101, 103, 105]

    seen_digests = seen.select(content_digest(F.col("text")).alias("digest"))
    for n_bits in (10 * 50, 64):
        bloom = build_key_bloom(
            seen_digests, "digest", n_bits=n_bits, key_tag="content_digest"
        )
        for confirm in ("shuffle", "broadcast_hits"):
            routed = sorted(
                (r["doc_id"], r["text"])
                for r in incremental_exact_dedup(
                    new, seen, "doc_id", "text",
                    seen_bloom=bloom, confirm=confirm,
                ).collect()
            )
            assert routed == baseline, f"n_bits={n_bits} confirm={confirm}"

    with pytest.raises(ValueError, match="broadcast_hits"):
        incremental_exact_dedup(
            new, seen, "doc_id", "text", confirm="broadcast_hits"
        )
    with pytest.raises(ValueError, match="confirm"):
        incremental_exact_dedup(
            new, seen, "doc_id", "text", confirm="nope"
        )


def test_incremental_span_decontaminate_bloom_routes_identically(spark):
    """Bloom pre-filter on the window-fingerprint stream is
    semantics-free: a negative window can never match the semi join.
    Output equality with the unrouted scrub — realistically sized AND
    64-bit degenerate (every window a candidate)."""
    from polars_mas_spark.operators.dedup import (
        incremental_span_decontaminate,
        span_fingerprints,
    )

    seen = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(10, "x alpha beta gamma delta epsilon y"),   # overlapping span
         (11, "totally fresh words nothing shared here"),
         (12, "one two three four five six")],          # full copy
        ["doc_id", "text"],
    )
    base = sorted(
        tuple(r) for r in incremental_span_decontaminate(
            new, seen, "doc_id", "text", k=5
        ).collect()
    )
    fset = span_fingerprints(seen, "text", k=5)
    for n_bits in (4096, 64):
        kb = build_key_bloom(
            fset, "g", n_bits=n_bits, key_tag="span_fingerprint"
        )
        for confirm in ("shuffle", "broadcast_hits"):
            routed = sorted(
                tuple(r) for r in incremental_span_decontaminate(
                    new, fset, "doc_id", "text", k=5,
                    seen_is_fingerprints=True, seen_bloom=kb,
                    confirm=confirm,
                ).collect()
            )
            assert routed == base, f"n_bits={n_bits} confirm={confirm}"


def test_incremental_minhash_bloom_routes_identically(spark):
    """Bloom on the cross-batch band probe is semantics-free: negative
    (band, bucket) rows can never match the semi join; the within-batch
    greedy stage never sees the filter. Equality with the unrouted
    operator at realistic and degenerate filter sizes."""
    from polars_mas_spark.operators.dedup import (
        band_bucket_key,
        incremental_minhash_dedup,
        minhash_signatures,
        _banded,
    )

    seen = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "one two three four five")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon"),   # exact cross-batch copy
         (11, "epsilon delta gamma beta alpha"),   # token-set twin
         (12, "totally new words appear here"),
         (13, "totally new words appear here"),    # within-batch dup
         (14, "completely different fresh content")],
        ["doc_id", "text"],
    )
    kw = dict(num_hashes=16, bands=4, rows_per_band=4)
    base = sorted(
        r["doc_id"]
        for r in incremental_minhash_dedup(new, seen, "doc_id", "text", **kw).collect()
    )
    assert 10 not in base and 12 in base and 13 not in base and 14 in base

    seen_shaped = seen.select(
        F.monotonically_increasing_id().alias("__sid__"),
        F.col("text").alias("__stxt__"),
    )
    seen_keys = (
        _banded(minhash_signatures(seen_shaped, "__sid__", "__stxt__", 16), 4, 4)
        .select("band", "bucket")
        .distinct()
        .select(band_bucket_key().alias("k"))
    )
    for n_bits in (4096, 64):
        kb = build_key_bloom(
            seen_keys, "k", n_bits=n_bits, key_tag="band_bucket:4x4"
        )
        routed = sorted(
            r["doc_id"]
            for r in incremental_minhash_dedup(
                new, seen, "doc_id", "text", seen_bloom=kb, **kw
            ).collect()
        )
        assert routed == base, f"n_bits={n_bits}"

    # provenance check: a filter built under DIFFERENT banding params
    # would silently leak near-dups (all probes read non-member) — the
    # tag turns that into a loud error
    kb44 = build_key_bloom(seen_keys, "k", n_bits=4096, key_tag="band_bucket:4x4")
    with pytest.raises(ValueError, match="band_bucket"):
        incremental_minhash_dedup(
            new, seen, "doc_id", "text",
            num_hashes=16, bands=8, rows_per_band=2, seen_bloom=kb44,
        )


def test_incremental_cascade_blooms_route_identically(spark):
    """Per-stage epoch blooms on the cascade preserve every verdict —
    the standalone operators' routing argument, composed: a negative
    key skips both the 'seen' semi and the survivor anti map-side, at
    realistic and 64-bit degenerate filter sizes. Mis-tagged banding
    raises."""
    from polars_mas_spark.operators.dedup import (
        _banded,
        band_bucket_key,
        content_digest,
        incremental_dedup_cascade,
        minhash_signatures,
    )
    from polars_mas_spark.operators.text import canonical_url

    seen = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon", "http://a.com/x"),
         (101, "one two three four five six seven",
          "http://b.com/y?utm_source=z")],
        "doc_id long, text string, url string",
    )
    new = spark.createDataFrame(
        [(1, "fresh novel content entirely here", "HTTP://A.com:80/x"),
         (2, "alpha beta gamma delta epsilon", "http://c.com/1"),
         (3, "unique doc body qqq www eee", "http://d.com/1"),
         (4, "unique doc body qqq www eee rrr", "http://d.com/1"),
         (5, "one two three four five six seven extra", "http://e.com/1"),
         (6, "totally different payload zz yy xx", "http://f.com/1"),
         (7, "totally different payload zz yy xx", "http://g.com/1"),
         (8, None, None)],
        "doc_id long, text string, url string",
    )
    base = {
        r.doc_id: (r.stage, r.vs)
        for r in incremental_dedup_cascade(
            new, seen, "doc_id", "text", url_col="url"
        ).collect()
    }
    assert base[1] == ("url", "seen") and base[5] == ("near", "seen")

    # the three persisted epoch key tables (the 100 TB side layout)
    urls = (
        seen.filter(F.col("url").isNotNull())
        .select(canonical_url(F.col("url")).alias("k"))
        .filter(F.col("k") != "")
    )
    digests = seen.filter(F.col("text").isNotNull()).select(
        content_digest(F.col("text")).alias("k")
    )
    seen_shaped = seen.select(
        F.monotonically_increasing_id().alias("__sid__"),
        F.col("text").alias("__stxt__"),
    )
    bandkeys = (
        _banded(minhash_signatures(seen_shaped, "__sid__", "__stxt__", 16), 4, 4)
        .select(band_bucket_key().alias("k"))
    )
    for n_bits in (4096, 64):
        blooms = {
            "url": build_key_bloom(urls, "k", n_bits=n_bits,
                                   key_tag="canonical_url"),
            "exact": build_key_bloom(digests, "k", n_bits=n_bits,
                                     key_tag="content_digest"),
            "near": build_key_bloom(bandkeys, "k", n_bits=n_bits,
                                    key_tag="band_bucket:4x4"),
        }
        routed = {
            r.doc_id: (r.stage, r.vs)
            for r in incremental_dedup_cascade(
                new, seen, "doc_id", "text", url_col="url",
                seen_blooms=blooms,
            ).collect()
        }
        assert routed == base, f"n_bits={n_bits}"

    with pytest.raises(ValueError, match="band_bucket"):
        incremental_dedup_cascade(
            new, seen, "doc_id", "text", url_col="url",
            bands=8, rows_per_band=2,
            seen_blooms={"near": build_key_bloom(
                bandkeys, "k", n_bits=4096, key_tag="band_bucket:4x4")},
        )
    with pytest.raises(ValueError, match="unknown seen_blooms"):
        incremental_dedup_cascade(
            new, seen, "doc_id", "text",
            seen_blooms={"semantic": build_key_bloom(
                digests, "k", n_bits=4096)},
        )


def test_bloom_null_keys_route_conservatively(spark):
    """NULL keys hash on the seed alone: if any NULL was built in, all
    NULL probes are candidates; the exact join's NULL-never-equals then
    keeps them — never a silent drop."""
    seen = spark.createDataFrame([(None,), ("x",)], "k string")
    bloom = build_key_bloom(seen, "k", n_bits=4096)
    out = {
        r["k"]: r["m"]
        for r in spark.createDataFrame([(None,), ("x",), ("y",)], "k string")
        .withColumn("m", bloom.might_contain(F.col("k")))
        .collect()
    }
    assert out[None] is True and out["x"] is True
