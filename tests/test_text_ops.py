"""Text-analysis operators: edge cases the DuckDB-oracle queries can't
probe (empty/short documents, duplicate-content invariants)."""


def test_winnow_fingerprints_edges(spark):
    from polars_mas_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "short"),                      # < k chars -> no k-grams
         (2, "exactly8"),                   # one k-gram, < window -> empty
         (3, "the quick brown fox jumps over the lazy dog"),  # dup of 0
         (4, "")],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(df, "text", k=8, window=4).toPandas().set_index("doc_id")
    assert list(out.loc[1, "fingerprints"]) == []
    assert list(out.loc[2, "fingerprints"]) == []
    assert list(out.loc[4, "fingerprints"]) == []
    assert len(out.loc[0, "fingerprints"]) > 0
    assert list(out.loc[0, "fingerprints"]) == list(out.loc[3, "fingerprints"])
    # A shared long substring must share at least one fingerprint.
    df2 = spark.createDataFrame(
        [(0, "AAAA the quick brown fox BBBB"),
         (1, "CCCCCC the quick brown fox DD")],
        "doc_id long, text string",
    )
    o2 = winnow_fingerprints(df2, "text", k=8, window=4).toPandas().set_index("doc_id")
    assert set(o2.loc[0, "fingerprints"]) & set(o2.loc[1, "fingerprints"])


def test_fingerprint_normalization(spark):
    from polars_mas_spark.operators.text import fingerprint

    df = spark.createDataFrame(
        [(0, "Hello,   World!"), (1, "hello world"), (2, "different text")],
        "doc_id long, text string",
    )
    out = fingerprint(df, "text").toPandas().set_index("doc_id")
    assert out.loc[0, "fingerprint"] == out.loc[1, "fingerprint"]
    assert out.loc[0, "fingerprint"] != out.loc[2, "fingerprint"]


def test_audio_features_fake_decoder(spark):
    import numpy as np

    from polars_mas_spark.operators.multimodal import (
        extract_audio_features, text_as_binary,
    )

    df = spark.createDataFrame(
        [(0, "abcd"), (1, "")], "doc_id long, text string"
    )
    out = (
        extract_audio_features(text_as_binary(df, "text"), "doc_id", "content")
        .toPandas().set_index("doc_id")
    )
    b = np.frombuffer(b"abcd", dtype=np.uint8)
    sig = (b.astype(float) - 128.0) / 128.0
    assert out.loc[0, "n_bytes"] == 4
    assert out.loc[0, "sample_rate"] == 8000 + ord("a") * 32
    assert abs(out.loc[0, "rms"] - float(np.sqrt((sig**2).mean()))) < 1e-12
    assert out.loc[1, "n_bytes"] == 0 and out.loc[1, "rms"] == 0.0


def test_audio_real_decoder_raises(spark):
    import pytest as _pytest

    from polars_mas_spark.operators.multimodal import (
        extract_audio_features, text_as_binary,
    )

    df = spark.createDataFrame([(0, "abcd")], "doc_id long, text string")
    out = extract_audio_features(
        text_as_binary(df, "text"), "doc_id", "content", decoder="real"
    )
    with _pytest.raises(Exception, match="NotImplementedError|decoding"):
        out.collect()


def test_simhash_segment_blocking_full_recall(spark):
    """The (max_distance+1)-segment blocking must recover EXACTLY the
    unblocked hamming<=d pair set (pigeonhole losslessness), at the
    production 64-bit width."""
    import numpy as np

    from polars_mas_spark.operators import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sims = dd.simhash(docs, "doc_id", "text", bits=64)
    pdf = sims.toPandas()
    vals = {r.doc_id: int(r.simhash, 16) for r in pdf.itertuples()}
    ids = sorted(vals)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(vals[a] ^ vals[b]).count("1") <= 3:
                expect.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in dd.simhash_hamming_pairs(sims, max_distance=3, bits=64)
        .toPandas().itertuples()
    }
    assert got == expect


def test_connected_min_labels_transitive(spark):
    """CC labels vs greedy: edges a-c, b-c (a<b<c) form ONE component;
    min-label propagation must label all three with a, while greedy
    dedup would keep both a and b."""
    from polars_mas_spark.operators import dedup as dd

    pairs = spark.createDataFrame(
        [(1, 3), (2, 3)], "doc_a long, doc_b long"
    )
    labels = {
        r.doc_id: r.label
        for r in dd.connected_min_labels(pairs).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1}
