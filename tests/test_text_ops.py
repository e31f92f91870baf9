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
