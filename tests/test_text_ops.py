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


def test_audio_rms_with_trailing_empty_in_one_batch(spark):
    """Review r4: with empty/NULL payloads TRAILING a non-empty one in
    the SAME Arrow batch, the old clamped-reduceat segment sum split
    the last non-empty document's segment and reported a wrong rms.
    coalesce(1) forces all rows into one batch to pin the fix."""
    import numpy as np

    from polars_mas_spark.operators.multimodal import (
        extract_audio_features, text_as_binary,
    )

    df = spark.createDataFrame(
        [(0, "abcd"), (1, ""), (2, None)], "doc_id long, text string"
    ).coalesce(1)
    out = (
        extract_audio_features(text_as_binary(df, "text"), "doc_id", "content")
        .toPandas().set_index("doc_id")
    )
    b = np.frombuffer(b"abcd", dtype=np.uint8)
    sig = (b.astype(float) - 128.0) / 128.0
    assert abs(out.loc[0, "rms"] - float(np.sqrt((sig**2).mean()))) < 1e-12
    assert out.loc[1, "rms"] == 0.0 and out.loc[2, "rms"] == 0.0


def test_unknown_decoder_fails_fast(spark):
    import pytest as _pytest

    from polars_mas_spark.operators.multimodal import (
        extract_audio_features, extract_image_features, text_as_binary,
    )

    df = spark.createDataFrame([(0, "abcd")], "doc_id long, text string")
    binned = text_as_binary(df, "text")
    # Driver-side, before any job runs — a typo must not cost a scan.
    with _pytest.raises(ValueError, match="unknown audio decoder"):
        extract_audio_features(binned, "doc_id", "content", decoder="mp3")
    with _pytest.raises(ValueError, match="unknown image decoder"):
        extract_image_features(binned, "doc_id", "content", decoder="jpeg")


def test_wav_decoder_roundtrip_and_16bit():
    """Pure-Python RIFF/WAVE decoder: 8-bit round-trip through the
    matching encoder, a hand-built 16-bit stereo file (downmixed to
    mono), chunk-walk past an extra LIST chunk, and rejection of
    malformed input."""
    import struct

    import numpy as np

    from polars_mas_spark.operators.multimodal import (
        decode_wav, wav_encode_pcm8,
    )

    # 8-bit mono round-trip.
    pcm = bytes([0, 64, 128, 192, 255])
    rate, s = decode_wav(wav_encode_pcm8(pcm, rate=44100))
    assert rate == 44100
    np.testing.assert_allclose(
        s, (np.frombuffer(pcm, np.uint8).astype(float) - 128.0) / 128.0
    )

    # 16-bit stereo with an extra LIST chunk between fmt and data;
    # channels downmix by mean: (1000, -1000) -> 0, (32767, 32767) -> ~1.
    frames = struct.pack("<4h", 1000, -1000, 32767, 32767)
    body = (
        b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, s = decode_wav(buf)
    assert rate == 16000 and s.size == 2
    assert s[0] == 0.0 and abs(s[1] - 32767.0 / 32768.0) < 1e-12

    # Rejections: not RIFF, truncated data chunk, compressed format.
    assert decode_wav(b"abcd") is None
    assert decode_wav(buf[:-2]) is None
    bad = buf.replace(
        struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16),
        struct.pack("<IHHIIHH", 16, 85, 2, 16000, 64000, 4, 16),  # mp3 tag
    )
    assert decode_wav(bad) is None


def test_netpbm_decoder_roundtrip_p5_p6_comments():
    """Pure-Python netpbm decoder: P5 round-trip through the matching
    encoder, P6 with header comments, truncated-raster rejection."""
    import numpy as np

    from polars_mas_spark.operators.multimodal import (
        decode_netpbm, netpbm_encode,
    )

    px = bytes(range(12))
    w, h, out = decode_netpbm(netpbm_encode(4, 3, px))
    assert (w, h) == (4, 3)
    np.testing.assert_array_equal(out, np.frombuffer(px, np.uint8))

    # P6 RGB (2x2 = 12 raster bytes) with comments inside the header.
    buf = b"P6 # rgb\n# another comment\n 2\t2\n255\n" + px
    w, h, out = decode_netpbm(buf)
    assert (w, h) == (2, 2) and out.size == 12

    assert decode_netpbm(b"P5\n4 3\n255\n" + px[:-1]) is None  # truncated
    assert decode_netpbm(b"P5\n0 3\n255\n") is None  # zero width
    assert decode_netpbm(b"JFIF....") is None


def test_real_decoders_through_spark(spark):
    """The wav/netpbm decoders through the full mapInPandas operators:
    real payloads decode to real features; a corrupt payload in the
    same batch degrades to a zeroed row instead of failing the scan."""
    import numpy as np

    from polars_mas_spark.operators.multimodal import (
        extract_audio_features, extract_image_features,
        netpbm_encode, wav_encode_pcm8,
    )

    pcm = bytes([128, 255, 0, 128])
    wav_rows = [(0, wav_encode_pcm8(pcm, rate=8000)), (1, b"not-audio")]
    adf = spark.createDataFrame(wav_rows, "doc_id long, content binary")
    aout = (
        extract_audio_features(adf, "doc_id", "content", decoder="wav")
        .toPandas().set_index("doc_id")
    )
    sig = (np.frombuffer(pcm, np.uint8).astype(float) - 128.0) / 128.0
    assert aout.loc[0, "sample_rate"] == 8000
    assert aout.loc[0, "n_samples"] == 4
    assert abs(aout.loc[0, "duration_s"] - 4 / 8000) < 1e-12
    assert abs(aout.loc[0, "rms"] - float(np.sqrt((sig**2).mean()))) < 1e-12
    assert aout.loc[1, "sample_rate"] == 0 and aout.loc[1, "rms"] == 0.0
    assert aout.loc[1, "n_bytes"] == len(b"not-audio")

    px = bytes([10, 20, 30, 40, 50, 60])
    img_rows = [(0, netpbm_encode(3, 2, px)), (1, b"\xff\xd8corrupt")]
    idf = spark.createDataFrame(img_rows, "doc_id long, content binary")
    iout = (
        extract_image_features(idf, "doc_id", "content", decoder="netpbm")
        .toPandas().set_index("doc_id")
    )
    assert (iout.loc[0, "width"], iout.loc[0, "height"]) == (3, 2)
    assert abs(iout.loc[0, "mean_byte"] - 35.0) < 1e-12
    assert iout.loc[1, "width"] == 0 and iout.loc[1, "mean_byte"] == 0.0


def test_image_ahash_neardup_planted(spark):
    """Perceptual near-dup on REAL 2-D images: an exact RGB re-encode
    pairs at hamming 0, a one-block perturbation at hamming 1, an
    inverted image and a corrupt payload never pair."""
    import numpy as np

    from polars_mas_spark.operators.multimodal import (
        image_ahash, image_neardup_pairs, netpbm_encode,
    )

    base = np.zeros((32, 32), np.uint8)
    base[:, 16:] = 255  # left half dark, right half bright
    pert = base.copy()
    pert[0:4, 0:4] = 255  # flips exactly aHash bit 0
    inv = 255 - base
    rgb = np.repeat(base[:, :, None], 3, axis=2)  # same image, P6
    rows = [
        (1, netpbm_encode(32, 32, base.tobytes())),
        (2, netpbm_encode(32, 32, pert.tobytes())),
        (3, netpbm_encode(32, 32, inv.tobytes())),
        (4, netpbm_encode(32, 32, rgb.tobytes(), rgb=True)),
        (5, b"\xff\xd8corrupt"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    hashes = {
        r.doc_id: r.ahash
        for r in image_ahash(df, "doc_id", "content").collect()
    }
    assert hashes[5] is None  # corrupt -> NULL, never an error
    assert hashes[1] == hashes[4]  # RGB luma proxy preserves the bits
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_neardup_pairs(
            df, "doc_id", "content", max_distance=3
        ).collect()
    }
    assert pairs[(1, 4)] == 0
    assert pairs[(1, 2)] == 1 and pairs[(2, 4)] == 1
    assert not any(3 in p or 5 in p for p in pairs)

    # Documented aHash property: constant images hash all-zero and
    # collide at hamming 0 whatever their level (blank-frame pairing).
    blank = [
        (10, netpbm_encode(32, 32, bytes([0]) * 1024)),
        (11, netpbm_encode(32, 32, bytes([200]) * 1024)),
    ]
    bdf = spark.createDataFrame(blank, "doc_id long, content binary")
    bh = {r.doc_id: r.ahash for r in image_ahash(bdf, "doc_id", "content").collect()}
    assert bh[10] == bh[11] == "0" * 16

    # grid > 8 regression: a uint64 shift vector wraps at 64 bits and
    # silently zeroed every higher bit (numpy wraparound), so a 10x10
    # grid hashed only its first 64 cells. The word-chunked packing
    # must place bit 99 (bright bottom-right at grid=10) in the high
    # nibbles, and the bright-half image must set high bits too.
    hi = {
        r.doc_id: r.ahash
        for r in image_ahash(df, "doc_id", "content", grid=10).collect()
    }
    assert len(hi[1]) == 25  # 100 bits -> 25 hex chars
    assert int(hi[1], 16) >> 64 != 0  # bits past 63 survive packing
    # bit i corresponds to nibble layout value 2^i: the right-bright
    # base image sets exactly the cells in columns 5..9 of every row.
    expect = sum(1 << (r * 10 + c) for r in range(10) for c in range(5, 10))
    assert int(hi[1], 16) == expect


def test_pillow_decoder_registry_and_error():
    """decoder='pillow' resolves from the registry; without Pillow
    installed the error names the missing optional package (the loud
    path an executor batch would hit)."""
    import pytest

    from polars_mas_spark.operators.multimodal import (
        IMAGE_DECODERS, decode_pillow,
    )

    assert IMAGE_DECODERS["pillow"] is decode_pillow
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="Pillow"):
            decode_pillow(b"\x89PNG\r\n\x1a\n")


def test_pillow_decoder_on_planted_images():
    """With Pillow present (optional), planted PNG/JPEG round-trip
    through the same (w, h, flat-px) contract as decode_netpbm and an
    exact re-encode pairs at hamming 0 through image_ahash."""
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    from polars_mas_spark.operators.multimodal import decode_pillow

    base = np.zeros((32, 32), np.uint8)
    base[:, 16:] = 255
    buf = io.BytesIO()
    PIL_Image.fromarray(base, mode="L").save(buf, format="PNG")
    d = decode_pillow(buf.getvalue())
    assert d is not None
    w, h, px = d
    assert (w, h) == (32, 32) and px.size == 32 * 32
    assert np.array_equal(px.reshape(32, 32), base)
    # RGB path: px flat size w*h*3
    rgb = np.repeat(base[:, :, None], 3, axis=2)
    buf2 = io.BytesIO()
    PIL_Image.fromarray(rgb, mode="RGB").save(buf2, format="PNG")
    d2 = decode_pillow(buf2.getvalue())
    assert d2 is not None and d2[2].size == 32 * 32 * 3
    assert decode_pillow(b"not an image") is None


def test_image_neardup_hot_cluster_cap(spark):
    """hot_cluster_cap bounds output on identical-hash mega-clusters
    (VERDICT r7 "What's wrong" #3): a planted 12-member cluster emits
    C(12,2)=66 pairs uncapped but exactly 11 representative links (min
    doc_id, hamming 0) at cap=8; small clusters stay fully enumerated
    and cross-hash near pairs route through the representative only."""
    import numpy as np

    from polars_mas_spark.operators.multimodal import (
        image_neardup_pairs, netpbm_encode,
    )

    base = np.zeros((32, 32), np.uint8)
    base[:, 16:] = 255
    pert = base.copy()
    pert[0:4, 0:4] = 255  # hamming 1 from base
    other = np.zeros((32, 32), np.uint8)
    other[:16, :] = 255  # a different hash family (top-bright)
    rows = [(i, netpbm_encode(32, 32, base.tobytes())) for i in range(12)]
    rows.append((100, netpbm_encode(32, 32, pert.tobytes())))
    rows += [
        (200, netpbm_encode(32, 32, other.tobytes())),
        (201, netpbm_encode(32, 32, other.tobytes())),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")

    uncapped = image_neardup_pairs(df, "doc_id", "content").collect()
    # 66 intra-mega + 12 mega-to-pert + 1 small-cluster pair
    assert len(uncapped) == 66 + 12 + 1

    capped = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_neardup_pairs(
            df, "doc_id", "content", hot_cluster_cap=8
        ).collect()
    }
    # 11 rep links + rep-to-pert + untouched small cluster = 13 rows
    assert len(capped) == 13
    assert all(capped[(0, m)] == 0 for m in range(1, 12))  # rep = min id
    assert capped[(0, 100)] == 1  # cross-hash pair via the rep only
    assert capped[(200, 201)] == 0  # sz=2 <= cap: exact enumeration
    # cap >= cluster size leaves everything exact (byte-identical path)
    exact = image_neardup_pairs(
        df, "doc_id", "content", hot_cluster_cap=12
    ).collect()
    assert sorted((r.doc_a, r.doc_b, r.hamming) for r in exact) == sorted(
        (r.doc_a, r.doc_b, r.hamming) for r in uncapped
    )


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


def test_repetition_signals_known_fractions(spark):
    """'a a b c' -> 4 words, dup 1/4, top word 2/4; bigrams
    ['a a','a b','b c'] all distinct -> top bigram 1/3."""
    from polars_mas_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in tx.repetition_signals(df, "doc_id", "text").collect()
    }
    assert rows[1].n_words == 4
    assert rows[1].dup_word_frac == 0.25
    assert rows[1].top_word_frac == 0.5
    assert abs(rows[1].top_bigram_frac - round(1 / 3, 6)) < 1e-9
    assert rows[2].n_words == 1 and rows[2].top_bigram_frac == 0.0
    assert rows[3].n_words == 0 and rows[3].dup_word_frac == 0.0


def test_pii_scrub_masks_all_three(spark):
    from polars_mas_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org see https://a.b/c?d=1 "
             "call +1 555 010-1234 done")],
        "doc_id long, text string",
    )
    out = tx.pii_scrub(df, "text").first().text
    assert out == "mail <EMAIL> see <URL> call <PHONE> done"


def test_quality_filter_per_rule_flags(spark):
    from polars_mas_spark.operators import text as tx

    good = "the cat and the dog went to the market in town " * 3  # 36 words
    short = "the cat"
    repeated = " ".join(["the"] * 40)  # dup frac 39/40 > 0.9
    df = spark.createDataFrame(
        [(1, good, "en"), (2, short, "en"), (3, repeated, "en"),
         (4, good, "de"), (5, "zz qq ww " * 10, "en")],
        "doc_id long, text string, lang string",
    )
    rows = {
        r.doc_id: r
        for r in tx.quality_filter(df, "doc_id", "text", lang_col="lang").collect()
    }
    assert rows[1].kept
    assert not rows[2].len_ok and not rows[2].kept
    assert not rows[3].rep_ok and not rows[3].kept
    assert not rows[4].lang_ok and not rows[4].kept
    assert not rows[5].stop_ok and not rows[5].kept


def test_corpus_source_stats(spark):
    from polars_mas_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "aaaa", "s1", "en"), (2, "bb", "s1", "de"), (3, "c", "s2", "en")],
        "doc_id long, text string, source string, lang string",
    )
    rows = {
        r.source: r
        for r in tx.corpus_source_stats(df, "source", "text", "lang").collect()
    }
    assert rows["s1"].n_docs == 2 and rows["s1"].total_chars == 6
    assert rows["s1"].avg_chars == 3.0 and rows["s1"].n_langs == 2
    assert rows["s2"].min_chars == rows["s2"].max_chars == 1


def test_token_histogram_counts_and_order(spark):
    from polars_mas_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "b a a"), (2, "a c B")], "doc_id long, text string"
    )
    rows = tx.token_histogram(df, "text", top_n=2).collect()
    assert [(r.token, r.n) for r in rows] == [("a", 3), ("b", 2)]


def test_tfidf_rare_term_wins(spark):
    """A term unique to one doc must outscore corpus-wide terms there."""
    from polars_mas_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "common rare"), (2, "common common x"), (3, "common y z")],
        "doc_id long, text string",
    )
    top = {
        r.doc_id: r.token
        for r in tx.tfidf_top_terms(df, "doc_id", "text", top_k=1).collect()
    }
    # equal tf=1 in doc 1: idf('rare')=ln(4/2)+1 > idf('common')=ln(4/4)+1
    assert top[1] == "rare"


def test_ngram_contamination_fraction(spark):
    from polars_mas_spark.operators import text as tx

    corpus = spark.createDataFrame(
        [(10, "the quick brown fox jumps"), (11, "entirely clean words here now")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "the quick brown fox")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in tx.ngram_contamination(corpus, bench, "doc_id", "text", n=3).collect()
    }
    # corpus doc 10 trigrams: 'the quick brown','quick brown fox','brown fox jumps'
    assert rows[10].n_grams == 3 and rows[10].n_contaminated == 2
    assert rows[10].contamination_frac == round(2 / 3, 6)
    assert rows[11].n_contaminated == 0


def test_heavy_hitter_ngrams_exact_counts(spark):
    """Sketch + exact-confirm equals the naive exact aggregate — on a
    sketch-ADVERSARIAL distribution (many distinct singletons pressure
    the Misra-Gries counters; the superset guarantee must still hold)
    and across the support-floor fallback and empty edges."""
    from pyspark.sql import functions as F

    from polars_mas_spark.operators import text as tx

    rows = [(i, f"unique filler {i} noise {i * 7} pad {i * 13}") for i in range(300)]
    rows += [(1000 + i, "accept all cookies now please friend") for i in range(40)]
    rows += [(2000 + i, "click here to subscribe today") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    got = {
        r.ngram: r.cnt
        for r in tx.heavy_hitter_ngrams(df, "text", n=3, min_count=20).collect()
    }
    naive = {
        r.ngram: r.cnt
        for r in tx._ngram_stream(df, "text", 3)
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 20)
        .collect()
    }
    assert got == naive
    assert got["accept all cookies"] == 40 and got["click here to"] == 25
    assert all(c >= 20 for c in got.values())

    # min_count above the stream total -> empty, stable schema
    empty = tx.heavy_hitter_ngrams(df, "text", n=3, min_count=10**9)
    assert empty.columns == ["ngram", "cnt"] and empty.count() == 0

    # support-floor fallback: needs (min_count - 0.5)/total < 1e-4, so
    # inflate the corpus past 5000 trigrams (the original fixture's
    # ~1.7k total would silently take the SKETCH path at min_count=1 —
    # review r12 caught exactly that)
    big = spark.createDataFrame(
        rows + [(10_000 + i, f"bulk {i} filler {i * 3} pad {i * 11} row")
                for i in range(1200)],
        "doc_id long, text string",
    ).repartition(8)
    total = tx._ngram_stream(big, "text", 3).count()
    assert (1 - 0.5) / total < 1e-4  # genuinely on the fallback branch
    low = {
        r.ngram: r.cnt
        for r in tx.heavy_hitter_ngrams(big, "text", n=3, min_count=1).collect()
    }
    assert low["accept all cookies"] == 40
    assert sum(low.values()) == total

    # min_frac: the scale-free threshold — ceil(frac * total), exact
    frac = 20 / total
    by_frac = {
        r.ngram: r.cnt
        for r in tx.heavy_hitter_ngrams(df, "text", n=3, min_frac=frac).collect()
    }
    assert by_frac == naive

    import pytest

    with pytest.raises(ValueError):
        tx.heavy_hitter_ngrams(df, "text", n=3)  # neither threshold
    with pytest.raises(ValueError):
        tx.heavy_hitter_ngrams(df, "text", n=3, min_count=5, min_frac=0.5)
    with pytest.raises(ValueError):
        tx.heavy_hitter_ngrams(df, "text", n=3, min_frac=1e-5)  # under floor


def test_winnow_pairs_detects_shared_substring(spark):
    """Two docs sharing a long substring must pair; unrelated must not."""
    from polars_mas_spark.operators.text import winnow_pairs

    shared = "the identical shared substring block"
    df = spark.createDataFrame(
        [(1, "prefix one " + shared), (2, shared + " suffix two"),
         (3, "completely different content here")],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b) for r in
             winnow_pairs(df, "doc_id", "text", min_shared=2).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


# ---------------------------------------------------------------------------
# chunk_dedup (C4-style repeated-span removal)
# ---------------------------------------------------------------------------


def test_chunk_dedup_removes_later_occurrence(spark):
    from polars_mas_spark.operators.dedup import chunk_dedup

    span = "a b c d e f g h i j"  # exactly one 10-word chunk
    df = spark.createDataFrame(
        [(1, span + " unique tail words here now ok yes no maybe end"),
         (2, span),  # doc 2 is exactly the duplicated span
         (3, "completely different words that survive entirely fine")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["text_dedup"] for r in chunk_dedup(df, "doc_id", "text").collect()}
    assert out[1].startswith(span)          # first occurrence kept
    assert out[2] == ""                     # later occurrence deleted
    assert out[3].startswith("completely")  # untouched


def test_chunk_dedup_keeps_all_docs_and_is_idempotent(spark):
    from polars_mas_spark.operators.dedup import chunk_dedup

    df = spark.createDataFrame(
        [(1, "x " * 25), (2, "x " * 25), (3, "")], ["doc_id", "text"]
    )
    once = chunk_dedup(df, "doc_id", "text")
    assert once.count() == 3  # empty/fully-deduped docs still present
    again = chunk_dedup(
        once.withColumnRenamed("text_dedup", "text"), "doc_id", "text"
    )
    # within-doc repeated chunks collapse on the first pass...
    first = {r["doc_id"]: r["text_dedup"] for r in once.collect()}
    second = {r["doc_id"]: r["text_dedup"] for r in again.collect()}
    # ...and a second pass changes nothing
    assert first == second


def test_span_dedup_cross_alignment_recall(spark):
    """span_dedup removes a repeated span REGARDLESS of word alignment
    — the Lee et al. 2022 granularity chunk_dedup's fixed grid misses.
    The same 10-word span sits at offset 0 in doc 1, offset 3 in doc 2,
    and offset 7 in doc 3: chunk_dedup (k=10) sees three DIFFERENT
    chunk sets and removes nothing; span_dedup keeps only doc 1's copy."""
    from polars_mas_spark.operators.dedup import chunk_dedup, span_dedup

    span = "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9"
    rows = [
        (1, span + " tail1 tail2 tail3"),
        (2, "p0 p1 p2 " + span + " u1 u2"),
        (3, "q0 q1 q2 q3 q4 q5 q6 " + span),
        (4, "clean words only nothing repeated here at all today fine ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    chunked = {
        r["doc_id"]: r["text_dedup"]
        for r in chunk_dedup(df, "doc_id", "text", k=10).collect()
    }
    # The misaligned copies hide from the fixed chunk grid entirely.
    for i, t in rows:
        assert chunked[i] == t

    spanned = {
        r["doc_id"]: r["text_dedup"]
        for r in span_dedup(df, "doc_id", "text", k=10).collect()
    }
    assert spanned[1] == span + " tail1 tail2 tail3"  # first occurrence kept
    assert spanned[2] == "p0 p1 p2 u1 u2"             # span excised mid-doc
    assert spanned[3] == "q0 q1 q2 q3 q4 q5 q6"       # span excised at tail
    assert spanned[4] == rows[3][1]                   # clean doc untouched


def test_span_dedup_overlong_span_and_short_docs(spark):
    """A repeated span LONGER than k is removed in full (every stride-1
    window marks its cover); docs shorter than k words emit no windows
    and pass through whitespace-normalized; empty/None-like docs come
    back as ''."""
    from polars_mas_spark.operators.dedup import span_dedup

    long_span = " ".join(f"w{i}" for i in range(15))  # 15 words, k=10
    rows = [
        (1, "intro " + long_span),
        (2, long_span + " outro"),
        (3, "tiny doc under k words"),
        (4, "  spaced   out   tiny  "),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["text_dedup"]
        for r in span_dedup(df, "doc_id", "text", k=10).collect()
    }
    assert out[1] == "intro " + long_span  # global first occurrence
    assert out[2] == "outro"               # all 15 span words removed
    assert out[3] == "tiny doc under k words"
    assert out[4] == "spaced out tiny"     # normalized, untouched
    assert out[5] == ""


def test_incremental_minhash_dedup_cross_batch(spark):
    """Cross-batch near-dup semantics: an exact copy of an accepted doc
    is dropped (all bands collide), a fresh doc with disjoint vocabulary
    survives, within-batch duplicate pairs keep their min-id member,
    and a doc near-identical to an accepted one (same token SET) drops
    even though its digest differs — the case incremental_exact_dedup
    cannot catch."""
    from polars_mas_spark.operators.dedup import incremental_minhash_dedup

    seen = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),  # exact copy of seen 1
            (11, "theta eta zeta epsilon delta gamma beta alpha alpha"),  # same token set as seen 1
            (12, "totally fresh unrelated vocabulary words here now"),
            (13, "totally fresh unrelated vocabulary words here now"),  # within-batch dup of 12
            (14, "kappa lambda mu nu xi omicron pi rho sigma"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id
        for r in incremental_minhash_dedup(
            new, seen, "doc_id", "text", num_hashes=16, bands=4, rows_per_band=4
        ).collect()
    }
    assert 10 not in out           # exact cross-batch copy dropped
    assert 11 not in out           # token-set twin dropped (near-dup, not exact)
    assert 12 in out and 13 not in out  # within-batch: min id kept
    assert 14 in out               # genuinely new content survives


def test_incremental_dedup_drops_seen_digests(spark):
    from polars_mas_spark.operators.dedup import incremental_exact_dedup

    seen = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma"), (12, "gamma"), (13, "beta")],
        ["doc_id", "text"],
    )
    out = sorted(
        r["doc_id"]
        for r in incremental_exact_dedup(new, seen, "doc_id", "text").collect()
    )
    # alpha/beta already seen; gamma collapses to its min id
    assert out == [11]



def test_passage_split_windows_and_overlap(spark):
    from polars_mas_spark.operators.text import passage_split

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "short doc"), (3, "")],
                               ["doc_id", "text"])
    out = passage_split(df, "doc_id", "text", max_words=64, overlap=16)
    rows = {(r["doc_id"], r["passage_idx"]): r for r in out.collect()}
    # doc 1: starts at words 1, 49 -> passages of 64 and 52 words; the
    # start at word 97 is fully contained in the second passage (words
    # 49-100) and is dropped (r4 subsumption fix).
    assert [rows[(1, i)]["n_words"] for i in range(2)] == [64, 52]
    assert (1, 2) not in rows
    p0, p1 = rows[(1, 0)]["passage"].split(), rows[(1, 1)]["passage"].split()
    assert p0[48:] == p1[:16]  # consecutive passages share the overlap
    assert rows[(2, 0)]["n_words"] == 2
    assert (3, 0) not in rows  # empty docs emit nothing

    import pytest as _pytest
    with _pytest.raises(ValueError):
        passage_split(df, "doc_id", "text", max_words=16, overlap=16)


def test_distinct_profile_hll_within_tolerance(spark):
    from pyspark.sql import functions as F

    from polars_mas_spark.operators.profile import distinct_profile

    df = spark.range(0, 20_000).select(
        (F.col("id") % 1000).alias("k1k"),
        (F.col("id") % 37).alias("k37"),
        F.col("id").alias("uniq"),
    )
    approx = {r["column"]: r["n_distinct"]
              for r in distinct_profile(df).collect()}
    exact = {r["column"]: r["n_distinct"]
             for r in distinct_profile(df, exact=True).collect()}
    assert exact == {"k1k": 1000, "k37": 37, "uniq": 20_000}
    for c in exact:
        assert abs(approx[c] - exact[c]) / exact[c] < 0.05, (c, approx[c])


def test_banding_mismatch_rejected(spark):
    """Review r4: bands*rows_per_band > num_hashes used to slice empty
    signature bands, giving every doc the md5('') bucket and silently
    deleting nearly the whole corpus. Must raise instead."""
    import pytest
    from polars_mas_spark.operators import dedup as dd

    df = spark.createDataFrame([(1, "a b c"), (2, "d e f")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exceeds num_hashes"):
        dd.minhash_dedup(df, "doc_id", "text", num_hashes=16, bands=8, rows_per_band=4)
    with pytest.raises(ValueError, match="exceeds num_hashes"):
        dd.minhash_dedup_cc(df, "doc_id", "text", num_hashes=8, bands=4, rows_per_band=4)


def test_connected_min_labels_huge_ids(spark):
    """Review r4: the old sum(label) convergence probe overflowed bigint
    for hash-sized ids under ANSI mode. Labels must converge correctly
    for ids near Long.MAX."""
    from polars_mas_spark.operators.dedup import connected_min_labels

    big = 9_200_000_000_000_000_000  # ~Long.MAX (9.22e18)
    pairs = spark.createDataFrame(
        [(big, big + 5), (big + 5, big + 11), (big + 20, big + 22)],
        "doc_a long, doc_b long",
    )
    labels = {r["doc_id"]: r["label"] for r in connected_min_labels(pairs).collect()}
    assert labels == {
        big: big, big + 5: big, big + 11: big,
        big + 20: big + 20, big + 22: big + 20,
    }


def test_exact_dedup_null_text_passthrough(spark):
    """Review r4: NULL content has no digest and must never be grouped
    as 'duplicates' — all NULL-text rows pass through, consistent with
    incremental_exact_dedup's anti-join semantics."""
    from polars_mas_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, "other")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in exact_dedup(df, "doc_id", "text").collect())
    assert kept == [1, 3, 4, 5]


def test_word_shingles_whitespace_padding(spark):
    """Review r4: leading/trailing whitespace must not produce corrupt
    shingles containing empty tokens — ' a b c' and 'a b c' shingle
    identically."""
    from polars_mas_spark.operators.dedup import word_shingles

    df = spark.createDataFrame(
        [(1, " a b c"), (2, "a b c "), (3, "a  b c")],
        "doc_id long, text string",
    )
    rows = word_shingles(df, "doc_id", "text", n=3).collect()
    assert {(r["doc_id"], r["shingle"]) for r in rows} == {
        (1, "a b c"), (2, "a b c"), (3, "a b c"),
    }


def test_jaccard_empty_tokens_excluded(spark):
    """Review r4: '' from padded text must not enter the word sets —
    'a b ' vs ' c d' share nothing, jaccard has no pair above 0."""
    from polars_mas_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [(1, "a b "), (2, " c d")], "doc_id long, text string"
    )
    out = jaccard_pairs(df, "doc_id", "text", threshold=0.01,
                        length_tolerance=1.0).collect()
    assert out == []


def test_jaccard_length_band_lossless_and_symmetric(spark):
    """Review r10: the default length band must be LOSSLESS at the
    requested threshold (J <= min/max, so min >= t*max admits every
    possible >=t pair) and symmetric in id assignment. A containment
    pair with |A|=4 ⊂ |B|=5 has J=0.8 exactly — the old smaller-id-
    anchored 1.2x band dropped it; both id orders must now find it."""
    from polars_mas_spark.operators.dedup import jaccard_pairs

    small = "w1 w2 w3 w4"
    big = "w1 w2 w3 w4 w5"
    for rows in ([(1, small), (2, big)], [(1, big), (2, small)]):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = jaccard_pairs(df, "doc_id", "text", threshold=0.8).collect()
        assert [(r.doc_a, r.doc_b, r.jaccard) for r in out] == [(1, 2, 0.8)], rows
    # just below the lossless band (4 vs 6 -> max possible J = 2/3):
    # pruned by the band AND truly below threshold — no false negative
    df = spark.createDataFrame(
        [(1, small), (2, "w1 w2 w3 w4 w5 w6")], "doc_id long, text string"
    )
    assert jaccard_pairs(df, "doc_id", "text", threshold=0.8).collect() == []


def test_ngram_contamination_reports_short_docs(spark):
    """Review r4: documents shorter than n words must appear in the
    report with n_grams=0 rather than silently vanishing."""
    from polars_mas_spark.operators.text import ngram_contamination

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "tiny")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in
            ngram_contamination(corpus, bench, "doc_id", "text", n=3).collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["n_grams"] == 0
    assert rows[2]["n_contaminated"] == 0
    assert rows[2]["contamination_frac"] == 0.0
    assert rows[1]["n_grams"] == 2 and rows[1]["n_contaminated"] == 1


def test_passage_split_no_subsumed_tail(spark):
    """Review r4: a doc of exactly max_words words must emit ONE
    passage; trailing windows fully contained in the previous passage
    are dropped."""
    from polars_mas_spark.operators.text import passage_split

    text64 = " ".join(f"w{i}" for i in range(64))
    text65 = " ".join(f"w{i}" for i in range(65))
    text100 = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, text64), (2, text65), (3, text100)], "doc_id long, text string"
    )
    out = passage_split(df, "doc_id", "text", max_words=64, overlap=16)
    rows = [(r["doc_id"], r["passage_idx"], r["n_words"]) for r in out.collect()]
    by_doc = {}
    for d, i, n in rows:
        by_doc.setdefault(d, []).append((i, n))
    assert by_doc[1] == [(0, 64)]              # no subsumed second passage
    assert by_doc[2] == [(0, 64), (1, 17)]     # word 65 is new content
    assert by_doc[3] == [(0, 64), (1, 52)]     # 49..100; start 97 subsumed


def test_topk_per_group_contract(spark):
    """Review r4: tiebreak_col is required (nondeterministic top-k under
    ties otherwise) and a pre-existing rank column must not be silently
    clobbered."""
    import pytest
    from polars_mas_spark.operators.windows import topk_per_group

    df = spark.createDataFrame(
        [(1, 5.0, 10), (1, 5.0, 11), (1, 4.0, 12)],
        "g long, v double, id long",
    )
    with pytest.raises(ValueError, match="tiebreak_col"):
        topk_per_group(df, "g", "v", k=1)
    top = topk_per_group(df, "g", "v", k=1, tiebreak_col="id").collect()
    assert [(r["g"], r["id"]) for r in top] == [(1, 10)]
    with pytest.raises(ValueError, match="already exists"):
        topk_per_group(
            df.withColumnRenamed("id", "rank"), "g", "v", k=1, tiebreak_col="rank"
        )


def test_asof_join_colliding_value_column(spark):
    """Review r4: a right value column named like a left column must be
    suffixed _right, not emitted as a duplicate name."""
    from pyspark.sql import functions as F
    from polars_mas_spark.operators.windows import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100.0)], "id long, ts long, price double"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    right = spark.createDataFrame(
        [(1, 5, 99.0)], "id long, ts2 long, price double"
    ).withColumn("ts2", F.timestamp_seconds("ts2"))
    out = asof_join(left, right, on="id", left_ts="ts", right_ts="ts2")
    assert out.columns == ["id", "ts", "price", "asof_ts2", "price_right"]
    row = out.collect()[0]
    assert row["price"] == 100.0 and row["price_right"] == 99.0


def test_model_quality_score_matches_python(spark):
    """The hashing-trick scorer must reproduce a direct Python
    computation: same md5 buckets, same weight gather, same mean/sigmoid
    — plus the empty-document logit = bias contract."""
    import hashlib
    import math

    from polars_mas_spark.operators.text import model_quality_score

    weights = [round(0.01 * i - 1.0, 6) for i in range(256)]
    rows = [
        (1, "the cat sat on the mat"),
        (2, "  weird   spacing\ttabs "),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in model_quality_score(
            df, "doc_id", "text", weights=weights, bias=0.25
        ).collect()
    }

    def bucket(tok):
        return int(hashlib.md5(("qmodel" + tok).encode()).hexdigest()[:8], 16) % 256

    for doc_id, text in rows:
        toks = [t for t in (text or "").lower().split() if t]
        logit = 0.25 + (
            sum(weights[bucket(t)] for t in toks) / len(toks) if toks else 0.0
        )
        score = 1.0 / (1.0 + math.exp(-logit))
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        assert abs(r.logit - round(logit, 6)) < 1e-9, (doc_id, r.logit, logit)
        assert abs(r.model_score - round(score, 6)) < 1e-9
        assert r.kept == (score >= 0.5)


def test_model_quality_score_validates_weights(spark):
    import pytest as _pytest

    from polars_mas_spark.operators.text import model_quality_score

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="expected n_buckets"):
        model_quality_score(df, "doc_id", "text", weights=[0.1, 0.2])


def test_cohort_retention_matrix(spark):
    """Hand-built events: user 1 joins week of 2024-01-01 and returns
    two weeks later; user 2 joins the same week, never returns; user 3
    joins the next week. Matrix cells must count distinct users at each
    (cohort_week, week_age)."""
    import datetime

    from polars_mas_spark.operators.windows import cohort_retention

    rows = [
        (1, datetime.datetime(2024, 1, 2, 10)),   # cohort wk 2024-01-01
        (1, datetime.datetime(2024, 1, 16, 9)),   # age 2
        (2, datetime.datetime(2024, 1, 4, 8)),    # cohort wk 2024-01-01
        (3, datetime.datetime(2024, 1, 10, 12)),  # cohort wk 2024-01-08
        (3, datetime.datetime(2024, 1, 11, 12)),  # same week: one cell
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort_week), r.week_age): r.n_users
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }, got


def test_funnel_analysis_ordering_and_window(spark):
    """Hand-built funnel: user 1 completes view->click->purchase in
    order; user 2 clicks BEFORE viewing (click must not count); user 3
    views then clicks outside the window."""
    import datetime as dt

    from polars_mas_spark.operators.windows import funnel_analysis

    t0 = dt.datetime(2024, 3, 1, 12)

    def at(**kw):
        return t0 + dt.timedelta(**kw)

    rows = [
        (1, at(minutes=0), "view"),
        (1, at(minutes=5), "click"),
        (1, at(minutes=9), "purchase"),
        (2, at(minutes=0), "click"),       # before any view
        (2, at(minutes=10), "view"),
        (3, at(minutes=0), "view"),
        (3, at(days=8), "click"),          # outside 7-day window
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.step: (r.event_type, r.n_users)
        for r in funnel_analysis(
            df, "user_id", "ts", "event_type",
            ["view", "click", "purchase"], window_seconds=604800,
        ).collect()
    }
    assert got == {
        1: ("view", 3),
        2: ("click", 1),
        3: ("purchase", 1),
    }, got


def test_fuzzy_pairs_exact_vs_python_dp(spark):
    """fuzzy_pairs must equal the brute-force DP levenshtein pair set —
    including short strings below the q-gram lemma threshold that share
    NO gram ('ab'/'cd' at d=2) and boundary long/short pairs."""
    from polars_mas_spark.operators.dedup import fuzzy_pairs

    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    texts = {
        1: "ab", 2: "cd", 3: "abc", 4: "abcd", 5: "abcdef",
        6: "abcdeg", 7: "xyzzy", 8: "", 9: "a", 10: "abzdef",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    for d in (1, 2):
        expect = {
            (a, b, lev(texts[a], texts[b]))
            for a in texts for b in texts
            if a < b and lev(texts[a], texts[b]) <= d
        }
        got = {
            (r.id_a, r.id_b, r.distance)
            for r in fuzzy_pairs(df, "doc_id", "text", max_distance=d).collect()
        }
        assert got == expect, (d, got ^ expect)


def test_pivot_report_explicit_values_contract(spark):
    """Unlisted pivot values vanish (stable schema); empty cells count 0
    with NULL sum."""
    from polars_mas_spark.operators.olap import pivot_report

    df = spark.createDataFrame(
        [(1, "view", 2.0), (1, "view", 3.0), (1, "rogue", 9.0),
         (2, "click", 1.5)],
        "user_id long, event_type string, value double",
    )
    out = {
        r.user_id: r
        for r in pivot_report(
            df, "user_id", "event_type", "value", ["view", "click"]
        ).collect()
    }
    assert out[1].view_n == 2 and out[1].view_sum == 5.0
    assert out[1].click_n == 0 and out[1].click_sum is None
    assert out[2].click_n == 1 and out[2].click_sum == 1.5
    assert "rogue_n" not in out[1].asDict()


def test_scd2_merge_semantics(spark):
    """Hand-built SCD2: no-op first update ignored, consecutive dups
    collapse, chains close correctly, new keys build history, untouched
    keys pass through, NULL-attr first update on a NEW key survives."""
    import datetime

    from polars_mas_spark.operators.scd import scd2_merge

    d = datetime.date
    cur = spark.createDataFrame(
        [(1, "A", d(2020, 1, 1), None),
         (2, "B", d(2020, 1, 1), None),
         (3, "C", d(2019, 1, 1), d(2020, 1, 1)),   # already closed
         (3, "D", d(2020, 1, 1), None)],
        "k long, seg string, effective_from date, effective_to date",
    )
    upd = spark.createDataFrame(
        [(1, d(2021, 1, 1), "A"),     # no-op vs open -> ignored
         (1, d(2021, 6, 1), "X"),     # real change
         (1, d(2021, 9, 1), "X"),     # consecutive dup -> collapsed
         (1, d(2021, 12, 1), "Y"),    # second change
         (4, d(2022, 1, 1), None),    # NEW key, NULL attr first update
         (4, d(2022, 3, 1), "Z")],
        "k long, ts date, seg string",
    )
    rows = {
        (r.k, r.seg, str(r.effective_from)): (
            str(r.effective_to) if r.effective_to else None
        )
        for r in scd2_merge(cur, upd, "k", ["seg"], "ts").collect()
    }
    assert rows == {
        (1, "A", "2020-01-01"): "2021-06-01",
        (1, "X", "2021-06-01"): "2021-12-01",
        (1, "Y", "2021-12-01"): None,
        (2, "B", "2020-01-01"): None,
        (3, "C", "2019-01-01"): "2020-01-01",
        (3, "D", "2020-01-01"): None,
        (4, None, "2022-01-01"): "2022-03-01",
        (4, "Z", "2022-03-01"): None,
    }, rows


def test_scd2_merge_rejects_stale_update(spark):
    """An update older than the open version's effective_from must FAIL
    the job (ADVICE r4): closing the open row before it opened would
    build an inverted interval that no point-in-time lookup matches —
    i.e. silently erase the key's pre-update history."""
    import datetime

    import pytest as _pytest

    from polars_mas_spark.operators.scd import scd2_merge

    d = datetime.date
    cur = spark.createDataFrame(
        [(1, "A", d(2020, 6, 1), None)],
        "k long, seg string, effective_from date, effective_to date",
    )
    upd = spark.createDataFrame(
        [(1, d(2020, 1, 1), "B")],  # predates the open version
        "k long, ts date, seg string",
    )
    with _pytest.raises(Exception, match="precedes the open version"):
        scd2_merge(cur, upd, "k", ["seg"], "ts").collect()


def test_scd2_lookup_point_in_time(spark):
    """Facts pick up the version valid AT their ts: boundary fact at a
    version's from-date gets that version; facts before the first
    version stay unmatched (NULL attrs)."""
    import datetime

    from polars_mas_spark.operators.scd import scd2_lookup

    d = datetime.date
    dim = spark.createDataFrame(
        [(1, "A", d(2020, 1, 1), d(2021, 1, 1)),
         (1, "B", d(2021, 1, 1), None)],
        "k long, seg string, effective_from date, effective_to date",
    )
    facts = spark.createDataFrame(
        [(10, 1, d(2019, 6, 1)),   # predates history -> NULL
         (11, 1, d(2020, 6, 1)),   # inside A
         (12, 1, d(2021, 1, 1)),   # boundary: B starts, A ends (to excl)
         (13, 2, d(2022, 1, 1))],  # unknown key -> NULL
        "fid long, k long, ts date",
    )
    got = {r.fid: r.seg for r in scd2_lookup(facts, dim, "k", "ts").collect()}
    assert got == {10: None, 11: "A", 12: "B", 13: None}, got


def test_scd2_interval_partition_property(spark):
    """Hypothesis-style invariant on a pseudo-random update stream: per
    key, merged intervals are disjoint, chained (each to == next from),
    exactly one open version, and consecutive versions differ."""
    import datetime
    import random

    from polars_mas_spark.operators.scd import scd2_merge

    rng = random.Random(17)
    base = datetime.date(2020, 1, 1)
    cur_rows = [
        (k, rng.choice("ABC"), base, None) for k in range(1, 9)
    ]
    upd_rows = []
    for k in range(1, 12):  # keys 9-11 are new
        days = sorted(rng.sample(range(1, 400), rng.randint(1, 8)))
        for day in days:
            upd_rows.append(
                (k, base + datetime.timedelta(days=day), rng.choice("ABCD"))
            )
    cur = spark.createDataFrame(
        cur_rows, "k long, seg string, effective_from date, effective_to date"
    )
    upd = spark.createDataFrame(upd_rows, "k long, ts date, seg string")
    out = scd2_merge(cur, upd, "k", ["seg"], "ts").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    assert set(by_key) == set(range(1, 12))
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r.effective_from)
        opens = [r for r in rows if r.effective_to is None]
        assert len(opens) == 1 and opens[0] is rows[-1], (k, rows)
        for a, b in zip(rows, rows[1:]):
            assert a.effective_to == b.effective_from, (k, a, b)
            assert a.seg != b.seg, (k, a, b)  # no zero-change versions


def test_char_trigram_scores_math(spark):
    """Hand-computed LM on a two-doc corpus: counts, smoothing, unseen
    floor, and the short-doc (0, NULL, NULL) contract."""
    import math
    from collections import Counter

    from polars_mas_spark.operators.text import char_trigram_scores

    texts = {1: "ababab", 2: "abcd", 3: "xy"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in char_trigram_scores(df, "doc_id", "text").collect()
    }
    # Corpus model (doc 3 contributes nothing: < 3 chars).
    tris = []
    for t in texts.values():
        tris += [t[i:i + 3] for i in range(len(t) - 2)]
    tc = Counter(tris)
    cc = Counter()
    for tri, c in tc.items():
        cc[tri[:2]] += c
    for doc_id, t in texts.items():
        doc_tris = [t[i:i + 3] for i in range(len(t) - 2)]
        if not doc_tris:
            assert got[doc_id].n_trigrams == 0
            assert got[doc_id].nll_mean is None and got[doc_id].ppl is None
            continue
        nll = sum(
            -math.log((tc[x] + 0.5) / (cc[x[:2]] + 128.0)) for x in doc_tris
        ) / len(doc_tris)
        assert got[doc_id].n_trigrams == len(doc_tris)
        assert abs(got[doc_id].nll_mean - nll) < 1e-9, (doc_id, nll)
        assert abs(got[doc_id].ppl - math.exp(nll)) < 1e-6
    # Repetitive text must be more predictable than one-off trigrams.
    assert got[1].nll_mean < got[2].nll_mean


def test_leakage_safe_split_keeps_neardups_together(spark):
    """Planted near-duplicates must land on the SAME split side (they
    share an LSH component), while the split itself matches the keyed
    hash of the component label."""
    from polars_mas_spark.operators.dedup import minhash_component_labels
    from polars_mas_spark.operators.sampling import train_eval_split

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from every hunter"
    )
    rows = [(1, base), (2, base + " extra"), (3, "completely different "
            "words about cooking pasta with tomato sauce and basil")]
    # Pad with distinct filler docs so buckets aren't degenerate.
    rows += [(10 + i, f"filler document number {i} with unique content "
              f"token{i} token{i + 1} token{i + 2}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    labels = minhash_component_labels(
        df, "doc_id", "text", num_hashes=16, bands=8, rows_per_band=2
    )
    out = {r.doc_id: (r.label, r.split)
           for r in train_eval_split(labels, "label", eval_fraction=0.3)
           .collect()}
    assert out[1][0] == out[2][0] == 1          # same component
    assert out[1][1] == out[2][1]               # -> same side, by key
    assert out[3][0] == 3                       # singleton labels itself
    assert len(out) == 33                       # every doc labeled


def test_netpbm_rejects_comment_after_maxval():
    """Review r5: the header tokenizer also stops at '#', so a comment
    between maxval and the raster must be rejected as malformed, not
    read as pixel bytes."""
    from polars_mas_spark.operators.multimodal import decode_netpbm

    px = bytes(range(12))
    assert decode_netpbm(b"P5\n4 3\n255# comment\n" + px) is None
    # the legitimate single-whitespace form still decodes
    assert decode_netpbm(b"P5\n4 3\n255\n" + px) is not None


def test_resample_interpolate_linear_and_edges(spark):
    """Interior gaps interpolate linearly on the grid; leading/trailing
    gaps clamp to the nearest observation; multiple points in one
    bucket average; independent keys never bleed into each other."""
    import datetime as dt

    from polars_mas_spark.operators.windows import resample_interpolate

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 5), 10.0),
        ("a", dt.datetime(2024, 1, 1, 0, 40), 30.0),   # same bucket: avg 20
        ("a", dt.datetime(2024, 1, 1, 3, 10), 50.0),
        ("b", dt.datetime(2024, 1, 1, 1, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r.k, r.bucket_ts.hour): (r.value, r.interpolated)
        for r in resample_interpolate(df, "k", "ts", "v", 3600).collect()
    }
    assert out[("a", 0)] == (20.0, False)
    assert out[("a", 1)] == (30.0, True)   # 20 + (50-20)*1/3
    assert out[("a", 2)] == (40.0, True)
    assert out[("a", 3)] == (50.0, False)
    assert out[("b", 1)] == (5.0, False)
    assert len(out) == 5  # b's spine is a single bucket — no bleed


def test_quantile_profile_exact_vs_approx(spark):
    """Exact mode reproduces the closed-form interpolated percentile;
    approx mode (the 100 TB path) lands within the sketch's rank
    tolerance of the exact answer; grouped mode keys rows correctly."""
    from pyspark.sql import functions as F

    from polars_mas_spark.operators.profile import quantile_profile

    df = spark.range(1000).select(
        (F.col("id") % 2).alias("g"),
        F.col("id").cast("double").alias("x"),
    )
    exact = {
        (r.column, r.q): r.value
        for r in quantile_profile(df, ["x"], [0.5, 0.9], exact=True).collect()
    }
    assert exact[("x", 0.5)] == 499.5
    assert exact[("x", 0.9)] == 899.1
    approx = {
        (r.column, r.q): r.value
        for r in quantile_profile(df, ["x"], [0.5, 0.9]).collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) <= 2.0  # rank error 1e-4 * n=1000 << 2
    grouped = {
        (r.g, r.q): r.value
        for r in quantile_profile(
            df, ["x"], [0.5], group_col="g", exact=True
        ).collect()
    }
    assert grouped[(0, 0.5)] == 499.0 and grouped[(1, 0.5)] == 500.0


def test_weighted_sample_n_contract(spark):
    """Deterministic across runs, excludes non-positive/NULL weights,
    returns exactly n rows, and skews toward heavy weights."""
    import pytest as pt
    from pyspark.sql import functions as F

    from polars_mas_spark.operators.sampling import weighted_sample_n

    df = spark.range(2000).select(
        "id",
        F.when(F.col("id") % 100 == 0, None)
        .when(F.col("id") % 100 == 1, -1.0)
        .otherwise((F.col("id") % 10 + 1).cast("double"))
        .alias("w"),
    )
    a = sorted(r.id for r in weighted_sample_n(df, "id", "w", 300).collect())
    b = sorted(r.id for r in weighted_sample_n(df, "id", "w", 300).collect())
    assert a == b and len(a) == 300
    assert not any(i % 100 in (0, 1) for i in a)  # excluded weights
    # Different salt: a decorrelated (different) sample.
    c = sorted(
        r.id for r in weighted_sample_n(df, "id", "w", 300, salt="s2").collect()
    )
    assert c != a
    # Expected mean weight under w-proportional sampling is
    # E[w^2]/E[w] = 7 for w uniform on 1..10, vs population mean 5.5.
    mean_w = (
        spark.createDataFrame([(i,) for i in a], "id long")
        .join(df, "id")
        .agg(F.avg("w"))
        .first()[0]
    )
    assert mean_w > 6.0
    with pt.raises(ValueError, match="positive"):
        weighted_sample_n(df, "id", "w", 0)


def test_event_transitions_counts_and_rowwise_probs(spark):
    """Transitions counted per user in (ts, tiebreak) order; prob
    normalizes within from_type; first event per user contributes no
    transition."""
    import datetime as dt

    import pytest

    from polars_mas_spark.operators.windows import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i, e in enumerate(["a", "b", "a", "c"]):      # u1: a>b, b>a, a>c
        rows.append((1, t0 + dt.timedelta(minutes=i), i, e))
    for i, e in enumerate(["a", "b"]):                # u2: a>b
        rows.append((2, t0 + dt.timedelta(minutes=i), 10 + i, e))
    df = spark.createDataFrame(rows, "u long, ts timestamp, eid long, e string")
    out = {
        (r.from_type, r.to_type): (r.n, r.prob)
        for r in event_transitions(df, "u", "ts", "e", "eid").collect()
    }
    assert out[("a", "b")] == (2, pytest.approx(2 / 3))
    assert out[("a", "c")] == (1, pytest.approx(1 / 3))
    assert out[("b", "a")] == (1, pytest.approx(1.0))
    assert len(out) == 3


def test_window_paths_deterministic_under_duplicate_keys(spark):
    """The flap class CLAUDE.md documents: generated data has produced
    duplicate 'unique' keys before (lineitem), so session_paths and
    event_transitions must give identical output when (ts, tiebreak)
    ties straddle the max_steps boundary, for ANY input row order or
    partitioning — the type column is the totalizing third key."""
    import datetime as dt
    import random

    from polars_mas_spark.operators.windows import (
        event_transitions,
        session_paths,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # u1: 4 unique steps, then THREE events tied on (ts, eid) with
    # distinct types at positions 5-7 — the max_steps=5 cut falls
    # inside the tie group.
    for i, e in enumerate(["a", "b", "c", "d"]):
        rows.append((1, t0 + dt.timedelta(minutes=i), i, e))
    tie_ts = t0 + dt.timedelta(minutes=4)
    for e in ["z", "y", "x"]:
        rows.append((1, tie_ts, 99, e))
    # u2: a fully tied pair at the session start
    rows.append((2, t0, 0, "q"))
    rows.append((2, t0, 0, "p"))

    baselines = None
    for seed in (1, 2, 3):
        shuffled = rows[:]
        random.Random(seed).shuffle(shuffled)
        df = spark.createDataFrame(
            shuffled, "u long, ts timestamp, eid long, e string"
        ).repartition(seed + 1)
        paths = sorted(
            (r.path, r.n_sessions)
            for r in session_paths(
                df, "u", "ts", "e", "eid", gap_seconds=1800, max_steps=5
            ).collect()
        )
        trans = sorted(
            (r.from_type, r.to_type, r.n)
            for r in event_transitions(df, "u", "ts", "e", "eid").collect()
        )
        if baselines is None:
            baselines = (paths, trans)
        else:
            assert (paths, trans) == baselines, f"seed {seed} diverged"
    # The tie resolves by type ascending: x, y precede z at the cut.
    assert ("a>b>c>d>x", 1) in baselines[0]
    assert ("p>q", 1) in baselines[0]


def test_session_paths_deterministic_truncation_and_gaps(spark):
    """Paths split at the gap, truncate at max_steps, and order events
    by (ts, tiebreak) — never collect order."""
    import datetime as dt

    from polars_mas_spark.operators.windows import session_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # u1 session 1: a,b,c,d,e,f (truncates to 5); session 2 after 1h: x
    for i, e in enumerate(["a", "b", "c", "d", "e", "f"]):
        rows.append((1, t0 + dt.timedelta(minutes=i), i, e))
    rows.append((1, t0 + dt.timedelta(hours=2), 99, "x"))
    # u2: same opening pair
    rows.append((2, t0, 0, "a"))
    rows.append((2, t0 + dt.timedelta(minutes=1), 1, "b"))
    df = spark.createDataFrame(rows, "u long, ts timestamp, eid long, e string")
    out = {
        r.path: r.n_sessions
        for r in session_paths(
            df, "u", "ts", "e", "eid", gap_seconds=1800, max_steps=5
        ).collect()
    }
    assert out == {"a>b>c>d>e": 1, "x": 1, "a>b": 1}


def test_bm25_hand_computed_scores(spark):
    """Tiny corpus where every BM25 quantity is hand-checkable: idf
    uses the Lucene non-negative variant, tf saturation and length
    normalization apply, docs without query terms never appear."""
    import math

    import pytest

    from polars_mas_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "cat dog"),        # dl 2
            (2, "cat cat cat"),    # dl 3
            (3, "bird"),           # dl 1
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(10, "cat")], "query_id long, query_text string")
    rows = {
        r.doc_id: (r.rank, r.score)
        for r in bm25_topk(docs, queries, k=5).collect()
    }
    n, df_cat, avgdl, k1, b = 3, 2, 2.0, 1.2, 0.75
    idf = math.log(1 + (n - df_cat + 0.5) / (df_cat + 0.5))

    def s(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert set(rows) == {1, 2}  # doc 3 has no query term
    assert rows[2][1] == pytest.approx(s(3, 3), rel=1e-9)
    assert rows[1][1] == pytest.approx(s(1, 2), rel=1e-9)
    assert rows[2][0] == 1 and rows[1][0] == 2  # saturation still ranks tf=3 first


def test_temporal_split_boundaries_and_embargo(spark):
    """Strict train/embargo/test boundaries at truncated-second
    precision; NULL ts quarantined as 'unknown'; negative embargo
    raises."""
    import datetime as dt

    import pytest as pt

    from polars_mas_spark.operators.sampling import temporal_split

    b = dt.datetime(2024, 6, 1)
    rows = [
        (1, b - dt.timedelta(days=2)),            # train
        (2, b - dt.timedelta(days=1)),            # exactly train_end -> embargo
        (3, b - dt.timedelta(hours=1)),           # embargo
        (4, b),                                   # test (inclusive)
        (5, None),                                # unknown
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    out = {
        r.k: r.split
        for r in temporal_split(df, "ts", "2024-06-01 00:00:00", 86400).collect()
    }
    assert out == {1: "train", 2: "embargo", 3: "embargo", 4: "test", 5: "unknown"}
    with pt.raises(ValueError, match=">= 0"):
        temporal_split(df, "ts", "2024-06-01", -1)


def test_canonical_url_edges(spark):
    """canonical_url edge semantics: https default port, tracking-only
    query (the '?' must drop), root-path slash, param sorting, case
    preservation in path/query, and non-URL input degrading to an
    opaque lowered-authority string."""
    from pyspark.sql import functions as F

    from polars_mas_spark.operators.text import canonical_url

    cases = [
        ("HTTPS://WWW.Example.COM:443/A/B/?b=2&a=1#x", "https://example.com/A/B?a=1&b=2"),
        ("https://example.com:4430/a", "https://example.com:4430/a"),
        ("http://ex.com/?utm_source=x&fbclid=1&ref=z", "http://ex.com"),
        ("http://ex.com/p?gclid&utm_source", "http://ex.com/p"),  # valueless
        ("http://ex.com/p?refresh=1", "http://ex.com/p?refresh=1"),
        ("http://ex.com/", "http://ex.com"),
        ("http://ex.com/p?id=Z&id=A", "http://ex.com/p?id=A&id=Z"),
        ("ex.com/path/", "ex.com/path"),
        ("  http://ex.com/x  ", "http://ex.com/x"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, u string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonical_url(F.col("u")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_url_dedup_summary_collapses_variants(spark):
    """All spellings of one logical URL collapse to one group with the
    min-id representative and the distinct raw-form count."""
    from polars_mas_spark.operators.text import url_dedup_summary

    rows = [
        (3, "http://ex.com/p?id=1&v=2"),
        (1, "HTTP://EX.COM/p?id=1&v=2"),
        (2, "http://www.ex.com:80/p/?v=2&id=1#frag"),
        (4, "http://ex.com/p?id=1&v=2"),  # exact repeat of doc 3's form
        (9, "http://other.com/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r.canonical_url: (r.n_docs, r.first_doc, r.n_raw_forms)
        for r in url_dedup_summary(df, "doc_id", "url").collect()
    }
    assert out["http://ex.com/p?id=1&v=2"] == (4, 1, 3)
    assert out["http://other.com/q"] == (1, 9, 1)


def test_audio_fingerprint_neardup_planted(spark):
    """Audio near-dup on REAL WAV clips: an exact re-encode pairs at
    hamming 0, a one-frame energy perturbation at small distance, an
    inverted-envelope clip and a corrupt payload never pair; constant
    clips hash all-zero (documented property); the hot-cluster cap
    routes a planted identical-clip cluster through its representative."""
    import numpy as np

    from polars_mas_spark.operators.multimodal import (
        audio_fingerprint, audio_neardup_pairs, wav_encode_pcm8,
    )

    # 256 samples, 64 frames of 4: loud first half, quiet second half.
    base = bytearray(128 for _ in range(256))
    for i in range(128):
        base[i] = 255 if i % 2 == 0 else 0  # high |amplitude| frames
    pert = bytearray(base)
    for i in range(4):
        pert[128 + i] = 255 if i % 2 == 0 else 0  # one frame flips loud
    inv = bytearray(base[128:] + base[:128])  # envelope swapped
    rows = [
        (1, wav_encode_pcm8(bytes(base))),
        (2, wav_encode_pcm8(bytes(pert))),
        (3, wav_encode_pcm8(bytes(inv))),
        (4, wav_encode_pcm8(bytes(base))),  # exact copy of 1
        (5, b"RIFFcorrupt"),
        (6, wav_encode_pcm8(bytes([128]) * 256)),  # constant/silent
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    fps = {
        r.doc_id: r.fingerprint
        for r in audio_fingerprint(df, "doc_id", "content").collect()
    }
    assert fps[5] is None
    assert fps[1] == fps[4]
    assert fps[6] == "0" * 16  # constant clip -> all-zero hash
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in audio_neardup_pairs(
            df, "doc_id", "content", max_distance=3
        ).collect()
    }
    assert pairs[(1, 4)] == 0
    assert pairs[(1, 2)] == 1 and pairs[(2, 4)] == 1
    assert not any(3 in p or 5 in p or 6 in p for p in pairs)

    # Hot-cluster cap through the shared helper: 11 identical clips
    # emit 10 representative links, not C(11,2)=55 pairs.
    many = [(i, wav_encode_pcm8(bytes(base))) for i in range(100, 111)]
    mdf = spark.createDataFrame(many, "doc_id long, content binary")
    capped = audio_neardup_pairs(
        mdf, "doc_id", "content", hot_cluster_cap=8
    ).collect()
    assert len(capped) == 10
    assert all(r.doc_a == 100 and r.hamming == 0 for r in capped)


def test_video_neardup_planted_clips(spark):
    """Video near-dup on real concatenated-netpbm containers: an exact
    re-encode shares all frames, a clipped copy (2 of 3 frames) pairs
    through min_shared=2, a one-frame overlap does NOT, corrupt tails
    degrade to the valid frame prefix, and the max_df stop-hash guard
    removes blank frames shared corpus-wide."""
    import numpy as np

    from polars_mas_spark.operators.multimodal import (
        netpbm_encode, video_neardup_pairs,
    )

    rng = np.random.default_rng(5)
    f = [
        netpbm_encode(16, 16, rng.integers(0, 256, 256, dtype=np.uint8).tobytes())
        for _ in range(5)
    ]
    blank = netpbm_encode(16, 16, bytes([7]) * 256)  # constant frame
    rows = [
        (1, f[0] + f[1] + f[2]),
        (2, f[0] + f[1] + f[2]),          # exact copy of 1
        (3, f[1] + f[2] + f[3]),          # clipped: shares 2 frames with 1
        (4, f[3] + f[4]),                 # shares 1 frame with 3 only
        (5, f[4] + b"P5 corrupt tail"),   # valid prefix, corrupt tail
        (6, b"not a video"),
        (7, blank + f[0] + blank),        # blank frames + one real
        (8, blank + blank + blank),       # all blank
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    pairs = {
        (r.doc_a, r.doc_b): r.shared_frames
        for r in video_neardup_pairs(
            df, "doc_id", "content", min_shared=2
        ).collect()
    }
    assert pairs[(1, 2)] == 3
    assert pairs[(1, 3)] == 2 and pairs[(2, 3)] == 2
    assert (3, 4) not in pairs  # one shared frame < min_shared
    assert not any(5 in p or 6 in p for p in pairs)
    # 7 and 8 share only the blank hash (one distinct) -> no pair at
    # min_shared=2; with min_shared=1 they WOULD pair, and max_df=1
    # (stop-hash) must remove that blank-frame vote again.
    loose = {
        (r.doc_a, r.doc_b)
        for r in video_neardup_pairs(
            df, "doc_id", "content", min_shared=1
        ).collect()
    }
    assert (7, 8) in loose
    guarded = {
        (r.doc_a, r.doc_b)
        for r in video_neardup_pairs(
            df, "doc_id", "content", min_shared=1, max_df=1
        ).collect()
    }
    assert (7, 8) not in guarded


def test_video_neardup_default_hot_frame_guard(spark):
    """The DEFAULT max_df (64) blocks the blank-frame quadratic blowup
    (ADVICE r8): 70 videos all opening with the same constant frame
    emit ZERO pairs by default (the shared hash's df=70 exceeds the
    guard), while max_df=None opts back into all C(70,2) pairs."""
    import numpy as np

    from polars_mas_spark.operators.multimodal import (
        netpbm_encode, video_neardup_pairs,
    )

    rng = np.random.default_rng(11)
    blank = netpbm_encode(16, 16, bytes([0]) * 256)
    rows = [
        (
            i,
            blank
            + netpbm_encode(
                16, 16, rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
            ),
        )
        for i in range(70)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    assert video_neardup_pairs(df, min_shared=1).count() == 0
    assert (
        video_neardup_pairs(df, min_shared=1, max_df=None).count()
        == 70 * 69 // 2
    )


def test_extract_html_text_edges(spark):
    from polars_mas_spark.operators import text as tx

    rows = [
        (1, '<HTML><HEAD><TITLE>Up&amp;Case</TITLE></HEAD>'
            '<BODY><P>a  b</P></BODY></HTML>'),          # uppercase tags
        (2, '<p>no title &copy; stays</p>'),             # unknown entity
        (3, None),                                       # NULL html
        (4, '<script>x="</p>"</script>kept'
            '<style>a{content:"</b>"}</style>'),         # fake closers
        (5, '<!-- <p>gone</p> -->&amp;lt; single-pass'), # no double decode
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.doc_id: r for r in tx.extract_html_text(df, "html").collect()}
    # head block (incl. the title text) is chrome — body text only
    assert got[1].title == "Up&Case" and got[1].extracted_text == "a b"
    assert got[2].title == "" and got[2].extracted_text == "no title &copy; stays"
    assert got[3].title == "" and got[3].extracted_text == ""
    assert got[4].extracted_text == "kept"
    assert got[5].extracted_text == "&lt; single-pass"


def test_span_decontaminate_surgical_and_total(spark):
    from polars_mas_spark.operators.dedup import span_decontaminate

    bench = spark.createDataFrame(
        [(100, "s0 s1 s2 s3 s4 s5 s6 s7")],   # one 8-word benchmark doc
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # benchmark span embedded mid-document (misaligned)
            (1, "a b s0 s1 s2 s3 s4 s5 s6 s7 c d"),
            # only a 2-word brush with the benchmark: below k -> kept
            (2, "s0 s1 x y z w"),
            # clean document
            (3, "p q r s t u"),
            # the benchmark text verbatim -> fully removed
            (4, "s0 s1 s2 s3 s4 s5 s6 s7"),
            # short doc (< k words): never contaminated by construction
            (5, "s0"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in span_decontaminate(corpus, bench, "doc_id", "text", k=4).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1].clean_text == "a b c d"
    assert out[1].n_removed == 8 and out[1].contaminated
    assert out[2].clean_text == "s0 s1 x y z w" and not out[2].contaminated
    assert out[3].clean_text == "p q r s t u" and out[3].n_removed == 0
    assert out[4].clean_text == "" and out[4].n_removed == 8
    assert out[5].clean_text == "s0" and not out[5].contaminated
    # bookkeeping identity holds on every row
    for r in out.values():
        assert r.n_tokens - r.n_removed == len(
            r.clean_text.split()
        ), r


def _para_rows():
    boiler = " ".join(f"b{i}" for i in range(8))
    d1 = (
        " ".join(f"a{i}" for i in range(8))
        + " " + boiler + " "
        + " ".join(f"c{i}" for i in range(8))
    )
    return [
        (1, d1),                                       # first occurrence: intact
        (2, boiler + " " + " ".join(f"d{i}" for i in range(8))),  # loses boiler
        (3, " ".join(f"e{i}" for i in range(4))),      # short, clean
        (4, d1),                                       # full copy -> empty
        (5, ""),                                       # empty doc
    ]


def test_paragraph_neardup_dedup_semantics(spark):
    from polars_mas_spark.operators.dedup import paragraph_neardup_dedup

    df = spark.createDataFrame(_para_rows(), "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in paragraph_neardup_dedup(
            df, "doc_id", "text", max_words=8
        ).collect()
    }
    assert out[1].n_removed == 0 and out[1].clean_text == _para_rows()[0][1]
    assert out[2].clean_text == " ".join(f"d{i}" for i in range(8))
    assert out[2].n_passages == 2 and out[2].n_removed == 1
    assert out[3].n_removed == 0
    assert out[4].clean_text == "" and out[4].n_removed == 3
    assert out[5].clean_text == "" and out[5].n_passages == 0
    # surviving text is always a sub-multiset of the original tokens
    orig = dict(_para_rows())
    for d, r in out.items():
        from collections import Counter

        assert not Counter(r.clean_text.split()) - Counter(orig[d].split())


def test_paragraph_neardup_dedup_idempotent(spark):
    """Re-running on the survivors removes nothing more: pass-1 output
    is a fixpoint on this corpus (copies emptied, boilerplate cut once;
    surviving passages pairwise share no band bucket and the untouched
    docs' passage grids are unchanged)."""
    from polars_mas_spark.operators.dedup import paragraph_neardup_dedup

    df = spark.createDataFrame(_para_rows(), "doc_id long, text string")
    p1 = paragraph_neardup_dedup(df, "doc_id", "text", max_words=8)
    p2 = paragraph_neardup_dedup(
        p1.selectExpr("doc_id", "clean_text AS text"),
        "doc_id",
        "text",
        max_words=8,
    )
    r1 = {r.doc_id: r.clean_text for r in p1.collect()}
    r2 = {r.doc_id: r for r in p2.collect()}
    assert r1 == {d: r.clean_text for d, r in r2.items()}
    assert all(r.n_removed == 0 for r in r2.values())


def test_incremental_span_decontaminate_semantics(spark):
    """Cross-batch misaligned spans are cut; spans repeated only WITHIN
    the new batch survive; the persisted-fingerprint path is identical
    to the text path."""
    from polars_mas_spark.operators.dedup import (
        incremental_span_decontaminate,
        span_fingerprints,
    )

    seen = spark.createDataFrame(
        [
            (100, "u v s0 s1 s2 s3 s4 s5 s6 s7"),  # span mid-doc
            (101, "other accepted material here entirely"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # accepted span at a DIFFERENT alignment -> cut
            (1, "s0 s1 s2 s3 s4 s5 s6 s7 tail words"),
            # span repeated only within the NEW batch -> survives twice
            (2, "n0 n1 n2 n3 n4 lead"),
            (3, "lead n0 n1 n2 n3 n4"),
            # clean
            (4, "p q r s t u"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in incremental_span_decontaminate(
            new, seen, "doc_id", "text", k=4
        ).collect()
    }
    assert out[1].clean_text == "tail words" and out[1].n_removed == 8
    assert not out[2].contaminated and out[2].clean_text == "n0 n1 n2 n3 n4 lead"
    assert not out[3].contaminated
    assert out[4].clean_text == "p q r s t u" and out[4].n_removed == 0
    for r in out.values():
        assert r.n_tokens - r.n_removed == len(r.clean_text.split())

    # persisted-fingerprint path == text path (the 100 TB layout)
    fps = span_fingerprints(seen, "text", k=4)
    out_fp = {
        r.doc_id: r
        for r in incremental_span_decontaminate(
            new, fps, "doc_id", "text", k=4, seen_is_fingerprints=True
        ).collect()
    }
    assert {d: (r.clean_text, r.n_removed) for d, r in out.items()} == {
        d: (r.clean_text, r.n_removed) for d, r in out_fp.items()
    }


def test_unicode_normalize_forms_and_strip(spark):
    """NFC composes combining sequences; NFKC additionally folds
    compatibility forms (ligature, fullwidth); controls/zero-widths
    strip while tab/newline survive; NULL -> ''; output matches python
    unicodedata on every row; normalization is idempotent."""
    import unicodedata

    from polars_mas_spark.operators.text import unicode_normalize

    rows = [
        (0, "cafe\u0301 nai\u0308ve"),  # decomposed accents
        (1, "\ufb01n \uff21\uff22 \u2460"),  # NFKC-only folds
        (2, "ze\u200bro\twi\u200ddth\nbe\x07ll\ufeff"),
        (3, None),
        (4, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def py(form, s):
        import re

        out = unicodedata.normalize(form, s or "")
        return re.sub(
            "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\u200b-\u200d\ufeff]", "", out
        )

    for form in ("NFC", "NFKC"):
        got = {
            r.doc_id: r
            for r in unicode_normalize(df, "doc_id", "text", form=form).collect()
        }
        for i, t in rows:
            assert got[i].text_norm == py(form, t), (form, i)
            assert got[i].n_chars_norm == len(py(form, t))
        assert got[3].text_norm == "" and not got[3].changed
        assert not got[4].changed
        assert got[2].changed and "\t" in got[2].text_norm
        assert "\n" in got[2].text_norm and "\x07" not in got[2].text_norm

    # NFC leaves the ligature; NFKC folds it
    nfc = {r.doc_id: r.text_norm
           for r in unicode_normalize(df, "doc_id", "text", form="NFC").collect()}
    nfkc = {r.doc_id: r.text_norm
            for r in unicode_normalize(df, "doc_id", "text", form="NFKC").collect()}
    assert nfc[1].startswith("\ufb01n") and nfkc[1].startswith("fin")
    assert nfc[0] == nfkc[0] == "caf\u00e9 na\u00efve"  # composed

    # idempotent: normalizing the output changes nothing
    once = unicode_normalize(df, "doc_id", "text", form="NFKC")
    twice = unicode_normalize(
        once.selectExpr("doc_id", "text_norm AS text"),
        "doc_id", "text", form="NFKC",
    )
    assert all(not r.changed for r in twice.collect())

    import pytest

    with pytest.raises(ValueError):
        unicode_normalize(df, "doc_id", "text", form="NFX")


def test_r10_review_guards(spark):
    """Loud-failure guards added by the r10 review: simhash bits
    validation, lsh_candidate_pairs runtime banding check,
    paragraph_neardup_dedup doc-id packing bounds,
    connected_min_labels non-convergence, and NULL-id seen docs
    contributing real band keys to the incremental near-dup."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    from polars_mas_spark.operators.dedup import (
        connected_min_labels,
        incremental_minhash_dedup,
        lsh_candidate_pairs,
        minhash_signatures,
        paragraph_neardup_dedup,
        simhash,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string"
    )
    for bad_bits in (0, 62, 128):
        with pytest.raises(ValueError, match="multiple of 4"):
            simhash(docs, "doc_id", "text", bits=bad_bits)

    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    with pytest.raises(Exception, match="collapse every document"):
        lsh_candidate_pairs(sigs, bands=8, rows_per_band=4).collect()

    huge = spark.createDataFrame(
        [(1 << 50, "a b c d")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="pid packing"):
        paragraph_neardup_dedup(huge, "doc_id", "text", max_words=2).collect()

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="still changing"):
        connected_min_labels(pairs, max_rounds=1)

    # a NULL-id seen document must still block its exact near-dup
    seen = spark.createDataFrame(
        [(None, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon zeta"), (8, "other words here")],
        "doc_id long, text string",
    )
    kept = {
        r.doc_id
        for r in incremental_minhash_dedup(new, seen, "doc_id", "text").collect()
    }
    assert kept == {8}


def test_incremental_dedup_cascade_attribution(spark):
    """Stage and batch/seen attribution on a hand-built seen/new pair:
    within-batch collapse attributes 'batch' before seen-membership;
    NULL url/text bypass their stages; every new doc gets exactly one
    verdict."""
    from polars_mas_spark.operators.dedup import incremental_dedup_cascade

    seen = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon", "http://a.com/x"),
            (101, "one two three four five six seven",
             "http://b.com/y?utm_source=z"),
        ],
        "doc_id long, text string, url string",
    )
    new = spark.createDataFrame(
        [
            # url canonicalizes onto seen 100's -> url/seen
            (1, "fresh novel content entirely here", "HTTP://A.com:80/x"),
            # exact text of seen 100 -> exact/seen
            (2, "alpha beta gamma delta epsilon", "http://c.com/1"),
            # 3 wins the within-batch url group, 4 loses -> url/batch
            (3, "unique doc body qqq www eee", "http://d.com/1"),
            (4, "unique doc body qqq www eee rrr", "http://d.com/1"),
            # near-dup of seen 101 -> near/seen
            (5, "one two three four five six seven extra", "http://e.com/1"),
            # 6 kept; 7 exact dup of 6 within batch -> exact/batch
            (6, "totally different payload zz yy xx", "http://f.com/1"),
            (7, "totally different payload zz yy xx", "http://g.com/1"),
            # NULL url and text bypass every stage
            (8, None, None),
        ],
        "doc_id long, text string, url string",
    )
    out = {
        r.doc_id: (r.stage, r.vs)
        for r in incremental_dedup_cascade(
            new, seen, "doc_id", "text", url_col="url"
        ).collect()
    }
    assert out == {
        1: ("url", "seen"),
        2: ("exact", "seen"),
        3: ("kept", None),
        4: ("url", "batch"),
        5: ("near", "seen"),
        6: ("kept", None),
        7: ("exact", "batch"),
        8: ("kept", None),
    }


def test_dedup_cascade_stage_attribution(spark):
    """Each duplicate is attributed to the FIRST stage that catches it;
    survivors are min-id; NULL url/text pass their stages untouched."""
    from polars_mas_spark.operators.dedup import dedup_cascade

    rows = [
        # url dups: same canonical URL, different text -> later id = 'url'
        (1, "alpha beta gamma delta", "http://a.com/p?x=1"),
        (2, "completely different words here", "HTTP://A.com:80/p?x=1"),
        # exact dups (distinct urls): identical text -> later id = 'exact'
        (3, "same same same same", "http://b.com/1"),
        (4, "same same same same", "http://b.com/2"),
        # near dups: one token differs in a 30-word doc -> 'near'
        (5, " ".join(f"w{i}" for i in range(30)), "http://c.com/1"),
        (6, " ".join(f"w{i}" for i in range(29)) + " zz", "http://c.com/2"),
        # clean doc
        (7, "totally unrelated content q r s t u v", "http://d.com/1"),
        # NULL url and NULL text pass through to 'kept'
        (8, "another unique doc body x y z", None),
        (9, None, "http://e.com/1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    # 8 bands x 2 rows: a J~0.94 pair collides in some band with
    # probability 1 - (1 - J^2)^8 ~ 1 - 1e-9 — and the hashes are
    # deterministic, so this specific outcome is frozen, not flaky.
    got = {r.doc_id: r.stage for r in
           dedup_cascade(df, "doc_id", "text", url_col="url",
                         num_hashes=16, bands=8, rows_per_band=2).collect()}
    assert got == {
        1: "kept", 2: "url", 3: "kept", 4: "exact",
        5: "kept", 6: "near", 7: "kept", 8: "kept", 9: "kept",
    }


def test_dedup_cascade_null_id_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.sql.utils import AnalysisException  # noqa: F401
    from polars_mas_spark.operators.dedup import dedup_cascade

    df = spark.createDataFrame(
        [(None, "some text", "http://a.com/1"),
         (2, "other text", "http://a.com/2")],
        "doc_id long, text string, url string",
    )
    # the eager stage checkpoint inside the operator triggers the job,
    # so the raise surfaces at construction time already
    import pytest as _pt
    with _pt.raises(Exception, match="NULL doc_id"):
        dedup_cascade(df, "doc_id", "text", url_col="url").collect()


def test_dedup_cascade_degenerate_urls_never_group(spark):
    """Docs whose urls canonicalize to '' (empty/whitespace/fragment)
    bypass the URL stage instead of collapsing into one group."""
    from polars_mas_spark.operators.dedup import dedup_cascade

    rows = [
        (1, "first unique body aa bb cc", ""),
        (2, "second unique body dd ee ff", "   "),
        (3, "third unique body gg hh ii", "#frag-only"),
        (4, "fourth unique body jj kk ll", "http://real.com/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    got = {r.doc_id: r.stage for r in
           dedup_cascade(df, "doc_id", "text", url_col="url").collect()}
    assert got == {1: "kept", 2: "kept", 3: "kept", 4: "kept"}


def test_span_decontaminate_null_text_and_idless_benchmark(spark):
    """NULL corpus text yields (\"\", 0, 0, False) — never NULL
    bookkeeping a boolean filter would drop; benchmark frames need no
    id column at all."""
    from polars_mas_spark.operators.dedup import span_decontaminate

    corpus = spark.createDataFrame(
        [(1, None), (2, "b0 b1 b2 b3 tail words")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("b0 b1 b2 b3",)], "text string")
    got = {r.doc_id: r for r in
           span_decontaminate(corpus, bench, "doc_id", "text", k=4).collect()}
    assert (got[1].clean_text, got[1].n_tokens, got[1].n_removed,
            got[1].contaminated) == ("", 0, 0, False)
    assert got[2].clean_text == "tail words" and got[2].n_removed == 4


def test_extract_html_text_header_tag_not_head(spark):
    """<header> must not match the head-block pattern: content between
    a <header> element and a later literal </head> survives."""
    from polars_mas_spark.operators import text as tx

    s = ("<header>Nav</header><main>REAL CONTENT</main>"
         "<head profile=\"x\"><title>t2</title></head>")
    df = spark.createDataFrame([(1, s)], "doc_id long, html string")
    r = tx.extract_html_text(df, "html").collect()[0]
    assert "REAL CONTENT" in r.extracted_text
    assert "Nav" in r.extracted_text  # header CONTENT is body text
    assert r.title == "t2"


def test_asof_join_null_timestamps_never_match(spark):
    """NULL-ts right rows are never carried as matches; NULL-ts left
    rows match nothing (merge_asof/ASOF JOIN contract) — both
    directions."""
    import datetime

    from polars_mas_spark.operators.windows import asof_join

    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(5)), (1, t(30)), (1, None)], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, None, -1.0), (1, t(10), 10.0)],
        "k int, ts timestamp, px double",
    )
    for direction in ("backward", "forward"):
        got = {
            (r.k, r.ts): (r.asof_ts, r.px)
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="ts",
                direction=direction,
            ).collect()
        }
        # NULL left ts -> no match, in BOTH directions
        assert got[(1, None)] == (None, None), (direction, got)
        # the NULL-ts right row (-1.0) is never anyone's match
        assert all(v[1] != -1.0 for v in got.values()), (direction, got)
    back = {
        (r.k, r.ts): r.px
        for r in asof_join(left, right, on="k", left_ts="ts",
                           right_ts="ts").collect()
    }
    assert back[(1, t(5))] is None       # nothing at/before 12:05
    assert back[(1, t(30))] == 10.0


def test_salted_join_rejects_dim_preserving_hows(spark):
    from polars_mas_spark.operators.joins import salted_join

    f = spark.createDataFrame([(1, "a")], "k int, x string")
    d = spark.createDataFrame([(1, "y")], "k int, y string")
    import pytest as _pt
    with _pt.raises(ValueError, match="fact-preserving"):
        salted_join(f, d, on="k", how="full_outer")
    assert salted_join(f, d, on="k", how="left").count() == 1
