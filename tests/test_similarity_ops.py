"""Similarity-search operators: exact brute force is the oracle; the
approximate variants (LSH, IVF) must reach a minimum recall against it
on the driver-generated embeddings table."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_mas_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return df.cache()


def _topk_sets(df):
    pdf = df.toPandas()
    return {
        q: set(g.sort_values("rank")["neighbor_id"])
        for q, g in pdf.groupby("query_id")
    }


def test_brute_force_matches_numpy(emb, spark):
    queries = emb.filter(F.col("vec_id") < 5)
    got = sim.brute_force_topk(emb, queries, k=3).toPandas()
    all_pdf = emb.select("vec_id", "embedding").toPandas()
    mat = np.array(all_pdf["embedding"].tolist())
    ids = all_pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    for qid in range(5):
        qi = np.where(ids == qid)[0][0]
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        cos[qi] = -np.inf
        order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:3]
        expect = [int(ids[i]) for i in order]
        mine = got[got.query_id == qid].sort_values("rank")["neighbor_id"].tolist()
        assert mine == expect


@pytest.mark.parametrize("method", ["lsh", "ivf"])
def test_approx_recall(emb, spark, method):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = _topk_sets(sim.brute_force_topk(emb, queries, k=5))
    if method == "lsh":
        approx = _topk_sets(
            sim.lsh_topk(emb, queries, k=5, num_planes=4, num_tables=6, dim=64)
        )
    else:
        approx = _topk_sets(
            sim.ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=6)
        )
    hits = total = 0
    for q, expect in exact.items():
        got = approx.get(q, set())
        hits += len(expect & got)
        total += len(expect)
    recall = hits / total
    assert recall >= 0.5, f"{method} recall@5 too low: {recall:.2f}"


def test_ivf_deterministic(emb, spark):
    queries = emb.filter(F.col("vec_id") < 5)
    a = sim.ivf_topk(emb, queries, k=3).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    b = sim.ivf_topk(emb, queries, k=3).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ivf_plan_size_flat_in_centroid_count(emb, spark):
    """VERDICT r1 #5: centroids must be broadcast data, not Catalyst
    literals — the plan must not grow with n_centroids, and recall must
    hold at a centroid count (256) that would blow up a literal plan."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = _topk_sets(sim.brute_force_topk(emb, queries, k=5))

    small = sim.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=4)
    big = sim.ivf_topk(emb, queries, k=5, n_centroids=256, n_probe=64)
    p_small = small._jdf.queryExecution().optimizedPlan().toString()
    p_big = big._jdf.queryExecution().optimizedPlan().toString()
    assert len(p_big) < 1.2 * len(p_small) + 2000, (
        f"plan grows with centroid count: {len(p_small)} -> {len(p_big)}"
    )

    approx = _topk_sets(big)
    total = hits = 0
    for q, expect in exact.items():
        got = approx.get(q, set())
        hits += len(expect & got)
        total += len(expect)
    assert hits / total >= 0.5, f"ivf@256 recall too low: {hits / total:.2f}"


def test_kmeans_assign_matches_numpy(spark):
    """Golden parity: Spark's distributed Lloyd round must reproduce a
    straight numpy implementation (same seeds, same tie-breaks)."""
    import numpy as np

    from polars_mas_spark.operators import similarity as sim

    rng = np.random.RandomState(11)
    X = rng.randn(60, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r.cluster
        for r in sim.kmeans_assign(df, k=4, refine_iters=1).collect()
    }

    def norm(M):
        n = np.linalg.norm(M, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return M / n

    C = X[:4].copy()
    a0 = np.argmax(norm(X) @ norm(C).T, axis=1)
    C1 = np.vstack([
        X[a0 == i].mean(axis=0) if (a0 == i).any() else C[i] for i in range(4)
    ])
    a1 = np.argmax(norm(X) @ norm(C1).T, axis=1)
    assert got == {i: int(a1[i]) for i in range(60)}


def test_semantic_dedup_drops_planted_neardups(spark):
    """Three exact-duplicate pairs planted in distinct clusters: the
    larger id of each pair must be dropped, everything else kept."""
    import numpy as np

    from polars_mas_spark.operators import similarity as sim

    rng = np.random.RandomState(5)
    X = rng.randn(30, 8)
    X[10] = X[3]          # dup pair (3, 10)
    X[21] = X[7] * 2.0    # same direction -> cosine 1 with (7)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    kept = {
        r.vec_id
        for r in sim.semantic_dedup(df, k=3, threshold=0.999).collect()
    }
    assert 3 in kept and 10 not in kept
    assert 7 in kept and 21 not in kept
    assert len(kept) == 28


def test_separate_query_table_keeps_colliding_ids(emb, spark):
    """Review r4: with a distinct query_id_col the query ids live in an
    unrelated id space, so a corpus vector whose id equals a query id
    must NOT be excluded as a 'self match' — on any of the three
    engines."""
    # Query table: vectors of corpus ids 0..2, re-labeled qid 100+i.
    queries = (
        emb.filter(F.col("vec_id") < 3)
        .select((F.col("vec_id") + 100).alias("qid"), "embedding")
    )
    for fn, kw in [
        (sim.brute_force_topk, {}),
        (sim.lsh_topk, {"num_planes": 4, "num_tables": 6, "dim": 64}),
        (sim.ivf_topk, {"n_centroids": 8, "n_probe": 8}),
    ]:
        got = fn(emb, queries, k=1, query_id_col="qid", **kw).toPandas()
        # Each query IS a corpus vector (cos=1 with itself, smallest id
        # tiebreak) — rank-1 must be its own corpus id, never excluded.
        top = {int(r.query_id): int(r.neighbor_id) for r in got.itertuples()}
        for qid in (100, 101, 102):
            assert top.get(qid) == qid - 100, (fn.__name__, top)


def test_lsh_dim_inference_errors_clearly(spark):
    """Review r4: empty corpus / NULL first vector must raise a named
    error, not a TypeError deep in numpy."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="cannot infer embedding dim"):
        sim.lsh_topk(empty, empty, k=1)


def test_pq_adc_matches_numpy(emb, spark):
    """pq_topk's approx_dist must equal the numpy ADC computation
    (codebook train + encode + table gather) for every returned row."""
    queries = emb.filter(F.col("vec_id") < 5)
    m, ksub = 8, 16
    got = sim.pq_topk(emb, queries, k=3, m=m, ksub=ksub).toPandas()
    cb = sim.pq_codebooks(emb, m=m, ksub=ksub)
    all_pdf = emb.select("vec_id", "embedding").toPandas()
    mat = np.array(all_pdf["embedding"].tolist(), dtype=np.float64)
    ids = all_pdf["vec_id"].to_numpy()
    d = mat.shape[1] // m
    Xs = mat.reshape(len(mat), m, d)
    codes = np.stack(
        [np.argmin(((Xs[:, s, None, :] - cb[s][None]) ** 2).sum(-1), axis=1)
         for s in range(m)], axis=1,
    )
    for r in got.itertuples():
        qi = np.where(ids == r.query_id)[0][0]
        ni = np.where(ids == r.neighbor_id)[0][0]
        expect = sum(
            ((Xs[qi, s] - cb[s][codes[ni, s]]) ** 2).sum() for s in range(m)
        )
        assert abs(r.approx_dist - expect) < 1e-9, (r, expect)


def test_pq_recall_reasonable(emb, spark):
    """PQ@96 bits must beat random guessing by a wide margin against the
    exact L2 ranking (random Gaussian vectors are PQ's worst case; the
    registered query's config measured 0.6 recall@5 at sf0.01)."""
    all_pdf = emb.select("vec_id", "embedding").toPandas()
    mat = np.array(all_pdf["embedding"].tolist(), dtype=np.float64)
    ids = all_pdf["vec_id"].to_numpy()
    exact = {}
    for qid in range(20):
        qi = np.where(ids == qid)[0][0]
        dist = ((mat - mat[qi]) ** 2).sum(1)
        dist[qi] = np.inf
        exact[qid] = set(ids[np.lexsort((ids, dist))[:5]])
    queries = emb.filter(F.col("vec_id") < 20)
    approx = _topk_sets(
        sim.pq_topk(emb, queries, k=5, m=16, ksub=64, refine_iters=1)
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / 100
    assert recall >= 0.3, f"pq recall@5 too low: {recall:.2f}"


def test_pq_separate_query_table(emb, spark):
    """Same id-space contract as the other ANN tiers: with query_id_col
    a corpus vector that shares a query's id must not be excluded, and
    each query's rank-1 is its own corpus vector (ADC distance 0 to its
    own codes beats every other code tuple unless equal)."""
    queries = (
        emb.filter(F.col("vec_id") < 3)
        .select((F.col("vec_id") + 100).alias("qid"), "embedding")
    )
    got = sim.pq_topk(
        emb, queries, k=1, m=16, ksub=64, query_id_col="qid"
    ).toPandas()
    top = {int(r.query_id): int(r.neighbor_id) for r in got.itertuples()}
    for qid in (100, 101, 102):
        assert top.get(qid) == qid - 100, top


def test_pq_validation_errors(emb, spark):
    with pytest.raises(ValueError, match="not divisible"):
        sim.pq_codebooks(emb, m=7)
    tiny = emb.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="at least ksub"):
        sim.pq_codebooks(tiny, m=8, ksub=16)


def test_ivfpq_recall_and_candidate_containment(emb, spark):
    """IVF-PQ must (a) clear a recall floor against exact L2 and (b)
    only ever return neighbors from the query's probed buckets."""
    all_pdf = emb.select("vec_id", "embedding").toPandas()
    mat = np.array(all_pdf["embedding"].tolist(), dtype=np.float64)
    ids = all_pdf["vec_id"].to_numpy()
    exact = {}
    for qid in range(20):
        qi = np.where(ids == qid)[0][0]
        dist = ((mat - mat[qi]) ** 2).sum(1)
        dist[qi] = np.inf
        exact[qid] = set(ids[np.lexsort((ids, dist))[:5]])
    queries = emb.filter(F.col("vec_id") < 20)
    got = sim.ivf_pq_topk(
        emb, queries, k=5, n_centroids=8, n_probe=4, m=16, ksub=32
    )
    approx = _topk_sets(got)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    assert hits / 100 >= 0.25, f"ivfpq recall@5 too low: {hits / 100:.2f}"
    # Containment: recompute buckets + probes with the engine's own
    # deterministic centroids and assert membership.
    cents = sim.kmeans_centroids(emb, k=8, refine_iters=1)
    C = np.asarray(cents)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    Xn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bucket = np.argmax(Xn @ Cn.T, axis=1)
    sims = Xn @ Cn.T
    for q, neigh in approx.items():
        qi = np.where(ids == q)[0][0]
        probed = set(np.argsort(-sims[qi], kind="stable")[:4])
        for n in neigh:
            ni = np.where(ids == n)[0][0]
            assert bucket[ni] in probed, (q, n, bucket[ni], probed)


def test_ivfpq_separate_query_table(emb, spark):
    queries = (
        emb.filter(F.col("vec_id") < 3)
        .select((F.col("vec_id") + 100).alias("qid"), "embedding")
    )
    got = sim.ivf_pq_topk(
        emb, queries, k=1, n_centroids=8, n_probe=8, m=16, ksub=32,
        query_id_col="qid",
    ).toPandas()
    top = {int(r.query_id): int(r.neighbor_id) for r in got.itertuples()}
    # n_probe covers all buckets, so each query sees its own corpus twin
    # (residual ADC distance == its own quantization error, minimal or
    # tied; ties break to the lowest id).
    for qid in (100, 101, 102):
        assert top.get(qid) == qid - 100, top


def test_random_projection_paths_agree_and_preserve_distance(spark):
    """The Arrow matmul path must numerically match the codegen
    literal-dot path (same seeded planes; BLAS vs sequential summation
    differs only in last bits), and the projection must roughly
    preserve pairwise distance ratios (the JL property it exists for)."""
    import numpy as np

    from polars_mas_spark.operators.similarity import random_projection

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .limit(64)
    )
    a = (
        random_projection(emb, out_dim=16, dim=64)
        .toPandas().set_index("vec_id").sort_index()
    )
    b = (
        random_projection(emb, out_dim=16, dim=64, codegen_max_cells=1)
        .toPandas().set_index("vec_id").sort_index()
    )
    A = np.vstack(a["projected"].to_numpy())
    B = np.vstack(b["projected"].to_numpy())
    np.testing.assert_allclose(A, B, rtol=1e-9, atol=1e-12)

    X = np.vstack(
        emb.toPandas().sort_values("vec_id")["embedding"].to_numpy()
    )
    rng = np.random.RandomState(3)
    idx = rng.choice(len(X), size=(40, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    d_hi = np.linalg.norm(X[idx[:, 0]] - X[idx[:, 1]], axis=1)
    d_lo = np.linalg.norm(A[idx[:, 0]] - A[idx[:, 1]], axis=1)
    ratio = d_lo / d_hi
    # 16 of 64 dims: JL distortion is loose but bounded — no collapse,
    # no blow-up, centered near 1.
    assert 0.4 < ratio.min() and ratio.max() < 1.9, (ratio.min(), ratio.max())
    assert abs(float(np.median(ratio)) - 1.0) < 0.25


def test_hard_negatives_disjoint_from_positives(spark):
    """Negatives are exactly ranks k_pos+1..k_pos+n_neg of the SAME
    ranking lsh_topk produces: disjoint from the top-k_pos positives,
    neg_rank contiguous from 1, and never the query itself."""
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    qs = emb.filter(F.col("vec_id") < 10)
    pos = sim.lsh_topk(emb, qs, k=3, num_planes=4, dim=64).toPandas()
    neg = sim.hard_negatives(
        emb, qs, k_pos=3, n_neg=4, num_planes=4, dim=64
    ).toPandas()
    pos_pairs = set(zip(pos["query_id"], pos["neighbor_id"]))
    neg_pairs = set(zip(neg["query_id"], neg["negative_id"]))
    assert pos_pairs and neg_pairs
    assert not pos_pairs & neg_pairs
    assert (neg["query_id"] != neg["negative_id"]).all()
    for qid, grp in neg.groupby("query_id"):
        ranks = sorted(grp["neg_rank"])
        assert ranks == list(range(1, len(ranks) + 1)), (qid, ranks)
        # negatives are WORSE than the worst positive for this query
        worst_pos = pos[pos["query_id"] == qid]["cos"].min()
        assert (grp["cos"] <= worst_pos + 1e-12).all()


def test_random_projection_arrow_path_null_embedding(spark):
    """Review r5/r6: BOTH physical paths must degrade a NULL embedding
    to SQL NULL (the codegen path used to emit an array of NULL
    components there), not crash the scan."""
    rows = [(1, [1.0] * 8), (2, None), (3, [2.0] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for max_cells in (1, 16384):  # 1 -> Arrow path, 16384 -> codegen
        out = (
            sim.random_projection(
                df, out_dim=4, dim=8, codegen_max_cells=max_cells
            )
            .toPandas().set_index("vec_id").sort_index()
        )
        assert out.loc[2, "projected"] is None, max_cells
        assert out.loc[1, "projected"] is not None, max_cells
        assert len(out.loc[3, "projected"]) == 4, max_cells


def test_embedding_profile_dirty_corpus(spark):
    """The pre-flight report must count NULL / wrong-dim / non-finite /
    zero vectors separately and compute norm stats over clean rows only."""
    from polars_mas_spark.operators.profile import embedding_profile

    rows = [
        (1, [3.0, 4.0]),            # norm 5
        (2, [0.0, 0.0]),            # zero vector (clean, norm 0)
        (3, None),                  # NULL
        (4, [1.0]),                 # wrong dim
        (5, [float("nan"), 1.0]),   # non-finite
        (6, [float("inf"), 1.0]),   # non-finite
        (7, [None, 1.0]),           # NULL component -> non-finite bucket
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_profile(df, "embedding", expected_dim=2).collect()[0]
    assert r.n_rows == 7 and r.n_null == 1 and r.n_wrong_dim == 1
    # r5 advice: a vector with a NULL component must land in exactly
    # one category (non-finite), not vanish via NULL predicate logic.
    assert r.n_nonfinite == 3 and r.n_zero == 1
    assert r.norm_min == 0.0 and r.norm_max == 5.0 and r.dim == 2


def test_knn_graph_recall_and_degree(emb, spark):
    """Every node gets <= k edges ranked 1..k; approximate neighbors
    reach minimum recall against the exact per-node brute force."""
    got = sim.knn_graph(emb, k=5, n_centroids=8, n_probe=4).toPandas()
    assert (got.groupby("query_id")["rank"].max() <= 5).all()
    assert (got.groupby("query_id")["rank"].apply(
        lambda s: sorted(s) == list(range(1, len(s) + 1)))).all()
    assert not (got["query_id"] == got["neighbor_id"]).any()
    exact = _topk_sets(
        sim.brute_force_topk(emb, emb, k=5)
    )
    approx = {
        q: set(g["neighbor_id"]) for q, g in got.groupby("query_id")
    }
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"knn_graph recall@5 too low: {hits/total:.2f}"


def test_knn_label_vote_planted_clusters(spark):
    """Two tight planted clusters with one mislabeled point: label
    propagation predicts every point's cluster label and flags exactly
    the mislabeled one."""
    import numpy as np

    rng = np.random.RandomState(3)
    rows = []
    for i in range(12):
        v = (np.array([10.0, 0.0, 0.0, 0.0]) + rng.normal(0, 0.05, 4)).tolist()
        rows.append((i, [float(x) for x in v], 0))
    for i in range(12, 24):
        v = (np.array([0.0, 10.0, 0.0, 0.0]) + rng.normal(0, 0.05, 4)).tolist()
        rows.append((i, [float(x) for x in v], 1))
    # one point geometrically in cluster 0 but labeled 1
    rows.append((99, [10.0, 0.01, 0.0, 0.0], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = sim.knn_label_vote(df, "label", k=5, n_centroids=2, n_probe=2)
    got = {r.query_id: r for r in out.collect()}
    assert len(got) == 25
    disagree = {i for i, r in got.items() if not r.agrees}
    assert disagree == {99}
    assert got[99].pred_label == 0 and got[99].own_label == 1


def test_knn_label_vote_total_with_isolated_vector(spark):
    """A vector with zero graph edges still gets a verdict row (NULL
    pred_label, 0 votes, NULL agrees) — the audit never loses rows."""
    rows = [
        (1, [10.0, 0.0], 0),
        (2, [10.0, 0.1], 0),
        (3, [9.9, 0.0], 0),
        # isolated: opposite direction, alone in its cluster
        (99, [-10.0, -10.0], 5),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r.query_id: r for r in sim.knn_label_vote(
        df, "label", k=2, n_centroids=2, n_probe=1).collect()}
    assert set(out) == {1, 2, 3, 99}
    iso = out[99]
    if iso.votes == 0:
        assert iso.pred_label is None and iso.agrees is None
    else:
        # if the probe still finds neighbors, the row must be complete
        assert iso.pred_label is not None


def test_knn_graph_zero_vector_forms_no_edges(spark):
    """A zero-norm embedding must never appear as anyone's neighbor
    (NaN cosine would otherwise rank it first), and unlabeled
    neighbors don't vote in knn_label_vote."""
    rows = [
        (1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [1.0, 0.1], None),
        (4, [0.0, 0.0], 7),                     # zero vector
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    g = sim.knn_graph(df, k=3, n_centroids=1, n_probe=1).collect()
    assert all(r.neighbor_id != 4 for r in g)
    assert all(r.query_id != 4 for r in g)
    lv = {r.query_id: r for r in
          sim.knn_label_vote(df, "label", k=3, n_centroids=1, n_probe=1)
          .collect()}
    assert set(lv) == {1, 2, 3, 4}
    assert lv[4].votes == 0 and lv[4].pred_label is None
    # doc 3 (NULL label) votes for no one; docs 1/2 predict from each
    # other only
    assert lv[1].pred_label == 0 and lv[2].pred_label == 0
