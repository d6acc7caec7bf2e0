"""Embedding similarity search: brute-force vs IVF-cell agreement,
near-dup edges feed the CC machinery."""
import hashlib

import pytest
from pyspark.sql import functions as F

from semlink.datapipe.simsearch import (brute_force_topk,
                                        cosine_near_dup_edges, ivf_topk)


def _vec(seed, dim=16, jitter=0.0):
    h = hashlib.md5(seed.encode()).digest() * 4
    base = [(b - 127.5) / 127.5 for b in h[:dim]]
    if jitter:
        return [v + jitter * ((i % 3) - 1) * 0.01 for i, v in enumerate(base)]
    return base


@pytest.fixture(scope="module")
def emb(spark):
    rows = []
    for i in range(40):
        rows.append((i, _vec(f"v{i % 10}", jitter=float(i >= 10)), i % 4))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cell int").cache()


def test_near_dup_edges_cluster(spark, emb, tmp_path):
    q = emb.select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("q_emb"))
    c = emb.select(F.col("vec_id").alias("cand_id"),
                   F.col("embedding").alias("c_emb"))
    edges = cosine_near_dup_edges(c, q, threshold=0.999)
    e = edges.collect()
    assert len(e) > 0
    # vectors built from the same seed (i%10) must be near-dups
    for r in e:
        assert r.src % 10 == r.dst % 10

    from semlink.cluster import run_connected_components
    sedges = edges.select(
        F.format_string("v%03d", "src").alias("src"),
        F.format_string("v%03d", "dst").alias("dst"))
    labels = run_connected_components(sedges, ckpt_dir=str(tmp_path / "cc"))
    got = {r.mention_id: r.cluster_id for r in labels.collect()}
    # all members of one seed group share a cluster
    by_seed = {}
    for m, cl in got.items():
        by_seed.setdefault(int(m[1:]) % 10, set()).add(cl)
    for seed, cls in by_seed.items():
        assert len(cls) == 1


def test_ivf_subset_of_brute_force(spark, emb):
    q = emb.filter("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"),
        "cell")
    c = emb.select(F.col("vec_id").alias("cand_id"),
                   F.col("embedding").alias("c_emb"), "cell")
    bf = {(r.query_id, r.cand_id): r.sim6
          for r in brute_force_topk(c.drop("cell"), q.drop("cell"), k=39).collect()}
    ivf = ivf_topk(c, q, k=5).collect()
    cells = {r.vec_id: r.cell for r in emb.collect()}
    for r in ivf:
        assert cells[r.query_id] == cells[r.cand_id]   # cell-restricted
        assert bf[(r.query_id, r.cand_id)] == r.sim6    # same similarity


def test_kmeans_centroids_deterministic_and_useful(spark, emb):
    """Lloyd refinement must be bit-deterministic run to run (scaled
    bigint averaging) and assign same-seed vectors to the same cell."""
    from semlink.datapipe.simsearch import assign_cells, kmeans_centroids

    c1 = kmeans_centroids(emb, k=6, iters=3)
    c2 = kmeans_centroids(emb, k=6, iters=3)
    r1 = sorted((r.cell, tuple(r.c_emb)) for r in c1.collect())
    r2 = sorted((r.cell, tuple(r.c_emb)) for r in c2.collect())
    assert r1 == r2    # bit-identical

    a = assign_cells(emb.select("vec_id", "embedding"), c1, "vec_id")
    cells = {r.vec_id: r.cell for r in a.collect()}
    assert len(cells) == emb.count()     # every vector assigned once
    # same-seed groups (i % 10) are near-identical vectors → same cell
    for i in range(40):
        assert cells[i] == cells[i % 10]


def test_ivf_kmeans_recall_vs_brute_force(spark):
    """IVF with learned centroids: recall@5 vs brute force at nprobe=2
    on the sf0.001 embeddings table (real data, 64-dim)."""
    from pyspark.sql import functions as F

    from semlink.datapipe.simsearch import (assign_cells, brute_force_topk,
                                            ivf_topk, kmeans_centroids)

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_centroids(e, k=8, iters=3)
    a_q = assign_cells(e.filter("vec_id < 20").select("vec_id", "embedding"),
                       cents, "vec_id", nprobe=2)
    a_c = assign_cells(e.select("vec_id", "embedding"), cents, "vec_id",
                       nprobe=1)
    q = a_q.select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("q_emb"), "cell")
    c = a_c.select(F.col("vec_id").alias("cand_id"),
                   F.col("embedding").alias("c_emb"), "cell")
    ivf = ivf_topk(c, q, k=5).dropDuplicates(["query_id", "cand_id"])

    bfq = e.filter("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    bfc = e.select(F.col("vec_id").alias("cand_id"),
                   F.col("embedding").alias("c_emb"))
    bf = brute_force_topk(bfc, bfq, k=5)

    truth = {(r.query_id, r.cand_id) for r in bf.collect()}
    got = {(r.query_id, r.cand_id) for r in ivf.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"IVF recall@5 too low: {recall}"


def test_near_dup_edges_ivf_matches_exact(spark, emb):
    """The cell-routed near-dup edge builder must recover the exact
    cross-join edge set at a high threshold (near-identical vectors
    share their top cell by construction)."""
    from pyspark.sql import functions as F

    from semlink.datapipe.simsearch import (cosine_near_dup_edges,
                                            cosine_near_dup_edges_ivf,
                                            kmeans_centroids)

    q = emb.select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("q_emb"))
    c = emb.select(F.col("vec_id").alias("cand_id"),
                   F.col("embedding").alias("c_emb"))
    exact = {(r.src, r.dst) for r in
             cosine_near_dup_edges(c, q, threshold=0.999).collect()}

    cents = kmeans_centroids(emb, k=4, iters=2)
    got = {(r.src, r.dst) for r in
           cosine_near_dup_edges_ivf(emb, cents, threshold=0.999,
                                     nprobe=2).collect()}
    assert got == exact
    assert len(exact) > 0


def test_cosine_impls_agree(spark):
    """The three cosine implementations (HOF fold, Arrow numpy, unrolled
    codegen) produce the same sim6 on random-ish vectors, nulls, and
    zero vectors."""
    from pyspark.sql import functions as F

    from semlink.datapipe.simsearch import cosine_similarity

    rows = []
    for i in range(50):
        a = [((i * 7 + j) % 13 - 6) / 7.0 for j in range(8)]
        b = [((i * 11 + 3 * j) % 17 - 8) / 9.0 for j in range(8)]
        rows.append((i, a, b))
    rows.append((50, [0.0] * 8, [1.0] * 8))     # zero vector
    df = spark.createDataFrame(
        rows, "id int, q_emb array<double>, c_emb array<double>")
    df = df.unionByName(spark.createDataFrame(
        [(51, None, [1.0] * 8)],
        "id int, q_emb array<double>, c_emb array<double>"))

    outs = {}
    for impl in ("sql", "arrow", "fixed"):
        col = cosine_similarity("q_emb", "c_emb", impl=impl,
                                dim=8 if impl == "fixed" else None)
        outs[impl] = {r.id: r.s6 for r in df.select(
            "id", F.round(col * 1_000_000).cast("bigint").alias("s6"))
            .collect()}
    assert outs["sql"] == outs["arrow"] == outs["fixed"]
    assert outs["sql"][50] == 0 and outs["sql"][51] == 0


def test_embed_text_properties(spark):
    """Feature-hashed embedding: unit norm for non-empty docs, zero
    vector for empty/null docs, identical text -> identical vector,
    and shared-token docs are far more similar than disjoint ones."""
    import math

    from semlink.datapipe.simsearch import EMBED_DIM, embed_text

    base = " ".join(f"tok{i}" for i in range(40))
    para = " ".join(f"tok{i}" for i in range(36)) + " alt0 alt1 alt2 alt3"
    other = " ".join(f"zzz{i}" for i in range(40))
    d = spark.createDataFrame(
        [(1, base), (2, base), (3, para), (4, other), (5, ""), (6, None)],
        "doc_id long, text string")
    v = {r.doc_id: list(r.embedding) for r in embed_text(d).collect()}

    assert all(len(e) == EMBED_DIM for e in v.values())
    for i in (1, 3, 4):
        assert abs(math.sqrt(sum(x * x for x in v[i])) - 1.0) < 1e-5
    assert v[5] == [0.0] * EMBED_DIM and v[6] == [0.0] * EMBED_DIM
    assert v[1] == v[2]

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))
    assert cos(v[1], v[3]) > 0.75
    assert cos(v[1], v[3]) > cos(v[1], v[4]) + 0.4


def test_embed_to_ivf_near_dup_composition(spark):
    """Text-native ANN end-to-end (VERDICT r04 next #2): embed_text →
    seed centroids → cell-routed near-dup edges recovers every planted
    paraphrase twin pair and none of the unrelated pairs."""
    from pyspark.sql import functions as F

    from semlink.datapipe.simsearch import (cosine_near_dup_edges_ivf,
                                            embed_text, seed_centroids)

    rows = []
    for i in range(30):
        toks = [f"w{i}_{j}" for j in range(30)]
        para = toks[:27] + [f"p{i}_{j}" for j in range(3)]  # ~90% shared
        rows.append((2 * i, " ".join(toks)))
        rows.append((2 * i + 1, " ".join(para)))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    emb = embed_text(d).select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = seed_centroids(emb, k=4)
    # 30 signed tokens into 32 buckets: collisions put twin cosines in
    # ~[0.70, 0.95] while disjoint-vocabulary cosines stay near 0, so a
    # 0.65 threshold separates cleanly at this dim
    edges = cosine_near_dup_edges_ivf(emb, cents, threshold=0.65)
    got = {(r.src, r.dst) for r in edges.collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(30)}
    assert planted <= got, f"missed {sorted(planted - got)[:5]}"
    # unrelated docs use disjoint vocabularies: no cross-doc edges
    extra = got - planted
    assert not extra, f"spurious edges {sorted(extra)[:5]}"


def test_pq_matches_numpy_mirror(spark):
    """The distributed PQ fit (per-subspace L2 Lloyd with lowest-id
    seeds and scaled-bigint determinism) reproduces an independent
    numpy mirror bit-exactly — codebooks, codes, and quantization
    errors — and identical vectors always share identical codes with
    equal additive errors."""
    import numpy as np

    from semlink.datapipe.simsearch import pq_codebooks, pq_codes

    rng = np.random.RandomState(5)
    base = rng.rand(40, 8)
    vecs = np.vstack([base, base[:10]])          # planted exact twins
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m, k, iters, dim = 2, 4, 2, 8
    cb = {(r.subspace, r.cell): np.array(r.c_emb)
          for r in pq_codebooks(df, dim=dim, m=m, k=k, iters=iters).collect()}
    got = {(r.vec_id, r.subspace): (r.code, r.d2_6)
           for r in pq_codes(
               df, spark.createDataFrame(
                   [(s, c, [float(x) for x in v])
                    for (s, c), v in cb.items()],
                   "subspace int, cell int, c_emb array<double>"),
               dim=dim, m=m).collect()}
    # numpy mirror with the same quantization discipline
    s = dim // m
    for j in range(m):
        sub = vecs[:, j * s:(j + 1) * s]
        cents = {c: sub[c].copy() for c in range(k)}   # lowest-id seeds
        for _ in range(iters):
            d2 = {c: np.round(
                ((sub - cents[c][None, :]) ** 2).sum(axis=1) * 1e6)
                for c in range(k)}
            assign = np.array([min(range(k), key=lambda c: (d2[c][i], c))
                               for i in range(len(sub))])
            for c in range(k):
                mask = assign == c
                if mask.any():
                    ssum = np.round(sub[mask] * 1e6).sum(axis=0)
                    cents[c] = ssum / mask.sum() / 1e6
        want_cb = {c: cents[c] for c in range(k)}
        for c in range(k):
            assert np.allclose(cb[(j, c)], want_cb[c], atol=0), (j, c)
        d2 = {c: np.round(
            ((sub - cents[c][None, :]) ** 2).sum(axis=1) * 1e6)
            for c in range(k)}
        for i in range(len(sub)):
            code = min(range(k), key=lambda c: (d2[c][i], c))
            assert got[(i, j)] == (code, int(d2[code][i])), (i, j)
    # exact twins share codes and errors in every subspace
    for i in range(10):
        for j in range(m):
            assert got[(i, j)] == got[(40 + i, j)]


def test_pq_adc_recall_vs_exact(spark):
    """ADC over PQ codes recovers most exact-L2 top-5 neighbors on a
    clustered corpus (recall@5 well above chance), the approximate
    distance equals the integer sum of the per-subspace LUT entries
    (spot-checked against an exact recomputation), and a query's
    planted twin is always its rank-1 neighbor (quantization cannot
    split identical codes)."""
    import numpy as np

    from semlink.datapipe.simsearch import (pq_adc_topk, pq_codebooks,
                                            pq_codes)

    rng = np.random.RandomState(11)
    centers = rng.rand(6, 16) * 4
    vecs = np.vstack([c + rng.rand(12, 16) * 0.3 for c in centers])
    vecs = np.vstack([vecs, vecs[:8]])          # twins of queries 0..7
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_codebooks(df, dim=16, m=4, k=8, iters=2)
    q_ = (df.filter("vec_id < 8")
          .select(df.vec_id.alias("query_id"),
                  df.embedding.alias("q_emb")))
    got = {}
    for r in pq_adc_topk(df, q_, cb, dim=16, m=4, k=5).collect():
        got.setdefault(r.query_id, []).append((r.rk, r.cand_id, r.ad2_6))
    n = len(vecs)
    hits = tot = 0
    for qi in range(8):
        d2 = ((vecs - vecs[qi][None, :]) ** 2).sum(axis=1)
        exact = [i for i in np.argsort(d2, kind="stable") if i != qi][:5]
        approx = [c for _rk, c, _d in sorted(got[qi])]
        assert approx[0] == 72 + qi            # twin is rank-1
        hits += len(set(exact) & set(approx))
        tot += 5
    assert hits / tot >= 0.6, f"ADC recall@5 {hits / tot}"
    # spot-check the integer LUT sum for one (query, cand)
    codes = {(r.vec_id, r.subspace): r.code
             for r in pq_codes(df, cb, dim=16, m=4).collect()}
    cents = {(r.subspace, r.cell): np.array(r.c_emb) for r in cb.collect()}
    qi, cand = 0, sorted(got[0])[0][1]
    want = 0
    for j in range(4):
        qsub = vecs[qi][j * 4:(j + 1) * 4]
        c = cents[(j, codes[(cand, j)])]
        want += int(np.round(((qsub - c) ** 2).sum() * 1e6))
    assert sorted(got[0])[0][2] == want


def test_ivfpq_matches_numpy_mirror(spark):
    """IVF-PQ reproduces an independent numpy mirror bit-exactly:
    cosine-argmax coarse routing over lowest-id seeds, residual
    subtraction, then the per-subspace L2 Lloyd fit and encoding —
    every (cell, code, d2_6) triple. (An aggregate residual-vs-plain
    error claim is deliberately NOT asserted: with m*k cells matching
    the cluster count, plain PQ can legitimately win — whether
    residuals help depends on the coarse quantizer's fit.)"""
    import numpy as np

    from semlink.datapipe.simsearch import ivfpq_codes

    rng = np.random.RandomState(21)
    centers = rng.rand(8, 16) * 6
    vecs = np.vstack([centers[i % 8] + rng.rand(16) * 0.4
                      for i in range(120)])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m, k, iters, dim, ck = 4, 8, 2, 16, 8
    got = {(r.vec_id, r.subspace): (r.cell, r.code, r.d2_6)
           for r in ivfpq_codes(df, dim=dim, coarse_k=ck, m=m, k=k,
                                iters=iters).collect()}
    # mirror: coarse cosine argmax over the ck lowest-id vectors
    seeds = vecs[:ck]

    def cos6(x, c):
        return round(float(x @ c / (np.linalg.norm(x) * np.linalg.norm(c)))
                     * 1e6)

    cell_of = {}
    resid = np.empty_like(vecs)
    for i, v in enumerate(vecs):
        cell = max(range(ck), key=lambda c: (cos6(v, seeds[c]), -c))
        cell_of[i] = cell
        resid[i] = v - seeds[cell]
    s_ = dim // m
    for j in range(m):
        sub = resid[:, j * s_:(j + 1) * s_]
        cents = {c: sub[c].copy() for c in range(k)}
        for _ in range(iters):
            d2 = {c: np.round(((sub - cents[c][None, :]) ** 2).sum(axis=1)
                              * 1e6) for c in range(k)}
            assign = np.array([min(range(k), key=lambda c: (d2[c][i], c))
                               for i in range(len(sub))])
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = (np.round(sub[mask] * 1e6).sum(axis=0)
                                / mask.sum() / 1e6)
        d2 = {c: np.round(((sub - cents[c][None, :]) ** 2).sum(axis=1)
                          * 1e6) for c in range(k)}
        for i in range(len(sub)):
            code = min(range(k), key=lambda c: (d2[c][i], c))
            assert got[(i, j)] == (cell_of[i], code, int(d2[code][i])), (i, j)
