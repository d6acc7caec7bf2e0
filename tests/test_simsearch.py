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
