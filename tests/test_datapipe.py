"""Datapipe operators vs the DuckDB oracle at sf0.001 (fast subset —
the full 29-query sweep runs via tools/oracle_check.py at sf0.01)."""
import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
FAST = [
    "dedup_exact", "dedup_minhash_signatures", "dedup_lsh_pairs",
    "dedup_simhash", "text_langid", "text_quality_score",
    "text_fingerprints", "ann_ivf_cell_topk", "media_features",
    "rl_dict_build", "rl_mention_pairs",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(spark, duck, name):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from oracle_check import normalize_rows
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    df = fn(spark, SF_DIR)
    sc, sr = normalize_rows(df.columns, [tuple(r) for r in df.collect()])
    res = duck.execute(sql)
    dc, dr = normalize_rows([d[0] for d in res.description], res.fetchall())
    assert sc == dc
    assert len(sr) == len(dr)
    assert sr == dr


def test_multimodal_strict_raises():
    from semlink.datapipe.multimodal import decode_image_stub
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"abc", strict=True)


def test_multimodal_batch_shape(spark):
    from semlink.datapipe.multimodal import (extract_media_features,
                                             synthesize_media)
    d = spark.createDataFrame([(1, "hello world"), (2, "")],
                              "doc_id long, text string")
    feats = extract_media_features(synthesize_media(d)).collect()
    assert len(feats) == 2
    for r in feats:
        assert 1 <= r.fake_width <= 64 and 1 <= r.fake_channels <= 4
        assert r.n_bytes == 16 and len(r.digest) == 32


def test_lsh_s_curve_parameterization(spark):
    """Sweeping (bands, rows_per_band) must move the capture threshold
    as P(candidate) = 1 - (1 - s^r)^b predicts: (b=4, r=2) has s*=0.50
    and captures J≈0.67 pairs but not J≈0.14 pairs; (b=2, r=4) has
    s*≈0.84 and captures markedly fewer of the J≈0.67 pairs."""
    from semlink.datapipe.dedup import (lsh_buckets, lsh_candidate_pairs,
                                        minhash_signatures)

    n_pairs = 60
    rows = []
    for i in range(n_pairs):
        base = [f"t{i}_{j}" for j in range(40)]
        hi = base[:32] + [f"h{i}_{j}" for j in range(8)]    # J = 32/48 ≈ 0.67
        lo = base[:10] + [f"l{i}_{j}" for j in range(30)]   # J = 10/70 ≈ 0.14
        rows.append((4 * i + 0, " ".join(base)))
        rows.append((4 * i + 1, " ".join(hi)))
        rows.append((4 * i + 2, " ".join(base)))   # twin base for the lo pair
        rows.append((4 * i + 3, " ".join(lo)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def capture_rates(bands, rpb):
        sigs = minhash_signatures(docs, k=bands * rpb, shingle_n=1)
        pairs = lsh_candidate_pairs(lsh_buckets(sigs, bands=bands,
                                                rows_per_band=rpb))
        got = {(r.left_id, r.right_id) for r in pairs.collect()}
        hi_rate = sum((4 * i, 4 * i + 1) in got for i in range(n_pairs)) / n_pairs
        lo_rate = sum((4 * i + 2, 4 * i + 3) in got for i in range(n_pairs)) / n_pairs
        return hi_rate, lo_rate

    hi_a, lo_a = capture_rates(4, 2)   # s* = 0.50: theory hi≈0.90 lo≈0.08
    hi_b, lo_b = capture_rates(2, 4)   # s* = 0.84: theory hi≈0.36 lo≈0.0008
    assert hi_a >= 0.75, f"loose LSH missed high-J pairs: {hi_a}"
    assert lo_a <= 0.30, f"loose LSH captured low-J pairs: {lo_a}"
    assert hi_b <= hi_a - 0.2, f"tight LSH should capture fewer: {hi_b} vs {hi_a}"
    assert lo_b <= 0.10, f"tight LSH captured low-J pairs: {lo_b}"
