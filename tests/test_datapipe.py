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
