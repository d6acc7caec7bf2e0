"""M1-M3/S7/X7/J4: feature assembly, model artifact round-trip,
vectorized logistic application, and a fit that actually separates the
fixture's true/false senses."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from semlink.learning import (FEATURE_COLS, apply_model, assemble_features,
                              fit_logistic, load_model, save_model)
from semlink.linking import (attach_page_features, candidate_join,
                             generate_mentions)


@pytest.fixture(scope="module")
def feat_cands(spark, fx_tiny_dfs):
    d = fx_tiny_dfs
    cands = candidate_join(generate_mentions(d["transcripts"]), d["anchors"])
    cands = attach_page_features(cands, d["pages"])
    return assemble_features(cands).cache()


def test_feature_vector_shape(feat_cands):
    r = feat_cands.first()
    assert len(r.features) == len(FEATURE_COLS)
    assert r.f_inlinks is not None


def test_model_roundtrip_and_apply(spark, tmp_path, feat_cands):
    w = np.arange(len(FEATURE_COLS), dtype="float64") / 10.0
    save_model(spark, w, -1.0, str(tmp_path / "m"))
    w2, b2 = load_model(spark, str(tmp_path / "m"))
    assert np.allclose(w, w2) and b2 == -1.0

    scored = apply_model(feat_cands, w2, b2)
    rows = scored.select("features", "learning_score").limit(50).collect()
    for r in rows:
        z = float(np.dot(np.array(r.features), w2) + b2)
        assert abs(r.learning_score - 1.0 / (1.0 + np.exp(-z))) < 1e-9


def test_fit_separates_true_senses(spark, feat_cands, fx_tiny_dfs):
    # label = candidate target equals ground-truth entity
    j = (feat_cands.alias("c")
         .join(fx_tiny_dfs["mentions_gt"].alias("g"), "mention_id")
         .withColumn("y", (F.col("c.target_id") == F.col("g.true_entity"))
                     .cast("double"))
         .select("features", "y").limit(2000).collect())
    X = np.array([r.features for r in j])
    y = np.array([r.y for r in j])
    w, b = fit_logistic(X, y)
    p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    acc = ((p > 0.5) == (y > 0.5)).mean()
    assert acc >= 0.8, acc
