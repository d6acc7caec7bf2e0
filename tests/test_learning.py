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


def test_boosted_stumps_distributed_matches_numpy_mirror(spark):
    """The distributed AdaBoost stump fit must reproduce a driver-side
    numpy mirror EXACTLY (same stumps, same alphas) — the scaled-bigint
    weight protocol makes every Spark aggregation integer-exact, so
    there is no float-summation-order wiggle room — and reach ≥0.9
    training accuracy on the separable toy."""
    import numpy as np
    from pyspark.sql import functions as F

    from semlink.learning import fit_boosted_stumps, stump_score_expr

    d = (spark.range(200).select(
        "id",
        (((F.col("id") * 7) % 32 + 1) / 32.0).alias("x0"),
        (((F.col("id") * 13) % 97) / 97.0).alias("x1"),
        (((F.col("id") * 29) % 53) / 53.0).alias("x2"))
        .withColumn("y", F.when((2.0 * F.col("x0") - F.col("x1")
                                 + 0.5 * F.col("x2")) > 0.7, 1).otherwise(-1)))
    got = fit_boosted_stumps(d, ["x0", "x1", "x2"], "y", rounds=6)
    assert got == _ada_mirror(*_toy_xy(200))

    scored = d.withColumn(
        "margin", stump_score_expr(got, ["x0", "x1", "x2"]))
    acc = (scored.select(
        (F.when(F.col("margin") > 0, 1).otherwise(-1) == F.col("y"))
        .cast("int").alias("ok")).agg(F.avg("ok")).first()[0])
    assert acc >= 0.9, acc


def _toy_xy(n):
    import numpy as np
    ids = np.arange(n)
    X = np.stack([((ids * 7) % 32 + 1) / 32.0,
                  ((ids * 13) % 97) / 97.0,
                  ((ids * 29) % 53) / 53.0], axis=1)
    y = np.where(2 * X[:, 0] - X[:, 1] + 0.5 * X[:, 2] > 0.7, 1, -1)
    return X, y


def _ada_mirror(X, y, rounds=6, thresholds=tuple(i / 20 for i in range(1, 20))):
        n, k = X.shape
        w9 = np.full(n, 10 ** 9, dtype=np.int64)
        out = []
        for rnd in range(rounds):
            total9 = int(w9.sum())
            best = None
            for f in range(k):
                for t in thresholds:
                    pred = np.where(X[:, f] > t, 1, -1)
                    e = int(w9[pred != y].sum())
                    for pol, err in ((1, e), (-1, total9 - e)):
                        key = (err, f, t, pol)
                        if best is None or key < best:
                            best = key
            err9, f, t, pol = best
            err9 = min(max(err9, 1), total9 - 1)
            alpha = 0.5 * float(np.log((total9 - err9) / err9))
            out.append({"rnd": rnd, "f_idx": f, "thr": t,
                        "polarity": pol, "alpha": alpha})
            pred = pol * np.where(X[:, f] > t, 1, -1)
            up = np.where(pred != y, np.exp(alpha), np.exp(-alpha))
            # floor(x+0.5): HALF_UP like Spark's F.round (np.round is
            # banker's half-to-even and would diverge on exact .5)
            w9 = np.floor(w9 * up + 0.5).astype(np.int64)
            t9 = int(w9.sum())
            w9 = np.maximum(1, np.floor(w9 * (n * 1e9 / t9)
                                        + 0.5)).astype(np.int64)
        return out


def test_boosted_stumps_large_sample_single_pass(spark):
    """10^4-sample fit: still bit-identical to the numpy mirror, and
    the folded aggregation (VERDICT r04 next #6) holds the per-round
    driver traffic to the |grid|-row error table — total weight now
    rides in the same collect instead of its own action."""
    from pyspark.sql import functions as F

    from semlink.learning import fit_boosted_stumps

    n = 10_000
    d = (spark.range(n).select(
        "id",
        (((F.col("id") * 7) % 32 + 1) / 32.0).alias("x0"),
        (((F.col("id") * 13) % 97) / 97.0).alias("x1"),
        (((F.col("id") * 29) % 53) / 53.0).alias("x2"))
        .withColumn("y", F.when((2.0 * F.col("x0") - F.col("x1")
                                 + 0.5 * F.col("x2")) > 0.7, 1).otherwise(-1)))
    got = fit_boosted_stumps(d, ["x0", "x1", "x2"], "y", rounds=4)
    assert len(got) == 4 and [s["rnd"] for s in got] == [0, 1, 2, 3]
    assert got == _ada_mirror(*_toy_xy(n), rounds=4)
