"""Generate constant DuckDB oracles for the fixture-pipeline queries
(semlink/golden_oracles.json). The fixture generator is seed-pure, so
its expected clusters / F1 constants ARE the oracle — pinned here as
literal SQL so the driver's DuckDB side can verify the full transcript
pipeline end-to-end."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semlink.fixtures import generate  # noqa: E402


def main():
    fx = generate("tiny")
    values = ",\n    ".join(
        f"('{m}', '{c}')" for m, c in sorted(fx.expected_clusters))
    clusters_sql = (
        "SELECT * FROM (VALUES\n    " + values +
        "\n) AS t(mention_id, cluster_id)")

    n_true = sum(1 for p in fx.labeled_pairs if p[3])
    n = len(fx.labeled_pairs)
    f1_sql = (f"SELECT CAST({n_true} AS BIGINT) AS tp, CAST(0 AS BIGINT) AS fp, "
              f"CAST(0 AS BIGINT) AS fn, CAST({n} AS BIGINT) AS n, "
              f"CAST(1000000 AS BIGINT) AS f16")

    out = {"pipeline_fixture_clusters": clusters_sql,
           "pipeline_fixture_f1": f1_sql}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "semlink", "golden_oracles.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(fx.expected_clusters)} cluster rows, "
          f"f1 constants tp={n_true} n={n}")


if __name__ == "__main__":
    main()
