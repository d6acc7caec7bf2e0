"""North-rule launch mode: the pipeline must run via
`spark-submit --py-files semlink.zip` (the cluster deployment shape),
not only via importable-library sessions."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_end_to_end(spark, fx_tiny_dfs, tmp_path):
    data = tmp_path / "in"
    for name in ("transcripts", "anchors", "page_links", "labeled_pairs"):
        fx_tiny_dfs[name].coalesce(2).write.parquet(str(data / name))

    subprocess.run(["sh", os.path.join(REPO, "tools", "make_pyfiles.sh")],
                   check=True, capture_output=True)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)    # the engine must come from the zip
    env["PYSPARK_PYTHON"] = sys.executable
    p = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", os.path.join(REPO, "semlink.zip"),
         os.path.join(REPO, "tools", "submit_pipeline.py"),
         "--transcripts", str(data / "transcripts"),
         "--anchors", str(data / "anchors"),
         "--page-links", str(data / "page_links"),
         "--labeled-pairs", str(data / "labeled_pairs"),
         "--ckpt", str(tmp_path / "ckpt"),
         "--out", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))   # cwd outside the repo: no accidental imports
    assert p.returncode == 0, p.stderr[-2000:]
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["f1"]["f1"] == 1.0
    assert os.path.exists(tmp_path / "out" / "clusters.parquet" / "_SUCCESS")
    assert os.path.exists(tmp_path / "out" / "metrics_stages.parquet" / "_SUCCESS")
