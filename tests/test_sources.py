"""S1/S4: typed CSV/JSONL sources round-trip the fixture tables."""
from semlink.sources import read_raw_links_csv, read_transcripts_json


def test_csv_raw_links_roundtrip(spark, fx_tiny_dfs, tmp_path):
    src = str(tmp_path / "raw_links_csv")
    fx_tiny_dfs["raw_links"].coalesce(1).write.option("header", "true").csv(src)
    back = read_raw_links_csv(spark, src)
    assert back.schema == fx_tiny_dfs["raw_links"].schema
    a, b = fx_tiny_dfs["raw_links"], back
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_jsonl_transcripts_roundtrip(spark, fx_tiny_dfs, tmp_path):
    src = str(tmp_path / "tr_json")
    fx_tiny_dfs["transcripts"].coalesce(1).write.json(src)
    back = read_transcripts_json(spark, src)
    a = fx_tiny_dfs["transcripts"].select("conv_id", "turn_idx", "text")
    b = back.select("conv_id", "turn_idx", "text")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
