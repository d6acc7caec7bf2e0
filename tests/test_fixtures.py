"""Fixture invariants (FIXTURES.md §1, §3, §5)."""
from collections import Counter

from semlink.fixtures import generate


def test_deterministic():
    a, b = generate("tiny"), generate("tiny")
    assert a.transcripts == b.transcripts
    assert a.anchors == b.anchors
    assert a.labeled_pairs == b.labeled_pairs


def test_transcript_invariants(fx_tiny):
    seen = set()
    last_ts = {}
    for conv_id, turn_idx, role, text, tool, ts in fx_tiny.transcripts:
        assert (conv_id, turn_idx) not in seen
        seen.add((conv_id, turn_idx))
        assert role in ("user", "assistant", "tool")
        assert (tool is not None) == (role == "tool")
        if conv_id in last_ts:
            assert ts > last_ts[conv_id]
        last_ts[conv_id] = ts


def test_ground_truth_spans_match_text(fx_tiny):
    text_of = {(t[0], t[1]): t[3] for t in fx_tiny.transcripts}
    for (mid, conv, ti, start, length, surf, anch, ent) in fx_tiny.mentions_gt:
        toks = text_of[(conv, ti)].split()
        assert toks[start:start + length] == surf.split(), mid


def test_dictionary_math(fx_tiny):
    for (anorm, ent, title, slc, alt, att, ft, fr) in fx_tiny.anchors:
        assert 0 < slc <= alt <= att
    # priors per anchor sum to 1
    totals = {}
    for (anorm, ent, title, slc, alt, att, ft, fr) in fx_tiny.anchors:
        totals.setdefault(anorm, [0, alt])[0] += slc
    for anorm, (s, alt) in totals.items():
        assert s == alt, anorm


def test_labeled_pairs_have_hard_negatives(fx_tiny):
    labels = Counter(p[3] for p in fx_tiny.labeled_pairs)
    total = sum(labels.values())
    assert total >= 200
    assert labels[False] / total >= 0.05  # hard negatives exist (tiny scale)


def test_labeled_pairs_small_scale_coverage():
    fx = generate("small")
    labels = Counter(p[3] for p in fx.labeled_pairs)
    total = sum(labels.values())
    assert total >= 5000
    assert labels[False] / total >= 0.20


def test_expected_clusters_consistent(fx_tiny):
    cl = dict(fx_tiny.expected_clusters)
    gt = {m[0]: (m[6], m[7]) for m in fx_tiny.mentions_gt}
    assert set(cl) == set(gt)
    # same (block, entity) ⇒ same cluster; different ⇒ different
    by_key = {}
    for mid, key in gt.items():
        by_key.setdefault(key, set()).add(cl[mid])
    for key, cids in by_key.items():
        assert len(cids) == 1
    assert len({c for c in cl.values()}) == len(by_key)
