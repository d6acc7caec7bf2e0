"""Deterministic synthetic fixtures (FIXTURES.md).

Everything is seed-pure: all "randomness" is md5 of strings, so two
generations are byte-identical regardless of process, platform or
Python hash seed. No wall clock, no `random` module.

The generator designs the data so that the golden clustering is exactly
reachable by the documented pipeline semantics (blocking on normalized
anchors + prior×context scoring + connected components), while a naive
"same block key ⇒ same cluster" baseline FAILS (ambiguous anchors put
hard negatives inside blocks) — making the F1≥0.99 gate meaningful.
See SURVEY.md §5.1.

Fixture knobs worth knowing:
- ~30% of anchors ambiguous (2-3 senses, priors ~0.85/0.10/0.05);
- every minority-sense injection is accompanied in-conversation by a
  cue mention whose entity shares inlinks only with the true sense
  (context-overlap disambiguation, Milne-Witten style);
- one hot anchor covers ~5% of mentions (skew/salting exercise);
- one anchor with 50 senses (dictionary-side fan-out);
- ~10% of injected surfaces are accented/dashed/cased variants
  (normalization exercise — blocking keys must still collide).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from datetime import datetime, timezone

# ---------------------------------------------------------------- utils

def _h(s: str) -> int:
    """Deterministic 48-bit hash of a string (md5 prefix)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)


def _pick(seq, key: str):
    return seq[_h(key) % len(seq)]


def _rand(key: str) -> float:
    return _h(key) / float(1 << 48)


# ---------------------------------------------------------------- vocab

FILLER = (
    "the a of to and in is was for on with at by from it that this not "
    "you we they he she but or if then so all some any each more most "
    "other into over under again once here there when where why how "
    "what which who whom can will just should now very too also after "
    "before between during without within along across behind beyond "
    "plus minus near far deep high low long short wide"
).split()

# words used to build entity titles / primary surfaces (disjoint from FILLER)
SURF = (
    "amber basalt cobalt dune ember falcon garnet harbor iris jade "
    "kestrel lagoon marble nectar onyx pinewood quartz raven sable topaz "
    "umber violet willow xenon yarrow zephyr anchor beacon cinder delta "
    "echo fjord glacier hollow inlet juniper knoll lichen meadow nimbus "
    "orchid prairie quarry ridge summit thicket upland vale wharf yonder "
    "zenith atrium bramble cascade dell estuary foxglove grotto heath "
    "islet jetty karst ledge mesa nook oxbow pampas quay reef shoal "
    "tarn ursa vortex wicket xylem yucca zircon arbor bluff cove drift"
).split()

# single-word ambiguous anchors (disjoint from SURF and FILLER)
AMB = (
    "mercury phoenix atlas titan orion vega polaris sirius lyra draco "
    "hydra pegasus cygnus aquila corvus gemini taurus leo libra aries "
    "scorpio pisces"
).split()

LEGION_ANCHOR = "legion"          # the 50-sense anchor
ACCENT_MAP = str.maketrans({"a": "á", "e": "é", "o": "ö", "u": "ü", "c": "ç"})

_BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp()


# ---------------------------------------------------------------- model

@dataclass
class Fixture:
    scale: str
    # rows (lists of tuples) with fixed column orders, see schemas below
    transcripts: list = field(default_factory=list)
    raw_links: list = field(default_factory=list)
    anchors: list = field(default_factory=list)      # golden dictionary
    pages: list = field(default_factory=list)
    page_links: list = field(default_factory=list)
    mentions_gt: list = field(default_factory=list)  # ground truth
    labeled_pairs: list = field(default_factory=list)
    expected_clusters: list = field(default_factory=list)

    SCHEMAS = {
        "transcripts": "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        "raw_links": "doc_id long, anchor string, target_id long, is_link boolean",
        "anchors": ("anchor_norm string, target_id long, target_title string, "
                    "sense_link_count long, anchor_link_total long, anchor_text_total long, "
                    "from_title boolean, from_redirect boolean"),
        "pages": "target_id long, title string, inlink_count long, outlink_count long, is_redirect boolean",
        "page_links": "src_id long, dst_id long",
        "mentions_gt": ("mention_id string, conv_id string, turn_idx int, span_start int, "
                        "span_len int, surface string, anchor_norm string, true_entity long"),
        "labeled_pairs": "left_mention_id string, right_mention_id string, block_key string, label boolean",
        "expected_clusters": "mention_id string, cluster_id string",
    }


SCALES = {
    #         convs, entities, amb_groups
    "tiny":  (18,    60,       4),
    "small": (1100,  160,      17),
}


def _norm_py(s: str) -> str:
    """Python mirror of textnorm.normalize_expr — used ONLY to compute
    golden blocking keys inside the generator (test code cross-checks
    the Spark expression against this on golden pairs)."""
    import unicodedata
    s = "".join(" " if c in "-‐‑‒–—―" else c for c in s)
    s = unicodedata.normalize("NFKD", s)
    s = "".join(c for c in s if not unicodedata.combining(c))
    s = s.lower()
    s = "".join(c if (c.isascii() and (c.isalnum() or c == " ")) else "" for c in s)
    return " ".join(s.split())


def generate(scale: str = "tiny") -> Fixture:
    n_conv, n_ent, n_grp = SCALES[scale]
    fx = Fixture(scale=scale)

    # ---------------- entities, anchors, dictionary design ----------------
    titles = {}
    for e in range(n_ent):
        w1 = SURF[(e * 7) % len(SURF)]
        w2 = SURF[(e * 13 + 5) % len(SURF)]
        t = f"{w1} {w2}"
        if t in titles.values() or w1 == w2:
            t = f"{w1} {w2} {e}"
        titles[e] = t

    # ambiguity groups: anchor AMB[g] → senses (3g, 3g+1, 3g+2), priors 85/10/5
    amb_senses = {}          # anchor word -> [(entity, link_count), ...]
    for g in range(n_grp):
        a = AMB[g % len(AMB)]
        amb_senses[a] = [(3 * g, 85), (3 * g + 1, 10), (3 * g + 2, 5)]
    grp_entities = {e for ss in amb_senses.values() for e, _ in ss}
    n_legion = min(50, 3 * n_grp)
    legion_senses = [(j, 51 - (j % 50)) for j in range(n_legion)]

    # cue entities: cue(e) = e + n_ent//2 for every ambiguity-group sense
    cue_of = {e: e + n_ent // 2 for e in grp_entities}
    cue_entities = set(cue_of.values())
    hot_entity = n_ent - 1
    assert hot_entity not in cue_entities and hot_entity not in grp_entities

    # plain pool: unambiguous, non-cue, non-hot entities (conversation topics)
    plain = [e for e in range(n_ent)
             if e not in grp_entities and e not in cue_entities and e != hot_entity]

    # dictionary rows: (anchor_raw_variants, anchor_norm, senses, text_extra, flags)
    dict_spec = []  # (anchor_norm, [(entity, links)], text_extra, from_title, from_redirect)
    for e in range(n_ent):
        dict_spec.append((_norm_py(titles[e]), [(e, 20)], 5, True, False))
        if e % 7 == 2 and e in plain:  # 1-word redirect alias = first title word
            alias = titles[e].split()[0]
            if all(alias != sp[0] for sp in dict_spec):
                dict_spec.append((alias, [(e, 8)], 3, False, True))
    for a, senses in amb_senses.items():
        dict_spec.append((a, senses, 20, False, False))
    dict_spec.append((LEGION_ANCHOR, legion_senses, 30, False, False))

    # golden anchors table + raw_links corpus
    doc_seq = 0
    for anchor_norm, senses, extra, from_title, from_redirect in dict_spec:
        link_total = sum(c for _, c in senses)
        text_total = link_total + extra
        for ent, cnt in senses:
            fx.anchors.append((anchor_norm, ent, titles.get(ent, f"page {ent}"),
                               cnt, link_total, text_total, from_title, from_redirect))
            for j in range(cnt):
                # vary raw surface (case / accent / dash) to prove the
                # build job normalizes before aggregating
                raw = anchor_norm
                v = _h(f"rawvar:{anchor_norm}:{ent}:{j}") % 10
                if v == 0:
                    raw = raw.title()
                elif v == 1:
                    raw = raw.translate(ACCENT_MAP)
                elif v == 2 and " " in raw:
                    raw = raw.replace(" ", "-")
                fx.raw_links.append((doc_seq, raw, ent, True))
                doc_seq += 1
        for j in range(extra):
            fx.raw_links.append((doc_seq, anchor_norm, senses[0][0], False))
            doc_seq += 1

    # ---------------- pages + page_links ----------------
    SHARED_INLINKS = 8
    inlink_rows = []
    for e, cue in cue_of.items():
        for j in range(SHARED_INLINKS):
            src = 10_000_000 + e * 100 + j
            inlink_rows.append((src, e))
            inlink_rows.append((src, cue))
    for e in range(n_ent):
        for j in range(10):   # generic outlinks (huge sparse id space)
            dst = 20_000_000 + _h(f"outl:{e}:{j}") % 1_000_000_000
            inlink_rows.append((e, dst))
    fx.page_links = sorted(set(inlink_rows))
    inc, outc = {}, {}
    for s, d in fx.page_links:
        outc[s] = outc.get(s, 0) + 1
        inc[d] = inc.get(d, 0) + 1
    for e in range(n_ent):
        fx.pages.append((e, titles[e], inc.get(e, 0), outc.get(e, 0), False))

    # ---------------- transcripts with injected mentions ----------------
    def surface_for(ent: int, anchor_norm: str, key: str) -> str:
        """Raw injected surface: sometimes an accented/dashed/cased variant."""
        v = _h("var:" + key) % 10
        if v == 0:
            return anchor_norm.translate(ACCENT_MAP)
        if v == 1 and " " in anchor_norm:
            return anchor_norm.replace(" ", "-").title()
        if v == 2:
            return anchor_norm.title()
        return anchor_norm

    roles = ["user", "assistant"]
    for ci in range(n_conv):
        conv_id = f"c{ci:06d}"
        n_turns = 4 + _h(f"len:{ci}") % 37

        # conversation topic
        topic: list[tuple[int, str]] = []   # (entity, anchor_norm)
        t1 = plain[_h(f"t1:{ci}") % len(plain)]
        topic.append((t1, _norm_py(titles[t1])))
        if _rand(f"t2?:{ci}") < 0.6:
            t2 = plain[_h(f"t2:{ci}") % len(plain)]
            if t2 != t1:
                topic.append((t2, _norm_py(titles[t2])))
        if _rand(f"amb?:{ci}") < 0.45:      # ambiguous mention + its cue
            g = _h(f"grp:{ci}") % n_grp
            a = AMB[g % len(AMB)]
            sense_i = _h(f"sense:{ci}") % 3  # uniform over senses → minority well covered
            ent = amb_senses[a][sense_i][0]
            topic.append((ent, a))
            cue = cue_of[ent]
            topic.append((cue, _norm_py(titles[cue])))
        if _rand(f"hot?:{ci}") < 0.55:      # the hot anchor (~5% of mentions)
            topic.append((hot_entity, _norm_py(titles[hot_entity])))

        # schedule ≥2 mentions per topic entity across the conversation;
        # slotting guarantees nothing is dropped (≤2 mentions/turn, turn
        # count grown if needed) — cue mentions MUST land or minority
        # senses lose their disambiguating context
        flat: list[tuple[int, str]] = []
        for k, (ent, anch) in enumerate(topic):
            reps = 2 + _h(f"reps:{ci}:{k}") % 2
            flat.extend([(ent, anch)] * reps)
        flat.sort(key=lambda ea: _h(f"ord:{ci}:{ea[0]}:{len(flat)}"))
        n_turns = max(n_turns, (len(flat) + 1) // 2)
        schedule: dict[int, list[tuple[int, str]]] = {}
        for k, ea in enumerate(flat):
            slot = k * (2 * n_turns) // max(len(flat), 1)
            schedule.setdefault(slot // 2, []).append(ea)

        for ti in range(n_turns):
            is_tool = _rand(f"tool:{ci}:{ti}") < 0.08
            role = "tool" if is_tool else roles[ti % 2]
            tool = _pick(["search", "code", "browse"], f"toolname:{ci}:{ti}") if is_tool else None
            n_tok = 5 + _h(f"ntok:{ci}:{ti}") % 56
            toks = [FILLER[_h(f"f:{ci}:{ti}:{j}") % len(FILLER)] for j in range(n_tok)]
            injected = schedule.get(ti, [])[:2]
            # inject at deterministic non-overlapping positions
            cursor = 1 + _h(f"p0:{ci}:{ti}") % max(1, n_tok // 3)
            out, consumed, spans = [], 0, []
            for mi, (ent, anch) in enumerate(injected):
                key = f"m:{ci}:{ti}:{mi}"
                surf = surface_for(ent, anch, key)
                stoks = surf.split()
                out.extend(toks[consumed:cursor])
                spans.append((len(out), len(stoks), surf, anch, ent))
                out.extend(stoks)
                consumed = cursor
                cursor = min(n_tok, cursor + max(2, n_tok // 2))
            out.extend(toks[consumed:])
            text = " ".join(out)
            ts = datetime.fromtimestamp(
                _BASE_TS + ci * 3600 + ti * 7, tz=timezone.utc)
            fx.transcripts.append((conv_id, ti, role, text, tool, ts))
            for span_start, span_len, surf, anch, ent in spans:
                mid = f"{conv_id}:{ti}:{span_start}:{span_len}"
                fx.mentions_gt.append(
                    (mid, conv_id, ti, span_start, span_len, surf, anch, ent))

    # ---------------- labeled pairs + expected clusters ----------------
    # components are exactly (block_key, true_entity) groups (a mention
    # belongs to one block; blocks never bridge) — FIXTURES.md §6
    by_block: dict[str, list] = {}
    for m in fx.mentions_gt:
        by_block.setdefault(m[6], []).append(m)
    for block, ms in sorted(by_block.items()):
        ms_sorted = sorted(ms)
        by_ent: dict[int, list] = {}
        for m in ms_sorted:
            by_ent.setdefault(m[7], []).append(m)
        for ent, group in sorted(by_ent.items()):
            cid = min(g[0] for g in group)
            for g in group:
                fx.expected_clusters.append((g[0], cid))
        # labeled pairs: cap per block; negatives (rarer, harder) are
        # sampled separately so every block's hard negatives are covered
        cap = 400
        pos, neg = [], []
        n = len(ms_sorted)
        # multi-entity (ambiguous) blocks are small by design → full
        # cross-product so all hard negatives are visible; big
        # single-entity blocks use a neighbor window (all positives)
        window = n if len(by_ent) > 1 else 12
        for i in range(n):
            for j in range(i + 1, min(n, i + 1 + window)):
                l, r = ms_sorted[i], ms_sorted[j]
                (pos if l[7] == r[7] else neg).append(
                    (l[0], r[0], block, l[7] == r[7]))
        for bucket, bcap in ((neg, cap), (pos, max(24, 2 * len(neg)))):
            stride = max(1, len(bucket) // bcap)
            fx.labeled_pairs.extend(bucket[::stride])

    return fx


# ---------------------------------------------------------------- spark IO

def to_spark(spark, fx: Fixture):
    """Materialize all fixture tables as DataFrames."""
    out = {}
    for name, schema in Fixture.SCHEMAS.items():
        rows = getattr(fx, name)
        out[name] = spark.createDataFrame(rows, schema=schema)
    return out


def materialize(spark, scale: str, out_dir: str) -> dict:
    """Write fixture parquet tables under out_dir (idempotent) and
    return {name: path}."""
    fx = generate(scale)
    dfs = to_spark(spark, fx)
    paths = {}
    for name, df in dfs.items():
        p = os.path.join(out_dir, scale, f"{name}.parquet")
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            df.coalesce(4).write.mode("overwrite").parquet(p)
        paths[name] = p
    return paths
