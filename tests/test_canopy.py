"""Canopy clustering (semlink.canopy): the distributed center
election must equal the sequential id-ordered McCallum scan, canopies
must overlap where the similarity says so, and every record must land
in at least one canopy."""
from pyspark.sql import functions as F

from semlink.canopy import canopy_members


def _seq_canopy(ids, sims, t1, t2):
    """Sequential id-ordered McCallum reference: pool scan ascending,
    T2 removes from pool, T1 joins the canopy (overlapping)."""
    n2 = {i: set() for i in ids}
    n1 = {i: set() for i in ids}
    for a, b, s in sims:
        if s >= t2:
            n2[a].add(b)
            n2[b].add(a)
        if s >= t1:
            n1[a].add(b)
            n1[b].add(a)
    pool = set(ids)
    out = set()
    for v in sorted(ids):
        if v not in pool:
            continue
        pool.discard(v)
        pool -= n2[v]
        out.add((v, v))
        for m in n1[v]:
            out.add((v, m))
    return out


def test_canopy_equals_sequential_scan(spark):
    """On md5-free deterministic pseudo-random similarities over 40
    records, iterated local minima == the sequential scan, including
    chains where electing one center exposes the next."""
    ids = list(range(40))
    sims = []
    for a in range(40):
        for b in range(a + 1, 40):
            h = (a * 7919 + b * 104729) % 97
            if h < 30:
                sims.append((a, b, h))
    t1, t2 = 5, 20
    want = _seq_canopy(ids, sims, t1, t2)
    idf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    sdf = spark.createDataFrame(sims, "id_l long, id_r long, sim long")
    got = {(r.center_id, r.member_id)
           for r in canopy_members(idf, sdf, t1, t2).collect()}
    assert got == want


def test_canopy_chain_and_overlap(spark):
    """A T2 chain 0-1-2-3: round 1 elects 0 (and removes 1), round 2
    elects 2 (removes 3) — two rounds, centers {0, 2}. Record 1 is
    T1-near both centers -> overlapping membership. Isolated record
    9 becomes its own singleton canopy."""
    idf = spark.createDataFrame([(i,) for i in (0, 1, 2, 3, 9)],
                                "doc_id long")
    sdf = spark.createDataFrame(
        [(0, 1, 25), (1, 2, 25), (2, 3, 25)],
        "id_l long, id_r long, sim long")
    rows = canopy_members(idf, sdf, t1=10, t2=20).collect()
    centers = {r.center_id for r in rows}
    assert centers == {0, 2, 9}
    mem = {(r.center_id, r.member_id) for r in rows}
    assert (0, 1) in mem and (2, 1) in mem      # overlap on record 1
    assert (9, 9) in mem
    # every record covered
    assert {m for _, m in mem} == {0, 1, 2, 3, 9}


def test_canopy_fixture_full_coverage_and_dup_capture(spark):
    """dedup_canopy at sf0.001: every document is a member of at
    least one canopy, canopies overlap is possible but centers are
    an independent set of the T2 graph (no two centers share a T2
    edge), and near-dup pairs (>= T2 shared shingles) always share
    a canopy."""
    from semlink.queries.dedup import _CANOPY_T2, dedup_canopy
    from semlink.queries import _docs
    import semlink.datapipe.dedup as dd
    sf = "/root/testdata/sf0.001"
    rows = dedup_canopy(spark, sf).collect()
    mem = {}
    for r in rows:
        mem.setdefault(r.member_id, set()).add(r.center_id)
    docs = _docs(spark, sf)
    n_docs = docs.count()
    assert len(mem) == n_docs                    # full coverage
    sh = dd.shingles_exploded(docs).distinct()
    a = sh.select(F.col("doc_id").alias("id_l"), "s")
    b = sh.select(F.col("doc_id").alias("id_r"), "s")
    t2pairs = (a.join(b, "s").filter(F.col("id_l") < F.col("id_r"))
               .groupBy("id_l", "id_r").agg(F.count(F.lit(1)).alias("c"))
               .filter(F.col("c") >= _CANOPY_T2).collect())
    assert t2pairs                               # planted dups exist
    centers = {r.center_id for r in rows}
    for p in t2pairs:
        assert mem[p.id_l] & mem[p.id_r], (p.id_l, p.id_r)
        assert not (p.id_l in centers and p.id_r in centers), \
            "two T2-adjacent centers"


# -------------------------------------------------- center clustering

def _seq_center(ids, edges):
    """Sequential best-first center clustering reference: edges in
    (sim DESC, l ASC, r ASC) order; two unassigned -> l center, r
    member; center + unassigned -> member joins; member edges inert;
    leftovers become singleton centers."""
    state = {}
    for l, r, s in sorted(edges, key=lambda e: (-e[2], e[0], e[1])):
        sl, sr = state.get(l), state.get(r)
        if sl is None and sr is None:
            state[l] = (l, True)
            state[r] = (l, False)
        elif sl is not None and sl[1] and sr is None:
            state[r] = (sl[0], False)
        elif sr is not None and sr[1] and sl is None:
            state[l] = (sr[0], False)
    return {v: state.get(v, (v, True)) for v in ids}


def test_center_clusters_equals_sequential_scan(spark):
    """Iterated locally-dominant processing == the sequential
    best-first scan on deterministic pseudo-random weighted graphs,
    including ties (resolved by the (l, r) id order)."""
    from semlink.cluster import center_clusters
    ids = list(range(36))
    edges = []
    for a in range(36):
        for b in range(a + 1, 36):
            h = (a * 2654435761 + b * 40503) % 101
            if h < 18:
                edges.append((a, b, h % 9))  # heavy ties
    want = _seq_center(ids, edges)
    idf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    edf = spark.createDataFrame(edges, "id_l long, id_r long, sim long")
    got = {r.doc_id: (r.cluster, r.is_center)
           for r in center_clusters(idf, edf).collect()}
    assert got == want


def test_center_clusters_resists_chaining(spark):
    """The defining property vs connected components: on the chain
    a~b (strong), b~c (weaker), a!~c, CC collapses all three into
    one cluster while center clustering keeps c separate (b is a
    member and members never recruit)."""
    from semlink.cluster import center_clusters
    idf = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    edf = spark.createDataFrame([(1, 2, 9), (2, 3, 5)],
                                "id_l long, id_r long, sim long")
    got = {r.doc_id: (r.cluster, r.is_center)
           for r in center_clusters(idf, edf).collect()}
    assert got == {1: (1, True), 2: (1, False), 3: (3, True)}
    # this graph converges in exactly ONE round (the weak edge is
    # pruned by the member state, not processed) — a max_rounds=1
    # run must succeed, not raise (post-processing probe regression)
    got1 = {r.doc_id: (r.cluster, r.is_center)
            for r in center_clusters(idf, edf, max_rounds=1).collect()}
    assert got1 == got


def test_center_clusters_fixture_vs_cc(spark):
    """dedup_center_clusters at sf0.001: every doc assigned, every
    non-singleton cluster has exactly one center, members share >= T2
    shingles with their center (direct evidence — the anti-chaining
    guarantee), and the clustering refines the CC clustering of the
    same graph (every center-cluster sits inside one CC component)."""
    from semlink.queries.dedup import dedup_center_clusters
    rows = dedup_center_clusters(spark, "/root/testdata/sf0.001").collect()
    docs = {r.doc_id for r in rows}
    assert len(docs) == len(rows)
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for cid, members in by_cluster.items():
        centers = [m for m in members if m.is_center]
        assert len(centers) == 1 and centers[0].doc_id == cid
    assert any(len(m) > 1 for m in by_cluster.values())


def _seq_merge_center(ids, edges):
    """Sequential merge-center reference: like center, but an edge
    between a decided record and the CENTER of another cluster merges
    the two clusters (union-find); member~unassigned stays a skip."""
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    state = {}   # v -> (cluster_root_key, is_center)
    for l, r, s in sorted(edges, key=lambda e: (-e[2], e[0], e[1])):
        sl, sr = state.get(l), state.get(r)
        if sl is None and sr is None:
            state[l] = (l, True)
            state[r] = (l, False)
        elif sl is not None and sl[1] and sr is None:
            state[r] = (find(sl[0]), False)
        elif sr is not None and sr[1] and sl is None:
            state[l] = (find(sr[0]), False)
        elif sl is not None and sr is not None and (sl[1] or sr[1]):
            a, b = find(sl[0]), find(sr[0])
            if a != b:
                parent[max(a, b)] = min(a, b)
    out = {}
    for v in ids:
        if v in state:
            out[v] = (find(state[v][0]), state[v][1])
        else:
            out[v] = (v, True)
    # normalize: cluster label = min center root; find() roots by min
    return out


def test_merge_center_equals_sequential_scan(spark):
    """merge_center_clusters == the sequential union-find reference
    on pseudo-random weighted graphs with heavy ties — including
    merges triggered by member~center and center~center edges."""
    from semlink.cluster import merge_center_clusters
    ids = list(range(14))
    edges = []
    for a in range(14):
        for b in range(a + 1, 14):
            h = (a * 48271 + b * 69621) % 89
            if h < 30:
                edges.append((a, b, h % 5))
    want = _seq_merge_center(ids, edges)
    idf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    edf = spark.createDataFrame(edges, "id_l long, id_r long, sim long")
    got = {r.doc_id: (r.cluster, r.is_center)
           for r in merge_center_clusters(idf, edf).collect()}
    assert got == want


def test_merge_center_bridges_where_center_splits(spark):
    """The defining difference from CENTER: a member of one cluster
    similar to the CENTER of another merges the clusters. Edges
    (1,2,9) then (3,4,8) then (2,3,7): center clustering yields
    {1,2} {3,4}; merge-center processes (2,3) with 2 a member and 3 a
    CENTER -> one merged cluster. A member~unassigned edge stays a
    skip ((4,5,1) with 5 isolated -> 5 singleton)."""
    from semlink.cluster import center_clusters, merge_center_clusters
    idf = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5)],
                                "doc_id long")
    edf = spark.createDataFrame(
        [(1, 2, 9), (3, 4, 8), (2, 3, 7), (4, 5, 1)],
        "id_l long, id_r long, sim long")
    c = {r.doc_id: r.cluster for r in center_clusters(idf, edf).collect()}
    assert c == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5}
    m = {r.doc_id: r.cluster
         for r in merge_center_clusters(idf, edf).collect()}
    assert m == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5}


def test_merge_center_oracle_merge_path(spark, tmp_path):
    """The dedup_merge_center ORACLE's merge machinery (merge-edge
    CTEs + recursive reachability relabel) verified on engineered
    documents that force a center~center merge: A~B strongest (A
    center), C~D next (C center), then A~C bridges the two centers —
    Spark and DuckDB agree row-for-row AND at least one merge
    actually fired (all four docs share one cluster)."""
    import duckdb
    from semlink.queries import REGISTRY
    w = [f"w{i:02d}" for i in range(30)]
    texts = [
        (0, " ".join(w)),                                   # A
        (1, " ".join(w[:27] + ["xx", "yy", "zz"])),         # B ~ A (25)
        (2, " ".join(w[:24] + ["pp", "qq", "rr", "ss"])),   # C ~ A (22)
        (3, " ".join(w[:24] + ["pp", "qq", "rr", "tt"])),   # D ~ C (24)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(texts, "doc_id long, text string") \
        .coalesce(1).write.parquet(f"{sf}/documents.parquet")
    fn, sql = REGISTRY["dedup_merge_center"]
    got = sorted((r.doc_id, r.cluster, r.is_center)
                 for r in fn(spark, sf).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf}/documents.parquet/*.parquet'")
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
    clusters = {c for _, c, _ in got}
    assert clusters == {0}            # the bridge merged everything
    centers = {d for d, _, ctr in got if ctr}
    assert centers == {0, 2}          # both scan-elected centers kept
