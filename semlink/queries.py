"""Driver-contract query registry (SURVEY §5.2 item 4).

Every implemented operator from SURVEY.md §2 (+ the datapipe family)
gets a named entry: a Spark callable (spark, sf_dir) → DataFrame and,
when ANSI-SQL-expressible, a DuckDB oracle string over the driver's
pre-registered views. The driver hashes values order-insensitively
with columns sorted by name, so:

- every computed column is aliased IDENTICALLY on both sides;
- every float output goes through the scaled-bigint convention
  round(x * 1e6)::bigint with the SAME arithmetic expression shape on
  both sides (both engines round ties away from zero for positive
  doubles, and identical IEEE expression trees give identical bits);
- hashes are md5() — identical hex in both engines.

Record-linkage queries run over `documents` as a stand-in corpus
(doc_id → conversation, tokens → turns; the real transcript pipeline
is exercised on fixtures, queries `pipeline_*` below, whose oracles
are constant golden tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .ngrams import explode_mentions, ngram_duckdb_sql
from .textnorm import NORMALIZE_DUCKDB_SQL, clean_expr, normalize_expr
from .datapipe import dedup as dd
from .datapipe import simsearch as ss
from .datapipe import textstats as ts
from .datapipe.multimodal import extract_media_features, synthesize_media

SCALE = 1_000_000


def _r6(col):
    return F.round(col * SCALE).cast("bigint")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _read(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


REGISTRY: dict[str, tuple] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn
    return deco


# =====================================================================
# Record-linkage spine over the documents corpus (T2-T4, A1-A6, J1/J3,
# F1/F3, O4, X3/X4, C2-C4)
# =====================================================================

_TOK_SQL = """
  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                    x -> x <> '')) AS token
  FROM documents
"""

@q("rl_ngram_explode", f"""
  {ngram_duckdb_sql('documents', 'doc_id', 'text', 3)}
""")
def rl_ngram_explode(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumnRenamed("doc_id", "conv_id")
    m = explode_mentions(d, key_cols=("conv_id",), max_n=3)
    return m.select(F.col("conv_id").alias("doc_id"),
                    "span_start", "span_len", "ngram")


@q("rl_normalize_blocking_key", f"""
  SELECT DISTINCT p_name AS raw,
         {NORMALIZE_DUCKDB_SQL.format(col='p_name')} AS blocking_key
  FROM part
""")
def rl_normalize(spark, sf_dir):
    p = _read(spark, sf_dir, "part")
    return (p.select(F.col("p_name").alias("raw"),
                     normalize_expr(F.col("p_name")).alias("blocking_key"))
            .distinct())


_DICT_SQL = f"""
  WITH toks AS ({_TOK_SQL}),
  occ AS (SELECT t.token AS anchor_norm, d.source AS sense, count(*) AS sense_cnt
          FROM toks t JOIN documents d USING (doc_id)
          GROUP BY 1, 2),
  tot AS (SELECT anchor_norm, CAST(sum(sense_cnt) AS BIGINT) AS anchor_total
          FROM occ GROUP BY 1)
  SELECT o.anchor_norm, o.sense, o.sense_cnt, t.anchor_total,
         CAST(ROUND(CAST(o.sense_cnt AS DOUBLE) / t.anchor_total * {SCALE})
              AS BIGINT) AS prior6
  FROM occ o JOIN tot t USING (anchor_norm)
"""

def _spark_dict(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", "source",
        F.explode(F.array_remove(F.split(F.trim("text"), r"\s+"), "")).alias("anchor_norm"))
    occ = toks.groupBy("anchor_norm", F.col("source").alias("sense")).agg(
        F.count("*").alias("sense_cnt"))
    tot = occ.groupBy("anchor_norm").agg(F.sum("sense_cnt").alias("anchor_total"))
    return (occ.join(tot, "anchor_norm")
            .withColumn("prior6",
                        _r6(F.col("sense_cnt").cast("double") / F.col("anchor_total"))))


@q("rl_dict_build", _DICT_SQL)
def rl_dict_build(spark, sf_dir):
    return _spark_dict(spark, sf_dir)


@q("rl_threshold_filter", f"""
  SELECT * FROM ({_DICT_SQL}) WHERE prior6 >= {SCALE // 12}
""")
def rl_threshold_filter(spark, sf_dir):
    return _spark_dict(spark, sf_dir).filter(F.col("prior6") >= SCALE // 12)


@q("rl_link_top1", f"""
  WITH dict AS ({_DICT_SQL}),
  top1 AS (SELECT anchor_norm, sense, prior6,
                  row_number() OVER (ORDER BY anchor_norm,
                                     prior6 DESC, sense) AS _g,
                  row_number() OVER (PARTITION BY anchor_norm
                                     ORDER BY prior6 DESC, sense) AS rk
           FROM dict),
  toks AS ({_TOK_SQL})
  SELECT DISTINCT t.doc_id, t.token, p.sense AS top_sense, p.prior6
  FROM toks t JOIN (SELECT * FROM top1 WHERE rk = 1) p
    ON t.token = p.anchor_norm
""")
def rl_link_top1(spark, sf_dir):
    dict_df = _spark_dict(spark, sf_dir)
    w = Window.partitionBy("anchor_norm").orderBy(F.desc("prior6"), F.asc("sense"))
    top1 = (dict_df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("anchor_norm", F.col("sense").alias("top_sense"), "prior6"))
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.explode(F.array_remove(F.split(F.trim("text"), r"\s+"), "")).alias("token"))
    return (toks.join(F.broadcast(top1),
                      toks.token == top1.anchor_norm)
            .select("doc_id", "token", "top_sense", "prior6")
            .distinct())


_MENTIONS12_SQL = ngram_duckdb_sql("documents", "doc_id", "text", 2)

@q("rl_largest_matching", f"""
  WITH mentions AS ({_MENTIONS12_SQL}),
  dict AS (SELECT ngram FROM mentions GROUP BY ngram HAVING count(*) >= 20),
  matched AS (SELECT m.* FROM mentions m JOIN dict USING (ngram))
  SELECT a.doc_id, a.span_start, a.span_len, a.ngram
  FROM matched a
  WHERE NOT EXISTS (
    SELECT 1 FROM matched b
    WHERE b.doc_id = a.doc_id
      AND b.span_start <= a.span_start
      AND b.span_start + b.span_len >= a.span_start + a.span_len
      AND b.span_len > a.span_len)
""")
def rl_largest_matching(spark, sf_dir):
    from .linking import largest_matching_filter
    d = _docs(spark, sf_dir).withColumnRenamed("doc_id", "conv_id") \
        .withColumn("turn_idx", F.lit(0))
    m = explode_mentions(d, key_cols=("conv_id", "turn_idx"), max_n=2)
    dict_df = m.groupBy("ngram").agg(F.count("*").alias("c")) \
        .filter(F.col("c") >= 20).select("ngram")
    matched = m.join(F.broadcast(dict_df), "ngram")
    kept = largest_matching_filter(matched)
    return kept.select(F.col("conv_id").alias("doc_id"),
                       "span_start", "span_len", "ngram")


_PAIR_MENTIONS_SQL = f"""
  SELECT DISTINCT doc_id, token FROM ({_TOK_SQL})
"""

@q("rl_mention_pairs", f"""
  WITH m AS (SELECT doc_id, token,
                    row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rk
             FROM ({_PAIR_MENTIONS_SQL}))
  SELECT l.token AS block_key, l.doc_id AS left_doc, r.doc_id AS right_doc
  FROM m l JOIN m r ON l.token = r.token
  WHERE r.rk > l.rk AND r.rk - l.rk <= 3
""")
def rl_mention_pairs(spark, sf_dir):
    d = _docs(spark, sf_dir)
    m = (d.select("doc_id",
                  F.explode(F.array_remove(F.split(F.trim("text"), r"\s+"), ""))
                  .alias("token"))
         .distinct()
         .withColumn("rk", F.row_number().over(
             Window.partitionBy("token").orderBy("doc_id"))))
    l = m.select(F.col("token").alias("block_key"),
                 F.col("doc_id").alias("left_doc"), F.col("rk").alias("rk_l"))
    r = m.select(F.col("token").alias("block_key"),
                 F.col("doc_id").alias("right_doc"), F.col("rk").alias("rk_r"))
    return (l.join(r, "block_key")
            .filter((F.col("rk_r") > F.col("rk_l"))
                    & (F.col("rk_r") - F.col("rk_l") <= 3))
            .select("block_key", "left_doc", "right_doc"))


@q("rl_levenshtein", """
  SELECT DISTINCT p_brand AS a, p_type AS b,
         levenshtein(p_brand, p_type) AS lev
  FROM part
""")
def rl_levenshtein(spark, sf_dir):
    p = _read(spark, sf_dir, "part")
    return (p.select(F.col("p_brand").alias("a"), F.col("p_type").alias("b"))
            .distinct()
            .withColumn("lev", F.levenshtein("a", "b").cast("bigint")))


@q("rl_jaro_winkler", f"""
  SELECT DISTINCT p_brand AS a, p_type AS b,
         CAST(ROUND(jaro_winkler_similarity(p_brand, p_type) * {SCALE})
              AS BIGINT) AS jw6
  FROM part
""")
def rl_jaro_winkler(spark, sf_dir):
    from .pairs import jaro_winkler_udf
    p = _read(spark, sf_dir, "part")
    return (p.select(F.col("p_brand").alias("a"), F.col("p_type").alias("b"))
            .distinct()
            .withColumn("jw6", _r6(jaro_winkler_udf(F.col("a"), F.col("b")))))


_EDGE_SQL = """
  SELECT 'd' || lpad(CAST(a.doc_id AS VARCHAR), 6, '0') AS src,
         'd' || lpad(CAST(b.doc_id AS VARCHAR), 6, '0') AS dst
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + 1
   AND a.lang = b.lang
"""

@q("rl_connected_components", f"""
  WITH RECURSIVE e AS ({_EDGE_SQL}),
  sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e
          UNION SELECT src, src FROM e UNION SELECT dst, dst FROM e),
  reach(a, b) AS (
    SELECT src, dst FROM sym
    UNION
    SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src
  )
  SELECT a AS mention_id, min(b) AS cluster_id FROM reach GROUP BY a
""")
def rl_connected_components(spark, sf_dir):
    import tempfile
    from .cluster import run_connected_components
    from .config import SemlinkConfig
    d = _docs(spark, sf_dir)
    a = d.select(F.col("doc_id"), "source", "lang")
    b = d.select(F.col("doc_id").alias("doc_id2"),
                 F.col("source").alias("s2"), F.col("lang").alias("l2"))
    ident = lambda c: F.concat(F.lit("d"), F.lpad(F.col(c).cast("string"), 6, "0"))
    edges = (a.join(b, (F.col("doc_id2") == F.col("doc_id") + 1)
                    & (F.col("lang") == F.col("l2")))
             .select(ident("doc_id").alias("src"), ident("doc_id2").alias("dst")))
    ckpt = tempfile.mkdtemp(prefix="semlink_cc_oracle_")
    return run_connected_components(edges, SemlinkConfig(), ckpt_dir=ckpt)


# =====================================================================
# Relational surface (A*, O4, O5 — generic Spark SQL, oracle parity)
# =====================================================================

@q("agg_pricing_summary", f"""
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(sum(l_quantity)) AS BIGINT)             AS sum_qty,
         CAST(ROUND(sum(l_extendedprice) * 100) AS BIGINT)  AS sum_price_cents,
         CAST(ROUND(avg(l_discount) * {SCALE}) AS BIGINT)   AS avg_disc6,
         count(*)                                           AS n_rows
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-01'
  GROUP BY l_returnflag, l_linestatus
""")
def agg_pricing_summary(spark, sf_dir):
    l = _read(spark, sf_dir, "lineitem")
    return (l.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity")).cast("bigint").alias("sum_qty"),
                 F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
                 .alias("sum_price_cents"),
                 F.round(F.sum(F.round(F.col("l_discount") * 1_000_000)
                               .cast("bigint")).cast("double") / F.count("*"))
                 .cast("bigint").alias("avg_disc6"),
                 F.count("*").alias("n_rows")))


@q("join_topk_customers", """
  WITH tot AS (
    SELECT c.c_mktsegment, c.c_custkey,
           CAST(sum(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2)
  SELECT c_mktsegment, c_custkey, total_cents
  FROM (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY total_cents DESC, c_custkey) AS rk
        FROM tot)
  WHERE rk <= 3
""")
def join_topk_customers(spark, sf_dir):
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    tot = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
           .groupBy("c_mktsegment", "c_custkey")
           .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .alias("total_cents")))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total_cents"), F.asc("c_custkey"))
    return (tot.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3).drop("rk"))


@q("window_last_event", """
  SELECT user_id, event_id, event_type
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rk
        FROM events)
  WHERE rk = 1
""")
def window_last_event(spark, sf_dir):
    e = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (e.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("user_id", "event_id", "event_type"))


@q("rollup_event_counts", f"""
  SELECT coalesce(event_type, '__all__') AS event_type,
         count(*) AS n,
         CAST(ROUND(sum(value) * {SCALE}) AS BIGINT) AS sum_value6
  FROM events
  GROUP BY ROLLUP (event_type)
""")
def rollup_event_counts(spark, sf_dir):
    e = _read(spark, sf_dir, "events")
    return (e.rollup("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.round(F.col("value") * 1_000_000).cast("bigint"))
                 .alias("sum_value6"))
            .withColumn("event_type",
                        F.coalesce("event_type", F.lit("__all__"))))


# =====================================================================
# Dedup family (datapipe)
# =====================================================================

@q("dedup_exact", """
  SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id,
         count(*) AS dup_count
  FROM documents GROUP BY md5(text)
""")
def dedup_exact(spark, sf_dir):
    return dd.exact_dedup(_docs(spark, sf_dir))


_SHINGLE_SQL = """
  SELECT doc_id, list_distinct(
           CASE WHEN len(toks) >= 3 THEN
             list_transform(generate_series(1, len(toks) - 2),
                            i -> array_to_string(toks[i : i + 2], ' '))
           ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM (SELECT doc_id, list_filter(string_split_regex(trim(text), ' +'),
                                   x -> x <> '') AS toks
        FROM documents)
"""

_MINHASH_SQL = "".join([
    "SELECT doc_id",
    *[f", list_min(list_transform(sh, s -> md5('{i}:' || s))) AS mh_{i}"
      for i in range(dd.MINHASH_K)],
    f" FROM ({_SHINGLE_SQL})",
])

@q("dedup_minhash_signatures", _MINHASH_SQL)
def dedup_minhash_signatures(spark, sf_dir):
    return dd.minhash_signatures(_docs(spark, sf_dir))


_BUCKET_SQL = " UNION ALL ".join(
    f"""SELECT doc_id, {b} AS band,
        md5('{b}' || '|' || mh_{2 * b} || '|' || mh_{2 * b + 1}) AS bucket
        FROM ({_MINHASH_SQL})"""
    for b in range(dd.LSH_BANDS))

@q("dedup_lsh_buckets", _BUCKET_SQL)
def dedup_lsh_buckets(spark, sf_dir):
    sigs = dd.minhash_signatures(_docs(spark, sf_dir))
    return dd.lsh_buckets(sigs).withColumn("band", F.col("band").cast("int"))


@q("dedup_lsh_pairs", f"""
  WITH b AS ({_BUCKET_SQL}),
  sized AS (SELECT band, bucket FROM b GROUP BY band, bucket
            HAVING count(*) <= 64)
  SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id
  FROM (SELECT b.* FROM b JOIN sized USING (band, bucket)) l
  JOIN (SELECT b.* FROM b JOIN sized USING (band, bucket)) r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
""")
def dedup_lsh_pairs(spark, sf_dir):
    sigs = dd.minhash_signatures(_docs(spark, sf_dir))
    return dd.lsh_candidate_pairs(dd.lsh_buckets(sigs))


@q("dedup_ngram_jaccard", f"""
  WITH pairs AS (
    SELECT a.doc_id AS left_id, b.doc_id AS right_id
    FROM documents a JOIN documents b
      ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang),
  sh AS ({_SHINGLE_SQL}),
  sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
  ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
  inter AS (SELECT p.left_id, p.right_id, count(*) AS inter
            FROM pairs p
            JOIN ex el ON el.doc_id = p.left_id
            JOIN ex er ON er.doc_id = p.right_id AND er.s = el.s
            GROUP BY 1, 2)
  SELECT p.left_id, p.right_id,
         coalesce(i.inter, 0) AS inter,
         CAST(ROUND(CAST(coalesce(i.inter, 0) AS DOUBLE)
              / (sl.n_sh + sr.n_sh - coalesce(i.inter, 0)) * {SCALE})
              AS BIGINT) AS jaccard6
  FROM pairs p
  LEFT JOIN inter i USING (left_id, right_id)
  JOIN sizes sl ON sl.doc_id = p.left_id
  JOIN sizes sr ON sr.doc_id = p.right_id
""")
def dedup_ngram_jaccard(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = d.select(F.col("doc_id").alias("left_id"), "lang")
    b = d.select(F.col("doc_id").alias("right_id"),
                 F.col("lang").alias("l2"))
    pairs = (a.join(b, (F.col("right_id") == F.col("left_id") + 1)
                    & (F.col("lang") == F.col("l2")))
             .select("left_id", "right_id"))
    jac = dd.ngram_jaccard(d, pairs)
    return jac.select(
        "left_id", "right_id", F.col("inter").cast("bigint").alias("inter"),
        _r6(F.col("inter").cast("double")
            / (F.col("n_l") + F.col("n_r") - F.col("inter"))).alias("jaccard6"))


_SIMHASH_NIB = "(strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1)"
_SIMHASH_SQL = (
    "WITH toks AS (SELECT doc_id, unnest(list_distinct("
    "list_filter(string_split_regex(trim(text), ' +'), x -> x <> ''))) AS tok "
    "FROM documents), "
    "h AS (SELECT doc_id, md5(tok) AS hx FROM toks), "
    "v AS (SELECT doc_id"
    + "".join(
        f", sum(CASE WHEN CAST(floor({_SIMHASH_NIB.format(p=j // 4 + 1)} / {2 ** (j % 4)}) AS BIGINT) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS s{j}"
        for j in range(dd.SIMHASH_BITS))
    + " FROM h GROUP BY doc_id) "
    "SELECT doc_id, CAST("
    + " + ".join(
        f"(CASE WHEN s{j} >= 0 THEN {2 ** j} ELSE 0 END)"
        for j in range(dd.SIMHASH_BITS))
    + " AS BIGINT) AS simhash FROM v")

@q("dedup_simhash", _SIMHASH_SQL)
def dedup_simhash(spark, sf_dir):
    return dd.simhash(_docs(spark, sf_dir))


# =====================================================================
# Similarity search (datapipe)
# =====================================================================

_COSINE_SQL = """
  list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
  / (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
     * sqrt(list_inner_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))
"""

@q("ann_brute_force_topk", f"""
  WITH sims AS (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           CAST(ROUND(({_COSINE_SQL}) * {SCALE}) AS BIGINT) AS sim6
    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 25)
  SELECT query_id, cand_id, sim6, rk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim6 DESC, cand_id) AS rk
    FROM sims)
  WHERE rk <= 5
""")
def ann_brute_force_topk(spark, sf_dir):
    e = _read(spark, sf_dir, "embeddings")
    q_ = (e.filter(F.col("vec_id") < 25)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("q_emb")))
    c = e.select(F.col("vec_id").alias("cand_id"),
                 F.col("embedding").alias("c_emb"))
    return ss.brute_force_topk(c, q_, k=5) \
        .withColumn("rk", F.col("rk").cast("int"))


def _cos_sql(a: str, b: str) -> str:
    return (f"list_inner_product({a}, {b})"
            f" / (sqrt(list_inner_product({a}, {a}))"
            f" * sqrt(list_inner_product({b}, {b})))")


_IVF_K = 8

@q("ann_ivf_cell_topk", f"""
  WITH seeds AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
           CAST(embedding AS DOUBLE[]) AS c_emb
    FROM (SELECT vec_id, embedding FROM embeddings
          ORDER BY vec_id LIMIT {_IVF_K})),
  csims AS (
    SELECT e.vec_id, e.embedding, s.cell,
           CAST(ROUND(({_cos_sql('CAST(e.embedding AS DOUBLE[])', 's.c_emb')})
                * {SCALE}) AS BIGINT) AS csim6
    FROM embeddings e CROSS JOIN seeds s),
  asg AS (
    SELECT vec_id, embedding, cell FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY csim6 DESC, cell) AS crk
      FROM csims) WHERE crk = 1),
  sims AS (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           CAST(ROUND(({_cos_sql('CAST(q.embedding AS DOUBLE[])',
                                 'CAST(c.embedding AS DOUBLE[])')})
                * {SCALE}) AS BIGINT) AS sim6
    FROM asg q JOIN asg c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    WHERE q.vec_id < 50)
  SELECT query_id, cand_id, sim6, rk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim6 DESC, cand_id) AS rk
    FROM sims)
  WHERE rk <= 5
""")
def ann_ivf_cell_topk(spark, sf_dir):
    """Real IVF: deterministic seed centroids (k lowest-id vectors),
    cosine argmax cell assignment, then cell-restricted search — the
    whole index path is oracle-verified, not a fixture-label stand-in."""
    e = _read(spark, sf_dir, "embeddings")
    cents = ss.seed_centroids(e, k=_IVF_K)
    a = ss.assign_cells(e.select("vec_id", "embedding"), cents, "vec_id",
                        nprobe=1)
    q_ = (a.filter(F.col("vec_id") < 50)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("q_emb"), "cell"))
    c = a.select(F.col("vec_id").alias("cand_id"),
                 F.col("embedding").alias("c_emb"), "cell")
    return ss.ivf_topk(c, q_, k=5).withColumn("rk", F.col("rk").cast("int"))


# =====================================================================
# Text analysis (datapipe)
# =====================================================================

_STOP_IN = ", ".join(f"'{w}'" for w in ts.EN_STOPWORDS)

_STOPR_SQL = f"""
  CAST(len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS DOUBLE)
  / CASE WHEN len(toks) > 0 THEN len(toks) ELSE 1 END
"""

_PROF_VALUES = ", ".join(
    f"('{tok}', '{lang}')"
    for lang, words in sorted(ts.LANG_STOPWORDS.items())
    for tok in sorted(set(words)))

@q("text_langid", f"""
  WITH base AS (SELECT doc_id, lang, coalesce(text, '') AS t FROM documents),
  toks AS (SELECT doc_id,
                  unnest(list_filter(string_split_regex(trim(t), ' +'),
                                     x -> x <> '')) AS tok
           FROM base),
  n AS (SELECT doc_id, count(*) AS _n FROM toks GROUP BY doc_id),
  prof(tok, plang) AS (VALUES {_PROF_VALUES}),
  hits AS (SELECT doc_id, plang, count(*) AS _h
           FROM toks JOIN prof USING (tok) GROUP BY doc_id, plang),
  stop_scores AS (SELECT h.doc_id, h.plang,
                         CAST(ROUND(CAST(_h AS DOUBLE) / greatest(_n, 1)
                                    * {SCALE}) AS BIGINT) AS score6
                  FROM hits h JOIN n USING (doc_id)),
  cjk AS (SELECT doc_id, 'cjk' AS plang,
                 CAST(ROUND(least(1.0,
                        CAST(strlen(t) - length(t) AS DOUBLE)
                        / (2.0 * greatest(length(t), 1))) * {SCALE})
                      AS BIGINT) AS score6
          FROM base),
  scores AS (SELECT * FROM stop_scores UNION ALL SELECT * FROM cjk),
  top AS (SELECT doc_id, plang, score6,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score6 DESC, plang ASC) AS rk
          FROM scores)
  SELECT b.doc_id, b.lang,
         CASE WHEN t2.score6 >= {ts.LANG_MIN_SCORE6} THEN t2.plang
              ELSE 'und' END AS lang_pred,
         coalesce(t2.score6, 0) AS top_score6
  FROM base b LEFT JOIN (SELECT * FROM top WHERE rk = 1) t2 USING (doc_id)
""")
def text_langid(spark, sf_dir):
    """Profile-based language ID (VERDICT r03 next #5): stopword-density
    argmax over the broadcast LANG_STOPWORDS dimension + the CJK
    byte-excess channel; the oracle re-derives the entire scoring
    (profile VALUES, density ratios, argmax window, 'und' threshold)
    in DuckDB."""
    d = _docs(spark, sf_dir)
    r = ts.lang_id(d)
    return (d.select("doc_id", "lang").join(r, "doc_id")
            .select("doc_id", "lang", "lang_pred", "top_score6"))


@q("text_token_stats", f"""
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), ' +'), x -> x <> ''))
           AS ws_tokens,
         len(regexp_extract_all(text, '{ts.WORD_RE}')) AS word_tokens,
         length(text) AS n_chars_out
  FROM documents
""")
def text_token_stats(spark, sf_dir):
    d = ts.with_token_stats(_docs(spark, sf_dir).drop("n_chars"))
    return d.select("doc_id", "ws_tokens", "word_tokens",
                    F.col("n_chars").alias("n_chars_out"))


@q("text_quality_score", f"""
  SELECT doc_id,
         CAST(ROUND((
           0.4 * least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0)
         + 0.3 * (CASE WHEN length(text) > 0 THEN
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
             / length(text) ELSE 0.0 END)
         + 0.3 * least(({_STOPR_SQL}) * 3.0, 1.0)
         ) * {SCALE}) AS BIGINT) AS quality6
  FROM (SELECT doc_id, text,
               list_filter(string_split_regex(trim(text), ' +'),
                           x -> x <> '') AS toks
        FROM documents)
""")
def text_quality_score(spark, sf_dir):
    d = ts.with_quality_score(_docs(spark, sf_dir).drop("n_chars"))
    return d.select("doc_id", _r6(F.col("quality_score")).alias("quality6"))


@q("text_fingerprints", """
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp_exact,
         list_min(CASE WHEN len(toks) >= 4 THEN
             list_transform(generate_series(1, len(toks) - 3),
                            i -> md5(array_to_string(toks[i : i + 3], ' ')))
           ELSE [md5(array_to_string(toks, ' '))] END) AS fp_min_shingle
  FROM (SELECT doc_id, text,
               list_filter(string_split_regex(trim(text), ' +'),
                           x -> x <> '') AS toks
        FROM documents)
""")
def text_fingerprints(spark, sf_dir):
    d = ts.with_fingerprints(_docs(spark, sf_dir))
    return d.select("doc_id", "fp_exact", "fp_min_shingle")


# =====================================================================
# Multimodal plumbing (stubbed decode, real Spark path)
# =====================================================================

_MEDIA_DIMS_SQL = """
  SELECT doc_id, md5(text) AS d,
         1 + CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) % 64 AS width,
         1 + CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT) % 64 AS height,
         CASE ((CAST(('0x' || substr(md5(text), 5, 1)) AS BIGINT) % 4) * 2)
              WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 4 THEN 2 WHEN 6 THEN 4 END
           AS channels
  FROM documents
"""

@q("media_features", f"""
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         'image' AS kind,
         CAST(68 + height * (1 + width * channels) AS BIGINT) AS n_bytes,
         'png' AS fmt,
         CAST(width AS BIGINT) AS width,
         CAST(height AS BIGINT) AS height,
         CAST(channels AS BIGINT) AS channels
  FROM ({_MEDIA_DIMS_SQL})
""")
def media_features(spark, sf_dir):
    """Multimodal round trip: JVM-synthesized VALID PNGs (now with a
    real stored-deflate IDAT — 68 + h·(1+w·c) bytes total) with
    md5-derived dims → Arrow mapInPandas STRUCTURAL byte decode; the
    oracle predicts the decoder's output from the generator params, so
    a decode bug (endianness, offset, color-type map) fails the hash."""
    media = synthesize_media(_docs(spark, sf_dir))
    return extract_media_features(media).select(
        "media_id", "kind", "n_bytes", "fmt", "width", "height", "channels")


@q("media_pixels", f"""
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         CAST(width * height AS BIGINT) AS n_px,
         CAST(ROUND(CAST(v0 + CASE WHEN channels > 1 THEN v1 ELSE 0 END
                            + CASE WHEN channels > 2 THEN v2 ELSE 0 END
                            + CASE WHEN channels > 3 THEN v3 ELSE 0 END
                         AS DOUBLE) / channels * {SCALE}) AS BIGINT) AS mean6,
         md5(repeat(
               lpad(lower(to_hex(v0)), 2, '0')
               || CASE WHEN channels > 1
                       THEN lpad(lower(to_hex(v1)), 2, '0') ELSE '' END
               || CASE WHEN channels > 2
                       THEN lpad(lower(to_hex(v2)), 2, '0') ELSE '' END
               || CASE WHEN channels > 3
                       THEN lpad(lower(to_hex(v3)), 2, '0') ELSE '' END,
               CAST(width * height AS INTEGER))) AS px_digest
  FROM (SELECT doc_id, width, height, channels,
               CAST(('0x' || substr(d, 7, 1)) AS BIGINT) * 17 AS v0,
               CAST(('0x' || substr(d, 8, 1)) AS BIGINT) * 17 AS v1,
               CAST(('0x' || substr(d, 9, 1)) AS BIGINT) * 17 AS v2,
               CAST(('0x' || substr(d, 10, 1)) AS BIGINT) * 17 AS v3
        FROM ({_MEDIA_DIMS_SQL}))
""")
def media_pixels(spark, sf_dir):
    """REAL pixel decode (VERDICT r03 next #4): the synthesized PNGs'
    stored-deflate IDAT is inflated with stdlib zlib and unfiltered
    (Sub row 0, Up rows 1+) by decode_png_pixels; the oracle predicts
    the per-pixel channel pattern from the md5-derived generator params
    and hashes the ENTIRE reconstructed sample stream (px_digest =
    md5(hex(pixels))), so any inflate/unfilter/stride/interleave bug
    hash-mismatches. mean6 is the exact channel-average."""
    media = synthesize_media(_docs(spark, sf_dir))
    from .datapipe.multimodal import extract_pixel_stats
    return (extract_pixel_stats(media)
            .select("media_id", "n_px", _r6(F.col("mean")).alias("mean6"),
                    "px_digest"))


# =====================================================================
# Coverage queries (VERDICT r01 next-step 4): T1 clean, F2 unique,
# A5-A7 dict stats + redirects, J2 salted join, X6 MW relatedness,
# M1 model apply, O1/O2 ops, §2.10 streaming
# =====================================================================

@q("rl_clean_text", r"""
  SELECT doc_id,
         CASE WHEN contains(dirty, 'http') OR contains(dirty, '@')
                   OR contains(dirty, 'RT')
              THEN regexp_replace(regexp_replace(regexp_replace(dirty,
                     'https?://\S+', ' ', 'g'), '@\w+', ' ', 'g'),
                     '\bRT\b', ' ', 'g')
              ELSE dirty END AS cleaned
  FROM (SELECT doc_id,
               'RT @user' || CAST(doc_id AS VARCHAR) || ' ' || text ||
               ' see http://x.co/' || CAST(doc_id % 97 AS VARCHAR) AS dirty
        FROM documents)
""")
def rl_clean_text(spark, sf_dir):
    """T1: tweet-style cleaning (URL / @mention / RT strip) on texts
    with injected markers, oracle-checked against the regex chain."""
    d = _docs(spark, sf_dir)
    dirty = F.concat(F.lit("RT @user"), F.col("doc_id").cast("string"),
                     F.lit(" "), F.col("text"), F.lit(" see http://x.co/"),
                     (F.col("doc_id") % 97).cast("string"))
    return d.select("doc_id", clean_expr(dirty).alias("cleaned"))


_CANDS_SQL = f"""
  WITH dict AS ({_DICT_SQL}),
  toks AS (SELECT DISTINCT doc_id, token FROM ({_TOK_SQL}))
  SELECT CAST(t.doc_id AS VARCHAR) || ':' || t.token AS mention_id,
         d.sense AS target_id, d.prior6
  FROM toks t JOIN dict d ON t.token = d.anchor_norm
"""


def _spark_cands(spark, sf_dir):
    """Distinct (doc, token) mentions joined to every dictionary sense."""
    dict_df = _spark_dict(spark, sf_dir)
    d = _docs(spark, sf_dir)
    toks = (d.select(
        "doc_id",
        F.explode(F.array_remove(F.split(F.trim("text"), r"\s+"), ""))
        .alias("token")).distinct())
    return (toks.join(dict_df, toks.token == dict_df.anchor_norm)
            .select(F.concat_ws(":", "doc_id", "token").alias("mention_id"),
                    F.col("sense").alias("target_id"), "prior6"))


@q("rl_unique_filter", f"""
  WITH cands AS ({_CANDS_SQL}),
  dup AS (SELECT mention_id, target_id, prior6 FROM cands
          UNION ALL
          SELECT mention_id, target_id, prior6 // 2 FROM cands)
  SELECT mention_id, target_id, max(prior6) AS sense_prob
  FROM dup GROUP BY 1, 2
""")
def rl_unique_filter(spark, sf_dir):
    """F2: one row per (mention, target) keeping max sense_prob, fed a
    candidate set with injected half-probability duplicates."""
    from .linking import unique_filter
    base = _spark_cands(spark, sf_dir) \
        .withColumnRenamed("prior6", "sense_prob")
    dup = base.withColumn(
        "sense_prob", F.floor(F.col("sense_prob") / 2).cast("bigint"))
    return unique_filter(base.unionByName(dup))


@q("rl_dict_probabilities", f"""
  WITH dict AS ({_DICT_SQL})
  SELECT anchor_norm, sense AS target_id,
         CAST(ROUND(CAST(sense_cnt AS DOUBLE) / anchor_total * {SCALE})
              AS BIGINT) AS prior6,
         CAST(ROUND(CAST(anchor_total AS DOUBLE) / (anchor_total + 7)
              * {SCALE}) AS BIGINT) AS link_prob6,
         CAST(ROUND(CAST(sense_cnt AS DOUBLE) / (anchor_total + 7)
              * {SCALE}) AS BIGINT) AS sense_prob6
  FROM dict
""")
def rl_dict_probabilities(spark, sf_dir):
    """A4-A6 via the production with_probabilities() column arithmetic
    (anchor_text_total synthesized as link_total + 7)."""
    from .linking import with_probabilities
    d = _spark_dict(spark, sf_dir)
    anchors = d.select(
        "anchor_norm", F.col("sense").alias("target_id"),
        F.col("sense_cnt").alias("sense_link_count"),
        F.col("anchor_total").alias("anchor_link_total"),
        (F.col("anchor_total") + 7).alias("anchor_text_total"))
    p = with_probabilities(anchors)
    return p.select("anchor_norm", "target_id",
                    _r6(F.col("prior_prob")).alias("prior6"),
                    _r6(F.col("link_prob")).alias("link_prob6"),
                    _r6(F.col("sense_prob")).alias("sense_prob6"))


_RD_NORM_TITLE = NORMALIZE_DUCKDB_SQL.format(col="title")

@q("rl_redirect_dictionary", f"""
  WITH pages AS (
    SELECT p_partkey AS target_id, p_name AS title, false AS is_redirect
    FROM part
    UNION ALL
    SELECT p_partkey + 1000000, p_name, true FROM part),
  raw_links AS (
    SELECT p_partkey AS doc_id, upper(p_name) AS anchor,
           CASE WHEN p_partkey % 2 = 0 THEN p_partkey + 1000000
                ELSE p_partkey END AS target_id,
           true AS is_link
    FROM part
    UNION ALL
    SELECT p_partkey + 500000, upper(p_name), p_partkey, false FROM part),
  normed0 AS (
    SELECT doc_id, {NORMALIZE_DUCKDB_SQL.format(col='anchor')} AS anchor_norm,
           target_id, is_link
    FROM raw_links),
  canon AS (SELECT target_id AS canon_id, {_RD_NORM_TITLE} AS canon_norm
            FROM pages WHERE NOT is_redirect),
  redirects AS (SELECT target_id AS rd_id, {_RD_NORM_TITLE} AS rd_norm
                FROM pages WHERE is_redirect),
  rd_map AS (SELECT rd_id, canon_id
             FROM redirects JOIN canon ON rd_norm = canon_norm),
  normed AS (SELECT n.doc_id, n.anchor_norm,
                    coalesce(m.canon_id, n.target_id) AS target_id, n.is_link
             FROM normed0 n LEFT JOIN rd_map m ON n.target_id = m.rd_id),
  links AS (SELECT * FROM normed WHERE is_link),
  sense AS (SELECT anchor_norm, target_id,
                   CAST(count(*) AS BIGINT) AS sense_link_count
            FROM links GROUP BY 1, 2),
  atot AS (SELECT anchor_norm, CAST(count(*) AS BIGINT) AS anchor_link_total
           FROM links GROUP BY 1),
  ttot AS (SELECT anchor_norm, CAST(count(*) AS BIGINT) AS anchor_text_total
           FROM normed GROUP BY 1),
  titles AS (SELECT target_id, {_RD_NORM_TITLE} AS title_norm FROM pages),
  rd_flags AS (SELECT DISTINCT rd_norm AS anchor_norm, canon_id AS target_id
               FROM redirects JOIN canon ON rd_norm = canon_norm)
  SELECT s.anchor_norm, s.target_id, s.sense_link_count,
         a.anchor_link_total, t.anchor_text_total,
         s.anchor_norm = ti.title_norm AS from_title,
         rf.target_id IS NOT NULL AS from_redirect
  FROM sense s JOIN atot a USING (anchor_norm) JOIN ttot t USING (anchor_norm)
  LEFT JOIN titles ti ON ti.target_id = s.target_id
  LEFT JOIN rd_flags rf
    ON rf.anchor_norm = s.anchor_norm AND rf.target_id = s.target_id
""")
def rl_redirect_dictionary(spark, sf_dir):
    """A1-A3 + A7: the full dictionary build (normalize → redirect
    resolution → sense/anchor/text aggregations) on a synthetic
    raw-link corpus where half the links point at redirect pages —
    the oracle proves they land on the canonical target."""
    from .dictionary import build_anchor_dictionary
    p = _read(spark, sf_dir, "part")
    pages = p.select(F.col("p_partkey").alias("target_id"),
                     F.col("p_name").alias("title"),
                     F.lit(False).alias("is_redirect")) \
        .unionByName(p.select(
            (F.col("p_partkey") + 1_000_000).alias("target_id"),
            F.col("p_name").alias("title"),
            F.lit(True).alias("is_redirect")))
    raw = p.select(
        F.col("p_partkey").alias("doc_id"),
        F.upper("p_name").alias("anchor"),
        F.when(F.col("p_partkey") % 2 == 0, F.col("p_partkey") + 1_000_000)
        .otherwise(F.col("p_partkey")).alias("target_id"),
        F.lit(True).alias("is_link")) \
        .unionByName(p.select(
            (F.col("p_partkey") + 500_000).alias("doc_id"),
            F.upper("p_name").alias("anchor"),
            F.col("p_partkey").alias("target_id"),
            F.lit(False).alias("is_link")))
    d = build_anchor_dictionary(raw, pages)
    # A8 flags selected into the hash-gated output (VERDICT r02 next #4:
    # a from_title / from_redirect regression must fail CORRECTNESS)
    return d.select("anchor_norm", "target_id",
                    F.col("sense_link_count").cast("bigint")
                    .alias("sense_link_count"),
                    F.col("anchor_link_total").cast("bigint")
                    .alias("anchor_link_total"),
                    F.col("anchor_text_total").cast("bigint")
                    .alias("anchor_text_total"),
                    "from_title", "from_redirect")


@q("rl_relatedness_mw", f"""
  WITH pl AS (SELECT l_orderkey AS src_id, l_partkey % 500 AS e
              FROM lineitem),
  il AS (SELECT DISTINCT src_id, e FROM pl),
  sizes AS (SELECT e, CAST(count(*) AS BIGINT) AS n_in FROM il GROUP BY 1),
  np AS (SELECT CAST(count(DISTINCT src_id) AS DOUBLE) AS n_pages FROM pl),
  inter AS (SELECT l.e AS e1, r.e AS e2, count(*) AS si
            FROM il l JOIN il r ON l.src_id = r.src_id AND l.e <> r.e
            GROUP BY 1, 2)
  SELECT e1, e2, CAST(si AS BIGINT) AS shared_inlinks,
         CAST(ROUND((CASE
           WHEN (ln(n_pages) - ln(CAST(least(s1.n_in, s2.n_in) AS DOUBLE))) > 0
           THEN greatest(0.0, least(1.0,
             1 - (ln(CAST(greatest(s1.n_in, s2.n_in) AS DOUBLE))
                  - ln(CAST(si AS DOUBLE)))
               / (ln(n_pages) - ln(CAST(least(s1.n_in, s2.n_in) AS DOUBLE)))))
           ELSE 1.0 END) * {SCALE}) AS BIGINT) AS mw6
  FROM inter
  JOIN sizes s1 ON s1.e = inter.e1
  JOIN sizes s2 ON s2.e = inter.e2, np
""")
def rl_relatedness_mw(spark, sf_dir):
    """X6: log-normalized Milne-Witten relatedness over a bipartite
    order→part link graph (sources = orders, entities = part buckets)."""
    from .linking import relatedness_table
    l = _read(spark, sf_dir, "lineitem")
    pl = l.select(F.col("l_orderkey").alias("src_id"),
                  (F.col("l_partkey") % 500).alias("dst_id"))
    ents = pl.select(F.col("dst_id").alias("target_id"))
    rel = relatedness_table(pl, ents)
    return rel.select("e1", "e2",
                      F.col("shared_inlinks").cast("bigint")
                      .alias("shared_inlinks"),
                      _r6(F.col("mw_rel")).alias("mw6"))


@q("rl_salted_join", f"""
  {_CANDS_SQL}
""")
def rl_salted_join(spark, sf_dir):
    """J2: the salted skew-join plan must produce EXACTLY the plain
    equi-join result — the oracle is the plain SQL join, so the
    salt/explode/union machinery is verified end-to-end."""
    from .config import SemlinkConfig
    from .linking import salted_candidate_join
    dict_df = _spark_dict(spark, sf_dir)
    anchors = dict_df.select(
        "anchor_norm", F.col("sense").alias("target_id"),
        F.col("sense_cnt").alias("sense_link_count"),
        F.col("anchor_total").alias("anchor_link_total"),
        (F.col("anchor_total") + 7).alias("anchor_text_total"),
        "prior6")
    d = _docs(spark, sf_dir)
    mentions = (d.select(
        "doc_id",
        F.explode(F.array_remove(F.split(F.trim("text"), r"\s+"), ""))
        .alias("token")).distinct()
        .select(F.concat_ws(":", "doc_id", "token").alias("mention_id"),
                F.col("token").alias("ngram_norm")))
    hot = (mentions.groupBy("ngram_norm").agg(F.count("*").alias("c"))
           .filter(F.col("c") >= 20)
           .select(F.col("ngram_norm").alias("anchor_norm")))
    j = salted_candidate_join(mentions, anchors, hot,
                              SemlinkConfig(salt_buckets=4))
    return j.select("mention_id", "target_id", "prior6")


_ML_W = (0.8, -0.5, 0.3)
_ML_B = 0.1

@q("ml_logistic_apply", f"""
  SELECT p_partkey,
         CAST(ROUND(1.0 / (1.0 + exp(-(
             {_ML_W[0]} * (CAST(length(p_name) AS DOUBLE) / 32.0)
           + {_ML_W[1]} * (p_retailprice / 2000.0)
           + {_ML_W[2]} * (CAST(p_size AS DOUBLE) / 50.0)
           + {_ML_B}))) * {SCALE}) AS BIGINT) AS score6
  FROM part
""")
def ml_logistic_apply(spark, sf_dir):
    """M1: vectorized σ(Xw+b) through the production Arrow pandas UDF
    (apply_model), deterministic literal weights, sigmoid oracle-checked."""
    import numpy as np
    from .learning import apply_model
    p = _read(spark, sf_dir, "part")
    feats = p.select("p_partkey", F.array(
        F.length("p_name").cast("double") / 32.0,
        F.col("p_retailprice") / 2000.0,
        F.col("p_size").cast("double") / 50.0).alias("features"))
    out = apply_model(feats, np.array(_ML_W), _ML_B)
    return out.select("p_partkey",
                      _r6(F.col("learning_score")).alias("score6"))


@q("ops_metrics", """
  SELECT 'run' AS run_id, 'documents' AS name,
         CAST(count(*) AS BIGINT) AS "rows" FROM documents
  UNION ALL
  SELECT 'run', 'events', CAST(count(*) AS BIGINT) FROM events
""")
def ops_metrics(spark, sf_dir):
    """O2: the MetricsCollector counts table, oracle-checked against
    plain COUNT(*) aggregates."""
    from .ops import MetricsCollector
    mc = MetricsCollector(spark)
    with mc.stage("scan"):
        mc.rows("documents", _docs(spark, sf_dir))
        mc.rows("events", _read(spark, sf_dir, "events"))
    return mc.to_dataframes()["metrics_counts"]


@q("ops_lineage", None)   # rows-only: partition layout is engine-specific
def ops_lineage(spark, sf_dir):
    """O1: per-partition row counts + input files for the documents
    scan (skew/audit surface; no ANSI-SQL equivalent by design)."""
    from .ops import MetricsCollector
    mc = MetricsCollector(spark)
    return mc.lineage_snapshot("scan_documents", _docs(spark, sf_dir),
                               with_files=True)


@q("stream_candidates_availablenow", None)   # rows-only: streaming engine
def stream_candidates_availablenow(spark, sf_dir):
    """§2.10: file-source micro-batch streaming linking (availableNow
    trigger → memory sink); deterministic row set, engine-specific
    execution — rows-only by design."""
    import tempfile
    from semlink.fixtures import generate, to_spark
    from semlink.streaming import stream_candidates
    d = to_spark(spark, generate("tiny"))
    src = tempfile.mkdtemp(prefix="semlink_q_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="semlink_q_stream_ckpt_")
    d["transcripts"].coalesce(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(d["transcripts"].schema).parquet(src)
    out = stream_candidates(stream, d["anchors"])
    qy = (out.select("mention_id", "target_id").writeStream
          .format("memory").queryName("q_stream_cands")
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    qy.awaitTermination(180)
    return spark.sql("SELECT * FROM q_stream_cands")


# =====================================================================
# Composed near-dup pipeline: MinHash → LSH buckets → candidate pairs →
# exact Jaccard verify → threshold edges → connected components — the
# dedup family end-to-end, exactly the shape it runs at 100 TB
# =====================================================================

_ND_PAIRS_SQL = f"""
  WITH b AS ({_BUCKET_SQL}),
  sized AS (SELECT band, bucket FROM b GROUP BY band, bucket
            HAVING count(*) <= 64),
  cand AS (
    SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id
    FROM (SELECT b.* FROM b JOIN sized USING (band, bucket)) l
    JOIN (SELECT b.* FROM b JOIN sized USING (band, bucket)) r
      ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
  sh AS ({_SHINGLE_SQL}),
  sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
  ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
  inter AS (SELECT p.left_id, p.right_id, count(*) AS inter
            FROM cand p
            JOIN ex el ON el.doc_id = p.left_id
            JOIN ex er ON er.doc_id = p.right_id AND er.s = el.s
            GROUP BY 1, 2)
  SELECT p.left_id, p.right_id
  FROM cand p
  JOIN inter i USING (left_id, right_id)
  JOIN sizes sl ON sl.doc_id = p.left_id
  JOIN sizes sr ON sr.doc_id = p.right_id
  WHERE CAST(ROUND(CAST(i.inter AS DOUBLE)
             / (sl.n_sh + sr.n_sh - i.inter) * {SCALE}) AS BIGINT)
        >= {SCALE // 2}
"""

@q("dedup_near_dup_clusters", f"""
  WITH RECURSIVE edges AS (
    SELECT 'd' || lpad(CAST(left_id AS VARCHAR), 6, '0') AS src,
           'd' || lpad(CAST(right_id AS VARCHAR), 6, '0') AS dst
    FROM ({_ND_PAIRS_SQL})),
  sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
          UNION SELECT src, src FROM edges UNION SELECT dst, dst FROM edges),
  reach(a, b) AS (
    SELECT src, dst FROM sym
    UNION
    SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src
  )
  SELECT a AS mention_id, min(b) AS cluster_id FROM reach GROUP BY a
""")
def dedup_near_dup_clusters(spark, sf_dir):
    """Dedup family composed e2e: the LSH candidate pairs are verified
    with exact shingle Jaccard (≥ 0.5), surviving pairs become edges,
    and the SAME checkpointed large/small-star CC that clusters
    record-linkage mentions labels the near-dup groups. The oracle
    recomputes the whole chain, CC included (recursive CTE)."""
    import tempfile
    from .cluster import run_connected_components
    from .config import SemlinkConfig
    d = _docs(spark, sf_dir)
    sigs = dd.minhash_signatures(d)
    pairs = dd.lsh_candidate_pairs(dd.lsh_buckets(sigs))
    jac = dd.ngram_jaccard(d, pairs)
    ident = lambda c: F.concat(F.lit("d"),
                               F.lpad(F.col(c).cast("string"), 6, "0"))
    edges = (jac.filter(
        _r6(F.col("inter").cast("double")
            / (F.col("n_l") + F.col("n_r") - F.col("inter")))
        >= SCALE // 2)
        .select(ident("left_id").alias("src"), ident("right_id").alias("dst")))
    ckpt = tempfile.mkdtemp(prefix="semlink_nd_cc_")
    return run_connected_components(edges, SemlinkConfig(), ckpt_dir=ckpt)


_STOP_LIST = ", ".join(f"'{w}'" for w in ts.EN_STOPWORDS)

@q("rl_stopword_filter", f"""
  WITH toks AS (SELECT DISTINCT doc_id, token FROM ({_TOK_SQL}))
  SELECT CAST(doc_id AS VARCHAR) || ':' || token AS mention_id,
         token AS ngram_norm
  FROM toks WHERE token NOT IN ({_STOP_LIST})
""")
def rl_stopword_filter(spark, sf_dir):
    """F4: bare-stopword mention keys are dropped (reference stopword
    skip); multi-word keys containing stopwords survive."""
    from .linking import stopword_filter
    d = _docs(spark, sf_dir)
    toks = (d.select(
        "doc_id",
        F.explode(F.array_remove(F.split(F.trim("text"), r"\s+"), ""))
        .alias("ngram_norm")).distinct()
        .select(F.concat_ws(":", "doc_id", "ngram_norm").alias("mention_id"),
                "ngram_norm"))
    return stopword_filter(toks)


# =====================================================================
# Round-3 coverage tail (VERDICT r02 next #4/#5/#6): S1 CSV load, A9
# page degree, J4/X5 page-feature join, X1/X7/T5 feature assembly, M2
# deterministic fit, full ANN index path (k-means + IVF near-dup
# edges), streaming session windows
# =====================================================================

@q("src_csv_load", """
  SELECT n_regionkey AS target_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(n_nationkey) AS BIGINT) AS doc_id_sum,
         CAST(sum(CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_links
  FROM nation GROUP BY 1
""")
def src_csv_load(spark, sf_dir):
    """S1: the Wikipedia-Miner-style CSV dump load (typed schema,
    header, FAILFAST — sources.read_raw_links_csv) round-tripped
    through a real CSV file; the oracle recomputes the aggregate from
    the source table, so a type-coercion or parse bug fails the hash."""
    import tempfile
    from .sources import read_raw_links_csv
    n = _read(spark, sf_dir, "nation")
    raw = n.select(F.col("n_nationkey").cast("long").alias("doc_id"),
                   F.col("n_name").alias("anchor"),
                   F.col("n_regionkey").cast("long").alias("target_id"),
                   (F.col("n_nationkey") % 2 == 0).alias("is_link"))
    d = tempfile.mkdtemp(prefix="semlink_csv_")
    raw.write.mode("overwrite").option("header", True).csv(d)
    back = read_raw_links_csv(spark, d)
    return back.groupBy("target_id").agg(
        F.count("*").alias("n_rows"),
        F.sum("doc_id").alias("doc_id_sum"),
        F.sum(F.col("is_link").cast("long")).alias("n_links"))


_PAGE_GRAPH_SQL = """
  pl AS (SELECT l_orderkey % 500 AS src_id, l_partkey % 500 AS dst_id
         FROM lineitem),
  ids AS (SELECT src_id AS id FROM pl UNION SELECT dst_id FROM pl),
  pages AS (SELECT id AS target_id, 'p' || CAST(id AS VARCHAR) AS title,
                   id % 10 = 0 AS is_redirect
            FROM ids),
  inc AS (SELECT dst_id AS target_id, CAST(count(*) AS BIGINT) AS c
          FROM pl GROUP BY 1),
  outc AS (SELECT src_id AS target_id, CAST(count(*) AS BIGINT) AS c
           FROM pl GROUP BY 1),
  pagestats AS (
    SELECT p.target_id, p.title, p.is_redirect,
           COALESCE(i.c, 0) AS inlink_count,
           COALESCE(o.c, 0) AS outlink_count
    FROM pages p
    LEFT JOIN inc i USING (target_id)
    LEFT JOIN outc o USING (target_id))
"""


def _spark_page_graph(spark, sf_dir):
    l = _read(spark, sf_dir, "lineitem")
    pl = l.select((F.col("l_orderkey") % 500).alias("src_id"),
                  (F.col("l_partkey") % 500).alias("dst_id"))
    ids = (pl.select(F.col("src_id").alias("id"))
           .union(pl.select(F.col("dst_id").alias("id"))).distinct())
    pages = ids.select(
        F.col("id").alias("target_id"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("title"),
        (F.col("id") % 10 == 0).alias("is_redirect"))
    return pl, pages


@q("rl_page_degree", f"""
  WITH {_PAGE_GRAPH_SQL}
  SELECT target_id, title, is_redirect, inlink_count, outlink_count
  FROM pagestats
""")
def rl_page_degree(spark, sf_dir):
    """A9: build_page_stats in/out-degree over a synthetic page-link
    graph (orders → part buckets folded into one 500-page id space)."""
    from .dictionary import build_page_stats
    pl, pages = _spark_page_graph(spark, sf_dir)
    s = build_page_stats(pl, pages)
    return s.select("target_id", "title", "is_redirect",
                    F.col("inlink_count").cast("bigint").alias("inlink_count"),
                    F.col("outlink_count").cast("bigint").alias("outlink_count"))


@q("rl_page_features", f"""
  WITH {_PAGE_GRAPH_SQL},
  cands AS (SELECT 'm:' || CAST(p_partkey AS VARCHAR) AS mention_id,
                   p_partkey % 500 AS target_id
            FROM part)
  SELECT c.mention_id, c.target_id,
         ps.inlink_count AS f_inlinks,
         ps.outlink_count AS f_outlinks,
         ps.is_redirect AS f_is_redirect
  FROM cands c LEFT JOIN pagestats ps USING (target_id)
""")
def rl_page_features(spark, sf_dir):
    """J4 + X5: attach_page_features broadcast left join carrying
    article features (degree stats, redirect flag) onto candidates."""
    from .dictionary import build_page_stats
    from .linking import attach_page_features
    pl, pages = _spark_page_graph(spark, sf_dir)
    stats = build_page_stats(pl, pages)
    p = _read(spark, sf_dir, "part")
    cands = p.select(
        F.concat_ws(":", F.lit("m"), F.col("p_partkey").cast("string"))
        .alias("mention_id"),
        (F.col("p_partkey") % 500).alias("target_id"))
    out = attach_page_features(cands, stats)
    return out.select("mention_id", "target_id",
                      F.col("f_inlinks").cast("bigint").alias("f_inlinks"),
                      F.col("f_outlinks").cast("bigint").alias("f_outlinks"),
                      "f_is_redirect")


_INITCAP_DUCK = """
  array_to_string(list_transform(string_split(p_name, ' '),
    w -> CASE WHEN length(w) = 0 THEN w
              ELSE upper(w[1]) || lower(w[2:]) END), ' ')
"""

@q("ml_feature_assembly", f"""
  SELECT p_partkey,
         CAST(len(string_split(p_name, ' ')) AS BIGINT) AS f_len_words,
         CAST(length(p_name) AS BIGINT) AS f_len_chars,
         CAST(CASE WHEN p_name = ({_INITCAP_DUCK}) THEN 1 ELSE 0 END
              AS BIGINT) AS f_is_initcap,
         CAST(CASE WHEN p_name = lower(p_name) THEN 1 ELSE 0 END
              AS BIGINT) AS f_is_lower,
         CAST(ROUND(p_retailprice / 2000.0 * {SCALE}) AS BIGINT) AS feat0_6,
         CAST(ROUND(CAST(p_size AS DOUBLE) / 50.0 * {SCALE}) AS BIGINT)
           AS feat1_6,
         CAST(ROUND(p_retailprice / 4000.0 * {SCALE}) AS BIGINT) AS feat2_6,
         CAST(len(string_split(p_name, ' ')) AS BIGINT) * {SCALE} AS feat3_6,
         CAST(length(p_name) AS BIGINT) * {SCALE} AS feat4_6,
         CAST(CASE WHEN p_name = ({_INITCAP_DUCK}) THEN 1 ELSE 0 END
              AS BIGINT) * {SCALE} AS feat5_6,
         CAST(CASE WHEN p_name = lower(p_name) THEN 1 ELSE 0 END
              AS BIGINT) * {SCALE} AS feat6_6,
         CAST(0 AS BIGINT) AS feat7_6
  FROM part
""")
def ml_feature_assembly(spark, sf_dir):
    """X1 + X7 + T5: n-gram shape/casing features and the FIXED-ORDER
    feature vector (learning.FEATURE_COLS) — the oracle recomputes
    every array element independently, so a reordering or a broken
    casing expression fails the hash."""
    from .learning import assemble_features
    p = _read(spark, sf_dir, "part")
    cands = p.select(
        "p_partkey",
        F.col("p_name").alias("ngram"),
        (F.col("p_retailprice") / 2000.0).alias("prior_prob"),
        (F.col("p_size").cast("double") / 50.0).alias("link_prob"),
        (F.col("p_retailprice") / 4000.0).alias("sense_prob"))
    d = assemble_features(cands)
    return d.select(
        "p_partkey",
        F.col("f_len_words").cast("bigint").alias("f_len_words"),
        F.col("f_len_chars").cast("bigint").alias("f_len_chars"),
        F.col("f_is_initcap").cast("bigint").alias("f_is_initcap"),
        F.col("f_is_lower").cast("bigint").alias("f_is_lower"),
        *[_r6(F.element_at("features", i + 1)).alias(f"feat{i}_6")
          for i in range(8)])


_KM_K = 4

def _km_seeds_sql(k: int) -> str:
    return f"""
  c0 AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
           CAST(embedding AS DOUBLE[]) AS c_emb
    FROM (SELECT vec_id, embedding FROM embeddings
          ORDER BY vec_id LIMIT {k}))"""


def _km_iter_sql(i: int, prev: str) -> str:
    """One Lloyd iteration as CTEs: argmax-cosine assignment against
    {prev}, then the scaled-bigint-deterministic centroid update (empty
    cells keep their previous centroid) — the exact arithmetic of
    simsearch.kmeans_centroids."""
    cos = _cos_sql("CAST(e.embedding AS DOUBLE[])", "c.c_emb")
    return f"""
  asg{i} AS (
    SELECT vec_id, embedding, cell FROM (
      SELECT e.vec_id, e.embedding, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               CAST(ROUND(({cos}) * {SCALE}) AS BIGINT) DESC, c.cell) AS crk
      FROM embeddings e CROSS JOIN {prev} c) WHERE crk = 1),
  upd{i} AS (
    SELECT cell, list(m ORDER BY pos) AS c_emb FROM (
      SELECT cell, pos, CAST(s AS DOUBLE) / n / 1000000.0 AS m FROM (
        SELECT a.cell, u.pos,
               CAST(sum(CAST(ROUND(u.x * 1000000.0) AS BIGINT)) AS BIGINT) AS s,
               count(*) AS n
        FROM asg{i} a, LATERAL (
          SELECT unnest(CAST(a.embedding AS DOUBLE[])) AS x,
                 generate_subscripts(a.embedding, 1) AS pos) u
        GROUP BY 1, 2)) GROUP BY cell),
  c{i + 1} AS (SELECT p.cell, COALESCE(u.c_emb, p.c_emb) AS c_emb
               FROM {prev} p LEFT JOIN upd{i} u USING (cell))"""


@q("ann_kmeans_centroids", f"""
  WITH {_km_seeds_sql(_KM_K)},
  {_km_iter_sql(0, 'c0')},
  {_km_iter_sql(1, 'c1')}
  SELECT cell, CAST(u.pos AS BIGINT) - 1 AS pos,
         CAST(ROUND(u.m * {SCALE}) AS BIGINT) AS m6
  FROM c2, LATERAL (SELECT unnest(c_emb) AS m,
                           generate_subscripts(c_emb, 1) AS pos) u
""")
def ann_kmeans_centroids(spark, sf_dir):
    """Distributed Lloyd k-means (the IVF coarse quantizer), fully
    oracle-verified: DuckDB re-runs both iterations — deterministic
    seed centroids, argmax-cosine assignment, scaled-bigint centroid
    averaging, empty-cell carry-over — element by element."""
    e = _read(spark, sf_dir, "embeddings")
    c = ss.kmeans_centroids(e, k=_KM_K, iters=2)
    return (c.select("cell", F.posexplode("c_emb").alias("pos", "m"))
            .select("cell", F.col("pos").cast("bigint").alias("pos"),
                    _r6(F.col("m")).alias("m6")))


_ND_THR6 = 990_000
_ND_K = 32      # more, smaller cells than the top-k query: near-dup cost is
                # sum(|cell|^2); k=32 cut the bench query ~4x vs k=8

@q("ann_ivf_near_dup_edges", f"""
  WITH aug AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 100000,
           list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.05 + 0.01)
    FROM embeddings WHERE vec_id < 100),
  seeds AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
           embedding AS c_emb
    FROM (SELECT vec_id, embedding FROM aug ORDER BY vec_id LIMIT {_ND_K})),
  csims AS (
    SELECT e.vec_id, s.cell,
           CAST(ROUND(({_cos_sql('e.embedding', 's.c_emb')})
                * {SCALE}) AS BIGINT) AS csim6
    FROM aug e CROSS JOIN seeds s),
  asg AS (
    SELECT vec_id, cell FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY csim6 DESC, cell) AS crk
      FROM csims) WHERE crk <= 2),
  pairs AS (
    SELECT DISTINCT q.vec_id AS src, c.vec_id AS dst
    FROM asg q JOIN asg c ON q.cell = c.cell AND q.vec_id < c.vec_id),
  sims AS (
    SELECT p.src, p.dst,
           CAST(ROUND(({_cos_sql('e1.embedding', 'e2.embedding')})
                * {SCALE}) AS BIGINT) AS sim6
    FROM pairs p
    JOIN aug e1 ON e1.vec_id = p.src
    JOIN aug e2 ON e2.vec_id = p.dst)
  SELECT src, dst, sim6 FROM sims WHERE sim6 >= {_ND_THR6}
""")
def ann_ivf_near_dup_edges(spark, sf_dir):
    """The production cell-routed near-dup edge builder
    (cosine_near_dup_edges_ivf: Σ|cell|² work, nprobe=2, scaled-bigint
    threshold). The corpus is augmented with 100 deterministic
    perturbed twins (x → 1.05x + 0.01, cosine ≈ 0.9997) so the planted
    near-dup set is non-trivial; the oracle re-derives the probe sets,
    the candidate-pair dedup, and every surviving edge — the IVF
    routing must recover every planted twin through a shared cell."""
    e = _read(spark, sf_dir, "embeddings")
    base = e.select("vec_id", F.transform(
        "embedding", lambda x: x.cast("double")).alias("embedding"))
    twins = (e.filter(F.col("vec_id") < 100)
             .select((F.col("vec_id") + 100_000).alias("vec_id"),
                     F.transform("embedding",
                                 lambda x: x.cast("double") * 1.05 + 0.01)
                     .alias("embedding")))
    aug = base.unionByName(twins)
    cents = ss.seed_centroids(aug, k=_ND_K)
    return ss.cosine_near_dup_edges_ivf(
        aug, cents, threshold=_ND_THR6 / SCALE, nprobe=2)


@q("stream_session_windows", None)   # rows-only: streaming engine
def stream_session_windows(spark, sf_dir):
    """§2.10: session-windowed per-conversation candidate counts
    (windowed_mention_counts) via availableNow micro-batches — the
    streaming analogue of the reference's rolling `context`.
    Deterministic window bounds on the fixture; engine-specific
    execution — rows-only by design (VERDICT r02 next #6)."""
    import tempfile
    from semlink.fixtures import generate, to_spark
    from semlink.streaming import windowed_mention_counts
    d = to_spark(spark, generate("tiny"))
    src = tempfile.mkdtemp(prefix="semlink_q_swin_src_")
    ckpt = tempfile.mkdtemp(prefix="semlink_q_swin_ckpt_")
    d["transcripts"].coalesce(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(d["transcripts"].schema).parquet(src)
    out = windowed_mention_counts(stream, d["anchors"], gap="30 minutes")
    qy = (out.select("conv_id", F.col("w.start").alias("w_start"),
                     F.col("w.end").alias("w_end"),
                     "n_candidates", "n_entities")
          .writeStream.format("memory").queryName("q_swin")
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    qy.awaitTermination(180)
    return spark.sql("SELECT * FROM q_swin")


@q("ml_logistic_fit", """
  SELECT * FROM (VALUES
    ('w0',   CAST(7430767 AS BIGINT)),
    ('w1',   CAST(-3387240 AS BIGINT)),
    ('w2',   CAST(1131348 AS BIGINT)),
    ('bias', CAST(-2330039 AS BIGINT))) AS t(param, value6)
""")
def ml_logistic_fit(spark, sf_dir):
    """M2: the deterministic driver-side logistic fit on a fixed
    synthetic labeled sample (Spark generates + collects the sample;
    fit_logistic runs 500 fixed gradient steps). The oracle is the
    pinned golden weight vector — bit-deterministic because sample
    generation and the fit are pure IEEE double arithmetic in a fixed
    order. A regression in feature extraction, collect order, or the
    optimizer changes the weights and fails the hash."""
    import numpy as np
    from .learning import fit_logistic
    d = (spark.range(200).select(
        "id",
        (((F.col("id") * 7) % 32 + 1) / 32.0).alias("x0"),
        (((F.col("id") * 13) % 97) / 97.0).alias("x1"),
        (((F.col("id") * 29) % 53) / 53.0).alias("x2"))
        .withColumn("y", ((2.0 * F.col("x0") - F.col("x1")
                           + 0.5 * F.col("x2")) > 0.7).cast("double"))
        .orderBy("id"))
    rows = d.collect()
    X = np.array([[r.x0, r.x1, r.x2] for r in rows])
    y = np.array([r.y for r in rows])
    w, b = fit_logistic(X, y)
    out = [("w0", int(round(w[0] * SCALE))),
           ("w1", int(round(w[1] * SCALE))),
           ("w2", int(round(w[2] * SCALE))),
           ("bias", int(round(b * SCALE)))]
    return spark.createDataFrame(out, "param string, value6 long")


@q("text_tfidf_top_terms", f"""
  WITH toks AS (
    SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), ' +'),
                                      x -> x <> '')) AS term
    FROM documents),
  tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         FROM toks GROUP BY 1, 2),
  dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
  nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
  scored AS (
    SELECT t.doc_id, t.term, t.tf, d.df_t,
           CAST(ROUND(CAST(t.tf AS DOUBLE) * ln(n / d.df_t) * {SCALE})
                AS BIGINT) AS tfidf6
    FROM tf t JOIN dfq d USING (term), nd)
  SELECT doc_id, term, tf, df_t, tfidf6, rk FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf6 DESC, term) AS rk
    FROM scored)
  WHERE rk <= 5
""")
def text_tfidf_top_terms(spark, sf_dir):
    """Training-data keyword extraction: per-document top-5 terms by
    TF-IDF (textstats.tfidf_top_terms), rank and score hash-gated."""
    return ts.tfidf_top_terms(_docs(spark, sf_dir), k=5)


@q("stream_rolling_context", None)   # rows-only: stateful streaming engine
def stream_rolling_context(spark, sf_dir):
    """§2.10: the custom applyInPandasWithState rolling-context
    operator (streaming.rolling_context) — bounded per-conversation
    entity state, the reference's cross-request `context` parameter.
    Deterministic on the fixture; state-store execution is
    engine-specific — rows-only by design."""
    import tempfile
    from semlink.fixtures import generate, to_spark
    from semlink.linking import candidate_join, generate_mentions
    from semlink.streaming import rolling_context
    d = to_spark(spark, generate("tiny"))
    cands = (candidate_join(
        generate_mentions(d["transcripts"]), d["anchors"])
        .join(d["transcripts"].select("conv_id", "turn_idx", "ts"),
              ["conv_id", "turn_idx"])
        .select("conv_id", "target_id", "ts"))
    src = tempfile.mkdtemp(prefix="semlink_q_rc_src_")
    ckpt = tempfile.mkdtemp(prefix="semlink_q_rc_ckpt_")
    cands.coalesce(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(cands.schema).parquet(src)
    out = rolling_context(stream, max_entities=16)
    qy = (out.select("conv_id", "n_ctx",
                     F.concat_ws(",", F.col("ctx_entities").cast("array<string>"))
                     .alias("ctx"))
          .writeStream.format("memory").queryName("q_rc")
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    qy.awaitTermination(180)
    return spark.sql("SELECT * FROM q_rc")


@q("sample_stratified", """
  SELECT doc_id, lang, sample_rk FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                       doc_id) AS sample_rk
    FROM documents)
  WHERE sample_rk <= 20
""")
def sample_stratified(spark, sf_dir):
    """Deterministic per-stratum sampling (datapipe.sampling): 20 docs
    per language, ranked by md5(id) — reproducible across runs and
    engines, no rand(); the oracle re-derives the exact row set."""
    from .datapipe.sampling import stratified_sample
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return stratified_sample(d, "lang", 20, keep_rank=True)


@q("dedup_decontaminate", f"""
  WITH sh AS ({_SHINGLE_SQL}),
  c AS (SELECT doc_id, md5(s) AS h
        FROM (SELECT doc_id, unnest(sh) AS s FROM sh)),
  b AS (SELECT DISTINCT md5(s) AS h
        FROM (SELECT unnest(sh) AS s FROM sh WHERE doc_id % 50 = 0)),
  sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
            FROM c GROUP BY 1),
  hits AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
           FROM c JOIN b USING (h) GROUP BY 1)
  SELECT s.doc_id, s.n_shingles,
         CAST(COALESCE(hi.n_overlap, 0) AS BIGINT) AS n_overlap,
         CAST(ROUND(CAST(COALESCE(hi.n_overlap, 0) AS DOUBLE)
              / s.n_shingles * {SCALE}) AS BIGINT) AS overlap6,
         CAST(ROUND(CAST(COALESCE(hi.n_overlap, 0) AS DOUBLE)
              / s.n_shingles * {SCALE}) AS BIGINT) >= {SCALE // 2}
           AS contaminated
  FROM sizes s LEFT JOIN hits hi ON hi.doc_id = s.doc_id
""")
def dedup_decontaminate(spark, sf_dir):
    """Benchmark decontamination (dedup.cross_corpus_overlap): every
    50th document plays the eval set; each corpus doc reports the
    fraction of its shingles found in that set. The planted benchmark
    docs must come back contaminated (overlap 1.0); the oracle
    re-derives every overlap fraction."""
    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 50 == 0)
    return dd.cross_corpus_overlap(d, bench)
