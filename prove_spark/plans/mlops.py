"""Training-pipeline ML primitives over the synthetic corpus tables:

- kmeans_centroids: a REAL distributed Lloyd's k-means trainer for the IVF
  coarse quantizer (ann_ivf_topk's centroids were a documented deterministic
  stand-in; this trains them). Iterative DataFrame rounds — broadcast the
  (k x dim)-sized centroid relation, assign each vector by exact squared-L2
  (DECIMAL-exact partial sums), recompute means, repeat — the same
  iterative-join shape as connected components / kg_pagerank.
- pack_sequences: token-budget sequence packing — the step that turns a
  deduped, sampled corpus into fixed-size training sequences. Deterministic
  offset-chunked packing (prefix-sum over a stable order), integer-exact.

Cross-engine exactness discipline (same as textops): distances/means go
through DECIMAL(28,14) partial sums (order-independent), mean divisions are
IEEE double ops, and every emitted float is quantized to the 1e-12 grid with
the HALF_UP floor trick so the driver's value hash sees identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .iterstate import truncate_round
from .textops import N_IVF_CENTROIDS, SEED_IDS_SQL_TMPL, _seed_centroid_ids


# shared table loader (single source: one place to change if the
# path layout or a catalog integration ever changes)
from .relational import _t  # noqa: E402


def _qz(col: F.Column) -> F.Column:
    """HALF_UP quantization to the 1e-12 grid (floor trick — identical in
    Spark and DuckDB; Python round() is banker's and diverges)."""
    return F.floor(col * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)


def _qz_sql(e: str) -> str:
    return f"FLOOR(({e}) * 1e12 + CAST(0.5 AS DOUBLE)) / 1e12"


# ------------------------------------------------------------------ k-means
KMEANS_K = N_IVF_CENTROIDS  # 8 — trains the IVF coarse quantizer
# measurement knob ONLY (scripts/measure_iter_checkpoint.py sweeps round
# counts to size the lineage-truncation default); the contract is 4
KMEANS_ITERS = max(
    1, int(__import__("os").environ.get("SPARK_GRAFT_KMEANS_ITERS", "4"))
)
# init = the IVF seed vectors: the K HIGHEST vec_ids selected by RANK
# (textops._seed_centroid_ids — a hardcoded base selects (max - base + 1)
# "centroids" on a larger table; an id-range predicate off max(vec_id)
# under-selects when the top ids have gaps)

# centroid relations persisted by the previous invocation — released on the
# next call (same hygiene as textops._DEDUP_CACHES / registry._KG_CACHES)
_KMEANS_CACHES: list = []


def _exploded(e: DataFrame) -> DataFrame:
    """The long-form (vec_id, i, x) relation every embedding operator in
    this module builds on — ONE definition so the double cast (and hence
    cross-engine bit-parity of every downstream DECIMAL sum) cannot
    silently diverge between call sites."""
    return e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
    )


def _nsq(ex: DataFrame) -> DataFrame:
    """Per-vector squared norms as exact DECIMAL(28,14) partial sums."""
    return ex.groupBy("vec_id").agg(
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,14)")).alias("nsq")
    )


def _train_centroids(e: DataFrame, ex: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The shared Lloyd's training loop (k=KMEANS_K, KMEANS_ITERS rounds,
    seed-vector init): returns ``(cent, assign)`` — the trained
    ``(cent_id, i, cx)`` long-form centroid relation and the final
    ``(vec_id, cent_id)`` assignment. Used by kmeans_centroids (the trainer
    query) and ann_ivf_topk (the IVF index consumes the trained quantizer).

    Takes ownership of the caller's persisted ``ex`` (registered in
    _KMEANS_CACHES, released on the next training call) and eagerly
    materializes it — it feeds every round's distance AND mean join plus
    the caller's downstream search, all concurrently-schedulable stages of
    one final action (the measured lazy-persist sibling race)."""
    for df in _KMEANS_CACHES:
        try:
            df.unpersist()
        except Exception:
            pass
    _KMEANS_CACHES.clear()
    _KMEANS_CACHES.append(ex)
    ex.count()

    seeds = _seed_centroid_ids(e, KMEANS_K)
    cent = ex.join(F.broadcast(seeds), "vec_id").select(
        "cent_id", "i", F.col("x").alias("cx")
    )
    assign = None
    for _ in range(KMEANS_ITERS):
        diff = F.col("x") - F.col("cx")
        dist = (
            ex.join(F.broadcast(cent), "i")
            .groupBy("vec_id", "cent_id")
            .agg(F.sum((diff * diff).cast("decimal(28,14)")).alias("dsq"))
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.asc("dsq"), F.asc("cent_id")
        )
        assign = (
            dist.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cent_id")
        )
        means = (
            assign.join(ex, "vec_id")
            .groupBy("cent_id", "i")
            .agg(
                _qz(
                    F.sum(F.col("x").cast("decimal(28,14)")).cast("double")
                    / F.count("*")
                ).alias("mx")
            )
        )
        # round-state cut: k x dim rows materialized, lineage truncated —
        # without it the plan doubles per round and DRIVER-side analysis
        # dominates wall (see plans/iterstate.py + BASELINE.md table)
        cent = truncate_round(
            cent.join(means, ["cent_id", "i"], "left").select(
                "cent_id", "i", F.coalesce("mx", F.col("cx")).alias("cx")
            ),
            _KMEANS_CACHES,
        )
    return cent, assign


def kmeans_centroids(spark, sf_dir):
    """Distributed Lloyd's k-means (k=8, 4 iterations) over the embeddings
    table, initialized from the fixed IVF seed vectors so the trained
    centroids are the drop-in replacement for ann_ivf_topk's stand-ins
    (ann_ivf_topk below consumes exactly this trained relation).

    Scale shape: the exploded vector relation is persisted ONCE and reused
    by all assignment and mean rounds (at 100 TB: a columnar long-form
    intermediate, bucketed by vec_id). Each round's assignment join
    BROADCASTS the centroid relation (k x dim rows — tiny at any corpus
    scale), so assignment is map-side + one (vec_id, cent_id)-keyed
    aggregation; the mean update is one (cent_id, dim)-keyed aggregation of
    corpus-long-form size. Per-round centroid relations are persisted (k x
    dim rows) so the lineage doesn't branch exponentially through the
    empty-cluster fallback's double reference. Empty clusters keep their
    previous centroid (LEFT JOIN + COALESCE) on both engines.

    Exactness: squared-L2 partial sums and per-dim mean numerators go
    through DECIMAL(28,14) (exact, order-independent → ties and argmins are
    deterministic), the mean division is an IEEE double op, and means are
    quantized to the 1e-12 grid. Assignment tie-break: lowest cent_id.
    """
    e = _t(spark, sf_dir, "embeddings")
    ex = _exploded(e).persist()
    cent, assign = _train_centroids(e, ex)
    sizes = assign.groupBy("cent_id").agg(F.count("*").alias("n"))
    return cent.join(F.broadcast(sizes), "cent_id", "left").select(
        "cent_id",
        F.col("i").alias("dim"),
        F.col("cx").alias("centroid"),
        F.coalesce("n", F.lit(0)).cast("long").alias("cluster_size"),
    )


def _kmeans_cte_chain(p: str = "", ex_where: str | None = None) -> str:
    """Unrolled Lloyd iterations as a DuckDB CTE chain fragment (ex/seeds →
    c0 → d1/a1/m1/c1 → … → c4), mirroring the Spark _train_centroids rounds
    expression for expression. Shared by KMEANS_SQL (trainer output),
    ANN_IVF_SQL (the IVF search composed on top of the trained c4), and
    PQ_SQL (which instantiates the chain TWICE — `p` prefixes every CTE
    name so two chains coexist in one query, and `ex_where` restricts the
    exploded relation to one dimension subspace)."""
    mean = _qz_sql(
        "CAST(SUM(CAST(e.x AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*)"
    )
    base_ex = """
  SELECT vec_id, UNNEST(embedding)::DOUBLE AS x,
         UNNEST(generate_series(0, len(embedding) - 1)) AS i
  FROM embeddings
"""
    if ex_where is None:
        ex_cte = f"{p}ex AS ({base_ex})"
    else:
        ex_cte = (
            f"{p}ex AS (\n  SELECT * FROM ({base_ex}  )"
            f" WHERE {ex_where})"
        )
    sql = f"""{ex_cte},
{p}seeds AS ({SEED_IDS_SQL_TMPL.format(k=KMEANS_K)}),
{p}c0 AS (
  SELECT s.cent_id, e.i, e.x AS cx
  FROM {p}ex e JOIN {p}seeds s USING (vec_id)
)"""  # noqa: the chain fragment opens no WITH — composers prepend it
    for t in range(1, KMEANS_ITERS + 1):
        sql += f""",
{p}d{t} AS (
  SELECT e.vec_id, c.cent_id,
         SUM(CAST((e.x - c.cx) * (e.x - c.cx) AS DECIMAL(28,14))) AS dsq
  FROM {p}ex e JOIN {p}c{t - 1} c USING (i) GROUP BY e.vec_id, c.cent_id),
{p}a{t} AS (
  SELECT vec_id, cent_id FROM (
    SELECT vec_id, cent_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dsq ASC, cent_id ASC) AS rn
    FROM {p}d{t}) WHERE rn = 1),
{p}m{t} AS (
  SELECT a.cent_id, e.i, {mean} AS mx
  FROM {p}a{t} a JOIN {p}ex e USING (vec_id) GROUP BY a.cent_id, e.i),
{p}c{t} AS (
  SELECT p.cent_id, p.i, COALESCE(m.mx, p.cx) AS cx
  FROM {p}c{t - 1} p LEFT JOIN {p}m{t} m
    ON m.cent_id = p.cent_id AND m.i = p.i)"""
    return sql


KMEANS_CTE_CHAIN = _kmeans_cte_chain()

KMEANS_SQL = f"""
WITH {KMEANS_CTE_CHAIN},
sizes AS (SELECT cent_id, COUNT(*) AS n FROM a{KMEANS_ITERS} GROUP BY cent_id)
SELECT c.cent_id, c.i AS dim, c.cx AS centroid,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS cluster_size
FROM c{KMEANS_ITERS} c LEFT JOIN sizes s USING (cent_id)"""


# ------------------------------------------------------- IVF ANN (trained)
N_IVF_PROBE = 2


def ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN (the scale path ann_topk_cosine is validated against),
    with the coarse quantizer TRAINED IN-PLAN: the k=8 centroids are the
    kmeans-refined means from _train_centroids (seed-vector init — r4's
    version assigned against the raw seed vectors; training the quantizer
    was the point of kmeans_centroids, so the IVF index now consumes it).

    Search: every DB vector is assigned to its nearest trained centroid by
    cosine (inverted lists), each query probes only its nprobe=2 nearest
    lists, exact cosine + top-3 within the candidates. All cosines are
    DECIMAL-exact partial sums over bit-identical (1e-12-quantized) centroid
    coordinates → deterministic ranking on both engines.

    Scale shape: training touches the corpus KMEANS_ITERS times through one
    persisted long-form relation; the assignment join is vectors x
    centroids with the k x dim centroid side BROADCAST, and the candidate
    search touches ~nprobe/K of the corpus instead of all of it. The oracle
    unrolls training + search in one CTE chain (KMEANS_CTE_CHAIN)."""
    from .textops import _centroid_cosine_ranked

    e = _t(spark, sf_dir, "embeddings")
    ex = _exploded(e).persist()
    cent, _ = _train_centroids(e, ex)  # takes ownership of ex's persist
    norms = _nsq(ex)
    # cosine(vector, trained centroid) for every vector (queries and DB alike)
    ranked = _centroid_cosine_ranked(ex, norms, cent)
    assign = ranked.where(
        (F.col("crank") == 1) & (F.col("vec_id") >= 5)
    ).select("vec_id", "cent_id")
    probes = ranked.where(
        (F.col("crank") <= N_IVF_PROBE) & (F.col("vec_id") < 5)
    ).select(F.col("vec_id").alias("query_id"), "cent_id")
    cands = probes.join(assign, "cent_id").select(
        "query_id", F.col("vec_id").alias("neighbor_id")
    )
    # exact cosine only for (query, candidate) pairs
    qx = ex.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "i", F.col("x").alias("qx")
    )
    nx = ex.where(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("neighbor_id"), "i", F.col("x").alias("nx")
    )
    dots = (
        cands.join(qx, "query_id")
        .join(nx, ["neighbor_id", "i"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum((F.col("qx") * F.col("nx")).cast("decimal(28,14)")).alias("dot"))
    )
    nq = norms.select(F.col("vec_id").alias("query_id"), F.col("nsq").alias("nsq_q"))
    nn = norms.select(
        F.col("vec_id").alias("neighbor_id"), F.col("nsq").alias("nsq_n")
    )
    cos = (
        dots.join(nq, "query_id")
        .join(nn, "neighbor_id")
        .withColumn(
            "cosine",
            F.col("dot").cast("double")
            / F.sqrt(F.col("nsq_q").cast("double") * F.col("nsq_n").cast("double")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


ANN_IVF_SQL = f"""
WITH {KMEANS_CTE_CHAIN},
norms AS (SELECT vec_id, SUM(CAST(x*x AS DECIMAL(28,14))) AS nsq FROM ex GROUP BY vec_id),
cnorms AS (
  SELECT cent_id, SUM(CAST(cx*cx AS DECIMAL(28,14))) AS cnsq
  FROM c{KMEANS_ITERS} GROUP BY cent_id
),
vc AS (
  SELECT e.vec_id, c.cent_id,
         CAST(SUM(CAST(e.x * c.cx AS DECIMAL(28,14))) AS DOUBLE)
           / SQRT(CAST(n.nsq AS DOUBLE) * CAST(cn.cnsq AS DOUBLE)) AS ccos
  FROM ex e JOIN c{KMEANS_ITERS} c USING (i)
  JOIN norms n ON n.vec_id = e.vec_id
  JOIN cnorms cn ON cn.cent_id = c.cent_id
  GROUP BY e.vec_id, c.cent_id, n.nsq, cn.cnsq
),
cranked AS (
  SELECT vec_id, cent_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS crank
  FROM vc
),
assign AS (SELECT vec_id, cent_id FROM cranked WHERE crank = 1 AND vec_id >= 5),
probes AS (SELECT vec_id AS query_id, cent_id FROM cranked WHERE crank <= {N_IVF_PROBE} AND vec_id < 5),
cands AS (SELECT p.query_id, a.vec_id AS neighbor_id FROM probes p JOIN assign a ON p.cent_id = a.cent_id),
dots AS (
  SELECT c.query_id, c.neighbor_id, SUM(CAST(q.x * n.x AS DECIMAL(28,14))) AS dot
  FROM cands c
  JOIN ex q ON q.vec_id = c.query_id
  JOIN ex n ON n.vec_id = c.neighbor_id AND n.i = q.i
  GROUP BY c.query_id, c.neighbor_id
),
cos AS (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE) / SQRT(CAST(nq.nsq AS DOUBLE) * CAST(nn.nsq AS DOUBLE)) AS cosine
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nn ON nn.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM cos
) WHERE rank <= 3
"""


# --------------------------------------------------------- sequence packing
PACK_CAP = 512  # token budget per packed training sequence
PACK_SHARDS = 4  # deterministic sub-shards per source stream


def pack_sequences(spark, sf_dir):
    """Token-budget sequence packing: assign each document a (seq_id,
    offset) inside fixed 512-token training sequences, by running prefix sum
    over a stable (doc_id) order — offset-chunked packing (every document
    lands at its stream offset; sequences are full except the stream tail).
    Integer-exact on both engines — no float discipline needed.

    Scale shape: packing is inherently sequential WITHIN a stream (each
    offset depends on every predecessor), so the parallel unit is the
    stream: (source, shard) where shard = doc_id % 4 splits hot sources into
    bounded independent streams (padding waste only at shard tails). The
    window prefix-sum shuffles once on the stream key; no stream ever needs
    to fit in memory (window with UNBOUNDED PRECEDING over a sorted
    partition streams in Spark)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        (F.col("doc_id") % PACK_SHARDS).cast("long").alias("shard"),
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return toks.select(
        "source",
        "shard",
        "doc_id",
        "n_tokens",
        F.floor(start / F.lit(PACK_CAP)).cast("long").alias("seq_id"),
        (start % PACK_CAP).cast("long").alias("offset_in_seq"),
    )


PACK_SQL = f"""
WITH toks AS (
  SELECT source, CAST(doc_id % {PACK_SHARDS} AS BIGINT) AS shard, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
runs AS (
  SELECT source, shard, doc_id, n_tokens,
    CAST(SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS start
  FROM toks
)
SELECT source, shard, doc_id, n_tokens,
  CAST(FLOOR(CAST(start AS DOUBLE) / {PACK_CAP}) AS BIGINT) AS seq_id,
  CAST(start % {PACK_CAP} AS BIGINT) AS offset_in_seq
FROM runs
"""


# ----------------------------------------------------------------- SemDeDup
# τ sits just above the measured p99.9 of within-cluster cosine (0.406 at
# sf0.001) so the keep flag splits the table non-trivially either way.
SEMDEDUP_TAU = 0.40

# assignment relation persisted by the previous invocation (feeds BOTH pair
# sides and the output — an unmaterialized persist would be recomputed by
# each concurrently-scheduled sibling stage)
_SEMDEDUP_CACHES: list = []


def semdedup_keep(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
    embeddings, comparing pairs ONLY within a cluster, and dropping any
    vector that has a lower-id near-duplicate (cosine ≥ τ) in its cluster —
    the composition of the IVF coarse quantizer (shared
    textops._centroid_cosine_ranked assignment, k=8 seed centroids) with
    the exact-cosine machinery.

    Scale shape: this is THE trick that makes embedding dedup tractable —
    pair cost is Σ_c s_c² over cluster sizes instead of N²; in production K
    grows with the corpus (K ∝ N / target-cluster-size) so s_c stays
    bounded and total pair work stays ~N × cluster_size. The centroid side
    of the assignment join is broadcast (k×dim rows). Output is ints +
    booleans only — no float discipline needed downstream of the
    decimal-exact cosines the threshold reads."""
    for df in _SEMDEDUP_CACHES:
        try:
            df.unpersist()
        except Exception:
            pass
    _SEMDEDUP_CACHES.clear()

    from .textops import _centroid_cosine_ranked, _seed_centroid_ids

    e = _t(spark, sf_dir, "embeddings")
    ex = _exploded(e).persist()
    _SEMDEDUP_CACHES.append(ex)
    norms = _nsq(ex)
    seeds = _seed_centroid_ids(e, KMEANS_K)
    cent = ex.join(F.broadcast(seeds), "vec_id").select(
        "cent_id", "i", F.col("x").alias("cx")
    )
    assign = (
        _centroid_cosine_ranked(ex, norms, cent)
        .where(F.col("crank") == 1)
        .select("vec_id", "cent_id")
        .persist()
    )
    _SEMDEDUP_CACHES.append(assign)
    assign.count()  # eager: feeds both pair sides + the output join

    a = assign.select(F.col("vec_id").alias("va"), "cent_id")
    b = assign.select(F.col("vec_id").alias("vb"), "cent_id")
    pairs = a.join(b, "cent_id").where(F.col("va") < F.col("vb"))
    exa = ex.select(F.col("vec_id").alias("va"), "i", F.col("x").alias("xa"))
    exb = ex.select(F.col("vec_id").alias("vb"), "i", F.col("x").alias("xb"))
    dots = (
        pairs.join(exa, "va")
        .join(exb, ["vb", "i"])
        .groupBy("va", "vb")
        .agg(F.sum((F.col("xa") * F.col("xb")).cast("decimal(28,14)")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("va"), F.col("nsq").alias("nsq_a"))
    nb = norms.select(F.col("vec_id").alias("vb"), F.col("nsq").alias("nsq_b"))
    cos = (
        dots.join(na, "va")
        .join(nb, "vb")
        .withColumn(
            "c",
            F.col("dot").cast("double")
            / F.sqrt(F.col("nsq_a").cast("double") * F.col("nsq_b").cast("double")),
        )
    )
    dups = (
        cos.where(F.col("c") >= SEMDEDUP_TAU)
        .groupBy("vb")
        .agg(F.count("*").cast("long").alias("n_near"))
    )
    return assign.join(dups, assign.vec_id == dups.vb, "left").select(
        "vec_id",
        "cent_id",
        F.coalesce("n_near", F.lit(0)).cast("long").alias("n_smaller_neardups"),
        (F.coalesce("n_near", F.lit(0)) == 0).alias("keep"),
    )


SEMDEDUP_SQL = f"""
WITH ex AS (
  SELECT vec_id, UNNEST(embedding)::DOUBLE AS x,
         UNNEST(generate_series(1, len(embedding))) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, SUM(CAST(x*x AS DECIMAL(28,14))) AS nsq FROM ex GROUP BY vec_id),
seeds AS ({SEED_IDS_SQL_TMPL.format(k=KMEANS_K)}),
cent AS (SELECT s.cent_id, e.i, e.x AS cx FROM ex e JOIN seeds s USING (vec_id)),
cnorms AS (SELECT s.cent_id, n.nsq AS cnsq FROM norms n JOIN seeds s USING (vec_id)),
vc AS (
  SELECT e.vec_id, c.cent_id,
         CAST(SUM(CAST(e.x * c.cx AS DECIMAL(28,14))) AS DOUBLE)
           / SQRT(CAST(n.nsq AS DOUBLE) * CAST(cn.cnsq AS DOUBLE)) AS ccos
  FROM ex e JOIN cent c ON e.i = c.i
  JOIN norms n ON n.vec_id = e.vec_id
  JOIN cnorms cn ON cn.cent_id = c.cent_id
  GROUP BY e.vec_id, c.cent_id, n.nsq, cn.cnsq
),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT vec_id, cent_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS crank
    FROM vc) WHERE crank = 1
),
pairs AS (
  SELECT a1.vec_id AS va, a2.vec_id AS vb
  FROM assign a1 JOIN assign a2
    ON a1.cent_id = a2.cent_id AND a1.vec_id < a2.vec_id
),
dots AS (
  SELECT p.va, p.vb, SUM(CAST(ea.x * eb.x AS DECIMAL(28,14))) AS dot
  FROM pairs p
  JOIN ex ea ON ea.vec_id = p.va
  JOIN ex eb ON eb.vec_id = p.vb AND eb.i = ea.i
  GROUP BY 1, 2
),
dups AS (
  SELECT vb, CAST(COUNT(*) AS BIGINT) AS n_near
  FROM dots
  JOIN norms na ON na.vec_id = va
  JOIN norms nb ON nb.vec_id = vb
  WHERE CAST(dot AS DOUBLE) / SQRT(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE))
        >= {SEMDEDUP_TAU}
  GROUP BY vb
)
SELECT a.vec_id, a.cent_id,
  COALESCE(d.n_near, 0) AS n_smaller_neardups,
  (COALESCE(d.n_near, 0) = 0) AS keep
FROM assign a LEFT JOIN dups d ON d.vb = a.vec_id
"""


# ----------------------------------------- int8 scalar vector quantization
def quantize_embeddings(spark, sf_dir):
    """Int8 scalar quantization of every embedding — the vector-compression
    step an ANN index applies before sharding at 100 TB (4 bytes/dim →
    1 byte/dim; FAISS SQ8 / Lucene scalar quantization shape): per-vector
    min/max affine grid, q = floor((x − vmin)/((vmax − vmin)/255) + 0.5)
    in [0, 255], emitted long-form as (vec_id, i, q, vmin, vmax) — a row is
    self-contained for dequantization — plus the per-element reconstruction
    error |vmin + q·scale − x| the recall-impact analysis consumes.
    Constant vectors (vmax = vmin) quantize to 0 with zero error.

    Scale shape: map-only — one scan, array min/max bound in their own
    projection, one posexplode; no shuffle at all, whole-stage codegen
    throughout. Exactness: float→double widening is exact; q and the error
    are FIXED TREES of correctly-rounded IEEE ops (sub/div/mul/add/abs —
    no reductions, no libm), so both engines produce bit-identical values
    with no DECIMAL detour needed; the only rounding is the HALF_UP floor."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    st = e.select(
        "vec_id",
        "v",
        F.array_min("v").alias("vmin"),
        F.array_max("v").alias("vmax"),
    )
    ex = st.select(
        "vec_id", "vmin", "vmax", F.posexplode("v").alias("i", "x")
    )
    scale = (F.col("vmax") - F.col("vmin")) / F.lit(255.0)
    qx = ex.select(
        "vec_id",
        "i",
        "x",
        "vmin",
        "vmax",
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.floor((F.col("x") - F.col("vmin")) / scale + F.lit(0.5)).cast(
                "int"
            )
        )
        .alias("q"),
    )
    return qx.select(
        "vec_id",
        F.col("i").cast("long").alias("i"),
        "q",
        "vmin",
        "vmax",
        F.abs(F.col("vmin") + F.col("q") * scale - F.col("x")).alias(
            "recon_err"
        ),
    )


# the parallel UNNESTs zip positionally (the jl_project idiom); i is 0-based
# to match posexplode
QUANTIZE_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
st AS (
  SELECT vec_id, v, list_min(v) AS vmin, list_max(v) AS vmax FROM v),
ex AS (
  SELECT vec_id, vmin, vmax,
         UNNEST(v) AS x,
         UNNEST(generate_series(0, len(v) - 1)) AS i
  FROM st),
qx AS (
  SELECT vec_id, i, x, vmin, vmax,
         CASE WHEN vmax = vmin THEN 0
              ELSE CAST(FLOOR((x - vmin)
                              / ((vmax - vmin) / CAST(255.0 AS DOUBLE))
                              + CAST(0.5 AS DOUBLE)) AS INT) END AS q
  FROM ex)
SELECT vec_id, CAST(i AS BIGINT) AS i, q, vmin, vmax,
       ABS(vmin + q * ((vmax - vmin) / CAST(255.0 AS DOUBLE)) - x)
         AS recon_err
FROM qx
"""


# ------------------------------------------------ product quantization (PQ)
PQ_HALF_EXPR = "max(size(embedding)) div 2"  # subspace split point (1 row)


def _pq_assign(ex_sub: DataFrame, cent: DataFrame, code_col: str, d_col: str):
    """Nearest trained sub-centroid per vector over one subspace: the same
    DECIMAL-exact squared-L2 + (dsq, cent_id) ROW_NUMBER argmin the
    training rounds use."""
    diff = F.col("x") - F.col("cx")
    dist = (
        ex_sub.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "cent_id")
        .agg(F.sum((diff * diff).cast("decimal(28,14)")).alias("dsq"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dsq"), F.asc("cent_id"))
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("cent_id").cast("int").alias(code_col),
            F.col("dsq").alias(d_col),
        )
    )


def pq_codes(spark, sf_dir):
    """Product quantization (Jégou et al., TPAMI'11 — the FAISS workhorse):
    the embedding is split into two dimension subspaces, an independent
    k=KMEANS_K codebook is TRAINED per subspace (the same in-plan Lloyd's
    loop the IVF quantizer uses — _train_centroids on the
    subspace-restricted exploded relation), and every vector is encoded as
    its two nearest-sub-centroid codes plus the exact squared
    reconstruction error. Two codes over k=8 compress 64 doubles to 6
    bits — the memory shape that makes billion-vector ANN feasible; the
    scalar-quantization twin is [quantize_embeddings], the coarse
    quantizer [kmeans_centroids].

    Scale shape: the split point is a 1-row broadcast (`max dim div 2` —
    never a collect); each subspace trains on ITS half of the exploded
    relation (persisted per training call, centroid state
    lineage-truncated per round); encoding is one broadcast-centroid join
    + combinable DECIMAL distance sum + a vec-partitioned argmin per
    subspace. recon_err = d0 + d1 is an exact DECIMAL add cast to double
    ONCE. The oracle instantiates the shared unrolled Lloyd chain twice
    (prefixes q0/q1) over the same subspace predicates."""
    e = _t(spark, sf_dir, "embeddings")
    hdf = e.agg(F.expr(PQ_HALF_EXPR).alias("h"))  # 1 row
    ex = _exploded(e)

    def sub(pred):
        return (
            ex.join(F.broadcast(hdf))
            .where(pred)
            .select("vec_id", "i", "x")
        )

    lo = F.col("i") < F.col("h")
    hi = F.col("i") >= F.col("h")
    ex0 = sub(lo).persist()
    cent0, _ = _train_centroids(e, ex0)  # takes ownership of ex0
    ex1 = sub(hi).persist()
    # clears the previous call's caches (ex0's persist) — safe: cent0 is a
    # lineage-truncated leaf, and the final assignment below re-derives the
    # subspace slice as a cheap map over the scan
    cent1, _ = _train_centroids(e, ex1)
    a0 = _pq_assign(sub(lo), cent0, "code0", "d0")
    a1 = _pq_assign(sub(hi), cent1, "code1", "d1")
    return a0.join(a1, "vec_id").select(
        "vec_id",
        "code0",
        "code1",
        (F.col("d0") + F.col("d1")).cast("double").alias("recon_err"),
    )


def _pq_sql() -> str:
    half = "(SELECT MAX(len(embedding)) // 2 FROM embeddings)"
    chains = (
        _kmeans_cte_chain("q0", f"i < {half}")
        + ",\n"
        + _kmeans_cte_chain("q1", f"i >= {half}")
    )
    T = KMEANS_ITERS

    def assign(p, code, d):
        return f"""{p}fd AS (
  SELECT e.vec_id, c.cent_id,
         SUM(CAST((e.x - c.cx) * (e.x - c.cx) AS DECIMAL(28,14))) AS dsq
  FROM {p}ex e JOIN {p}c{T} c USING (i) GROUP BY e.vec_id, c.cent_id),
{p}fa AS (
  SELECT vec_id, CAST(cent_id AS INT) AS {code}, dsq AS {d} FROM (
    SELECT vec_id, cent_id, dsq,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dsq ASC, cent_id ASC) AS rn
    FROM {p}fd) WHERE rn = 1)"""

    return f"""
WITH {chains},
{assign("q0", "code0", "d0")},
{assign("q1", "code1", "d1")}
SELECT a.vec_id, a.code0, b.code1,
       CAST(a.d0 + b.d1 AS DOUBLE) AS recon_err
FROM q0fa a JOIN q1fa b ON b.vec_id = a.vec_id"""


PQ_SQL = _pq_sql()


def ann_recall_eval(spark, sf_dir):
    """Recall@k of the IVF index against the exact brute-force ground truth
    — the ANN-index acceptance test (the retrieval twin of [dedup_pr_eval]:
    build the approximate structure, then PRICE the approximation): per
    query, how many of the exact top-3 cosine neighbors the nprobe-bounded
    IVF search actually returned. Both sides are this repo's own oracled
    queries reused VERBATIM (ann_topk_cosine = truth, ann_ivf_topk =
    retrieved), so the eval cannot drift from the operators it grades.

    Scale shape: both inputs are already top-k-bounded (queries × k rows —
    eval-sized, not corpus-sized); the overlap is one equi-join on
    (query_id, neighbor_id) and the rollup a combinable count. recall is
    the single final IEEE division of two small exact integers."""
    from .textops import ann_topk_cosine

    gt = ann_topk_cosine(spark, sf_dir).select("query_id", "neighbor_id")
    rt = ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        rt.join(gt, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("h"))
    )
    per = (
        gt.groupBy("query_id")
        .agg(F.count("*").alias("k_true"))
        .join(
            rt.groupBy("query_id").agg(F.count("*").alias("k_ret")),
            "query_id",
            "left",
        )
        .join(hits, "query_id", "left")
    )
    return per.select(
        "query_id",
        F.col("k_true").cast("long").alias("k_true"),
        F.coalesce("k_ret", F.lit(0)).cast("long").alias("k_retrieved"),
        F.coalesce("h", F.lit(0)).cast("long").alias("n_hits"),
        (
            F.coalesce("h", F.lit(0)).cast("double")
            / F.col("k_true").cast("double")
        ).alias("recall"),
    )


def _ann_recall_sql() -> str:
    """Both ANN oracles wrapped verbatim as MATERIALIZED CTEs (the
    dedup_pr_eval single-source pattern — DuckDB accepts a full WITH query
    inside `name AS MATERIALIZED (...)`), then the overlap join + rollup."""
    from .textops import ANN_SQL

    return f"""
WITH are_gt AS MATERIALIZED ({ANN_SQL}),
are_rt AS MATERIALIZED ({ANN_IVF_SQL}),
are_h AS (
  SELECT r.query_id, COUNT(*) AS h
  FROM are_rt r JOIN are_gt g
    ON g.query_id = r.query_id AND g.neighbor_id = r.neighbor_id
  GROUP BY 1),
are_t AS (SELECT query_id, COUNT(*) AS k_true FROM are_gt GROUP BY 1),
are_r AS (SELECT query_id, COUNT(*) AS k_ret FROM are_rt GROUP BY 1)
SELECT t.query_id,
       CAST(t.k_true AS BIGINT) AS k_true,
       CAST(COALESCE(r.k_ret, 0) AS BIGINT) AS k_retrieved,
       CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.h, 0) AS DOUBLE) / CAST(t.k_true AS DOUBLE) AS recall
FROM are_t t
LEFT JOIN are_r r ON r.query_id = t.query_id
LEFT JOIN are_h h ON h.query_id = t.query_id"""


ANN_RECALL_SQL = _ann_recall_sql()


def embedding_covariance(spark, sf_dir):
    """Sample covariance matrix of the embedding columns — the PCA/whitening
    precursor (the dim×dim aggregate every dimensionality-reduction or
    decorrelation step starts from; [jl_project_embeddings] compresses with
    a DATA-BLIND random matrix — this computes the data-DRIVEN second
    moments a learned projection needs): upper-triangle (i ≤ j) entries
    cov(i,j) = (Σx_i·x_j − Σx_i·Σx_j/n)/(n−1).

    Scale shape: the corpus collapses in ONE combinable pass per relation —
    pair products via a per-VECTOR self-join (fan-out dim² per vector, a
    constant; never vector×vector) into a BOUNDED dim×(dim+1)/2-cell
    relation, per-dim sums into a dim-cell relation broadcast back: the
    classic distributed-covariance shape (partial outer-product sums merge
    by addition). Exactness: each x_i·x_j is one IEEE multiply, sums go
    through DECIMAL(28,12) partials (order-independent), and the centered
    closed form is a fixed IEEE tree — float covariances hash-exact
    cross-engine."""
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "i", "x"
        ),
    )
    a = ex.select("vec_id", F.col("i").alias("di"), F.col("x").alias("xa"))
    b = ex.select("vec_id", F.col("i").alias("dj"), F.col("x").alias("xb"))
    pairs = (
        a.join(b, "vec_id")
        .where(F.col("di") <= F.col("dj"))
        .groupBy("di", "dj")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("xa") * F.col("xb")).cast("decimal(28,12)")).alias(
                "sxy"
            ),
        )
    )
    dims = ex.groupBy("i").agg(
        F.sum(F.col("x").cast("decimal(28,12)")).alias("s")
    )
    si = dims.select(F.col("i").alias("di"), F.col("s").alias("si"))
    sj = dims.select(F.col("i").alias("dj"), F.col("s").alias("sj"))
    n = F.col("n").cast("double")
    return (
        pairs.join(F.broadcast(si), "di")
        .join(F.broadcast(sj), "dj")
        .select(
            F.col("di").cast("int").alias("dim_i"),
            F.col("dj").cast("int").alias("dim_j"),
            F.col("n").cast("long").alias("n_vecs"),
            (
                (
                    F.col("sxy").cast("double")
                    - F.col("si").cast("double")
                    * F.col("sj").cast("double")
                    / n
                )
                / (n - F.lit(1.0))
            ).alias("covariance"),
        )
    )


COVARIANCE_SQL = """
WITH cv_ex AS (
  SELECT vec_id, UNNEST(embedding)::DOUBLE AS x,
         UNNEST(generate_series(0, len(embedding) - 1)) AS i
  FROM embeddings),
cv_p AS (
  SELECT a.i AS di, b.i AS dj, COUNT(*) AS n,
         SUM(CAST(a.x * b.x AS DECIMAL(28,12))) AS sxy
  FROM cv_ex a JOIN cv_ex b ON b.vec_id = a.vec_id AND a.i <= b.i
  GROUP BY 1, 2),
cv_d AS (
  SELECT i, SUM(CAST(x AS DECIMAL(28,12))) AS s FROM cv_ex GROUP BY 1)
SELECT CAST(p.di AS INT) AS dim_i, CAST(p.dj AS INT) AS dim_j,
       CAST(p.n AS BIGINT) AS n_vecs,
       (CAST(p.sxy AS DOUBLE)
        - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE) / CAST(p.n AS DOUBLE))
       / (CAST(p.n AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS covariance
FROM cv_p p
JOIN cv_d si ON si.i = p.di
JOIN cv_d sj ON sj.i = p.dj
"""


MLOPS_QUERIES: dict[str, tuple] = {
    "kmeans_centroids": (kmeans_centroids, KMEANS_SQL),
    "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_SQL),
    "pack_sequences": (pack_sequences, PACK_SQL),
    # sweep-capped (registry._UNREGISTERED) but oracle-checked in pytest:
    "semdedup_keep": (semdedup_keep, SEMDEDUP_SQL),
    "quantize_embeddings": (quantize_embeddings, QUANTIZE_SQL),
    "pq_codes": (pq_codes, PQ_SQL),
    "ann_recall_eval": (ann_recall_eval, ANN_RECALL_SQL),
    "embedding_covariance": (embedding_covariance, COVARIANCE_SQL),
}
