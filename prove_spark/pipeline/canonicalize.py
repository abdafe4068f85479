"""Entity canonicalization: connected components over same-as candidate edges.

GraphFrames-style alternating large-star/small-star via plain DataFrame
joins (no GraphFrames dependency), run to fixpoint. Edges come from
canonical-label equality plus seed same-as pairs (dictionaries.SAME_AS_SEED);
component representative = minimum numeric QID, and triples are re-keyed to
the representative with a broadcast join (the component map is an
entity-dimension-sized table, always ≪ the fact table).

At 10^12-turn scale the iteration count is O(log D) on component diameter;
each iteration is one self-join + one min-aggregation on the ENTITY
dimension, not the fact table, so this never touches the heavy data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG
from ..dictionaries import ENTITIES, SAME_AS_SEED


def entity_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(pd.DataFrame(ENTITIES, columns=["qid", "label"]))


def same_as_edges(spark: SparkSession) -> DataFrame:
    """Candidate duplicate edges: identical canonical label, plus seeds."""
    e = entity_dim(spark)
    a = e.select(F.col("qid").alias("src"), "label")
    b = e.select(F.col("qid").alias("dst"), "label")
    label_edges = (
        a.join(b, "label").where(F.col("src") < F.col("dst")).select("src", "dst")
    )
    seed = spark.createDataFrame(
        pd.DataFrame(SAME_AS_SEED, columns=["src", "dst"])
    )
    return label_edges.unionByName(seed).distinct()


def _qnum(col: str) -> F.Column:
    return F.regexp_extract(col, r"(\d+)", 1).cast("long")


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iterations: int = DEFAULT_CONFIG.max_cc_iterations
) -> DataFrame:
    """vertices(qid) + edges(src,dst) → (qid, canonical_qid).

    Min-label propagation to fixpoint: each vertex repeatedly adopts the
    minimum component id among itself and its neighbors. Converges in
    O(diameter) rounds; each round is two shuffles on the (small) vertex set.
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    comp = vertices.select(
        F.col("qid"), _qnum("qid").alias("comp")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(comp, sym.dst == comp.qid)
            .groupBy(F.col("src").alias("qid"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_comp = (
            comp.join(neighbor_min, "qid", "left")
            .select(
                "qid",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        changed = (
            comp.alias("a")
            .join(new_comp.alias("b"), "qid")
            .where(F.col("a.comp") != F.col("b.comp"))
            .limit(1)
            .count()
        )
        comp = new_comp.localCheckpoint(eager=True)  # cut the lineage per round
        if changed == 0:
            break
    return comp.select(
        "qid", F.concat(F.lit("Q"), F.col("comp").cast("string")).alias("canonical_qid")
    )


def union_find_local(qids: list[str], edges: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find for dimension-sized vertex sets.

    The entity dictionary is a broadcast-sized dimension (thousands–millions
    of rows, ≪ the fact table); running a distributed fixpoint over it costs
    O(iterations) blocking Spark jobs of pure scheduling overhead. Path-
    compressed union-find on the driver is exact, O(E α(V)), and emits the
    same (qid → min-numeric-QID representative) map as the distributed CC.
    `connected_components` above remains the scale path for edge sets too
    large to collect (e.g. data-derived same-as candidates at 100 TB).
    """
    from ..dictionaries import qid_num  # single source of the min-QID rule

    parent = {q: q for q in qids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if qid_num(rb) < qid_num(ra):
            ra, rb = rb, ra
        parent[rb] = ra
    return {q: find(q) for q in qids}


def canonical_map_df(spark: SparkSession, distributed: bool = False) -> DataFrame:
    """(qid, canonical_qid) map. Default: driver union-find over the static
    entity dictionary (no Spark jobs — the dictionaries are literals);
    distributed=True runs the iterative-join CC instead (the path a
    data-derived, non-collectable edge set would take)."""
    if distributed:
        return connected_components(
            entity_dim(spark).select("qid"), same_as_edges(spark)
        )
    from ..sources.dims import session_dim

    return session_dim(spark, "canonical_map", _build_canonical_map)


def _build_canonical_map(spark: SparkSession) -> DataFrame:
    qids = [q for q, _ in ENTITIES]
    label_of: dict[str, list[str]] = {}
    edges: list[tuple[str, str]] = list(SAME_AS_SEED)
    for q, label in ENTITIES:
        label_of.setdefault(label, []).append(q)
    for group in label_of.values():
        edges.extend((group[0], other) for other in group[1:])
    mapping = union_find_local(qids, edges)
    pdf = pd.DataFrame(
        sorted(mapping.items()), columns=["qid", "canonical_qid"]
    )
    return spark.createDataFrame(pdf)


def rekey_triples(triples: DataFrame, canon: DataFrame) -> DataFrame:
    """Broadcast re-key of subj/obj to canonical ids (fact side: map-only)."""
    c_subj = canon.select(
        F.col("qid").alias("subj_qid"), F.col("canonical_qid").alias("subj")
    )
    c_obj = canon.select(
        F.col("qid").alias("obj_qid"), F.col("canonical_qid").alias("obj")
    )
    return (
        triples.join(F.broadcast(c_subj), "subj_qid", "left")
        .join(F.broadcast(c_obj), "obj_qid", "left")
        .withColumn("subj", F.coalesce("subj", "subj_qid"))
        .withColumn("obj", F.coalesce("obj", "obj_qid"))
    )
