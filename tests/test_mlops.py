"""Invariant tests for the ML primitives (oracle parity itself is covered by
tests/test_entry_queries.py's auto-parametrized sweep)."""

from __future__ import annotations

import math

from prove_spark.plans.mlops import (
    KMEANS_ITERS,
    KMEANS_K,
    PACK_CAP,
    PACK_SHARDS,
    kmeans_centroids,
    pack_sequences,
)

SF = "/root/testdata/sf0.001"


def test_kmeans_shape_and_sizes(spark):
    pdf = kmeans_centroids(spark, SF).toPandas()
    # k centroids x 64 dims, every centroid finite
    assert len(pdf) == KMEANS_K * 64
    assert sorted(pdf.cent_id.unique()) == list(range(KMEANS_K))
    assert pdf.centroid.map(math.isfinite).all()
    # every vector is assigned to exactly one cluster
    sizes = pdf.drop_duplicates("cent_id").cluster_size
    assert sizes.sum() == 500
    # the quantization grid: centroid * 1e12 is integral
    assert (pdf.centroid * 1e12).round(0).sub(pdf.centroid * 1e12).abs().lt(
        1e-3
    ).all()


def test_kmeans_iterations_move_centroids(spark):
    """Lloyd actually updates: trained centroids differ from the seed
    vectors (else the trainer would be the old stand-in in disguise)."""
    import duckdb

    pdf = kmeans_centroids(spark, SF).toPandas()
    seeds = duckdb.sql(
        f"""SELECT vec_id - 492 AS cent_id,
                   UNNEST(embedding)::DOUBLE AS seed,
                   UNNEST(generate_series(0, len(embedding) - 1)) AS dim
            FROM '{SF}/embeddings.parquet' WHERE vec_id >= 492"""
    ).df()
    j = pdf.merge(seeds, on=["cent_id", "dim"])
    assert (j.centroid - j.seed).abs().max() > 1e-6
    assert KMEANS_ITERS >= 2


def test_pack_sequences_invariants(spark):
    pdf = pack_sequences(spark, SF).toPandas()
    assert (pdf.offset_in_seq >= 0).all()
    assert (pdf.offset_in_seq < PACK_CAP).all()
    assert (pdf.n_tokens > 0).all()
    assert set(pdf.shard.unique()) <= set(range(PACK_SHARDS))
    # per stream: first doc starts at (0, 0); starts strictly increase in
    # doc_id order (n_tokens > 0) and are exactly the prefix sums
    for (_, _), g in pdf.groupby(["source", "shard"]):
        g = g.sort_values("doc_id").reset_index(drop=True)
        starts = g.seq_id * PACK_CAP + g.offset_in_seq
        assert starts.iloc[0] == 0
        expect = g.n_tokens.cumsum().shift(1, fill_value=0)
        assert (starts == expect).all()


def test_kmeans_k_is_table_size_independent(spark, tmp_path):
    """Regression: seeds are the K highest vec_ids BY RANK, so (a) a table
    LARGER than the fixed sf tables still trains exactly K centroids (a
    hardcoded base of 492 selected max-491 "centroids" on bigger tables —
    1508 at sf0.1 — exploding the assignment join ~190x), and (b) gaps in
    the top id range (what an upstream dedup/sample pass produces) do NOT
    under-select seeds (an id-range predicate off max(vec_id) would)."""
    d = str(tmp_path / "big")
    n, dim = 700, 8
    rows = [
        (int(v), [float((v * 31 + j * 7) % 97) / 97.0 for j in range(dim)])
        for v in range(n)
        if v not in (695, 698)  # holes inside the top-K id range
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    pdf = kmeans_centroids(spark, d).toPandas()
    assert len(pdf) == KMEANS_K * dim
    assert sorted(pdf.cent_id.unique()) == list(range(KMEANS_K))
    assert pdf.drop_duplicates("cent_id").cluster_size.sum() == len(rows)
