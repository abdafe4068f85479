"""Training-data export operators, each with a DuckDB oracle: deterministic
epoch shuffling into shards (the write path that turns a filtered corpus
into training-order files) and the per-shard manifest that audits the
export (counts, token totals, an order-independent XOR checksum).

Reference anchor: the reference persists per-entity result batches as its
export step (`ProVe_main_process.py` result storage, `background_processing.py`
queue batches); these are the corpus-scale analogs — a training corpus is
exported as N deterministic shards plus a manifest, not as one stream.

Design rules shared with plans/textops.py:
- shuffle order comes from the portable 60-bit md5 hash of (epoch-salt ||
  doc_id), NOT rand(): reproducible on any cluster size, any retry, any
  engine — lineage requires that re-running the export yields byte-identical
  shard contents;
- the manifest checksum is a BIGINT XOR fold of per-doc content hashes:
  order-independent (safe under any partition layout), overflow-free at any
  corpus size (unlike a SUM of 60-bit values), and cheap to re-verify
  shard-by-shard after a copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textops import PORTABLE_HASH_SQL, _portable_hash

N_SHARDS = 8
_EPOCH_SALT = "ep0|"  # epoch baked into the hash salt: new epoch = new salt


# shared table loader (single source: one place to change if the
# path layout or a catalog integration ever changes)
from .relational import _t  # noqa: E402


def _assigned(d: DataFrame, *carry: str) -> DataFrame:
    """(doc_id, [carry...], shard, pos): the deterministic epoch assignment
    with extra columns riding along (the write path carries text). One
    exchange — the window's partition-by-shard hashpartitioning — and one
    in-partition sort; hashpartitioning puts ALL of a shard in exactly one
    partition, so downstream same-stage consumers (the partitioned write)
    see each shard contiguous and pos-ordered."""
    h = _portable_hash(
        F.concat(F.lit(_EPOCH_SALT), F.col("doc_id").cast("string"))
    )
    assigned = d.select(
        "doc_id",
        *carry,
        h.alias("h"),
        F.pmod(h, F.lit(N_SHARDS)).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return assigned.select(
        "doc_id",
        *carry,
        "h",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def epoch_shuffle(spark, sf_dir):
    """Assign every document a deterministic (shard, pos) training order for
    one epoch: shard = H(salt || doc_id) mod N_SHARDS, pos = rank of that
    hash within the shard. Reading shards in any interleave replays the
    same global pseudo-random order — the property a training job needs and
    `df.orderBy(rand())` cannot give (partition-layout- and retry-
    dependent).

    Scale shape: the hash is map-only; the ONLY shuffle is the partition-by-
    shard exchange that the physical shard write needs anyway (at scale:
    `repartition(N, shard)` + `sortWithinPartitions(h)` — the window here IS
    that plan, one exchange, one in-partition sort, no global sort and no
    single-partition row_number). Ties on the 60-bit hash break by doc_id so
    the order is total and engine-independent.
    """
    return _assigned(_t(spark, sf_dir, "documents")).drop("h")


_EP_HASH = PORTABLE_HASH_SQL.format(
    x=f"CONCAT('{_EPOCH_SALT}', CAST(doc_id AS VARCHAR))"
)
EPOCH_SHUFFLE_SQL = f"""
WITH h AS (SELECT doc_id, {_EP_HASH} AS h FROM documents)
SELECT doc_id, CAST(h % {N_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS} ORDER BY h, doc_id)
            AS BIGINT) AS pos
FROM h
"""


def shard_manifest(spark, sf_dir):
    """Per-shard export manifest: document count, whitespace-token and
    character totals (the numbers a training job budgets against), and an
    order-independent XOR checksum of the per-document content hashes (an
    after-copy integrity check that does not depend on row order or
    partition layout).

    Scale shape: map-only per-doc measures, then ONE map-side-combinable
    groupBy on the shard key (count / sum / bit_xor are all associative-
    commutative, so partials combine before the N_SHARDS-row exchange).
    SUMs are BIGINT-cast on both engines (DuckDB SUM(BIGINT) widens to
    HUGEINT, which pandas renders as float — the dtype-parity trap)."""
    d = _t(spark, sf_dir, "documents")
    h = _portable_hash(
        F.concat(F.lit(_EPOCH_SALT), F.col("doc_id").cast("string"))
    )
    per_doc = d.select(
        F.pmod(h, F.lit(N_SHARDS)).cast("int").alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars"),
        _portable_hash(F.col("text")).alias("fp"),
    )
    return (
        per_doc.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
            F.bit_xor("fp").alias("xor_checksum"),
        )
    )


SHARD_MANIFEST_SQL = f"""
WITH per_doc AS (
  SELECT CAST({_EP_HASH} % {N_SHARDS} AS INT) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(text) AS BIGINT) AS n_chars,
         {PORTABLE_HASH_SQL.format(x="text")} AS fp
  FROM documents
)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       bit_xor(fp) AS xor_checksum
FROM per_doc
GROUP BY shard
"""


def write_shards(spark, sf_dir: str, out_dir: str) -> None:
    """Materialize the epoch shuffle as the physical export: one parquet
    directory per shard (`shard=K/`), rows inside each shard in training
    order. This is the plan the epoch_shuffle docstring promises, executed:
    text rides through the assignment (no join — the assignment is map-only
    until its single partition-by-shard exchange, which is exactly the
    exchange the physical write needs; there is no cheaper plan that ends
    with co-located, ordered shards). The explicit sortWithinPartitions
    uses the window's OWN sort keys (shard, h, doc_id) — not pos, which
    Catalyst cannot relate to h — so the sort is satisfied by the window's
    output ordering and elided (plan-pinned in tests): it documents and
    GUARANTEES the file order without re-paying for it. Re-running
    produces row-identical shards (the hash order is deterministic), which
    is what makes the manifest's XOR checksum a usable after-copy
    integrity check."""
    assigned = _assigned(_t(spark, sf_dir, "documents"), "text")
    (
        assigned.sortWithinPartitions("shard", "h", "doc_id")
        .drop("h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


SHARDOPS_QUERIES: dict[str, tuple] = {
    # sweep-capped (registry._UNREGISTERED) but oracle-checked in pytest:
    "epoch_shuffle": (epoch_shuffle, EPOCH_SHUFFLE_SQL),
    "shard_manifest": (shard_manifest, SHARD_MANIFEST_SQL),
}
