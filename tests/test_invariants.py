"""Per-row invariant (BASELINE.json input_hint): re-exploding assembled
conversations under stable (conv_id, turn_idx) ordering reproduces every
turn's text exactly; sentence extraction is lossless modulo the split."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from prove_spark.config import SENT_ID_STRIDE
from prove_spark.functions.text import split_sentences
from prove_spark.pipeline import stages


def test_turn_ordering_stable(spark, spark_transcripts, transcripts_pdf):
    """Rows arrive shuffled; sorting by (conv_id, turn_idx) must reproduce
    the per-turn text exactly (equality per turn, not just per set)."""
    got = (
        spark_transcripts.orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    want = (
        transcripts_pdf.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "text"]]
    )
    assert got.equals(want)


def test_turn_idx_contiguous(spark_transcripts):
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        spark_transcripts.withColumn("rn", F.row_number().over(w) - 1)
        .where(F.col("rn") != F.col("turn_idx"))
        .count()
    )
    assert bad == 0


def test_sentence_extraction_lossless(spark, spark_transcripts, transcripts_pdf):
    """Sentences re-grouped by (conv_id, turn) joined with spaces must equal
    the original turn text (our generator joins sentences with ' ')."""
    sents = stages.extract_sentences(spark_transcripts)
    rebuilt = (
        sents.withColumn("turn_idx", (F.col("sent_id") / SENT_ID_STRIDE).cast("int"))
        .groupBy("conv_id", "turn_idx")
        .agg(F.array_join(F.array_sort(F.collect_list(F.struct("sent_id", "sentence"))).sentence, " ").alias("text"))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = (
        transcripts_pdf.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "text"]]
    )
    assert rebuilt["text"].tolist() == want["text"].tolist()


def test_slide_windows_match_kernel(spark, spark_transcripts, transcripts_pdf):
    """Spark slide-2 (Window.lead) equals the pandas kernel slide."""
    from prove_spark.oracle import conv_sentences_ordered

    base = stages.extract_sentences(spark_transcripts)
    slides = (
        stages.with_slide_windows(base)
        .where(F.col("sent_id") % 2 == 1)
        .orderBy("conv_id", "sent_id")
        .toPandas()
    )
    want = []
    for conv_id, conv_pdf in transcripts_pdf.groupby("conv_id"):
        ordered = conv_sentences_ordered(conv_pdf)
        for i in range(len(ordered) - 1):
            want.append((conv_id, ordered[i][0] + 1, f"{ordered[i][1]} {ordered[i+1][1]}"))
    assert list(map(tuple, slides.itertuples(index=False))) == want


def test_sent_id_no_collision_many_short_sentences(spark):
    """Regression (code-review): a turn of >500 short sentences must not
    collide with the next turn's sent_id range."""
    import pandas as pd

    many = " ".join(f"s{i}." for i in range(800))
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 2,
            "turn_idx": pd.array([0, 1], dtype="int32"),
            "role": ["user", "assistant"],
            "text": [many, "next turn sentence."],
            "tool": ["", ""],
            "ts": pd.Series(
                [pd.Timestamp("2026-01-01")] * 2, dtype="datetime64[us]"
            ),
        }
    )
    sents = stages.extract_sentences(spark.createDataFrame(pdf)).toPandas()
    assert sents.sent_id.is_unique
    # every sentence maps back to its own turn
    assert (
        (sents.sent_id // SENT_ID_STRIDE)
        .value_counts()
        .to_dict()
        == {0: 800, 1: 1}
    )


def test_slide_window_3_matches_oracle_semantics(spark):
    """config.slide_window is honored (was hardcoded 2): window=3 slides
    must equal the oracle's 3-sentence joins."""
    from dataclasses import replace

    import pandas as pd

    from prove_spark.config import DEFAULT_CONFIG
    from prove_spark.functions.text import slide_sentences

    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 1,
            "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"],
            "text": ["alpha one. beta two. gamma three. delta four. epsilon five."],
            "tool": [""],
            "ts": pd.Series([pd.Timestamp("2026-01-01")], dtype="datetime64[us]"),
        }
    )
    cfg = replace(DEFAULT_CONFIG, slide_window=3)
    base = stages.extract_sentences(spark.createDataFrame(pdf), cfg)
    ev = stages.with_slide_windows(base, cfg).toPandas()
    slides = sorted(ev.loc[ev.sent_id % 2 == 1, "sentence"])
    sents = [s for _, s in sorted(
        (r.sent_id, r.sentence) for r in base.collect()
    )]
    assert slides == sorted(slide_sentences(sents, window=3))
