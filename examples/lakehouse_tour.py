#!/usr/bin/env python
"""Lakehouse tour: the round-5 planes end to end on the bundled
sf0.001 test data (~60 s):

    python examples/lakehouse_tour.py [sf_dir]

1. incremental commit log — O(touched) segments, checkpoint roll,
   time travel across the checkpoint boundary, pruned reads
2. SCD Type 2            — dimension maintenance with as-of reads,
   each version an atomic versioned commit
3. media decode          — JPEG / GIF / G.711 payloads decoded by the
   pure-spec codecs, image near-dups via average-hash LSH
4. options plane         — Black–Scholes greeks + implied vol
   recovered by unrolled Newton
5. DP release            — per-group counts/sums with auditable
   seeded Laplace noise
6. multi-writer rebase   — a MERGE and an OPTIMIZE each lose the
   publish CAS to a concurrent append and republish without recompute
7. BPE token counting    — tokenizer-exact budgeting numbers
8. MJPEG/AVI sampling    — compressed-video frame decode
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.session import get_spark
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.versioned import VersionedTable
from open_source_financial_time_series_data_pipeline_architecture_spark.operators import multimodal as MM
from open_source_financial_time_series_data_pipeline_architecture_spark.operators import scd as SCD
from open_source_financial_time_series_data_pipeline_architecture_spark.functions import governance as GOV
from open_source_financial_time_series_data_pipeline_architecture_spark.functions import options as OPT


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="lakehouse-tour", master="local[4]")

    print("== 1. incremental commit log ==")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="tour_tbl_"))
    t.overwrite(cust.filter(F.col("c_custkey") % 2 == 0).repartition(2))
    for i in range(12):  # roll past the checkpoint cadence
        t.append(
            cust.filter(
                (F.col("c_custkey") % 2 == 1)
                & (F.col("c_custkey") % 12 == i)
            ).coalesce(1)
        )
    hist = t.history()
    print(
        "   commits:", len(hist),
        "| head rows:", t.read().count(),
        "| rows at v5 (time travel):", t.read(version=5).count(),
    )
    # re-cluster the snapshot so per-file key envelopes are tight, then
    # a selective read plans a strict file subset off the manifest
    t.overwrite(t.read().repartitionByRange(6, "c_custkey"))
    rep: dict = {}
    pruned = t.read(predicates=[("c_custkey", "<", 20)], prune_report=rep)
    print(
        f"   pruned read after re-clustering: kept {rep['files_kept']}/"
        f"{rep['files_total']} files for {pruned.count()} rows"
    )

    print("== 2. SCD Type 2 ==")
    dim = SCD.scd2_init(cust, "2024-01-01")
    upd = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("UPGRADED").alias("c_mktsegment"),
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("2024-06-01").alias("effective_ts"),
    )
    dim2 = SCD.scd2_apply(dim, upd, ["c_custkey"], ["c_mktsegment", "c_acctbal"])
    before = SCD.scd2_as_of(dim2, "2024-03-01")
    after = SCD.scd2_as_of(dim2, "2024-07-01")
    print(
        "   versions:", dim2.count(),
        "| UPGRADED before/after:",
        before.filter("c_mktsegment = 'UPGRADED'").count(),
        "/",
        after.filter("c_mktsegment = 'UPGRADED'").count(),
    )

    print("== 3. media decode ==")
    docs = load_table(spark, sf_dir, "documents").limit(50)
    jpeg = MM.jpeg_decode_stats(MM.synth_jpeg_payloads(docs))
    gif = MM.gif_decode_stats(MM.synth_gif_payloads(docs))
    g711 = MM.wav_decode_stats(MM.synth_g711_payloads(docs))
    print(
        "   jpeg mean_all[0]:",
        round(jpeg.orderBy("doc_id").first()["mean_all"], 3),
        "| gif mean_luma[0]:",
        round(gif.orderBy("doc_id").first()["mean_luma"], 3),
        "| g711 rms[0]:",
        round(g711.orderBy("doc_id").first()["rms_amp"], 1),
    )
    pairs = MM.ahash_neardup_pairs(MM.image_ahash(MM.synth_ppm_payloads(docs)))
    print("   image near-dup pairs (hamming<=3):", pairs.count())

    print("== 4. options plane ==")
    grid = spark.createDataFrame(
        [(100.0, k) for k in (90.0, 100.0, 110.0)], "s double, k double"
    )
    cols = OPT.bs_columns(
        F.col("s"), F.col("k"), F.lit(0.02), F.lit(0.3), F.lit(0.5)
    )
    grid.select(
        "k",
        F.round(cols["call_price"], 4).alias("call"),
        F.round(cols["delta_call"], 4).alias("delta"),
        F.round(cols["vega"], 4).alias("vega"),
    ).show()

    print("== 5. differential-privacy release ==")
    trades = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("k"), F.col("value").alias("v")
    )
    GOV.dp_release(trades, "k", "v", epsilon=1.0, value_cap=100.0).select(
        "k", "n_exact", F.round("dp_count", 2).alias("dp_count")
    ).show()

    print("== 6. multi-writer rebase (round 6) ==")
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V

    t2 = VersionedTable(spark, tempfile.mkdtemp(prefix="tour_mw_"))
    t2.overwrite(cust.filter(F.col("c_custkey") % 3 == 0).coalesce(1))
    t2.append(cust.filter(F.col("c_custkey") % 3 == 1).coalesce(1))
    # simulate the dual-writer race the reference topology runs daily:
    # writer A merges the low keys while writer B appends fresh rows —
    # A loses the CAS, proves the race file-disjoint, republishes its
    # already-staged output against B's head
    orig = V._publish
    state = {"armed": True}

    def racy(table_dir, seg, publisher=None):
        if state["armed"] and seg.get("mode") == "merge":
            state["armed"] = False
            t2.append(
                cust.filter(F.col("c_custkey") % 3 == 2).coalesce(1)
            )
        return orig(table_dir, seg, publisher)

    V._publish = racy
    try:
        rep = {}
        t2.merge(
            cust.filter(F.col("c_custkey") % 3 == 0)
            .withColumn("c_custkey", F.col("c_custkey") + 1_000_000)
            .withColumn("c_acctbal", F.lit(0.0)),
            keys=["c_custkey"],
            report=rep,
        )
    finally:
        V._publish = orig
    print(
        "   merge rebased", rep.get("rebases"), "time(s); head now v",
        t2.history()[-1]["version"],
        "| rows:", t2.read().count(),
    )
    # OPTIMIZE concurrent with an append: the compaction rebases too
    state["armed"] = True

    def racy_opt(table_dir, seg, publisher=None):
        if state["armed"] and seg.get("mode") == "optimize":
            state["armed"] = False
            t2.append(
                cust.filter(F.col("c_custkey") % 3 == 2)
                .withColumn("c_custkey", F.col("c_custkey") + 2_000_000)
                .coalesce(1)
            )
        return orig(table_dir, seg, publisher)

    V._publish = racy_opt
    try:
        t2.compact(n_files=1)
    finally:
        V._publish = orig
    print("   optimize landed over a concurrent append; rows:", t2.read().count())

    print("== 7. tokenizer-exact counting (round 6) ==")
    from open_source_financial_time_series_data_pipeline_architecture_spark.functions import bpe

    counts = bpe.token_count(docs).orderBy("doc_id")
    r0 = counts.first()
    print(
        "   doc 0:", r0["n_tokens"], "BPE tokens /",
        r0["n_pretokens"], "pretokens /", r0["n_bytes"], "bytes",
    )

    print("== 8. compressed video sampling (round 6) ==")
    frames = MM.mjpeg_frame_sample(MM.synth_mjpeg_payloads(docs), every=2)
    f0 = frames.orderBy("doc_id", "frame_idx").first()
    print(
        "   MJPEG/AVI frames sampled:", frames.count(),
        "| frame (0,0) mean_c0:", round(f0["mean_c0"], 3),
    )

    print("tour complete.")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
