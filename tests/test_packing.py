"""Sequence-packing operator: semantics, edge cases, plan shape."""

from __future__ import annotations

from open_source_financial_time_series_data_pipeline_architecture_spark import plans as PL
from open_source_financial_time_series_data_pipeline_architecture_spark.operators import (
    packing as PK,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_chunked_packing_shards_are_independent(spark):
    rows = [
        (1, "a", "w w w"),
        (2, "a", "w w w w"),
        (10, "b", "w w w w w w w w"),  # exactly one full sequence
        (11, "b", "w"),
    ]
    out = {
        r["doc_id"]: r
        for r in PK.chunked_packing(
            _docs(spark, rows), seq_len=8
        ).collect()
    }
    assert out[1]["token_offset"] == 0 and out[1]["seq_end"] == 0
    assert out[2]["token_offset"] == 3
    assert not out[2]["crosses_boundary"]  # offsets 3..6, inside seq 0
    # shard b restarts at offset 0; its 8-token doc exactly fills seq 0
    assert (out[10]["token_offset"], out[10]["seq_end"]) == (0, 0)
    assert (out[11]["seq_start"], out[11]["seq_end"]) == (1, 1)


def test_chunked_packing_precise(spark):
    rows = [
        (1, "a", "w w w w w w"),  # offsets 0..5
        (2, "a", "w w w w"),  # offsets 6..9 -> crosses the 8 boundary
        (3, "a", "w w"),  # offsets 10..11, seq 1
    ]
    out = {
        r["doc_id"]: r
        for r in PK.chunked_packing(
            _docs(spark, rows), seq_len=8
        ).collect()
    }
    assert (out[1]["seq_start"], out[1]["seq_end"]) == (0, 0)
    assert (out[2]["seq_start"], out[2]["seq_end"]) == (0, 1)
    assert out[2]["crosses_boundary"]
    assert (out[3]["seq_start"], out[3]["seq_end"]) == (1, 1)
    assert not out[3]["crosses_boundary"]


def test_greedy_packing_next_fit(spark):
    rows = [
        (1, "a", "w w w w w"),  # 5 -> bin 1 (fill 5)
        (2, "a", "w w w w"),  # 4 -> 5+4 > 8: bin 2 (fill 4)
        (3, "a", "w w w"),  # 3 -> 4+3 <= 8: bin 2 (fill 7)
        (4, "a", " ".join(["w"] * 12)),  # oversized -> alone in bin 3
        (5, "a", "w"),  # bin 3 overflowed already -> bin 4
    ]
    out = {
        r["doc_id"]: r
        for r in PK.greedy_packing(_docs(spark, rows), budget=8).collect()
    }
    assert [out[i]["bin_id"] for i in (1, 2, 3, 4, 5)] == [1, 2, 2, 3, 4]
    assert out[3]["bin_fill"] == 7
    assert out[4]["bin_fill"] == 12  # oversized doc sits alone


def test_chunked_packing_plan_single_shuffle_no_udf(spark):
    import __spark_entry__ as em
    from tests.conftest import SF_SMOKE

    df = em.QUERIES["sequence_packing"](spark, SF_SMOKE)
    assert PL.shuffle_count(df) == 1, PL.physical_plan(df)
    plan = PL.physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_greedy_packing_plan_single_shuffle(spark):
    import __spark_entry__ as em
    from tests.conftest import SF_SMOKE

    df = em.QUERIES["greedy_packing"](spark, SF_SMOKE)
    # one exchange to co-locate each shard, then the Arrow fold
    assert PL.shuffle_count(df) == 1, PL.physical_plan(df)
    assert "FlatMapGroupsInPandas" in PL.physical_plan(df)
