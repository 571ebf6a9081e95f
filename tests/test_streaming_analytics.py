"""Streaming analytics: watermarked windows, sessions, stateful top-k.

Pins the three Structured Streaming idioms against batch plans and a
DuckDB oracle: the streaming result of ``windowed_event_volume`` must
equal its own batch run AND DuckDB's ``time_bucket`` rollup; the
watermark must drop late rows across a checkpointed restart; and the
``applyInPandasWithState`` running top-k must converge to the exact
batch k-th value.
"""

from __future__ import annotations

import shutil

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from pisa_spark.streaming.analytics import (
    VALUE_MICRO,
    running_topk_thresholds,
    user_sessions,
    windowed_event_volume,
)

SF_DIR = "/root/testdata/sf0.001"
EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    for c in pdf.columns:  # normalize us-vs-ns timestamp resolutions
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[ns]")
    cols = sorted(pdf.columns)
    return (pdf[cols].sort_values(cols).reset_index(drop=True))


def _stream_events(spark, src_dir):
    return spark.readStream.schema(EVENTS_DDL).parquet(str(src_dir))


def test_windowed_volume_stream_equals_batch_and_duckdb(spark, tmp_path):
    land = tmp_path / "land"
    land.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", land / "part-0.parquet")

    batch = windowed_event_volume(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    ).toPandas()

    q = (
        windowed_event_volume(_stream_events(spark, land))
        .writeStream.format("memory").queryName("wvol")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("wvol").toPandas()
    q.stop()

    assert _sorted(streamed).equals(_sorted(batch))

    con = duckdb.connect()
    oracle = con.sql(
        f"""
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
               time_bucket(INTERVAL '10 minutes', ts)
                 + INTERVAL '10 minutes' AS w_end,
               event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM({VALUE_MICRO}) AS BIGINT) AS value_micro_sum
        FROM read_parquet('{SF_DIR}/events.parquet')
        GROUP BY 1, 2, 3
        """
    ).df()
    assert _sorted(oracle).equals(_sorted(batch))


def test_watermark_drops_late_rows_across_restart(spark, tmp_path):
    land = tmp_path / "land"
    land.mkdir()
    ck = str(tmp_path / "ck")
    base = pd.Timestamp("2024-06-01 12:00:00")

    def write_chunk(name, rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                          "event_type", "value", "props"])
        spark.createDataFrame(pdf, schema=EVENTS_DDL).coalesce(1) \
            .write.mode("overwrite").parquet(str(tmp_path / name))
        src = [p for p in (tmp_path / name).glob("*.parquet")]
        shutil.copy(src[0], land / f"{name}.parquet")

    def run_once(qname):
        # foreachBatch sink: memory sinks cannot recover from a
        # checkpoint, and the restart IS the thing under test here
        got: list[pd.DataFrame] = []
        q = (
            windowed_event_volume(_stream_events(spark, land),
                                  window="10 minutes",
                                  watermark="30 minutes")
            .writeStream.foreachBatch(lambda df, _e: got.append(df.toPandas()))
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return pd.concat(got, ignore_index=True) if got else pd.DataFrame(
            columns=["w_start", "w_end", "event_type", "n_events",
                     "value_micro_sum"])

    # chunk 1 advances the watermark to 12:00 - 30min = 11:30
    write_chunk("c1", [(1, base, 1, "view", 1.0, "{}")])
    first = run_once("wm1")
    assert len(first) == 1

    # chunk 2: one row far older than the watermark (10:00) must be
    # DROPPED; one fresh row must aggregate.
    write_chunk("c2", [
        (2, base - pd.Timedelta("2 hours"), 1, "view", 1.0, "{}"),
        (3, base + pd.Timedelta("5 minutes"), 1, "view", 2.0, "{}"),
    ])
    second = run_once("wm2")
    starts = set(second["w_start"])
    assert base - pd.Timedelta("2 hours") not in starts  # late row dropped
    assert base in starts  # fresh row landed (12:00-12:10 window update)
    upd = second[second["w_start"] == base].iloc[0]
    assert upd["n_events"] == 2 and upd["value_micro_sum"] == 3_000_000


def test_user_sessions_gap_semantics(spark):
    base = pd.Timestamp("2024-06-01 08:00:00")
    rows = [
        # user 1: three events inside one 30-min-gap session...
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + pd.Timedelta("10 minutes"), 1, "click", 2.0, "{}"),
        (3, base + pd.Timedelta("35 minutes"), 1, "view", 3.0, "{}"),
        # ...then a 2h hole starts a second session
        (4, base + pd.Timedelta("3 hours"), 1, "view", 4.0, "{}"),
        # user 2: single-event session
        (5, base, 2, "error", 5.0, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    out = user_sessions(
        spark.createDataFrame(pdf, schema=EVENTS_DDL)
    ).toPandas().sort_values(["user_id", "s_start"]).reset_index(drop=True)
    assert len(out) == 3
    u1 = out[out.user_id == 1]
    assert list(u1.n_events) == [3, 1]
    # session end extends gap past the LAST event
    assert u1.iloc[0]["s_end"] == base + pd.Timedelta("65 minutes")
    assert out[out.user_id == 2].iloc[0]["n_events"] == 1


def test_running_topk_threshold_converges_to_batch(spark, tmp_path):
    land = tmp_path / "land"
    land.mkdir()
    ck = str(tmp_path / "ck")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    k = 10

    # exact batch k-th per type (micro units)
    batch = (
        events.select("event_type", F.expr(VALUE_MICRO).alias("vm"))
        .toPandas()
        .groupby("event_type")["vm"]
        .apply(lambda s: sorted(s, reverse=True)[k - 1] if len(s) >= k else -1)
        .to_dict()
    )

    # split the file into two arrival chunks
    pdf = events.toPandas().sort_values("event_id")
    half = len(pdf) // 2
    for i, chunk in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        spark.createDataFrame(chunk, schema=EVENTS_DDL).coalesce(1) \
            .write.mode("overwrite").parquet(str(tmp_path / f"c{i}"))

    def run_once(qname, chunk_dir):
        src = [p for p in (tmp_path / chunk_dir).glob("*.parquet")]
        shutil.copy(src[0], land / f"{chunk_dir}.parquet")
        got: list[pd.DataFrame] = []
        q = (
            running_topk_thresholds(_stream_events(spark, land), k=k)
            .writeStream.foreachBatch(lambda df, _e: got.append(df.toPandas()))
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()
        return pd.concat(got, ignore_index=True)

    first = run_once("topk1", "c0")
    assert set(first["key"]) == set(batch)  # every type emitted a row
    final = run_once("topk2", "c1")
    got = final.set_index("key")
    for key, kth in batch.items():
        assert got.loc[key, "kth_micro"] == kth
        # n_seen accumulated across BOTH chunks via the state store
    assert int(got["n_seen"].sum()) == len(pdf)


@pytest.mark.parametrize("n_small", [3])
def test_running_topk_below_k_sentinel(spark, tmp_path, n_small):
    land = tmp_path / "land"
    land.mkdir()
    base = pd.Timestamp("2024-06-01 08:00:00")
    rows = [(i, base, 1, "rare", float(i), "{}") for i in range(n_small)]
    # a NULL value must be skipped: not counted, never in the sketch
    rows.append((n_small, base, 1, "rare", None, "{}"))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    spark.createDataFrame(pdf, schema=EVENTS_DDL).coalesce(1) \
        .write.mode("overwrite").parquet(str(tmp_path / "c"))
    src = [p for p in (tmp_path / "c").glob("*.parquet")]
    shutil.copy(src[0], land / "c.parquet")
    q = (
        running_topk_thresholds(_stream_events(spark, land), k=10)
        .writeStream.format("memory").queryName("topk_small")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("topk_small").toPandas()
    q.stop()
    # below k -> NULL threshold (no integer sentinel: -1 is a valid
    # threshold for negative value streams); the NULL row is ignored
    assert out["kth_micro"].isna().all()
    assert list(out["n_seen"]) == [n_small]
