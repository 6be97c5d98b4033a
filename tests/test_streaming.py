"""Structured Streaming twins vs their batch analogs."""

import pytest
from pyspark.sql import Window, functions as F

from methanol_web_crawler_spark.streaming.sessions import (
    sessionize_stream,
    windowed_fetch_rates,
)


@pytest.fixture()
def events_dir(spark, tmp_path):
    rows = []
    base = 1_700_000_000
    for user in range(5):
        t = base + user * 17
        for s in range(3):  # 3 sessions per user
            for e in range(4):  # 4 events each, 5 min apart
                rows.append((user, t))
                t += 300
            t += 3600  # gap > 30 min closes the session
    df = spark.createDataFrame(rows, "user_id int, epoch long").select(
        "user_id", F.timestamp_seconds("epoch").alias("ts")
    )
    path = str(tmp_path / "events")
    df.write.parquet(path)
    return path


def run_stream(sdf, spark, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


class TestSessionizeStream:
    def test_matches_batch_sessionization(self, spark, events_dir):
        schema = "user_id int, ts timestamp"
        stream = spark.readStream.schema(schema).parquet(events_dir)
        out = run_stream(
            sessionize_stream(stream, gap="30 minutes"), spark, "sess"
        ).collect()
        # 5 users x 3 sessions of 4 events
        assert len(out) == 15
        assert all(r["n_events"] == 4 for r in out)

    def test_windowed_rates(self, spark, events_dir):
        schema = "user_id int, ts timestamp"
        stream = (
            spark.readStream.schema(schema)
            .parquet(events_dir)
            .withColumn("host", F.concat(F.lit("h"), F.col("user_id")))
        )
        out = run_stream(
            windowed_fetch_rates(stream, window="1 hour"), spark, "rates"
        ).collect()
        assert sum(r["fetched"] for r in out) == 60
        assert {r["host"] for r in out} == {f"h{i}" for i in range(5)}


class TestWindowedCounts:
    def test_late_event_merges_and_state_spans_batches(
        self, spark, tmp_path
    ):
        """Two hand-built micro-batch files: batch 2 carries one event
        that is 10+ minutes OLDER than batch 1's max ts (late, but
        within the 2-hour watermark) — it must merge into its already-
        open window, the final state must equal the batch GROUP BY,
        and the revised window must appear in the update-mode sink
        once per batch (cross-batch state, not per-batch recompute)."""
        import os

        from methanol_web_crawler_spark.streaming.windowed import (
            windowed_counts_stream,
        )

        base = 1_704_067_200  # 2024-01-01T00:00Z, hour-aligned
        rows = [
            (m, base + m * 60, f"t{m % 2}", 1.0)
            for m in range(240)  # 4 h of events, one per minute
        ]
        late = [r for r in rows if r[0] == 110][0]  # 01:50, type t0
        batch1 = [r for r in rows if r[0] < 120 and r[0] != 110]
        batch2 = [r for r in rows if r[0] >= 120] + [late]

        src = str(tmp_path / "in")
        os.makedirs(src)
        for i, batch in enumerate((batch1, batch2)):
            df = spark.createDataFrame(
                batch, "event_id long, epoch long, event_type string,"
                " value double"
            ).select(
                "event_id",
                F.timestamp_seconds("epoch").alias("ts"),
                "event_type", "value",
            ).coalesce(1)
            d = str(tmp_path / f"b{i}")
            df.write.parquet(d)
            part = [f for f in os.listdir(d) if f.endswith(".parquet")]
            dst = f"{src}/chunk{i}.parquet"
            os.rename(f"{d}/{part[0]}", dst)
            os.utime(dst, (1_000_000_000 + i * 1000,) * 2)

        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, event_type string,"
                " value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            windowed_counts_stream(stream, watermark="2 hours")
            .writeStream.format("memory")
            .queryName("win_counts_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        sink = spark.table("win_counts_test")
        final = {
            (r["win"].start.minute + 60 * r["win"].start.hour,
             r["event_type"]): (r["n"], r["sum_cents"])
            for r in sink.groupBy("win", "event_type")
            .agg(F.max("n").alias("n"),
                 F.max_by("sum_cents", "n").alias("sum_cents"))
            .collect()
        }
        # every hour window: 30 events per type, 100 cents each
        assert final == {
            (h * 60, f"t{t}"): (30, 3000)
            for h in range(4) for t in range(2)
        }
        # the late event's window (01:00, t0) was emitted in BOTH
        # batches: 29 events in batch 1, revised to 30 by the late
        # arrival in batch 2
        revs = sorted(
            r["n"] for r in sink.collect()
            if r["win"].start.hour == 1 and r["event_type"] == "t0"
        )
        assert revs == [29, 30]

    def test_chunked_source_shim(self, spark):
        """_stream_chunked_src splits the sf events table into 4
        time-ordered files with ascending mtimes and rebuilds only
        when the source changes."""
        import os

        from methanol_web_crawler_spark.entryqueries import (
            _stream_chunked_src,
        )

        sf_dir = "/root/testdata/sf0.001"
        d = _stream_chunked_src(
            sf_dir, "events", sort_cols=("ts", "event_id"), n_chunks=4
        )
        files = sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )
        assert len(files) == 4
        mtimes = [os.stat(f"{d}/{f}").st_mtime for f in files]
        assert mtimes == sorted(mtimes) and len(set(mtimes)) == 4
        total = sum(
            spark.read.parquet(f"{d}/{f}").count() for f in files
        )
        assert total == spark.read.parquet(
            f"{sf_dir}/events.parquet"
        ).count()
        # cached rebuild: same marker -> same dir, files untouched
        before = os.stat(f"{d}/{files[0]}").st_mtime_ns
        assert _stream_chunked_src(
            sf_dir, "events", sort_cols=("ts", "event_id"), n_chunks=4
        ) == d
        assert os.stat(f"{d}/{files[0]}").st_mtime_ns == before


class TestStreamingDedup:
    def test_first_seen_only(self, spark, tmp_path):
        from methanol_web_crawler_spark.streaming.dedup_stream import (
            streaming_dedup,
        )

        # two micro-batches with overlap: batch2 repeats half of batch1
        d1 = spark.createDataFrame(
            [(f"http://h{i % 4}.test/p{i}",) for i in range(40)],
            "url string",
        )
        d2 = spark.createDataFrame(
            [(f"http://h{i % 4}.test/p{i}",) for i in range(20, 60)],
            "url string",
        )
        src = str(tmp_path / "in")
        d1.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("url string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = (
            streaming_dedup(stream)
            .writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        first = spark.sql("select url from dedup_out").collect()
        assert len(first) == 40  # all new

        d2.write.mode("append").parquet(src)
        q2 = (
            streaming_dedup(
                spark.readStream.schema("url string").parquet(src)
            )
            .writeStream.format("memory")
            .queryName("dedup_out2")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        rows = spark.sql("select url from dedup_out2").collect()
        # 40 + 40 urls with 20 overlaps -> 60 unique emitted
        assert len(rows) == 60
        assert len({r["url"] for r in rows}) == 60
