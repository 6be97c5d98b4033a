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
