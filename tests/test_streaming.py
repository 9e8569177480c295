"""Structured Streaming twins produce the same answers as the batch windows
on bounded input (availableNow replay of the sf0.001 events parquet)."""

from __future__ import annotations

from distributed_system_mapreduce_spark.registry import QUERIES
from distributed_system_mapreduce_spark.streaming import (
    read_events_stream,
    run_available_now,
    running_user_totals_stream,
    session_counts_stream,
    tumbling_counts_stream,
)

from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_streaming_tumbling_matches_batch(spark):
    stream = tumbling_counts_stream(read_events_stream(spark, SF_SMOKE))
    got = run_available_now(stream, "t_tumbling")
    stream_rows = {
        (r["hour_start"].strftime("%Y-%m-%d %H:%M:%S"), r["event_type"]): (
            r["cnt"],
            r["sum_value"],
        )
        for r in got.collect()
    }
    batch_rows = {
        (r["hour_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in QUERIES["window_tumbling"](spark, SF_SMOKE).collect()
    }
    assert stream_rows == batch_rows


def test_streaming_session_window_runs(spark):
    stream = session_counts_stream(read_events_stream(spark, SF_SMOKE))
    got = run_available_now(stream, "t_session")
    rows = got.collect()
    assert len(rows) > 0
    # session invariants: start <= end, positive event counts
    for r in rows:
        assert r["sess_start"] <= r["sess_end"]
        assert r["n_events"] >= 1
    # total events across sessions == total events in the table
    total = sum(r["n_events"] for r in rows)
    from distributed_system_mapreduce_spark.sources.io import load

    assert total == load(spark, SF_SMOKE, "events").count()


def test_streaming_exact_dedup_matches_batch(spark):
    """Stateful stream dedup admits exactly the batch-distinct texts."""
    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        dedup_exact_stream,
        read_documents_stream,
    )

    stream = dedup_exact_stream(read_documents_stream(spark, SF_SMOKE))
    got = run_available_now(stream, "t_dedup_exact", mode="append")
    n_stream = got.count()
    n_batch = (
        load(spark, SF_SMOKE, "documents").select("text").distinct().count()
    )
    assert n_stream == n_batch


def test_streaming_minhash_candidates_match_batch(spark):
    """Incremental band-bucket candidates == the batch LSH band join."""
    from pyspark.sql import functions as F
    from distributed_system_mapreduce_spark.operators.dedup import (
        banded_keys,
        shingle_hashes,
    )
    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        minhash_candidates_stream,
        read_documents_stream,
    )

    stream = minhash_candidates_stream(read_documents_stream(spark, SF_SMOKE))
    got = run_available_now(stream, "t_dedup_minhash", mode="append")
    stream_pairs = {(r["a_id"], r["b_id"]) for r in got.collect()}

    banded = banded_keys(shingle_hashes(load(spark, SF_SMOKE, "documents")))
    a, b = banded.alias("a"), banded.alias("b")
    batch_pairs = {
        (r["a_id"], r["b_id"])
        for r in a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
        .collect()
    }
    assert stream_pairs == batch_pairs


def test_streaming_minhash_verified_matches_batch(spark):
    """Incremental verify stage == batch candidates + exact-Jaccard filter."""
    from pyspark.sql import functions as F
    from distributed_system_mapreduce_spark.operators.dedup import (
        banded_keys,
        shingle_hashes,
    )
    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        minhash_verified_stream,
        read_documents_stream,
    )
    from distributed_system_mapreduce_spark.streaming.dedup import (
        NEAR_DUP_THRESHOLD,
    )

    stream = minhash_verified_stream(read_documents_stream(spark, SF_SMOKE))
    got = run_available_now(stream, "t_dedup_verify", mode="append")
    # at-least-once per shared band -> dedup, keeping the jacc (identical
    # across emissions of the same pair: both sides compute the exact value)
    stream_pairs = {}
    for r in got.collect():
        prev = stream_pairs.setdefault((r["a_id"], r["b_id"]), r["jacc"])
        assert prev == r["jacc"]

    hashed = shingle_hashes(load(spark, SF_SMOKE, "documents"))
    banded = banded_keys(hashed)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    sa = hashed.select(F.col("doc_id").alias("a_id"), F.col("hs").alias("sa"))
    sb = hashed.select(F.col("doc_id").alias("b_id"), F.col("hs").alias("sb"))
    jacc = F.round(
        F.size(F.array_intersect("sa", "sb"))
        / F.size(F.array_union("sa", "sb")),
        4,
    )
    batch_pairs = {
        (r["a_id"], r["b_id"]): r["jacc"]
        for r in cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jacc", jacc)
        .filter(F.col("jacc") >= NEAR_DUP_THRESHOLD)
        .collect()
    }
    assert stream_pairs == batch_pairs


def test_stateful_running_totals_match_batch(spark):
    """applyInPandasWithState per-user totals == batch groupBy on bounded
    replay (latest state row per user under update mode)."""
    from pyspark.sql import functions as F
    from distributed_system_mapreduce_spark.sources.io import load

    stream = running_user_totals_stream(read_events_stream(spark, SF_SMOKE))
    got = run_available_now(stream, "t_state")
    latest = {}
    for r in got.collect():  # update mode may emit a row per micro-batch
        prev = latest.get(r["user_id"])
        if prev is None or r["n_events"] >= prev[0]:
            latest[r["user_id"]] = (r["n_events"], r["total_value"])
    want = {
        r["user_id"]: (r["cnt"], r["sv"])
        for r in load(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sv"),
        )
        .collect()
    }
    assert {k: v[0] for k, v in latest.items()} == {k: v[0] for k, v in want.items()}
    for k in want:
        assert abs(latest[k][1] - want[k][1]) < 0.05


def test_streaming_rate_anomaly_matches_batch(spark):
    """The stateful trailing-24h z-score stream equals the batch
    rate_anomaly_stats on bounded single-batch replay: same (type, hour)
    key set, identical counts, z equal at the 4-dp quantum (the two sides
    compute sample stddev in different summation orders)."""
    from distributed_system_mapreduce_spark.operators.timewin import (
        rate_anomaly_stats,
    )
    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        rate_anomaly_stream,
    )

    stream = rate_anomaly_stream(read_events_stream(spark, SF_SMOKE))
    got = {
        (r["event_type"], r["hour_epoch"]): (r["cnt"], r["z"])
        for r in run_available_now(stream, "t_anomaly", mode="update").collect()
    }
    want = {
        (r["event_type"], r["hour_epoch"]): (r["cnt"], r["z"])
        for r in rate_anomaly_stats(load(spark, SF_SMOKE, "events")).collect()
    }
    assert set(got) == set(want)
    assert want, "fixture should produce defined z-scores"
    for k, (cnt, z) in want.items():
        assert got[k][0] == cnt, k
        assert abs(got[k][1] - z) <= 1e-4, (k, got[k][1], z)


def test_streaming_decontamination_matches_batch(spark):
    """Flagged ids from the stream-static decontamination equal the batch
    corpus_decontaminate flag set on bounded replay."""
    from distributed_system_mapreduce_spark.streaming import (
        decontam_flagged_stream,
        eval_shingle_table,
        read_documents_stream,
        run_available_now,
    )

    stream = decontam_flagged_stream(
        read_documents_stream(spark, SF_SMOKE),
        eval_shingle_table(spark, SF_SMOKE),
    )
    got = {r["doc_id"] for r in run_available_now(stream, "t_decontam", mode="append").collect()}
    batch = {
        r["doc_id"]
        for r in QUERIES["corpus_decontaminate"](spark, SF_SMOKE).collect()
    }
    assert got == batch


def test_streaming_ewma_matches_batch(spark):
    """ewma_stream equals the batch events_ewma on bounded single-batch
    replay: same (type, hour) keys, same counts, same rounded EWMA."""
    from distributed_system_mapreduce_spark.streaming import (
        ewma_stream,
        read_events_stream,
        run_available_now,
    )

    stream = ewma_stream(read_events_stream(spark, SF_SMOKE))
    got = {
        (r["event_type"], r["hour_epoch"]): (r["cnt"], r["ewma"])
        for r in run_available_now(stream, "t_ewma").collect()
    }
    import pyspark.sql.functions as F

    batch = QUERIES["events_ewma"](spark, SF_SMOKE).withColumn(
        "hour_epoch",
        F.unix_seconds(F.to_timestamp("hour_start")),
    )
    want = {
        (r["event_type"], r["hour_epoch"]): (r["cnt"], r["ewma"])
        for r in batch.collect()
    }
    assert set(got) == set(want)
    assert want, "fixture should produce EWMA rows"
    for k, (cnt, ewma) in want.items():
        assert got[k][0] == cnt, k
        assert abs(got[k][1] - ewma) <= 1e-4, (k, got[k][1], ewma)


def test_streaming_dedup_checkpoint_recovery(spark, tmp_path):
    """Stateful dedup state survives a query RESTART from its checkpoint —
    the durability half of the always-on-ingest story: the file-source log
    replays only unseen files and the restored band-bucket state still
    knows every previously admitted document.

    Phase 1: docs 1,2 (identical text) -> pair (1,2), query stopped.
    Phase 2: doc 3 appended, a NEW query object on the SAME checkpoint and
    durable parquet sink (the memory sink refuses checkpoint recovery):
    it must process ONLY doc 3 — identical text collides in all 4 bands,
    so every pair appears exactly 4 times (the documented once-per-band
    at-least-once emission) and (1,2) staying at 4 proves f1 was not
    re-processed — and pairing doc 3 against docs it never saw in this
    run is impossible unless state crossed the restart."""
    import time
    from collections import Counter

    from distributed_system_mapreduce_spark.streaming.dedup import (
        minhash_verified_stream,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    src = tmp_path / "docs_ckpt"
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "pairs_out")
    schema = "doc_id long, text string"

    def run_once():
        docs = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            minhash_verified_stream(docs)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return Counter(
            (r["a_id"], r["b_id"])
            for r in spark.read.parquet(sink).collect()
        )

    spark.createDataFrame([(1, base), (2, base)], schema).coalesce(
        1
    ).write.parquet(str(src / "f1"))
    assert run_once() == {(1, 2): 4}

    time.sleep(0.2)
    spark.createDataFrame([(3, base)], schema).coalesce(1).write.parquet(
        str(src / "f2")
    )
    assert run_once() == {(1, 2): 4, (1, 3): 4, (2, 3): 4}


def test_streaming_cms_sketch_matches_batch(spark):
    """The ingest-path count-min sketch (per-event cell updates, no per-key
    rollup) replayed over the bounded events stream equals the batch-built
    sketch cell for cell — the merge-associativity claim
    agg_cms_heavy_hitters' docstring makes — and every user's estimate
    from the replayed sketch dominates their exact count."""
    from distributed_system_mapreduce_spark.operators.aggregations import (
        cms_cells,
    )
    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        cms_sketch_stream,
        read_events_stream,
        run_available_now,
    )

    stream = cms_sketch_stream(read_events_stream(spark, SF_SMOKE))
    got = run_available_now(stream, "t_cms_sketch")
    stream_cells = {
        (r["row_id"], r["bucket"]): r["cell_count"] for r in got.collect()
    }

    ev = load(spark, SF_SMOKE, "events")
    batch_cells = {
        (r["row_id"], r["bucket"]): r["cell_count"]
        for r in cms_cells(ev.select("user_id"), "user_id")
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
        .collect()
    }
    assert stream_cells == batch_cells and stream_cells

    # one-sided CMS guarantee off the replayed sketch: est >= exact per user
    exact = {
        r["user_id"]: r["cnt"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    key_cells = {
        (r["user_id"], r["row_id"], r["bucket"])
        for r in cms_cells(
            ev.select("user_id").distinct(), "user_id"
        ).collect()
    }
    for uid, cnt in exact.items():
        est = min(
            stream_cells[(row, bucket)]
            for u, row, bucket in key_cells
            if u == uid
        )
        assert est >= cnt, (uid, est, cnt)


def test_stream_stream_theta_join_matches_batch(spark):
    """The stream-stream interval self-join's per-user pair counts equal
    batch join_theta_range on bounded replay."""
    from distributed_system_mapreduce_spark.streaming import (
        run_available_now,
        theta_range_pairs_stream,
    )

    stream = theta_range_pairs_stream(spark, SF_SMOKE)
    pairs = run_available_now(stream, "t_ss_join", mode="append")
    got = {
        (r["user_id"], r["n_pairs"])
        for r in pairs.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .collect()
    }
    want = {
        (r["user_id"], r["n_pairs"])
        for r in QUERIES["join_theta_range"](spark, SF_SMOKE).collect()
    }
    assert got == want and want


def test_streaming_minhash_ttl_evicts_and_drops_late(spark, tmp_path):
    """VERDICT r6 #5 (r4 stretch #8): band-bucket members age out past the
    stream's event-time horizon minus the TTL, and rows arriving later than
    that cutoff are dropped — so an always-on ingest holds bounded state.

    All four docs share IDENTICAL text, so they land in exactly the same
    band buckets under ANY permutation family — eviction and late-drop are
    what's under test here (near-dup matching has its own batch-equality
    tests), and bucket co-location by construction keeps the fixture
    independent of the MinHash hash family (the r7 affine→seeded-xxhash64
    swap broke the old near-dup fixture precisely because per-bucket
    horizons diverge when docs stop sharing every band).

    Two micro-batches (maxFilesPerTrigger=1, files ordered by mtime):
      batch 1: doc 1 (t=1000) and doc 2 (t=1500), both inside the 600 s
               TTL window -> pair (1,2) emitted;
      batch 2: doc 4 (t=500) arrives later than horizon(1500) - ttl(600)
               -> dropped in every bucket, no pair;
               doc 3 (t=1_000_000) advances the horizon far past every
               member -> all evicted, no pair despite identical text.
    """
    import time

    from distributed_system_mapreduce_spark.streaming import (
        run_available_now,
    )
    from distributed_system_mapreduce_spark.streaming.dedup import (
        minhash_verified_stream,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    d = tmp_path / "docs_ttl"
    spark.createDataFrame(
        [(1, base, 1000), (2, base, 1500)],
        "doc_id long, text string, ts long",
    ).coalesce(1).write.parquet(str(d / "f1"))
    time.sleep(0.2)  # distinct mtimes => deterministic file-batch order
    spark.createDataFrame(
        [(3, base, 1_000_000), (4, base, 500)],
        "doc_id long, text string, ts long",
    ).coalesce(1).write.parquet(str(d / "f2"))

    docs = (
        spark.readStream.schema("doc_id long, text string, ts long")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(d))
    )
    stream = minhash_verified_stream(docs, ts_col="ts", ttl_seconds=600)
    got = run_available_now(stream, "t_dedup_ttl", mode="append")
    pairs = {(r["a_id"], r["b_id"]) for r in got.collect()}
    assert pairs == {(1, 2)}

    # control: same corpus, no TTL -> every pair survives (identical text
    # => identical buckets, jacc 1.0), proving the eviction — not band
    # luck — removed the others above
    docs2 = (
        spark.readStream.schema("doc_id long, text string, ts long")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(d))
    )
    stream2 = minhash_verified_stream(docs2)
    got2 = run_available_now(stream2, "t_dedup_nottl", mode="append")
    pairs2 = {(r["a_id"], r["b_id"]) for r in got2.collect()}
    assert pairs2 == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)}


def test_streaming_cdc_upsert_matches_batch(spark, tmp_path):
    """Streaming CDC upsert store == batch latest-wins state under a
    2-micro-batch split of the event changelog: latest-wins by the unique
    (ts, event_id) order is associative over batches, so the LAST emitted
    state per user (the one with the user's total op count) must equal
    ``operators.cdc._latest_state`` over the same rows, including the
    alive/tombstone flag.
    """
    import time

    from distributed_system_mapreduce_spark.operators.cdc import (
        TOMBSTONE,
        _latest_state,
    )
    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        cdc_upsert_stream,
        run_available_now,
    )

    ev = load(spark, SF_SMOKE, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_epoch"),
        "ts",
    )
    mid = ev.agg(F.avg("ts_epoch")).collect()[0][0]
    d = tmp_path / "cdc_events"
    cols = ["user_id", "event_id", "event_type", "value", "ts_epoch"]
    ev.filter(F.col("ts_epoch") < mid).select(cols).coalesce(1).write.parquet(
        str(d / "f1")
    )
    time.sleep(0.2)  # distinct mtimes => deterministic batch order
    ev.filter(F.col("ts_epoch") >= mid).select(cols).coalesce(1).write.parquet(
        str(d / "f2")
    )

    stream = cdc_upsert_stream(
        spark.readStream.schema(
            "user_id long, event_id long, event_type string, "
            "value double, ts_epoch long"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(d))
    )
    got = run_available_now(stream, "t_cdc_upsert", mode="update")
    # final state per user = the emission carrying the user's total op
    # count (n_ops strictly grows across batches)
    final = {}
    for r in got.collect():
        if r.user_id not in final or r.n_ops > final[r.user_id].n_ops:
            final[r.user_id] = r

    expected = {r.user_id: r for r in _latest_state(ev).collect()}
    assert set(final) == set(expected)
    for uid, e in expected.items():
        g = final[uid]
        assert g.n_ops == e.n_ops
        assert g.last_type == e.last_type
        assert g.last_value == e.last_value
        assert g.alive == (e.last_type != TOMBSTONE)


def test_streaming_cdc_changelog_roundtrip(spark, tmp_path):
    """Changelog-OUT round trip (VERDICT r7 #7): re-applying the upsert
    stream's emissions to an empty copy with ``cdc_apply_changelog``
    reproduces the batch store exactly — live rows match ``_latest_state``
    field-for-field and tombstoned users are deleted — under a
    2-micro-batch split. This is the contract a downstream materializer
    (sink-side MERGE consumer) relies on.
    """
    import time

    from distributed_system_mapreduce_spark.operators.cdc import (
        TOMBSTONE,
        _latest_state,
    )
    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        cdc_apply_changelog,
        cdc_upsert_stream,
        run_available_now,
    )

    ev = load(spark, SF_SMOKE, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_epoch"),
        "ts",
    )
    mid = ev.agg(F.avg("ts_epoch")).collect()[0][0]
    d = tmp_path / "cdc_rt_events"
    cols = ["user_id", "event_id", "event_type", "value", "ts_epoch"]
    ev.filter(F.col("ts_epoch") < mid).select(cols).coalesce(1).write.parquet(
        str(d / "f1")
    )
    time.sleep(0.2)
    ev.filter(F.col("ts_epoch") >= mid).select(cols).coalesce(1).write.parquet(
        str(d / "f2")
    )

    stream = cdc_upsert_stream(
        spark.readStream.schema(
            "user_id long, event_id long, event_type string, "
            "value double, ts_epoch long"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(d))
    )
    emissions = run_available_now(stream, "t_cdc_roundtrip", mode="update")
    snapshot = {r.user_id: r for r in cdc_apply_changelog(emissions).collect()}

    batch = _latest_state(ev).collect()
    live = {r.user_id: r for r in batch if r.last_type != TOMBSTONE}
    dead = {r.user_id for r in batch if r.last_type == TOMBSTONE}

    assert set(snapshot) == set(live)
    assert not (dead & set(snapshot))  # tombstones deleted on re-apply
    for uid, e in live.items():
        g = snapshot[uid]
        assert g.last_type == e.last_type
        assert g.last_value == e.last_value
        assert g.n_ops == e.n_ops


def test_streaming_asof_attribution_matches_batch(spark, tmp_path):
    """Streaming as-of attributor == the batch join_asof window under a
    2-micro-batch time split: each purchase's attributed click (and µs
    gap) must equal the batch union + running-max result, including the
    strict '<' tie order (purchases before clicks at equal ts) and
    never-clicked purchases surfacing with null attribution.
    """
    import time

    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        asof_attribution_stream,
        run_available_now,
    )

    ev = load(spark, SF_SMOKE, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_epoch"),
        "event_type",
    )
    mid = ev.agg(F.avg("ts_epoch")).collect()[0][0]
    d = tmp_path / "asof_events"
    ev.filter(F.col("ts_epoch") < mid).coalesce(1).write.parquet(
        str(d / "f1")
    )
    time.sleep(0.2)
    ev.filter(F.col("ts_epoch") >= mid).coalesce(1).write.parquet(
        str(d / "f2")
    )

    stream = asof_attribution_stream(
        spark.readStream.schema(
            "event_id long, user_id long, ts_epoch long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(d))
    )
    got = {
        r.purchase_id: (r.last_click_ts, r.gap_us)
        for r in run_available_now(stream, "t_asof_attr", mode="update").collect()
    }

    # batch expectation: the join_asof union + running-max plan in µs
    pc = ev.filter(F.col("event_type").isin("click", "purchase"))
    tagged = pc.withColumn(
        "side",
        F.when(F.col("event_type") == "click", F.lit(1)).otherwise(F.lit(0)),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    batch = (
        tagged.withColumn(
            "last_click_ts",
            F.max(F.when(F.col("side") == 1, F.col("ts_epoch"))).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .collect()
    )
    expected = {
        r.event_id: (
            r.last_click_ts,
            None if r.last_click_ts is None else r.ts_epoch - r.last_click_ts,
        )
        for r in batch
    }
    assert got == expected
    assert any(v[0] is None for v in expected.values()) or len(expected) > 0


def test_streaming_watermarked_dedup_matches_batch_within_window(spark):
    """dropDuplicatesWithinWatermark (VERDICT r8 #8): when every duplicate
    arrives inside one watermark window, the admitted set equals the batch
    distinct() exactly — the bounded-state twin of dedup_exact_stream."""
    from pyspark.sql import functions as F
    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        dedup_exact_stream_watermarked,
        read_documents_stream,
    )

    # deterministic synthetic ingest time spanning 10 min << 20 min delay
    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(
        secs=(F.col("doc_id") % 600).cast("double")
    )
    stream = dedup_exact_stream_watermarked(
        read_documents_stream(spark, SF_SMOKE).withColumn("ingest_ts", ts)
    )
    got = run_available_now(stream, "t_dedup_wm", mode="append")
    n_batch = (
        load(spark, SF_SMOKE, "documents").select("text").distinct().count()
    )
    assert got.count() == n_batch


def test_streaming_watermarked_dedup_expires_state(spark, tmp_path):
    """A duplicate arriving AFTER the watermark passed its first
    occurrence's expiry is re-admitted — proof the fingerprint state is
    actually bounded by the delay, not corpus-sized."""
    import os
    from pyspark.sql import functions as F
    from distributed_system_mapreduce_spark.streaming import (
        dedup_exact_stream_watermarked,
    )

    src = str(tmp_path / "docs_src")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string, lang string, ingest_ts timestamp"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    import datetime as dt
    import time

    base = dt.datetime(2026, 1, 1)
    sec = lambda off: base + dt.timedelta(seconds=off)  # noqa: E731
    # FileStreamSource orders files by modification time — space the writes
    # so the three micro-batches replay in the intended order
    # file 1: first occurrence of "dup" at t0
    write_file("f1", [(1, "dup", "en", sec(0))])
    time.sleep(1.1)
    # file 2: unrelated row far in the future — advances the watermark past
    # t0 + delay(10s) once processed
    write_file("f2", [(2, "filler", "en", sec(1000))])
    time.sleep(1.1)
    # file 3: second filler — state eviction happens at the END of a batch
    # using the watermark set by the PREVIOUS batch, so the "dup" entry
    # (expiry t0+10s) is physically removed at the end of this batch
    write_file("f3", [(4, "filler2", "en", sec(1500))])
    time.sleep(1.1)
    # file 4: the duplicate again, after state expiry
    write_file("f4", [(3, "dup", "en", sec(2000))])

    stream = dedup_exact_stream_watermarked(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src),
        delay="10 seconds",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_dedup_wm_expiry")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    admitted = [
        r.doc_id for r in spark.table("t_dedup_wm_expiry").collect()
    ]
    # all four rows admitted: doc 3's fingerprint no longer in state.
    # (an unbounded dropDuplicates would admit only three)
    assert sorted(admitted) == [1, 2, 3, 4]


def test_transform_with_state_totals_or_documented_gate(spark, tmp_path):
    """transformWithState (Spark 4 arbitrary-state API): when the Python
    runner can start — which, since r11's pbcompat shim links the
    vendored protobuf runtime, it DOES on this container — the per-user
    totals processor must equal the batch rollup; where the environment
    genuinely can't run it, the probe must say so with an actionable
    reason and the plan must still CONSTRUCT (the same
    import-everywhere/gate-at-runtime contract as the Delta/Iceberg
    connectors)."""
    from pyspark.sql import functions as F
    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        configure_tws,
        read_events_stream,
        tws_runtime_available,
        user_totals_tws,
    )

    stream = user_totals_tws(read_events_stream(spark, SF_SMOKE))
    assert stream.isStreaming  # plan construction always works

    ok, reason = tws_runtime_available()
    if not ok:
        assert "protobuf" in reason  # actionable gate, not a bare crash
        import pytest

        pytest.skip(f"transformWithState runtime gated: {reason}")

    # typed state needs the multi-column-family RocksDB provider; scope
    # the conf to this query and restore the session default after
    prev_provider = configure_tws(spark)
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_tws_totals")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        key = "spark.sql.streaming.stateStore.providerClass"
        if prev_provider is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev_provider)
    # update-mode memory sink: last emission per user wins
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table("t_tws_totals")
        .orderBy("user_id")
        .collect()
    }
    want = {
        r.user_id: (r.n, r.s)
        for r in load(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()
    }
    assert got == want


def test_transform_with_state_map_state_type_counts(spark, tmp_path):
    """MapState twin of the totals test: per-(user, event_type) running
    counts on a typed map handle must equal the batch rollup — exercises
    the second typed-state kind (sparse data-dependent key space) through
    the r11-unblocked runtime."""
    from pyspark.sql import functions as F
    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        configure_tws,
        read_events_stream,
        tws_runtime_available,
        type_counts_tws,
    )

    stream = type_counts_tws(read_events_stream(spark, SF_SMOKE))
    assert stream.isStreaming

    ok, reason = tws_runtime_available()
    if not ok:
        assert "protobuf" in reason
        import pytest

        pytest.skip(f"transformWithState runtime gated: {reason}")

    prev_provider = configure_tws(spark)
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_tws_type_counts")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "tws_map_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        key = "spark.sql.streaming.stateStore.providerClass"
        if prev_provider is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev_provider)
    got = {
        (r.user_id, r.event_type): r.n_events
        for r in spark.table("t_tws_type_counts").collect()
    }
    want = {
        (r.user_id, r.event_type): r.n
        for r in load(spark, SF_SMOKE, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_transform_with_state_list_state_lastk(spark, tmp_path):
    """ListState twin: per-user last-K (by event_id) value sum must equal
    the batch row_number window — completes the typed-state coverage
    (ValueState totals, MapState type counts, ListState bounded window)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from distributed_system_mapreduce_spark.sources.io import load
    from distributed_system_mapreduce_spark.streaming import (
        configure_tws,
        lastk_values_tws,
        read_events_stream,
        tws_runtime_available,
    )
    from distributed_system_mapreduce_spark.streaming.tws import LASTK_K

    stream = lastk_values_tws(read_events_stream(spark, SF_SMOKE))
    assert stream.isStreaming

    ok, reason = tws_runtime_available()
    if not ok:
        assert "protobuf" in reason
        import pytest

        pytest.skip(f"transformWithState runtime gated: {reason}")

    prev_provider = configure_tws(spark)
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_tws_lastk")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "tws_list_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        key = "spark.sql.streaming.stateStore.providerClass"
        if prev_provider is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev_provider)
    got = {
        r.user_id: (r.n_kept, r.sum_lastk)
        for r in spark.table("t_tws_lastk").collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    want = {
        r.user_id: (r.n, r.s)
        for r in load(spark, SF_SMOKE, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= LASTK_K)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()
    }
    assert got == want


def test_transform_with_state_event_time_timers_close_sessions(
    spark, tmp_path
):
    """registerTimer surface (VERDICT r11 #3): inactivity sessions must
    close through BOTH paths — inline (a later row observes the gap) and
    timer-driven (the watermark passes last_event + gap with no later row
    for that user), and a session the watermark never outruns must NOT be
    emitted. Event times are synthetic and file order is mtime-pinned, so
    every closure below is forced, not scheduling-dependent."""
    import datetime as dt
    import os
    import time

    from distributed_system_mapreduce_spark.streaming import (
        configure_tws,
        session_timeout_tws,
        tws_runtime_available,
    )
    from distributed_system_mapreduce_spark.streaming.tws import (
        SESSION_GAP_MS,
    )

    ok, reason = tws_runtime_available()
    if not ok:
        assert "protobuf" in reason
        import pytest

        pytest.skip(f"transformWithState runtime gated: {reason}")

    src = str(tmp_path / "sess_src")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, ts timestamp"
    base = dt.datetime(2026, 1, 1)
    t = lambda mins, secs=0: base + dt.timedelta(  # noqa: E731
        minutes=mins, seconds=secs
    )
    ms = lambda mins, secs=0: int(  # noqa: E731
        (mins * 60 + secs) * 1000
    )
    base_ms = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # FileStreamSource orders files by mtime

    # batch 1: user 1 session A (2 events), user 2 lone event
    write_file([(1, t(0)), (1, t(1)), (2, t(0))])
    # batch 2: user 1 returns 40 min later -> closes session A INLINE
    # (gap observed against restored state); watermark -> 40 min
    write_file([(1, t(40))])
    # batch 3: user 3 appears at 100 min; user 2's timer (30 min) fired
    # against the 40-min watermark -> TIMER-path close; wm -> 100 min
    write_file([(3, t(100))])
    # batch 4: user 4 at 200 min; user 1's session-B timer (70 min) fires
    # against the 100-min watermark; wm -> 200 min
    write_file([(4, t(200))])

    stream = session_timeout_tws(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    assert stream.isStreaming

    prev_provider = configure_tws(spark)
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_tws_sessions")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "tws_timer_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        key = "spark.sql.streaming.stateStore.providerClass"
        if prev_provider is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev_provider)

    got = {
        (r.user_id, r.session_start_ms - base_ms,
         r.session_end_ms - base_ms, r.n_events)
        for r in spark.table("t_tws_sessions").collect()
    }
    forced = {
        (1, ms(0), ms(1), 2),   # inline close (row at 40 min saw the gap)
        (2, ms(0), ms(0), 1),   # timer close in batch 3
        (1, ms(40), ms(40), 1), # timer close in batch 4
    }
    # user 3's timer (130 min) only fires if a trailing no-data microbatch
    # runs against the final 200-min watermark — allowed but not required
    optional = {(3, ms(100), ms(100), 1)}
    assert forced <= got <= forced | optional, got
    # user 4's timer (230 min) is past the final watermark: its session
    # must stay open — emitted by NOTHING
    assert not any(u == 4 for (u, *_rest) in got)
    assert SESSION_GAP_MS == 30 * 60 * 1000  # twin of window_session's gap


def test_transform_with_state_ttl_keeps_then_expires(spark, tmp_path):
    """State TTL surface (VERDICT r11 #3): with a TTL far beyond the run,
    the TTL'd totals processor equals the plain batch rollup; with a 1 ms
    TTL, every batch reads the previous batch's state as already evicted,
    so each user's final totals equal their LAST file's rows alone."""
    import datetime as dt
    import os
    import time

    from pyspark.sql import functions as F
    from distributed_system_mapreduce_spark.streaming import (
        configure_tws,
        tws_runtime_available,
        user_totals_ttl_tws,
    )

    ok, reason = tws_runtime_available()
    if not ok:
        assert "protobuf" in reason
        import pytest

        pytest.skip(f"transformWithState runtime gated: {reason}")

    src = str(tmp_path / "ttl_src")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, value double, ts timestamp"
    base = dt.datetime(2026, 1, 1)

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    f1 = [(1, 10.0, base), (1, 2.5, base), (2, 1.0, base)]
    f2 = [(1, 4.0, base), (2, 3.0, base), (3, 7.0, base)]
    write_file(f1)
    write_file(f2)

    def run(ttl_ms, qname, ckpt):
        stream = user_totals_ttl_tws(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            ttl_ms=ttl_ms,
        )
        prev_provider = configure_tws(spark)
        nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
        prev_nodata = spark.conf.get(nodata_key, None)
        # TTL requires ProcessingTime time mode, whose
        # shouldRunAnotherBatch is always true — with no-data microbatches
        # enabled the query loops empty batches forever (availableNow never
        # terminates and processAllAvailable never settles), so disable
        # them for this run and drain explicitly. TTL eviction is checked
        # on READ in the next data batch, so empty batches aren't needed.
        spark.conf.set(nodata_key, "false")
        try:
            q = (
                stream.writeStream.format("memory")
                .queryName(qname)
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / ckpt))
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination()
        finally:
            key = "spark.sql.streaming.stateStore.providerClass"
            if prev_provider is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev_provider)
            if prev_nodata is None:
                spark.conf.unset(nodata_key)
            else:
                spark.conf.set(nodata_key, prev_nodata)
        return {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.table(qname).collect()
        }

    # TTL = 1 h >> run duration: state survives across batches, so the
    # final totals equal the full rollup (identical to the un-TTL'd twin)
    got_long = run(3_600_000, "t_tws_ttl_long", "ttl_long_ckpt")
    full = spark.createDataFrame(f1 + f2, schema)
    want_long = {
        r.user_id: (r.n, r.s)
        for r in full.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()
    }
    assert got_long == want_long

    # TTL = 1 ms << inter-batch latency: batch 2 reads user 1/2's batch-1
    # state as expired, so final totals are the LAST file's rows alone
    got_short = run(1, "t_tws_ttl_short", "ttl_short_ckpt")
    want_short = {
        r.user_id: (r.n, r.s)
        for r in spark.createDataFrame(f2, schema)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()
    }
    assert got_short == want_short


def test_transform_with_state_initial_state_bootstrap(spark, tmp_path):
    """initialState bootstrap (the last transformWithState surface after
    r11 ValueState/MapState/ListState and r12 timers/TTL): a stream seeded
    with a batch rollup of EARLIER data must continue that rollup — final
    totals equal the batch rollup of (seed data + streamed data) — and a
    user present only in the seed must keep the seeded totals untouched."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F
    from distributed_system_mapreduce_spark.streaming import (
        configure_tws,
        tws_runtime_available,
        user_totals_tws,
    )

    ok, reason = tws_runtime_available()
    if not ok:
        assert "protobuf" in reason
        import pytest

        pytest.skip(f"transformWithState runtime gated: {reason}")

    src = str(tmp_path / "boot_src")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, value double, ts timestamp"
    base = dt.datetime(2026, 1, 1)

    seed_rows = [(1, 10.0, base), (1, 2.5, base), (9, 5.0, base)]
    stream_rows = [(1, 4.0, base), (2, 3.0, base)]
    spark.createDataFrame(stream_rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    seed = (
        spark.createDataFrame(seed_rows, schema)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    stream = user_totals_tws(
        spark.readStream.schema(schema).parquet(src), initial=seed
    )
    assert stream.isStreaming

    prev_provider = configure_tws(spark)
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_tws_boot")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "tws_boot_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        key = "spark.sql.streaming.stateStore.providerClass"
        if prev_provider is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev_provider)

    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table("t_tws_boot").collect()
    }
    # user 1: seeded (2, 12.5) + streamed 4.0 -> (3, 16.5)
    # user 2: stream-only -> (1, 3.0)
    # user 9: seed-only -> update-mode emissions only happen for keys with
    #   input rows, so 9 appears in the sink ONLY if the runtime emitted it
    #   during bootstrap — either way its state must not leak into others
    want_streamed = {1: (3, 16.5), 2: (1, 3.0)}
    for uid, totals in want_streamed.items():
        assert got[uid] == totals, (uid, got)
    assert set(got) <= {1, 2, 9}
