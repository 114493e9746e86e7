"""The engine's OWN committed results table is a history table.

Round-2 verdict gap: RESULTS_SCHEMA declared the reference history
columns (id, ts, source, ... — reference HistoryManager.cpp:52-65) but
ExtractionJob appended raw extraction output without them, so the
history operators were only ever contract-checked against the driver's
events table. These tests pin the closed loop:

  * every RESULTS_SCHEMA column exists with the declared type on the
    committed table (stamped by job.stamp_results at append time);
  * ids are unique across runs; ts has run granularity (strictly later
    runs sort later);
  * the UNCHANGED history operators (paginate / latest_per_key /
    filter_history / retention_topn) run directly on the engine output;
  * replay_hits=True re-emits cached results as new history rows with
    processing_time_ms=0 and a fresh ts (reference hit path,
    MainWindow.cpp:1650-1659), and latest-successful-wins then picks the
    replayed row by REAL time order.
"""

import time

import pyspark.sql.functions as F

from xs_vlm_ocr_spark.corpus import gen_docs_df
from xs_vlm_ocr_spark.job import ExtractionJob
from xs_vlm_ocr_spark.operators.history import (
    filter_history,
    latest_per_key,
    paginate,
    retention_topn,
)
from xs_vlm_ocr_spark.schemas import RESULTS_SCHEMA

N_DOCS = 60


def test_committed_results_carry_history_schema(spark, tmp_path_factory):
    job = ExtractionJob(str(tmp_path_factory.mktemp("job_hist")), source="batch")
    job.run(spark, gen_docs_df(spark, N_DOCS))
    res = job.read_results(spark)

    declared = {f.name: f.dataType for f in RESULTS_SCHEMA.fields}
    actual = {f.name: f.dataType for f in res.schema.fields}
    for name, dtype in declared.items():
        assert name in actual, f"missing history column {name}"
        assert actual[name] == dtype, (name, actual[name], dtype)

    rows = res.collect()
    assert len(rows) == N_DOCS
    assert len({r["id"] for r in rows}) == N_DOCS  # unique ids
    assert len({r["ts"] for r in rows}) == 1       # one commit stamp per run
    assert all(r["source"] == "batch" for r in rows)
    # media_ref = first media span (this corpus interleaves media spans)
    assert any(r["media_ref"] for r in rows)


def test_history_operators_run_on_engine_output(spark, tmp_path_factory):
    job = ExtractionJob(str(tmp_path_factory.mktemp("job_hist_ops")))
    job.run(spark, gen_docs_df(spark, N_DOCS))
    res = job.read_results(spark)

    page = paginate(res, "ts", "id", page=0, page_size=10).collect()
    assert len(page) == 10

    latest = latest_per_key(res, ["content_hash"], "ts", "id")
    assert latest.count() == res.select("content_hash").distinct().count()

    kw = filter_history(res, ts_col="ts", keyword="the",
                        keyword_cols=("full_text", "model_name"))
    assert kw.count() == res.filter(F.lower("full_text").contains("the")).count()

    kept = retention_topn(res, 25, "ts", "id")
    assert kept.count() == 25


def test_second_run_gets_later_ts_and_distinct_ids(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("job_two_runs"))
    job = ExtractionJob(out)
    r1 = job.run(spark, gen_docs_df(spark, N_DOCS // 2))
    time.sleep(0.01)
    r2 = job.run(spark, gen_docs_df(spark, N_DOCS))  # resume: second half only
    res1 = spark.read.parquet(job.results.run_dir(r1))
    res2 = spark.read.parquet(job.results.run_dir(r2))
    assert res2.count() == N_DOCS // 2
    ts1 = res1.select(F.max("ts")).first()[0]
    ts2 = res2.select(F.min("ts")).first()[0]
    assert ts2 > ts1  # run granularity recency holds across runs
    all_ids = job.read_results(spark).select("id").collect()
    assert len({r["id"] for r in all_ids}) == N_DOCS


def test_replay_hits_reemits_cached_rows_with_zero_time(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("job_replay"))
    first = ExtractionJob(out)
    r1 = first.run(spark, gen_docs_df(spark, N_DOCS // 2))
    time.sleep(0.01)

    replayer = ExtractionJob(out, replay_hits=True)
    r2 = replayer.run(spark, gen_docs_df(spark, N_DOCS))
    run2 = spark.read.parquet(replayer.results.run_dir(r2))
    assert run2.count() == N_DOCS  # N/2 fresh extractions + N/2 replays

    run1 = spark.read.parquet(first.results.run_dir(r1))
    run1_hashes = {r["content_hash"] for r in run1.select("content_hash").collect()}
    replayed = [r for r in run2.collect() if r["content_hash"] in run1_hashes]
    assert len(replayed) == N_DOCS // 2
    assert all(r["processing_time_ms"] == 0 for r in replayed)  # hit marker
    by_hash_run1 = {r["content_hash"]: r["full_text"] for r in run1.collect()}
    assert all(r["full_text"] == by_hash_run1[r["content_hash"]] for r in replayed)

    # latest-successful-wins over the whole table now picks the REPLAYED
    # row (fresh ts) for every first-half hash — real time order, not a
    # duration proxy
    latest = latest_per_key(replayer.read_results(spark),
                            ["content_hash"], "ts", "id")
    latest_first_half = [r for r in latest.collect()
                         if r["content_hash"] in run1_hashes]
    assert len(latest_first_half) == N_DOCS // 2
    assert all(r["processing_time_ms"] == 0 for r in latest_first_half)

    # replay is additive history, resume-idempotency is the default:
    # lineage shows only the second half was actually extracted
    lin2 = replayer.read_lineage(spark).filter(f"run_id = '{r2}'")
    assert lin2.agg({"docs_in": "sum"}).first()[0] == N_DOCS // 2


def test_replay_plan_scans_input_once(spark, tmp_path_factory):
    """Round-3 Missing #2: replay used to re-read and re-hash the whole
    input for the hit probe — a second full pass at 100 TB. The replay
    plan now marks hits inline (left join + is_hit) and probes from the
    STAGED output, so the extraction plan contains exactly ONE scan of
    the input source, same as a plain run."""
    import re

    from xs_vlm_ocr_spark.corpus import gen_docs_local
    from xs_vlm_ocr_spark.schemas import DOCS_SCHEMA

    base = tmp_path_factory.mktemp("replay_one_scan")
    inp = str(base / "docs_parquet")
    spark.createDataFrame(gen_docs_local(30), DOCS_SCHEMA).write.parquet(inp)
    docs = spark.read.parquet(inp)

    job = ExtractionJob(str(base / "out"), replay_hits=True)
    job.run(spark, docs)  # first run commits everything

    qe = job.plan(spark, docs)._jdf.queryExecution()
    plan = qe.executedPlan().toString().split("== Initial Plan ==")[0]
    # one FileScan node per distinct scan of the input path (the
    # optimized-plan string elides locations; the physical one shows them)
    n_scans = len(re.findall("docs_parquet", plan))
    assert n_scans == 1, f"input scanned {n_scans}x:\n{plan[:3000]}"

    # and the replay e2e still doubles history rows, with run 2 doing
    # ZERO extraction work (every row is a replayed hit)
    r2 = job.run(spark, docs)
    assert job.read_results(spark).count() == 60
    lin2 = job.read_lineage(spark).filter(f"run_id = '{r2}'")
    assert (lin2.agg({"docs_in": "sum"}).first()[0] or 0) == 0


def test_retention_topn_plan_is_partial_topk(spark):
    """retention_topn must be TakeOrderedAndProject (each partition
    keeps its own top-n, the driver merges n-sized heaps) feeding a
    broadcast semi-join — never an unpartitioned row_number window,
    which is a single-reducer global sort of the whole history table at
    10^12 rows (round-4 verdict Missing #3). Deterministic plan
    assertions, not timing (CLAUDE.md)."""
    from xs_vlm_ocr_spark.operators.history import retention_topn

    df = spark.range(10_000).select(
        F.format_string("id%08d", F.col("id")).alias("id"),
        F.timestamp_seconds(F.col("id") % 997).alias("ts"),
        (F.col("id") * 2).alias("payload"),
    )
    kept = retention_topn(df, 50, "ts", "id")
    assert kept.count() == 50
    plan = kept._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window [" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_time_bounded_read_results_prunes_runs_at_file_level(spark, tmp_path_factory):
    """Round-6 directive 1: every run's commit ts lands in the manifest
    as exact min/max stats (stats_bounds — no scan), and a time-bounded
    read_results opens ONLY the overlapping runs' files. Asserted at
    the plan's partition-filter level (bucketed table)."""
    out = str(tmp_path_factory.mktemp("job_ts_prune"))
    job = ExtractionJob(out)
    r1 = job.run(spark, gen_docs_df(spark, 20))
    time.sleep(0.05)
    r2 = job.run(spark, gen_docs_df(spark, 40))  # resume: second half

    stats = job.results.run_stats()
    assert set(stats) == {r1, r2}
    assert all(s["col"] == "ts" and s["min_us"] == s["max_us"]
               for s in stats.values())  # one commit stamp per run: exact

    # window that covers only run 2 (strictly after run 1's stamp)
    from datetime import timedelta
    from xs_vlm_ocr_spark.table_io import _EPOCH

    split = _EPOCH + timedelta(microseconds=stats[r1]["max_us"] + 1)
    recent = job.read_results(spark, ts_start=split)
    assert recent.count() == 20
    plan = recent._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert r2 in plan and r1 not in plan, plan
    # time bounds compose with the row-level history predicate
    assert filter_history(recent, ts_col="ts", keyword="the",
                          keyword_cols=("full_text",)).count() == \
        filter_history(job.read_results(spark), ts_col="ts", keyword="the",
                       keyword_cols=("full_text",)).filter(
            F.col("ts") >= F.lit(split)).count()


def test_job_compact_after_bounds_run_count(spark, tmp_path_factory):
    """Round-6 directive 6: the compaction policy hook keeps the
    run-count (and so the file count) bounded across repeated ingests."""
    out = str(tmp_path_factory.mktemp("job_policy"))
    job = ExtractionJob(out)
    for i in range(4):
        job.run(spark, gen_docs_df(spark, 10 * (i + 1)), compact_after=2)
        assert len(job.results.committed_runs()) <= 2
        assert len(job.lineage.committed_runs()) <= 2
    res = job.read_results(spark)
    assert res.count() == 40
    # retention stats survive the policy (recomputed on merge)
    assert len(job.results.run_stats()) == len(job.results.committed_runs())


def test_time_retention_on_results_is_manifest_only(spark, tmp_path_factory):
    """Round-6 stretch 8: ts-axis retention on the engine's results =
    expire whole runs from the manifest (each run has one commit stamp,
    so no run ever straddles the cutoff) — no rewrite of kept data."""
    out = str(tmp_path_factory.mktemp("job_expire"))
    job = ExtractionJob(out)
    r1 = job.run(spark, gen_docs_df(spark, 20))
    time.sleep(0.05)
    r2 = job.run(spark, gen_docs_df(spark, 40))

    from datetime import timedelta
    from xs_vlm_ocr_spark.table_io import _EPOCH

    stats = job.results.run_stats()
    cutoff = _EPOCH + timedelta(microseconds=stats[r1]["max_us"] + 1)
    kept_files = set(spark.read.parquet(job.results.run_dir(r2)).inputFiles())

    expired = job.results.expire_before(spark, cutoff)
    assert expired == [r1]
    assert job.results.committed_runs() == [r2]
    assert set(job.read_results(spark).inputFiles()) == kept_files  # untouched
    assert job.read_results(spark).count() == 20
