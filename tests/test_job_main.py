"""The spark-submit surface (job_main.py): argparse -> ExtractionJob ->
one-line JSON summary. Runs main() in-process (getOrCreate attaches to
the test session) — the same path `spark-submit ... job_main.py` takes.
"""

import json
import sys

from xs_vlm_ocr_spark.corpus import gen_docs_df


def _run_cli(monkeypatch, capsys, argv):
    import job_main

    monkeypatch.setattr(sys, "argv", ["job_main.py", *argv])
    job_main.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_job_main_end_to_end_and_resume(spark, tmp_path, monkeypatch, capsys):
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    gen_docs_df(spark, 40).write.parquet(docs_dir)

    summary = _run_cli(monkeypatch, capsys,
                       ["--input", docs_dir, "--output", out_dir])
    assert summary["total_results"] == 40
    assert summary["docs_in"] == 40 and summary["docs_out"] == 40
    assert summary["run_id"]

    # second invocation over the same input: pure resume semantics —
    # every doc is a cache hit, nothing re-extracted, table unchanged
    again = _run_cli(monkeypatch, capsys,
                     ["--input", docs_dir, "--output", out_dir])
    assert again["total_results"] == 40
    assert again["docs_in"] == 0

    # --replay-hits: hits re-emitted as new history rows with the
    # processing_time_ms=0 marker (reference hit path)
    replayed = _run_cli(monkeypatch, capsys,
                        ["--input", docs_dir, "--output", out_dir,
                         "--replay-hits", "--source", "retry"])
    assert replayed["total_results"] == 80
    from xs_vlm_ocr_spark.job import ExtractionJob

    res = ExtractionJob(out_dir).read_results(spark)
    hits = res.filter("processing_time_ms = 0 AND source = 'retry'")
    assert hits.count() == 40
