"""End-to-end smoke of jobs/run_dedup.py: near-dup clusters drop the
planted triple's losers, exact-substring removal excises the planted
span from the lower-priority doc. Runs in a subprocess (the job owns
its SparkSession lifecycle — calling main() in-process would stop the
suite's shared session)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPAN = "a shared verbatim license paragraph that is long enough to excise"


def test_run_dedup_job_end_to_end(tmp_path):
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (1, base + "tail one"),
        (2, base + "tail two"),
        (3, base + "tail two variant"),
        (10, "first unique doc " + SPAN + " with its own ending here"),
        (11, "zz " + SPAN + " but a completely different continuation"),
        (50, "completely different content about spark plans " * 10),
    ]
    inp = tmp_path / "docs.parquet"
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(inp)
    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, "jobs/run_dedup.py", "--input", str(inp),
         "--output", str(out), "--master", "local[4]"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(
        [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["n_docs_in"] == 6
    assert summary["n_near_dup_dropped"] == 2      # docs 2, 3
    assert summary["n_docs_span_excised"] == 1     # doc 11
    assert summary["n_chars_removed"] >= len(SPAN)
    got = pd.read_parquet(out / "docs_clean").set_index("doc_id")
    assert set(got.index) == {1, 10, 11, 50}
    assert SPAN in got.loc[10, "text_clean"]       # canonical copy intact
    assert SPAN not in got.loc[11, "text_clean"]
    assert got.loc[11, "text_clean"].startswith("zz")


def test_run_dedup_job_with_benchmark(tmp_path):
    """--benchmark drops contaminated docs before clustering."""
    snip = " ".join(f"evaltoken{i}" for i in range(13))
    rows = [
        (1, "clean document body " + " ".join(f"w{i}" for i in range(20))),
        (2, "prefix words here " + snip + " and a tail"),
        (3, "another clean unrelated document " * 5),
    ]
    inp = tmp_path / "docs.parquet"
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(inp)
    bench = tmp_path / "bench.parquet"
    pd.DataFrame([(snip,)], columns=["text"]).to_parquet(bench)
    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, "jobs/run_dedup.py", "--input", str(inp),
         "--output", str(out), "--benchmark", str(bench),
         "--master", "local[4]"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(
        [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["n_decontaminated"] == 1
    got = pd.read_parquet(out / "docs_clean")
    assert set(got["doc_id"]) == {1, 3}


def test_run_dedup_job_skew_guard_flags(tmp_path):
    """--max-df / --max-partners plumb through to the operators: the job
    completes with the caps on and still excises the planted span from
    the lower-priority doc."""
    span = "the long shared verbatim paragraph that must be excised yes"
    rows = [(i, f"unique doc {i} words " + span) for i in range(6)]
    rows.append((50, "victim prefix " + span + " victim suffix"))
    inp = tmp_path / "docs.parquet"
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(inp)
    out = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, "jobs/run_dedup.py", "--input", str(inp),
         "--output", str(out), "--master", "local[4]",
         "--max-df", "50", "--max-partners", "3",
         "--min-jaccard", "0.95"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    got = pd.read_parquet(out / "docs_clean").set_index("doc_id")
    assert 50 in got.index
    assert span not in got.loc[50, "text_clean"]
    assert got.loc[50, "n_removed"] >= len(span) - 2
