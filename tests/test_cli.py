"""CLI parity tests — drives `python -m hadoop_search_spark` as a
user would (subprocess), covering the reference's three entry points:
index build, query, document fetch (SURVEY.md §3)."""

import re
import subprocess
import sys

import pytest

CORPUS = "/root/testdata/sf0.001/documents.parquet"


def run_cli(*args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "hadoop_search_spark", "--cpus", "4", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
    )


@pytest.mark.slow
def test_cli_index_search_fetch(tmp_path):
    idx = str(tmp_path / "idx")
    r = run_cli("index", "--corpus", CORPUS, "--out", idx, "--stopwords", "2")
    assert r.returncode == 0, r.stderr[-500:]
    assert re.search(r"indexed: \d+ postings", r.stdout)

    r = run_cli(
        "search", "spark and not dup", "--page", "1", "--index", idx, "--corpus", CORPUS
    )
    assert r.returncode == 0, r.stderr[-500:]
    lines = r.stdout.strip().splitlines()
    # reference-style header resultNum/pageNum
    assert re.match(r"^\d+/\d+$", lines[0])
    assert "$RST$" in r.stdout
    assert "FFFF00" in r.stdout  # highlights present

    r = run_cli("fetch", "42", "--corpus", CORPUS)
    assert r.returncode == 0 and len(r.stdout.strip()) > 0

    r = run_cli("fetch", "999999", "--corpus", CORPUS)
    assert r.returncode == 1
    assert "not found" in r.stderr
