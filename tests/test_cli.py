"""CLI surface test: python -m pdf2pdfocr_ray end-to-end in a fresh
process (own Ray session), including resume on second invocation."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from pdf2pdfocr_ray.sources.corpus import generate_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_cli_end_to_end_and_resume(tmp_path):
    pages, golden = generate_corpus(40, seed=42)
    src = str(tmp_path / "pages.parquet")
    pq.write_table(pages, src)
    out = str(tmp_path / "out")

    def run():
        return subprocess.run(
            [sys.executable, "-m", "pdf2pdfocr_ray", "-i", src, "-o", out,
             "--shards", "2", "--num-cpus", "2"],
            capture_output=True, text=True, cwd=REPO, timeout=300,
        )

    r1 = run()
    assert r1.returncode == 1, r1.stderr[-2000:]  # corpus has error rows
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["rows"] == 40
    assert all(v == "done" for v in s1["shards"].values())
    assert len(glob.glob(os.path.join(out, "shard=*", "_MANIFEST.json"))) == 2

    r2 = run()
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert all(v == "skipped" for v in s2["shards"].values())

    import pandas as pd

    res = (
        pd.concat(
            pd.read_parquet(f)
            for f in glob.glob(os.path.join(out, "shard=*", "*.parquet"))
        )
        .sort_values("url")
        .reset_index(drop=True)
    )
    g = golden.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(res) == len(g)
    for i in range(len(g)):
        a, b = res["extracted_text"][i], g["extracted_text"][i]
        assert (a == b) or (pd.isna(a) and pd.isna(b))


@pytest.mark.slow
def test_cli_watch_mode(tmp_path):
    """--watch: first invocation ingests the drop-zone wave; a second
    invocation with no new files is a ledgered no-op."""
    pages, _ = generate_corpus(16, seed=21)
    drop = tmp_path / "drop"
    drop.mkdir()
    pq.write_table(pages, str(drop / "w1.parquet"))
    out = str(tmp_path / "watch_out")

    def run():
        return subprocess.run(
            [sys.executable, "-m", "pdf2pdfocr_ray", "-i", str(drop),
             "-o", out, "--watch", "--shards", "2", "--num-cpus", "2"],
            capture_output=True, text=True, cwd=REPO, timeout=600,
        )

    r1 = run()
    # rc 1: the synthetic corpus plants error rows (same as the main CLI)
    assert r1.returncode == 1, r1.stderr[-800:]
    led1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert len(led1["batches"]) == 1 and led1["batches"][0]["rows"] == 16
    r2 = run()
    led2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert len(led2["batches"]) == 1  # nothing new -> no second batch
    assert glob.glob(os.path.join(out, "ingest_00000", "shard=*", "*.parquet"))


@pytest.mark.slow
def test_cli_warc_input_and_wet_output(tmp_path):
    """-i shard.warc.gz --input-format auto + --wet-output: WARC in,
    checkpointed Parquet + WET shards out, text byte-identical."""
    import datetime

    from pdf2pdfocr_ray.sources.warc import build_warc

    pages, golden = generate_corpus(30, seed=42)
    recs = []
    for u, t, p in zip(
        pages.column("url").to_pylist(),
        pages.column("warc_ts").to_pylist(),
        pages.column("html").to_pylist(),
    ):
        if isinstance(t, datetime.datetime):
            t = int(t.replace(
                tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        recs.append((u, int(t), p))
    src = str(tmp_path / "crawl.warc.gz")
    with open(src, "wb") as f:
        f.write(build_warc(recs, gzip_members=True))
    out = str(tmp_path / "out")
    wet = str(tmp_path / "wet")

    r = subprocess.run(
        [sys.executable, "-m", "pdf2pdfocr_ray", "-i", src, "-o", out,
         "--wet-output", wet, "--shards", "2", "--num-cpus", "2"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["rows"] == 30, r.stderr[-2000:]
    assert s["wet_records"] > 0
    assert glob.glob(os.path.join(wet, "*.warc.wet.gz"))

    import pandas as pd
    import ray

    ray.init(address="local", num_cpus=2, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        from pdf2pdfocr_ray.sources.wet import read_wet

        back = read_wet(wet).to_pandas().sort_values("url").reset_index(
            drop=True)
        g = golden.to_pandas()
        g = g[~g["extracted_text"].isna()].sort_values("url").reset_index(
            drop=True)
        assert len(back) == len(g) == s["wet_records"]
        assert (back["extracted_text"] == g["extracted_text"]).all()
    finally:
        ray.shutdown()


@pytest.mark.slow
def test_cli_resume_after_driver_kill(tmp_path):
    """SIGKILL the CLI driver mid-extraction (part files on disk, no
    manifest yet — the manifest is the atomic completion marker, written
    only after a shard's data), then re-run the same command: crashed
    partials are wiped, every shard redoes cleanly, and the final output
    is complete and byte-identical with no duplicated rows — the
    crash-resume story a multi-hour 100-TB job depends on."""
    import signal
    import time

    import pandas as pd

    pages, golden = generate_corpus(600, seed=42)
    src = str(tmp_path / "pages.parquet")
    pq.write_table(pages, src)
    out = str(tmp_path / "out")
    cmd = [sys.executable, "-m", "pdf2pdfocr_ray", "-i", src, "-o", out,
           "--shards", "8", "--num-cpus", "2"]

    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    deadline = time.time() + 180
    killed = False
    while time.time() < deadline and proc.poll() is None:
        # parts stream out during the run; manifests land only at the end
        if glob.glob(os.path.join(out, "shard=*", "part-*.parquet")):
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.02)
    proc.wait(timeout=60)
    assert killed, "no part files observed before the run finished"
    leftover_parts = glob.glob(os.path.join(out, "shard=*", "part-*.parquet"))
    assert leftover_parts, "kill landed after cleanup?"

    r2 = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                        timeout=300)
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["rows"] == 600
    states = list(s2["shards"].values())
    # no manifest survived the crash -> every shard redoes (any shard
    # whose manifest HAD landed would legitimately report "skipped")
    assert all(v in ("done", "skipped") for v in states), states
    assert len(glob.glob(os.path.join(out, "shard=*", "_MANIFEST.json"))) == 8

    res = (
        pd.concat(
            pd.read_parquet(f)
            for f in glob.glob(os.path.join(out, "shard=*", "*.parquet"))
        )
        .sort_values("url")
        .reset_index(drop=True)
    )
    g = golden.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(res) == len(g)  # crashed partials wiped: no duplicates
    for i in range(len(g)):
        a, b = res["extracted_text"][i], g["extracted_text"][i]
        assert (a == b) or (pd.isna(a) and pd.isna(b))
