"""Checkpoint/resume tests (SURVEY.md §5.2 item 5, north_rule lineage +
exact-resume requirement)."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pytest

from pdf2pdfocr_ray.config import PipelineConfig
from pdf2pdfocr_ray.sources.corpus import generate_corpus
from pdf2pdfocr_ray.state.checkpoint import (
    MANIFEST,
    completed_shards,
    config_hash,
    run_checkpointed,
    url_shard,
)

N_DOCS = 60
N_SHARDS = 4


@pytest.fixture()
def corpus_dir(tmp_path):
    import pyarrow.parquet as pq

    pages, golden = generate_corpus(N_DOCS, seed=42)
    p = tmp_path / "pages.parquet"
    pq.write_table(pages, str(p))
    return str(p), golden


def _factory(path):
    def make():
        import ray.data

        return ray.data.read_parquet(path)

    return make


def _read_all(out_dir) -> pd.DataFrame:
    frames = []
    for f in glob.glob(os.path.join(out_dir, "shard=*", "*.parquet")):
        frames.append(pd.read_parquet(f))
    return (
        pd.concat(frames).sort_values("url").reset_index(drop=True)
        if frames
        else pd.DataFrame()
    )


def test_full_run_writes_manifests_and_matches_golden(ray_session, corpus_dir, tmp_path):
    path, golden = corpus_dir
    out = str(tmp_path / "out")
    summary = run_checkpointed(_factory(path), out, num_shards=N_SHARDS)
    assert summary["rows"] == N_DOCS
    assert all(v == "done" for v in summary["shards"].values())
    for s in range(N_SHARDS):
        m = json.load(open(os.path.join(out, f"shard={s:05d}", MANIFEST)))
        assert m["rows_in"] == m["rows_out"]
        assert m["config_hash"] == config_hash(PipelineConfig())
    res = _read_all(out)
    g = golden.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(res) == len(g)
    for i in range(len(g)):
        a, b = res["extracted_text"][i], g["extracted_text"][i]
        assert (a == b) or (pd.isna(a) and pd.isna(b))

    # Manifest metrics vs ground truth (round-1 bug: n_errors was
    # replicated per route and first()-summed).  Check per shard, across
    # multi-batch multi-route shards: n_errors == true non-null error
    # count of that shard's rows; per_route sums to rows_out.
    shards = url_shard(res["url"].tolist(), N_SHARDS)
    total_errs = 0
    for s in range(N_SHARDS):
        m = json.load(open(os.path.join(out, f"shard={s:05d}", MANIFEST)))
        sub = res[shards == s]
        assert m["rows_out"] == len(sub)
        assert m["n_errors"] == int(sub["error"].notna().sum())
        assert sum(m["per_route"].values()) == m["rows_out"]
        total_errs += m["n_errors"]
    assert total_errs == int(res["error"].notna().sum())
    assert summary["errors"] == total_errs


def test_resume_skips_completed_shards(ray_session, corpus_dir, tmp_path):
    path, _ = corpus_dir
    out = str(tmp_path / "out")
    run_checkpointed(_factory(path), out, num_shards=N_SHARDS)
    before = _read_all(out)

    # Simulate a crash on shard 2: drop its manifest (partial write).
    victim = os.path.join(out, f"shard={2:05d}")
    os.remove(os.path.join(victim, MANIFEST))
    mtimes = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(out, "shard=*", "*.parquet"))
        if "shard=00002" not in f
    }

    summary = run_checkpointed(_factory(path), out, num_shards=N_SHARDS)
    statuses = summary["shards"]
    assert statuses[2] == "done"
    assert all(statuses[s] == "skipped" for s in (0, 1, 3))
    # untouched shards were not rewritten
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t
    after = _read_all(out)
    pd.testing.assert_frame_equal(
        before.fillna("∅"), after.fillna("∅"), check_like=True
    )


def test_resume_rewrites_shard_with_corrupt_manifest(
    ray_session, corpus_dir, tmp_path
):
    """External corruption of a manifest (the atomic publish means the
    engine never truncates one itself) must read as 'not completed' and
    re-run that shard idempotently — not kill the resume with a
    JSONDecodeError."""
    path, _ = corpus_dir
    out = str(tmp_path / "out")
    run_checkpointed(_factory(path), out, num_shards=N_SHARDS)
    before = _read_all(out)

    victim = os.path.join(out, f"shard={1:05d}", MANIFEST)
    with open(victim, "w") as f:
        f.write('{"config_hash": "tru')  # truncated json

    summary = run_checkpointed(_factory(path), out, num_shards=N_SHARDS)
    assert summary["shards"][1] == "done"
    assert all(summary["shards"][s] == "skipped" for s in (0, 2, 3))
    after = _read_all(out)
    pd.testing.assert_frame_equal(
        before.fillna("∅"), after.fillna("∅"), check_like=True
    )


def test_resume_rewrites_shard_with_damaged_part(
    ray_session, corpus_dir, tmp_path
):
    """A valid manifest over a deleted/truncated part file must NOT be
    skipped: resume validates parquet footer row totals against the
    manifest's rows_out and re-runs the short shard."""
    path, _ = corpus_dir
    out = str(tmp_path / "out")
    run_checkpointed(_factory(path), out, num_shards=N_SHARDS)
    before = _read_all(out)

    victim_dir = os.path.join(out, f"shard={3:05d}")
    parts = [f for f in os.listdir(victim_dir) if f.endswith(".parquet")]
    # truncate one part (damaged footer), keep the manifest intact
    victim = os.path.join(victim_dir, parts[0])
    data = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(data[: len(data) // 2])

    summary = run_checkpointed(_factory(path), out, num_shards=N_SHARDS)
    assert summary["shards"][3] == "done"
    assert all(summary["shards"][s] == "skipped" for s in (0, 1, 2))
    after = _read_all(out)
    pd.testing.assert_frame_equal(
        before.fillna("∅"), after.fillna("∅"), check_like=True
    )


def test_config_change_invalidates(ray_session, corpus_dir, tmp_path):
    path, _ = corpus_dir
    out = str(tmp_path / "out")
    run_checkpointed(_factory(path), out, num_shards=N_SHARDS)
    done = completed_shards(out, N_SHARDS, config_hash(PipelineConfig()))
    assert len(done) == N_SHARDS
    # A different config must not treat old shards as complete.
    other = PipelineConfig(ocr_engine="no_ocr")
    assert completed_shards(out, N_SHARDS, config_hash(other)) == set()
    summary = run_checkpointed(_factory(path), out, config=other, num_shards=N_SHARDS)
    assert all(v == "done" for v in summary["shards"].values())


def test_concurrent_shards_same_output(ray_session, corpus_dir, tmp_path):
    """concurrent_shards=2 must produce byte-identical output and the same
    manifests as the serial path (explicit small pools so they share)."""
    path, _ = corpus_dir
    serial, conc = str(tmp_path / "s"), str(tmp_path / "c")
    cfg = PipelineConfig(ocr_concurrency=1)
    run_checkpointed(_factory(path), serial, config=cfg, num_shards=N_SHARDS)
    summary = run_checkpointed(
        _factory(path), conc, config=cfg, num_shards=N_SHARDS,
        concurrent_shards=2,
    )
    assert all(v == "done" for v in summary["shards"].values())
    a = _read_all(serial)
    b = _read_all(conc)
    pd.testing.assert_frame_equal(
        a.fillna("∅"), b.fillna("∅"), check_like=True
    )


def test_url_shard_stable_and_total():
    urls = [f"https://example.org/x/{i}" for i in range(200)]
    a = url_shard(urls, 8)
    b = url_shard(urls, 8)
    assert (a == b).all()
    assert set(a) <= set(range(8))
    # every shard non-empty at this size (sanity of spread)
    assert len(set(a)) == 8


def test_reshard_does_not_duplicate_rows(ray_session, corpus_dir, tmp_path):
    """Resuming the same out_dir with a DIFFERENT num_shards must rewrite
    from scratch, not skip old-modulus shards whose rows re-hash into the
    new shards (ADVICE r2: num_shards was absent from the resume check,
    silently duplicating rows)."""
    path, _ = corpus_dir
    out = str(tmp_path / "out")
    cfg = PipelineConfig(ocr_concurrency=2)
    run_checkpointed(_factory(path), out, config=cfg, num_shards=8)
    summary = run_checkpointed(_factory(path), out, config=cfg, num_shards=N_SHARDS)
    # nothing skipped: the modulus changed, every old manifest is invalid
    assert all(v == "done" for v in summary["shards"].values())
    res = _read_all(out)
    # no duplicated urls, no stale shard dirs beyond the new modulus
    assert len(res) == N_DOCS
    assert res["url"].is_unique
    stale = glob.glob(os.path.join(out, "shard=*"))
    assert len(stale) == N_SHARDS


def test_sink_part_names_are_deterministic_and_idempotent(tmp_path):
    """A retried sink task must OVERWRITE its failed attempt's file, not
    append a second copy (ADVICE r2: uuid4 part names duplicated rows on
    Ray task retry).  Calling the sink twice on the same batch == once."""
    from pdf2pdfocr_ray.state.checkpoint import _ShardSink, _part_name

    t = pa.table(
        {
            "url": [f"https://e.org/{i}" for i in range(10)],
            "route": ["html"] * 10,
            "error": [None] * 10,
        }
    )
    assert _part_name(t) == _part_name(t)
    out = str(tmp_path / "sink")
    sink = _ShardSink(out, 4)
    sink(t)
    files_once = sorted(glob.glob(os.path.join(out, "shard=*", "*.parquet")))
    rows_once = len(_read_all(out))
    sink(t)  # simulated Ray retry of the same task
    files_twice = sorted(glob.glob(os.path.join(out, "shard=*", "*.parquet")))
    assert files_once == files_twice
    assert len(_read_all(out)) == rows_once == 10


def test_watch_ingest_incremental(ray_session, tmp_path):
    """Two drop waves: the second watch call must process ONLY the new
    file (ledger diff), leave wave-1 outputs untouched, and the combined
    output must equal both waves' golden texts."""
    import pyarrow.parquet as pq

    from pdf2pdfocr_ray.state.watch import read_ledger, watch_ingest

    drop = tmp_path / "drop"
    out = tmp_path / "watch_out"
    drop.mkdir()
    pages1, golden1 = generate_corpus(20, seed=41)
    pq.write_table(pages1, str(drop / "wave1.parquet"))

    led1 = watch_ingest(str(drop), str(out), num_shards=2, max_idle_polls=0)
    assert len(led1["batches"]) == 1
    assert led1["batches"][0]["rows"] == 20

    # wave 2 = docs 20-34 of the same seed (prefix-stable generator), so
    # urls are disjoint from wave 1
    pages_all, golden_all = generate_corpus(35, seed=41)
    pages2, golden2 = pages_all.slice(20), golden_all.slice(20)
    pq.write_table(pages2, str(drop / "wave2.parquet"))
    stamp1 = os.path.getmtime(
        glob.glob(os.path.join(str(out), "ingest_00000", "shard=*", "*.parquet"))[0]
    )
    led2 = watch_ingest(str(drop), str(out), num_shards=2, max_idle_polls=0)
    assert len(led2["batches"]) == 2
    assert led2["batches"][1]["files"] == [str(drop / "wave2.parquet")]
    assert led2["batches"][1]["rows"] == 15
    # wave-1 batch untouched by the second call
    assert os.path.getmtime(
        glob.glob(os.path.join(str(out), "ingest_00000", "shard=*", "*.parquet"))[0]
    ) == stamp1
    # idempotent catch-up: a third call with nothing new does nothing
    led3 = watch_ingest(str(drop), str(out), num_shards=2, max_idle_polls=0)
    assert len(led3["batches"]) == 2
    assert read_ledger(str(out)) == led3
    # combined output matches both goldens
    combined = pd.concat(
        [_read_all(str(out / "ingest_00000")), _read_all(str(out / "ingest_00001"))]
    ).set_index("url")["extracted_text"]
    for gold in (golden1, golden2):
        g = gold.to_pandas()
        for url, text in zip(g["url"], g["extracted_text"]):
            a = combined[url]
            assert (a == text) or (pd.isna(a) and pd.isna(text))


def test_watch_corrupt_ledger_fails_loudly(tmp_path):
    """A damaged watch ledger must raise an actionable error, not be
    treated as empty (an empty ledger would re-map old files onto batch
    dirs holding manifests for a different file set and silently skip)."""
    import pytest

    from pdf2pdfocr_ray.state.watch import _LEDGER, read_ledger

    out = tmp_path / "out"
    out.mkdir()
    assert read_ledger(str(out)) == {"batches": [], "files": {}}
    (out / _LEDGER).write_text('{"batches": [tru')
    with pytest.raises(ValueError, match="watch ledger corrupt"):
        read_ledger(str(out))


def test_watch_stop_file_exits(ray_session, tmp_path):
    """A stop sentinel ends an idle watch loop promptly."""
    import time

    from pdf2pdfocr_ray.state.watch import watch_ingest

    drop = tmp_path / "drop2"
    out = tmp_path / "watch_out2"
    drop.mkdir()
    stop = tmp_path / "STOP"
    stop.write_text("")
    t0 = time.time()
    ledger = watch_ingest(
        str(drop), str(out), num_shards=2, poll_s=0.05,
        max_idle_polls=10_000, stop_file=str(stop),
    )
    assert time.time() - t0 < 5
    assert ledger["batches"] == []
