"""Checkpointed, resumable extraction output with per-partition lineage.

The reference's only resume mechanism is safe-mode "skip if output file
exists" (/root/reference/pdf2pdfocr.py:1161-1167).  The engine generalizes
it to the north_rule requirement: deterministic output partitioning +
per-partition lineage manifests + exact resume (SURVEY.md §4.2 J4 row).

Layout::

    out_dir/
      shard=00000/           <- one url-hash shard of the corpus
        part-*.parquet       <- extracted rows for that shard
        _MANIFEST.json       <- written atomically AFTER the shard's data
      shard=00001/...

Execution model (round 2, replacing the round-1 shard-serial loop): ONE
streaming pass over the input executes the whole pipeline once and fans
rows out to their shard directory inside the final ``map_batches`` sink
stage (unique part filenames per task; shard dirs are append-only during
the pass).  Per-shard manifests are published atomically (tmp + rename)
only after the pass completes, so a crash mid-pass leaves manifest-less
directories that the next run wipes and redoes.  This deletes the
round-1 design's num_shards× input re-read (each shard used to re-scan
and filter the full corpus) — checkpointed wall time is now ≈ flagship
wall time, and at cluster scale the input is read exactly once.

Resume = skip every shard whose manifest exists AND whose ``config_hash``
matches (a config change invalidates everything it would alter); the
resumed pass filters completed shards' rows out at the read (cheap
per-batch mask), so only remaining shards flow through the pipeline.

Sharding key: ``crc32(url) % num_shards`` — stable across processes and
runs (unlike Python's salted ``hash``), cheap, and the SAME key the
re-assembly groupby uses, so one partitioning scheme serves both
(SURVEY.md "pick ONE partitioning key").

The manifest records lineage + metrics: config hash, engine version, input
row count, output rows, per-route counts, error count (counted once per
row as non-null ``error`` values — never replicated across routes), and
the pass wall time.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import shutil
import time
import zlib
from typing import Callable

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig

ENGINE_VERSION = "pdf2pdfocr_ray-r2"
MANIFEST = "_MANIFEST.json"


def config_hash(cfg: PipelineConfig) -> str:
    payload = json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str)
    return hashlib.md5(payload.encode()).hexdigest()


def url_shard(urls, num_shards: int) -> np.ndarray:
    """Stable shard id per url (vectorized-ish; crc32 is ~us/row)."""
    return np.fromiter(
        (zlib.crc32(u.encode("utf-8")) % num_shards for u in urls),
        dtype=np.int64,
        count=len(urls),
    )


def _shard_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard={shard:05d}")


def _write_manifest(sdir: str, manifest: dict) -> None:
    tmp = os.path.join(sdir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(sdir, MANIFEST))  # atomic publish


def read_manifest(out_dir: str, shard: int) -> dict | None:
    path = os.path.join(_shard_dir(out_dir, shard), MANIFEST)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError, UnicodeDecodeError):
        # The publish is atomic (os.replace), so the engine never leaves a
        # half-written manifest itself — but external corruption must read
        # as "shard not completed" (the shard re-runs; the sink's part
        # names are deterministic and idempotent) rather than kill resume.
        return None


def _shard_parquet_rows(sdir: str) -> int | None:
    """Row total across a shard's part files from parquet FOOTERS only
    (no data scan — resume validation must stay O(parts), not O(rows));
    None if any part is unreadable (truncated footer, external damage)."""
    import pyarrow.parquet as pq

    total = 0
    try:
        for name in os.listdir(sdir):
            if name.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(sdir, name)).metadata.num_rows
    except Exception:  # noqa: BLE001 — damaged part => shard not completed
        return None
    return total


def completed_shards(out_dir: str, num_shards: int, cfg_hash: str) -> set[int]:
    """Shards that may be skipped on resume: manifest present, SAME config
    hash AND same num_shards (ADVICE r2: a manifest written under a
    different modulus covers a different url subset — skipping it would
    duplicate rows that re-hash into the new shards), AND the shard's
    parquet footers sum to the manifest's rows_out (a deleted or
    truncated part under a valid manifest re-runs instead of silently
    shipping a short shard)."""
    done = set()
    for s in range(num_shards):
        m = read_manifest(out_dir, s)
        if (
            m is not None
            and m.get("config_hash") == cfg_hash
            and m.get("num_shards") == num_shards
            and _shard_parquet_rows(_shard_dir(out_dir, s)) == m.get("rows_out")
        ):
            done.add(s)
    return done


def _wipe_stale_shards(out_dir: str, num_shards: int) -> None:
    """Remove shard dirs outside the current modulus (a previous run with
    more shards leaves shard>=num_shards dirs whose rows would otherwise
    leak into a recursive read of out_dir)."""
    for name in os.listdir(out_dir):
        if not name.startswith("shard="):
            continue
        try:
            sid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if sid >= num_shards:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)


def _part_name(sub: pa.Table) -> str:
    """Deterministic part filename derived from the batch's url content
    (ADVICE r2: uuid4 names meant a retried sink task APPENDED a second
    copy of its rows; a content-derived name makes the retry overwrite the
    failed attempt's file instead — exactly-once output per batch)."""
    h = hashlib.blake2b(digest_size=12)
    for u in sub.column("url").to_pylist():
        h.update(u.encode("utf-8"))
        h.update(b"\x00")
    return f"part-{h.hexdigest()}-{sub.num_rows}.parquet"


class _ShardSink:
    """Final map_batches stage: write each batch's rows into per-shard
    parquet files and return small (shard, route, n, errs) metric rows.

    Errors are counted per (shard, route) with an Arrow group-by over the
    actual rows of that slice — one count per row, summed plainly by the
    driver — fixing the round-1 bug where a batch-level error total was
    replicated onto every route row and then first()-summed.
    """

    def __init__(self, out_dir: str, num_shards: int):
        self.out_dir = out_dir
        self.num_shards = num_shards

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out_shards: list[int] = []
        out_routes: list[str] = []
        out_n: list[int] = []
        out_errs: list[int] = []
        if t.num_rows:
            shards = url_shard(t.column("url").to_pylist(), self.num_shards)
            for s in np.unique(shards):
                sub = t.filter(pa.array(shards == s))
                sdir = _shard_dir(self.out_dir, int(s))
                os.makedirs(sdir, exist_ok=True)
                pq.write_table(sub, os.path.join(sdir, _part_name(sub)))
                agg = pa.TableGroupBy(
                    sub.select(["route", "error"]), "route"
                ).aggregate([([], "count_all"), ("error", "count")])
                for row in agg.to_pylist():
                    out_shards.append(int(s))
                    out_routes.append(str(row["route"]))
                    out_n.append(int(row["count_all"]))
                    out_errs.append(int(row["error_count"]))
        return pa.table(
            {
                "shard": pa.array(out_shards, pa.int64()),
                "route": pa.array(out_routes, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "errs": pa.array(out_errs, pa.int64()),
            }
        )


def run_checkpointed(
    pages_factory: Callable[[], "ray.data.Dataset"],  # noqa: F821
    out_dir: str,
    config: PipelineConfig | None = None,
    num_shards: int = 8,
    concurrent_shards: int | None = None,  # accepted for API compat; unused
) -> dict:
    """Extract the corpus in ONE streaming pass, sharded, with exact resume.

    ``pages_factory`` returns a fresh lazy pages Dataset (a read, not a
    materialized object).  All shards execute concurrently by construction
    — the single pipeline execution writes every shard's files as blocks
    stream through the sink stage (``concurrent_shards`` is retained for
    backwards compatibility and ignored).  Returns a summary dict with
    per-shard status ('done'|'skipped') and aggregate metrics.
    """
    cfg = config or PipelineConfig()
    chash = config_hash(cfg)
    os.makedirs(out_dir, exist_ok=True)
    _wipe_stale_shards(out_dir, num_shards)
    done = completed_shards(out_dir, num_shards, chash)
    todo = sorted(set(range(num_shards)) - done)

    summary: dict = {"shards": {}, "rows": 0, "errors": 0, "wall_sec": 0.0}
    for shard in done:
        m = read_manifest(out_dir, shard)
        summary["shards"][shard] = "skipped"
        summary["rows"] += m["rows_out"]
        summary["errors"] += m["n_errors"]
    if not todo:
        return summary

    # Wipe crashed partials / stale-config data for every shard we'll redo.
    for shard in todo:
        shutil.rmtree(_shard_dir(out_dir, shard), ignore_errors=True)

    from ..pipelines.extract import extract

    t0 = time.time()
    ds = pages_factory()
    if done:
        done_ids = np.array(sorted(done), dtype=np.int64)
        nsh = num_shards

        def drop_done(t: pa.Table) -> pa.Table:
            mask = ~np.isin(url_shard(t.column("url").to_pylist(), nsh), done_ids)
            return t.filter(pa.array(mask))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    metrics = (
        extract(ds, cfg)
        .map_batches(_ShardSink(out_dir, num_shards), batch_format="pyarrow")
        .to_pandas()  # small: O(shards × routes × tasks) rows
    )
    wall = time.time() - t0

    per_shard_route = (
        metrics.groupby(["shard", "route"])[["n", "errs"]].sum()
        if len(metrics)
        else None
    )
    for shard in todo:
        if per_shard_route is not None and shard in per_shard_route.index.get_level_values(0):
            sl = per_shard_route.loc[shard]
            per_route = {str(r): int(v) for r, v in sl["n"].items()}
            rows_out = int(sl["n"].sum())
            n_errors = int(sl["errs"].sum())
        else:
            per_route, rows_out, n_errors = {}, 0, 0
        sdir = _shard_dir(out_dir, shard)
        os.makedirs(sdir, exist_ok=True)
        manifest = {
            "shard": shard,
            "num_shards": num_shards,
            "config_hash": chash,
            "engine_version": ENGINE_VERSION,
            # extraction is 1 row per input doc, so rows_in == rows_out;
            # recorded separately for sinks where that stops being true
            "rows_in": rows_out,
            "rows_out": rows_out,
            "per_route": per_route,
            "n_errors": n_errors,
            "wall_sec": round(wall, 3),  # wall of the whole pass
        }
        _write_manifest(sdir, manifest)
        summary["shards"][shard] = "done"
        summary["rows"] += rows_out
        summary["errors"] += n_errors
    summary["wall_sec"] = round(wall, 3)
    return summary
