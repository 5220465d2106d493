"""Checkpointed, resumable extraction output with per-partition lineage.

The reference's only resume mechanism is safe-mode "skip if output file
exists" (/root/reference/pdf2pdfocr.py:1161-1167).  The engine generalizes
it to the north_rule requirement: deterministic output partitioning +
per-partition lineage manifests + exact resume (SURVEY.md §4.2 J4 row).

Layout::

    out_dir/
      shard=00000/           <- one url-hash shard of the corpus
        *.parquet            <- extracted rows for that shard
        _MANIFEST.json       <- written atomically AFTER the shard's data
      shard=00001/...

A shard is the unit of atomicity: its manifest is written (tmp + rename)
only after ``write_parquet`` for the shard returns, so a crash mid-shard
leaves a manifest-less directory that the next run wipes and redoes.
Resume = skip every shard whose manifest exists AND whose ``config_hash``
matches (a config change invalidates everything it would alter).

Sharding key: ``crc32(url) % num_shards`` — stable across processes and
runs (unlike Python's salted ``hash``), cheap, and the SAME key the
re-assembly groupby uses, so one partitioning scheme serves both
(SURVEY.md "pick ONE partitioning key").  At cluster scale the input
corpus would be laid out pre-partitioned by this key so each shard read
touches one input slice; here each shard filters at the read
(predicate-inside-map_batches, zero-copy).

The manifest records lineage + metrics: config hash, engine version, input
row count, output rows, per-route counts, error count, wall seconds.
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

ENGINE_VERSION = "pdf2pdfocr_ray-r1"
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
    with open(path) as f:
        return json.load(f)


def completed_shards(out_dir: str, num_shards: int, cfg_hash: str) -> set[int]:
    done = set()
    for s in range(num_shards):
        m = read_manifest(out_dir, s)
        if m is not None and m.get("config_hash") == cfg_hash:
            done.add(s)
    return done


def _run_one_shard(
    pages_factory: Callable[[], "ray.data.Dataset"],  # noqa: F821
    out_dir: str,
    shard: int,
    num_shards: int,
    cfg: PipelineConfig,
    chash: str,
) -> dict:
    """Execute one shard end-to-end and publish its manifest atomically."""
    from ..pipelines.extract import extract

    sdir = _shard_dir(out_dir, shard)
    shutil.rmtree(sdir, ignore_errors=True)  # wipe a crashed partial
    t0 = time.time()

    def keep_shard(t: pa.Table, _shard: int = shard) -> pa.Table:
        mask = url_shard(t.column("url").to_pylist(), num_shards) == _shard
        return t.filter(pa.array(mask))

    ds = pages_factory().map_batches(keep_shard, batch_format="pyarrow")
    res = extract(ds, cfg)
    res.write_parquet(sdir)

    # Lineage metrics from the written output (what actually landed).
    import ray.data

    out_ds = ray.data.read_parquet(sdir)
    rows_out = out_ds.count()

    def route_counts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        routes = t.column("route")
        errs = pc.sum(pc.cast(pc.is_valid(t.column("error")), pa.int64())).as_py()
        vals, counts = np.unique(
            np.asarray(routes.to_pylist(), dtype=object), return_counts=True
        )
        return pa.table(
            {
                "route": pa.array([str(v) for v in vals]),
                "n": pa.array(counts, pa.int64()),
                "errs": pa.array([errs] * len(vals), pa.int64()),
            }
        )

    rc = out_ds.map_batches(route_counts, batch_format="pyarrow").to_pandas()
    per_route = rc.groupby("route")["n"].sum().to_dict()
    n_errors = int(rc.groupby("route")["errs"].first().sum()) if len(rc) else 0
    wall = time.time() - t0

    manifest = {
        "shard": shard,
        "num_shards": num_shards,
        "config_hash": chash,
        "engine_version": ENGINE_VERSION,
        # extraction is 1 row per input doc, so rows_in == rows_out;
        # recorded separately for sinks where that stops being true
        "rows_in": rows_out,
        "rows_out": rows_out,
        "per_route": {str(k): int(v) for k, v in per_route.items()},
        "n_errors": n_errors,
        "wall_sec": round(wall, 3),
    }
    _write_manifest(sdir, manifest)
    return manifest


def run_checkpointed(
    pages_factory: Callable[[], "ray.data.Dataset"],  # noqa: F821
    out_dir: str,
    config: PipelineConfig | None = None,
    num_shards: int = 8,
    concurrent_shards: int = 1,
) -> dict:
    """Extract the corpus shard-by-shard with exact resume.

    ``pages_factory`` returns a fresh lazy pages Dataset per call (a read,
    not a materialized object — each shard execution re-reads and filters,
    keeping per-shard memory bounded).  ``concurrent_shards`` > 1 drives
    that many shard Datasets concurrently from driver threads (Ray Data
    executions are independent; atomicity is untouched — each shard still
    publishes its own manifest after its own write).  When running shards
    concurrently, set ``config.ocr_concurrency`` explicitly so the pools
    share the cluster (auto-sizing would demand ~full width per shard and
    the pools would pend against each other).  Returns a summary
    dict with per-shard status ('done'|'skipped') and aggregate metrics.
    """
    cfg = config or PipelineConfig()
    chash = config_hash(cfg)
    os.makedirs(out_dir, exist_ok=True)
    done = completed_shards(out_dir, num_shards, chash)

    summary: dict = {"shards": {}, "rows": 0, "errors": 0, "wall_sec": 0.0}
    todo = []
    for shard in range(num_shards):
        if shard in done:
            m = read_manifest(out_dir, shard)
            summary["shards"][shard] = "skipped"
            summary["rows"] += m["rows_out"]
            summary["errors"] += m["n_errors"]
        else:
            todo.append(shard)

    if concurrent_shards <= 1:
        results = [
            _run_one_shard(pages_factory, out_dir, s, num_shards, cfg, chash)
            for s in todo
        ]
    else:
        from concurrent.futures import ThreadPoolExecutor

        # Ray's path resolution tries `from fsspec.implementations.http
        # import HTTPFileSystem` on every write and catches only
        # ModuleNotFoundError (missing aiohttp).  The failed module is
        # evicted from sys.modules each time, so two driver threads can
        # race the re-import: one sees the partially-initialized module
        # and dies with a plain ImportError that escapes Ray's fallback.
        # Fix: if the import can never succeed here, register a sentinel
        # module once so later imports are deterministic no-ops (the
        # sentinel class matches no real filesystem instance).
        try:
            from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        except ModuleNotFoundError:
            import sys as _sys
            import types as _types

            _stub = _types.ModuleType("fsspec.implementations.http")

            class _SentinelHTTPFileSystem:  # pragma: no cover — never built
                pass

            _stub.HTTPFileSystem = _SentinelHTTPFileSystem
            _sys.modules["fsspec.implementations.http"] = _stub
        except ImportError:
            pass  # partially-imported by another thread; already resolved

        with ThreadPoolExecutor(max_workers=concurrent_shards) as pool:
            results = list(
                pool.map(
                    lambda s: _run_one_shard(
                        pages_factory, out_dir, s, num_shards, cfg, chash
                    ),
                    todo,
                )
            )
    for m in results:
        summary["shards"][m["shard"]] = "done"
        summary["rows"] += m["rows_out"]
        summary["errors"] += m["n_errors"]
        summary["wall_sec"] += m["wall_sec"]
    return summary
