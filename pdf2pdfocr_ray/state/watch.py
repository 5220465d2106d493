"""Directory-watch incremental ingest — the reference's unimplemented
"watch mode" TODO (reference /root/reference/pdf2pdfocr.py:722-723) made
real on the checkpointed runner.

A watch loop polls an input directory for NEW ``*.parquet`` shards (a
crawl drop-zone): each poll diffs the directory listing against a
persistent ledger (``_WATCH_LEDGER.json``, written atomically) and runs
one checkpointed extraction batch over only the unseen files, into its
own ``ingest_NNNNN/`` sub-directory of the output.  Every batch is
itself sharded + manifested (state/checkpoint.py), so a crash mid-batch
resumes exactly; a file is ledgered only AFTER its batch completes, so
a crash between batch and ledger write re-processes that batch into the
same ingest dir (idempotent: the shard wipe in run_checkpointed clears
partials).

Scale shape: the poll is a single directory listing; each batch is one
streaming pipeline over only the new bytes.  At cluster scale the
drop-zone is an object-store prefix and the ledger lives next to the
output manifests on shared storage.
"""

from __future__ import annotations

import json
import os
import time
from typing import TYPE_CHECKING, Callable

from ..config import PipelineConfig
from .checkpoint import run_checkpointed

if TYPE_CHECKING:
    pass

_LEDGER = "_WATCH_LEDGER.json"


def _ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, _LEDGER)


def read_ledger(out_dir: str) -> dict:
    path = _ledger_path(out_dir)
    if not os.path.exists(path):
        return {"batches": [], "files": {}}
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, UnicodeDecodeError) as e:
        # Unlike a shard manifest (safe to re-run), a lost ledger cannot be
        # guessed: treating it as empty would re-map old files onto batch
        # dirs that already hold manifests for a DIFFERENT file set, and
        # those batches would then be silently skipped.  Fail loudly.
        raise ValueError(
            f"watch ledger corrupt: {path}: {e}; restore it from backup or "
            "clear the output directory to re-ingest from scratch"
        ) from e


def _write_ledger(out_dir: str, ledger: dict) -> None:
    path = _ledger_path(out_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic publish, same as shard manifests


def _scan(input_dir: str) -> list[str]:
    return sorted(
        os.path.join(input_dir, name)
        for name in os.listdir(input_dir)
        if name.endswith(".parquet")
    )


def watch_ingest(
    input_dir: str,
    out_dir: str,
    config: PipelineConfig | None = None,
    num_shards: int = 4,
    poll_s: float = 2.0,
    max_idle_polls: int = 0,
    stop_file: str | None = None,
    on_batch: Callable[[dict], None] | None = None,
) -> dict:
    """Poll ``input_dir`` for new parquet shards and extract each wave
    incrementally.  Exits after ``max_idle_polls`` consecutive polls with
    no new files (0 = run one scan and exit — the "catch up then stop"
    mode), or when ``stop_file`` appears.  Returns the final ledger."""
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    idle = 0
    while True:
        ledger = read_ledger(out_dir)
        new = [p for p in _scan(input_dir) if p not in ledger["files"]]
        if new:
            idle = 0
            batch_no = len(ledger["batches"])
            batch_dir = os.path.join(out_dir, f"ingest_{batch_no:05d}")

            def factory(paths=tuple(new)):
                return ray.data.read_parquet(list(paths))

            summary = run_checkpointed(
                factory, batch_dir, config=config, num_shards=num_shards
            )
            entry = {
                "batch": batch_no,
                "dir": batch_dir,
                "files": new,
                "rows": summary["rows"],
                "errors": summary["errors"],
            }
            ledger["batches"].append(entry)
            for p in new:
                ledger["files"][p] = batch_no
            _write_ledger(out_dir, ledger)  # only after the batch is durable
            if on_batch is not None:
                on_batch(entry)
            continue  # immediately re-scan: more files may have landed
        idle += 1
        if stop_file and os.path.exists(stop_file):
            return read_ledger(out_dir)
        if idle > max_idle_polls:
            return read_ledger(out_dir)
        time.sleep(poll_s)
