"""Multi-NODE correctness: the flagship output is byte-identical when the
pipeline spans raylet boundaries (real inter-node object transfer, OCR
actors spread across nodes, the assemble shuffle crossing nodes).

Runs in a SUBPROCESS because ray.cluster_utils needs its own Ray
lifecycle and the suite holds a session-scoped local ray.init.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import ray
from ray.cluster_utils import Cluster

c = Cluster()
c.add_node(num_cpus=2, object_store_memory=1 << 30, include_dashboard=False)
c.add_node(num_cpus=2, object_store_memory=1 << 30)
ray.init(address=c.address, logging_level="ERROR")
assert len([n for n in ray.nodes() if n["Alive"]]) == 2

import ray.data

ray.data.DataContext.get_current().enable_progress_bars = False

from pdf2pdfocr_ray.pipelines.extract import extract
from pdf2pdfocr_ray.sources.corpus import write_corpus_parquet_ray

path = SF_DIR_PLACEHOLDER
write_corpus_parquet_ray(path, 800)
res = (
    extract(
        ray.data.read_parquet(
            path,
            columns=["url", "warc_ts", "html", "text", "lang"],
            override_num_blocks=16,
        )
    )
    .to_pandas()
    .sort_values("url")
    .reset_index(drop=True)
)
golden = (
    ray.data.read_parquet(path, columns=["url", "g_route", "g_text", "g_error"])
    .to_pandas()
    .sort_values("url")
    .reset_index(drop=True)
)
assert len(res) == 800, len(res)


def col_eq(a, b):
    return (a == b) | (a.isna() & b.isna())


ok = (
    col_eq(res["extracted_text"], golden["g_text"])
    & col_eq(res["route"], golden["g_route"])
    & col_eq(res["error"], golden["g_error"])
)
assert int(ok.sum()) == 800, res["url"][~ok].head(3).tolist()
ray.shutdown()
c.shutdown()
print("MULTINODE_OK")
"""


def _run_cluster_script(template: str, tmp_path, marker: str,
                        timeout: int) -> None:
    """Run a cluster_utils scenario in a subprocess, retrying ONCE on the
    tracebackless hard driver exit Ray 2.49 occasionally suffers around
    abrupt raylet lifecycle events (~8% of runs; the actor-restart issue
    its own core_worker log references).  Any in-script assertion (a
    Python traceback in stderr) fails immediately — only infrastructure
    deaths retry, so a real regression still fails the test."""
    for attempt in (1, 2):
        script = template.replace(
            "SF_DIR_PLACEHOLDER", repr(str(tmp_path / f"corpus{attempt}"))
        )
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        if proc.returncode == 0 and marker in proc.stdout:
            return
        # OUR script's assertions traceback through File "<string>"
        # frames; Ray-internal background threads (stats actor, GCS
        # client) also print tracebacks on infra death — those retry
        assert 'File "<string>"' not in proc.stderr, proc.stderr[-2000:]
    raise AssertionError(
        f"cluster run failed twice: rc={proc.returncode}\n" + proc.stderr[-1500:]
    )


def test_flagship_byte_identical_across_two_nodes(tmp_path):
    _run_cluster_script(_SCRIPT, tmp_path, "MULTINODE_OK", timeout=300)


_NODE_LOSS_SCRIPT = r"""
import threading, time

import ray
from ray.cluster_utils import Cluster

c = Cluster()
c.add_node(num_cpus=2, object_store_memory=1 << 30, include_dashboard=False)
c.add_node(num_cpus=2, object_store_memory=1 << 30)
victim = c.add_node(num_cpus=2, object_store_memory=1 << 30)
ray.init(address=c.address, logging_level="ERROR")

import ray.data

ray.data.DataContext.get_current().enable_progress_bars = False

from pdf2pdfocr_ray.pipelines.extract import extract
from pdf2pdfocr_ray.sources.corpus import write_corpus_parquet_ray

path = SF_DIR_PLACEHOLDER
write_corpus_parquet_ray(path, 1200)

res = {}


def run():
    try:
        res["df"] = (
            extract(
                ray.data.read_parquet(
                    path,
                    columns=["url", "warc_ts", "html", "text", "lang"],
                    override_num_blocks=24,
                )
            )
            .to_pandas()
        )
    except Exception as e:
        res["err"] = repr(e)[:400]


th = threading.Thread(target=run)
th.start()
time.sleep(2.0)
assert th.is_alive(), "run finished before the node was removed"
c.remove_node(victim)  # hard loss of a worker node mid-extraction
th.join(timeout=240)
assert not th.is_alive(), "pipeline hung after node loss"
assert "err" not in res, res.get("err")

df = res["df"].sort_values("url").reset_index(drop=True)
golden = (
    ray.data.read_parquet(path, columns=["url", "g_route", "g_text", "g_error"])
    .to_pandas()
    .sort_values("url")
    .reset_index(drop=True)
)
assert len(df) == 1200, len(df)


def col_eq(a, b):
    return (a == b) | (a.isna() & b.isna())


ok = (
    col_eq(df["extracted_text"], golden["g_text"])
    & col_eq(df["route"], golden["g_route"])
    & col_eq(df["error"], golden["g_error"])
)
assert int(ok.sum()) == 1200, df["url"][~ok].head(3).tolist()
print("NODELOSS_OK", flush=True)
import os

os._exit(0)  # cluster shutdown can hang after a hard node removal;
             # the assertions above are the test
"""


def test_flagship_survives_node_loss(tmp_path):
    """Hard loss of a worker NODE mid-extraction (the routine failure on
    a 256-node cluster): Ray reschedules the lost OCR actors onto the
    surviving nodes and re-executes their in-flight tasks from lineage;
    output stays complete and byte-identical.

    Driver-level infrastructure death retries once (see
    _run_cluster_script) — that failure mode is what the engine's
    checkpoint resume covers, not the in-run recovery under test."""
    _run_cluster_script(_NODE_LOSS_SCRIPT, tmp_path, "NODELOSS_OK",
                        timeout=420)
