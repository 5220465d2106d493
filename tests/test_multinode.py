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


def test_flagship_byte_identical_across_two_nodes(tmp_path):
    script = _SCRIPT.replace(
        "SF_DIR_PLACEHOLDER", repr(str(tmp_path / "corpus"))
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MULTINODE_OK" in proc.stdout
