"""Worker-failure fault tolerance of the flagship pipeline.

At 100 TB on a 256-node cluster, OCR actor processes WILL die (OOM
kills, node preemption).  Ray restarts the actor and re-executes the
failed tasks from lineage; the output must stay complete and
byte-identical — not short, not duplicated, not error-padded.  This
test SIGKILLs a live OCR map-worker process mid-run and compares the
result against the corpus generator's golden truth (the recert
comparison, tools/recert.py).
"""

from __future__ import annotations

import os
import signal
import threading
import time


def test_flagship_survives_ocr_actor_death(ray_session, tmp_path):
    import ray
    import ray.data

    from pdf2pdfocr_ray.pipelines.extract import extract
    from pdf2pdfocr_ray.sources.corpus import write_corpus_parquet_ray

    n_docs = 2000
    path = str(tmp_path / "corpus")
    write_corpus_parquet_ray(path, n_docs)

    result: dict = {}

    def run() -> None:
        try:
            result["df"] = extract(
                ray.data.read_parquet(
                    path,
                    columns=["url", "warc_ts", "html", "text", "lang"],
                    override_num_blocks=32,
                )
            ).to_pandas()
        except Exception as e:  # pragma: no cover - surfaced by asserts
            result["err"] = e

    th = threading.Thread(target=run)
    th.start()

    # SIGKILL the first live OCR map-worker actor process we see — an
    # abrupt worker death (OOM-killer semantics), not a clean exception.
    # The GCS actor table (ray._private.state.actors) is used because
    # ray.util.state needs the dashboard, which is off per driver rules.
    killed_pid = None
    deadline = time.time() + 90
    while killed_pid is None and th.is_alive() and time.time() < deadline:
        for a in ray._private.state.actors().values():
            if (
                "OcrStage" in str(a.get("ActorClassName", ""))
                and a.get("State") == "ALIVE"
                and a.get("Pid")
            ):
                os.kill(a["Pid"], signal.SIGKILL)
                killed_pid = a["Pid"]
                break
        time.sleep(0.02)

    th.join(timeout=300)
    assert not th.is_alive(), "pipeline hung after actor death"
    assert killed_pid is not None, (
        "no OCR actor observed alive before the run finished — grow "
        "n_docs so the kill window exists"
    )
    assert "err" not in result, f"pipeline failed instead of retrying: {result.get('err')}"

    res = result["df"].sort_values("url").reset_index(drop=True)
    golden = (
        ray.data.read_parquet(path, columns=["url", "g_route", "g_text", "g_error"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(res) == n_docs, (len(res), n_docs)

    def col_eq(a, b):
        return (a == b) | (a.isna() & b.isna())

    ok = (
        col_eq(res["extracted_text"], golden["g_text"])
        & col_eq(res["route"], golden["g_route"])
        & col_eq(res["error"], golden["g_error"])
    )
    assert int(ok.sum()) == n_docs, (
        f"{n_docs - int(ok.sum())} rows diverged after actor restart; "
        f"first: {res['url'][~ok].head(3).tolist()}"
    )
