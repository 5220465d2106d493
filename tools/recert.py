"""Full-scale byte-identity re-certification of the flagship extraction.

Generates (or reuses the version-tagged cache of) an N-doc synthetic
corpus, runs the default extraction pipeline end-to-end, and compares
``extracted_text``, ``route`` and ``error`` per url against the
generator's golden truth.  This is the discipline run after EVERY corpus
or kernel change (BASELINE.md records one per change since round 2) —
formalized as a tool so the command is reproducible:

    python tools/recert.py [--docs 120000] [--cpus 32]

Exits non-zero and prints the first mismatching urls if anything drifts.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=120_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from pdf2pdfocr_ray.pipelines.extract import extract
    from pdf2pdfocr_ray.sources.corpus import (
        CORPUS_VERSION,
        write_corpus_parquet_ray,
    )

    path = f"/tmp/graft_bench_corpus_{CORPUS_VERSION}_{args.docs}"
    if not os.path.isdir(path):
        print(f"generating corpus {CORPUS_VERSION} x {args.docs} ...")
        write_corpus_parquet_ray(path, args.docs)

    t0 = time.time()
    res = extract(
        ray.data.read_parquet(
            path, columns=["url", "warc_ts", "html", "text", "lang"],
            override_num_blocks=min(400, max(32, args.docs // 100)),
        )
    ).to_pandas()
    wall = time.time() - t0

    golden = ray.data.read_parquet(
        path, columns=["url", "g_route", "g_text", "g_error"]
    ).to_pandas()
    res = res.sort_values("url").reset_index(drop=True)
    golden = golden.sort_values("url").reset_index(drop=True)
    assert len(res) == len(golden), (len(res), len(golden))

    import pandas as pd

    def col_eq(a, b):
        return (a == b) | (a.isna() & b.isna())

    ok = (
        col_eq(res["extracted_text"], golden["g_text"])
        & col_eq(res["route"], golden["g_route"])
        & col_eq(res["error"], golden["g_error"])
    )
    n_ok = int(ok.sum())
    print(f"recert {CORPUS_VERSION}: {n_ok}/{len(golden)} byte-identical "
          f"(extract wall {wall:.1f}s at {args.cpus} cpus)")
    if n_ok != len(golden):
        bad = golden.loc[~ok, "url"].head(20).tolist()
        print("MISMATCHED urls:", bad)
        for u in bad[:3]:
            i = golden.index[golden["url"] == u][0]
            print("---", u, "route", res["route"][i], "vs", golden["g_route"][i],
                  "error", res["error"][i], "vs", golden["g_error"][i])
            print("  got ", repr(res["extracted_text"][i])[:200])
            print("  want", repr(golden["g_text"][i])[:200])
        return 1
    return 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
