"""CLI entry point — the reference's §3.1 command-line surface re-expressed
for Parquet corpora (reference argparse: /root/reference/pdf2pdfocr.py:
1413-1491; flag semantics cited per option below).

    python -m pdf2pdfocr_ray -i pages.parquet -o out_dir [flags]

Input: a pages Parquet table (url, warc_ts, html, text, lang).  Output:
checkpointed extracted Parquet (shard=NNNNN/ dirs + _MANIFEST.json lineage)
— the engine's equivalent of the reference's per-file "-OCR.pdf" outputs,
resumable where the reference's safe mode (-s) merely refuses to overwrite.

This is the only module besides bench.py/tests allowed to own a Ray
session (guarded init; the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pdf2pdfocr_ray",
        description="Ray-Data-native document/web extraction engine",
    )
    p.add_argument("-i", "--input", required=True,
                   help="pages Parquet path (file, dir, or glob)")
    p.add_argument("-o", "--output", required=True, help="output directory")
    # reference -c ocr_engine (pdf2pdfocr.py:556-558); beyond the builtins
    # any "external:<module>:<attr>" model adapter or registered engine
    # name is accepted (validated at actor init, T3 fail-fast)
    p.add_argument("-c", "--ocr-engine", default="template",
                   help="template | template_retry | no_ocr | "
                        "external:<module>:<attr> | <registered name>")
    # reference -d deskew percent -> boolean toggle (94-101, 1085-1098)
    p.add_argument("--no-deskew", action="store_true")
    # reference -u autorotate (1038-1083)
    p.add_argument("--no-autorotate", action="store_true")
    # reference -t skip has-text PDFs (1215-1227)
    p.add_argument("-t", "--skip-native-text", action="store_true")
    # reference -a check_protection_mode (1196-1198, 1428-1429): refuse any
    # /Encrypt-bearing PDF even when the empty user password would open it
    p.add_argument("-a", "--check-protection", action="store_true")
    # engine addition: trust native text layer (inverse of
    # --ignore-existing-text, 1104-1111)
    p.add_argument("--prefer-native-text", action="store_true")
    # reference -b max pages (1200-1205)
    p.add_argument("-b", "--max-pages", type=int, default=0)
    # reference --min-kbytes (1207-1213)
    p.add_argument("--min-kbytes", type=float, default=0.0)
    # reference --timeout (1511-1528) at page granularity
    p.add_argument("--timeout", type=float, default=0.0,
                   help="per-page OCR timeout seconds (0 = off)")
    # reference -j parallel percent (527-529) -> actor pool size
    p.add_argument("-j", "--ocr-concurrency", type=int, default=0,
                   help="OCR actor pool size (0 = auto from cluster CPUs)")
    p.add_argument("--shards", type=int, default=8,
                   help="checkpoint shards (resume unit)")
    p.add_argument("--concurrent-shards", type=int, default=1,
                   help="(deprecated no-op: the single-pass checkpoint "
                        "executes all shards concurrently by construction)")
    p.add_argument("--chunk-pages", type=int, default=0,
                   help="two-level assembly chunk size (0 = single level)")
    p.add_argument("--num-cpus", type=int, default=0,
                   help="ray.init num_cpus (0 = let Ray decide)")
    # directory-watch ingest (the reference's unimplemented TODO,
    # pdf2pdfocr.py:722-723): -i is a drop-zone directory of parquet
    # shards; each poll extracts only unseen files into ingest_NNNNN/
    p.add_argument("--input-format", choices=["auto", "parquet", "warc"],
                   default="auto",
                   help="input container: parquet pages table or WARC "
                        "file(s)/dir (auto: by extension)")
    p.add_argument("--wet-output", default="",
                   help="also emit the extracted text as sharded "
                        ".warc.wet.gz (the Common-Crawl WET layout) "
                        "under this directory")
    p.add_argument("--watch", action="store_true",
                   help="poll -i for new *.parquet and ingest incrementally")
    p.add_argument("--watch-poll-sec", type=float, default=2.0)
    p.add_argument("--watch-idle-polls", type=int, default=0,
                   help="exit after N consecutive empty polls (0 = one "
                        "catch-up scan then exit)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    try:
        import ray.data

        from .config import PipelineConfig
        from .state.checkpoint import run_checkpointed

        cfg = PipelineConfig(
            min_kbytes=args.min_kbytes,
            max_pages=args.max_pages,
            skip_native_text=args.skip_native_text,
            check_protection=args.check_protection,
            prefer_native_text=args.prefer_native_text,
            deskew=not args.no_deskew,
            autorotate=not args.no_autorotate,
            ocr_engine=args.ocr_engine,
            ocr_timeout_s=args.timeout,
            ocr_concurrency=args.ocr_concurrency or None,
            assembly_chunk_pages=args.chunk_pages,
        )

        if args.watch:
            from .state.watch import watch_ingest

            ledger = watch_ingest(
                args.input, args.output, config=cfg,
                num_shards=args.shards, poll_s=args.watch_poll_sec,
                max_idle_polls=args.watch_idle_polls,
            )
            print(json.dumps(ledger))
            errs = sum(b["errors"] for b in ledger["batches"])
            return 0 if errs == 0 else 1

        fmt = args.input_format
        if fmt == "auto":
            fmt = ("warc"
                   if args.input.rstrip("/").endswith((".warc", ".warc.gz"))
                   else "parquet")

        def factory():
            if fmt == "warc":
                from .sources.warc import read_warc

                return read_warc(args.input)
            return ray.data.read_parquet(args.input)

        summary = run_checkpointed(
            factory, args.output, config=cfg, num_shards=args.shards,
            concurrent_shards=args.concurrent_shards,
        )
        if args.wet_output:
            from .sources.wet import write_wet

            summary["wet_records"] = write_wet(
                ray.data.read_parquet(args.output), args.wet_output)
        print(json.dumps(summary))
        return 0 if summary["errors"] == 0 else 1
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
