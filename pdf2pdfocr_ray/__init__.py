"""pdf2pdfocr_ray: Ray-Data-native web/document extraction + curation.

Intentionally empty: every module lazy-imports so the driver-contract
surface (__ray_entry__) imports in ~20 ms — an import-time failure in
any one operator module must never take down the whole registry (the
round-2 correctness-gate lesson).  Import operators from their modules:
``from pdf2pdfocr_ray.ops.dedup import dedup_minhash_lsh`` etc.
"""
