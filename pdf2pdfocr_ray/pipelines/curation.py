"""End-to-end training-data curation pipeline as a LIBRARY surface (the
composition `__ray_entry__`'s curation_pipeline query pins):

    normalize -> language filter -> quality gate -> repetition gate ->
    PII scrub -> exact dedup -> near-dup purge (MinHash-LSH ->
    connected components -> representatives) -> train/test split.

Design: ONE annotation pass emits flags (filtering mid-chain would
re-execute the lazy prefix per stage); the annotated table is
materialized once as the pipeline's natural checkpoint (at 100 TB this
is a ``write_parquet`` boundary); the only other pinned dataset is the
tiny near-dup pair set.  All signal stages are actor pools sized by
``stage_pool()``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:
    import ray.data


def curate(
    ds: "ray.data.Dataset",
    lang: str = "en",
    minhash_threshold: float = 0.6,
    test_permille: int = 100,
    max_top_bigram_frac: float = 0.2,
    max_dup_5gram_frac: float = 0.3,
) -> tuple["ray.data.Dataset", dict]:
    """Curate a (doc_id, text, lang) Dataset.  Returns (final_ds, stats):
    final_ds has columns (doc_id, text, split); stats carries the
    per-stage surviving counts (monotone — asserted)."""
    import ray

    from ..ops.dedup import connected_components, dedup_exact, dedup_minhash_lsh
    from ..ops.grouped import stage_pool
    from ..ops.text_analysis import (
        LangId,
        QualityScorer,
        add_normalize_text,
        hash_split,
        repetition_signals,
        scrub_pii,
    )

    n_total = ds.count()
    norm = add_normalize_text(ds).map_batches(
        lambda df: df.assign(text=df["text_norm"]).drop(
            columns=["text_norm", "n_chars_norm"]
        ),
        batch_format="pandas",
    )
    annotated = (
        norm.map_batches(LangId, batch_format="pandas", concurrency=stage_pool())
        .map_batches(QualityScorer, batch_format="pandas",
                     concurrency=stage_pool())
        .map_batches(repetition_signals, batch_format="pandas")
        .map_batches(scrub_pii, batch_format="pandas")
        .map_batches(
            lambda df, _lang=lang: pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "text": df["text_scrubbed"],
                    "lang_ok": df["lang_pred"] == _lang,
                    "qual_ok": df["is_quality"].astype(bool),
                    "rep_ok": (df["top_bigram_frac"] < max_top_bigram_frac)
                    & (df["dup_5gram_frac"] < max_dup_5gram_frac),
                }
            ),
            batch_format="pandas",
        )
        .materialize()
    )
    n_lang = annotated.map_batches(
        lambda t: t.filter(t["lang_ok"]), batch_format="pyarrow"
    ).count()
    eligible = annotated.map_batches(
        lambda t: t.filter(
            pc.and_(pc.and_(t["lang_ok"], t["qual_ok"]), t["rep_ok"])
        ),
        batch_format="pyarrow",
    ).select_columns(["doc_id", "text"])

    uniq = dedup_exact(eligible).materialize()
    n_exact = uniq.count()
    pairs = dedup_minhash_lsh(uniq, threshold=minhash_threshold)
    clusters = connected_components(pairs).to_pandas()
    # empty-frame guard: Ray drops column metadata on an empty to_pandas
    removed = (
        set(clusters.loc[clusters["node"] != clusters["cluster_id"], "node"])
        if len(clusters)
        else set()
    )
    rm_ref = ray.put(pa.array(sorted(removed), pa.int64()))

    def purge(t: pa.Table) -> pa.Table:
        rm = ray.get(rm_ref)
        if len(rm) == 0:
            return t
        return t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=rm)))

    final = hash_split(
        uniq.map_batches(purge, batch_format="pyarrow"),
        test_permille=test_permille,
    )
    stats = {
        "n_docs": n_total,
        "n_lang": n_lang,
        "n_after_exact_dedup": n_exact,
        "n_near_dup_removed": len(removed),
    }
    assert n_total >= n_lang >= n_exact
    return final, stats
