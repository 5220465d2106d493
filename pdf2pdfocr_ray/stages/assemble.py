"""A3 — document re-assembly: the pipeline's single wide (shuffle) stage.

Reference: per-page artifacts gathered by sorted glob in one temp dir and
concatenated in filename order (/root/reference/pdf2pdfocr.py:928-956, order
guarantee O1 at 707/840/931/944) — the only ordering guarantee in the
reference system.  Ray mapping: shuffle on ``url``, sort the group by the
explicit ``page_no`` column, concatenate page texts with NO separator bytes
(byte-identical invariant, reference 928-940: raw byte concat), carry
doc-level fields from the first row.

Physical plan (why not ``groupby('url').map_groups``): map_groups dispatches
the UDF once per group — per-group pandas-frame construction dominated the
shuffle wall time (measured 9s for 2k groups vs 0.4s vectorized).  Instead:

1. ``repartition(P)`` — coalesce the many small post-OCR blocks (one per
   OCR batch) so the sort shuffles P blocks, not hundreds; P defaults to
   the cluster CPU count and is the knob that bounds per-task group size
   at 10^12-row scale (``PipelineConfig.shuffle_partitions``).
2. ``sort('url')`` — Ray's range shuffle; equal keys never split across
   output blocks (the same contract ``map_groups`` itself relies on via
   its batch_size=None block-level UDF application).
3. one **vectorized** pandas groupby-agg per block: sort by (url, page_no),
   ``''.join`` texts per url, first-row doc fields.

Scale notes: the shuffle payload is page TEXT plus small ints (images were
dropped by the OCR stage), so a 10k-page skewed doc shuffles ~10k small
strings, not ~10k images.  Blank pages contribute "" (reference
255-264/993-997).  A doc-level error (encrypted/corrupt/guard) is a 1-row
group that passes through with null text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

EXTRACTED_COLUMNS = ["url", "warc_ts", "route", "extracted_text", "n_pages", "error"]


def _assemble_block(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized assembly of ALL url-groups in one sorted block."""
    if len(df) == 0:
        return pd.DataFrame(
            {
                "url": pd.Series([], dtype="object"),
                "warc_ts": pd.Series([], dtype="datetime64[us]"),
                "route": pd.Series([], dtype="object"),
                "extracted_text": pd.Series([], dtype="object"),
                "n_pages": pd.Series([], dtype="int32"),
                "error": pd.Series([], dtype="object"),
            }
        )
    df = df.sort_values(["url", "page_no"], kind="stable")
    g = df.groupby("url", sort=True)
    firsts = g.agg(
        warc_ts=("warc_ts", "first"),
        route=("route", "first"),
        n_pages=("n_pages", "first"),
        error=("error", "first"),
    )
    # Byte-identical invariant: raw concat of page texts in page_no order,
    # no separator (reference pdf2pdfocr.py:928-940).
    texts = g["page_text"].agg(
        lambda s: "".join(t for t in s if isinstance(t, str))
    )
    err = firsts["error"].to_numpy(dtype=object)
    has_err = np.array([isinstance(e, str) for e in err])
    text_vals = texts.to_numpy(dtype=object)
    text_vals[has_err] = None
    err[~has_err] = None
    out = pd.DataFrame(
        {
            "url": firsts.index.to_numpy(dtype=object),
            "warc_ts": firsts["warc_ts"].to_numpy(),
            "route": firsts["route"].to_numpy(dtype=object),
            "extracted_text": text_vals,
            "n_pages": firsts["n_pages"].to_numpy(dtype="int32"),
            "error": err,
        }
    )
    if "spans" in df.columns:
        # Doc-level span list: page span lists concatenated in page order
        # (SURVEY.md §1.2 optional `spans` column of the extracted table).
        spans = g["spans"].agg(
            lambda s: [sp for page in s if page is not None for sp in page]
        )
        out["spans"] = spans.to_numpy(dtype=object)
    return out


# Kept for callers/tests that assemble one group at a time.
def _assemble_group(group: pd.DataFrame) -> pd.DataFrame:
    return _assemble_block(group)


def reassemble_two_level(
    page_ds: "ray.data.Dataset",
    chunk_pages: int = 256,
    shuffle_partitions: int = 0,
) -> "ray.data.Dataset":
    """Range-salted re-assembly for HOT urls (a 10k-page doc whose text
    exceeds one reducer's comfort): level 1 groups by
    ``(url, page_no // chunk_pages)`` — contiguous page ranges, so a giant
    doc's concat work spreads over ~n_pages/chunk_pages reducers — and
    level 2 merges the per-chunk partial strings in chunk order.  Because
    the salt is a RANGE of the ordering key, partial concats merge back
    byte-identically (an arbitrary hash salt could not preserve order).
    Output is byte-identical to :func:`reassemble`.
    """
    from ..ops.grouped import sorted_groupby

    def add_chunk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__chunk"] = (df["page_no"] // chunk_pages).astype("int64")
        return df

    def partial_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "__chunk", "page_no"], kind="stable")
        g = df.groupby(["url", "__chunk"], sort=True)
        firsts = g.agg(
            warc_ts=("warc_ts", "first"),
            route=("route", "first"),
            n_pages=("n_pages", "first"),
            error=("error", "first"),
        )
        texts = g["page_text"].agg(
            lambda s: "".join(t for t in s if isinstance(t, str))
        )
        out = firsts.reset_index()
        out["partial_text"] = texts.to_numpy(dtype=object)
        return out

    def final_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "__chunk"], kind="stable")
        g = df.groupby("url", sort=True)
        firsts = g.agg(
            warc_ts=("warc_ts", "first"),
            route=("route", "first"),
            n_pages=("n_pages", "first"),
            error=("error", "first"),
        )
        texts = g["partial_text"].agg(
            lambda s: "".join(t for t in s if isinstance(t, str))
        )
        err = firsts["error"].to_numpy(dtype=object)
        has_err = np.array([isinstance(e, str) for e in err])
        text_vals = texts.to_numpy(dtype=object)
        text_vals[has_err] = None
        err[~has_err] = None
        return pd.DataFrame(
            {
                "url": firsts.index.to_numpy(dtype=object),
                "warc_ts": firsts["warc_ts"].to_numpy(),
                "route": firsts["route"].to_numpy(dtype=object),
                "extracted_text": text_vals,
                "n_pages": firsts["n_pages"].to_numpy(dtype="int32"),
                "error": err,
            }
        )

    chunked = page_ds.map_batches(add_chunk, batch_format="pandas")
    partials = sorted_groupby(
        chunked, ["url", "__chunk"], partial_block, partitions=shuffle_partitions
    )
    return sorted_groupby(partials, "url", final_block, partitions=shuffle_partitions)


def reassemble(
    page_ds: "ray.data.Dataset", shuffle_partitions: int = 0
) -> "ray.data.Dataset":
    """page-OCR rows -> one extracted row per url (see module docstring).

    ``shuffle_partitions``: number of post-shuffle blocks (0 = cluster CPU
    count).  At scale, pick so one partition's text fits a worker heap.
    """
    if shuffle_partitions <= 0:
        import ray

        shuffle_partitions = (
            int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        )
    return (
        page_ds.repartition(shuffle_partitions)
        .sort("url")
        .map_batches(_assemble_block, batch_format="pandas", batch_size=None)
    )
