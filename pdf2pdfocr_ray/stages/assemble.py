"""A3 — document re-assembly: the pipeline's single wide (shuffle) stage.

Reference: per-page artifacts gathered by sorted glob in one temp dir and
concatenated in filename order (/root/reference/pdf2pdfocr.py:928-956, order
guarantee O1 at 707/840/931/944) — the only ordering guarantee in the
reference system.  Ray mapping: ``groupby('url').map_groups``: sort the
group by the explicit ``page_no`` column, concatenate page texts with NO
separator bytes (byte-identical invariant, reference 928-940: raw byte
concat), carry doc-level fields from the first row.

Scale notes: the shuffle key is ``url``; payload per row is page TEXT plus
small ints (images were dropped by the OCR stage), so a 10k-page skewed doc
shuffles ~10k small strings, not ~10k images.  Blank pages contribute ""
(reference 255-264/993-997).  A doc-level error (encrypted/corrupt/guard)
is a 1-row group that passes through with null text.
"""

from __future__ import annotations

import pandas as pd

import ray.data

EXTRACTED_COLUMNS = ["url", "warc_ts", "route", "extracted_text", "n_pages", "error"]


def _assemble_group(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("page_no")
    first = g.iloc[0]
    error = first["error"]
    if pd.isna(error):
        error = None
        text = "".join(t for t in g["page_text"] if t is not None and t == t)
    else:
        text = None
    return pd.DataFrame(
        {
            "url": [first["url"]],
            "warc_ts": [first["warc_ts"]],
            "route": [first["route"]],
            "extracted_text": [text],
            "n_pages": [int(first["n_pages"])],
            "error": [error],
        }
    )


def reassemble(page_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """page-OCR rows -> one extracted row per url (see module docstring)."""
    return page_ds.groupby("url").map_groups(_assemble_group, batch_format="pandas")
