"""Graph operators over edge tables (the web-graph side of a crawl
pipeline: link-based quality priors à la PageRank; connected components
for dedup clusters live in ops/dedup.py).

Edges are a Dataset of (src, dst) int64 rows.  PageRank here is the
honest distributed shape: per iteration, ranks join onto edges by src
(broadcast under the threshold, sort-merge above — `dim_join` decides),
per-edge contributions pre-aggregate map-side, and ONE combine-groupby
sums them per dst.  Dangling mass and the teleport term are scalars.
Per-iteration network cost is O(edges in the SMJ case, nodes in the
broadcast case), never O(nodes * iters) driver memory — node state stays
a Dataset end to end.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def pagerank(
    edges_ds: "ray.data.Dataset",
    damping: float = 0.85,
    iters: int = 20,
    tol: float = 1e-9,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pd.DataFrame:
    """Power-iteration PageRank.  Returns (node, rank) for every node
    appearing as src or dst; ranks sum to 1.  Deterministic.

    Physical plan per iteration (all existing primitives):
      1. broadcast the current rank/out-degree arrays (node state);
      2. per edge batch: contribution = rank[src] / outdeg[src], then
         PRE-AGGREGATE per dst inside the batch (map-side combine);
      3. one sorted_groupby sums contributions per dst;
      4. new rank = teleport + damping * (contrib + dangling/N).
    The EDGE table (the big side) streams every pass and never lands on
    the driver.  Node state is one float per node broadcast via
    ``ray.put`` — sized for graphs whose node table fits a worker
    (~10^8-10^9 nodes at 16 B/node); past that, swap step 1-2 for a
    ``dim_join`` of a rank Dataset onto edges (same groupby after),
    which this module's primitives already support at the cost of a
    second shuffle per iteration.
    """
    import ray

    from .grouped import combined_groupby_agg

    edges = edges_ds.materialize()  # scanned once per iteration

    # node universe + out-degrees (one pass)
    def degree_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(src_col, as_index=False).size()
        out.columns = ["node", "outdeg"]
        dsts = pd.DataFrame({"node": df[dst_col].unique(), "outdeg": 0})
        return pd.concat([out, dsts], ignore_index=True)

    deg = (
        combined_groupby_agg(
            edges.map_batches(degree_partial, batch_format="pandas"),
            "node",
            {"outdeg": ("outdeg", "sum")},
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    nodes = deg["node"].to_numpy(np.int64)
    outdeg = deg["outdeg"].to_numpy(np.float64)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": [], "rank": []})
    rank = np.full(n, 1.0 / n)

    for _ in range(iters):
        dangling = rank[outdeg == 0].sum()
        ref = ray.put((nodes, rank / np.maximum(outdeg, 1.0)))

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            nd, share = ray.get(ref)
            pos = np.searchsorted(nd, df[src_col].to_numpy(np.int64))
            c = share[pos]
            out = pd.DataFrame({"node": df[dst_col].to_numpy(np.int64), "c": c})
            return out.groupby("node", as_index=False)["c"].sum()

        summed = (
            combined_groupby_agg(
                edges.map_batches(contrib, batch_format="pandas"),
                "node",
                {"c": ("c", "sum")},
            )
            .to_pandas()
            .set_index("node")["c"]
        )
        new_rank = np.full(n, (1.0 - damping) / n)
        new_rank += damping * dangling / n
        got = summed.reindex(nodes).fillna(0.0).to_numpy()
        new_rank += damping * got
        shift = np.abs(new_rank - rank).sum()
        rank = new_rank
        if shift < tol:
            break
    return pd.DataFrame({"node": nodes, "rank": rank})
