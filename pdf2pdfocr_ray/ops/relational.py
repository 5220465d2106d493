"""Relational operators over the driver's TPC-H-ish tables, expressed
Ray-Data-first.  These are the SQL-oracle-checkable surface of the engine
(each has a DuckDB-equivalent query in ``__ray_entry__.oracle_sql``):
vectorized filters, grouped aggregates with batch-level pre-aggregation,
group-sort-concat (the A3 re-assembly shape), top-k, broadcast semi-join,
broadcast dimension join, and windowed aggregates.

Scale notes are per function; the recurring ones: predicates run inside
``map_batches`` on Arrow (not ``ds.filter(row_fn)``); small sides broadcast
via ``ray.put``; pre-aggregation shrinks shuffle input to ~groups/batch.
"""

from __future__ import annotations

import datetime
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:
    import ray.data


def read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# --------------------------------------------------------------- F1/F2 filter
def doc_filter(sf_dir: str) -> "ray.data.Dataset":
    """documents with n_chars >= 500 and lang = 'en' (min-size guard analog,
    reference pdf2pdfocr.py:1207-1213). Arrow predicate inside map_batches."""
    ds = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["n_chars"], 500), pc.equal(t["lang"], "en"))
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------- grouped agg w/ pre-agg
def doc_stats(sf_dir: str) -> "ray.data.Dataset":
    """count/sum/min/max of n_chars per (lang, source).

    Pre-aggregates inside map_batches (one row per key per batch) before the
    shuffle, so it moves ~|keys|·|batches| rows, not |rows|; the final merge
    is a vectorized sorted_groupby block (see ops/grouped.py)."""
    from .grouped import sorted_groupby

    ds = read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["lang", "source"], as_index=False).agg(
            pn=("n_chars", "size"),
            ps=("n_chars", "sum"),
            pmin=("n_chars", "min"),
            pmax=("n_chars", "max"),
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("pn", "sum"),
            sum_chars=("ps", "sum"),
            min_chars=("pmin", "min"),
            max_chars=("pmax", "max"),
        )

    return sorted_groupby(
        ds.map_batches(partial, batch_format="pandas"), ["lang", "source"], final
    )


# ------------------------------------------- group-sort-concat (A3 shape)
def group_concat_events(sf_dir: str) -> "ray.data.Dataset":
    """Per user: event_type strings concatenated in (ts, event_id) order —
    the same sort-within-group + ordered-concat shape as document
    re-assembly (reference pdf2pdfocr.py:928-956)."""
    from .grouped import sorted_groupby

    ds = read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def concat_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        return df.groupby("user_id", as_index=False).agg(
            event_seq=("event_type", "".join), n_events=("event_type", "size")
        )

    return sorted_groupby(ds, "user_id", concat_block)


# --------------------------------------------------------------- TPC-H Q1
def tpch_q1(sf_dir: str) -> "ray.data.Dataset":
    """Pricing-summary report (grouped sums over filtered lineitem).
    Batch-level partial aggregation shrinks the shuffle to ~6 rows/batch."""
    from .grouped import sorted_groupby

    ds = read(
        sf_dir,
        "lineitem",
        ["l_quantity", "l_extendedprice", "l_discount", "l_returnflag",
         "l_linestatus", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        cutoff = pa.scalar(datetime.datetime(1998, 9, 2), pa.timestamp("us"))
        t = t.filter(pc.less_equal(pc.cast(t["l_shipdate"], pa.timestamp("us")), cutoff))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = t.append_column("disc_price", disc).to_pandas()
        return df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            pq=("l_quantity", "sum"),
            pb=("l_extendedprice", "sum"),
            pd_=("disc_price", "sum"),
            pn=("l_quantity", "size"),
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("pq", "sum"),
            sum_base_price=("pb", "sum"),
            sum_disc_price=("pd_", "sum"),
            count_order=("pn", "sum"),
        )
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            g[c] = g[c].round(2)
        return g

    return sorted_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        final,
    )


# ------------------------------------------------------------------ top-k
def top_orders(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Top-k orders by total price (global sort + limit; stored values, so
    the comparison with the oracle is exact)."""
    ds = read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


# ----------------------------------------------------- broadcast semi-join
def building_orders(sf_dir: str) -> "ray.data.Dataset":
    """orders ⋉ customer(mktsegment='BUILDING'): the small key set is
    broadcast (ray.put) and applied as an is_in filter per batch — no
    shuffle join (SURVEY.md §2.4 J3/J4 pattern)."""
    import ray

    cust = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    keys = pa.array(
        sorted(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]), pa.int64()
    )
    keys_ref = ray.put(keys)

    def semi(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        return t.filter(pc.is_in(t["o_custkey"], value_set=ks))

    ds = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.map_batches(semi, batch_format="pyarrow")


# ------------------------------------------- broadcast dimension join + agg
def orders_by_nation(sf_dir: str) -> "ray.data.Dataset":
    """orders→customer→nation rollup: count + sum(totalprice) per nation.
    Both dimension tables are broadcast dicts; the fact table streams."""
    import ray

    from .grouped import sorted_groupby

    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    cust_map = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    nation_map = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put((cust_map, nation_map))

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        cmap, nmap = ray.get(ref)
        nk = batch["o_custkey"].map(cmap)
        batch = batch.copy()
        batch["n_name"] = nk.map(nmap)
        return batch.groupby("n_name", as_index=False).agg(
            pn=("o_orderkey", "size"), ps=("o_totalprice", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_name", as_index=False).agg(
            n_orders=("pn", "sum"), sum_price=("ps", "sum")
        )
        g["sum_price"] = g["sum_price"].round(2)
        return g

    ds = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return sorted_groupby(ds.map_batches(attach, batch_format="pandas"), "n_name", final)


# ------------------------------------------------------- windowed aggregate
def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour window per user: event count + sum(value).
    Event time = ts column; window id computed vectorized, then one
    sorted_groupby — Ray Data's batch equivalent of a streaming tumbling
    window.  (Measured: built-in groupby().aggregate() took 23.3 s on the
    600k-row/96k-group table; this plan takes 0.8 s at 32 CPUs.)"""
    from .grouped import sorted_groupby

    ds = read(sf_dir, "events", ["ts", "user_id", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())  # microseconds since epoch
        hour = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        return t.append_column("hour_bucket", hour)

    def agg_block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "hour_bucket"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        g["sum_value"] = g["sum_value"].round(2)
        return g

    return sorted_groupby(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["user_id", "hour_bucket"],
        agg_block,
    )
