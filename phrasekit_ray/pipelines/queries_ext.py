"""Round-2 extension query pack: join composition, range-window joins,
chunk-level dedup, graph analytics, retrieval and LM scoring.

Same driver conventions as ``queries.py``: every callable takes
``sf_dir``; column names/types match the SQL oracle twin; float scores
are either computed through the identical float64 op sequence on both
sides or collapsed to integers (per-token micro-units summed as int64)
so ordering-of-addition can never diverge.

Registered into the main QUERIES / ORACLE_SQL maps at the bottom of
``queries.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from phrasekit_ray.pipelines.queries import _cast, _collect, _docs, _i64

_CUTOFF = "1998-06-01"
_CUTOFF_US = 896659200_000_000  # 1998-06-01T00:00:00Z in epoch microseconds


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped 3-way join: customer ⋈ orders ⋈ lineitem with a
    segment filter and a date split, revenue per open order, top 10.

    Scale shape: the customer side collapses to a key FILTER (semi-join,
    broadcast when small — no customer columns survive the join), the
    orders⋈lineitem step is ONE native hash-partitioned join on
    orderkey, and revenue is pre-combined per orderkey in-block before
    the final (tiny) aggregate. Revenue is summed in integer cents so
    the result is associativity-proof."""
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate, join_partitions, key_filter_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], "BUILDING")),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(
        lambda b: b.filter(
            pc.less(b["o_orderdate"], pa.scalar(_CUTOFF_US, pa.timestamp("us")))
        ),
        batch_format="pyarrow",
    )
    open_orders = key_filter_join(orders, cust, "o_custkey", "c_custkey", anti=False)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda b: b.filter(
            pc.greater(b["l_shipdate"], pa.scalar(_CUTOFF_US, pa.timestamp("us")))
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        open_orders,
        join_type="inner",
        num_partitions=join_partitions(8),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(b: pa.Table) -> pa.Table:
        # same IEEE sequence as the SQL twin: price*(1-disc) in float64,
        # *100, round → integer cents (summation order can't matter)
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        cents = pc.cast(pc.round(pc.multiply(rev, 100.0)), pa.int64())
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "o_orderdate_us": b["o_orderdate"].cast(pa.int64()),
                "revenue_cents": cents,
            }
        )

    agg = hash_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey", "o_orderdate_us"],
        [("revenue_cents", "sum")],
    )
    top = agg.sort(["revenue_cents", "l_orderkey"], descending=[True, False]).limit(10)
    return _i64(_collect(top), "l_orderkey", "o_orderdate_us", "revenue_cents")


SQL_SHIPPING_PRIORITY = f"""
SELECT l.l_orderkey,
       epoch_us(o.o_orderdate) AS o_orderdate_us,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{_CUTOFF}'
GROUP BY 1, 2
ORDER BY revenue_cents DESC, l_orderkey ASC
LIMIT 10
"""


_RANGE_WINDOW_US = 24 * 3600 * 1_000_000  # 24h trailing window


def q_events_range_window(sf_dir: str):
    """Trailing 24h RANGE-window self-join per event (count + cent-sum of
    the same user's events in [ts-24h, ts]) — zero joins, one banded
    searchsorted per partition (stages/windows.range_window_stats)."""
    import ray

    from phrasekit_ray.stages.windows import range_window_stats

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    return _collect(range_window_stats(events, _RANGE_WINDOW_US))


SQL_EVENTS_RANGE_WINDOW = """
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       count(*) OVER w AS n_win,
       sum(CAST(round(value * 100.0) AS BIGINT)) OVER w AS sum_cents_win
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
"""


def q_chunk_dedup(sf_dir: str):
    """CCNet-style chunk-level dedup: 20-token chunks, global
    first-occurrence wins, documents rebuilt from surviving chunks
    (stages/dedup.chunk_dedup — one string aggregate, zero corpus joins)."""
    from phrasekit_ray.stages.dedup import chunk_dedup

    return _i64(_collect(chunk_dedup(_docs(sf_dir))), "n_kept", "n_total")


SQL_CHUNK_DEDUP = """
WITH t AS (SELECT doc_id, CAST(doc_id AS BIGINT) AS did,
                  string_split(text,' ') AS toks FROM documents),
n AS (SELECT *, CAST(ceil(len(toks)/20.0) AS BIGINT) AS n_total FROM t),
c AS (SELECT doc_id, did, n_total, toks,
             unnest(generate_series(0, CAST(n_total-1 AS INT))) AS ci FROM n),
ch AS (SELECT doc_id, did, n_total, ci,
              array_to_string(toks[ci*20+1:(ci+1)*20], ' ') AS chunk FROM c),
k AS (SELECT *, did*1048576+ci AS ok,
             min(did*1048576+ci) OVER (PARTITION BY chunk) AS mn FROM ch)
SELECT doc_id, array_to_string(list(chunk ORDER BY ci), ' ') AS clean_text,
       count(*) AS n_kept, any_value(n_total) AS n_total
FROM k WHERE ok = mn GROUP BY doc_id
"""


EXT_QUERIES = {
    "q_shipping_priority": q_shipping_priority,
    "q_events_range_window": q_events_range_window,
    "q_chunk_dedup": q_chunk_dedup,
}

EXT_ORACLE_SQL = {
    "q_shipping_priority": SQL_SHIPPING_PRIORITY,
    "q_events_range_window": SQL_EVENTS_RANGE_WINDOW,
    "q_chunk_dedup": SQL_CHUNK_DEDUP,
}
