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

from phrasekit_ray.pipelines.queries import _collect, _docs, _flagship_triples, _i64

_CUTOFF = "1998-06-01"
_CUTOFF_US = 896659200_000_000  # 1998-06-01T00:00:00Z in epoch microseconds


from phrasekit_ray.stages.agg import round_away as _round_away  # noqa: E402


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
        cents = pc.cast(_round_away(pc.multiply(rev, 100.0)), pa.int64())
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
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) OVER w AS BIGINT) AS sum_cents_win
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



_Y96_US = 820454400_000_000  # 1996-01-01T00:00:00Z epoch microseconds
_Y97_US = 852076800_000_000  # 1997-01-01T00:00:00Z


def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5-shaped 6-table join: revenue from lineitems where the
    supplier and the ordering customer share an ASIA nation, grouped by
    nation, one order-year window.

    Scale shape — the join chain never shuffles a dimension table:
    region⋈nation (tiny) are read once on the driver and become an int
    set; supplier becomes a broadcast suppkey→nationkey int array
    (``ray.put`` once, searchsorted per batch); customer attaches
    c_nationkey to the date-filtered orders via ONE distributed
    ``lookup_join``; lineitem picks up the customer nation via a second
    ``lookup_join`` on orderkey (the only two shuffles, both on the
    already-filtered fact rows); the s_nationkey = c_nationkey condition
    is a vectorized batch filter; revenue pre-combines per nation
    in-block before a 25-row final aggregate."""
    import pyarrow.parquet as pq
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate, lookup_join
    from phrasekit_ray.stages.score import _get_broadcast

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(f"{sf_dir}/region.parquet")
    asia_keys = set(
        region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"].to_pylist()
    )
    asia_mask = pc.is_in(
        nation["n_regionkey"], value_set=pa.array(list(asia_keys), pa.int32())
    )
    asia_nation = nation.filter(asia_mask)
    nation_ids = np.sort(
        asia_nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    names = dict(
        zip(
            asia_nation["n_nationkey"].to_pylist(),
            asia_nation["n_name"].to_pylist(),
        )
    )

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(sk)
    supp_ref = ray.put((sk[o], sn[o]))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"].cast(pa.int64()),
            }
        ).filter(
            pc.and_(
                pc.greater_equal(
                    b["o_orderdate"], pa.scalar(_Y96_US, pa.timestamp("us"))
                ),
                pc.less(b["o_orderdate"], pa.scalar(_Y97_US, pa.timestamp("us"))),
            )
        ),
        batch_format="pyarrow",
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b["c_custkey"].cast(pa.int64()),
                "c_nation": b["c_nationkey"].cast(pa.int64()),
            }
        ).filter(
            pa.array(
                np.isin(
                    b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                    nation_ids,
                )
            )
        ),
        batch_format="pyarrow",
    )
    o_schema = pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())])
    c_schema = pa.schema([("c_custkey", pa.int64()), ("c_nation", pa.int64())])
    orders_n = lookup_join(
        orders, cust, "o_custkey", "c_custkey",
        left_schema=o_schema, right_schema=c_schema,
    ).map_batches(
        lambda b: b.select(["o_orderkey", "c_nation"]), batch_format="pyarrow"
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b["l_orderkey"].cast(pa.int64()),
                "l_suppkey": b["l_suppkey"].cast(pa.int64()),
                "l_extendedprice": b["l_extendedprice"],
                "l_discount": b["l_discount"],
            }
        ),
        batch_format="pyarrow",
    )
    li_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
        ]
    )
    on_schema = pa.schema([("o_orderkey", pa.int64()), ("c_nation", pa.int64())])
    joined = lookup_join(
        li, orders_n, "l_orderkey", "o_orderkey",
        left_schema=li_schema, right_schema=on_schema,
    )

    def local_revenue(b: pa.Table) -> pa.Table:
        skeys, snats = _get_broadcast(supp_ref)
        lk = b["l_suppkey"].combine_chunks().to_numpy()
        if len(skeys):
            pos = np.minimum(np.searchsorted(skeys, lk), len(skeys) - 1)
            s_nat = np.where(skeys[pos] == lk, snats[pos], np.int64(-1))
        else:
            s_nat = np.full(len(lk), -1, dtype=np.int64)
        keep = s_nat == b["c_nation"].combine_chunks().to_numpy()
        b = b.filter(pa.array(keep))
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        cents = pc.cast(_round_away(pc.multiply(rev, 100.0)), pa.int64())
        return pa.table({"nation": b["c_nation"], "revenue_cents": cents})

    agg = hash_aggregate(
        joined.map_batches(local_revenue, batch_format="pyarrow"),
        "nation",
        [("revenue_cents", "sum")],
    )
    t = _collect(agg)
    t = pa.table(
        {
            "n_name": pa.array(
                [names[int(n)] for n in t["nation"].to_pylist()], pa.string()
            ),
            "revenue_cents": t["revenue_cents"],
        }
    )
    return _i64(t, "revenue_cents")


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n.n_name AS n_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


def _basket_edges_ds(sf_dir: str):
    """Part co-occurrence graph: undirected edges between parts that
    appear in the same order (lineitem market basket) — a natural dense
    graph at every scale factor (the co-mention KG graph is degenerate
    below sf0.01)."""
    import ray
    import pyarrow.parquet as pq

    from phrasekit_ray.stages.kg import cooccurrence_edges

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    # row count is free parquet metadata → enables the bounded driver
    # fast path; at scale the count exceeds the threshold and the
    # distributed hash-partition path runs instead
    n_rows = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows
    return cooccurrence_edges(li, "l_orderkey", "l_partkey", input_rows=n_rows)


def q_graph_triangles(sf_dir: str):
    """Per-node triangle counts over the part co-occurrence graph — the
    distributed degree-ordered wedge-join algorithm
    (stages/kg.triangle_counts)."""
    from phrasekit_ray.stages.kg import triangle_counts

    return _i64(
        _collect(triangle_counts(_basket_edges_ds(sf_dir))), "node", "n_triangles"
    )


def q_graph_khop(sf_dir: str):
    """BFS distance labels within 3 undirected hops of the min part id
    (iterative frontier semi/anti joins, stages/kg.k_hop)."""
    from phrasekit_ray.stages.kg import k_hop

    return _i64(_collect(k_hop(_basket_edges_ds(sf_dir), hops=3)), "node", "dist")


_SQL_BASKET_EDGES = '''lp AS (
  SELECT DISTINCT l_orderkey AS g, l_partkey AS pk FROM lineitem),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM lp a JOIN lp b ON a.g = b.g AND a.pk < b.pk)'''


SQL_GRAPH_TRIANGLES = (
    "WITH "
    + _SQL_BASKET_EDGES
    + ''',
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
SELECT node, count(*) AS n_triangles
FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
GROUP BY node'''
)


SQL_GRAPH_KHOP = (
    "WITH RECURSIVE "
    + _SQL_BASKET_EDGES
    + ''',
adj AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
seed AS (SELECT min(src) AS s FROM adj),
bfs AS (
  SELECT s AS node, 0 AS dist FROM seed
  UNION
  SELECT adj.dst, bfs.dist + 1
  FROM bfs JOIN adj ON adj.src = bfs.node WHERE bfs.dist < 3)
SELECT node, min(dist) AS dist FROM bfs GROUP BY node'''
)


def q_lm_nll(sf_dir: str):
    """Per-document unigram-LM negative log likelihood (CCNet-style
    quality signal) in integer micro-nats — corpus-trained add-one
    smoothed LM, vocab = count ≥ 2 capped at 1M by (count desc, tok asc)
    (stages/lm.unigram_nll_scores)."""
    from phrasekit_ray.stages.lm import unigram_nll_scores

    return _i64(_collect(unigram_nll_scores(_docs(sf_dir))), "doc_id")


SQL_LM_NLL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok
        HAVING count(*) >= 2),
vocab AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok ASC LIMIT 1000000),
tot AS (SELECT CAST(sum(c) + count(*) AS DOUBLE) AS denom FROM vocab),
lp AS (SELECT t.doc_id,
         CAST(round(ln((COALESCE(v.c, 0) + 1.0) / tot.denom) * 1000000.0)
              AS BIGINT) AS lpm
       FROM toks t LEFT JOIN vocab v ON v.tok = t.tok CROSS JOIN tot)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.nll_micro, 0) AS nll_micro
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n_tokens,
         CAST(-sum(lpm) AS BIGINT) AS nll_micro
  FROM lp GROUP BY doc_id
) s ON s.doc_id = d.doc_id
"""


def q_search_top2(sf_dir: str):
    """Conjunctive retrieval: documents containing BOTH of the two most
    frequent corpus tokens — deterministic query-term selection (count
    desc, token asc), vectorized scan plan (stages/lm.conjunctive_search)."""
    from phrasekit_ray.stages.lm import conjunctive_search, top_tokens

    docs = _docs(sf_dir)
    terms = top_tokens(docs, k=2)
    return _i64(_collect(conjunctive_search(docs, terms)), "doc_id")


SQL_SEARCH_TOP2 = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
top2 AS (SELECT tok FROM cnt ORDER BY c DESC, tok ASC LIMIT 2),
hit AS (SELECT DISTINCT t.doc_id, t.tok FROM toks t
        JOIN top2 u ON u.tok = t.tok)
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM hit GROUP BY doc_id HAVING count(*) = 2
"""


def q_bm25_search(sf_dir: str):
    """BM25 top-20 retrieval for a deterministic 3-token query (corpus
    frequency ranks 10-12, ties by token asc) — one corpus scan, tiny
    int intermediate, micro-unit integer scores (stages/lm.bm25_topk)."""
    from phrasekit_ray.stages.lm import bm25_topk, top_tokens

    docs = _docs(sf_dir)
    terms = top_tokens(docs, k=3, offset=9)
    return _i64(_collect(bm25_topk(docs, terms)), "doc_id")


SQL_BM25_SEARCH = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
qt AS (SELECT tok FROM cnt ORDER BY c DESC, tok ASC LIMIT 3 OFFSET 9),
df AS (SELECT t.tok, count(DISTINCT t.doc_id) AS df FROM toks t
       JOIN qt USING (tok) GROUP BY t.tok),
tf AS (SELECT t.doc_id, t.tok, CAST(count(*) AS DOUBLE) AS tf FROM toks t
       JOIN qt USING (tok) GROUP BY 1, 2),
sc AS (SELECT tf.doc_id,
         CAST(round(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
               * 1000000.0) AS BIGINT) AS s
       FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(sum(s) AS BIGINT) AS bm25_micro
FROM sc GROUP BY doc_id HAVING sum(s) > 0
ORDER BY bm25_micro DESC, doc_id ASC LIMIT 20
"""


def q_lm_bigram_nll(sf_dir: str):
    """Per-document conditional bigram-LM NLL in integer micro-nats —
    add-one smoothing over the kept unigram vocab, bounded broadcast
    count tables (stages/lm.bigram_nll_scores)."""
    from phrasekit_ray.stages.lm import bigram_nll_scores

    return _i64(_collect(bigram_nll_scores(_docs(sf_dir))), "doc_id")


SQL_LM_BIGRAM_NLL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
              generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents),
cnt1 AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok
         HAVING count(*) >= 2),
uni AS (SELECT tok, c FROM cnt1 ORDER BY c DESC, tok ASC LIMIT 1000000),
v AS (SELECT count(*) AS v FROM uni),
bi AS (SELECT t1.doc_id, t1.tok AS w1, t1.tok || ' ' || t2.tok AS pair
       FROM toks t1 JOIN toks t2
         ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1),
cnt2 AS (SELECT pair, count(*) AS c FROM bi GROUP BY pair
         HAVING count(*) >= 2),
big AS (SELECT pair, c FROM cnt2 ORDER BY c DESC, pair ASC LIMIT 1000000),
lp AS (SELECT bi.doc_id,
         CAST(round(ln((COALESCE(b.c, 0) + 1.0)
                       / (COALESCE(u.c, 0) + v.v)) * 1000000.0)
              AS BIGINT) AS lpm
       FROM bi LEFT JOIN big b ON b.pair = bi.pair
               LEFT JOIN uni u ON u.tok = bi.w1 CROSS JOIN v)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       COALESCE(s.n_bigrams, 0) AS n_bigrams,
       COALESCE(s.nll_micro, 0) AS nll_micro
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(-sum(lpm) AS BIGINT) AS nll_micro
  FROM lp GROUP BY doc_id) s ON s.doc_id = d.doc_id
"""


class _SyncedDict(dict):
    """Registry map that PUSHES every update into the driver registry in
    queries.py immediately (review finding, round 4): appending
    registrations after any fixed "final hook" silently stranded them
    when this module was imported first. With the push inside update(),
    no registration can be stranded under ANY import order."""

    def __init__(self, target_name: str):
        super().__init__()
        self._target = target_name

    def _push(self):
        from phrasekit_ray.pipelines import queries as _q

        tgt = getattr(_q, self._target, None)
        if tgt is not None:
            dict.update(tgt, self)

    def update(self, *a, **k):  # type: ignore[override]
        super().update(*a, **k)
        self._push()

    # every single-key mutation path pushes too, so a future plain
    # EXT_QUERIES[name] = fn after module init cannot be stranded from
    # queries.QUERIES (ADVICE r4; round-4 bug class)
    def __setitem__(self, key, value):  # type: ignore[override]
        super().__setitem__(key, value)
        self._push()

    def setdefault(self, key, default=None):  # type: ignore[override]
        out = super().setdefault(key, default)
        self._push()
        return out

    def __delitem__(self, key):  # type: ignore[override]
        super().__delitem__(key)
        from phrasekit_ray.pipelines import queries as _q

        tgt = getattr(_q, self._target, None)
        if tgt is not None and key in tgt:
            del tgt[key]


EXT_QUERIES = _SyncedDict("QUERIES")
EXT_QUERIES.update({
    "q_shipping_priority": q_shipping_priority,
    "q_events_range_window": q_events_range_window,
    "q_chunk_dedup": q_chunk_dedup,
    "q_graph_triangles": q_graph_triangles,
    "q_graph_khop": q_graph_khop,
    "q_local_supplier_volume": q_local_supplier_volume,
    "q_lm_nll": q_lm_nll,
    "q_search_top2": q_search_top2,
    "q_bm25_search": q_bm25_search,
    "q_lm_bigram_nll": q_lm_bigram_nll,
})

EXT_ORACLE_SQL = _SyncedDict("ORACLE_SQL")
EXT_ORACLE_SQL.update({
    "q_shipping_priority": SQL_SHIPPING_PRIORITY,
    "q_events_range_window": SQL_EVENTS_RANGE_WINDOW,
    "q_chunk_dedup": SQL_CHUNK_DEDUP,
    "q_graph_triangles": SQL_GRAPH_TRIANGLES,
    "q_graph_khop": SQL_GRAPH_KHOP,
    "q_local_supplier_volume": SQL_LOCAL_SUPPLIER_VOLUME,
    "q_lm_nll": SQL_LM_NLL,
    "q_search_top2": SQL_SEARCH_TOP2,
    "q_bm25_search": SQL_BM25_SEARCH,
    "q_lm_bigram_nll": SQL_LM_BIGRAM_NLL,
})


_EXT_MODULE_LOADED = True  # sentinel: import completed past the maps


def _self_register() -> None:
    """Covers the import order where THIS module is imported first (the
    main module's bottom hook then sees a partial module and skips)."""
    from phrasekit_ray.pipelines import queries as _q

    _q.QUERIES.update(EXT_QUERIES)
    _q.ORACLE_SQL.update(EXT_ORACLE_SQL)


_self_register()


# --- round-3 additions: window lead/lag, grouped corr, set ops, full outer -


def q_events_lead_lag(sf_dir: str):
    """LAG/LEAD of event value (cents) per user ordered by (ts, event_id)
    — partition-run vectorized window (stages/windows.lead_lag)."""
    import ray

    from phrasekit_ray.stages.windows import lead_lag

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return _i64(
        _collect(lead_lag(events)),
        "event_id", "lag_value_cents", "lead_value_cents",
    )


SQL_EVENTS_LEAD_LAG = """
SELECT event_id,
       LAG(CAST(round(value * 100.0) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_value_cents,
       LEAD(CAST(round(value * 100.0) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lead_value_cents
FROM events
"""


def q_lineitem_corr(sf_dir: str):
    """Per-returnflag corr/covar_pop of (quantity, discount) — exact
    int64 moment sums through the shuffle, micro-fixed finalize
    (stages/agg.grouped_corr)."""
    import ray

    from phrasekit_ray.stages.agg import grouped_corr

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )
    return _i64(
        _collect(grouped_corr(li, "l_returnflag", "l_quantity", "l_discount")),
        "n", "corr_micro", "covar_pop_micro",
    )


SQL_LINEITEM_CORR = """
WITH t AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100.0) AS BIGINT) / 100.0 AS x,
         CAST(round(l_discount * 100.0) AS BIGINT) / 100.0 AS y
  FROM lineitem)
SELECT l_returnflag, count(*) AS n,
       CAST(round(corr(x, y) * 1000000.0) AS BIGINT) AS corr_micro,
       CAST(round(covar_pop(x, y) * 1000000.0) AS BIGINT) AS covar_pop_micro
FROM t GROUP BY l_returnflag
"""


_DAY_US = 86_400_000_000


def _event_user_days(sf_dir: str, etype: str):
    """Distinct-able (user_id, day) activity pairs for one event type."""
    import ray
    import pyarrow.compute as _pc

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def prep(b: pa.Table, _t=etype) -> pa.Table:
        keep = _pc.equal(b["event_type"], _t)
        ts = b["ts"].filter(keep).cast(pa.int64()).combine_chunks().to_numpy()
        uid = b["user_id"].filter(keep).cast(pa.int64())
        return pa.table(
            {
                "user_id": uid,
                "day_us": pa.array((ts // _DAY_US) * _DAY_US, pa.int64()),
            }
        )

    return ev.map_batches(prep, batch_format="pyarrow")


def q_users_click_and_purchase(sf_dir: str):
    """SQL INTERSECT: distinct (user, day) pairs with BOTH a click and a
    purchase that day — single-shuffle presence-flag set op
    (stages/agg.intersect_distinct)."""
    from phrasekit_ray.stages.agg import intersect_distinct

    return _i64(
        _collect(
            intersect_distinct(
                _event_user_days(sf_dir, "click"),
                _event_user_days(sf_dir, "purchase"),
                ["user_id", "day_us"],
            )
        ),
        "user_id", "day_us",
    )


_SQL_USER_DAYS = (
    "SELECT CAST(user_id AS BIGINT) AS user_id, "
    "epoch_us(date_trunc('day', ts)) AS day_us "
    "FROM events WHERE event_type = '{t}'"
)


SQL_USERS_CLICK_AND_PURCHASE = (
    _SQL_USER_DAYS.format(t="click")
    + " INTERSECT "
    + _SQL_USER_DAYS.format(t="purchase")
)


def q_users_click_not_purchase(sf_dir: str):
    """SQL EXCEPT: distinct (user, day) click pairs with no same-day
    purchase (stages/agg.except_distinct)."""
    from phrasekit_ray.stages.agg import except_distinct

    return _i64(
        _collect(
            except_distinct(
                _event_user_days(sf_dir, "click"),
                _event_user_days(sf_dir, "purchase"),
                ["user_id", "day_us"],
            )
        ),
        "user_id", "day_us",
    )


SQL_USERS_CLICK_NOT_PURCHASE = (
    _SQL_USER_DAYS.format(t="click")
    + " EXCEPT "
    + _SQL_USER_DAYS.format(t="purchase")
)


def q_full_outer_revenue(sf_dir: str):
    """FULL OUTER join: BUILDING-segment customers ⟗ per-customer order
    revenue — rows survive from BOTH unmatched sides (customers without
    orders, orders whose customer is outside the segment). Ray Data's
    native full_outer hash join over the pre-aggregated (tiny) sides."""
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate, join_partitions

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: pa.table(
            {"c_custkey": b["c_custkey"].filter(
                pc.equal(b["c_mktsegment"], "BUILDING")
            )}
        ),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b["o_custkey"],
                "revenue_cents": pc.cast(
                    _round_away(pc.multiply(b["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    rev = hash_aggregate(orders, "o_custkey", [("revenue_cents", "sum")])
    joined = cust.join(
        rev,
        join_type="full_outer",
        num_partitions=join_partitions(8),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    # Ray's outer join COALESCES the key pair into the left key column,
    # so the surviving schema is (c_custkey, revenue_cents); left-only
    # customers read revenue_cents NULL
    def conform(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "revenue_cents": b["revenue_cents"],
            }
        )

    return _i64(
        _collect(joined.map_batches(conform, batch_format="pyarrow")),
        "c_custkey", "revenue_cents",
    )


SQL_FULL_OUTER_REVENUE = """
WITH c AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
r AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY o_custkey)
SELECT COALESCE(c.c_custkey, r.o_custkey) AS c_custkey, r.revenue_cents
FROM c FULL OUTER JOIN r ON c.c_custkey = r.o_custkey
"""


EXT_QUERIES.update(
    {
        "q_events_lead_lag": q_events_lead_lag,
        "q_lineitem_corr": q_lineitem_corr,
        "q_users_click_and_purchase": q_users_click_and_purchase,
        "q_users_click_not_purchase": q_users_click_not_purchase,
        "q_full_outer_revenue": q_full_outer_revenue,
    }
)
EXT_ORACLE_SQL.update(
    {
        "q_events_lead_lag": SQL_EVENTS_LEAD_LAG,
        "q_lineitem_corr": SQL_LINEITEM_CORR,
        "q_users_click_and_purchase": SQL_USERS_CLICK_AND_PURCHASE,
        "q_users_click_not_purchase": SQL_USERS_CLICK_NOT_PURCHASE,
        "q_full_outer_revenue": SQL_FULL_OUTER_REVENUE,
    }
)


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer training over the documents corpus: distributed
    word-count aggregate → driver merge loop (bounded table) → ordered
    merge list with per-merge rank. Not SQL-expressible (iterative
    argmax); verified by the differential suite in tests/test_bpe.py
    (incremental trainer ≡ from-scratch Sennrich reference, partitioning
    invariance, greedy-encode goldens). The driver row carries the
    differential IN-BAND (VERDICT r4 item 5): ``ref_agree_pct`` = % of
    ranks where the incremental trainer's merge equals a from-scratch
    Sennrich recount (all pair counts rebuilt every merge) over the SAME
    distributed word-count table — 100 unless the incremental index
    drifts."""
    from collections import Counter

    from phrasekit_ray.stages.bpe import END, merges_from_word_counts, word_counts

    wc = word_counts(_docs(sf_dir), min_word_count=2)
    merges = merges_from_word_counts(wc, 100)

    # independent from-scratch recount (Sennrich pseudocode, no
    # incremental pair index) on the driver-bounded word table
    words = {tuple(w) + (END,): c for w, c in wc.items()}
    naive = []
    for _ in range(len(merges)):
        pairs: Counter = Counter()
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        naive.append(best)
        new_words: dict = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    agree = sum(1 for a, b in zip(merges, naive) if a == b)
    pct = round(100 * agree / max(len(merges), 1))
    n = len(merges)
    return pa.table(
        {
            "rank": pa.array(range(n), pa.int64()),
            "left": pa.array([a for a, _ in merges]),
            "right": pa.array([b for _, b in merges]),
            "ref_agree_pct": pa.array([pct] * n, pa.int64()),
        }
    )


EXT_QUERIES.update({"q_bpe_merges": q_bpe_merges})


def q_fuzzy_part_tokens(sf_dir: str):
    """Edit-distance-≤1 fuzzy self-join over distinct part-name tokens —
    SymSpell deletion-neighborhood blocking + exact verify
    (stages/dedup.fuzzy_token_pairs); oracle = DuckDB levenshtein."""
    import ray

    from phrasekit_ray.stages.dedup import fuzzy_token_pairs

    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["p_name"].combine_chunks(), " ")
        off = toks.offsets.to_numpy(zero_copy_only=False)
        return pa.table({"tok": toks.values.slice(off[0], int(off[-1] - off[0]))})

    return _collect(
        fuzzy_token_pairs(
            parts.map_batches(explode, batch_format="pyarrow"), min_len=3
        )
    )


SQL_FUZZY_PART_TOKENS = """
WITH t AS (SELECT unnest(string_split(p_name, ' ')) AS tok FROM part),
c AS (SELECT DISTINCT tok FROM t WHERE length(tok) >= 3)
SELECT a.tok AS left_tok, b.tok AS right_tok
FROM c a JOIN c b
  ON a.tok < b.tok
 AND abs(length(a.tok) - length(b.tok)) <= 1
 AND levenshtein(a.tok, b.tok) <= 1
"""


EXT_QUERIES.update({"q_fuzzy_part_tokens": q_fuzzy_part_tokens})
EXT_ORACLE_SQL.update({"q_fuzzy_part_tokens": SQL_FUZZY_PART_TOKENS})


def q_events_running_total(sf_dir: str):
    """Per-user running revenue: SUM(value) OVER (PARTITION BY user_id
    ORDER BY ts, event_id) in integer cents (stages/windows.running_total
    — partition-run segmented cumsum, no corpus-wide sort)."""
    import ray

    from phrasekit_ray.stages.windows import running_total

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return _i64(_collect(running_total(ev)), "event_id", "running_cents")


SQL_EVENTS_RUNNING_TOTAL = """
WITH t AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events)
SELECT event_id,
       CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS running_cents
FROM t
"""


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_events_pivot(sf_dir: str):
    """Conditional-aggregate pivot: revenue cents per (user bucket ×
    event type) as one wide row per bucket (stages/agg.pivot_sum — one
    masked-column pass + ONE two-phase hash aggregate; no shuffle per
    category)."""
    import ray

    from phrasekit_ray.stages.agg import pivot_sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"],
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_bucket": pc.cast(
                    pc.subtract(
                        b["user_id"],
                        pc.multiply(pc.divide(b["user_id"], 100), 100),
                    ),
                    pa.int64(),
                ),
                "event_type": b["event_type"],
                "cents": pc.cast(
                    _round_away(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    wide = pivot_sum(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_bucket",
        "event_type",
        "cents",
        _EVENT_TYPES,
    )
    return _i64(
        _collect(wide), "user_bucket", *[f"{c}_sum" for c in _EVENT_TYPES]
    )


SQL_EVENTS_PIVOT = """
WITH t AS (
  SELECT user_id % 100 AS user_bucket, event_type,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events)
SELECT user_bucket,
       CAST(sum(CASE WHEN event_type = 'click' THEN cents END) AS BIGINT) AS click_sum,
       CAST(sum(CASE WHEN event_type = 'view' THEN cents END) AS BIGINT) AS view_sum,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN cents END) AS BIGINT) AS purchase_sum,
       CAST(sum(CASE WHEN event_type = 'signup' THEN cents END) AS BIGINT) AS signup_sum,
       CAST(sum(CASE WHEN event_type = 'error' THEN cents END) AS BIGINT) AS error_sum
FROM t GROUP BY user_bucket
"""


def q_corpus_split(sf_dir: str):
    """Deterministic train/val/test corpus split (80/10/10 by doc_id mod
    10 — reproducible across runs and partitionings) with per-split doc
    and char totals. The split label is a stateless map; the stats are
    one two-phase aggregate. At 100 TB the same map feeds three
    write_parquet sinks partitioned by split."""
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def label(b: pa.Table) -> pa.Table:
        m = pc.cast(
            pc.subtract(b["doc_id"], pc.multiply(pc.divide(b["doc_id"], 10), 10)),
            pa.int64(),
        )
        split = pc.if_else(
            pc.less(m, 8),
            pa.scalar("train"),
            pc.if_else(pc.equal(m, 8), pa.scalar("val"), pa.scalar("test")),
        )
        return pa.table(
            {
                "split": split,
                "n_docs": pa.array(np.ones(b.num_rows, np.int64)),
                "chars_total": pc.cast(b["n_chars"], pa.int64()),
            }
        )

    return _i64(
        _collect(
            hash_aggregate(
                docs.map_batches(label, batch_format="pyarrow"),
                "split",
                [("n_docs", "sum"), ("chars_total", "sum")],
            )
        ),
        "n_docs", "chars_total",
    )


SQL_CORPUS_SPLIT = """
SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
            WHEN doc_id % 10 = 8 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_total
FROM documents GROUP BY 1
"""


EXT_QUERIES.update(
    {
        "q_events_running_total": q_events_running_total,
        "q_events_pivot": q_events_pivot,
        "q_corpus_split": q_corpus_split,
    }
)
EXT_ORACLE_SQL.update(
    {
        "q_events_running_total": SQL_EVENTS_RUNNING_TOTAL,
        "q_events_pivot": SQL_EVENTS_PIVOT,
        "q_corpus_split": SQL_CORPUS_SPLIT,
    }
)


def q_graph_communities(sf_dir: str):
    """Deterministic label-propagation communities over the part
    co-occurrence graph → (label, n_nodes) community sizes. Not
    SQL-expressible (iterative per-node vote argmax); verified by the
    differential suite in tests/test_kg.py (distributed ≡ driver
    reference on the identical synchronous min-tie-break rule,
    partitioning invariance, two-clique split). The driver row carries
    the differential IN-BAND (VERDICT r4 item 5):
    ``n_mismatch_vs_reference`` = per-node label disagreements against
    an independent driver recomputation of the same synchronous rule —
    must be 0. The reference pull is gated on edge count (sentinel −1
    above the bound) so the metric never becomes a driver-memory hole
    at scale."""
    from collections import Counter, defaultdict

    from phrasekit_ray.stages.kg import label_propagation_communities

    edges_ds = _basket_edges_ds(sf_dir).materialize()
    labels = _collect(
        label_propagation_communities(
            edges_ds, src_col="subj", dst_col="obj", max_rounds=3
        )
    )
    n_mismatch = -1
    if edges_ds.count() <= 500_000:
        et = _collect(edges_ds.select_columns(["subj", "obj"]))
        nbrs: dict = defaultdict(list)
        for u, v in zip(et["subj"].to_pylist(), et["obj"].to_pylist()):
            if u != v:
                nbrs[int(u)].append(int(v))
                nbrs[int(v)].append(int(u))
        ref = {n: n for n in nbrs}
        for _ in range(3):
            new = {}
            for n, ns in nbrs.items():
                c = Counter(ref[m] for m in ns)
                new[n] = max(c.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            if new == ref:
                break
            ref = new
        got = dict(
            zip(labels["node"].to_pylist(), labels["label"].to_pylist())
        )
        n_mismatch = sum(
            1 for n, l in ref.items() if got.get(n) != l
        ) + sum(1 for n in got if n not in ref)
    sizes = (
        labels.group_by("label")
        .aggregate([("node", "count")])
        .rename_columns(["label", "n_nodes"])
    )
    return _i64(
        sizes.append_column(
            "n_mismatch_vs_reference",
            pa.array([n_mismatch] * sizes.num_rows, pa.int64()),
        ),
        "label", "n_nodes",
    )


EXT_QUERIES.update({"q_graph_communities": q_graph_communities})


def q_events_rank(sf_dir: str):
    """Ranking windows per user (ROW_NUMBER / NTILE(4) / percent_rank in
    micro-units) — stages/windows.rank_window, partition-run segment
    kernels."""
    import ray

    from phrasekit_ray.stages.windows import rank_window

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return _i64(_collect(rank_window(ev)), "event_id", "rn", "ntile", "pr_micro")


SQL_EVENTS_RANK = """
SELECT event_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(NTILE(4) OVER w AS BIGINT) AS ntile,
       CAST(round(percent_rank() OVER w * 1000000.0) AS BIGINT) AS pr_micro
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


EXT_QUERIES.update({"q_events_rank": q_events_rank})
EXT_ORACLE_SQL.update({"q_events_rank": SQL_EVENTS_RANK})


def q_pack_bins(sf_dir: str):
    """Sequence packing of the documents corpus into 2048-char training
    bins (stages/packing.pack_sequences — per-partition vectorized FFD,
    globally unique bin ids, oversized docs flagged in dedicated bins).
    Not SQL-expressible (sequential first-fit state); verified by the
    invariant/differential suite in tests/test_packing.py. The driver
    row carries the invariants IN-BAND (VERDICT r4 item 5):
    ``occupancy_pct`` = total clamped tokens / (bins × capacity) and
    ``n_violations`` = bins whose clamped total exceeds capacity plus
    docs assigned to more than one bin — must be 0. Computed over the
    SAME collected assignment the query already materializes (its output
    is one row per doc), so no extra distributed pass."""
    import ray

    from phrasekit_ray.stages.packing import pack_sequences

    cap = 2048
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    packed = _collect(pack_sequences(docs, cap, tokens_col="n_chars"))
    lens = _collect(
        docs.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b["doc_id"].cast(pa.int64()),
                    "n_chars": b["n_chars"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    did = packed["doc_id"].to_numpy(zero_copy_only=False)
    bid = packed["bin_id"].to_numpy(zero_copy_only=False)
    ld = lens["doc_id"].to_numpy(zero_copy_only=False)
    ln = lens["n_chars"].to_numpy(zero_copy_only=False)
    order = np.argsort(ld)
    tok = ln[order][np.searchsorted(ld[order], did)]
    w = np.minimum(np.maximum(tok, 1), cap)  # the packer's clamped weights
    _, bin_idx = np.unique(bid, return_inverse=True)
    totals = np.bincount(bin_idx, weights=w)
    n_viol = int((totals > cap).sum()) + int(len(did) - len(np.unique(did)))
    occupancy = round(100 * float(w.sum()) / (len(totals) * cap))
    out = packed.select(["doc_id", "bin_id"]).append_column(
        "occupancy_pct", pa.array([occupancy] * len(did), pa.int64())
    ).append_column(
        "n_violations", pa.array([n_viol] * len(did), pa.int64())
    )
    return _i64(out, "doc_id", "bin_id")


EXT_QUERIES.update({"q_pack_bins": q_pack_bins})


def q_events_unpivot(sf_dir: str):
    """Round-trip demonstration: the per-bucket pivot re-melted to long
    rows via SQL-UNPIVOT semantics (stages/agg.unpivot — stateless
    per-batch reshape, EXCLUDE NULLS default, no shuffle)."""
    from phrasekit_ray.stages.agg import unpivot

    # reuse the pivot query's distributed result as the wide input
    import ray

    from phrasekit_ray.stages.agg import pivot_sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_bucket": pc.cast(
                    pc.subtract(
                        b["user_id"],
                        pc.multiply(pc.divide(b["user_id"], 100), 100),
                    ),
                    pa.int64(),
                ),
                "event_type": b["event_type"],
                "cents": pc.cast(
                    _round_away(pc.multiply(b["value"], 100.0)), pa.int64()
                ),
            }
        )

    wide = pivot_sum(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_bucket",
        "event_type",
        "cents",
        _EVENT_TYPES,
    )
    longd = unpivot(
        wide,
        ["user_bucket"],
        [f"{c}_sum" for c in _EVENT_TYPES],
        cat_name="event_col",
        value_name="cents_sum",
    )
    return _i64(_collect(longd), "user_bucket", "cents_sum")


SQL_EVENTS_UNPIVOT = """
WITH t AS (
  SELECT user_id % 100 AS user_bucket, event_type,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events),
w AS (
  SELECT user_bucket,
         CAST(sum(CASE WHEN event_type = 'click' THEN cents END) AS BIGINT) AS click_sum,
         CAST(sum(CASE WHEN event_type = 'view' THEN cents END) AS BIGINT) AS view_sum,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN cents END) AS BIGINT) AS purchase_sum,
         CAST(sum(CASE WHEN event_type = 'signup' THEN cents END) AS BIGINT) AS signup_sum,
         CAST(sum(CASE WHEN event_type = 'error' THEN cents END) AS BIGINT) AS error_sum
  FROM t GROUP BY user_bucket)
SELECT user_bucket, event_col, cents_sum
FROM w UNPIVOT (cents_sum FOR event_col IN
  (click_sum, view_sum, purchase_sum, signup_sum, error_sum))
"""


EXT_QUERIES.update({"q_events_unpivot": q_events_unpivot})
EXT_ORACLE_SQL.update({"q_events_unpivot": SQL_EVENTS_UNPIVOT})


# --- round-4 additions: oracle-checked distributed connected components ----


def q_graph_components(sf_dir: str):
    """Connected components over the RECURRING part co-occurrence graph
    (parts appearing together in >= 2 distinct orders — 9 non-trivial
    components at sf0.01) via the distributed hash-min label-propagation
    operator (stages/kg.connected_components_distributed, the 100 TB
    canonicalization scale path). First driver-ORACLE-checked CC query:
    the DuckDB twin computes the same labels with a recursive-CTE
    transitive closure."""
    from phrasekit_ray.stages.agg import grouped_count
    from phrasekit_ray.stages.kg import connected_components_distributed

    edges = _basket_edges_ds(sf_dir)
    weighted = grouped_count(edges, ["subj", "obj"], count_col="w")

    def keep_recurring(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["w"], 2)).select(["subj", "obj"])

    recurring = weighted.map_batches(keep_recurring, batch_format="pyarrow")
    labels = connected_components_distributed(
        recurring, src_col="subj", dst_col="obj"
    )
    return _i64(_collect(labels), "node", "label")


SQL_GRAPH_COMPONENTS = """
WITH RECURSIVE
lp AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS pk FROM lineitem),
ew AS (
  SELECT a.pk AS u, b.pk AS v
  FROM lp a JOIN lp b ON a.g = b.g AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= 2),
ee AS (SELECT u, v FROM ew UNION ALL SELECT v AS u, u AS v FROM ew),
reach(a, b) AS (
  SELECT u, v FROM ee
  UNION
  SELECT r.a, ee.v FROM reach r JOIN ee ON r.b = ee.u)
SELECT a AS node, least(a, min(b)) AS label FROM reach GROUP BY a
"""


EXT_QUERIES.update({"q_graph_components": q_graph_components})
EXT_ORACLE_SQL.update({"q_graph_components": SQL_GRAPH_COMPONENTS})


# --- round-4 additions: range self-join, argmax, ROWS window, bloom semi,
# --- grouped string_agg ------------------------------------------------------


def q_repeat_orders_30d(sf_dir: str):
    """Repeat-purchase pairs: orders by the same customer placed within
    (0, 30] days of an earlier order — a bounded-horizon range SELF-join
    (stages/windows.range_self_join: hash-partition by customer +
    stride-offset kernel, no all-pairs blowup)."""
    import ray

    from phrasekit_ray.stages.windows import range_self_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )
    pairs = range_self_join(
        orders, key_col="o_custkey", ts_col="o_orderdate",
        id_col="o_orderkey", horizon=30 * 86_400 * 1_000_000,
    )
    return _i64(_collect(pairs), "left_o_orderkey", "right_o_orderkey")


SQL_REPEAT_ORDERS_30D = """
SELECT a.o_orderkey AS left_o_orderkey, b.o_orderkey AS right_o_orderkey
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderdate > a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
"""


def q_latest_event_per_user(sf_dir: str):
    """ARGMAX per group: each user's latest event (ts desc, event_id
    desc tiebreak) with its type and integer-cents value — the two-phase
    in-block-combiner argmax (stages/agg.grouped_argmax)."""
    import ray

    from phrasekit_ray.stages.agg import grouped_argmax

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )

    def derive(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"].combine_chunks().cast(pa.int64()),
                "ts_us": b["ts"].combine_chunks().cast(pa.int64()),
                "event_id": b["event_id"].combine_chunks().cast(pa.int64()),
                "event_type": b["event_type"].combine_chunks(),
                "cents": _round_away(
                    pc.multiply(b["value"].combine_chunks().cast(pa.float64()), 100.0)
                ).cast(pa.int64()),
            }
        )

    latest = grouped_argmax(
        ev.map_batches(derive, batch_format="pyarrow"),
        "user_id",
        ["ts_us", "event_id"],
        ["event_type", "cents"],
    )
    return _i64(
        _collect(latest), "user_id", "ts_us", "event_id", "cents"
    )


SQL_LATEST_EVENT_PER_USER = """
SELECT user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       event_id, event_type,
       CAST(round(value * 100.0) AS BIGINT) AS cents
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def q_events_moving_sum(sf_dir: str):
    """ROWS-frame window aggregate: per-user moving sum/count of the
    last 4 events (3 PRECEDING + current), float-order-proof integer
    cents (stages/windows.rows_window_sum)."""
    import ray

    from phrasekit_ray.stages.windows import rows_window_sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )
    return _i64(
        _collect(rows_window_sum(ev, preceding=3)),
        "event_id", "win_sum_cents", "win_n",
    )


SQL_EVENTS_MOVING_SUM = """
SELECT event_id,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) OVER w AS BIGINT)
         AS win_sum_cents,
       count(value) OVER w AS win_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def q_lineitem_small_parts(sf_dir: str):
    """Bloom-prefiltered EXACT semi join (stages/agg.bloom_semi_join):
    lineitem rows whose part has p_size <= 5, aggregated per returnflag.
    Result identical to a plain semi join — the Bloom only prefilters
    (broadcast ~12 bits/key instead of 64) and survivors verify
    exactly."""
    import ray

    from phrasekit_ray.stages.agg import bloom_semi_join, hash_aggregate

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_returnflag", "l_quantity"],
    )
    small = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
    ).map_batches(
        lambda b: b.filter(pc.less_equal(b["p_size"], 5)).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    kept = bloom_semi_join(li, small, "l_partkey", "p_partkey")

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "n_rows": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "sum_qty": _round_away(b["l_quantity"].combine_chunks()).cast(
                    pa.int64()
                ),
            }
        )

    agg = hash_aggregate(
        kept.map_batches(prep, batch_format="pyarrow"),
        "l_returnflag",
        [("n_rows", "sum"), ("sum_qty", "sum")],
    )
    return _i64(_collect(agg), "n_rows", "sum_qty")


SQL_LINEITEM_SMALL_PARTS = """
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
GROUP BY l_returnflag
"""


def q_event_types_per_user(sf_dir: str):
    """Grouped string_agg: per user bucket the sorted-distinct event
    types joined with ',' (stages/agg.grouped_string_agg — in-block
    distinct, Arrow ListArray + binary_join, no per-group Python)."""
    import ray

    from phrasekit_ray.stages.agg import grouped_string_agg

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).map_batches(
        lambda b: pa.table(
            {
                "user_bucket": pa.array(
                    b["user_id"].combine_chunks().cast(pa.int64()).to_numpy()
                    % 100,
                    pa.int64(),
                ),
                "event_type": b["event_type"].combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )
    agg = grouped_string_agg(
        ev, "user_bucket", "event_type", sep=",", out_col="types"
    )
    return _i64(_collect(agg), "user_bucket")


SQL_EVENT_TYPES_PER_USER = """
SELECT user_id % 100 AS user_bucket,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
FROM events GROUP BY user_id % 100
"""


EXT_QUERIES.update(
    {
        "q_repeat_orders_30d": q_repeat_orders_30d,
        "q_latest_event_per_user": q_latest_event_per_user,
        "q_events_moving_sum": q_events_moving_sum,
        "q_lineitem_small_parts": q_lineitem_small_parts,
        "q_event_types_per_user": q_event_types_per_user,
    }
)
EXT_ORACLE_SQL.update(
    {
        "q_repeat_orders_30d": SQL_REPEAT_ORDERS_30D,
        "q_latest_event_per_user": SQL_LATEST_EVENT_PER_USER,
        "q_events_moving_sum": SQL_EVENTS_MOVING_SUM,
        "q_lineitem_small_parts": SQL_LINEITEM_SMALL_PARTS,
        "q_event_types_per_user": SQL_EVENT_TYPES_PER_USER,
    }
)


# --- round-4 additions (2): time-weighted avg, Q10 composition, histogram ---


def q_events_time_weighted(sf_dir: str):
    """Per-user step-function value integral (time-weighted numerator ×
    observed span, exact integer µs·cents) — stages/windows.
    time_weighted_sum partition-run kernel; SQL lead()-window twin."""
    import ray

    from phrasekit_ray.stages.windows import time_weighted_sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )
    return _i64(
        _collect(time_weighted_sum(ev)), "user_id", "twa_num_us", "span_us"
    )


SQL_EVENTS_TIME_WEIGHTED = """
WITH t AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(round(value * 100.0) AS BIGINT) AS cents, event_id
  FROM events),
w AS (
  SELECT user_id, cents, ts_us,
         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           - ts_us AS dt_us
  FROM t)
SELECT user_id,
       CAST(coalesce(sum(cents * dt_us), 0) AS BIGINT) AS twa_num_us,
       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us
FROM w GROUP BY user_id
"""


def q_returned_revenue_by_nation(sf_dir: str):
    """TPC-H-Q10-flavored multi-join composition: revenue of RETURNED
    lineitems per customer nation — per-orderkey in-block pre-aggregate,
    two int-keyed lookup_joins (orders, customer), re-aggregate at each
    hop so only shrinking aggregates shuffle, nation names attached from
    a 25-row broadcast map."""
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate, lookup_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def returned_cents(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], "R"))
        rev = _round_away(
            pc.multiply(
                pc.multiply(
                    t["l_extendedprice"].combine_chunks().cast(pa.float64()),
                    pc.subtract(
                        pa.scalar(1.0),
                        t["l_discount"].combine_chunks().cast(pa.float64()),
                    ),
                ),
                100.0,
            )
        ).cast(pa.int64())
        out = pa.table(
            {"l_orderkey": t["l_orderkey"], "revenue_cents": rev}
        )
        return out.group_by(["l_orderkey"]).aggregate(
            [("revenue_cents", "sum")]
        ).rename_columns(["l_orderkey", "revenue_cents"])

    per_order = hash_aggregate(
        li.map_batches(returned_cents, batch_format="pyarrow"),
        "l_orderkey",
        [("revenue_cents", "sum")],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    # shuffle-fed left sides: pass the known schema so lookup_join's
    # schema probe can't execute the whole upstream aggregation twice
    with_cust = lookup_join(
        per_order,
        orders,
        "l_orderkey",
        "o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("revenue_cents", pa.int64())]
        ),
    )
    per_cust = hash_aggregate(with_cust, "o_custkey", [("revenue_cents", "sum")])
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    with_nat = lookup_join(
        per_cust,
        customer,
        "o_custkey",
        "c_custkey",
        left_schema=pa.schema(
            [("o_custkey", pa.int64()), ("revenue_cents", pa.int64())]
        ),
    )
    per_nation = hash_aggregate(
        with_nat, "c_nationkey", [("revenue_cents", "sum")]
    )
    nation = _collect(
        ray.data.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
    )
    names = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )

    def attach_name(b: pa.Table) -> pa.Table:
        keys = b["c_nationkey"].to_pylist()
        return pa.table(
            {
                "n_name": pa.array([names[k] for k in keys], pa.string()),
                "revenue_cents": b["revenue_cents"],
            }
        )

    return _i64(
        _collect(per_nation.map_batches(attach_name, batch_format="pyarrow")),
        "revenue_cents",
    )


SQL_RETURNED_REVENUE_BY_NATION = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100.0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY n_name
"""


def q_events_value_histogram_quantiles(sf_dir: str):
    """Mergeable-sketch quantiles: deterministic fixed-width integer
    histogram (stages/agg.histogram_quantiles — bucket counts ADD across
    blocks, ≤1024 rows shuffle, error ≤ one bucket width) with a
    bit-exact SQL twin reproducing the same integer bucket math."""
    import ray

    from phrasekit_ray.stages.agg import histogram_quantiles

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return histogram_quantiles(ev, "value", [0.25, 0.5, 0.75, 0.99])


SQL_EVENTS_VALUE_HISTOGRAM_QUANTILES = """
WITH c AS (
  SELECT CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
mm AS (SELECT min(cents) AS lo, max(cents) AS hi, count(*) AS total FROM c),
pw AS (SELECT lo, total,
              GREATEST(1, (hi - lo + 1 + 1023) // 1024) AS w FROM mm),
h AS (SELECT (c.cents - pw.lo) // pw.w AS bucket, count(*) AS n
      FROM c, pw GROUP BY 1),
cum AS (SELECT bucket, sum(n) OVER (ORDER BY bucket) AS csum FROM h),
fr(fraction_pct, f1000) AS (VALUES (25, 250), (50, 500), (75, 750), (99, 990)),
ranks AS (
  SELECT fraction_pct,
         GREATEST(1, LEAST(pw.total, (f1000 * pw.total + 999) // 1000))
           AS rank, pw.lo, pw.w
  FROM fr, pw)
SELECT CAST(r.fraction_pct AS BIGINT) AS fraction_pct,
       CAST(r.lo + min(cum.bucket) * r.w AS BIGINT) AS est_cents
FROM ranks r JOIN cum ON cum.csum >= r.rank
GROUP BY r.fraction_pct, r.lo, r.w
"""


EXT_QUERIES.update(
    {
        "q_events_time_weighted": q_events_time_weighted,
        "q_returned_revenue_by_nation": q_returned_revenue_by_nation,
        "q_events_value_histogram_quantiles": q_events_value_histogram_quantiles,
    }
)
EXT_ORACLE_SQL.update(
    {
        "q_events_time_weighted": SQL_EVENTS_TIME_WEIGHTED,
        "q_returned_revenue_by_nation": SQL_RETURNED_REVENUE_BY_NATION,
        "q_events_value_histogram_quantiles": SQL_EVENTS_VALUE_HISTOGRAM_QUANTILES,
    }
)


def q_click_purchase_attribution(sf_dir: str):
    """Stream-stream attribution: every (click, purchase) pair by the
    same user with the purchase 0–15 minutes after the click — the
    two-table bounded range join (stages/windows.range_join: one
    conformed-union key shuffle + per-partition stride kernel)."""
    import ray

    from phrasekit_ray.stages.windows import range_join

    def side(event_type):
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        ).map_batches(
            lambda b, et=event_type: b.filter(
                pc.equal(b["event_type"], et)
            ).select(["user_id", "ts", "event_id"]),
            batch_format="pyarrow",
        )

    pairs = range_join(
        side("click"), side("purchase"),
        key_col="user_id", ts_col="ts", id_col="event_id",
        horizon=15 * 60 * 1_000_000,
    )
    return _i64(_collect(pairs), "left_event_id", "right_event_id")


SQL_CLICK_PURCHASE_ATTRIBUTION = """
SELECT c.event_id AS left_event_id, p.event_id AS right_event_id
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 15 MINUTE
"""


EXT_QUERIES.update(
    {"q_click_purchase_attribution": q_click_purchase_attribution}
)
EXT_ORACLE_SQL.update(
    {"q_click_purchase_attribution": SQL_CLICK_PURCHASE_ATTRIBUTION}
)


# --- round-4 additions (3): funnel, mode, z-score, chunking, dup n-grams ---


def q_events_funnel(sf_dir: str):
    """Sequential view→click→purchase funnel: per step, users who
    completed the chain in strict ts order (stages/windows.funnel_counts
    — K vectorized passes per user-hash partition, K-row final sum)."""
    import ray

    from phrasekit_ray.stages.windows import funnel_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    return _collect(funnel_counts(ev, ["view", "click", "purchase"]))


SQL_EVENTS_FUNNEL = """
WITH t0 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type='view' GROUP BY user_id),
t1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN t0 ON e.user_id = t0.user_id AND e.ts > t0.t
       WHERE e.event_type='click' GROUP BY e.user_id),
t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
       WHERE e.event_type='purchase' GROUP BY e.user_id)
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'view',     (SELECT CAST(count(*) AS BIGINT) FROM t0)),
  (CAST(1 AS BIGINT), 'click',    (SELECT CAST(count(*) AS BIGINT) FROM t1)),
  (CAST(2 AS BIGINT), 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM t2))
) AS v(step_idx, step, users)
"""


def q_mode_event_type(sf_dir: str):
    """MODE per user bucket: most frequent event_type, tie → smallest
    (stages/agg.grouped_mode — two-phase count, candidate-only second
    exchange)."""
    import ray

    from phrasekit_ray.stages.agg import grouped_mode

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).map_batches(
        lambda b: pa.table(
            {
                "bucket": pa.array(
                    b["user_id"].combine_chunks().cast(pa.int64()).to_numpy()
                    % 16,
                    pa.int64(),
                ),
                "event_type": b["event_type"].combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )
    return _collect(grouped_mode(ev, "bucket", "event_type"))


SQL_MODE_EVENT_TYPE = """
SELECT user_id % 16 AS bucket, event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
QUALIFY row_number() OVER (
  PARTITION BY bucket ORDER BY n DESC, event_type ASC) = 1
"""


def q_events_value_zscore(sf_dir: str):
    """Per-bucket z-score of event value (stages/agg.grouped_zscore —
    exact int64 moment sums through one two-phase aggregate, group
    stats re-attached via broadcast lookup_join, pinned float64
    finalize → micro-int output)."""
    import ray

    from phrasekit_ray.stages.agg import grouped_zscore

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    ).map_batches(
        lambda b: pa.table(
            {
                "bucket": pa.array(
                    b["user_id"].combine_chunks().cast(pa.int64()).to_numpy()
                    % 16,
                    pa.int64(),
                ),
                "event_id": b["event_id"].combine_chunks().cast(pa.int64()),
                "value": b["value"].combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )
    out = _collect(grouped_zscore(ev, "bucket", "value"))
    return out.select(["event_id", "bucket", "v", "zscore_micro"])


SQL_EVENTS_VALUE_ZSCORE = """
WITH t AS (SELECT event_id, user_id % 16 AS bucket,
                  CAST(round(value * 100) AS BIGINT) AS v FROM events),
s AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(v * v) AS BIGINT) AS svv
      FROM t GROUP BY bucket)
SELECT event_id, bucket, v,
  CAST(round((CAST(v AS DOUBLE) - CAST(sv AS DOUBLE)/n)
       / sqrt(CAST(svv AS DOUBLE)/n
              - (CAST(sv AS DOUBLE)/n) * (CAST(sv AS DOUBLE)/n))
       * 1000000.0) AS BIGINT) AS zscore_micro
FROM t JOIN s USING (bucket)
"""


def q_doc_chunks(sf_dir: str):
    """Strided training-window chunking: 32-token windows every 24
    tokens per document (stages/chunk.chunk_windows — stateless
    repeat/gather explode, no shuffle)."""
    import ray

    from phrasekit_ray.stages.chunk import chunk_windows

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return _collect(chunk_windows(docs, window=32, stride=24))


SQL_DOC_CHUNKS = """
WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  string_split(text, ' ') AS tk FROM documents),
g AS (SELECT doc_id, tk,
             1 + 24 * unnest(generate_series(
               0, CAST(ceil(greatest(len(tk) - 32, 0) / 24.0) AS BIGINT)
             )) AS s FROM t)
SELECT doc_id, CAST((s - 1) / 24 AS BIGINT) AS chunk_idx,
       array_to_string(tk[s:least(s + 31, len(tk))], ' ') AS chunk_text,
       CAST(least(32, len(tk) - s + 1) AS BIGINT) AS n_tokens
FROM g
"""


def q_dup_ngram_docs(sf_dir: str):
    """Substring-dedup signal: per doc, distinct 5-token shingles shared
    with another doc (stages/dedup.dup_ngram_docs — shingle-partitioned
    distinct + segment masks, two exchanges, zero joins)."""
    from phrasekit_ray.stages.dedup import dup_ngram_docs

    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return _collect(dup_ngram_docs(docs, k=5))


SQL_DUP_NGRAM_DOCS = """
WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  string_split(text, ' ') AS tk FROM documents),
s AS (SELECT doc_id, array_to_string(tk[i:i+4], ' ') AS sh
      FROM t, unnest(generate_series(1, len(tk) - 4)) AS g(i)),
d AS (SELECT DISTINCT doc_id, sh FROM s),
bad AS (SELECT sh FROM d GROUP BY sh HAVING count(DISTINCT doc_id) >= 2)
SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_shingles
FROM d JOIN bad USING (sh) GROUP BY doc_id
"""


EXT_QUERIES.update(
    {
        "q_events_funnel": q_events_funnel,
        "q_mode_event_type": q_mode_event_type,
        "q_events_value_zscore": q_events_value_zscore,
        "q_doc_chunks": q_doc_chunks,
        "q_dup_ngram_docs": q_dup_ngram_docs,
    }
)
EXT_ORACLE_SQL.update(
    {
        "q_events_funnel": SQL_EVENTS_FUNNEL,
        "q_mode_event_type": SQL_MODE_EVENT_TYPE,
        "q_events_value_zscore": SQL_EVENTS_VALUE_ZSCORE,
        "q_doc_chunks": SQL_DOC_CHUNKS,
        "q_dup_ngram_docs": SQL_DUP_NGRAM_DOCS,
    }
)


def q_quality_filter(sf_dir: str):
    """Bottom-tail length gate: documents whose whitespace token count
    is ≥ the corpus-global p25 (stages/agg.quantile_filter — distinct-
    value exchange for the threshold, one scalar back, stateless
    filter)."""
    from phrasekit_ray.pipelines.queries import _i64 as _i
    from phrasekit_ray.stages import textstats
    from phrasekit_ray.stages.agg import quantile_filter

    # quantile_filter consumes its input twice (threshold pass + filter
    # pass): pin the tokenize/count output so documents aren't re-split
    counts = textstats.token_counts(_docs(sf_dir)).materialize()
    return _i(
        _collect(quantile_filter(counts, "n_tokens", 0.25)),
        "doc_id", "n_tokens",
    )


SQL_QUALITY_FILTER = """
WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
                  AS n_tokens FROM documents)
SELECT doc_id, n_tokens FROM t
WHERE n_tokens >= (SELECT quantile_cont(n_tokens, 0.25) FROM t)
"""


EXT_QUERIES.update({"q_quality_filter": q_quality_filter})
EXT_ORACLE_SQL.update({"q_quality_filter": SQL_QUALITY_FILTER})


def q_weighted_sample(sf_dir: str):
    """Importance-weighted corpus subsample: 50 documents drawn WITHOUT
    replacement with probability ∝ n_chars (stages/agg.weighted_sample —
    Efraimidis–Spirakis exponential race on a seeded id hash; in-block
    top-k prune, one candidate reduce, no shuffle of the corpus). The
    seeded-hash key makes the draw a pure function of (doc_id, n_chars,
    seed), so the SQL twin reproduces it exactly."""
    import ray

    from phrasekit_ray.pipelines.queries import _i64 as _i
    from phrasekit_ray.stages.agg import weighted_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return _i(
        _collect(weighted_sample(docs, 50, "n_chars", "doc_id")),
        "doc_id", "n_chars",
    )


# the same splitmix-style hash chain as q_sample_docs_per_lang (see
# queries.py for the 32-bit-split second multiply), then the A-ES race
# key -ln((rnk+0.5)/2^64)/weight, k smallest win
SQL_WEIGHTED_SAMPLE = """
WITH a AS (SELECT doc_id, n_chars,
  CAST(((CAST(doc_id AS HUGEINT) + 17) * 11400714819323198485) %
       18446744073709551616 AS UBIGINT) AS h1 FROM documents),
x AS (SELECT doc_id, n_chars, CAST(xor(h1, h1 >> 31) AS HUGEINT) AS hx
      FROM a),
b AS (SELECT doc_id, n_chars,
  ((hx % 4294967296) * 484763065 +
   (((hx % 4294967296) * 3210233709 + (hx // 4294967296) * 484763065)
    % 4294967296) * 4294967296) % 18446744073709551616 AS rnk FROM x),
kx AS (SELECT doc_id, n_chars,
  -ln((CAST(rnk AS DOUBLE) + 0.5) / 18446744073709551616.0)
   / CAST(n_chars AS DOUBLE) AS race
  FROM b WHERE n_chars > 0)
SELECT doc_id, n_chars FROM kx ORDER BY race ASC, doc_id LIMIT 50
"""


EXT_QUERIES.update({"q_weighted_sample": q_weighted_sample})
EXT_ORACLE_SQL.update({"q_weighted_sample": SQL_WEIGHTED_SAMPLE})


def q_link_hostgraph(sf_dir: str):
    """Host-level web link graph (X104): pages-with-outlinks → vectorized
    href extraction from html BYTES (stages/extract.extract_links — split
    + RE2 kernels, junk/relative/mailto dropped, fragments stripped) →
    host(src), host(dst) → two-phase grouped edge-weight count.

    Differential design: the fixture embeds outlinks via the repo's
    seeded splitmix chain; the Ray side only ever PARSES the html while
    the SQL twin recomputes the embedded set from the generation rule —
    extraction bugs (junk leakage, fragment retention, off-by-one on the
    closing quote) surface as value mismatches."""
    import ray  # noqa: F401

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.extract import extract_links, host_edges

    pages = pages_from_documents(sf_dir, with_links=True)
    t = _collect(host_edges(extract_links(pages)))
    idx = pc.sort_indices(
        t, sort_keys=[("src_host", "ascending"), ("dst_host", "ascending")]
    )
    return _i64(t.take(idx), "n")


def _sm_sql(x: str) -> str:
    """DuckDB twin of sources.pages.splitmix17 over HUGEINT expression
    ``x`` (the 32-bit-split second multiply — see queries.py
    q_sample_docs_per_lang for the derivation). All mod-2^64 / mod-2^32
    reductions are bitwise AND / shift, not ``%`` / ``//``: HUGEINT
    DivMod is the hot instruction when a twin evaluates millions of
    hashes (the X155 wedge-sample twin walks ~14M wedges at sf0.01) and
    the mask form is ~10× cheaper for identical values (inputs are
    always non-negative here, where AND-mask ≡ mod)."""
    h1 = (
        f"CAST((({x} + 17) * 11400714819323198485) & "
        "18446744073709551615 AS UBIGINT)"
    )
    hx = f"CAST(xor({h1}, {h1} >> 31) AS HUGEINT)"
    return (
        f"((({hx}) & 4294967295) * 484763065 + "
        f"(((({hx}) & 4294967295) * 3210233709 + "
        f"(({hx}) >> 32) * 484763065) "
        "& 4294967295) * 4294967296) & 18446744073709551615"
    )


# recompute the embedded outlink set from the generation rule:
# n_links = 1 + sm(8d+7) % 3; slot j∈1..3 target t = sm(8d+j) % 100003;
# src host = source.example.org, dst host = h{t%16}.example.org
SQL_LINK_HOSTGRAPH = f"""
WITH s AS (SELECT doc_id, source, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT source, j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s)
SELECT source || '.example.org' AS src_host,
       'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS dst_host,
       COUNT(*) AS n
FROM l WHERE j <= n_links
GROUP BY 1, 2 ORDER BY 1, 2
"""



def _sm_sql_wide(x: str) -> str:
    """Full-width DuckDB splitmix twin for inputs up to 2^64 (e.g. md5
    token hashes): BOTH multiplies run as 32-bit splits so no INT128
    overflow. ``x`` must be a HUGEINT expression in [0, 2^64). Same
    AND-mask/shift form as _sm_sql (HUGEINT DivMod is the hot
    instruction at millions of hashes; masks are ~10× cheaper)."""
    y = f"((({x}) + 17) & 18446744073709551615)"
    yl = f"(({y}) & 4294967295)"
    yh = f"(({y}) >> 32)"
    # C1 = 0x9E3779B97F4A7C15 -> lo 2135587861, hi 2654435769
    h1 = (
        f"(({yl}) * 2135587861 + "
        f"((({yl}) * 2654435769 + ({yh}) * 2135587861) & 4294967295) "
        f"* 4294967296) & 18446744073709551615"
    )
    hx = f"CAST(xor(CAST(({h1}) AS UBIGINT), CAST(({h1}) AS UBIGINT) >> 31) AS HUGEINT)"
    # C2 = 0xBF58476D1CE4E5B9 -> lo 484763065, hi 3210233709
    return (
        f"((({hx}) & 4294967295) * 484763065 + "
        f"(((({hx}) & 4294967295) * 3210233709 + "
        f"(({hx}) >> 32) * 484763065) "
        f"& 4294967295) * 4294967296) & 18446744073709551615"
    )


EXT_QUERIES.update({"q_link_hostgraph": q_link_hostgraph})
EXT_ORACLE_SQL.update({"q_link_hostgraph": SQL_LINK_HOSTGRAPH})


def q_host_pagerank(sf_dir: str):
    """Host-level PageRank over the extracted web link graph (X104 →
    X49 composition): html bytes → outlink edges → host edge weights →
    distributed power iteration (stages/kg.pagerank: per-round ONE
    int-keyed lookup_join + ONE two-phase aggregate, driver holds only
    scalars). Host strings become int64 node ids via the engine's
    vectorized 64-bit rolling hash; names re-attach with one lookup_join.

    Rows-only (float ranks aren't hash-stable across summation orders);
    the quality metric is IN-BAND like q_pagerank_top: every row carries
    max|Δ| (×1e12) vs an independent sparse numpy power iteration over
    the host-pair edge table (bounded: distinct host PAIRS, i.e.
    domain-cardinality-sized, never the corpus)."""
    import ray  # noqa: F401

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages import kg as kgstage
    from phrasekit_ray.stages.agg import (
        hash_aggregate,
        hash_string_array64,
        lookup_join,
    )
    from phrasekit_ray.stages.extract import extract_links, host_edges

    pages = pages_from_documents(sf_dir, with_links=True)
    hostedges = host_edges(extract_links(pages)).materialize()

    def with_ids(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": pa.array(
                    hash_string_array64(b["src_host"]).astype(np.int64)
                ),
                "obj": pa.array(
                    hash_string_array64(b["dst_host"]).astype(np.int64)
                ),
                "weight": b["n"].cast(pa.float64()),
            }
        )

    ranks = kgstage.pagerank(
        hostedges.map_batches(with_ids, batch_format="pyarrow"), iterations=6
    )

    # node-id → host-name dimension (distinct hosts, tiny), one lookup_join
    def name_rows(b: pa.Table) -> pa.Table:
        host = pa.concat_arrays(
            [
                b["src_host"].combine_chunks().cast(pa.string()),
                b["dst_host"].combine_chunks().cast(pa.string()),
            ]
        )
        return pa.table(
            {
                "node": pa.array(hash_string_array64(host).astype(np.int64)),
                "host": host,
                "_one": pa.array(np.ones(2 * b.num_rows, np.int64)),
            }
        )

    names = hash_aggregate(
        hostedges.map_batches(name_rows, batch_format="pyarrow"),
        ["node", "host"],
        [("_one", "sum")],
    ).drop_columns(["_one"])
    named = _collect(lookup_join(ranks, names, "node", "node"))

    # independent driver reference over the host-PAIR table (bounded)
    et = _collect(hostedges)
    subj = hash_string_array64(et["src_host"]).astype(np.int64)
    obj = hash_string_array64(et["dst_host"]).astype(np.int64)
    w = et["n"].combine_chunks().cast(pa.float64()).to_numpy()
    nodes_arr, inv = np.unique(np.concatenate([subj, obj]), return_inverse=True)
    s_idx, o_idx = inv[: len(subj)], inv[len(subj):]
    m = len(nodes_arr)
    outw = np.zeros(m)
    np.add.at(outw, s_idx, w)
    d = 0.85
    r = np.full(m, 1.0 / m) if m else np.zeros(0)
    for _ in range(6 if m else 0):
        dangling = r[outw == 0].sum()
        share = np.zeros(m)
        np.add.at(share, o_idx, r[s_idx] / outw[s_idx] * w)
        r = (1 - d) / m + d * (share + dangling / m)
    ref = dict(zip(nodes_arr.tolist(), r.tolist()))
    got_nodes = named["node"].combine_chunks().cast(pa.int64()).to_numpy()
    got_ranks = np.asarray(named["rank"].to_pylist(), dtype=np.float64)
    max_delta = float(
        np.max(np.abs(got_ranks - np.asarray([ref.get(int(x), 0.0) for x in got_nodes])))
        if len(got_nodes)
        else 0.0
    )

    order = pc.sort_indices(
        named, sort_keys=[("rank", "descending"), ("host", "ascending")]
    )
    top = named.take(order.slice(0, 20))
    return pa.table(
        {
            "host": top["host"].cast(pa.string()),
            "rank_e9": pa.array(
                np.round(np.asarray(top["rank"].to_pylist()) * 1e9).astype(
                    np.int64
                ),
                pa.int64(),
            ),
            "max_abs_delta_e12": pa.array(
                np.full(top.num_rows, round(max_delta * 1e12), dtype=np.int64),
                pa.int64(),
            ),
        }
    )


EXT_QUERIES.update({"q_host_pagerank": q_host_pagerank})


def q_mix_corpora(sf_dir: str):
    """Deterministic training-mixture resample (X106): per-source rates
    {K%4: 0.5 / 1.0 / 1.5 / 2.3} applied as hash-gated subsample /
    oversample in ONE stateless map_batches pass (stages/mix.py) — no
    shuffle, reproducible across partitionings; the copy column is the
    epoch index of an oversampled row."""
    import ray

    from phrasekit_ray.stages.mix import mix_corpora

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    rates = {f"src{k}": [0.5, 1.0, 1.5, 2.3][k % 4] for k in range(64)}
    t = _collect(mix_corpora(docs, "source", rates, "doc_id"))
    idx = pc.sort_indices(
        t, sort_keys=[("doc_id", "ascending"), ("copy", "ascending")]
    )
    return _i64(t.take(idx), "doc_id")


SQL_MIX_CORPORA = f"""
WITH r AS (SELECT doc_id, source,
  CASE (CAST(substr(source, 4) AS INT) % 4)
    WHEN 0 THEN 0.5 WHEN 1 THEN 1.0 WHEN 2 THEN 1.5 ELSE 2.3 END AS rate,
  ({_sm_sql('CAST(doc_id AS HUGEINT)')}) AS rnk FROM documents),
c AS (SELECT doc_id, source,
  CAST(floor(rate) AS INT) +
  (CASE WHEN (CAST(rnk AS DOUBLE) + 0.5) / 18446744073709551616.0
             < rate - floor(rate) THEN 1 ELSE 0 END) AS n FROM r)
SELECT doc_id, source, CAST(j - 1 AS INT) AS copy
FROM c, generate_series(1, 3) AS g(j) WHERE j <= n
ORDER BY doc_id, copy
"""


EXT_QUERIES.update({"q_mix_corpora": q_mix_corpora})
EXT_ORACLE_SQL.update({"q_mix_corpora": SQL_MIX_CORPORA})


def q_contamination_fraction(sf_dir: str):
    """Graded benchmark-contamination audit (X107): en training docs vs
    the de 'benchmark', per-doc distinct shared 3-shingles, total
    distinct 3-shingles (computed in-block, zero shuffle) and the
    contamination fraction in integer basis points."""
    from phrasekit_ray.pipelines.queries import _docs
    from phrasekit_ray.stages import dedup
    from phrasekit_ray.stages.extract import tokenize_documents

    train = tokenize_documents(_docs(sf_dir, lang="en"))
    bench = tokenize_documents(_docs(sf_dir, lang="de"))
    t = _collect(dedup.contamination_fraction(train, bench, k=3))
    idx = pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])
    return _i64(t.take(idx), "doc_id", "n_shared", "n_total", "contam_bp")


SQL_CONTAMINATION_FRACTION = """
WITH tt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
  generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents WHERE lang = 'en'),
bt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
  generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents WHERE lang = 'de'),
tsh AS (SELECT DISTINCT t0.doc_id,
  t0.tok || ' ' || t1.tok || ' ' || t2.tok AS s FROM tt t0
  JOIN tt t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
  JOIN tt t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2),
bsh AS (SELECT DISTINCT t0.tok || ' ' || t1.tok || ' ' || t2.tok AS s
  FROM bt t0
  JOIN bt t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
  JOIN bt t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2),
tot AS (SELECT doc_id, COUNT(*) AS n_total FROM tsh GROUP BY 1),
sh AS (SELECT tsh.doc_id, COUNT(*) AS n_shared
       FROM tsh JOIN bsh USING (s) GROUP BY 1)
SELECT sh.doc_id, sh.n_shared, tot.n_total,
       (10000 * sh.n_shared) // tot.n_total AS contam_bp
FROM sh JOIN tot USING (doc_id) ORDER BY doc_id
"""


EXT_QUERIES.update({"q_contamination_fraction": q_contamination_fraction})
EXT_ORACLE_SQL.update(
    {"q_contamination_fraction": SQL_CONTAMINATION_FRACTION}
)


def q_excise_dup_spans(sf_dir: str):
    """Duplicate-span excision over the corpus (X108): remove every
    token covered by a corpus-duplicated 5-token shingle, return the
    cleaned text + removed-token count per doc. Two exchanges, zero
    joins (see stages/dedup.excise_duplicate_spans)."""
    import ray

    from phrasekit_ray.stages.dedup import excise_duplicate_spans

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    t = _collect(excise_duplicate_spans(docs, k=5))
    return _i64(
        t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])),
        "doc_id",
        "n_removed",
    )


SQL_EXCISE_DUP_SPANS = """
WITH tt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
  generate_subscripts(string_split(text, ' '), 1) AS pos FROM documents),
sh AS (SELECT t0.doc_id, t0.pos,
  t0.tok || ' ' || t1.tok || ' ' || t2.tok || ' ' || t3.tok || ' ' || t4.tok AS s
  FROM tt t0
  JOIN tt t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
  JOIN tt t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2
  JOIN tt t3 ON t3.doc_id = t0.doc_id AND t3.pos = t0.pos + 3
  JOIN tt t4 ON t4.doc_id = t0.doc_id AND t4.pos = t0.pos + 4),
dup AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2),
st AS (SELECT sh.doc_id, sh.pos FROM sh JOIN dup USING (s)),
cov AS (SELECT DISTINCT tt.doc_id, tt.pos FROM tt
        JOIN st ON st.doc_id = tt.doc_id
               AND tt.pos BETWEEN st.pos AND st.pos + 4),
kept AS (SELECT tt.doc_id, tt.pos, tt.tok FROM tt
         LEFT JOIN cov ON cov.doc_id = tt.doc_id AND cov.pos = tt.pos
         WHERE cov.doc_id IS NULL),
agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
        FROM kept GROUP BY doc_id),
rem AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id)
SELECT d.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       COALESCE(r.n_removed, 0) AS n_removed
FROM documents d
LEFT JOIN agg a USING (doc_id) LEFT JOIN rem r USING (doc_id)
ORDER BY d.doc_id
"""


EXT_QUERIES.update({"q_excise_dup_spans": q_excise_dup_spans})
EXT_ORACLE_SQL.update({"q_excise_dup_spans": SQL_EXCISE_DUP_SPANS})


def q_dedup_keep_best(sf_dir: str):
    """Near-dup cluster representative selection (X109): the standard
    dedup OUTPUT policy — per MinHash-verified duplicate cluster, keep
    the highest-quality member (n_chars as the quality signal, smallest
    doc_id tiebreak). Composition: near_dedup_minhash clusters →
    int-keyed lookup_join to attach quality → two-phase grouped_argmax.
    The cluster mapping is cluster-members-sized (≪ corpus after
    verification); the join and argmax are fully distributed."""
    import ray

    from phrasekit_ray.pipelines.queries import _docs
    from phrasekit_ray.stages import dedup
    from phrasekit_ray.stages.agg import grouped_argmax, lookup_join
    from phrasekit_ray.stages.extract import tokenize_documents

    docs_tok = tokenize_documents(_docs(sf_dir))
    mapping = dedup.near_dedup_minhash(docs_tok, materialize_input=True)
    if not mapping:
        return pa.table(
            {
                "cluster": pa.array([], pa.int64()),
                "best_id": pa.array([], pa.int64()),
                "best_n_chars": pa.array([], pa.int64()),
            }
        )
    items = sorted(mapping.items())
    members = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([k for k, _ in items], pa.int64()),
                "cluster": pa.array([v for _, v in items], pa.int64()),
            }
        )
    )
    quality = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    joined = lookup_join(members, quality, "doc_id", "doc_id")

    def neg(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_negid",
            pc.negate(b["doc_id"].combine_chunks().cast(pa.int64())),
        )

    best = grouped_argmax(
        joined.map_batches(neg, batch_format="pyarrow"),
        "cluster",
        ["n_chars", "_negid"],
        ["doc_id"],
    )
    t = _collect(best)
    t = pa.table(
        {
            "cluster": t["cluster"].cast(pa.int64()),
            "best_id": t["doc_id"].cast(pa.int64()),
            "best_n_chars": t["n_chars"].cast(pa.int64()),
        }
    )
    return t.take(pc.sort_indices(t, sort_keys=[("cluster", "ascending")]))


def _sql_keep_best() -> str:
    from phrasekit_ray.pipelines.queries import _sql_minhash

    return f"""
WITH m AS ({_sql_minhash()}),
j AS (SELECT m.doc_id, m.rep_id AS cluster, d.n_chars
      FROM m JOIN documents d USING (doc_id))
SELECT cluster, doc_id AS best_id, n_chars AS best_n_chars FROM j
QUALIFY row_number() OVER (
  PARTITION BY cluster ORDER BY n_chars DESC, doc_id ASC) = 1
ORDER BY cluster
"""


EXT_QUERIES.update({"q_dedup_keep_best": q_dedup_keep_best})
EXT_ORACLE_SQL.update({"q_dedup_keep_best": _sql_keep_best()})


def q_random_projection(sf_dir: str):
    """JL signed random projection of the embeddings table (X110):
    8 exact-int64 Rademacher projections per vector (see
    stages/similarity.random_projection_sketch)."""
    import ray

    from phrasekit_ray.stages.similarity import random_projection_sketch

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = _collect(random_projection_sketch(emb, r=8))
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("vec_id", "ascending"), ("j", "ascending")]
        )
    )


SQL_RANDOM_PROJECTION = f"""
WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
  generate_subscripts(embedding, 1) - 1 AS d FROM embeddings),
c AS (SELECT vec_id, d, CAST(round(v * 32768.0) AS BIGINT) AS code FROM e),
s AS (SELECT c.vec_id, g.j, c.code,
      CASE WHEN (({_sm_sql('CAST(g.j AS HUGEINT)*1024 + CAST(c.d AS HUGEINT)')})
                 // 4294967296) % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM c, generate_series(0, 7) AS g(j))
SELECT vec_id, CAST(j AS BIGINT) AS j, CAST(SUM(code * sgn) AS BIGINT) AS proj
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


EXT_QUERIES.update({"q_random_projection": q_random_projection})
EXT_ORACLE_SQL.update({"q_random_projection": SQL_RANDOM_PROJECTION})


def q_quality_percent_rank(sf_dir: str):
    """Corpus-calibrated quality signal (X112): percentile rank of each
    doc's n_chars in exact integer micro-units — distinct-value
    compressed distribution, one broadcast, one searchsorted attach."""
    import ray

    from phrasekit_ray.stages.agg import percent_rank_column

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    t = _collect(percent_rank_column(docs, "n_chars"))
    return _i64(
        t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])),
        "doc_id", "n_chars", "pr_micro",
    )


SQL_QUALITY_PERCENT_RANK = """
SELECT doc_id, n_chars,
  (1000000 * (rank() OVER (ORDER BY n_chars) - 1))
    // GREATEST((COUNT(*) OVER ()) - 1, 1) AS pr_micro
FROM documents ORDER BY doc_id
"""


EXT_QUERIES.update({"q_quality_percent_rank": q_quality_percent_rank})
EXT_ORACLE_SQL.update({"q_quality_percent_rank": SQL_QUALITY_PERCENT_RANK})


def q_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval via Reciprocal Rank Fusion (X111 — Cormack et
    al. 2009): fuse the BM25 top-20 (lexical channel, distributed
    corpus scan) with the exact-cosine top-20 for the first embedding
    (dense channel, per-batch top-k + driver heap merge). Fusion score
    is exact integer micro-units ⌊10⁹/(60+rank)⌋ summed per channel, so
    the oracle hash-matches; the fusion itself runs on two top-k tables
    (driver-scalar-sized), never the corpus."""
    import numpy as _np

    from phrasekit_ray.pipelines.queries import _docs, _embeddings
    from phrasekit_ray.stages import similarity
    from phrasekit_ray.stages.lm import bm25_topk, top_tokens

    docs = _docs(sf_dir)
    bm = _collect(bm25_topk(docs, top_tokens(docs, k=3, offset=9)))
    bidx = pc.sort_indices(
        bm, sort_keys=[("bm25_micro", "descending"), ("doc_id", "ascending")]
    )
    bm = bm.take(bidx)
    bm_rank = {
        int(d): i + 1 for i, d in enumerate(bm["doc_id"].to_pylist())
    }

    emb = _embeddings(sf_dir)
    first = _collect(emb).sort_by("vec_id").slice(0, 1)
    qid = int(first["vec_id"][0].as_py())
    qvec = _np.asarray(first["embedding"].to_pylist(), dtype=_np.float32)
    kn = similarity.brute_force_topk(emb, qvec, [qid], k=20)
    kn_rank = {
        int(v): int(r)
        for v, r in zip(kn["vec_id"].to_pylist(), kn["rank"].to_pylist())
    }

    ids = sorted(set(bm_rank) | set(kn_rank))
    rows = []
    for d in ids:
        rb, rk = bm_rank.get(d, 0), kn_rank.get(d, 0)
        s = (10**9 // (60 + rb) if rb else 0) + (
            10**9 // (60 + rk) if rk else 0
        )
        rows.append((d, s, rb, rk))
    rows.sort(key=lambda x: (-x[1], x[0]))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "rrf_micro": pa.array([r[1] for r in rows], pa.int64()),
            "bm25_rank": pa.array([r[2] for r in rows], pa.int64()),
            "knn_rank": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


SQL_HYBRID_RRF = f"""
WITH bm AS ({SQL_BM25_SEARCH.strip().rstrip()}),
bmr AS (SELECT doc_id, row_number() OVER
        (ORDER BY bm25_micro DESC, doc_id ASC) AS r FROM bm),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      ORDER BY vec_id LIMIT 1),
sims AS (SELECT e.vec_id, list_cosine_similarity(q.qe, e.embedding) AS cos
         FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
knr AS (SELECT vec_id AS doc_id, row_number() OVER
        (ORDER BY cos DESC, vec_id ASC) AS r
        FROM sims ORDER BY cos DESC, vec_id ASC LIMIT 20)
SELECT COALESCE(bmr.doc_id, knr.doc_id) AS doc_id,
       COALESCE(1000000000 // (60 + bmr.r), 0)
         + COALESCE(1000000000 // (60 + knr.r), 0) AS rrf_micro,
       COALESCE(bmr.r, 0) AS bm25_rank,
       COALESCE(knr.r, 0) AS knn_rank
FROM bmr FULL OUTER JOIN knr USING (doc_id)
ORDER BY rrf_micro DESC, doc_id ASC
"""


EXT_QUERIES.update({"q_hybrid_rrf": q_hybrid_rrf})
EXT_ORACLE_SQL.update({"q_hybrid_rrf": SQL_HYBRID_RRF})


def q_graph_kcore(sf_dir: str):
    """k-core of the part co-occurrence graph (X113, k=75 — peels ~3%
    of nodes at sf0.01): iterative distributed degree-filter rounds
    (stages/kg.k_core). Rows-only (iterative deletion isn't expressible
    in a DuckDB recursive CTE); the quality metric is IN-BAND per the
    repo convention: every row carries the number of (node, degree)
    disagreements vs an EXACT driver-side peeling of the same edge
    table (expected 0), so the driver's artifact records the agreement."""
    import ray

    from phrasekit_ray.stages.kg import k_core

    edges = _basket_edges_ds(sf_dir).materialize()
    t = _collect(k_core(edges, k=75))

    # exact driver reference over the basket-edge table, BOUNDED: the
    # Python peel is O(E) per round — only run it when the pull is
    # oracle-scale (sf≤0.01 ≈ 65k edges); above the bound emit -1
    # ("reference not computed"), never a corpus-sized driver loop
    et = pa.concat_tables(ray.get(edges.to_arrow_refs()))
    if et.num_rows <= 300_000:
        a = et.column(0).cast(pa.int64()).to_numpy()
        b = et.column(1).cast(pa.int64()).to_numpy()
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        E = {(int(x), int(y)) for x, y in zip(lo, hi) if x != y}
        import collections

        deg: collections.Counter = collections.Counter()
        for x, y in E:
            deg[x] += 1
            deg[y] += 1
        while True:
            bad = {n for n, d in deg.items() if d < 75}
            if not bad:
                break
            E = {(x, y) for x, y in E if x not in bad and y not in bad}
            deg = collections.Counter()
            for x, y in E:
                deg[x] += 1
                deg[y] += 1
        ref = dict(deg)
        got = dict(
            zip(
                t["node"].cast(pa.int64()).to_pylist(),
                t["degree"].cast(pa.int64()).to_pylist(),
            )
        )
        mism = sum(1 for n, d in got.items() if ref.get(n) != d) + sum(
            1 for n in ref if n not in got
        )
    else:
        mism = -1
    t = _i64(
        t.take(pc.sort_indices(t, sort_keys=[("node", "ascending")])),
        "node",
        "degree",
    )
    return t.append_column(
        "ref_mismatches",
        pa.array(np.full(t.num_rows, mism, dtype=np.int64), pa.int64()),
    )


EXT_QUERIES.update({"q_graph_kcore": q_graph_kcore})


def q_graph_assortativity(sf_dir: str):
    """Degree assortativity of the part co-occurrence graph (X114 —
    Newman 2002: Pearson corr of endpoint degrees over both edge
    orientations). A rare ORACLE-CHECKABLE graph metric: degrees via
    one two-phase aggregate, two int-keyed lookup_joins attach (du, dv)
    to edges, both orientations feed grouped_corr's exact int64 moment
    sums, finalize fixes to micro-units."""
    import ray  # noqa: F401

    from phrasekit_ray.stages.agg import (
        grouped_corr,
        hash_aggregate,
        lookup_join,
    )

    raw = _basket_edges_ds(sf_dir)
    # cooccurrence_edges may repeat a pair seen in different baskets;
    # assortativity (like the SQL twin) is over DISTINCT edges
    edges = (
        hash_aggregate(
            raw.map_batches(
                lambda b: pa.table(
                    {
                        "subj": b["subj"].combine_chunks().cast(pa.int64()),
                        "obj": b["obj"].combine_chunks().cast(pa.int64()),
                        "_one": pa.array(np.ones(b.num_rows, np.int64)),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["subj", "obj"],
            [("_one", "sum")],
        )
        .drop_columns(["_one"])
        .materialize()
    )

    def halves(b: pa.Table) -> pa.Table:
        node = pa.concat_arrays(
            [
                b["subj"].combine_chunks().cast(pa.int64()),
                b["obj"].combine_chunks().cast(pa.int64()),
            ]
        )
        return pa.table(
            {"node": node, "_one": pa.array(np.ones(len(node), np.int64))}
        )

    deg = hash_aggregate(
        edges.map_batches(halves, batch_format="pyarrow"),
        ["node"],
        [("_one", "sum")],
    ).map_batches(
        lambda b: pa.table({"node": b["node"], "d": b["_one"]}),
        batch_format="pyarrow",
    )

    ue = lookup_join(edges, deg, "subj", "node")
    ue = ue.map_batches(
        lambda b: pa.table(
            {"subj": b["subj"], "obj": b["obj"], "du": b["d"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    be = lookup_join(ue, deg, "obj", "node")

    def orient(b: pa.Table) -> pa.Table:
        du = b["du"].combine_chunks().cast(pa.int64())
        dv = b["d"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "_g": pa.array(np.zeros(2 * b.num_rows, np.int64)),
                "x": pa.concat_arrays([du, dv]),
                "y": pa.concat_arrays([dv, du]),
            }
        )

    t = _collect(
        grouped_corr(
            be.map_batches(orient, batch_format="pyarrow"), "_g", "x", "y"
        )
    )
    return _i64(t.drop_columns(["_g"]), "n", "corr_micro", "covar_pop_micro")


SQL_GRAPH_ASSORTATIVITY = (
    "WITH "
    + _SQL_BASKET_EDGES
    + """,
deg AS (SELECT node, COUNT(*) AS d FROM
        (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
        GROUP BY node),
p AS (SELECT CAST(du.d AS DOUBLE) AS x, CAST(dv.d AS DOUBLE) AS y
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
b AS (SELECT x, y FROM p UNION ALL SELECT y AS x, x AS y FROM p)
SELECT count(*) AS n,
       CAST(round(corr(x, y) * 1000000.0) AS BIGINT) AS corr_micro,
       CAST(round(covar_pop(x, y) * 1000000.0) AS BIGINT)
         AS covar_pop_micro
FROM b
"""
)


EXT_QUERIES.update({"q_graph_assortativity": q_graph_assortativity})
EXT_ORACLE_SQL.update({"q_graph_assortativity": SQL_GRAPH_ASSORTATIVITY})


def q_props_extract(sf_dir: str):
    """Schema-on-read JSON field stats (X115): extract props.k with one
    RE2 kernel per batch, then per-event-type exact sum/count of k."""
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate
    from phrasekit_ray.stages.textstats import json_extract_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    ext = json_extract_int(ev, "props", "k")

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(b["k"]))
        return pa.table(
            {
                "event_type": t["event_type"],
                "k_sum": t["k"].cast(pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    t = _collect(
        hash_aggregate(
            ext.map_batches(prep, batch_format="pyarrow"),
            ["event_type"],
            [("k_sum", "sum"), ("n", "sum")],
        )
    )
    return _i64(
        t.take(pc.sort_indices(t, sort_keys=[("event_type", "ascending")])),
        "k_sum", "n",
    )


# json_extract_int's contract is STRICT-INTEGER (floats/exponents -> NULL),
# so the twin filters to integral string forms too; an unfiltered
# json_extract would also count float k values and desync on a future
# fixture with non-integral props.k (ADVICE r4)
SQL_PROPS_EXTRACT = r"""
WITH kx AS (
  SELECT event_type,
         CASE WHEN regexp_matches(
                COALESCE(json_extract_string(props, '$.k'), ''), '^-?\d+$')
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS kv
  FROM events)
SELECT event_type,
       CAST(sum(kv) AS BIGINT) AS k_sum,
       count(kv) AS n
FROM kx GROUP BY event_type ORDER BY event_type
"""


EXT_QUERIES.update({"q_props_extract": q_props_extract})
EXT_ORACLE_SQL.update({"q_props_extract": SQL_PROPS_EXTRACT})


def q_cms_top_tokens(sf_dir: str):
    """Count-min-sketch top-20 tokens (X116): mergeable (cell, count)
    sketch rows through one two-phase sum, driver-bounded global
    sketch, vectorized min-over-depth estimates on the distinct-token
    stream. The DuckDB twin replicates the sketch BIT-EXACTLY (md5
    token hash + splitmix cell chain), so the approximate structure
    itself is oracle-checked."""
    from phrasekit_ray.pipelines.queries import _docs
    from phrasekit_ray.stages.agg import cms_token_topk

    return _i64(cms_token_topk(_docs(sf_dir), k=20), "est_count")


SQL_CMS_TOP_TOKENS = f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
th AS (SELECT md5_number_upper(tok) AS h FROM toks),
js AS (SELECT unnest(range(4)) AS j),
cells AS (SELECT j,
    ({_sm_sql_wide('CAST(h AS HUGEINT) + j')}) % 1024 AS cell, COUNT(*) AS n
    FROM th CROSS JOIN js GROUP BY 1, 2),
dtok AS (SELECT DISTINCT tok, md5_number_upper(tok) AS h FROM toks),
est AS (SELECT d.tok, MIN(c.n) AS est
        FROM dtok d CROSS JOIN js
        JOIN cells c ON c.j = js.j
          AND c.cell = ({_sm_sql_wide('CAST(d.h AS HUGEINT) + js.j')}) % 1024
        GROUP BY d.tok)
SELECT tok, CAST(est AS BIGINT) AS est_count FROM est
ORDER BY est_count DESC, tok ASC LIMIT 20
"""


EXT_QUERIES.update({"q_cms_top_tokens": q_cms_top_tokens})
EXT_ORACLE_SQL.update({"q_cms_top_tokens": SQL_CMS_TOP_TOKENS})


def q_anchor_texts(sf_dir: str):
    """Anchor-text alias evidence (X117): parse anchor BODIES out of
    html (vectorized sentinel-append split kernels, tolerant of extra
    attributes / unclosed tags), keep non-empty texts of absolute
    links, count per alias. The SQL twin recomputes the fixture's
    embedded alias set from the generation rule — body-parsing bugs
    (attribute bleed, sentinel artifacts, junk-anchor leakage) show up
    as value mismatches."""
    import ray  # noqa: F401

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.agg import hash_aggregate
    from phrasekit_ray.stages.extract import extract_links

    pages = pages_from_documents(sf_dir, with_links=True)
    links = extract_links(pages, with_text=True)

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b["anchor_text"], ""))
        return pa.table(
            {
                "anchor_text": t["anchor_text"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    t = _collect(
        hash_aggregate(
            links.map_batches(prep, batch_format="pyarrow"),
            ["anchor_text"],
            [("n", "sum")],
        )
    )
    return _i64(
        t.take(pc.sort_indices(t, sort_keys=[("anchor_text", "ascending")])),
        "n",
    )


SQL_ANCHOR_TEXTS = f"""
WITH s AS (SELECT doc_id, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s)
SELECT 'e' || CAST(t % 50 AS VARCHAR) AS anchor_text, COUNT(*) AS n
FROM l WHERE j <= n_links
GROUP BY 1 ORDER BY 1
"""


EXT_QUERIES.update({"q_anchor_texts": q_anchor_texts})
EXT_ORACLE_SQL.update({"q_anchor_texts": SQL_ANCHOR_TEXTS})


def q_canonical_urls(sf_dir: str):
    """URL canonicalization differential (X118): deterministic messy
    URLs (mixed-case scheme/host, default ports, utm params, fragments,
    bare-slash paths) are canonicalized by the Arrow kernel pipeline in
    Ray and INDEPENDENTLY by DuckDB string functions implementing the
    same five-step spec — two implementations, one spec, exact match."""
    import ray

    from phrasekit_ray.stages.extract import canonicalize_urls

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def gen(b: pa.Table) -> pa.Table:
        d = b["doc_id"].combine_chunks().cast(pa.int64()).to_numpy()
        urls = []
        for x in d.tolist():
            scheme = "HTTPS" if x % 2 == 0 else "http"
            host = "WWW.Example.ORG" if x % 3 == 0 else "site.example.org"
            port = (
                ":443"
                if (x % 2 == 0 and x % 7 == 0)
                else (":80" if (x % 2 == 1 and x % 5 == 0) else "")
            )
            path = "/" if x % 11 == 0 else f"/p/{x}"
            if x % 4 == 0:
                q = f"?utm_source=x&q={x}"
            elif x % 4 == 1 and x % 3 == 0:
                q = "?utm_o=1"
            else:
                q = ""
            frag = f"#sec{x}" if x % 6 == 0 else ""
            urls.append(f"{scheme}://{host}{port}{path}{q}{frag}")
        return pa.table(
            {"doc_id": pa.array(d, pa.int64()), "url": pa.array(urls)}
        )

    t = _collect(canonicalize_urls(docs.map_batches(gen, batch_format="pyarrow")))
    t = t.select(["doc_id", "canon_url"])
    return _i64(
        t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])),
        "doc_id",
    )


SQL_CANONICAL_URLS = r"""
WITH g AS (SELECT doc_id,
  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.ORG'
        ELSE 'site.example.org' END) ||
  (CASE WHEN doc_id % 2 = 0 AND doc_id % 7 = 0 THEN ':443'
        WHEN doc_id % 2 = 1 AND doc_id % 5 = 0 THEN ':80' ELSE '' END) ||
  (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '/p/' || doc_id END) ||
  (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&q=' || doc_id
        WHEN doc_id % 4 = 1 AND doc_id % 3 = 0 THEN '?utm_o=1'
        ELSE '' END) ||
  (CASE WHEN doc_id % 6 = 0 THEN '#sec' || doc_id ELSE '' END) AS url
  FROM documents),
s1 AS (SELECT doc_id, split_part(url, '#', 1) AS u1 FROM g),
s2 AS (SELECT doc_id, u1,
  regexp_extract(u1, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) AS head
  FROM s1),
s3 AS (SELECT doc_id, u1, head,
  CASE WHEN head <> '' THEN substr(u1, length(head) + 1) ELSE '' END AS rest
  FROM s2),
s35 AS (SELECT doc_id, u1, head,
  CASE WHEN instr(rest, '?') > 0
       THEN substr(rest, 1, instr(rest, '?') - 1) ELSE rest END AS path,
  CASE WHEN instr(rest, '?') > 0
       THEN substr(rest, instr(rest, '?')) ELSE '' END AS query
  FROM s3),
s4 AS (SELECT doc_id, u1, head,
  regexp_replace(
    regexp_replace(lower(head), '^http://(.*):80$', 'http://\1'),
    '^https://(.*):443$', 'https://\1') AS head2,
  path ||
  regexp_replace(
    regexp_replace(
      regexp_replace(query, '&utm_[^&]*', '', 'g'),
      '^\?utm_[^&]*&', '?'),
    '^\?utm_[^&]*$', '') AS rest2
  FROM s35)
SELECT doc_id,
  CASE WHEN head <> '' THEN
    head2 || (CASE WHEN rest2 = '/' THEN '' ELSE rest2 END)
  ELSE u1 END AS canon_url
FROM s4 ORDER BY doc_id
"""


EXT_QUERIES.update({"q_canonical_urls": q_canonical_urls})
EXT_ORACLE_SQL.update({"q_canonical_urls": SQL_CANONICAL_URLS})


def q_warc_roundtrip(sf_dir: str):
    """WARC source interop (X119): derive pages from the documents
    table, write a REAL multi-record WARC (one .warc + one member-gzip
    .warc.gz) under /tmp scratch, read it back with the distributed
    WARC reader, and report per-host page counts. Rows-only (no SQL
    WARC parser); the quality metric is IN-BAND: every row carries the
    number of (url, html, ts) mismatches between the round-tripped
    records and the source pages (expected 0)."""
    import os
    import tempfile

    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.sources.warc import read_warc, write_warc_file
    from phrasekit_ray.stages.agg import hash_aggregate
    from phrasekit_ray.stages.extract import host_of

    pages = pages_from_documents(sf_dir, with_links=True)
    src = pa.concat_tables(
        [
            t
            for t in ray.get(pages.materialize().to_arrow_refs())
            if t.num_columns
        ],
        promote_options="default",
    ).sort_by("url")
    rows = [
        {"url": u, "warc_ts": ts, "html": h}
        for u, ts, h in zip(
            src["url"].to_pylist(),
            src["warc_ts"].cast(pa.int64()).to_pylist(),
            src["html"].to_pylist(),
        )
    ]
    d = tempfile.mkdtemp(prefix="warcs_", dir="/tmp")
    half = len(rows) // 2
    write_warc_file(os.path.join(d, "a.warc"), rows[:half])
    write_warc_file(os.path.join(d, "b.warc.gz"), rows[half:], compress=True)

    ds = read_warc([os.path.join(d, "a.warc"), os.path.join(d, "b.warc.gz")])

    def hosts(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": host_of(b["url"]),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    agg = _collect(hash_aggregate(ds.map_batches(hosts, batch_format="pyarrow"), ["host"], [("n", "sum")]))

    got = pa.concat_tables(
        [
            t
            for t in ray.get(ds.materialize().to_arrow_refs())
            if t.num_columns
        ],
        promote_options="default",
    ).sort_by("url")
    mism = 0
    if got.num_rows != src.num_rows:
        mism = abs(got.num_rows - src.num_rows)
    else:
        for c_src, c_got in (
            (src["url"], got["url"]),
            (src["html"], got["html"]),
            (
                src["warc_ts"].cast(pa.int64()),
                got["warc_ts"].cast(pa.int64()),
            ),
        ):
            mism += sum(
                1 for a, b in zip(c_src.to_pylist(), c_got.to_pylist()) if a != b
            )
    agg = _i64(
        agg.take(pc.sort_indices(agg, sort_keys=[("host", "ascending")])), "n"
    )
    return agg.append_column(
        "roundtrip_mismatches",
        pa.array(np.full(agg.num_rows, mism, dtype=np.int64), pa.int64()),
    )


EXT_QUERIES.update({"q_warc_roundtrip": q_warc_roundtrip})


def q_corpus_diff(sf_dir: str):
    """Crawl snapshot diff (X120): the 'new' snapshot is a
    deterministic mutation of documents (drop doc_id%17==0, append a
    token when doc_id%13==0, clone doc_id%19==0 under id+1000000); the
    Ray side detects added/removed/changed purely from membership +
    content-fingerprint comparison of the two datasets, while the SQL
    twin derives the statuses from the mutation rules — diff logic is
    verified end to end."""
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def mutate(b: pa.Table) -> pa.Table:
        d = b["doc_id"].combine_chunks().cast(pa.int64()).to_numpy()
        txt = b["text"].to_pylist()
        ids, texts = [], []
        for x, t in zip(d.tolist(), txt):
            if x % 17 == 0:
                continue  # removed
            if x % 13 == 0:
                t = t + " zz"  # changed
            ids.append(x)
            texts.append(t)
            if x % 19 == 0:
                ids.append(x + 1_000_000)  # added clone
                texts.append(t)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    from phrasekit_ray.stages.dedup import snapshot_diff

    new = docs.map_batches(mutate, batch_format="pyarrow")
    t = _collect(snapshot_diff(docs, new))
    return _i64(
        t.take(
            pc.sort_indices(
                t,
                sort_keys=[("doc_id", "ascending"), ("status", "ascending")],
            )
        ),
        "doc_id",
    )


SQL_CORPUS_DIFF = """
SELECT doc_id + 1000000 AS doc_id, 'added' AS status FROM documents
  WHERE doc_id % 17 <> 0 AND doc_id % 19 = 0
UNION ALL
SELECT doc_id, 'removed' FROM documents WHERE doc_id % 17 = 0
UNION ALL
SELECT doc_id, 'changed' FROM documents
  WHERE doc_id % 17 <> 0 AND doc_id % 13 = 0
ORDER BY doc_id, status
"""


EXT_QUERIES.update({"q_corpus_diff": q_corpus_diff})
EXT_ORACLE_SQL.update({"q_corpus_diff": SQL_CORPUS_DIFF})


def q_centroid_confusion(sf_dir: str):
    """Nearest-centroid classifier evaluation (X121): quantize
    embeddings to exact int codes, sum per-label centroid vectors
    through ONE two-phase aggregate (O(labels×dim) shuffle), assign
    every vector to argmax_l (v·s_l / |s_l|) — the n-free form of
    centroid cosine, so every dot product is EXACT int64 and the only
    floats are identical on both engines — and report the confusion
    matrix (true_label, pred_label, n)."""
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate

    DIM, SCALE = 64, 32768.0
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )

    def _codes(b: pa.Table) -> np.ndarray:
        v = b["embedding"].combine_chunks()
        off = v.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = (
            v.values.slice(off[0], int(off[-1] - off[0]))
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        x = flat.reshape(-1, DIM) * SCALE
        return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
            np.int64
        )

    sum_cols = [f"_s{i}" for i in range(DIM)]

    def partial(b: pa.Table) -> pa.Table:
        codes = _codes(b)
        lab = b["label"].combine_chunks().cast(pa.int64()).to_numpy()
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        seg = np.flatnonzero(
            np.concatenate(([True], lab_s[1:] != lab_s[:-1]))
        )
        sums = np.add.reduceat(codes[order], seg, axis=0)
        cols = {"label": pa.array(lab_s[seg], pa.int64())}
        for i, c in enumerate(sum_cols):
            cols[c] = pa.array(sums[:, i], pa.int64())
        return pa.table(cols)

    cent = _collect(
        hash_aggregate(
            emb.map_batches(partial, batch_format="pyarrow"),
            ["label"],
            [(c, "sum") for c in sum_cols],
        )
    )
    labels = np.asarray(cent["label"].to_pylist(), np.int64)
    order = np.argsort(labels)
    labels = labels[order]
    S = np.stack(
        [np.asarray(cent[c].to_pylist(), np.int64) for c in sum_cols], axis=1
    )[order]
    nz = np.sqrt((S.astype(np.float64) ** 2).sum(axis=1))

    def assign(b: pa.Table) -> pa.Table:
        codes = _codes(b)
        dp = codes @ S.T  # exact int64
        sc = dp.astype(np.float64) / nz
        pred = labels[np.argmax(sc, axis=1)]  # first max = smallest label
        return pa.table(
            {
                "true_label": b["label"].combine_chunks().cast(pa.int64()),
                "pred_label": pa.array(pred, pa.int64()),
                "n": pa.array(np.ones(len(pred), np.int64)),
            }
        )

    t = _collect(
        hash_aggregate(
            emb.map_batches(assign, batch_format="pyarrow"),
            ["true_label", "pred_label"],
            [("n", "sum")],
        )
    )
    return _i64(
        t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("true_label", "ascending"),
                    ("pred_label", "ascending"),
                ],
            )
        ),
        "true_label", "pred_label", "n",
    )


SQL_CENTROID_CONFUSION = """
WITH e AS (SELECT vec_id, label,
    generate_subscripts(embedding, 1) - 1 AS d,
    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 32768.0) AS BIGINT)
      AS code
  FROM embeddings),
s AS (SELECT label, d, CAST(SUM(code) AS BIGINT) AS sd FROM e GROUP BY 1, 2),
nz AS (SELECT label, sqrt(CAST(SUM(sd * sd) AS DOUBLE)) AS nrm
       FROM s GROUP BY 1),
dot AS (SELECT e.vec_id, e.label AS true_label, s.label AS cand,
               CAST(SUM(e.code * s.sd) AS BIGINT) AS dp
        FROM e JOIN s USING (d) GROUP BY 1, 2, 3),
sc AS (SELECT dot.*, CAST(dp AS DOUBLE) / nz.nrm AS score
       FROM dot JOIN nz ON nz.label = dot.cand),
pred AS (SELECT vec_id, true_label, cand AS pred_label FROM sc
         QUALIFY row_number() OVER (
           PARTITION BY vec_id ORDER BY score DESC, cand ASC) = 1)
SELECT true_label, pred_label, COUNT(*) AS n
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


EXT_QUERIES.update({"q_centroid_confusion": q_centroid_confusion})
EXT_ORACLE_SQL.update({"q_centroid_confusion": SQL_CENTROID_CONFUSION})


def q_orc_interop(sf_dir: str):
    """Cross-format interop (X122): documents re-written as sharded ORC
    under /tmp scratch, read back with the distributed ORC reader
    (column-pruned decode), aggregated per lang. The SQL twin runs the
    SAME aggregate over the original parquet — equality proves the ORC
    path preserves rows, values and types end to end."""
    import os
    import tempfile

    import ray

    from phrasekit_ray.sources.orc import read_orc, write_orc_file
    from phrasekit_ray.stages.agg import hash_aggregate

    src = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
    )
    d = tempfile.mkdtemp(prefix="orc_", dir="/tmp")
    tabs = [
        t
        for t in ray.get(src.materialize().to_arrow_refs())
        if t.num_columns and t.num_rows
    ]
    paths = []
    for i, t in enumerate(tabs):
        p = os.path.join(d, f"part{i:03d}.orc")
        write_orc_file(p, t)
        paths.append(p)

    ds = read_orc(paths, columns=["lang", "n_chars", "doc_id"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": b["lang"],
                "n_chars_sum": b["n_chars"].cast(pa.int64()),
                "id_sum": b["doc_id"].cast(pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    t = _collect(
        hash_aggregate(
            ds.map_batches(prep, batch_format="pyarrow"),
            ["lang"],
            [("n_chars_sum", "sum"), ("id_sum", "sum"), ("n", "sum")],
        )
    )
    return _i64(
        t.take(pc.sort_indices(t, sort_keys=[("lang", "ascending")])),
        "n_chars_sum", "id_sum", "n",
    )


SQL_ORC_INTEROP = """
SELECT lang,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       count(*) AS n
FROM documents GROUP BY lang ORDER BY lang
"""


EXT_QUERIES.update({"q_orc_interop": q_orc_interop})
EXT_ORACLE_SQL.update({"q_orc_interop": SQL_ORC_INTEROP})


def q_corpus_entropy(sf_dir: str):
    """Unigram entropy / type-token diagnostics of the corpus (X123):
    distinct-token-compressed exchange, per-token micro-fixed c·ln(c)
    terms, exact integer sums both sides."""
    import ray

    from phrasekit_ray.stages.textstats import corpus_entropy_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return corpus_entropy_stats(docs)


SQL_CORPUS_ENTROPY = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
c AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok)
SELECT CAST(SUM(n) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_types,
       CAST(SUM(CAST(round(n * ln(n) * 1000000.0) AS BIGINT)) AS BIGINT)
         AS sum_clnc_micro
FROM c
"""


EXT_QUERIES.update({"q_corpus_entropy": q_corpus_entropy})
EXT_ORACLE_SQL.update({"q_corpus_entropy": SQL_CORPUS_ENTROPY})


def q_kg_edge_provenance(sf_dir: str):
    """KG edge provenance (X124): per canonical (subj, obj) edge of the
    flagship pipeline, mention count plus first/last source url (min/
    max over the mention provenance) — the versioning/evidence record a
    production KG keeps next to every edge. One two-phase aggregate
    over the triple stream; the SQL twin wraps the full flagship
    recursive-CTE oracle."""
    from phrasekit_ray.stages.agg import hash_aggregate

    triples = _flagship_triples(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"].combine_chunks().cast(pa.int64()),
                "obj": b["obj"].combine_chunks().cast(pa.int64()),
                "n_mentions": pa.array(np.ones(b.num_rows, np.int64)),
                "first_url": b["doc_id"].combine_chunks().cast(pa.string()),
                "last_url": b["doc_id"].combine_chunks().cast(pa.string()),
            }
        )

    t = _collect(
        hash_aggregate(
            triples.map_batches(prep, batch_format="pyarrow"),
            ["subj", "obj"],
            [("n_mentions", "sum"), ("first_url", "min"), ("last_url", "max")],
        )
    )
    return _i64(
        t.take(
            pc.sort_indices(
                t, sort_keys=[("subj", "ascending"), ("obj", "ascending")]
            )
        ),
        "subj", "obj", "n_mentions",
    )


def _sql_edge_provenance() -> str:
    from phrasekit_ray.pipelines.queries import _sql_flagship

    return f"""
WITH t AS ({_sql_flagship()})
SELECT subj, obj, COUNT(*) AS n_mentions,
       MIN(doc_id) AS first_url, MAX(doc_id) AS last_url
FROM t GROUP BY subj, obj ORDER BY subj, obj
"""


EXT_QUERIES.update({"q_kg_edge_provenance": q_kg_edge_provenance})
EXT_ORACLE_SQL.update({"q_kg_edge_provenance": _sql_edge_provenance()})


def q_blocklist_filter(sf_dir: str):
    """Host blocklist filtering (X125): the URL-filter stage every web
    pipeline runs before processing — pages → vectorized host parse →
    ANTI join against the blocked-host set (broadcast under the
    cardinality bound, partitioned above it), per-host survivor counts.
    Blocklist = every host h{K}.example.org with K%5==0 plus one
    source-site host, derived deterministically so the SQL twin can
    regenerate it."""
    import ray  # noqa: F401

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.agg import (
        hash_aggregate,
        hash_string_array64,
        key_filter_join,
    )
    from phrasekit_ray.stages.extract import extract_links, host_of

    pages = pages_from_documents(sf_dir, with_links=True)
    links = extract_links(pages)

    def hostrows(b: pa.Table) -> pa.Table:
        h = host_of(b["href"])
        return pa.table(
            {
                "host": h,
                "hkey": pa.array(
                    hash_string_array64(h).astype(np.int64)
                ),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    target = links.map_batches(hostrows, batch_format="pyarrow")

    blocked_hosts = [f"h{k}.example.org" for k in range(0, 16, 5)] + [
        "src0.example.org"
    ]
    bh = pa.array(blocked_hosts, pa.string())
    block = ray.data.from_arrow(
        pa.table(
            {
                "hkey": pa.array(
                    hash_string_array64(bh).astype(np.int64)
                ),
            }
        )
    )
    kept = key_filter_join(target, block, "hkey", "hkey", anti=True)
    t = _collect(
        hash_aggregate(
            kept.map_batches(
                lambda b: b.select(["host", "n"]), batch_format="pyarrow"
            ),
            ["host"],
            [("n", "sum")],
        )
    )
    return _i64(
        t.take(pc.sort_indices(t, sort_keys=[("host", "ascending")])), "n"
    )


SQL_BLOCKLIST_FILTER = f"""
WITH s AS (SELECT doc_id, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s),
h AS (SELECT 'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS host
      FROM l WHERE j <= n_links)
SELECT host, COUNT(*) AS n FROM h
WHERE (CAST(regexp_extract(host, '^h(\\d+)', 1) AS INT)) % 5 <> 0
GROUP BY host ORDER BY host
"""


EXT_QUERIES.update({"q_blocklist_filter": q_blocklist_filter})
EXT_ORACLE_SQL.update({"q_blocklist_filter": SQL_BLOCKLIST_FILTER})


def q_mention_contexts(sf_dir: str):
    """KWIC mention contexts (X126): per detected entity mention, the
    ±2-token evidence window re-joined as text — the grounding snippet
    a KG keeps with each mention. Mentions attach their doc's token
    list with ONE int-keyed lookup_join; the window slice is a single
    numpy range-gather + one binary_join per batch (no Python per
    row)."""
    from phrasekit_ray.pipelines.queries import _docs, _tagged_all_bigrams
    from phrasekit_ray.stages import kg as kgmod
    from phrasekit_ray.stages.agg import lookup_join
    from phrasekit_ray.stages.extract import tokenize_documents

    tagged, _ = _tagged_all_bigrams(sf_dir)
    mentions = kgmod.mentions_from_tagged(tagged)
    docs = tokenize_documents(_docs(sf_dir))
    joined = lookup_join(mentions, docs, "doc_id", "doc_id")

    def ctx(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "start": pa.array([], pa.int64()),
                    "end": pa.array([], pa.int64()),
                    "phrase_id": pa.array([], pa.int64()),
                    "context": pa.array([], pa.string()),
                }
            )
        toks = b["tokens"].combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = off[0]
        off = off - base
        flat = toks.values.slice(base, int(off[-1]))
        sizes = np.diff(off)
        s = b["start"].combine_chunks().cast(pa.int64()).to_numpy()
        e = b["end"].combine_chunks().cast(pa.int64()).to_numpy()
        ws = np.maximum(s - 2, 0)
        we = np.minimum(e + 2, sizes)
        counts = np.maximum(we - ws, 0)
        total = int(counts.sum())
        cum = np.cumsum(counts) - counts
        idx = (
            np.repeat(off[:-1] + ws, counts)
            + np.arange(total, dtype=np.int64)
            - np.repeat(cum, counts)
        )
        vals = flat.take(pa.array(idx, pa.int64()))
        lst = pa.LargeListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(counts))), pa.int64()),
            vals,
        )
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                "start": pa.array(s, pa.int64()),
                "end": pa.array(e, pa.int64()),
                "phrase_id": b["phrase_id"].combine_chunks().cast(pa.int64()),
                "context": pc.binary_join(lst, " ").cast(pa.string()),
            }
        )

    t = _collect(joined.map_batches(ctx, batch_format="pyarrow"))
    return _i64(
        t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("doc_id", "ascending"),
                    ("start", "ascending"),
                    ("phrase_id", "ascending"),
                ],
            )
        ),
        "doc_id", "start", "end", "phrase_id",
    )


def _sql_mention_contexts() -> str:
    from phrasekit_ray.pipelines.queries import _sql_mentions

    return (
        _sql_mentions()
        + """,
ctx AS (SELECT m.doc_id, m.start, m."end", m.phrase_id,
        string_agg(t.tok, ' ' ORDER BY t.pos) AS context
        FROM mentions m JOIN toks2 t ON t.doc_id = m.doc_id
          AND t.pos BETWEEN m.start - 1 AND m."end" + 2
        GROUP BY 1, 2, 3, 4)
SELECT doc_id, start, "end", phrase_id, context FROM ctx
ORDER BY doc_id, start, phrase_id
"""
    )


EXT_QUERIES.update({"q_mention_contexts": q_mention_contexts})
EXT_ORACLE_SQL.update({"q_mention_contexts": _sql_mention_contexts()})


# FINAL registration hook (review finding, round 4): when THIS module is
# imported first, queries.py's bottom hook fires mid-initialization and
# sees no maps, and the mid-module _self_register() above copies only
# the entries defined before it — every later EXT_QUERIES.update()
# mutates this module's dicts but never reaches the driver registry.
# Re-push the COMPLETE maps now that the module is fully defined
# (idempotent under every import order).
_self_register()


def q_weighted_sample_per_lang(sf_dir: str):
    """Per-language importance subsample (X127): 10 docs per lang drawn
    without replacement ∝ n_chars via the per-group Efraimidis–Spirakis
    race (stages/agg.weighted_stratified_sample)."""
    import ray

    from phrasekit_ray.stages.agg import weighted_stratified_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    t = _collect(
        weighted_stratified_sample(docs, "lang", 10, "n_chars", "doc_id")
    )
    return _i64(
        t.take(
            pc.sort_indices(
                t, sort_keys=[("lang", "ascending"), ("doc_id", "ascending")]
            )
        ),
        "doc_id", "n_chars",
    )


SQL_WEIGHTED_SAMPLE_PER_LANG = f"""
WITH r AS (SELECT doc_id, lang, n_chars,
  ({_sm_sql('CAST(doc_id AS HUGEINT)')}) AS rnk FROM documents),
kx AS (SELECT doc_id, lang, n_chars,
  -ln((CAST(rnk AS DOUBLE) + 0.5) / 18446744073709551616.0)
   / CAST(n_chars AS DOUBLE) AS race
  FROM r WHERE n_chars > 0),
rn AS (SELECT doc_id, lang, n_chars, row_number() OVER
       (PARTITION BY lang ORDER BY race ASC, doc_id ASC) AS rn FROM kx)
SELECT doc_id, lang, n_chars FROM rn WHERE rn <= 10
ORDER BY lang, doc_id
"""


EXT_QUERIES.update({"q_weighted_sample_per_lang": q_weighted_sample_per_lang})
EXT_ORACLE_SQL.update(
    {"q_weighted_sample_per_lang": SQL_WEIGHTED_SAMPLE_PER_LANG}
)


def q_lang_mismatch(sf_dir: str):
    """Label-noise audit (X128): documents whose STORED lang disagrees
    with the stopword-profile language prediction — the data-quality
    check run before trusting provenance labels for filtering. One
    stateless prediction pass + one int-keyed lookup_join."""
    import ray

    from phrasekit_ray.stages import textstats
    from phrasekit_ray.stages.agg import lookup_join

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pred = textstats.language_id(docs).map_batches(
        lambda b: b.select(["doc_id", "lang_pred"]), batch_format="pyarrow"
    )
    labeled = docs.map_batches(
        lambda b: b.select(["doc_id", "lang"]), batch_format="pyarrow"
    )
    joined = lookup_join(labeled, pred, "doc_id", "doc_id")

    def mism(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b["lang"], b["lang_pred"]))

    t = _collect(joined.map_batches(mism, batch_format="pyarrow"))
    return _i64(
        t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])),
        "doc_id",
    )


def _sql_lang_mismatch() -> str:
    from phrasekit_ray.pipelines.queries import ORACLE_SQL

    langid_sql = ORACLE_SQL["q_langid"]
    return f"""
WITH p AS ({langid_sql})
SELECT d.doc_id, d.lang, p.lang_pred
FROM documents d JOIN p USING (doc_id)
WHERE d.lang <> p.lang_pred ORDER BY d.doc_id
"""


EXT_QUERIES.update({"q_lang_mismatch": q_lang_mismatch})
EXT_ORACLE_SQL.update({"q_lang_mismatch": _sql_lang_mismatch()})


def q_dup_rate_per_source(sf_dir: str):
    """Dedup diagnostics per source (X129): which sources are
    redundant — fraction of each source's docs that sit in a verified
    MinHash duplicate cluster, in integer basis points. Cluster members
    attach their source with one int-keyed lookup_join; per-source
    totals are one two-phase aggregate."""
    import ray

    from phrasekit_ray.pipelines.queries import _docs
    from phrasekit_ray.stages import dedup
    from phrasekit_ray.stages.agg import hash_aggregate, lookup_join
    from phrasekit_ray.stages.extract import tokenize_documents

    docs_tok = tokenize_documents(_docs(sf_dir))
    mapping = dedup.near_dedup_minhash(docs_tok, materialize_input=True)
    srcs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def ones(b: pa.Table) -> pa.Table:
        return b.append_column("n", pa.array(np.ones(b.num_rows, np.int64)))

    totals = _collect(
        hash_aggregate(
            srcs.map_batches(
                lambda b: pa.table(
                    {
                        "source": b["source"],
                        "n_docs": pa.array(np.ones(b.num_rows, np.int64)),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["source"],
            [("n_docs", "sum")],
        )
    )
    if mapping:
        members = ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array(sorted(mapping.keys()), pa.int64())}
            )
        )
        dup_t = _collect(
            hash_aggregate(
                lookup_join(members, srcs, "doc_id", "doc_id").map_batches(
                    lambda b: pa.table(
                        {
                            "source": b["source"],
                            "n_dup": pa.array(
                                np.ones(b.num_rows, np.int64)
                            ),
                        }
                    ),
                    batch_format="pyarrow",
                ),
                ["source"],
                [("n_dup", "sum")],
            )
        )
        dmap = dict(
            zip(dup_t["source"].to_pylist(), dup_t["n_dup"].to_pylist())
        )
    else:
        dmap = {}
    src_names = totals["source"].to_pylist()
    n_docs = totals["n_docs"].to_pylist()
    n_dup = [int(dmap.get(s, 0)) for s in src_names]
    bp = [10000 * d // n for d, n in zip(n_dup, n_docs)]
    t = pa.table(
        {
            "source": pa.array(src_names, pa.string()),
            "n_docs": pa.array(n_docs, pa.int64()),
            "n_dup": pa.array(n_dup, pa.int64()),
            "dup_bp": pa.array(bp, pa.int64()),
        }
    )
    return t.take(pc.sort_indices(t, sort_keys=[("source", "ascending")]))


def _sql_dup_rate_per_source() -> str:
    from phrasekit_ray.pipelines.queries import _sql_minhash

    return f"""
WITH m AS ({_sql_minhash()}),
tot AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
dup AS (SELECT d.source, COUNT(*) AS n_dup
        FROM m JOIN documents d USING (doc_id) GROUP BY d.source)
SELECT tot.source, tot.n_docs, COALESCE(dup.n_dup, 0) AS n_dup,
       (10000 * COALESCE(dup.n_dup, 0)) // tot.n_docs AS dup_bp
FROM tot LEFT JOIN dup USING (source) ORDER BY tot.source
"""


EXT_QUERIES.update({"q_dup_rate_per_source": q_dup_rate_per_source})
EXT_ORACLE_SQL.update({"q_dup_rate_per_source": _sql_dup_rate_per_source()})


def q_media_decode(sf_dir: str):
    """Multimodal decode pipeline (X17/X76, first-class in r5): per-doc
    deterministic REAL payloads in four formats (PNM / PNG / JPEG /
    GIF, every 23rd doc truncated) → ImageDecodeActor pool
    (backend="numpy": the pure-numpy codecs) → per-format decode stats.
    Not SQL-expressible (binary codecs); rows-only with the invariant
    columns in-band: n_bad must equal the corrupted count for the
    deterministic formats (exactness asserted in
    tests/test_multimodal.py::test_q_media_decode_stats)."""
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate
    from phrasekit_ray.stages.multimodal import (
        decode_images,
        synthesize_media_from_documents,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    media = synthesize_media_from_documents(docs)
    decoded = decode_images(
        media, concurrency=(1, 4), batch_size=64,
        backend="numpy", feature_dim=16,
    )

    def prep(b: pa.Table) -> pa.Table:
        mid = b["media_id"].combine_chunks()
        fmt = pc.replace_substring_regex(mid, "_.*$", "")
        ok = b["decoded_ok"].combine_chunks().cast(pa.int64())
        # quantized mean feature of successfully decoded rows — pins the
        # actual pixel path, not just the ok bit
        feats = b["features"].combine_chunks()
        off = feats.offsets.to_numpy(zero_copy_only=False)
        vals = feats.values.to_numpy(zero_copy_only=False).astype(np.float64)
        sums = np.add.reduceat(
            np.concatenate([vals, [0.0]]), off[:-1]
        ) if len(off) > 1 else np.zeros(0)
        sums = np.where(np.diff(off) == 0, 0.0, sums)
        fsum = pc.if_else(
            pc.equal(ok, 1), pa.array(sums, pa.float64()), pa.scalar(0.0)
        )
        return pa.table(
            {
                "format": fmt,
                "n": pa.array(np.ones(b.num_rows, np.int64)),
                "n_ok": ok,
                "feat_sum_e3": pc.round(
                    pc.multiply(fsum, 1000.0)
                ).cast(pa.int64()),
            }
        )

    t = _collect(
        hash_aggregate(
            decoded.map_batches(prep, batch_format="pyarrow"),
            ["format"],
            [("n", "sum"), ("n_ok", "sum"), ("feat_sum_e3", "sum")],
        )
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("format", "ascending")]))
    bad = pc.subtract(t["n"], t["n_ok"])
    return _i64(
        t.append_column("n_bad", bad.combine_chunks().cast(pa.int64())),
        "n", "n_ok", "feat_sum_e3",
    )


EXT_QUERIES.update({"q_media_decode": q_media_decode})


def q_kmeans(sf_dir: str):
    """Distributed Lloyd k-means with an EXACT SQL oracle (X131): k=8
    centroids over the embeddings table, 3 fixed iterations, centroids
    carried as (int64 code sums, count) so the distributed reduction is
    order-independent; per-cluster size + inertia in integer micro-units
    (see stages/cluster.py for the exactness argument). One broadcast +
    one k-row two-phase aggregate per iteration — O(k·dim) driver state,
    corpus always streaming."""
    import ray

    from phrasekit_ray.stages.cluster import kmeans_cluster_stats

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_cluster_stats(emb, k=8, iters=3)


def _sql_kmeans(k: int = 8, iters: int = 3, scale: float = 512.0) -> str:
    """Unrolled Lloyd iteration chain — the same fixed float64
    expressions over the same exact int64 aggregates as
    stages/cluster.py (assignment f_j = −2·dot/cnt + ss/cnt²; ties →
    smallest j; empty clusters keep the previous state via COALESCE)."""
    s = f"""
WITH e AS (SELECT vec_id,
    generate_subscripts(embedding, 1) - 1 AS d,
    CAST(round(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT)
      AS code
  FROM embeddings),
seeds AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS j
          FROM (SELECT DISTINCT vec_id FROM embeddings
                ORDER BY vec_id LIMIT {k})),
c0 AS (SELECT s.j, e.d, e.code AS sd, CAST(1 AS BIGINT) AS cnt
       FROM seeds s JOIN e ON e.vec_id = s.vec_id)"""
    prev = "c0"
    for i in range(1, iters + 1):
        s += f""",
m{i} AS (SELECT j, CAST(SUM(sd * sd) AS BIGINT) AS ss, MIN(cnt) AS cnt
         FROM {prev} GROUP BY 1),
d{i} AS (SELECT e.vec_id, c.j, CAST(SUM(e.code * c.sd) AS BIGINT) AS dot
         FROM e JOIN {prev} c USING (d) GROUP BY 1, 2),
a{i} AS (SELECT vec_id, j FROM (
           SELECT d.vec_id, d.j, row_number() OVER (
             PARTITION BY d.vec_id ORDER BY
               (-2.0 * CAST(d.dot AS DOUBLE)) / CAST(m.cnt AS DOUBLE)
               + CAST(m.ss AS DOUBLE)
                 / (CAST(m.cnt AS DOUBLE) * CAST(m.cnt AS DOUBLE)) ASC,
               d.j ASC) AS rn
           FROM d{i} d JOIN m{i} m USING (j)) WHERE rn = 1),
f{i} AS (SELECT a.j, e.d, CAST(SUM(e.code) AS BIGINT) AS sd,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM a{i} a JOIN e ON e.vec_id = a.vec_id GROUP BY 1, 2),
c{i} AS (SELECT p.j, p.d, COALESCE(f.sd, p.sd) AS sd,
                COALESCE(f.cnt, p.cnt) AS cnt
         FROM {prev} p LEFT JOIN f{i} f ON f.j = p.j AND f.d = p.d)"""
        prev = f"c{i}"
    T = iters + 1
    s += f""",
m{T} AS (SELECT j, CAST(SUM(sd * sd) AS BIGINT) AS ss, MIN(cnt) AS cnt
         FROM {prev} GROUP BY 1),
d{T} AS (SELECT e.vec_id, c.j, CAST(SUM(e.code * c.sd) AS BIGINT) AS dot
         FROM e JOIN {prev} c USING (d) GROUP BY 1, 2),
a{T} AS (SELECT vec_id, j, dot FROM (
           SELECT d.vec_id, d.j, d.dot, row_number() OVER (
             PARTITION BY d.vec_id ORDER BY
               (-2.0 * CAST(d.dot AS DOUBLE)) / CAST(m.cnt AS DOUBLE)
               + CAST(m.ss AS DOUBLE)
                 / (CAST(m.cnt AS DOUBLE) * CAST(m.cnt AS DOUBLE)) ASC,
               d.j ASC) AS rn
           FROM d{T} d JOIN m{T} m USING (j)) WHERE rn = 1),
xx AS (SELECT vec_id, CAST(SUM(code * code) AS BIGINT) AS sxx
       FROM e GROUP BY 1),
st AS (SELECT a.j AS cluster, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(xx.sxx) AS BIGINT) AS sxx,
              CAST(SUM(a.dot) AS BIGINT) AS sxs
       FROM a{T} a JOIN xx USING (vec_id) GROUP BY 1)
SELECT st.cluster, st.n,
  CAST(round(((CAST(st.sxx AS DOUBLE)
      - 2.0 * CAST(st.sxs AS DOUBLE) / CAST(m.cnt AS DOUBLE)
      + CAST(st.n AS DOUBLE) * CAST(m.ss AS DOUBLE)
        / (CAST(m.cnt AS DOUBLE) * CAST(m.cnt AS DOUBLE)))
     / ({scale} * {scale})) * 1000000.0) AS BIGINT) AS inertia_micro
FROM st JOIN m{T} m ON m.j = st.cluster
ORDER BY st.cluster"""
    return s


SQL_KMEANS = _sql_kmeans(8, 3, 512.0)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-shaped semantic near-dup removal (X132): nearest-seed
    cluster assignment + keep-first intra-cluster cosine pruning at
    τ = 19/20, the entire duplicate decision in exact int64 (see
    stages/cluster.py). Returns the full (vec_id, cluster, is_dup)
    audit table."""
    import ray

    from phrasekit_ray.stages.cluster import semantic_dedup

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = _collect(semantic_dedup(emb, n_seeds=8))
    return t.take(
        pc.sort_indices(t, sort_keys=[("vec_id", "ascending")])
    )


SQL_SEMANTIC_DEDUP = """
WITH e AS (SELECT vec_id,
    generate_subscripts(embedding, 1) - 1 AS d,
    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 512.0) AS BIGINT)
      AS code
  FROM embeddings),
seeds AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS j
          FROM (SELECT DISTINCT vec_id FROM embeddings
                ORDER BY vec_id LIMIT 8)),
sc AS (SELECT s.j, e.d, e.code AS sd
       FROM seeds s JOIN e ON e.vec_id = s.vec_id),
snrm AS (SELECT j, sqrt(CAST(SUM(sd * sd) AS DOUBLE)) AS nrm
         FROM sc GROUP BY 1),
dot AS (SELECT e.vec_id, sc.j, CAST(SUM(e.code * sc.sd) AS BIGINT) AS dp
        FROM e JOIN sc USING (d) GROUP BY 1, 2),
asg AS (SELECT vec_id, j AS cluster FROM (
          SELECT dot.vec_id, dot.j, row_number() OVER (
            PARTITION BY dot.vec_id
            ORDER BY CAST(dp AS DOUBLE) / nrm DESC, dot.j ASC) AS rn
          FROM dot JOIN snrm USING (j)) WHERE rn = 1),
n2 AS (SELECT vec_id, CAST(SUM(code * code) AS BIGINT) AS nn
       FROM e GROUP BY 1),
pair AS (SELECT a.vec_id AS i, b.vec_id AS jv,
                CAST(SUM(ea.code * eb.code) AS BIGINT) AS dp
         FROM asg a JOIN asg b
           ON b.cluster = a.cluster AND b.vec_id < a.vec_id
         JOIN e ea ON ea.vec_id = a.vec_id
         JOIN e eb ON eb.vec_id = b.vec_id AND eb.d = ea.d
         GROUP BY 1, 2),
dup AS (SELECT DISTINCT p.i AS vec_id
        FROM pair p
        JOIN n2 ni ON ni.vec_id = p.i
        JOIN n2 nj ON nj.vec_id = p.jv
        WHERE p.dp > 0 AND 400 * p.dp * p.dp >= 361 * ni.nn * nj.nn)
SELECT a.vec_id, a.cluster,
       CASE WHEN dup.vec_id IS NULL THEN 0 ELSE 1 END AS is_dup
FROM asg a LEFT JOIN dup USING (vec_id)
ORDER BY a.vec_id
"""


EXT_QUERIES.update({
    "q_kmeans": q_kmeans,
    "q_semantic_dedup": q_semantic_dedup,
})
EXT_ORACLE_SQL.update({
    "q_kmeans": SQL_KMEANS,
    "q_semantic_dedup": SQL_SEMANTIC_DEDUP,
})


def q_dsir_weights(sf_dir: str):
    """DSIR-style importance weights (X133): hashed-unigram target-vs-raw
    LM log-ratio per document in integer micro-nats (target slice =
    lang 'en'; 65536 hash buckets; see stages/textstats.py dsir_weights
    for the two-pass broadcast shape)."""
    import ray

    from phrasekit_ray.stages.textstats import dsir_weights

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    t = _collect(dsir_weights(docs, target_lang="en"))
    return _i64(
        t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])),
        "doc_id", "n_toks", "dsir_micro",
    )


SQL_DSIR_WEIGHTS = """
WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
              FROM documents),
th AS (SELECT doc_id, lang,
              CAST(md5_number_upper(tok) % 65536 AS BIGINT) AS b
       FROM toks),
cr AS (SELECT b, count(*) AS c FROM th GROUP BY 1),
ctg AS (SELECT b, count(*) AS c FROM th WHERE lang = 'en' GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM th) AS nr,
               (SELECT count(*) FROM th WHERE lang = 'en') AS nt),
lp AS (SELECT th.doc_id,
        CAST(round(ln((CAST(COALESCE(ctg.c, 0) AS DOUBLE) + 1.0)
                      / (tot.nt + 65536)) * 1000000.0) AS BIGINT)
      - CAST(round(ln((CAST(cr.c AS DOUBLE) + 1.0)
                      / (tot.nr + 65536)) * 1000000.0) AS BIGINT) AS w
       FROM th JOIN cr USING (b) LEFT JOIN ctg USING (b) CROSS JOIN tot)
SELECT d.doc_id,
       COALESCE(s.n_toks, 0) AS n_toks,
       COALESCE(s.dsir_micro, 0) AS dsir_micro
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n_toks, CAST(SUM(w) AS BIGINT) AS dsir_micro
  FROM lp GROUP BY 1) s USING (doc_id)
ORDER BY d.doc_id
"""


EXT_QUERIES.update({"q_dsir_weights": q_dsir_weights})
EXT_ORACLE_SQL.update({"q_dsir_weights": SQL_DSIR_WEIGHTS})


def q_link_prediction(sf_dir: str):
    """Common-neighbor / Adamic–Adar link prediction (X134) over the
    extracted host link graph (X104): every non-adjacent host pair with
    ≥1 common neighbor, scored cn + aa_micro (stages/kg.link_prediction
    — middle-partitioned wedge enumeration + packed-key ANTI join).

    The host→int-id dictionary here is driver-side over the AGGREGATED
    host edge table (bounded by the distinct-host count; at web scale
    the same adapter uses the global-enumeration stage X19 instead —
    the scored kernel is fully distributed either way)."""
    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.extract import extract_links, host_edges
    from phrasekit_ray.stages.kg import link_prediction

    pages = pages_from_documents(sf_dir, with_links=True)
    he = _collect(host_edges(extract_links(pages)))
    src = he["src_host"].to_pylist()
    dst = he["dst_host"].to_pylist()
    hosts = sorted(set(src) | set(dst))
    hid = {h: i for i, h in enumerate(hosts)}
    edges = pa.table(
        {
            "subj": pa.array([hid[h] for h in src], pa.int64()),
            "obj": pa.array([hid[h] for h in dst], pa.int64()),
        }
    )
    t = _collect(link_prediction(ray.data.from_arrow(edges)))
    a = t["a"].to_pylist()
    b = t["b"].to_pylist()
    out = pa.table(
        {
            "host_a": pa.array([hosts[i] for i in a], pa.string()),
            "host_b": pa.array([hosts[i] for i in b], pa.string()),
            "cn": t["cn"].cast(pa.int64()),
            "aa_micro": t["aa_micro"].cast(pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("host_a", "ascending"), ("host_b", "ascending")],
        )
    )


SQL_LINK_PREDICTION = f"""
WITH s AS (SELECT doc_id, source, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT source, j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s),
he AS (SELECT source || '.example.org' AS src_host,
              'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS dst_host
       FROM l WHERE j <= n_links),
e AS (SELECT DISTINCT LEAST(src_host, dst_host) AS u,
                      GREATEST(src_host, dst_host) AS v
      FROM he WHERE src_host <> dst_host),
adj AS (SELECT u AS z, v AS x FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT z, count(*) AS d FROM adj GROUP BY 1),
p AS (SELECT a.x AS ha, b.x AS hb, d.d
      FROM adj a JOIN adj b ON b.z = a.z AND b.x > a.x
      JOIN deg d ON d.z = a.z),
agg AS (SELECT ha, hb, count(*) AS cn,
               CAST(SUM(CAST(round(1000000.0 / ln(d)) AS BIGINT))
                    AS BIGINT) AS aa_micro
        FROM p GROUP BY 1, 2),
ne AS (SELECT * FROM agg WHERE NOT EXISTS
       (SELECT 1 FROM e WHERE e.u = agg.ha AND e.v = agg.hb))
SELECT ha AS host_a, hb AS host_b, cn, aa_micro FROM ne ORDER BY 1, 2
"""


EXT_QUERIES.update({"q_link_prediction": q_link_prediction})
EXT_ORACLE_SQL.update({"q_link_prediction": SQL_LINK_PREDICTION})


def q_media_probe(sf_dir: str):
    """Compressed-container structural probe (X135): deterministic
    MP4 / IMA-ADPCM-WAV / MP3 / truncated fixtures synthesized per
    doc_id → MediaProbeActor pool (REAL ISO-BMFF sample-table parse,
    MP3 frame walk, ADPCM decompress) → per-container decode stats.
    Rows-only (binary container parsing is not SQL-expressible); the
    exact per-format counts are pinned by pytest (test_media.py)."""
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate
    from phrasekit_ray.stages.multimodal import (
        probe_media,
        synthesize_compressed_media_from_documents,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    probed = probe_media(
        synthesize_compressed_media_from_documents(docs),
        concurrency=(1, 4), batch_size=64,
    )

    def prep(b: pa.Table) -> pa.Table:
        mid = b["media_id"].combine_chunks()
        kind = pc.replace_substring_regex(mid, "_.*$", "")
        ok = b["ok"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "kind": kind,
                "n": pa.array(np.ones(b.num_rows, np.int64)),
                "n_ok": ok,
                "n_units": b["n_units"].combine_chunks().cast(pa.int64()),
                "duration_ms": b["duration_ms"].combine_chunks().cast(pa.int64()),
            }
        )

    t = _collect(
        hash_aggregate(
            probed.map_batches(prep, batch_format="pyarrow"),
            ["kind"],
            [("n", "sum"), ("n_ok", "sum"), ("n_units", "sum"),
             ("duration_ms", "sum")],
        )
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("kind", "ascending")]))
    return _i64(t, "n", "n_ok", "n_units", "duration_ms")


EXT_QUERIES.update({"q_media_probe": q_media_probe})


def q_pq_encode(sf_dir: str):
    """Product-quantization codebook training + encoding (X136): M=8
    subspaces × K=16 codewords trained with the exact-int Lloyd
    recurrence (stages/cluster.pq_train — ONE streaming pass per
    iteration for all M×K centroids), then per (vector, subspace) the
    assigned codeword and quantization error in integer micro-units."""
    import ray

    from phrasekit_ray.stages.cluster import pq_encode

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = _collect(pq_encode(emb, m_subspaces=8, k_codes=16, iters=3))
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("vec_id", "ascending"), ("m", "ascending")]
        )
    )


def _sql_pq_chain(
    m_subspaces: int = 8, k: int = 16, iters: int = 3, scale: float = 512.0,
    dim: int = 64,
) -> tuple[str, str, int]:
    """Unrolled product-quantization Lloyd chain: the kmeans twin with
    every CTE carrying the subspace key m = d // subdim. Same exact-int
    state machine and float tail as stages/cluster.pq_train/pq_encode.
    Returns (chain_sql, final_centroid_cte, T) where a{{T}} holds the
    final assignments and m{{T}} the final (ss, cnt) per (m, j)."""
    sub = dim // m_subspaces
    s = f"""
WITH e AS (SELECT vec_id,
    generate_subscripts(embedding, 1) - 1 AS d,
    (generate_subscripts(embedding, 1) - 1) // {sub} AS m,
    CAST(round(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT)
      AS code
  FROM embeddings),
seeds AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS j
          FROM (SELECT DISTINCT vec_id FROM embeddings
                ORDER BY vec_id LIMIT {k})),
c0 AS (SELECT s.j, e.m, e.d, e.code AS sd, CAST(1 AS BIGINT) AS cnt
       FROM seeds s JOIN e ON e.vec_id = s.vec_id)"""
    prev = "c0"
    for i in range(1, iters + 2):
        s += f""",
m{i} AS (SELECT m, j, CAST(SUM(sd * sd) AS BIGINT) AS ss, MIN(cnt) AS cnt
         FROM {prev} GROUP BY 1, 2),
d{i} AS (SELECT e.vec_id, e.m, c.j,
                CAST(SUM(e.code * c.sd) AS BIGINT) AS dot
         FROM e JOIN {prev} c USING (d) GROUP BY 1, 2, 3),
a{i} AS (SELECT vec_id, m, j, dot FROM (
           SELECT d.vec_id, d.m, d.j, d.dot, row_number() OVER (
             PARTITION BY d.vec_id, d.m ORDER BY
               (-2.0 * CAST(d.dot AS DOUBLE)) / CAST(mm.cnt AS DOUBLE)
               + CAST(mm.ss AS DOUBLE)
                 / (CAST(mm.cnt AS DOUBLE) * CAST(mm.cnt AS DOUBLE)) ASC,
               d.j ASC) AS rn
           FROM d{i} d JOIN m{i} mm ON mm.m = d.m AND mm.j = d.j)
         WHERE rn = 1)"""
        if i <= iters:
            s += f""",
f{i} AS (SELECT a.j, e.m, e.d, CAST(SUM(e.code) AS BIGINT) AS sd,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM a{i} a JOIN e ON e.vec_id = a.vec_id AND e.m = a.m
         GROUP BY 1, 2, 3),
c{i} AS (SELECT p.j, p.m, p.d, COALESCE(f.sd, p.sd) AS sd,
                COALESCE(f.cnt, p.cnt) AS cnt
         FROM {prev} p LEFT JOIN f{i} f
           ON f.j = p.j AND f.m = p.m AND f.d = p.d)"""
            prev = f"c{i}"
    return s, prev, iters + 1


def _sql_pq_encode(
    m_subspaces: int = 8, k: int = 16, iters: int = 3, scale: float = 512.0,
    dim: int = 64,
) -> str:
    s, _, T = _sql_pq_chain(m_subspaces, k, iters, scale, dim)
    s += f""",
xx AS (SELECT vec_id, m, CAST(SUM(code * code) AS BIGINT) AS sxx
       FROM e GROUP BY 1, 2)
SELECT a.vec_id, a.m, a.j AS code,
  CAST(round(((CAST(xx.sxx AS DOUBLE)
      - 2.0 * CAST(a.dot AS DOUBLE) / CAST(mm.cnt AS DOUBLE)
      + CAST(mm.ss AS DOUBLE)
        / (CAST(mm.cnt AS DOUBLE) * CAST(mm.cnt AS DOUBLE)))
     / ({scale} * {scale})) * 1000000.0) AS BIGINT) AS sub_err_micro
FROM a{T} a
JOIN m{T} mm ON mm.m = a.m AND mm.j = a.j
JOIN xx ON xx.vec_id = a.vec_id AND xx.m = a.m
ORDER BY a.vec_id, a.m"""
    return s


SQL_PQ_ENCODE = _sql_pq_encode(8, 16, 3, 512.0, 64)


EXT_QUERIES.update({"q_pq_encode": q_pq_encode})
EXT_ORACLE_SQL.update({"q_pq_encode": SQL_PQ_ENCODE})


def q_pq_search(sf_dir: str):
    """ADC top-k ANN over PQ codes (X137): the n_queries smallest
    vec_ids search the whole corpus; per document the distance is an
    (M,) int64 LUT gather + sum, ranking is exact-integer and therefore
    SQL-twin-checkable end to end (stages/cluster.pq_search)."""
    import ray

    from phrasekit_ray.stages.cluster import pq_search

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = pq_search(emb, n_queries=8, k=10, m_subspaces=8, k_codes=16, iters=3)
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("query_id", "ascending"), ("rank", "ascending")]
        )
    )


def _sql_pq_search(
    nq: int = 8, topk: int = 10, m_subspaces: int = 8, k: int = 16,
    iters: int = 3, scale: float = 512.0, dim: int = 64,
) -> str:
    """PQ chain + per-query LUT + integer ADC sum + rank — the exact
    twin of stages/cluster.pq_search (same float tail, same micro
    rounding, same (adc ASC, vec_id ASC) tiebreak)."""
    s, prevc, T = _sql_pq_chain(m_subspaces, k, iters, scale, dim)
    s += f""",
qv AS (SELECT vec_id FROM (SELECT DISTINCT vec_id FROM embeddings
                           ORDER BY vec_id LIMIT {nq})),
qdot AS (SELECT e.vec_id AS q_id, e.m, c.j,
                CAST(SUM(e.code * c.sd) AS BIGINT) AS dot
         FROM e JOIN qv USING (vec_id) JOIN {prevc} c USING (d)
         GROUP BY 1, 2, 3),
qxx AS (SELECT e.vec_id AS q_id, e.m,
               CAST(SUM(e.code * e.code) AS BIGINT) AS sxx
        FROM e JOIN qv USING (vec_id) GROUP BY 1, 2),
lut AS (SELECT q.q_id, q.m, q.j,
  CAST(round(((CAST(x.sxx AS DOUBLE)
      - 2.0 * CAST(q.dot AS DOUBLE) / CAST(mm.cnt AS DOUBLE)
      + CAST(mm.ss AS DOUBLE)
        / (CAST(mm.cnt AS DOUBLE) * CAST(mm.cnt AS DOUBLE)))
     / ({scale} * {scale})) * 1000000.0) AS BIGINT) AS dmicro
  FROM qdot q
  JOIN m{T} mm ON mm.m = q.m AND mm.j = q.j
  JOIN qxx x ON x.q_id = q.q_id AND x.m = q.m),
adc AS (SELECT l.q_id AS query_id, a.vec_id,
               CAST(SUM(l.dmicro) AS BIGINT) AS adc_micro
        FROM a{T} a JOIN lut l ON l.m = a.m AND l.j = a.j
        GROUP BY 1, 2)
SELECT query_id, vec_id, adc_micro, CAST(rn AS INTEGER) AS rank FROM (
  SELECT query_id, vec_id, adc_micro, row_number() OVER (
    PARTITION BY query_id ORDER BY adc_micro ASC, vec_id ASC) AS rn
  FROM adc)
WHERE rn <= {topk}
ORDER BY query_id, rn"""
    return s


SQL_PQ_SEARCH = _sql_pq_search(8, 10, 8, 16, 3, 512.0, 64)


EXT_QUERIES.update({"q_pq_search": q_pq_search})
EXT_ORACLE_SQL.update({"q_pq_search": SQL_PQ_SEARCH})


def q_ppr_hosts(sf_dir: str):
    """Exact-integer personalized PageRank (X138) over the extracted
    host link graph: seeds = 4 lexicographically-smallest hosts, 4
    unrolled rounds of the sink-loss recurrence in int64 micro-units
    (stages/kg.ppr_exact) — the oracle-checkable sibling of the
    float-ranked q_host_pagerank. Host→int ids driver-side over the
    aggregated host table (bounded; X19 global enumeration is the
    web-scale adapter), id order == lexicographic host order so the
    stage's smallest-id seed pick matches the SQL's ORDER BY host."""
    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.extract import extract_links, host_edges
    from phrasekit_ray.stages.kg import ppr_exact

    pages = pages_from_documents(sf_dir, with_links=True)
    he = _collect(host_edges(extract_links(pages)))
    src = he["src_host"].to_pylist()
    dst = he["dst_host"].to_pylist()
    hosts = sorted(set(src) | set(dst))
    hid = {h: i for i, h in enumerate(hosts)}
    edges = pa.table(
        {
            "subj": pa.array([hid[h] for h in src], pa.int64()),
            "obj": pa.array([hid[h] for h in dst], pa.int64()),
        }
    )
    t = _collect(ppr_exact(ray.data.from_arrow(edges), n_seeds=4, iters=4))
    out = pa.table(
        {
            "host": pa.array(
                [hosts[i] for i in t["node"].to_pylist()], pa.string()
            ),
            "rank_micro": t["rank_micro"].cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("host", "ascending")]))


def _sql_ppr_hosts(
    n_seeds: int = 4, iters: int = 4, alpha_num: int = 85,
    alpha_den: int = 100, total_micro: int = 10**12,
) -> str:
    """Unrolled PPR twin of stages/kg.ppr_exact over the host-graph
    CTEs (same synthesis as SQL_LINK_PREDICTION but DIRECTED distinct
    edges). DuckDB's // on non-negative BIGINTs == numpy int64 floor
    division, so every round is bit-exact."""
    r0 = total_micro // n_seeds
    base = ((alpha_den - alpha_num) * total_micro) // (alpha_den * n_seeds)
    s = f"""
WITH s AS (SELECT doc_id, source, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT source, j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s),
he AS (SELECT source || '.example.org' AS src,
              'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS dst
       FROM l WHERE j <= n_links),
e AS (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
od AS (SELECT src AS node, count(*) AS od FROM e GROUP BY 1),
seeds AS (SELECT node FROM nodes ORDER BY node LIMIT {n_seeds}),
r0 AS (SELECT n.node,
              CASE WHEN s.node IS NOT NULL
                   THEN CAST({r0} AS BIGINT) ELSE CAST(0 AS BIGINT) END AS rm
       FROM nodes n LEFT JOIN seeds s ON s.node = n.node)"""
    prev = "r0"
    for i in range(1, iters + 1):
        s += f""",
q{i} AS (SELECT r.node, (r.rm * {alpha_num}) // ({alpha_den} * d.od) AS q
        FROM {prev} r JOIN od d ON d.node = r.node),
r{i} AS (SELECT n.node,
  CAST(CASE WHEN sd.node IS NOT NULL THEN {base} ELSE 0 END
       + COALESCE(inf.sq, 0) AS BIGINT) AS rm
  FROM nodes n
  LEFT JOIN seeds sd ON sd.node = n.node
  LEFT JOIN (SELECT e.dst AS node, CAST(SUM(q.q) AS BIGINT) AS sq
             FROM e JOIN q{i} q ON q.node = e.src GROUP BY 1) inf
    ON inf.node = n.node)"""
        prev = f"r{i}"
    s += f"""
SELECT node AS host, rm AS rank_micro FROM {prev} ORDER BY host"""
    return s


SQL_PPR_HOSTS = _sql_ppr_hosts(4, 4, 85, 100, 10**12)


EXT_QUERIES.update({"q_ppr_hosts": q_ppr_hosts})
EXT_ORACLE_SQL.update({"q_ppr_hosts": SQL_PPR_HOSTS})


def q_sssp_hosts(sf_dir: str):
    """Hop-bounded Bellman–Ford shortest paths (X139) over the
    SYMMETRIZED host link graph (link distance is undirected; the raw
    graph's lexicographically-smallest host is a pure sink): source =
    smallest host, 6 relaxation rounds, exact int64 weights
    w = 1 + ((|src|+|dst|) %% 7) — symmetric and a pure function of the
    host pair, so the unrolled SQL twin reproduces every distance
    bit-for-bit (stages/kg.sssp_exact)."""
    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.extract import extract_links, host_edges
    from phrasekit_ray.stages.kg import sssp_exact

    pages = pages_from_documents(sf_dir, with_links=True)
    he = _collect(host_edges(extract_links(pages)))
    src = he["src_host"].to_pylist()
    dst = he["dst_host"].to_pylist()
    hosts = sorted(set(src) | set(dst))
    hid = {h: i for i, h in enumerate(hosts)}
    keep = [(a, b) for a, b in zip(src, dst) if a != b]
    both = keep + [(b, a) for a, b in keep]
    edges = pa.table(
        {
            "subj": pa.array([hid[a] for a, _ in both], pa.int64()),
            "obj": pa.array([hid[b] for _, b in both], pa.int64()),
            "w": pa.array(
                [1 + ((len(a) + len(b)) % 7) for a, b in both], pa.int64()
            ),
        }
    )
    t = _collect(
        sssp_exact(ray.data.from_arrow(edges), source=0, iters=6)
    )
    out = pa.table(
        {
            "host": pa.array(
                [hosts[i] for i in t["node"].to_pylist()], pa.string()
            ),
            "dist": t["dist"].cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("host", "ascending")]))


def _sql_sssp_hosts(iters: int = 6) -> str:
    """Unrolled Bellman–Ford twin of stages/kg.sssp_exact over the
    host-graph CTEs: T rounds of dist ∪ (dist ⋈ edges) → MIN."""
    s = f"""
WITH s AS (SELECT doc_id, source, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT source, j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s),
he AS (SELECT source || '.example.org' AS src,
              'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS dst
       FROM l WHERE j <= n_links),
e0 AS (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
ew AS (SELECT src, dst,
              CAST(1 + ((length(src) + length(dst)) % 7) AS BIGINT) AS w
       FROM e),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
d0 AS (SELECT min(node) AS node, CAST(0 AS BIGINT) AS dist FROM nodes)"""
    prev = "d0"
    for i in range(1, iters + 1):
        s += f""",
d{i} AS (SELECT node, MIN(dist) AS dist FROM (
  SELECT node, dist FROM {prev}
  UNION ALL
  SELECT ew.dst AS node, d.dist + ew.w AS dist
  FROM {prev} d JOIN ew ON ew.src = d.node) GROUP BY node)"""
        prev = f"d{i}"
    s += f"""
SELECT node AS host, dist FROM {prev} ORDER BY host"""
    return s


SQL_SSSP_HOSTS = _sql_sssp_hosts(6)


EXT_QUERIES.update({"q_sssp_hosts": q_sssp_hosts})
EXT_ORACLE_SQL.update({"q_sssp_hosts": SQL_SSSP_HOSTS})


def q_hits_hosts(sf_dir: str):
    """Exact-integer HITS hubs & authorities (X147) over the extracted
    directed host link graph: 4 unrolled rounds of the ceil-quotient-
    normalized sum recurrence in int64 units (stages/kg.hits_exact) —
    the link-topology complement to the PageRank family (authorities =
    hosts good hubs point AT; the aggregator h*.example.org hosts score
    as authorities, the source hosts as hubs). Host→int ids driver-side
    over the aggregated host table (bounded; X19 global enumeration is
    the web-scale adapter), id order == lexicographic host order."""
    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.extract import extract_links, host_edges
    from phrasekit_ray.stages.kg import hits_exact

    pages = pages_from_documents(sf_dir, with_links=True)
    he = _collect(host_edges(extract_links(pages)))
    src = he["src_host"].to_pylist()
    dst = he["dst_host"].to_pylist()
    hosts = sorted(set(src) | set(dst))
    hid = {h: i for i, h in enumerate(hosts)}
    edges = pa.table(
        {
            "subj": pa.array([hid[h] for h in src], pa.int64()),
            "obj": pa.array([hid[h] for h in dst], pa.int64()),
        }
    )
    t = _collect(hits_exact(ray.data.from_arrow(edges), iters=4))
    out = pa.table(
        {
            "host": pa.array(
                [hosts[i] for i in t["node"].to_pylist()], pa.string()
            ),
            "auth_micro": t["auth_micro"].cast(pa.int64()),
            "hub_micro": t["hub_micro"].cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("host", "ascending")]))


def _sql_hits_hosts(iters: int = 4, scale: int = 10**6) -> str:
    """Unrolled HITS twin of stages/kg.hits_exact over the host-graph
    CTEs (same synthesis as SQL_PPR_HOSTS). The ceil-quotient
    normalization (v // max(ceil(max_v/scale), 1)) is pure BIGINT floor
    division, so every round is bit-exact at any partitioning."""
    s = f"""
WITH s AS (SELECT doc_id, source, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT source, j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s),
he AS (SELECT source || '.example.org' AS src,
              'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS dst
       FROM l WHERE j <= n_links),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
h0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS v FROM nodes)"""
    prev_h = "h0"
    for i in range(1, iters + 1):
        s += f""",
ar{i} AS MATERIALIZED (SELECT n.node, CAST(COALESCE(sq.sq, 0) AS BIGINT) AS v
  FROM nodes n
  LEFT JOIN (SELECT e.dst AS node, CAST(SUM(h.v) AS BIGINT) AS sq
             FROM e JOIN {prev_h} h ON h.node = e.src GROUP BY 1) sq
    ON sq.node = n.node),
a{i} AS MATERIALIZED (SELECT node, CAST(v // GREATEST(
           (SELECT (MAX(v) + {scale - 1}) // {scale} FROM ar{i}), 1)
         AS BIGINT) AS v FROM ar{i}),
hr{i} AS MATERIALIZED (SELECT n.node, CAST(COALESCE(sq.sq, 0) AS BIGINT) AS v
  FROM nodes n
  LEFT JOIN (SELECT e.src AS node, CAST(SUM(a.v) AS BIGINT) AS sq
             FROM e JOIN a{i} a ON a.node = e.dst GROUP BY 1) sq
    ON sq.node = n.node),
h{i} AS MATERIALIZED (SELECT node, CAST(v // GREATEST(
           (SELECT (MAX(v) + {scale - 1}) // {scale} FROM hr{i}), 1)
         AS BIGINT) AS v FROM hr{i})"""
        prev_h = f"h{i}"
    s += f"""
SELECT a.node AS host, a.v AS auth_micro, h.v AS hub_micro
FROM a{iters} a JOIN h{iters} h ON h.node = a.node
ORDER BY host"""
    return s


SQL_HITS_HOSTS = _sql_hits_hosts(4, 10**6)


EXT_QUERIES.update({"q_hits_hosts": q_hits_hosts})
EXT_ORACLE_SQL.update({"q_hits_hosts": SQL_HITS_HOSTS})


def q_kg_negative_edges(sf_dir: str):
    """KG-embedding negative sampling (X148) over the extracted host
    link graph: for every distinct positive edge and slot j ∈ 1..3,
    the object is corrupted to the node with sorted rank
    splitmix17((rank(s)·N + rank(o))·3 + j) % N; self-loop and
    positive-edge collisions are dropped, not resampled
    (stages/kg.negative_edges). The corrupted-triple training-data
    generator of TransE-family KG embedding pipelines, deterministic
    and bit-exact against the SQL twin. Host→int ids driver-side over
    the aggregated host table (bounded; X19 is the web-scale adapter),
    id order == lexicographic host order == the stage's sorted ranks."""
    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.extract import extract_links, host_edges
    from phrasekit_ray.stages.kg import negative_edges

    pages = pages_from_documents(sf_dir, with_links=True)
    he = _collect(host_edges(extract_links(pages)))
    src = he["src_host"].to_pylist()
    dst = he["dst_host"].to_pylist()
    hosts = sorted(set(src) | set(dst))
    hid = {h: i for i, h in enumerate(hosts)}
    edges = pa.table(
        {
            "subj": pa.array([hid[h] for h in src], pa.int64()),
            "obj": pa.array([hid[h] for h in dst], pa.int64()),
        }
    )
    t = _collect(negative_edges(ray.data.from_arrow(edges), k=3))
    out = pa.table(
        {
            "src_host": pa.array(
                [hosts[i] for i in t["subj"].to_pylist()], pa.string()
            ),
            "neg_dst_host": pa.array(
                [hosts[i] for i in t["obj_neg"].to_pylist()], pa.string()
            ),
            "slot": t["slot"].cast(pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[
                ("src_host", "ascending"),
                ("neg_dst_host", "ascending"),
                ("slot", "ascending"),
            ],
        )
    )


def _sql_kg_negative_edges(k: int = 3) -> str:
    """SQL twin of stages/kg.negative_edges over the host-graph CTEs:
    nodes ranked by lexicographic order, candidate rank =
    splitmix((s·N + o)·k + j) % N, NOT EXISTS vs positives. The hash
    input stays far below 2^64 (N < 2^31, k ≤ 256), so the HUGEINT
    arithmetic equals the stage's wrapping uint64."""
    key = (
        f"CAST(c.s AS HUGEINT) * (SELECT n FROM nn) * {k} "
        f"+ CAST(c.o AS HUGEINT) * {k} + CAST(c.j AS HUGEINT)"
    )
    return f"""
WITH s AS (SELECT doc_id, source, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT source, j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s),
he AS (SELECT source || '.example.org' AS src,
              'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS dst
       FROM l WHERE j <= n_links),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
nodes AS MATERIALIZED (
  SELECT node, row_number() OVER (ORDER BY node) - 1 AS idx
  FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)),
nn AS (SELECT COUNT(*) AS n FROM nodes),
ei AS MATERIALIZED (
  SELECT sn.idx AS s, dn.idx AS o
  FROM e JOIN nodes sn ON sn.node = e.src
         JOIN nodes dn ON dn.node = e.dst),
cand AS MATERIALIZED (
  SELECT c.s, c.j, ({_sm_sql(key)}) % (SELECT n FROM nn) AS r
  FROM (SELECT ei.s, ei.o, g.j
        FROM ei, generate_series(1, {k}) AS g(j)) c),
neg AS (SELECT c.s, c.r, c.j FROM cand c
        WHERE c.r <> c.s
          AND NOT EXISTS (SELECT 1 FROM ei x
                          WHERE x.s = c.s AND x.o = c.r))
SELECT sn.node AS src_host, dn.node AS neg_dst_host,
       CAST(neg.j AS BIGINT) AS slot
FROM neg JOIN nodes sn ON sn.idx = neg.s
         JOIN nodes dn ON dn.idx = neg.r
ORDER BY 1, 2, 3"""


SQL_KG_NEGATIVE_EDGES = _sql_kg_negative_edges(3)


EXT_QUERIES.update({"q_kg_negative_edges": q_kg_negative_edges})
EXT_ORACLE_SQL.update({"q_kg_negative_edges": SQL_KG_NEGATIVE_EDGES})


def q_kg_latest_facts(sf_dir: str):
    """Temporal latest-fact snapshot (X149): for every subject in the
    flagship triple stream, the most recently asserted object — winner
    = argmax (warc_ts, obj) per subj (obj is the deterministic
    tiebreak when one crawl asserts several facts). The
    contradiction-resolution / current-state view a production KG
    serves next to the full X124 provenance history. One X87
    ``grouped_argmax`` (two-phase, in-block combiner) over the triple
    stream; warc_ts is recovered from the triple's source url exactly
    as pages synthesis defined it (ts_us = EPOCH_US + doc_id·10⁶)."""
    from phrasekit_ray.sources.pages import EPOCH_US
    from phrasekit_ray.stages.agg import grouped_argmax

    triples = _flagship_triples(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.replace_substring_regex(
                b["doc_id"].combine_chunks().cast(pa.string()), r"^.*/", ""
            ),
            pa.int64(),
        )
        ts = pc.add(pc.multiply(d, pa.scalar(1_000_000, pa.int64())),
                    pa.scalar(EPOCH_US, pa.int64()))
        return pa.table(
            {
                "subj": b["subj"].combine_chunks().cast(pa.int64()),
                "ts_us": ts,
                "obj": b["obj"].combine_chunks().cast(pa.int64()),
            }
        )

    latest = grouped_argmax(
        triples.map_batches(prep, batch_format="pyarrow"),
        "subj", ["ts_us", "obj"], [],
    )
    t = _collect(latest)
    out = pa.table(
        {
            "subj": t["subj"].cast(pa.int64()),
            "obj": t["obj"].cast(pa.int64()),
            "last_ts": t["ts_us"].cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("subj", "ascending")]))


def _sql_kg_latest_facts() -> str:
    from phrasekit_ray.pipelines.queries import _sql_flagship
    from phrasekit_ray.sources.pages import EPOCH_US

    return f"""
WITH t AS ({_sql_flagship()}),
w AS (SELECT subj, obj,
        CAST({EPOCH_US} AS BIGINT)
        + CAST(regexp_extract(doc_id, '([0-9]+)$', 1) AS BIGINT) * 1000000
          AS ts_us
      FROM t)
SELECT subj, obj, ts_us AS last_ts
FROM (SELECT subj, obj, ts_us,
             row_number() OVER (PARTITION BY subj
                                ORDER BY ts_us DESC, obj DESC) AS rn
      FROM w) q
WHERE rn = 1 ORDER BY subj"""


EXT_QUERIES.update({"q_kg_latest_facts": q_kg_latest_facts})
EXT_ORACLE_SQL.update({"q_kg_latest_facts": _sql_kg_latest_facts()})


def q_clustering_coeff(sf_dir: str):
    """Local clustering coefficient (X150) per triangle-bearing node of
    the part co-occurrence graph: cc_micro = 2·10⁶·tri(v) //
    (deg(v)·(deg(v)−1)) in exact integer micro-units — the
    community-density diagnostic next to raw triangle counts (X62) and
    k-core shells (X113). Composition: X62 ``triangle_counts`` + one
    two-phase degree count over the SAME canonical distinct undirected
    edge set + ONE int-keyed ``lookup_join``; every node in a triangle
    has deg ≥ 2 so the divisor is never 0."""
    import ray  # noqa: F401

    from phrasekit_ray.stages.agg import grouped_count, lookup_join
    from phrasekit_ray.stages.kg import triangle_counts

    edges_ds = _basket_edges_ds(sf_dir)

    def canon(b: pa.Table) -> pa.Table:
        s = b["subj"].combine_chunks().cast(pa.int64())
        o = b["obj"].combine_chunks().cast(pa.int64())
        keep = pc.invert(pc.equal(s, o))
        s, o = s.filter(keep), o.filter(keep)
        u = pc.min_element_wise(s, o)
        v = pc.max_element_wise(s, o)
        return pa.table({"u": u, "v": v})

    dedup = grouped_count(
        edges_ds.map_batches(canon, batch_format="pyarrow"), ["u", "v"]
    ).map_batches(lambda b: b.select(["u", "v"]), batch_format="pyarrow")
    deg = grouped_count(
        dedup.map_batches(
            lambda b: pa.table(
                {"node": pa.concat_arrays(
                    [b["u"].combine_chunks(), b["v"].combine_chunks()]
                )}
            ),
            batch_format="pyarrow",
        ),
        "node", count_col="d",
    )
    tri = triangle_counts(_basket_edges_ds(sf_dir))
    joined = lookup_join(
        tri, deg, "node", "node",
        left_schema=pa.schema([("node", pa.int64()), ("n_triangles", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("d", pa.int64())]),
    )

    def finish(b: pa.Table) -> pa.Table:
        t = b["n_triangles"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = b["d"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        cc = (2_000_000 * t) // (d * (d - 1))
        return pa.table(
            {
                "node": b["node"].combine_chunks().cast(pa.int64()),
                "n_triangles": pa.array(t, pa.int64()),
                "cc_micro": pa.array(cc, pa.int64()),
            }
        )

    out = _collect(joined.map_batches(finish, batch_format="pyarrow"))
    return out.take(pc.sort_indices(out, sort_keys=[("node", "ascending")]))


SQL_CLUSTERING_COEFF = (
    "WITH "
    + _SQL_BASKET_EDGES
    + """,
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
tc AS (
  SELECT node, count(*) AS n_triangles
  FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node),
deg AS (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node)
SELECT tc.node, CAST(tc.n_triangles AS BIGINT) AS n_triangles,
       CAST((2000000 * tc.n_triangles) // (deg.d * (deg.d - 1)) AS BIGINT)
         AS cc_micro
FROM tc JOIN deg ON deg.node = tc.node
ORDER BY tc.node"""
)


EXT_QUERIES.update({"q_clustering_coeff": q_clustering_coeff})
EXT_ORACLE_SQL.update({"q_clustering_coeff": SQL_CLUSTERING_COEFF})


def q_edge_support(sf_dir: str):
    """Per-edge triangle support (X151) over the part co-occurrence
    graph: support(u,v) = number of triangles through the edge = common
    neighbors of its endpoints (stages/kg.edge_triangle_support — the
    SEMI-join sibling of X134 link prediction, and the round kernel of
    the X152 k-truss peel). Edges in no triangle are absent."""
    from phrasekit_ray.stages.kg import edge_triangle_support

    t = _collect(edge_triangle_support(_basket_edges_ds(sf_dir)))
    out = pa.table(
        {
            "u": t["u"].cast(pa.int64()),
            "v": t["v"].cast(pa.int64()),
            "support": t["support"].cast(pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("u", "ascending"), ("v", "ascending")]
        )
    )


SQL_EDGE_SUPPORT = (
    "WITH "
    + _SQL_BASKET_EDGES
    + """,
adj AS MATERIALIZED (
  SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
sup AS (
  SELECT e.u, e.v, count(*) AS support
  FROM e JOIN adj x ON x.b = e.u
         JOIN adj y ON y.b = e.v AND y.a = x.a
  GROUP BY e.u, e.v)
SELECT u, v, CAST(support AS BIGINT) AS support
FROM sup ORDER BY u, v"""
)


EXT_QUERIES.update({"q_edge_support": q_edge_support})
EXT_ORACLE_SQL.update({"q_edge_support": SQL_EDGE_SUPPORT})


def q_graph_ktruss(sf_dir: str):
    """k-truss peel (X152), fixed-depth variant: k=5, 4 peel rounds
    over the part co-occurrence graph (stages/kg.k_truss) — each round
    recomputes in-subgraph triangle support and drops edges below
    k−2 = 3. Fixed depth ⇒ pure function of the edge set ⇒ exact
    unrolled SQL twin; tests pin that 4 rounds reach the fixpoint on
    the fixtures. Output carries each surviving edge's final-round
    support (≥ 3, the in-band invariant)."""
    from phrasekit_ray.stages.kg import k_truss

    t = _collect(k_truss(_basket_edges_ds(sf_dir), k=5, rounds=4))
    out = pa.table(
        {
            "u": t["u"].cast(pa.int64()),
            "v": t["v"].cast(pa.int64()),
            "support": t["support"].cast(pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("u", "ascending"), ("v", "ascending")]
        )
    )


def _sql_graph_ktruss(k: int = 5, rounds: int = 4) -> str:
    """Unrolled k-truss twin of stages/kg.k_truss over the basket-graph
    CTEs: per round one adjacency CTE, one 3-way wedge-closure count,
    one ≥ k−2 filter — all MATERIALIZED (DuckDB inlines CTEs; each
    round references the previous one several times)."""
    s = "WITH " + _SQL_BASKET_EDGES
    prev = "e"
    for i in range(1, rounds + 1):
        s += f""",
adj{i} AS MATERIALIZED (
  SELECT u AS a, v AS b FROM {prev} UNION ALL SELECT v, u FROM {prev}),
sup{i} AS MATERIALIZED (
  SELECT e.u, e.v, count(*) AS s
  FROM {prev} e JOIN adj{i} x ON x.b = e.u
                JOIN adj{i} y ON y.b = e.v AND y.a = x.a
  GROUP BY e.u, e.v),
e{i} AS MATERIALIZED (
  SELECT u, v FROM sup{i} WHERE s >= {k - 2})"""
        prev = f"e{i}"
    s += f"""
SELECT u, v, CAST(s AS BIGINT) AS support
FROM sup{rounds} WHERE s >= {k - 2} ORDER BY u, v"""
    return s


SQL_GRAPH_KTRUSS = _sql_graph_ktruss(5, 4)


EXT_QUERIES.update({"q_graph_ktruss": q_graph_ktruss})
EXT_ORACLE_SQL.update({"q_graph_ktruss": SQL_GRAPH_KTRUSS})


def q_host_reciprocity(sf_dir: str):
    """Per-host link reciprocity (X153): of each host's distinct
    directed out-edges, how many are reciprocated (the reverse edge
    exists) — the mutual-linking diagnostic that separates content
    farms (one-way link spray) from genuine hub communities. One
    packed-key SEMI ``key_filter_join`` of the distinct edge set
    against its own swap + two grouped counts with a zero-union so
    never-reciprocated hosts report 0."""
    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.agg import grouped_count, key_filter_join, lookup_join
    from phrasekit_ray.stages.extract import extract_links, host_edges

    pages = pages_from_documents(sf_dir, with_links=True)
    he = _collect(host_edges(extract_links(pages)))
    src = he["src_host"].to_pylist()
    dst = he["dst_host"].to_pylist()
    hosts = sorted(set(src) | set(dst))
    hid = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    keep = [(a, b) for a, b in zip(src, dst) if a != b]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "s": pa.array([hid[a] for a, _ in keep], pa.int64()),
                "o": pa.array([hid[b] for _, b in keep], pa.int64()),
            }
        )
    )
    dedup = grouped_count(edges, ["s", "o"]).map_batches(
        lambda b: pa.table(
            {
                "s": b["s"],
                "o": b["o"],
                "pk": pc.add(
                    pc.multiply(
                        b["s"].combine_chunks().cast(pa.int64()),
                        pa.scalar(n, pa.int64()),
                    ),
                    b["o"].combine_chunks().cast(pa.int64()),
                ),
                "rk": pc.add(
                    pc.multiply(
                        b["o"].combine_chunks().cast(pa.int64()),
                        pa.scalar(n, pa.int64()),
                    ),
                    b["s"].combine_chunks().cast(pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    n_out = grouped_count(dedup, "s", count_col="n_out")
    recip = grouped_count(
        key_filter_join(
            dedup,
            dedup.map_batches(
                lambda b: b.select(["pk"]), batch_format="pyarrow"
            ),
            "rk", "pk", anti=False,
            left_schema=pa.schema(
                [("s", pa.int64()), ("o", pa.int64()),
                 ("pk", pa.int64()), ("rk", pa.int64())]
            ),
        ),
        "s", count_col="n_recip",
    )
    # lookup_join is INNER, but never-reciprocated hosts must still
    # report 0 → zero-union: recip ∪ per-host zeros, one two-phase sum
    from phrasekit_ray.stages.agg import hash_aggregate

    zeros = n_out.map_batches(
        lambda b: pa.table(
            {"s": b["s"],
             "n_recip": pa.array(np.zeros(b.num_rows, np.int64))}
        ),
        batch_format="pyarrow",
    )
    recip_full = hash_aggregate(
        recip.union(zeros), ["s"], [("n_recip", "sum")]
    )
    out_ds = lookup_join(
        n_out, recip_full, "s", "s",
        left_schema=pa.schema([("s", pa.int64()), ("n_out", pa.int64())]),
        right_schema=pa.schema([("s", pa.int64()), ("n_recip", pa.int64())]),
    )
    t = _collect(out_ds)
    out = pa.table(
        {
            "host": pa.array(
                [hosts[i] for i in t["s"].to_pylist()], pa.string()
            ),
            "n_out": t["n_out"].cast(pa.int64()),
            "n_recip": t["n_recip"].cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("host", "ascending")]))


SQL_HOST_RECIPROCITY = f"""
WITH s AS (SELECT doc_id, source, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT source, j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s),
he AS (SELECT source || '.example.org' AS src,
              'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS dst
       FROM l WHERE j <= n_links),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM he WHERE src <> dst)
SELECT e.src AS host, COUNT(*) AS n_out,
       CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_recip
FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src
GROUP BY e.src ORDER BY host"""


EXT_QUERIES.update({"q_host_reciprocity": q_host_reciprocity})
EXT_ORACLE_SQL.update({"q_host_reciprocity": SQL_HOST_RECIPROCITY})


def q_degree_histogram(sf_dir: str):
    """Log₂-bucketed degree distribution (X154) of the undirected part
    co-occurrence graph — the power-law sanity check every web-graph
    pipeline runs before trusting centrality numbers. Bucket =
    floor(log₂ deg) computed EXACTLY via the float64 exponent
    (np.frexp; deg < 2⁵³ so the mantissa is exact), matching DuckDB's
    length(bin(d))−1; one degree count + one bucket count, both
    two-phase."""
    from phrasekit_ray.stages.agg import grouped_count

    edges_ds = _basket_edges_ds(sf_dir)

    def canon(b: pa.Table) -> pa.Table:
        s = b["subj"].combine_chunks().cast(pa.int64())
        o = b["obj"].combine_chunks().cast(pa.int64())
        keep = pc.invert(pc.equal(s, o))
        s, o = s.filter(keep), o.filter(keep)
        return pa.table(
            {"u": pc.min_element_wise(s, o), "v": pc.max_element_wise(s, o)}
        )

    dedup = grouped_count(
        edges_ds.map_batches(canon, batch_format="pyarrow"), ["u", "v"]
    )
    deg = grouped_count(
        dedup.map_batches(
            lambda b: pa.table(
                {"node": pa.concat_arrays(
                    [b["u"].combine_chunks(), b["v"].combine_chunks()]
                )}
            ),
            batch_format="pyarrow",
        ),
        "node", count_col="d",
    )

    def bucketize(b: pa.Table) -> pa.Table:
        d = b["d"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bucket = (np.frexp(d.astype(np.float64))[1] - 1).astype(np.int64)
        return pa.table({"bucket": pa.array(bucket, pa.int64())})

    hist = grouped_count(
        deg.map_batches(bucketize, batch_format="pyarrow"),
        "bucket", count_col="n_nodes",
    )
    t = _collect(hist)
    out = pa.table(
        {
            "bucket": t["bucket"].cast(pa.int64()),
            "n_nodes": t["n_nodes"].cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("bucket", "ascending")]))


SQL_DEGREE_HISTOGRAM = (
    "WITH "
    + _SQL_BASKET_EDGES
    + """,
deg AS (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node)
SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS bucket,
       count(*) AS n_nodes
FROM deg GROUP BY 1 ORDER BY bucket"""
)


EXT_QUERIES.update({"q_degree_histogram": q_degree_histogram})
EXT_ORACLE_SQL.update({"q_degree_histogram": SQL_DEGREE_HISTOGRAM})


def q_triangle_estimate(sf_dir: str):
    """Wedge-sampled triangle estimate (X155) over the part
    co-occurrence graph at rate 16/1024 — the trillion-edge scale path
    next to the exact X62 count: deterministic splitmix wedge sampling
    means the ESTIMATOR ITSELF is a pure integer function of the edge
    set, so the SQL twin checks it bit-for-bit (accuracy vs the exact
    count is pinned separately in pytest at a higher rate)
    (stages/kg.sampled_triangle_estimate)."""
    from phrasekit_ray.stages.kg import sampled_triangle_estimate

    return _collect(
        sampled_triangle_estimate(
            _basket_edges_ds(sf_dir), rate_num=16, rate_den=1024
        )
    )


def _sql_triangle_estimate(rate_num: int = 16, rate_den: int = 1024) -> str:
    hz = _sm_sql("CAST(x.a AS HUGEINT)")
    key2 = (
        f"((({hz}) + CAST(x.b AS HUGEINT)*2147483648 + CAST(y.b AS HUGEINT))"
        " & 18446744073709551615)"
    )
    # one more DivMod dodged per wedge when the rate is a power of two
    sel = (
        f"({_sm_sql_wide(key2)}) & {rate_den - 1}"
        if rate_den & (rate_den - 1) == 0
        else f"({_sm_sql_wide(key2)}) % {rate_den}"
    )
    return (
        "WITH "
        + _SQL_BASKET_EDGES
        + f""",
adj AS MATERIALIZED (
  SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT a, count(*) AS d FROM adj GROUP BY a),
tot AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS wt FROM deg),
samp AS MATERIALIZED (
  SELECT x.a AS z, x.b AS v, y.b AS w
  FROM adj x JOIN adj y ON y.a = x.a AND y.b > x.b
  WHERE ({sel}) < {rate_num}),
scnt AS (SELECT count(*) AS ws FROM samp),
closed AS (SELECT count(*) AS c
           FROM samp s JOIN e ON e.u = s.v AND e.v = s.w)
SELECT tot.wt AS wedges_total, scnt.ws AS wedges_sampled,
       closed.c AS closed_sampled,
       CAST((closed.c * {rate_den} * 1000) // ({rate_num} * 3) AS BIGINT)
         AS est_triangles_milli
FROM tot, scnt, closed"""
    )


SQL_TRIANGLE_ESTIMATE = _sql_triangle_estimate(16, 1024)


EXT_QUERIES.update({"q_triangle_estimate": q_triangle_estimate})
EXT_ORACLE_SQL.update({"q_triangle_estimate": SQL_TRIANGLE_ESTIMATE})


def q_katz_hosts(sf_dir: str):
    """Exact-integer Katz centrality (X156) over the extracted directed
    host link graph: 4 unrolled rounds of x ← scale + β·Aᵀx with β =
    1/5 and the ceil-quotient normalization, all in int64 units
    (stages/kg.katz_exact) — the attenuated-path centrality that gives
    every host a base score and weights a length-r inbound path by βʳ,
    next to PPR (X138) and HITS (X147). Host→int ids driver-side over
    the aggregated host table (bounded; X19 is the web-scale adapter),
    id order == lexicographic host order."""
    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.extract import extract_links, host_edges
    from phrasekit_ray.stages.kg import katz_exact

    pages = pages_from_documents(sf_dir, with_links=True)
    he = _collect(host_edges(extract_links(pages)))
    src = he["src_host"].to_pylist()
    dst = he["dst_host"].to_pylist()
    hosts = sorted(set(src) | set(dst))
    hid = {h: i for i, h in enumerate(hosts)}
    edges = pa.table(
        {
            "subj": pa.array([hid[h] for h in src], pa.int64()),
            "obj": pa.array([hid[h] for h in dst], pa.int64()),
        }
    )
    t = _collect(
        katz_exact(ray.data.from_arrow(edges), iters=4, beta_num=1, beta_den=5)
    )
    out = pa.table(
        {
            "host": pa.array(
                [hosts[i] for i in t["node"].to_pylist()], pa.string()
            ),
            "katz_micro": t["katz_micro"].cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("host", "ascending")]))


def _sql_katz_hosts(
    iters: int = 4, scale: int = 10**6, beta_num: int = 1, beta_den: int = 5
) -> str:
    """Unrolled Katz twin of stages/kg.katz_exact over the host-graph
    CTEs (same synthesis as SQL_HITS_HOSTS). Per-edge floor division
    (x·num // den) and the ceil-quotient normalizer are pure BIGINT
    ops, so every round is bit-exact at any partitioning. MATERIALIZED
    round CTEs keep the twin linear (X147 lesson: the scalar-subquery
    normalizer doubles references per round)."""
    s = f"""
WITH s AS (SELECT doc_id, source, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT source, j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s),
he AS (SELECT source || '.example.org' AS src,
              'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS dst
       FROM l WHERE j <= n_links),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
x0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS v FROM nodes)"""
    prev = "x0"
    for i in range(1, iters + 1):
        s += f""",
kr{i} AS MATERIALIZED (SELECT n.node,
    CAST({scale} + COALESCE(sq.sq, 0) AS BIGINT) AS v
  FROM nodes n
  LEFT JOIN (SELECT e.dst AS node,
               CAST(SUM((x.v * {beta_num}) // {beta_den}) AS BIGINT) AS sq
             FROM e JOIN {prev} x ON x.node = e.src GROUP BY 1) sq
    ON sq.node = n.node),
x{i} AS MATERIALIZED (SELECT node, CAST(v // GREATEST(
           (SELECT (MAX(v) + {scale - 1}) // {scale} FROM kr{i}), 1)
         AS BIGINT) AS v FROM kr{i})"""
        prev = f"x{i}"
    s += f"""
SELECT node AS host, v AS katz_micro
FROM x{iters} ORDER BY host"""
    return s


SQL_KATZ_HOSTS = _sql_katz_hosts(4, 10**6, 1, 5)


EXT_QUERIES.update({"q_katz_hosts": q_katz_hosts})
EXT_ORACLE_SQL.update({"q_katz_hosts": SQL_KATZ_HOSTS})


_DECAY_HL_US = 250_000_000  # half-life: 250 s of crawl time per bucket
_DECAY_MAX_SHIFT = 40  # 10^6 >> 40 == 0: older assertions weigh nothing


def q_kg_edge_decay(sf_dir: str):
    """Recency-weighted KG edge strength (X157): every assertion of an
    edge contributes weight 10⁶ >> min(age // half_life, 40) — an exact
    power-of-two half-life decay in integer micro-units (no float exp,
    so the SQL twin is bit-exact) — and the per-(subj, obj) sum is the
    freshness-weighted confidence a living KG serves next to the raw
    count (X124 provenance) and the winner-only X149 snapshot. Age is
    measured from the corpus' newest assertion (one scalar MAX over the
    triple stream); ts_us is recovered from the triple's source url
    exactly as pages synthesis defines it (ts_us = EPOCH_US +
    doc_id·10⁶). One map_batches weight pass + ONE two-phase sum."""
    from phrasekit_ray.sources.pages import EPOCH_US
    from phrasekit_ray.stages.agg import hash_aggregate

    triples = _flagship_triples(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.replace_substring_regex(
                b["doc_id"].combine_chunks().cast(pa.string()), r"^.*/", ""
            ),
            pa.int64(),
        )
        ts = pc.add(pc.multiply(d, pa.scalar(1_000_000, pa.int64())),
                    pa.scalar(EPOCH_US, pa.int64()))
        return pa.table(
            {
                "subj": b["subj"].combine_chunks().cast(pa.int64()),
                "obj": b["obj"].combine_chunks().cast(pa.int64()),
                "ts_us": ts,
            }
        )

    stamped = triples.map_batches(prep, batch_format="pyarrow").materialize()
    if stamped.count() == 0:
        return pa.table(
            {
                "subj": pa.array([], pa.int64()),
                "obj": pa.array([], pa.int64()),
                "n_assert": pa.array([], pa.int64()),
                "strength_micro": pa.array([], pa.int64()),
            }
        )
    max_ts = np.int64(stamped.max("ts_us"))

    def weigh(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        k = np.minimum(
            (max_ts - ts) // np.int64(_DECAY_HL_US),
            np.int64(_DECAY_MAX_SHIFT),
        )
        w = np.int64(10**6) >> k
        return pa.table(
            {
                "subj": b["subj"],
                "obj": b["obj"],
                "one": pa.array(np.ones(b.num_rows, np.int64)),
                "w_micro": pa.array(w, pa.int64()),
            }
        )

    agg = hash_aggregate(
        stamped.map_batches(weigh, batch_format="pyarrow"),
        ["subj", "obj"],
        [("one", "sum"), ("w_micro", "sum")],
    )
    t = _collect(agg)
    out = pa.table(
        {
            "subj": t["subj"].cast(pa.int64()),
            "obj": t["obj"].cast(pa.int64()),
            "n_assert": t["one"].cast(pa.int64()),
            "strength_micro": t["w_micro"].cast(pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("subj", "ascending"), ("obj", "ascending")]
        )
    )


def _sql_kg_edge_decay() -> str:
    from phrasekit_ray.pipelines.queries import _sql_flagship
    from phrasekit_ray.sources.pages import EPOCH_US

    return f"""
WITH t AS ({_sql_flagship()}),
w AS (SELECT subj, obj,
        CAST({EPOCH_US} AS BIGINT)
        + CAST(regexp_extract(doc_id, '([0-9]+)$', 1) AS BIGINT) * 1000000
          AS ts_us
      FROM t),
mx AS (SELECT MAX(ts_us) AS max_ts FROM w)
SELECT subj, obj, COUNT(*) AS n_assert,
       CAST(SUM(1000000 // (CAST(1 AS BIGINT) << LEAST(
           (mx.max_ts - ts_us) // {_DECAY_HL_US}, {_DECAY_MAX_SHIFT})))
         AS BIGINT) AS strength_micro
FROM w, mx
GROUP BY subj, obj ORDER BY subj, obj"""


EXT_QUERIES.update({"q_kg_edge_decay": q_kg_edge_decay})
EXT_ORACLE_SQL.update({"q_kg_edge_decay": _sql_kg_edge_decay()})


_ECC_SEEDS = 4
_ECC_HOPS = 8


def q_graph_eccentricity(sf_dir: str):
    """Hop-bounded multi-seed eccentricity / diameter lower bound
    (X158) over the part co-occurrence graph: for each of the 4
    smallest node ids, BFS to 8 hops (X63 k_hop — bounded driver fast
    path, frontier semi/anti-join distributed fallback) and report
    ecc_lb = max distance reached and n_reached = nodes within range.
    max(ecc_lb) over seeds is the standard cheap diameter lower bound
    (the iFUB seed stage); on this graph 8 hops exhausts every
    component the seeds touch, so ecc_lb is the true eccentricity.
    Per-seed BFS re-canonicalizes the edge set (4×) — at corpus scale
    share one materialized canonical edge table across seeds."""
    from phrasekit_ray.stages.kg import k_hop

    edges_ds = _basket_edges_ds(sf_dir).materialize()

    def nodes_of(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        b["subj"].combine_chunks().cast(pa.int64()),
                        b["obj"].combine_chunks().cast(pa.int64()),
                    ]
                )
            }
        )

    seeds = sorted(
        r["node"]
        for r in edges_ds.map_batches(nodes_of, batch_format="pyarrow")
        .groupby("node")
        .count()
        .sort("node")
        .limit(_ECC_SEEDS)
        .take(_ECC_SEEDS)
    )
    rows = []
    for s in seeds:
        lab = k_hop(edges_ds, hops=_ECC_HOPS, seed=int(s)).materialize()
        rows.append(
            {
                "seed": int(s),
                "ecc_lb": int(lab.max("dist") or 0),
                "n_reached": int(lab.count()),
            }
        )
    return pa.table(
        {
            "seed": pa.array([r["seed"] for r in rows], pa.int64()),
            "ecc_lb": pa.array([r["ecc_lb"] for r in rows], pa.int64()),
            "n_reached": pa.array([r["n_reached"] for r in rows], pa.int64()),
        }
    )


SQL_GRAPH_ECCENTRICITY = (
    "WITH RECURSIVE "
    + _SQL_BASKET_EDGES
    + f""",
adj AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
seeds AS (SELECT DISTINCT src AS seed FROM adj
          ORDER BY seed LIMIT {_ECC_SEEDS}),
bfs AS (
  SELECT seed, seed AS node, 0 AS dist FROM seeds
  UNION
  SELECT bfs.seed, adj.dst, bfs.dist + 1
  FROM bfs JOIN adj ON adj.src = bfs.node WHERE bfs.dist < {_ECC_HOPS}),
lab AS (SELECT seed, node, MIN(dist) AS dist FROM bfs GROUP BY seed, node)
SELECT seed, CAST(MAX(dist) AS BIGINT) AS ecc_lb,
       COUNT(*) AS n_reached
FROM lab GROUP BY seed ORDER BY seed"""
)


EXT_QUERIES.update({"q_graph_eccentricity": q_graph_eccentricity})
EXT_ORACLE_SQL.update({"q_graph_eccentricity": SQL_GRAPH_ECCENTRICITY})


def q_edge_embeddedness(sf_dir: str):
    """Edge embeddedness (X159): for every triangle-bearing edge of the
    part co-occurrence graph, the neighborhood Jaccard of its endpoints
    — emb_micro = 10⁶·|N(u)∩N(v)| // |N(u)∪N(v)∖{u,v}| = 10⁶·support //
    (deg(u)+deg(v)−2−support) in exact integer micro-units. The
    Granovetter weak-tie diagnostic: high-embeddedness edges live
    inside communities, zero/low ones are the bridges CC and community
    ops should respect. Composition: X151 ``edge_triangle_support`` +
    one two-phase degree count over the SAME canonical distinct edge
    set + TWO int-keyed ``lookup_join``s. For support ≥ 1 both degrees
    are ≥ support+1, so the divisor is never 0."""
    from phrasekit_ray.stages.agg import grouped_count, lookup_join
    from phrasekit_ray.stages.kg import edge_triangle_support

    edges_ds = _basket_edges_ds(sf_dir)

    def canon(b: pa.Table) -> pa.Table:
        s = b["subj"].combine_chunks().cast(pa.int64())
        o = b["obj"].combine_chunks().cast(pa.int64())
        keep = pc.invert(pc.equal(s, o))
        s, o = s.filter(keep), o.filter(keep)
        return pa.table(
            {"u": pc.min_element_wise(s, o), "v": pc.max_element_wise(s, o)}
        )

    dedup = grouped_count(
        edges_ds.map_batches(canon, batch_format="pyarrow"), ["u", "v"]
    )
    deg = grouped_count(
        dedup.map_batches(
            lambda b: pa.table(
                {"node": pa.concat_arrays(
                    [b["u"].combine_chunks(), b["v"].combine_chunks()]
                )}
            ),
            batch_format="pyarrow",
        ),
        "node", count_col="d",
    )
    sup = edge_triangle_support(edges_ds)
    sup_schema = pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("support", pa.int64())]
    )
    deg_schema = pa.schema([("node", pa.int64()), ("d", pa.int64())])
    with_du = lookup_join(
        sup, deg, "u", "node",
        left_schema=sup_schema, right_schema=deg_schema,
    ).map_batches(
        lambda b: pa.table(
            {"u": b["u"], "v": b["v"], "support": b["support"], "du": b["d"]}
        ),
        batch_format="pyarrow",
    )
    both = lookup_join(
        with_du, deg, "v", "node",
        left_schema=pa.schema(
            [("u", pa.int64()), ("v", pa.int64()),
             ("support", pa.int64()), ("du", pa.int64())]
        ),
        right_schema=deg_schema,
    )

    def emb(b: pa.Table) -> pa.Table:
        s = b["support"].combine_chunks().to_numpy(zero_copy_only=False)
        du = b["du"].combine_chunks().to_numpy(zero_copy_only=False)
        dv = b["d"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": b["u"],
                "v": b["v"],
                "support": b["support"],
                "emb_micro": pa.array(
                    np.int64(10**6) * s // (du + dv - 2 - s), pa.int64()
                ),
            }
        )

    t = _collect(both.map_batches(emb, batch_format="pyarrow"))
    out = pa.table(
        {
            "u": t["u"].cast(pa.int64()),
            "v": t["v"].cast(pa.int64()),
            "support": t["support"].cast(pa.int64()),
            "emb_micro": t["emb_micro"].cast(pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("u", "ascending"), ("v", "ascending")]
        )
    )


SQL_EDGE_EMBEDDEDNESS = (
    "WITH "
    + _SQL_BASKET_EDGES
    + """,
adj AS MATERIALIZED (
  SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT a AS node, count(*) AS d FROM adj GROUP BY a),
sup AS (
  SELECT e.u, e.v, count(*) AS support
  FROM e JOIN adj x ON x.b = e.u
         JOIN adj y ON y.b = e.v AND y.a = x.a
  GROUP BY e.u, e.v)
SELECT s.u, s.v, CAST(s.support AS BIGINT) AS support,
       CAST(1000000 * s.support //
            (du.d + dv.d - 2 - s.support) AS BIGINT) AS emb_micro
FROM sup s JOIN deg du ON du.node = s.u JOIN deg dv ON dv.node = s.v
ORDER BY s.u, s.v"""
)


EXT_QUERIES.update({"q_edge_embeddedness": q_edge_embeddedness})
EXT_ORACLE_SQL.update({"q_edge_embeddedness": SQL_EDGE_EMBEDDEDNESS})


def q_kg_cardinality_profile(sf_dir: str):
    """KG cardinality / functionality profile (X160): the one-row
    shape summary entity-linking pipelines read before trusting a
    relation (PARIS-style functionality): total assertions, distinct
    (subj, obj) edges, distinct subjects/objects, max subject fan-out,
    functionality_micro = 10⁶·n_subjects // n_edges and
    inv_functionality_micro = 10⁶·n_objects // n_edges (all exact
    int64). Composition over the flagship triple stream: ONE two-phase
    (subj, obj) count → per-subject fan-out count → scalar MAX/COUNT
    reductions; the driver holds six scalars."""
    from phrasekit_ray.stages.agg import grouped_count

    triples = _flagship_triples(sf_dir)

    def so(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"].combine_chunks().cast(pa.int64()),
                "obj": b["obj"].combine_chunks().cast(pa.int64()),
            }
        )

    pairs = grouped_count(
        triples.map_batches(so, batch_format="pyarrow"),
        ["subj", "obj"], count_col="n",
    ).materialize()
    n_triples = int(pairs.sum("n") or 0)
    n_edges = int(pairs.count())
    fan = grouped_count(
        pairs.map_batches(
            lambda b: pa.table({"subj": b["subj"]}), batch_format="pyarrow"
        ),
        "subj", count_col="fanout",
    ).materialize()
    n_subj = int(fan.count())
    max_fanout = int(fan.max("fanout") or 0)
    n_obj = int(
        grouped_count(
            pairs.map_batches(
                lambda b: pa.table({"obj": b["obj"]}), batch_format="pyarrow"
            ),
            "obj",
        ).count()
    )
    return pa.table(
        {
            "n_triples": pa.array([n_triples], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_subjects": pa.array([n_subj], pa.int64()),
            "n_objects": pa.array([n_obj], pa.int64()),
            "max_fanout": pa.array([max_fanout], pa.int64()),
            "functionality_micro": pa.array(
                [10**6 * n_subj // n_edges if n_edges else 0], pa.int64()
            ),
            "inv_functionality_micro": pa.array(
                [10**6 * n_obj // n_edges if n_edges else 0], pa.int64()
            ),
        }
    )


def _sql_kg_cardinality_profile() -> str:
    from phrasekit_ray.pipelines.queries import _sql_flagship

    return f"""
WITH t AS ({_sql_flagship()}),
pairs AS (SELECT subj, obj, count(*) AS n FROM t GROUP BY subj, obj),
fan AS (SELECT subj, count(*) AS fanout FROM pairs GROUP BY subj)
SELECT CAST(SUM(n) AS BIGINT) AS n_triples,
       COUNT(*) AS n_edges,
       (SELECT COUNT(*) FROM fan) AS n_subjects,
       (SELECT COUNT(DISTINCT obj) FROM pairs) AS n_objects,
       (SELECT CAST(MAX(fanout) AS BIGINT) FROM fan) AS max_fanout,
       CAST(1000000 * (SELECT COUNT(*) FROM fan) // COUNT(*) AS BIGINT)
         AS functionality_micro,
       CAST(1000000 * (SELECT COUNT(DISTINCT obj) FROM pairs) // COUNT(*)
         AS BIGINT) AS inv_functionality_micro
FROM pairs"""


EXT_QUERIES.update({"q_kg_cardinality_profile": q_kg_cardinality_profile})
EXT_ORACLE_SQL.update(
    {"q_kg_cardinality_profile": _sql_kg_cardinality_profile()}
)


def q_ipc_interop(sf_dir: str):
    """Arrow IPC / Feather v2 interop (X161): documents re-written as
    sharded zstd Feather files under /tmp scratch, read back with the
    distributed IPC reader (column-pruned decode — IPC is columnar, so
    pruning skips buffer bytes), aggregated per source. The SQL twin
    runs the SAME aggregate over the original parquet — equality proves
    the IPC path preserves rows, values and types end to end."""
    import os
    import tempfile

    import ray

    from phrasekit_ray.sources.ipc import read_ipc, write_ipc_file
    from phrasekit_ray.stages.agg import hash_aggregate

    src = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    )
    d = tempfile.mkdtemp(prefix="ipc_", dir="/tmp")
    tabs = [
        t
        for t in ray.get(src.materialize().to_arrow_refs())
        if t.num_columns and t.num_rows
    ]
    paths = []
    for i, t in enumerate(tabs):
        p = os.path.join(d, f"part{i:03d}.feather")
        write_ipc_file(p, t)
        paths.append(p)

    ds = read_ipc(paths, columns=["source", "n_chars", "doc_id"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "chars_sum": b["n_chars"].cast(pa.int64()),
                "id_min": b["doc_id"].cast(pa.int64()),
                "id_max": b["doc_id"].cast(pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    t = _collect(
        hash_aggregate(
            ds.map_batches(prep, batch_format="pyarrow"),
            ["source"],
            [("chars_sum", "sum"), ("id_min", "min"),
             ("id_max", "max"), ("n", "sum")],
        )
    )
    return _i64(
        t.take(pc.sort_indices(t, sort_keys=[("source", "ascending")])),
        "chars_sum", "id_min", "id_max", "n",
    )


SQL_IPC_INTEROP = """
SELECT source,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum,
       CAST(min(doc_id) AS BIGINT) AS id_min,
       CAST(max(doc_id) AS BIGINT) AS id_max,
       count(*) AS n
FROM documents GROUP BY source ORDER BY source
"""


EXT_QUERIES.update({"q_ipc_interop": q_ipc_interop})
EXT_ORACLE_SQL.update({"q_ipc_interop": SQL_IPC_INTEROP})


def q_user_activity_bitmap(sf_dir: str):
    """Per-user hour-of-day activity bitmap (X162): bitmask =
    OR over the user's events of 1 << hour(ts), n_active_hours =
    popcount — the 24-bit behavioral fingerprint session-quality and
    bot-detection pipelines key on (a human clusters in a diurnal band;
    a crawler lights all 24 bits). Exact int64: OR of single-bit values
    ≡ SUM over DISTINCT (user, hour) of 1 << hour, so the whole op is
    one two-phase distinct + one two-phase sum + a popcount map — no
    bitwise aggregate needed in the shuffle."""
    import ray

    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def hours(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"].combine_chunks().cast(pa.int64()),
                "hour": pc.hour(b["ts"].combine_chunks()).cast(pa.int64()),
            }
        )

    distinct = grouped_count(
        ev.map_batches(hours, batch_format="pyarrow"), ["user_id", "hour"]
    )

    def bits(b: pa.Table) -> pa.Table:
        h = b["hour"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b["user_id"],
                "bit": pa.array(np.int64(1) << h, pa.int64()),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        distinct.map_batches(bits, batch_format="pyarrow"),
        ["user_id"],
        [("bit", "sum"), ("one", "sum")],
    )
    t = _collect(agg)
    out = pa.table(
        {
            "user_id": t["user_id"].cast(pa.int64()),
            "hour_bitmap": t["bit"].cast(pa.int64()),
            "n_active_hours": t["one"].cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("user_id", "ascending")]))


SQL_USER_ACTIVITY_BITMAP = """
WITH uh AS (SELECT DISTINCT user_id, EXTRACT(hour FROM ts) AS h
            FROM events)
SELECT user_id,
       CAST(SUM(CAST(1 AS BIGINT) << h) AS BIGINT) AS hour_bitmap,
       COUNT(*) AS n_active_hours
FROM uh GROUP BY user_id ORDER BY user_id
"""


EXT_QUERIES.update({"q_user_activity_bitmap": q_user_activity_bitmap})
EXT_ORACLE_SQL.update({"q_user_activity_bitmap": SQL_USER_ACTIVITY_BITMAP})


def q_corpus_drift(sf_dir: str):
    """Corpus distribution-shift top movers (X163): split the corpus
    into deterministic halves (doc_id parity — stand-in for two crawl
    snapshots), compute each token's frequency share per half in exact
    integer micro-units (pᵢ = cᵢ·10⁶ // Tᵢ), and report the 20 tokens
    with the largest share drift |p₀ − p₁| — the between-snapshot
    distribution-shift monitor a continuously-retrained pipeline runs
    before mixing a new crawl in. One explode + ONE two-phase
    (tok, parity) count + conditional pivot-sum by tok; the two totals
    are scalar reductions; final top-20 via per-block partial top-k
    then a single 20·blocks-row merge (never a full vocab sort)."""
    import ray

    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        sizes = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        par = pc.bit_wise_and(
            b["doc_id"].combine_chunks().cast(pa.int64()),
            pa.scalar(1, pa.int64()),
        ).take(pa.array(np.repeat(np.arange(len(sizes)), sizes)))
        return pa.table({"tok": toks.values, "par": par})

    counts = grouped_count(
        docs.map_batches(explode, batch_format="pyarrow"), ["tok", "par"]
    ).materialize()

    def pivot(b: pa.Table) -> pa.Table:
        par = b["par"].combine_chunks().to_numpy(zero_copy_only=False)
        c = b["count"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tok": b["tok"],
                "c0": pa.array(np.where(par == 0, c, 0), pa.int64()),
                "c1": pa.array(np.where(par == 1, c, 0), pa.int64()),
            }
        )

    piv = hash_aggregate(
        counts.map_batches(pivot, batch_format="pyarrow"),
        ["tok"], [("c0", "sum"), ("c1", "sum")],
    ).materialize()
    t0 = np.int64(piv.sum("c0") or 0)
    t1 = np.int64(piv.sum("c1") or 0)

    def shares_topk(b: pa.Table) -> pa.Table:
        c0 = b["c0"].combine_chunks().to_numpy(zero_copy_only=False)
        c1 = b["c1"].combine_chunks().to_numpy(zero_copy_only=False)
        p0 = c0 * np.int64(10**6) // max(t0, np.int64(1))
        p1 = c1 * np.int64(10**6) // max(t1, np.int64(1))
        out = pa.table(
            {
                "tok": b["tok"],
                "p0_micro": pa.array(p0, pa.int64()),
                "p1_micro": pa.array(p1, pa.int64()),
                "d_micro": pa.array(np.abs(p0 - p1), pa.int64()),
            }
        )
        out = out.sort_by(
            [("d_micro", "descending"), ("tok", "ascending")]
        )
        return out.slice(0, 20)

    partial = _collect(
        piv.map_batches(shares_topk, batch_format="pyarrow")
    )
    final = partial.sort_by(
        [("d_micro", "descending"), ("tok", "ascending")]
    ).slice(0, 20)
    return final


SQL_CORPUS_DRIFT = """
WITH toks AS (SELECT doc_id % 2 AS par,
                     unnest(string_split(text, ' ')) AS tok
              FROM documents),
c AS (SELECT tok, par, count(*) AS c FROM toks GROUP BY tok, par),
piv AS (SELECT tok,
          CAST(COALESCE(SUM(CASE WHEN par = 0 THEN c END), 0) AS BIGINT) AS c0,
          CAST(COALESCE(SUM(CASE WHEN par = 1 THEN c END), 0) AS BIGINT) AS c1
        FROM c GROUP BY tok),
tot AS (SELECT GREATEST(SUM(c0), 1) AS t0, GREATEST(SUM(c1), 1) AS t1
        FROM piv),
p AS (SELECT tok,
        CAST(c0 * 1000000 // tot.t0 AS BIGINT) AS p0_micro,
        CAST(c1 * 1000000 // tot.t1 AS BIGINT) AS p1_micro
      FROM piv, tot)
SELECT tok, p0_micro, p1_micro,
       CAST(ABS(p0_micro - p1_micro) AS BIGINT) AS d_micro
FROM p ORDER BY d_micro DESC, tok ASC LIMIT 20
"""


EXT_QUERIES.update({"q_corpus_drift": q_corpus_drift})
EXT_ORACLE_SQL.update({"q_corpus_drift": SQL_CORPUS_DRIFT})


def q_source_ttr(sf_dir: str):
    """Per-source type-token ratio (X164): lexical diversity
    ttr_micro = 10⁶·|distinct tokens| // |tokens| per source — the
    boilerplate/template detector next to Gopher repetition (X42) and
    corpus entropy (X123): a template farm's TTR collapses while a
    genuine-prose source stays high. ONE explode + ONE two-phase
    (source, tok) distinct + per-source count + token-count sum — all
    exact int64."""
    import ray

    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate, lookup_join

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        sizes = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        src = b["source"].combine_chunks().take(
            pa.array(np.repeat(np.arange(len(sizes)), sizes))
        )
        return pa.table({"source": src, "tok": toks.values})

    pairs = grouped_count(
        docs.map_batches(explode, batch_format="pyarrow"),
        ["source", "tok"],
    ).materialize()

    def per_source(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "n_types": pa.array(np.ones(b.num_rows, np.int64)),
                "n_toks": b["count"].cast(pa.int64()),
            }
        )

    agg = hash_aggregate(
        pairs.map_batches(per_source, batch_format="pyarrow"),
        ["source"], [("n_types", "sum"), ("n_toks", "sum")],
    )

    def ttr(b: pa.Table) -> pa.Table:
        ty = b["n_types"].combine_chunks().to_numpy(zero_copy_only=False)
        tk = b["n_toks"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": b["source"],
                "n_types": pa.array(ty, pa.int64()),
                "n_toks": pa.array(tk, pa.int64()),
                "ttr_micro": pa.array(
                    np.int64(10**6) * ty // np.maximum(tk, 1), pa.int64()
                ),
            }
        )

    t = _collect(agg.map_batches(ttr, batch_format="pyarrow"))
    return t.take(pc.sort_indices(t, sort_keys=[("source", "ascending")]))


SQL_SOURCE_TTR = """
WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents),
c AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok)
SELECT source, COUNT(*) AS n_types,
       CAST(SUM(c) AS BIGINT) AS n_toks,
       CAST(1000000 * COUNT(*) // GREATEST(SUM(c), 1) AS BIGINT) AS ttr_micro
FROM c GROUP BY source ORDER BY source
"""


EXT_QUERIES.update({"q_source_ttr": q_source_ttr})
EXT_ORACLE_SQL.update({"q_source_ttr": SQL_SOURCE_TTR})


def q_webgraph_profile(sf_dir: str):
    """Composed web-graph profile (X165): ONE corpus link-extraction
    pass → ONE shared host edge table → every host-level signal in a
    single wide row per host: out/in degree, reciprocated out-edges,
    undirected component (as its lexicographically smallest host),
    HITS authority/hub and Katz centrality in exact int64 micro-units
    (pipelines/webgraph.webgraph_profile). The \"all signals, one
    pass\" shape a production web pipeline runs instead of five
    separate extractions."""
    from phrasekit_ray.pipelines.webgraph import webgraph_profile
    from phrasekit_ray.sources.pages import pages_from_documents

    return webgraph_profile(
        pages_from_documents(sf_dir, with_links=True), iters=4
    )


def _sql_webgraph_profile(iters: int = 4, scale: int = 10**6) -> str:
    """Composed twin: host-graph CTEs + degrees + reciprocity +
    recursive-closure components + the unrolled HITS (X147) and Katz
    (X156) round chains, all over the SAME ``e`` CTE the Ray side
    shares."""
    s = f"""
WITH RECURSIVE s AS (SELECT doc_id, source, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT source, j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s),
he AS (SELECT source || '.example.org' AS src,
              'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS dst
       FROM l WHERE j <= n_links),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
-- explicit DISTINCT over UNION ALL: inside WITH RECURSIVE, DuckDB 1.0
-- compiles a non-recursive CTE's bare UNION as UNION ALL (observed:
-- nodes came back 2x|e| rows), so the dedup must be spelled out
nodes AS MATERIALIZED (SELECT DISTINCT node FROM
  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
odeg AS (SELECT src AS node, count(*) AS od FROM e GROUP BY 1),
ideg AS (SELECT dst AS node, count(*) AS idg FROM e GROUP BY 1),
recip AS (SELECT e.src AS node,
            CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS nr
          FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src
          GROUP BY 1),
ee AS (SELECT DISTINCT u, v FROM
  (SELECT src AS u, dst AS v FROM e UNION ALL SELECT dst, src FROM e)),
reach(a, b) AS (
  SELECT u, v FROM ee
  UNION
  SELECT r.a, ee.v FROM reach r JOIN ee ON r.b = ee.u),
cc AS (SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a),
h0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS v FROM nodes),
x0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS v FROM nodes)"""
    prev_h, prev_x = "h0", "x0"
    for i in range(1, iters + 1):
        s += f""",
ar{i} AS MATERIALIZED (SELECT n.node, CAST(COALESCE(sq.sq, 0) AS BIGINT) AS v
  FROM nodes n
  LEFT JOIN (SELECT e.dst AS node, CAST(SUM(h.v) AS BIGINT) AS sq
             FROM e JOIN {prev_h} h ON h.node = e.src GROUP BY 1) sq
    ON sq.node = n.node),
a{i} AS MATERIALIZED (SELECT node, CAST(v // GREATEST(
           (SELECT (MAX(v) + {scale - 1}) // {scale} FROM ar{i}), 1)
         AS BIGINT) AS v FROM ar{i}),
hr{i} AS MATERIALIZED (SELECT n.node, CAST(COALESCE(sq.sq, 0) AS BIGINT) AS v
  FROM nodes n
  LEFT JOIN (SELECT e.src AS node, CAST(SUM(a.v) AS BIGINT) AS sq
             FROM e JOIN a{i} a ON a.node = e.dst GROUP BY 1) sq
    ON sq.node = n.node),
h{i} AS MATERIALIZED (SELECT node, CAST(v // GREATEST(
           (SELECT (MAX(v) + {scale - 1}) // {scale} FROM hr{i}), 1)
         AS BIGINT) AS v FROM hr{i}),
xr{i} AS MATERIALIZED (SELECT n.node,
    CAST({scale} + COALESCE(sq.sq, 0) AS BIGINT) AS v
  FROM nodes n
  LEFT JOIN (SELECT e.dst AS node,
               CAST(SUM((x.v * 1) // 5) AS BIGINT) AS sq
             FROM e JOIN {prev_x} x ON x.node = e.src GROUP BY 1) sq
    ON sq.node = n.node),
x{i} AS MATERIALIZED (SELECT node, CAST(v // GREATEST(
           (SELECT (MAX(v) + {scale - 1}) // {scale} FROM xr{i}), 1)
         AS BIGINT) AS v FROM xr{i})"""
        prev_h, prev_x = f"h{i}", f"x{i}"
    s += f"""
SELECT n.node AS host,
       CAST(COALESCE(odeg.od, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(ideg.idg, 0) AS BIGINT) AS in_deg,
       CAST(COALESCE(recip.nr, 0) AS BIGINT) AS n_recip,
       cc.comp AS component_host,
       a{iters}.v AS auth_micro,
       h{iters}.v AS hub_micro,
       x{iters}.v AS katz_micro
FROM nodes n
LEFT JOIN odeg ON odeg.node = n.node
LEFT JOIN ideg ON ideg.node = n.node
LEFT JOIN recip ON recip.node = n.node
JOIN cc ON cc.node = n.node
JOIN a{iters} ON a{iters}.node = n.node
JOIN h{iters} ON h{iters}.node = n.node
JOIN x{iters} ON x{iters}.node = n.node
ORDER BY host"""
    return s


SQL_WEBGRAPH_PROFILE = _sql_webgraph_profile(4, 10**6)


EXT_QUERIES.update({"q_webgraph_profile": q_webgraph_profile})
EXT_ORACLE_SQL.update({"q_webgraph_profile": SQL_WEBGRAPH_PROFILE})


def q_host_cocitation(sf_dir: str):
    """Host co-citation & bibliographic coupling (X166) — the classic
    Kessler/Small similarity pair next to HITS: coupling(a,b) =
    |out(a) ∩ out(b)| (hosts citing the same targets), cocitation(a,b)
    = |in(a) ∩ in(b)| (hosts cited by the same sources), over the
    distinct directed host edge set. Both are ONE wedge enumeration via
    X64 ``cooccurrence_edges`` (group = shared endpoint, middle-
    partitioned stride kernel) + ONE two-phase pair count; the two pair
    sets merge with the zero-union + sum pattern so a pair strong in
    one measure and absent in the other reports 0 there."""
    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate
    from phrasekit_ray.stages.extract import extract_links, host_edges
    from phrasekit_ray.stages.kg import cooccurrence_edges

    pages = pages_from_documents(sf_dir, with_links=True)
    he = _collect(host_edges(extract_links(pages)))
    src = he["src_host"].to_pylist()
    dst = he["dst_host"].to_pylist()
    pairs = sorted({(a, b) for a, b in zip(src, dst) if a != b})
    hosts = sorted({h for p in pairs for h in p})
    hid = {h: i for i, h in enumerate(hosts)}
    e = pa.table(
        {
            "s": pa.array([hid[a] for a, _ in pairs], pa.int64()),
            "o": pa.array([hid[b] for _, b in pairs], pa.int64()),
        }
    )
    eds = ray.data.from_arrow(e).materialize()
    n_rows = e.num_rows

    def count_pairs(group_col, item_col, out_col):
        pr = cooccurrence_edges(
            eds, group_col, item_col, input_rows=n_rows
        )
        return grouped_count(pr, ["subj", "obj"], count_col=out_col)

    couple = count_pairs("o", "s", "n_couple").materialize()
    cocite = count_pairs("s", "o", "n_cocite").materialize()

    def with_zero(ds_, have: str, missing: str):
        return ds_.map_batches(
            lambda b, h=have, m=missing: pa.table(
                {
                    "subj": b["subj"],
                    "obj": b["obj"],
                    h: b[h].cast(pa.int64()),
                    m: pa.array(np.zeros(b.num_rows, np.int64)),
                }
            ).select(["subj", "obj", "n_couple", "n_cocite"]),
            batch_format="pyarrow",
        )

    merged = hash_aggregate(
        with_zero(couple, "n_couple", "n_cocite").union(
            with_zero(cocite, "n_cocite", "n_couple")
        ),
        ["subj", "obj"],
        [("n_couple", "sum"), ("n_cocite", "sum")],
    )
    t = _collect(merged)
    out = pa.table(
        {
            "a_host": pa.array(
                [hosts[i] for i in t["subj"].to_pylist()], pa.string()
            ),
            "b_host": pa.array(
                [hosts[i] for i in t["obj"].to_pylist()], pa.string()
            ),
            "n_couple": t["n_couple"].cast(pa.int64()),
            "n_cocite": t["n_cocite"].cast(pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("a_host", "ascending"), ("b_host", "ascending")]
        )
    )


SQL_HOST_COCITATION = f"""
WITH s AS (SELECT doc_id, source, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT source, j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s),
he AS (SELECT source || '.example.org' AS src,
              'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS dst
       FROM l WHERE j <= n_links),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM he WHERE src <> dst),
couple AS (
  SELECT x.src AS a, y.src AS b, count(*) AS n
  FROM e x JOIN e y ON y.dst = x.dst AND y.src > x.src
  GROUP BY 1, 2),
cocite AS (
  SELECT x.dst AS a, y.dst AS b, count(*) AS n
  FROM e x JOIN e y ON y.src = x.src AND y.dst > x.dst
  GROUP BY 1, 2)
SELECT COALESCE(cp.a, cc.a) AS a_host, COALESCE(cp.b, cc.b) AS b_host,
       CAST(COALESCE(cp.n, 0) AS BIGINT) AS n_couple,
       CAST(COALESCE(cc.n, 0) AS BIGINT) AS n_cocite
FROM couple cp FULL OUTER JOIN cocite cc ON cc.a = cp.a AND cc.b = cp.b
ORDER BY a_host, b_host"""


EXT_QUERIES.update({"q_host_cocitation": q_host_cocitation})
EXT_ORACLE_SQL.update({"q_host_cocitation": SQL_HOST_COCITATION})


_GROWTH_WIN_US = 100_000_000  # 100 s of crawl time per window


def q_kg_growth(sf_dir: str):
    """KG growth curve (X167): per crawl window, how many NEVER-SEEN
    (subj, obj) edges first appear — the discovery-rate diagnostic that
    tells a continuously-crawling KG whether a source still yields new
    facts or only re-asserts known ones (the KG-side Heaps law, next to
    X143 per-doc vocabulary novelty). Edge birth = MIN assertion ts
    (ONE two-phase min over the flagship triple stream, ts recovered
    from the source url as pages synthesis defines it), then ONE
    two-phase count per tumbling window."""
    from phrasekit_ray.sources.pages import EPOCH_US
    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate

    triples = _flagship_triples(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.replace_substring_regex(
                b["doc_id"].combine_chunks().cast(pa.string()), r"^.*/", ""
            ),
            pa.int64(),
        )
        ts = pc.add(pc.multiply(d, pa.scalar(1_000_000, pa.int64())),
                    pa.scalar(EPOCH_US, pa.int64()))
        return pa.table(
            {
                "subj": b["subj"].combine_chunks().cast(pa.int64()),
                "obj": b["obj"].combine_chunks().cast(pa.int64()),
                "ts_us": ts,
            }
        )

    births = hash_aggregate(
        triples.map_batches(prep, batch_format="pyarrow"),
        ["subj", "obj"], [("ts_us", "min")],
    )

    def win(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        from phrasekit_ray.sources.pages import EPOCH_US as E
        return pa.table(
            {"w": pa.array((ts - np.int64(E)) // np.int64(_GROWTH_WIN_US),
                           pa.int64())}
        )

    curve = grouped_count(
        births.map_batches(win, batch_format="pyarrow"),
        "w", count_col="n_new_edges",
    )
    t = _collect(curve)
    out = pa.table(
        {
            "w": t["w"].cast(pa.int64()),
            "n_new_edges": t["n_new_edges"].cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("w", "ascending")]))


def _sql_kg_growth() -> str:
    from phrasekit_ray.pipelines.queries import _sql_flagship
    from phrasekit_ray.sources.pages import EPOCH_US

    return f"""
WITH t AS ({_sql_flagship()}),
w AS (SELECT subj, obj,
        CAST(regexp_extract(doc_id, '([0-9]+)$', 1) AS BIGINT) * 1000000
          AS rel_us
      FROM t),
births AS (SELECT subj, obj, MIN(rel_us) AS birth FROM w GROUP BY subj, obj)
SELECT birth // {_GROWTH_WIN_US} AS w, COUNT(*) AS n_new_edges
FROM births GROUP BY 1 ORDER BY w"""


EXT_QUERIES.update({"q_kg_growth": q_kg_growth})
EXT_ORACLE_SQL.update({"q_kg_growth": _sql_kg_growth()})


def q_kg_npmi_edges(sf_dir: str):
    """NPMI-weighted KG edges (X168) — the north-star edge weighting:
    per distinct (subj, obj) pair over the flagship triple stream,
    npmi = (ln c_so + ln N − ln c_s − ln c_o) / (ln N − ln c_so) in
    [−1, 1], where c_s/c_o are subject/object assertion marginals and
    N the total assertion count. Association strength normalized so
    co-occurrence-by-chance scores 0 and always-together scores 1 —
    the weight entity-resolution and edge-pruning passes threshold on.

    Exactness: every ln runs on an INTEGER-valued double (the X123
    precedent: libm ln on integers is bit-identical between numpy and
    DuckDB here), the expression is written in the SAME order both
    sides, and the result rounds half-away-from-zero to int64
    micro-units BEFORE any comparison. c_so == N (a one-pair KG) would
    zero the denominator → defined as npmi_micro = 10⁶.

    Distribution: ONE two-phase pair count + TWO marginal counts +
    TWO int-keyed lookup_joins + a vectorized map; N is one scalar."""
    from phrasekit_ray.stages.agg import grouped_count, lookup_join

    triples = _flagship_triples(sf_dir)

    def so(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"].combine_chunks().cast(pa.int64()),
                "obj": b["obj"].combine_chunks().cast(pa.int64()),
            }
        )

    stream = triples.map_batches(so, batch_format="pyarrow").materialize()
    pairs = grouped_count(stream, ["subj", "obj"], count_col="c_so").materialize()
    n_total = int(pairs.sum("c_so") or 0)
    subj_m = grouped_count(
        stream.map_batches(
            lambda b: pa.table({"subj": b["subj"]}), batch_format="pyarrow"
        ),
        "subj", count_col="c_s",
    )
    obj_m = grouped_count(
        stream.map_batches(
            lambda b: pa.table({"obj": b["obj"]}), batch_format="pyarrow"
        ),
        "obj", count_col="c_o",
    )
    p_schema = pa.schema(
        [("subj", pa.int64()), ("obj", pa.int64()), ("c_so", pa.int64())]
    )
    with_s = lookup_join(
        pairs, subj_m, "subj", "subj",
        left_schema=p_schema,
        right_schema=pa.schema([("subj", pa.int64()), ("c_s", pa.int64())]),
    )
    with_so = lookup_join(
        with_s, obj_m, "obj", "obj",
        left_schema=pa.schema(
            [("subj", pa.int64()), ("obj", pa.int64()),
             ("c_so", pa.int64()), ("c_s", pa.int64())]
        ),
        right_schema=pa.schema([("obj", pa.int64()), ("c_o", pa.int64())]),
    )

    lnN = np.log(np.float64(max(n_total, 1)))

    def npmi(b: pa.Table) -> pa.Table:
        cso = b["c_so"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        cs = b["c_s"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        co = b["c_o"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        num = np.log(cso) + lnN - np.log(cs) - np.log(co)
        den = lnN - np.log(cso)
        val = np.where(den == 0.0, 1.0, num / np.where(den == 0.0, 1.0, den))
        term = val * 1e6
        micro = np.where(
            term >= 0, np.floor(term + 0.5), np.ceil(term - 0.5)
        ).astype(np.int64)
        return pa.table(
            {
                "subj": b["subj"],
                "obj": b["obj"],
                "c_so": b["c_so"].cast(pa.int64()),
                "npmi_micro": pa.array(micro, pa.int64()),
            }
        )

    t = _collect(with_so.map_batches(npmi, batch_format="pyarrow"))
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("subj", "ascending"), ("obj", "ascending")]
        )
    )


def _sql_kg_npmi_edges() -> str:
    from phrasekit_ray.pipelines.queries import _sql_flagship

    return f"""
WITH t AS ({_sql_flagship()}),
pairs AS (SELECT subj, obj, CAST(count(*) AS BIGINT) AS c_so
          FROM t GROUP BY subj, obj),
sm AS (SELECT subj, CAST(count(*) AS BIGINT) AS c_s FROM t GROUP BY subj),
om AS (SELECT obj, CAST(count(*) AS BIGINT) AS c_o FROM t GROUP BY obj),
tot AS (SELECT GREATEST(CAST(SUM(c_so) AS BIGINT), 1) AS n FROM pairs),
v AS (SELECT p.subj, p.obj, p.c_so,
        (ln(CAST(p.c_so AS DOUBLE)) + ln(CAST(tot.n AS DOUBLE))
         - ln(CAST(sm.c_s AS DOUBLE)) - ln(CAST(om.c_o AS DOUBLE))) AS num,
        (ln(CAST(tot.n AS DOUBLE)) - ln(CAST(p.c_so AS DOUBLE))) AS den
      FROM pairs p
      JOIN sm ON sm.subj = p.subj JOIN om ON om.obj = p.obj, tot)
SELECT subj, obj, c_so,
       CAST(CASE WHEN den = 0 THEN 1000000
            ELSE CASE WHEN num / den >= 0
                 THEN floor(num / den * 1000000 + 0.5)
                 ELSE ceil(num / den * 1000000 - 0.5) END
            END AS BIGINT) AS npmi_micro
FROM v ORDER BY subj, obj"""


EXT_QUERIES.update({"q_kg_npmi_edges": q_kg_npmi_edges})
EXT_ORACLE_SQL.update({"q_kg_npmi_edges": _sql_kg_npmi_edges()})


def q_skyline_docs(sf_dir: str):
    """2D skyline / Pareto frontier (X140): documents not dominated
    under (maximize whitespace-token count, minimize n_chars) — the
    "densest information per byte" frontier used to pick exemplar docs.
    Per-block vectorized local skyline → one-task exact merge
    (stages/agg.skyline_2d); dominance over ints is exact, so the
    NOT-EXISTS SQL twin matches row-for-row."""
    import ray

    from phrasekit_ray.stages.agg import skyline_2d

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )

    def metrics(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern(batch["text"], " ")
        ).cast(pa.int64())
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_tokens": toks,
                "n_chars": batch["n_chars"].cast(pa.int64()),
            }
        )

    sky = skyline_2d(
        docs.map_batches(metrics, batch_format="pyarrow"),
        "doc_id", "n_tokens", "n_chars",
    )
    t = _collect(sky)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


SQL_SKYLINE_DOCS = """
WITH m AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(n_chars AS BIGINT) AS n_chars
           FROM documents)
SELECT doc_id, n_tokens, n_chars FROM m p
WHERE NOT EXISTS (
  SELECT 1 FROM m q
  WHERE q.n_tokens >= p.n_tokens AND q.n_chars <= p.n_chars
    AND (q.n_tokens > p.n_tokens OR q.n_chars < p.n_chars))
ORDER BY doc_id
"""


EXT_QUERIES.update({"q_skyline_docs": q_skyline_docs})
EXT_ORACLE_SQL.update({"q_skyline_docs": SQL_SKYLINE_DOCS})


def q_lm_kn_nll(sf_dir: str):
    """Interpolated Kneser–Ney bigram NLL per document (X141): fixed
    D=0.75, continuation counts from the kept bigram-type table, micro-
    nat integer scores (stages/lm.kn_bigram_nll_scores)."""
    from phrasekit_ray.stages.lm import kn_bigram_nll_scores

    return _i64(_collect(kn_bigram_nll_scores(_docs(sf_dir))), "doc_id")


SQL_LM_KN_NLL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
              generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents),
cnt1 AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok
         HAVING count(*) >= 2),
uni AS (SELECT tok, c FROM cnt1 ORDER BY c DESC, tok ASC LIMIT 1000000),
u AS (SELECT count(*) AS u FROM uni),
bi AS (SELECT t1.doc_id, t1.tok AS w1, t2.tok AS w2,
              t1.tok || ' ' || t2.tok AS pair
       FROM toks t1 JOIN toks t2
         ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1),
cnt2 AS (SELECT pair, count(*) AS c FROM bi GROUP BY pair
         HAVING count(*) >= 2),
big AS (SELECT pair, c FROM cnt2 ORDER BY c DESC, pair ASC LIMIT 1000000),
bs AS (SELECT string_split(pair, ' ')[1] AS w1,
              string_split(pair, ' ')[2] AS w2, c FROM big),
c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1, count(*) AS fol
       FROM bs GROUP BY w1),
cont AS (SELECT w2, count(*) AS cont FROM bs GROUP BY w2),
tt AS (SELECT count(*) AS t FROM big),
lp AS (SELECT bi.doc_id,
  CAST(round(ln(
    CASE WHEN COALESCE(c1.c1, 0) > 0
      THEN (GREATEST(COALESCE(b.c, 0) - 0.75, 0.0)
            + 0.75 * c1.fol
              * ((COALESCE(ct.cont, 0) + 1.0) / (tt.t + u.u)))
           / c1.c1
      ELSE (COALESCE(ct.cont, 0) + 1.0) / (tt.t + u.u)
    END) * 1000000.0) AS BIGINT) AS lpm
  FROM bi LEFT JOIN big b ON b.pair = bi.pair
       LEFT JOIN c1 ON c1.w1 = bi.w1
       LEFT JOIN cont ct ON ct.w2 = bi.w2
       CROSS JOIN tt CROSS JOIN u)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       COALESCE(s.n_bigrams, 0) AS n_bigrams,
       COALESCE(s.kn_nll_micro, 0) AS kn_nll_micro
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n_bigrams,
         CAST(-sum(lpm) AS BIGINT) AS kn_nll_micro
  FROM lp GROUP BY doc_id) s ON s.doc_id = d.doc_id
"""


EXT_QUERIES.update({"q_lm_kn_nll": q_lm_kn_nll})
EXT_ORACLE_SQL.update({"q_lm_kn_nll": SQL_LM_KN_NLL})


def q_blocking_pairs(sf_dir: str):
    """Sorted-neighborhood blocking candidates (X142): documents
    totally ordered by (n_chars, doc_id), every pair within 3 sorted
    positions — the classic ER candidate generator whose output size is
    n·w regardless of key skew (stages/dedup.sorted_neighborhood_pairs)."""
    import ray

    from phrasekit_ray.stages.dedup import sorted_neighborhood_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    t = _collect(
        sorted_neighborhood_pairs(docs, ["n_chars"], "doc_id", window=3)
    )
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("a", "ascending"), ("b", "ascending")]
        )
    )


SQL_BLOCKING_PAIRS = """
WITH m AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  row_number() OVER (ORDER BY n_chars, doc_id) AS rn
           FROM documents)
SELECT a.doc_id AS a, b.doc_id AS b
FROM m a JOIN m b ON b.rn > a.rn AND b.rn <= a.rn + 3
ORDER BY a, b
"""


EXT_QUERIES.update({"q_blocking_pairs": q_blocking_pairs})
EXT_ORACLE_SQL.update({"q_blocking_pairs": SQL_BLOCKING_PAIRS})


def q_ngram_novelty(sf_dir: str):
    """Heaps-law bigram novelty per document (X143): bigram types whose
    minimum containing doc_id is this document
    (stages/textstats.ngram_novelty)."""
    from phrasekit_ray.stages.textstats import ngram_novelty

    return _i64(_collect(ngram_novelty(_docs(sf_dir))), "doc_id")


SQL_NGRAM_NOVELTY = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
              generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents),
bi AS (SELECT t1.doc_id, t1.tok || ' ' || t2.tok AS g
       FROM toks t1 JOIN toks t2
         ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1),
own AS (SELECT g, min(doc_id) AS doc_id FROM bi GROUP BY g),
nov AS (SELECT doc_id, count(*) AS new_ngrams FROM own GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       COALESCE(n.new_ngrams, 0) AS new_ngrams
FROM documents d LEFT JOIN nov n ON n.doc_id = d.doc_id
"""


EXT_QUERIES.update({"q_ngram_novelty": q_ngram_novelty})
EXT_ORACLE_SQL.update({"q_ngram_novelty": SQL_NGRAM_NOVELTY})


def q_zonemap_range_read(sf_dir: str):
    """Zone-map pruned range read (X144): documents range-partitioned
    by n_chars into 16 zones under /tmp scratch, then a [200, 400]
    range query that opens ONLY overlapping zones (the manifests prove
    real pruning — asserted in pytest; the emitted rows are the exact
    range filter, so the SQL twin is a plain BETWEEN)."""
    import tempfile

    import ray

    from phrasekit_ray.state.lineage import read_zonemapped, write_zonemapped

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    with tempfile.TemporaryDirectory(prefix="zonemap_") as root:
        write_zonemapped(docs, root, "docs_by_len", "n_chars", 16,
                         config_desc=sf_dir)
        out, _scanned, _total = read_zonemapped(
            root, "docs_by_len", "n_chars", 200, 400
        )
        t = _collect(out.map_batches(
            lambda b: b.select(["doc_id", "n_chars"]),
            batch_format="pyarrow",
        ))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


SQL_ZONEMAP_RANGE_READ = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM documents WHERE n_chars BETWEEN 200 AND 400 ORDER BY doc_id
"""


EXT_QUERIES.update({"q_zonemap_range_read": q_zonemap_range_read})
EXT_ORACLE_SQL.update({"q_zonemap_range_read": SQL_ZONEMAP_RANGE_READ})


def q_kmv_distinct_tokens(sf_dir: str):
    """KMV distinct-token estimate per language (X145): k=64 minimum
    md5 hashes, deterministic estimate — the exact-twin-checkable
    sketch next to the rows-only HLL (stages/agg.kmv_distinct)."""
    import ray

    from phrasekit_ray.stages.agg import kmv_distinct

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    return kmv_distinct(docs, "lang", "text", k=64)


SQL_KMV_DISTINCT_TOKENS = """
WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
              FROM documents),
h AS (SELECT DISTINCT lang, md5_number_upper(tok) AS h FROM toks),
rk AS (SELECT lang, h,
              row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
       FROM h),
cnt AS (SELECT lang, count(*) AS d FROM h GROUP BY lang),
kth AS (SELECT lang, h AS hk FROM rk WHERE rn = 64)
SELECT c.lang,
  CASE WHEN c.d < 64 THEN c.d
       ELSE CAST(round(63.0 * 18446744073709551616.0
                       / CAST(k.hk AS DOUBLE)) AS BIGINT)
  END AS est_distinct
FROM cnt c LEFT JOIN kth k ON k.lang = c.lang
ORDER BY c.lang
"""


EXT_QUERIES.update({"q_kmv_distinct_tokens": q_kmv_distinct_tokens})
EXT_ORACLE_SQL.update({"q_kmv_distinct_tokens": SQL_KMV_DISTINCT_TOKENS})


def q_hamming_ann(sf_dir: str):
    """Sign-quantized binary Hamming ANN (X146): the n smallest vec_ids
    query the corpus over packed sign bits — the third exact-ranking
    ANN class next to float cosine (X6) and integer ADC (X137)
    (stages/similarity.hamming_topk)."""
    import ray

    from phrasekit_ray.stages.similarity import hamming_topk

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = hamming_topk(emb, n_queries=8, k=10)
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("query_id", "ascending"), ("rank", "ascending")]
        )
    )


SQL_HAMMING_ANN = """
WITH e AS (SELECT vec_id, d,
                  CASE WHEN embedding[d] > 0 THEN 1 ELSE 0 END AS b
           FROM embeddings, generate_series(1, 64) g(d)),
qv AS (SELECT vec_id FROM (SELECT DISTINCT vec_id FROM embeddings
                           ORDER BY vec_id LIMIT 8)),
ham AS (SELECT qe.vec_id AS query_id, x.vec_id,
               CAST(SUM(CASE WHEN qe.b <> x.b THEN 1 ELSE 0 END)
                    AS BIGINT) AS hamming
        FROM e qe JOIN qv q ON qe.vec_id = q.vec_id
        JOIN e x ON x.d = qe.d
        GROUP BY 1, 2)
SELECT query_id, vec_id, hamming, CAST(rn AS INTEGER) AS rank FROM (
  SELECT query_id, vec_id, hamming, row_number() OVER (
    PARTITION BY query_id ORDER BY hamming ASC, vec_id ASC) AS rn
  FROM ham)
WHERE rn <= 10
ORDER BY query_id, rn
"""


EXT_QUERIES.update({"q_hamming_ann": q_hamming_ann})
EXT_ORACLE_SQL.update({"q_hamming_ann": SQL_HAMMING_ANN})


def _flagship_distinct_edges(sf_dir: str):
    """Shared prologue for the KG path/symmetry profilers: flagship
    triples → MATERIALIZED distinct directed edge set (s, o), self-loops
    dropped, plus its row count (the driver fast-path gate for the
    wedge kernel). One two-phase count-aggregate."""
    from phrasekit_ray.stages.agg import grouped_count

    triples = _flagship_triples(sf_dir)

    def so(b: pa.Table) -> pa.Table:
        s = b["subj"].combine_chunks().cast(pa.int64())
        o = b["obj"].combine_chunks().cast(pa.int64())
        keep = pc.not_equal(s, o)
        return pa.table({"s": s.filter(keep), "o": o.filter(keep)})

    dist = grouped_count(
        triples.map_batches(so, batch_format="pyarrow"), ["s", "o"]
    ).map_batches(lambda b: b.select(["s", "o"]), batch_format="pyarrow")
    eds = dist.materialize()
    return eds, eds.count()


def q_kg_2hop_paths(sf_dir: str):
    """Directed 2-hop path join (X170) — the SPARQL ``?a p ?m . ?m p
    ?c`` pattern over the flagship KG's distinct edge set: every (a, c)
    pair, a ≠ c, reachable through ≥1 intermediate, with ``n_mids`` =
    distinct intermediates and ``direct`` = 1 when (a, c) is itself an
    asserted edge (closed triad) vs 0 (open — the triadic-closure /
    inference candidates an entity-resolution pass ranks).

    Composition: ONE ``directed_wedges`` enumeration (mid-partitioned,
    driver fast path under the same bound the triangle family uses) +
    ONE two-phase pair count + the zero-union merge with the edge set
    itself for the direct flag — no driver-side pair loop anywhere."""
    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate
    from phrasekit_ray.stages.kg import directed_wedges

    eds, n_rows = _flagship_distinct_edges(sf_dir)
    paths = grouped_count(
        directed_wedges(eds, input_rows=n_rows), ["subj", "obj"],
        count_col="n_mids",
    )

    def tag_paths(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"].combine_chunks().cast(pa.int64()),
                "obj": b["obj"].combine_chunks().cast(pa.int64()),
                "n_mids": b["n_mids"].combine_chunks().cast(pa.int64()),
                "direct": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["s"].combine_chunks().cast(pa.int64()),
                "obj": b["o"].combine_chunks().cast(pa.int64()),
                "n_mids": pa.array(np.zeros(b.num_rows, np.int64)),
                "direct": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    merged = hash_aggregate(
        paths.map_batches(tag_paths, batch_format="pyarrow").union(
            eds.map_batches(tag_edges, batch_format="pyarrow")
        ),
        ["subj", "obj"],
        [("n_mids", "sum"), ("direct", "sum")],
    )
    t = _collect(merged)
    t = t.filter(pc.greater(t["n_mids"], 0))
    out = pa.table(
        {
            "subj": t["subj"].combine_chunks().cast(pa.int64()),
            "obj": t["obj"].combine_chunks().cast(pa.int64()),
            "n_mids": t["n_mids"].combine_chunks().cast(pa.int64()),
            "direct": t["direct"].combine_chunks().cast(pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("subj", "ascending"), ("obj", "ascending")]
        )
    )


def _sql_kg_2hop_paths() -> str:
    from phrasekit_ray.pipelines.queries import _sql_flagship

    return f"""
WITH t AS ({_sql_flagship()}),
e AS MATERIALIZED (SELECT DISTINCT subj AS s, obj AS o FROM t
                   WHERE subj <> obj),
w AS (SELECT x.s AS subj, y.o AS obj, count(*) AS n_mids
      FROM e x JOIN e y ON y.s = x.o AND y.o <> x.s
      GROUP BY 1, 2)
SELECT w.subj, w.obj, CAST(w.n_mids AS BIGINT) AS n_mids,
       CAST(CASE WHEN d.s IS NULL THEN 0 ELSE 1 END AS BIGINT) AS direct
FROM w LEFT JOIN e d ON d.s = w.subj AND d.o = w.obj
ORDER BY subj, obj"""


EXT_QUERIES.update({"q_kg_2hop_paths": q_kg_2hop_paths})
EXT_ORACLE_SQL.update({"q_kg_2hop_paths": _sql_kg_2hop_paths()})


def q_kg_symmetry(sf_dir: str):
    """KG relation symmetry profile (X171): per unordered entity pair
    (a < b) over the flagship triple stream, the directed assertion
    counts ``n_fwd`` (a→b), ``n_rev`` (b→a) and ``symmetric`` = 1 when
    both directions are asserted. The ontology diagnostic next to the
    X160 cardinality profile: alias/sibling co-mentions assert both
    ways, functional relations one way — the edge-orientation evidence
    a canonicalization pass weighs before merging a pair.

    ONE two-phase directed-pair count + a vectorized canonical fold +
    ONE two-phase sum merge (zero-union pattern) — no joins at all."""
    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate

    triples = _flagship_triples(sf_dir)

    def so(b: pa.Table) -> pa.Table:
        s = b["subj"].combine_chunks().cast(pa.int64())
        o = b["obj"].combine_chunks().cast(pa.int64())
        keep = pc.not_equal(s, o)
        return pa.table({"s": s.filter(keep), "o": o.filter(keep)})

    directed = grouped_count(
        triples.map_batches(so, batch_format="pyarrow"),
        ["s", "o"], count_col="n",
    )

    def canon(b: pa.Table) -> pa.Table:
        s = b["s"].combine_chunks().to_numpy(zero_copy_only=False)
        o = b["o"].combine_chunks().to_numpy(zero_copy_only=False)
        n = b["n"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        fwd = s < o
        return pa.table(
            {
                "a": pa.array(np.minimum(s, o), pa.int64()),
                "b": pa.array(np.maximum(s, o), pa.int64()),
                "n_fwd": pa.array(np.where(fwd, n, 0), pa.int64()),
                "n_rev": pa.array(np.where(fwd, 0, n), pa.int64()),
            }
        )

    merged = hash_aggregate(
        directed.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"],
        [("n_fwd", "sum"), ("n_rev", "sum")],
    )

    def flag(b: pa.Table) -> pa.Table:
        nf = b["n_fwd"].combine_chunks().cast(pa.int64())
        nr = b["n_rev"].combine_chunks().cast(pa.int64())
        sym = pc.cast(
            pc.and_(pc.greater(nf, 0), pc.greater(nr, 0)), pa.int64()
        )
        return pa.table(
            {
                "a": b["a"].combine_chunks().cast(pa.int64()),
                "b": b["b"].combine_chunks().cast(pa.int64()),
                "n_fwd": nf,
                "n_rev": nr,
                "symmetric": sym,
            }
        )

    t = _collect(merged.map_batches(flag, batch_format="pyarrow"))
    return t.take(
        pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")])
    )


def _sql_kg_symmetry() -> str:
    from phrasekit_ray.pipelines.queries import _sql_flagship

    return f"""
WITH t AS ({_sql_flagship()}),
d AS (SELECT subj, obj, count(*) AS n FROM t WHERE subj <> obj
      GROUP BY 1, 2),
c AS (SELECT LEAST(subj, obj) AS a, GREATEST(subj, obj) AS b,
             SUM(CASE WHEN subj < obj THEN n ELSE 0 END) AS n_fwd,
             SUM(CASE WHEN subj > obj THEN n ELSE 0 END) AS n_rev
      FROM d GROUP BY 1, 2)
SELECT a, b, CAST(n_fwd AS BIGINT) AS n_fwd, CAST(n_rev AS BIGINT) AS n_rev,
       CAST(CASE WHEN n_fwd > 0 AND n_rev > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS symmetric
FROM c ORDER BY a, b"""


EXT_QUERIES.update({"q_kg_symmetry": q_kg_symmetry})
EXT_ORACLE_SQL.update({"q_kg_symmetry": _sql_kg_symmetry()})


_WALK_STEPS = 4


def q_random_walks(sf_dir: str):
    """Deterministic random-walk corpus (X172) — the DeepWalk/node2vec
    preprocessing stage: one length-4 walk per host over the extracted
    host link graph (X104), where step t from node u follows out-edge
    rank ``splitmix17(8·walk + t) % out_degree(u)`` (the repo's shared
    seeded hash, exactly twinned in SQL) and a node with no out-edges
    holds position. Emits (start_host, step, host) for steps 0..4 —
    the token stream a skip-gram embedding trains on.

    Distribution: the WALK is the scale-bearing part — one row per
    (node, step) advanced by TWO int-keyed broadcast ``lookup_join``s
    per step (degree attach, then packed (node, rank) → successor);
    dead ends bypass the successor join via a filter split, so no row
    is ever dropped by the inner join. The host→id dictionary and
    ranked adjacency are driver-side over the AGGREGATED host edge
    table (bounded by distinct hosts/edges — the X134 precedent; at
    web scale the X19 global-enumeration stage replaces the dict and
    the ranking becomes one groupby-enumerate, leaving the walk loop
    unchanged). Rank packing assumes node id < 2^31 and out-degree
    < 2^32."""
    import ray

    from phrasekit_ray.sources.pages import pages_from_documents, splitmix17
    from phrasekit_ray.stages.agg import lookup_join
    from phrasekit_ray.stages.extract import extract_links, host_edges

    pages = pages_from_documents(sf_dir, with_links=True)
    he = _collect(host_edges(extract_links(pages)))
    src = he["src_host"].to_pylist()
    dst = he["dst_host"].to_pylist()
    pairs = sorted({(a, b) for a, b in zip(src, dst) if a != b})
    hosts = sorted({h for p in pairs for h in p})
    hid = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    u = np.array([hid[a] for a, _ in pairs], np.int64)
    v = np.array([hid[b] for _, b in pairs], np.int64)
    # ranked adjacency: pairs are sorted (host-name order == id order),
    # so v is already ascending within each u segment
    deg = np.bincount(u, minlength=n).astype(np.int64)
    first = np.concatenate(([0], np.cumsum(deg)[:-1]))
    rank = np.arange(len(u), dtype=np.int64) - first[u]
    adj_ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(u * (1 << 32) + rank, pa.int64()),
                "nxt": pa.array(v, pa.int64()),
            }
        )
    )
    deg_ds = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "d": pa.array(deg, pa.int64()),
            }
        )
    )

    state = ray.data.from_arrow(
        pa.table(
            {
                "walk": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "cur": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            }
        )
    )
    st_schema = pa.schema([("walk", pa.int64()), ("cur", pa.int64())])
    outs = [state.map_batches(
        lambda b: pa.table(
            {
                "walk": b["walk"],
                "step": pa.array(np.zeros(b.num_rows, np.int64)),
                "node": b["cur"],
            }
        ),
        batch_format="pyarrow",
    )]
    for t in range(1, _WALK_STEPS + 1):
        with_deg = lookup_join(
            state, deg_ds, "cur", "u",
            left_schema=st_schema,
            right_schema=pa.schema([("u", pa.int64()), ("d", pa.int64())]),
        )

        def pick(b: pa.Table, step=t) -> pa.Table:
            w = b["walk"].combine_chunks().to_numpy(zero_copy_only=False)
            cur = b["cur"].combine_chunks().to_numpy(zero_copy_only=False)
            d = b["d"].combine_chunks().to_numpy(zero_copy_only=False)
            live = d > 0
            r = np.zeros(len(w), np.int64)
            if live.any():
                h = splitmix17(
                    (w[live] * 8 + step).astype(np.uint64)
                )
                r[live] = (h % d[live].astype(np.uint64)).astype(np.int64)
            return pa.table(
                {
                    "walk": pa.array(w, pa.int64()),
                    "cur": pa.array(cur, pa.int64()),
                    "live": pa.array(live),
                    "k": pa.array(cur * (1 << 32) + r, pa.int64()),
                }
            )

        picked = with_deg.map_batches(pick, batch_format="pyarrow")
        live_next = lookup_join(
            picked.map_batches(
                lambda b: b.filter(b["live"]).select(["walk", "k"]),
                batch_format="pyarrow",
            ),
            adj_ds, "k", "k",
            left_schema=pa.schema([("walk", pa.int64()), ("k", pa.int64())]),
            right_schema=pa.schema([("k", pa.int64()), ("nxt", pa.int64())]),
        ).map_batches(
            lambda b: pa.table({"walk": b["walk"], "cur": b["nxt"]}),
            batch_format="pyarrow",
        )
        stuck = picked.map_batches(
            lambda b: b.filter(pc.invert(b["live"])).select(["walk", "cur"]),
            batch_format="pyarrow",
        )
        state = live_next.union(stuck).materialize()
        outs.append(state.map_batches(
            lambda b, step=t: pa.table(
                {
                    "walk": b["walk"],
                    "step": pa.array(np.full(b.num_rows, step, np.int64)),
                    "node": b["cur"],
                }
            ),
            batch_format="pyarrow",
        ))

    t_all = _collect(outs[0].union(*outs[1:]))
    names = pa.array(hosts, pa.string())
    out = pa.table(
        {
            "start_host": names.take(t_all["walk"].combine_chunks()),
            "step": t_all["step"].combine_chunks().cast(pa.int64()),
            "host": names.take(t_all["node"].combine_chunks()),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("start_host", "ascending"), ("step", "ascending")],
        )
    )


def _sql_random_walks() -> str:
    steps = []
    prev = "w0"
    for t in range(1, _WALK_STEPS + 1):
        sm = _sm_sql(f"CAST(w.walk AS HUGEINT)*8 + {t}")
        steps.append(f"""
w{t} AS (SELECT w.walk, COALESCE(a.v, w.cur) AS cur
         FROM {prev} w
         LEFT JOIN deg ON deg.u = w.cur
         LEFT JOIN adj a ON a.u = w.cur
              AND a.r = ({sm}) % CAST(deg.d AS HUGEINT))""")
        prev = f"w{t}"
    unions = "\nUNION ALL\n".join(
        f"SELECT walk, {t} AS step, cur FROM w{t}"
        for t in range(0, _WALK_STEPS + 1)
    )
    return f"""
WITH s AS (SELECT doc_id, source, j
           FROM documents, generate_series(1, 3) AS g(j)),
l AS (SELECT source, j,
        ({_sm_sql('CAST(doc_id AS HUGEINT)*8 + CAST(j AS HUGEINT)')})
          % 100003 AS t,
        1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3) AS n_links
      FROM s),
he AS (SELECT DISTINCT source || '.example.org' AS src,
              'h' || CAST(t % 16 AS VARCHAR) || '.example.org' AS dst
       FROM l WHERE j <= n_links),
hosts AS (SELECT DISTINCT h FROM
          (SELECT src AS h FROM he UNION SELECT dst FROM he)),
hid AS MATERIALIZED (SELECT h, row_number() OVER (ORDER BY h) - 1 AS id
                     FROM hosts),
e AS (SELECT su.id AS u, du.id AS v
      FROM he JOIN hid su ON su.h = he.src JOIN hid du ON du.h = he.dst
      WHERE su.id <> du.id),
adj AS MATERIALIZED (SELECT u, v,
        row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS r FROM e),
deg AS MATERIALIZED (SELECT u, count(*) AS d FROM e GROUP BY u),
w0 AS (SELECT id AS walk, id AS cur FROM hid),{','.join(steps)},
allsteps AS ({unions})
SELECT sh.h AS start_host, CAST(a.step AS BIGINT) AS step, ch.h AS host
FROM allsteps a JOIN hid sh ON sh.id = a.walk JOIN hid ch ON ch.id = a.cur
ORDER BY start_host, step"""


EXT_QUERIES.update({"q_random_walks": q_random_walks})
EXT_ORACLE_SQL.update({"q_random_walks": _sql_random_walks()})


def q_kg_conflicts(sf_dir: str):
    """Functional-property conflict audit (X173): subjects of the
    flagship KG that assert ≥2 DISTINCT objects under the single lift
    predicate, with the top two objects by assertion count (ties →
    smaller entity id) — the contradiction shortlist an ontology-
    constrained KG hands to entity resolution (is the subject genuinely
    multi-valued, or are the two objects aliases to merge?). Complements
    the X160 cardinality profile (which reports the aggregate rate,
    not the offending pairs).

    ONE two-phase (subj, obj) count + ONE groupby-subject top-2 scan
    (each group is one subject's object list — bounded by per-subject
    distinct objects, never the corpus)."""
    from phrasekit_ray.stages.agg import grouped_count

    triples = _flagship_triples(sf_dir)

    def so(b: pa.Table) -> pa.Table:
        s = b["subj"].combine_chunks().cast(pa.int64())
        o = b["obj"].combine_chunks().cast(pa.int64())
        keep = pc.not_equal(s, o)
        return pa.table({"s": s.filter(keep), "o": o.filter(keep)})

    counts = grouped_count(
        triples.map_batches(so, batch_format="pyarrow"),
        ["s", "o"], count_col="n",
    )

    def top2(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table(
                {
                    "subj": pa.array([], pa.int64()),
                    "n_objs": pa.array([], pa.int64()),
                    "n_asserts": pa.array([], pa.int64()),
                    "top_obj": pa.array([], pa.int64()),
                    "top_n": pa.array([], pa.int64()),
                    "second_obj": pa.array([], pa.int64()),
                    "second_n": pa.array([], pa.int64()),
                }
            )
        t = group.sort_by([("n", "descending"), ("o", "ascending")])
        o = t["o"].combine_chunks()
        n = t["n"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "subj": pa.array([t["s"][0].as_py()], pa.int64()),
                "n_objs": pa.array([t.num_rows], pa.int64()),
                "n_asserts": pa.array([int(pc.sum(n).as_py())], pa.int64()),
                "top_obj": pa.array([o[0].as_py()], pa.int64()),
                "top_n": pa.array([n[0].as_py()], pa.int64()),
                "second_obj": pa.array([o[1].as_py()], pa.int64()),
                "second_n": pa.array([n[1].as_py()], pa.int64()),
            }
        )

    out = _collect(
        counts.groupby("s").map_groups(top2, batch_format="pyarrow")
    )
    return out.take(pc.sort_indices(out, sort_keys=[("subj", "ascending")]))


def _sql_kg_conflicts() -> str:
    from phrasekit_ray.pipelines.queries import _sql_flagship

    return f"""
WITH t AS ({_sql_flagship()}),
d AS (SELECT subj, obj, count(*) AS n FROM t WHERE subj <> obj
      GROUP BY 1, 2),
r AS (SELECT subj, obj, n,
        row_number() OVER (PARTITION BY subj ORDER BY n DESC, obj ASC) AS rk,
        count(*) OVER (PARTITION BY subj) AS n_objs,
        SUM(n) OVER (PARTITION BY subj) AS n_asserts
      FROM d)
SELECT subj, CAST(n_objs AS BIGINT) AS n_objs,
       CAST(n_asserts AS BIGINT) AS n_asserts,
       CAST(MAX(CASE WHEN rk = 1 THEN obj END) AS BIGINT) AS top_obj,
       CAST(MAX(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS top_n,
       CAST(MAX(CASE WHEN rk = 2 THEN obj END) AS BIGINT) AS second_obj,
       CAST(MAX(CASE WHEN rk = 2 THEN n END) AS BIGINT) AS second_n
FROM r WHERE n_objs >= 2 AND rk <= 2
GROUP BY subj, n_objs, n_asserts
ORDER BY subj"""


EXT_QUERIES.update({"q_kg_conflicts": q_kg_conflicts})
EXT_ORACLE_SQL.update({"q_kg_conflicts": _sql_kg_conflicts()})


def q_boilerplate_segments(sf_dir: str):
    """Per-host boilerplate detection (X174) — the CCNet-style template
    signal a web-cleaning pass removes before dedup/LM-filtering: an
    html segment (text between ``<`` delimiters) present on ≥80% of a
    host's pages is template scaffolding, not content. Emits (host,
    segment, n_pages, host_pages) for every boilerplate segment; page
    text and per-page outlink anchors fall under the threshold, the
    fixed page template and the junk anchors clear it.

    Differential design (the X104 pattern): the Ray side only ever
    PARSES the html; the SQL twin recomputes the page template and the
    deterministic anchor scheme from the generation rule — parser bugs
    (segment boundary, empty-segment retention, per-page dedup) surface
    as value mismatches.

    Distribution: one vectorized split + per-page in-batch DISTINCT
    (arrow group_by — a page never straddles batches), ONE two-phase
    (host, segment) page count, host page totals broadcast (bounded by
    distinct hosts; the threshold compare is integer 5·n ≥ 4·total)."""
    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.agg import grouped_count
    from phrasekit_ray.stages.extract import host_of

    pages = pages_from_documents(sf_dir, with_links=True)

    def segs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"host": pa.array([], pa.string()),
                 "seg": pa.array([], pa.string())}
            )
        host = host_of(batch["url"])
        html = pc.cast(batch["html"].combine_chunks(), pa.large_binary())
        parts = pc.split_pattern(html, b"<")
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(parts)
        pg = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        keep = pc.greater(pc.binary_length(flat), 0).to_numpy(
            zero_copy_only=False
        )
        tbl = pa.table(
            {
                "pg": pa.array(pg[keep], pa.int64()),
                "host": host.take(pa.array(pg[keep])),
                "seg": flat.filter(pa.array(keep)).cast(pa.string()),
            }
        )
        # DISTINCT per page: repeated junk anchors on one page count once
        return tbl.group_by(["pg", "host", "seg"]).aggregate([]).drop_columns(
            ["pg"]
        )

    per_page = pages.map_batches(segs, batch_format="pyarrow")
    counts = grouped_count(per_page, ["host", "seg"], count_col="n_pages")

    hp = _collect(
        grouped_count(
            pages.map_batches(
                lambda b: pa.table({"host": host_of(b["url"])}),
                batch_format="pyarrow",
            ),
            "host", count_col="host_pages",
        )
    )
    totals = dict(
        zip(hp["host"].to_pylist(), hp["host_pages"].to_pylist())
    )
    import ray as _ray
    tot_ref = _ray.put(totals)

    def attach(b: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        tot = _get_broadcast(tot_ref)
        hosts = b["host"].combine_chunks()
        n = b["n_pages"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hpv = np.array([tot[h] for h in hosts.to_pylist()], np.int64)
        keep = 5 * n >= 4 * hpv
        return pa.table(
            {
                "host": hosts.filter(pa.array(keep)),
                "segment": b["seg"].combine_chunks().filter(pa.array(keep)),
                "n_pages": pa.array(n[keep], pa.int64()),
                "host_pages": pa.array(hpv[keep], pa.int64()),
            }
        )

    out = _collect(counts.map_batches(attach, batch_format="pyarrow"))
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("host", "ascending"), ("segment", "ascending")]
        )
    )


def _sql_boilerplate_segments() -> str:
    # regenerate html from the fixture rule: template + junk anchors +
    # 1 + sm(8d+7)%3 real anchors (slot 1 carries "#top")
    def slot(j: int) -> str:
        t = f"({_sm_sql(f'CAST(doc_id AS HUGEINT)*8 + {j}')}) % 100003"
        frag = "#top" if j == 1 else ""
        return (
            f"'<a href=\"https://h' || CAST(({t}) % 16 AS VARCHAR) || "
            f"'.example.org/doc/' || CAST({t} AS VARCHAR) || '{frag}\">e' || "
            f"CAST(({t}) % 50 AS VARCHAR) || '</a>'"
        )

    junk = (
        "'<a href=\"/relative/path\"></a><a href=\"#frag\"></a>"
        "<a href=\"mailto:ab@example.org\"></a>'"
    )
    nl = f"1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3)"
    return f"""
WITH h AS (SELECT source || '.example.org' AS host, doc_id,
        '<html><body><p>' || text || '</p>' || {junk}
        || {slot(1)}
        || CASE WHEN ({nl}) >= 2 THEN {slot(2)} ELSE '' END
        || CASE WHEN ({nl}) >= 3 THEN {slot(3)} ELSE '' END
        || '</body></html>' AS html
      FROM documents),
seg AS (SELECT DISTINCT host, doc_id, u.x AS segment
        FROM h, unnest(string_split(h.html, '<')) AS u(x)
        WHERE u.x <> ''),
hp AS (SELECT host, count(*) AS host_pages FROM h GROUP BY 1),
cnt AS (SELECT host, segment, count(*) AS n_pages FROM seg GROUP BY 1, 2)
SELECT c.host AS host, c.segment, CAST(c.n_pages AS BIGINT) AS n_pages,
       CAST(hp.host_pages AS BIGINT) AS host_pages
FROM cnt c JOIN hp ON hp.host = c.host
WHERE 5 * c.n_pages >= 4 * hp.host_pages
ORDER BY c.host, c.segment"""


EXT_QUERIES.update({"q_boilerplate_segments": q_boilerplate_segments})
EXT_ORACLE_SQL.update({"q_boilerplate_segments": _sql_boilerplate_segments()})


def q_kg_alias_ambiguity(sf_dir: str):
    """Alias-token ambiguity profile (X175): for every token of the
    model's phrase vocabulary, how many distinct phrases contain it and
    how many distinct canonical entities those phrases resolve to — the
    evidence an entity-LINKING stage weighs before trusting a single
    token as an alias (``n_entities ≥ 2`` ⇒ the token alone cannot
    disambiguate; the X117 anchor-text aliases are exactly such
    tokens). Mining/scoring run distributed (the flagship prologue up
    to the artifact build); the profile itself is a model-side pass
    over the artifact's pattern table + canonical mapping — the SAME
    artifact-sized bound the canonicalization pass relies on (SURVEY
    §7.3), so the corpus is never re-read."""
    from phrasekit_ray.config import MineConfig, ScoreConfig
    from phrasekit_ray.pipelines.phrase import run_phrase_pipeline
    from phrasekit_ray.sources.pages import DEMO_BACKGROUND, pages_from_documents
    from phrasekit_ray.stages import kg as kgmod

    phase = run_phrase_pipeline(
        pages_from_documents(sf_dir),
        {" ".join(t): c for t, c in DEMO_BACKGROUND},
        MineConfig(min_n=2, max_n=5, min_count=3),
        ScoreConfig(min_domain_count=3),
        tag_concurrency=(1, 4),
    )
    art = phase.artifact
    mapping = kgmod.canonical_mapping(
        art.phrase_ids, kgmod.alias_edges_from_artifact(art)
    )
    prof: dict[str, tuple[set, set]] = {}
    for pid, toks in zip(art.phrase_ids, art.pattern_tokens):
        ent = mapping[int(pid)]
        for tok in set(toks):
            ps, es = prof.setdefault(tok, (set(), set()))
            ps.add(int(pid))
            es.add(ent)
    toks_sorted = sorted(prof)
    return pa.table(
        {
            "tok": pa.array(toks_sorted, pa.string()),
            "n_phrases": pa.array(
                [len(prof[t][0]) for t in toks_sorted], pa.int64()
            ),
            "n_entities": pa.array(
                [len(prof[t][1]) for t in toks_sorted], pa.int64()
            ),
        }
    )


def _sql_kg_alias_ambiguity() -> str:
    # flagship prefix CTEs (pages → phrases → alias closure → canon),
    # duplicated from _sql_flagship rather than refactoring ten live
    # oracles; the token profile replaces the match/lift suffix
    from phrasekit_ray.pipelines.queries import _sql_win

    wins = " UNION ALL ".join(_sql_win(n) for n in range(2, 6))
    bg = ", ".join(
        f"('{n}', {c})"
        for n, c in [("for the", 50000), ("in the", 30000), ("to the", 25000),
                     ("lysis buffer", 8), ("western blot", 5)]
    )
    return f"""
WITH RECURSIVE pages AS (
  SELECT 'https://example.org/' || source || '/' || CAST(doc_id AS VARCHAR) AS doc_id, text
  FROM documents),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM pages),
wins AS ({wins}),
counts AS (SELECT ngram, count(*) AS cnt FROM wins GROUP BY 1 HAVING count(*) >= 3),
bg(ngram, bcount) AS (SELECT * FROM (VALUES {bg}) v(n, c)),
scored AS (
  SELECT c.ngram, CAST(c.cnt AS DOUBLE) / (COALESCE(b.bcount, 0) + 1) AS salience
  FROM counts c LEFT JOIN bg b USING (ngram)
  WHERE CAST(c.cnt AS DOUBLE) / (COALESCE(b.bcount, 0) + 1) >= 2.0),
phrases AS (
  SELECT ngram, 999 + CAST(row_number() OVER (ORDER BY salience DESC, ngram ASC) AS BIGINT)
         AS phrase_id FROM scored),
ealias AS (SELECT a.phrase_id AS u, b.phrase_id AS v
           FROM phrases a JOIN phrases b ON starts_with(b.ngram, a.ngram || ' ')),
und AS (SELECT u, v FROM ealias UNION SELECT v, u FROM ealias
        UNION SELECT phrase_id, phrase_id FROM phrases),
reach(u, v) AS (SELECT u, v FROM und
                UNION SELECT r.u, d.v FROM reach r JOIN und d ON d.u = r.v),
canon AS (SELECT u AS phrase_id, min(v) AS entity FROM reach GROUP BY 1),
ptoks AS (SELECT phrase_id, unnest(string_split(ngram, ' ')) AS tok
          FROM phrases),
j AS (SELECT DISTINCT p.tok, p.phrase_id, c.entity
      FROM ptoks p JOIN canon c USING (phrase_id))
SELECT tok, CAST(count(DISTINCT phrase_id) AS BIGINT) AS n_phrases,
       CAST(count(DISTINCT entity) AS BIGINT) AS n_entities
FROM j GROUP BY tok ORDER BY tok"""


EXT_QUERIES.update({"q_kg_alias_ambiguity": q_kg_alias_ambiguity})
EXT_ORACLE_SQL.update({"q_kg_alias_ambiguity": _sql_kg_alias_ambiguity()})


def q_clean_boilerplate(sf_dir: str):
    """Composed boilerplate removal (X176) — X174's detector applied
    back to every page, the two-pass shape of production template
    cleaning (CCNet/trafilatura style): pass 1 computes each host's
    boilerplate segment set (≥80% of the host's pages), pass 2 re-reads
    the pages and reports, per page, total html segments, segments
    removed as boilerplate, and the byte length of the CONTENT kept
    (text after each surviving segment's first ``>``). The per-host
    template set broadcasts once (``ray.put``, bounded by hosts ×
    template size); the corpus is read twice rather than materialized —
    the documented 100 TB trade (pipelines/clean.py precedent)."""
    import ray

    from phrasekit_ray.sources.pages import pages_from_documents
    from phrasekit_ray.stages.extract import host_of

    boiler = q_boilerplate_segments(sf_dir)
    bref = ray.put(
        pc.binary_join_element_wise(
            boiler["host"].combine_chunks(),
            boiler["segment"].combine_chunks(),
            "\x00",
        )
    )

    pages = pages_from_documents(sf_dir, with_links=True)

    def clean(batch: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        bm = _get_broadcast(bref)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "n_segs": pa.array([], pa.int64()),
                    "n_boiler": pa.array([], pa.int64()),
                    "content_chars": pa.array([], pa.int64()),
                }
            )
        hosts = host_of(batch["url"])
        html = pc.cast(batch["html"].combine_chunks(), pa.large_binary())
        parts = pc.split_pattern(html, b"<")
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(parts)
        pg = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        keep = pc.greater(pc.binary_length(flat), 0).to_numpy(
            zero_copy_only=False
        )
        pgk = pg[keep]
        segk = flat.filter(pa.array(keep)).cast(pa.string())
        # content length = bytes after the segment's first '>' (the tag
        # body; a '>'-less segment keeps its full length, as the twin's
        # CASE) — find_substring avoids a list gather
        seg_len = pc.binary_length(flat).to_numpy(zero_copy_only=False)
        gt = pc.find_substring(flat, ">").to_numpy(zero_copy_only=False)
        body_len = np.where(gt >= 0, seg_len - gt - 1, seg_len)[keep]
        # vectorized membership: one is_in over packed host\x00segment
        # keys against the broadcast template set — no per-row Python
        cand_keys = pc.binary_join_element_wise(
            hosts.take(pa.array(pgk)), segk, "\x00"
        )
        isb = pc.is_in(cand_keys, value_set=bm).to_numpy(
            zero_copy_only=False
        )
        n = batch.num_rows
        n_segs = np.bincount(pgk, minlength=n).astype(np.int64)
        n_boiler = np.bincount(pgk[isb], minlength=n).astype(np.int64)
        kept_chars = np.bincount(
            pgk[~isb], weights=body_len[~isb].astype(np.float64),
            minlength=n,
        ).astype(np.int64)
        return pa.table(
            {
                "url": batch["url"].combine_chunks().cast(pa.string()),
                "n_segs": pa.array(n_segs, pa.int64()),
                "n_boiler": pa.array(n_boiler, pa.int64()),
                "content_chars": pa.array(kept_chars, pa.int64()),
            }
        )

    out = _collect(pages.map_batches(clean, batch_format="pyarrow"))
    return out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")]))


def _sql_clean_boilerplate() -> str:
    base = _sql_boilerplate_segments()
    # reuse X174's twin as a CTE: strip its ORDER BY tail and wrap
    inner = base.rsplit("ORDER BY", 1)[0]
    return f"""
WITH boiler AS ({inner}),
h2 AS (SELECT 'https://' || source || '.example.org/' ||
              CAST(doc_id AS VARCHAR) AS url,
              source || '.example.org' AS host, doc_id, html
       FROM ({_sql_boilerplate_pages()})),
seg AS (SELECT url, host, u.x AS segment,
               length(CASE WHEN position('>' IN u.x) > 0
                      THEN substr(u.x, position('>' IN u.x) + 1)
                      ELSE u.x END) AS body_len
        FROM h2, unnest(string_split(h2.html, '<')) AS u(x)
        WHERE u.x <> '')
SELECT s.url AS url,
       CAST(count(*) AS BIGINT) AS n_segs,
       CAST(SUM(CASE WHEN b.segment IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_boiler,
       CAST(SUM(CASE WHEN b.segment IS NULL THEN s.body_len ELSE 0 END)
            AS BIGINT) AS content_chars
FROM seg s LEFT JOIN boiler b
  ON b.host = s.host AND b.segment = s.segment
GROUP BY s.url ORDER BY s.url"""


def _sql_boilerplate_pages() -> str:
    """The regenerated (host, doc_id, html) page table shared by the
    X174/X176 twins (generation rule of sources/pages.py)."""

    def slot(j: int) -> str:
        t = f"({_sm_sql(f'CAST(doc_id AS HUGEINT)*8 + {j}')}) % 100003"
        frag = "#top" if j == 1 else ""
        return (
            f"'<a href=\"https://h' || CAST(({t}) % 16 AS VARCHAR) || "
            f"'.example.org/doc/' || CAST({t} AS VARCHAR) || '{frag}\">e' || "
            f"CAST(({t}) % 50 AS VARCHAR) || '</a>'"
        )

    junk = (
        "'<a href=\"/relative/path\"></a><a href=\"#frag\"></a>"
        "<a href=\"mailto:ab@example.org\"></a>'"
    )
    nl = f"1 + (({_sm_sql('CAST(doc_id AS HUGEINT)*8 + 7')}) % 3)"
    return f"""SELECT source, doc_id,
        '<html><body><p>' || text || '</p>' || {junk}
        || {slot(1)}
        || CASE WHEN ({nl}) >= 2 THEN {slot(2)} ELSE '' END
        || CASE WHEN ({nl}) >= 3 THEN {slot(3)} ELSE '' END
        || '</body></html>' AS html
      FROM documents"""


EXT_QUERIES.update({"q_clean_boilerplate": q_clean_boilerplate})
EXT_ORACLE_SQL.update({"q_clean_boilerplate": _sql_clean_boilerplate()})


def q_doc_keywords(sf_dir: str):
    """Per-document top-3 TF-IDF keywords (X177) — the classic
    keyword-extraction shape (Salton TF-IDF; the per-doc summary signal
    next to corpus-level salience scoring F1-F3): score_micro =
    round_half_away(tf · (ln N − ln df) · 10⁶) in exact int64
    micro-units, top 3 per doc by (score desc, tok asc).

    Exactness: ln runs on INTEGER-valued doubles only (the X123/X168
    precedent — libm ln on integers is bit-identical between numpy and
    DuckDB), the product is written in the SAME order both sides, and
    ordering compares the ROUNDED int64, never the float.

    Distribution: ONE explode + ONE two-phase (doc, tok) count, then df
    WITHOUT a join — the tf stream shuffles once BY TOKEN and each
    token's document frequency is just its segment length inside the
    partition (rows are distinct (doc, tok) pairs), scattered back
    vectorized. Top-3 per doc via the lossless two-phase
    ``grouped_topk`` (per-block partial top-k, only survivors shuffle).
    N is one metadata-count scalar."""
    import ray

    from phrasekit_ray.stages.agg import (
        _part_column,
        default_partitions,
        grouped_count,
        grouped_topk,
        round_away,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = docs.count()
    lnN = np.log(np.float64(max(n_docs, 1)))

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        sizes = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        did = b["doc_id"].combine_chunks().cast(pa.int64()).take(
            pa.array(np.repeat(np.arange(len(sizes)), sizes))
        )
        return pa.table({"doc_id": did, "tok": toks.values})

    tf = grouped_count(
        docs.map_batches(explode, batch_format="pyarrow"),
        ["doc_id", "tok"], count_col="tf",
    )

    nparts = default_partitions(None)

    def add_tok_part(b: pa.Table) -> pa.Table:
        return b.append_column("_part", _part_column(b, ["tok"], nparts))

    def score_partition(g: pa.Table) -> pa.Table:
        # all rows of a token are in this partition: df = segment size
        t = g.drop_columns(["_part"])
        t = t.take(pc.sort_indices(t, sort_keys=[("tok", "ascending")]))
        tok = t["tok"].combine_chunks().to_numpy(zero_copy_only=False)
        new = np.concatenate(([True], tok[1:] != tok[:-1]))
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(tok)))
        df = np.repeat(sizes, sizes).astype(np.float64)
        tfv = t["tf"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        idf = lnN - np.log(df)
        term = tfv.astype(np.float64) * idf * 1e6
        # same floor(x+0.5)/ceil(x-0.5) formulation as the SQL twin
        # (X168 precedent) so float-boundary halves round identically
        micro = np.where(
            term >= 0, np.floor(term + 0.5), np.ceil(term - 0.5)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                "tok": t["tok"],
                "tf": pa.array(tfv, pa.int64()),
                "score_micro": pa.array(micro, pa.int64()),
            }
        )

    scored = (
        tf.map_batches(add_tok_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(score_partition, batch_format="pyarrow")
    )

    top = grouped_topk(
        scored, "doc_id",
        [("score_micro", "descending"), ("tok", "ascending")], k=3,
    )
    t = _collect(top)
    t = t.take(
        pc.sort_indices(
            t,
            sort_keys=[
                ("doc_id", "ascending"),
                ("score_micro", "descending"),
                ("tok", "ascending"),
            ],
        )
    )
    did = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    new = np.concatenate(([True], did[1:] != did[:-1]))
    starts = np.flatnonzero(new)
    rank = (
        np.arange(len(did))
        - np.repeat(starts, np.diff(np.append(starts, len(did))))
        + 1
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "rank": pa.array(rank.astype(np.int64), pa.int64()),
            "tok": t["tok"],
            "tf": t["tf"],
            "score_micro": t["score_micro"],
        }
    )


SQL_DOC_KEYWORDS = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
s AS (SELECT t.doc_id, t.tok, t.tf,
        CAST(t.tf AS DOUBLE)
          * (ln(CAST(nd.n AS DOUBLE)) - ln(CAST(d.df AS DOUBLE)))
          * 1000000 AS term
      FROM tf t JOIN df d USING (tok), nd),
m AS (SELECT doc_id, tok, tf,
        CAST(CASE WHEN term >= 0 THEN floor(term + 0.5)
             ELSE ceil(term - 0.5) END AS BIGINT) AS score_micro
      FROM s),
r AS (SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score_micro DESC, tok ASC) AS rn
      FROM m)
SELECT doc_id, CAST(rn AS BIGINT) AS rank, tok, tf, score_micro
FROM r WHERE rn <= 3 ORDER BY doc_id, rank
"""


EXT_QUERIES.update({"q_doc_keywords": q_doc_keywords})
EXT_ORACLE_SQL.update({"q_doc_keywords": SQL_DOC_KEYWORDS})


def q_kg_threshold_curve(sf_dir: str, driver_edges_threshold: int = 2_000_000):
    """Canonicalization threshold-sensitivity curve (X178): the KG
    edge-pruning sweep an entity-resolution pass runs before picking an
    NPMI cutoff (X168's stated purpose) — for each threshold θ, keep
    edges with npmi_micro ≥ θ and report how fragmented the graph gets:
    kept-edge count, incident-node count, connected-component count and
    largest-component size. A cliff in n_components between two θ
    values means the cutoff sits inside a load-bearing band; the
    giant-component share falling is the over-merge risk going away.

    Distribution: the NPMI edge table is model-sized (distinct KG
    edges, the SURVEY §7.3 bound). Under ``driver_edges_threshold`` the
    per-θ components run the deterministic min-root union-find the
    canonicalization pass itself uses (the kg.py bounded-fast-path
    convention — work is O(edges α(n)), far under one distributed
    round's fixed cost here); above it, or when tests force it with
    threshold=0, each θ runs the DISTRIBUTED hash-min label-propagation
    operator (stages/kg.connected_components_distributed — the 100 TB
    scale path) + a two-phase size count, and the driver only ever
    holds the per-label size table (≤ nodes rows)."""
    import ray

    from phrasekit_ray.stages.agg import grouped_count
    from phrasekit_ray.stages.kg import (
        UnionFind,
        connected_components_distributed,
    )

    npmi = q_kg_npmi_edges(sf_dir)
    thetas = [480000, 520000, 560000, 600000]
    out = {
        "theta_micro": [], "n_edges": [], "n_nodes": [],
        "n_components": [], "max_comp_size": [],
    }
    for th in thetas:
        kept = npmi.filter(
            pc.greater_equal(npmi["npmi_micro"], th)
        ).select(["subj", "obj"])
        out["theta_micro"].append(th)
        out["n_edges"].append(kept.num_rows)
        if kept.num_rows == 0:
            out["n_nodes"].append(0)
            out["n_components"].append(0)
            out["max_comp_size"].append(0)
            continue
        if kept.num_rows <= driver_edges_threshold:
            s = kept["subj"].to_numpy(zero_copy_only=False)
            o = kept["obj"].to_numpy(zero_copy_only=False)
            uf = UnionFind()
            for a, b in zip(s.tolist(), o.tolist()):
                uf.union(a, b)
            nodes = np.unique(np.concatenate((s, o)))
            lab = np.fromiter(
                (uf.find(int(x)) for x in nodes), np.int64, len(nodes)
            )
            sz = np.unique(lab, return_counts=True)[1]
        else:
            labels = connected_components_distributed(
                ray.data.from_arrow(kept), src_col="subj", dst_col="obj"
            )
            sizes = _collect(
                grouped_count(labels, ["label"], count_col="sz")
            )
            sz = sizes["sz"].to_numpy(zero_copy_only=False)
        out["n_nodes"].append(int(sz.sum()))
        out["n_components"].append(len(sz))
        out["max_comp_size"].append(int(sz.max()))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def _sql_kg_threshold_curve() -> str:
    # npmi CTE = the X168 twin nested as a subquery; per-θ recursive
    # closure components (the X91/X165 pattern), sizes → one scalar row
    from phrasekit_ray.pipelines.queries_ext import _sql_kg_npmi_edges

    # np/e{i} MATERIALIZED (X165 lesson): DuckDB inlines CTEs, which
    # would re-evaluate the whole nested flagship pipeline once per
    # threshold — 4x the work and thousands of concurrent parquet-scan
    # file handles (observed: "Too many open files" at 20k ulimit)
    s = f"""
WITH RECURSIVE np AS MATERIALIZED ({_sql_kg_npmi_edges()})"""
    rows = []
    for i, th in enumerate([480000, 520000, 560000, 600000]):
        s += f""",
e{i} AS MATERIALIZED (SELECT subj, obj FROM np WHERE npmi_micro >= {th}),
ee{i} AS (SELECT subj AS u, obj AS v FROM e{i}
          UNION SELECT obj, subj FROM e{i}),
reach{i}(a, b) AS (
  SELECT u, v FROM ee{i}
  UNION
  SELECT r.a, d.v FROM reach{i} r JOIN ee{i} d ON d.u = r.b),
cc{i} AS (SELECT a AS node, least(a, min(b)) AS label
          FROM reach{i} GROUP BY a),
sz{i} AS (SELECT label, count(*) AS cnt FROM cc{i} GROUP BY label),
row{i} AS (SELECT CAST({th} AS BIGINT) AS theta_micro,
        (SELECT CAST(count(*) AS BIGINT) FROM e{i}) AS n_edges,
        CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_nodes,
        CAST(COUNT(*) AS BIGINT) AS n_components,
        CAST(COALESCE(MAX(cnt), 0) AS BIGINT) AS max_comp_size
      FROM sz{i})"""
        rows.append(f"SELECT * FROM row{i}")
    s += "\n" + " UNION ALL ".join(rows) + " ORDER BY theta_micro"
    return s


EXT_QUERIES.update({"q_kg_threshold_curve": q_kg_threshold_curve})
EXT_ORACLE_SQL.update({"q_kg_threshold_curve": _sql_kg_threshold_curve()})


def q_alias_disambig(sf_dir: str):
    """Alias disambiguation by assertion evidence (X179) — the
    entity-LINK-scoring step the north star names: for every ambiguous
    alias token (X175's ``n_entities ≥ 2`` case — the token alone
    cannot identify an entity), rank its candidate entities by how
    often each is asserted in the KG (appearances as subject or object
    of the flagship triple stream — the popularity prior a linker
    falls back to without context) and emit the winner, ties to the
    smaller entity id. Candidates never asserted score 0 (zero-union).

    Distribution: mining/scoring/tagging run distributed (the flagship
    prologue); the entity assertion marginal is ONE two-phase count
    over the triple stream (each triple credits subj and obj once);
    the candidate table is model-sized (artifact pattern table ×
    canonical mapping — the SURVEY §7.3 bound), so the final argmax is
    a model-side vectorized pass."""
    from phrasekit_ray.config import MineConfig, ScoreConfig
    from phrasekit_ray.pipelines.phrase import run_phrase_pipeline
    from phrasekit_ray.sources.pages import DEMO_BACKGROUND, pages_from_documents
    from phrasekit_ray.stages import kg as kgmod
    from phrasekit_ray.stages.agg import grouped_count

    phase = run_phrase_pipeline(
        pages_from_documents(sf_dir),
        {" ".join(t): c for t, c in DEMO_BACKGROUND},
        MineConfig(min_n=2, max_n=5, min_count=3),
        ScoreConfig(min_domain_count=3),
        tag_concurrency=(1, 4),
    )
    art = phase.artifact
    mapping = kgmod.canonical_mapping(
        art.phrase_ids, kgmod.alias_edges_from_artifact(art)
    )
    cand: dict[str, set[int]] = {}
    for pid, toks in zip(art.phrase_ids, art.pattern_tokens):
        ent = mapping[int(pid)]
        for tok in set(toks):
            cand.setdefault(tok, set()).add(ent)

    triples = _flagship_triples(sf_dir)

    def ents(b: pa.Table) -> pa.Table:
        s = b["subj"].combine_chunks().cast(pa.int64())
        o = b["obj"].combine_chunks().cast(pa.int64())
        return pa.table({"e": pa.concat_arrays([s, o])})

    ec = _collect(
        grouped_count(
            triples.map_batches(ents, batch_format="pyarrow"),
            ["e"], count_col="cnt",
        )
    )
    counts = dict(
        zip(ec["e"].to_pylist(), (int(c) for c in ec["cnt"].to_pylist()))
    )

    rows = []
    for tok in sorted(cand):
        es = cand[tok]
        if len(es) < 2:
            continue
        best = min(es, key=lambda e: (-counts.get(e, 0), e))
        rows.append((tok, len(es), best, counts.get(best, 0)))
    return pa.table(
        {
            "tok": pa.array([r[0] for r in rows], pa.string()),
            "n_entities": pa.array([r[1] for r in rows], pa.int64()),
            "best_entity": pa.array([r[2] for r in rows], pa.int64()),
            "best_count": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _sql_alias_disambig() -> str:
    # X175's phrase/canon prefix + the flagship triple stream nested as
    # one CTE (X168 pattern; inner WITH shadows the prefix names);
    # winner per ambiguous token via a ranked window over the
    # assertion-marginal zero-union
    from phrasekit_ray.pipelines.queries import _sql_flagship, _sql_win

    wins = " UNION ALL ".join(_sql_win(n) for n in range(2, 6))
    bg = ", ".join(
        f"('{n}', {c})"
        for n, c in [("for the", 50000), ("in the", 30000), ("to the", 25000),
                     ("lysis buffer", 8), ("western blot", 5)]
    )
    return f"""
WITH RECURSIVE pages AS (
  SELECT 'https://example.org/' || source || '/' || CAST(doc_id AS VARCHAR) AS doc_id, text
  FROM documents),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM pages),
wins AS ({wins}),
counts AS (SELECT ngram, count(*) AS cnt FROM wins GROUP BY 1 HAVING count(*) >= 3),
bg(ngram, bcount) AS (SELECT * FROM (VALUES {bg}) v(n, c)),
scored AS (
  SELECT c.ngram, CAST(c.cnt AS DOUBLE) / (COALESCE(b.bcount, 0) + 1) AS salience
  FROM counts c LEFT JOIN bg b USING (ngram)
  WHERE CAST(c.cnt AS DOUBLE) / (COALESCE(b.bcount, 0) + 1) >= 2.0),
phrases AS (
  SELECT ngram, 999 + CAST(row_number() OVER (ORDER BY salience DESC, ngram ASC) AS BIGINT)
         AS phrase_id FROM scored),
ealias AS (SELECT a.phrase_id AS u, b.phrase_id AS v
           FROM phrases a JOIN phrases b ON starts_with(b.ngram, a.ngram || ' ')),
und AS (SELECT u, v FROM ealias UNION SELECT v, u FROM ealias
        UNION SELECT phrase_id, phrase_id FROM phrases),
reach(u, v) AS (SELECT u, v FROM und
                UNION SELECT r.u, d.v FROM reach r JOIN und d ON d.u = r.v),
canon AS (SELECT u AS phrase_id, min(v) AS entity FROM reach GROUP BY 1),
ptoks AS (SELECT phrase_id, unnest(string_split(ngram, ' ')) AS tok
          FROM phrases),
cand AS (SELECT DISTINCT p.tok, c.entity
         FROM ptoks p JOIN canon c USING (phrase_id)),
amb AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_entities
        FROM cand GROUP BY tok HAVING count(*) >= 2),
t AS MATERIALIZED ({_sql_flagship()}),
ec AS (SELECT e, CAST(count(*) AS BIGINT) AS cnt FROM
         (SELECT subj AS e FROM t UNION ALL SELECT obj FROM t)
       GROUP BY e),
ranked AS (
  SELECT cand.tok, amb.n_entities, cand.entity,
         COALESCE(ec.cnt, 0) AS cnt,
         row_number() OVER (PARTITION BY cand.tok
                            ORDER BY COALESCE(ec.cnt, 0) DESC,
                                     cand.entity ASC) AS rn
  FROM cand JOIN amb USING (tok) LEFT JOIN ec ON ec.e = cand.entity)
SELECT tok, n_entities, entity AS best_entity,
       CAST(cnt AS BIGINT) AS best_count
FROM ranked WHERE rn = 1 ORDER BY tok"""


EXT_QUERIES.update({"q_alias_disambig": q_alias_disambig})
EXT_ORACLE_SQL.update({"q_alias_disambig": _sql_alias_disambig()})


def q_entity_density(sf_dir: str):
    """Per-document entity-mention density (X180) — the
    weak-supervision yield QA a labeling pipeline reads before trusting
    its projected labels: per doc the token count, detected mention
    count, DISTINCT phrase count, and density_micro =
    10⁶·n_mentions // n_tokens. Dense docs are label-rich training
    material; zero-mention docs are the recall blind spot to sample
    and audit (they report 0s via zero-union, never drop out).

    Distribution: mentions come from the distributed tagger
    (_tagged_all_bigrams — load-once actor pool); per-doc mention and
    DISTINCT-phrase counts are two-phase aggregates; token counts are
    one vectorized map over the corpus. The three streams merge by
    UNION + one summing hash_aggregate (the zero-union pattern) — no
    outer join, one shuffle."""
    from phrasekit_ray.pipelines.queries import _docs, _tagged_all_bigrams
    from phrasekit_ray.stages import kg as kgmod
    from phrasekit_ray.stages.agg import (
        grouped_count,
        grouped_count_distinct,
        hash_aggregate,
    )

    tagged, _ = _tagged_all_bigrams(sf_dir)
    mentions = kgmod.mentions_from_tagged(tagged)

    def m_sel(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b["doc_id"].combine_chunks().cast(pa.int64())}
        )

    mc = grouped_count(
        mentions.map_batches(m_sel, batch_format="pyarrow"),
        ["doc_id"], count_col="n_mentions",
    )
    pd_ = grouped_count_distinct(
        mentions, "doc_id", "phrase_id", count_col="n_phrases"
    )

    def widen(col: str):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            z = pa.array(np.zeros(n, np.int64))
            return pa.table(
                {
                    "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                    "n_tokens": b[col].cast(pa.int64())
                    if col == "n_tokens" else z,
                    "n_mentions": b[col].cast(pa.int64())
                    if col == "n_mentions" else z,
                    "n_phrases": b[col].cast(pa.int64())
                    if col == "n_phrases" else z,
                }
            )

        return f

    def tok_counts(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                "n_tokens": pc.list_value_length(
                    pc.split_pattern(b["text"], " ")
                ).cast(pa.int64()),
            }
        )

    tc = _docs(sf_dir).map_batches(tok_counts, batch_format="pyarrow")
    unioned = (
        tc.map_batches(widen("n_tokens"), batch_format="pyarrow")
        .union(mc.map_batches(widen("n_mentions"), batch_format="pyarrow"))
        .union(pd_.map_batches(widen("n_phrases"), batch_format="pyarrow"))
    )
    agg = hash_aggregate(
        unioned, ["doc_id"],
        [("n_tokens", "sum"), ("n_mentions", "sum"), ("n_phrases", "sum")],
    )

    def density(b: pa.Table) -> pa.Table:
        nt = b["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        nm = b["n_mentions"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "n_mentions": pa.array(nm, pa.int64()),
                "n_phrases": b["n_phrases"].cast(pa.int64()),
                "density_micro": pa.array(
                    np.int64(10**6) * nm // np.maximum(nt, 1), pa.int64()
                ),
            }
        )

    t = _collect(agg.map_batches(density, batch_format="pyarrow"))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


def _sql_entity_density() -> str:
    from phrasekit_ray.pipelines.queries import _sql_mentions

    return f"""
{_sql_mentions()},
tcounts AS (SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents),
md AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_mentions,
              CAST(count(DISTINCT phrase_id) AS BIGINT) AS n_phrases
       FROM mentions GROUP BY doc_id)
SELECT t.doc_id, t.n_tokens,
       CAST(COALESCE(m.n_mentions, 0) AS BIGINT) AS n_mentions,
       CAST(COALESCE(m.n_phrases, 0) AS BIGINT) AS n_phrases,
       CAST(1000000 * COALESCE(m.n_mentions, 0)
            // GREATEST(t.n_tokens, 1) AS BIGINT) AS density_micro
FROM tcounts t LEFT JOIN md m USING (doc_id) ORDER BY t.doc_id"""


EXT_QUERIES.update({"q_entity_density": q_entity_density})
EXT_ORACLE_SQL.update({"q_entity_density": _sql_entity_density()})


_PPMI_WINDOW = 2


def q_walk_ppmi(sf_dir: str):
    """Skip-gram PPMI co-occurrence over the random-walk corpus (X181) —
    the matrix DeepWalk factorizes: for every ordered (center, context)
    host pair within ±2 steps inside one X172 walk,
    ppmi = max(0, ln c_ab + ln N − ln c_a − ln c_b) where c_a / c_b are
    center / context marginals over the pair stream and N its total.
    The embedding-ready association table a node2vec-as-matrix pass
    trains on — walks (X172) → windowed pairs → PPMI (this operator)
    → truncated factorization.

    Exactness: X168's bit-exact protocol — every ln on an
    INTEGER-valued double, identical expression order both sides,
    round half-away-from-zero to int64 micro-units, clamp at 0 AFTER
    rounding.

    Distribution: walks arrive as fixed-length sequences (one list row
    per walk — at web scale the X172 generator emits them partitioned,
    whole walks never straddle blocks); pair emission is one vectorized
    strided-offset map (no Python per-pair loop), then ONE two-phase
    pair count + TWO marginal counts + TWO int-keyed lookup_joins +
    a vectorized PPMI map, N one scalar. Host-id dictionary is
    model-sized (SURVEY §7.3 bound) exactly as in X172."""
    import ray

    from phrasekit_ray.stages.agg import grouped_count, lookup_join

    wt = q_random_walks(sf_dir)  # sorted by (start_host, step)
    n_steps = _WALK_STEPS + 1
    hosts = pc.unique(wt["start_host"]).to_pylist()  # ascending
    hid = {h: i for i, h in enumerate(hosts)}
    node = np.array([hid[h] for h in wt["host"].to_pylist()], np.int64)
    seq = node.reshape(-1, n_steps)
    walks = ray.data.from_arrow(
        pa.table(
            {
                "walk": pa.array(np.arange(seq.shape[0], dtype=np.int64)),
                "seq": pa.array(seq.tolist(), pa.list_(pa.int64())),
            }
        )
    )

    def emit_pairs(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(b["seq"]).to_numpy(zero_copy_only=False)
        m = flat.reshape(-1, n_steps)
        cs, xs = [], []
        for d in range(1, _PPMI_WINDOW + 1):
            a, bb = m[:, :-d].ravel(), m[:, d:].ravel()
            cs.append(a)
            xs.append(bb)
            cs.append(bb)
            xs.append(a)
        return pa.table(
            {
                "c": pa.array(np.concatenate(cs), pa.int64()),
                "x": pa.array(np.concatenate(xs), pa.int64()),
            }
        )

    stream = walks.map_batches(emit_pairs, batch_format="pyarrow").materialize()
    pair_c = grouped_count(stream, ["c", "x"], count_col="c_ab").materialize()
    n_total = int(pair_c.sum("c_ab") or 0)
    cm = grouped_count(
        stream.map_batches(
            lambda b: pa.table({"c": b["c"]}), batch_format="pyarrow"
        ),
        "c", count_col="c_c",
    )
    xm = grouped_count(
        stream.map_batches(
            lambda b: pa.table({"x": b["x"]}), batch_format="pyarrow"
        ),
        "x", count_col="c_x",
    )
    p_schema = pa.schema(
        [("c", pa.int64()), ("x", pa.int64()), ("c_ab", pa.int64())]
    )
    with_c = lookup_join(
        pair_c, cm, "c", "c",
        left_schema=p_schema,
        right_schema=pa.schema([("c", pa.int64()), ("c_c", pa.int64())]),
    )
    with_cx = lookup_join(
        with_c, xm, "x", "x",
        left_schema=pa.schema(
            [("c", pa.int64()), ("x", pa.int64()),
             ("c_ab", pa.int64()), ("c_c", pa.int64())]
        ),
        right_schema=pa.schema([("x", pa.int64()), ("c_x", pa.int64())]),
    )

    lnN = np.log(np.float64(max(n_total, 1)))

    def ppmi(b: pa.Table) -> pa.Table:
        cab = b["c_ab"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        cc = b["c_c"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        cx = b["c_x"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log(cab) + lnN - np.log(cc) - np.log(cx)
        term = pmi * 1e6
        micro = np.where(
            term >= 0, np.floor(term + 0.5), np.ceil(term - 0.5)
        ).astype(np.int64)
        return pa.table(
            {
                "c": b["c"],
                "x": b["x"],
                "c_ab": b["c_ab"].cast(pa.int64()),
                "ppmi_micro": pa.array(np.maximum(micro, 0), pa.int64()),
            }
        )

    t = _collect(with_cx.map_batches(ppmi, batch_format="pyarrow"))
    names = pa.array(hosts, pa.string())
    out = pa.table(
        {
            "center_host": names.take(t["c"].combine_chunks()),
            "context_host": names.take(t["x"].combine_chunks()),
            "c_ab": t["c_ab"].combine_chunks(),
            "ppmi_micro": t["ppmi_micro"].combine_chunks(),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[
                ("center_host", "ascending"),
                ("context_host", "ascending"),
            ],
        )
    )


def _sql_walk_ppmi() -> str:
    return f"""
WITH wt AS MATERIALIZED ({_sql_random_walks()}),
pr AS (SELECT a.host AS c, b.host AS x
       FROM wt a JOIN wt b ON b.start_host = a.start_host
        AND abs(a.step - b.step) BETWEEN 1 AND {_PPMI_WINDOW}),
pairs AS (SELECT c, x, CAST(count(*) AS BIGINT) AS c_ab
          FROM pr GROUP BY c, x),
cm AS (SELECT c, CAST(count(*) AS BIGINT) AS c_c FROM pr GROUP BY c),
xm AS (SELECT x, CAST(count(*) AS BIGINT) AS c_x FROM pr GROUP BY x),
tot AS (SELECT GREATEST(CAST(SUM(c_ab) AS BIGINT), 1) AS n FROM pairs),
v AS (SELECT p.c, p.x, p.c_ab,
        (ln(CAST(p.c_ab AS DOUBLE)) + ln(CAST(tot.n AS DOUBLE))
         - ln(CAST(cm.c_c AS DOUBLE)) - ln(CAST(xm.c_x AS DOUBLE))) AS pmi
      FROM pairs p JOIN cm ON cm.c = p.c JOIN xm ON xm.x = p.x, tot)
SELECT c AS center_host, x AS context_host, c_ab,
       CAST(GREATEST(CASE WHEN pmi >= 0 THEN floor(pmi * 1000000 + 0.5)
                          ELSE ceil(pmi * 1000000 - 0.5) END,
                     0) AS BIGINT) AS ppmi_micro
FROM v ORDER BY center_host, context_host"""


EXT_QUERIES.update({"q_walk_ppmi": q_walk_ppmi})
EXT_ORACLE_SQL.update({"q_walk_ppmi": _sql_walk_ppmi()})


def q_ccnet_buckets(sf_dir: str):
    """CCNet-style per-language perplexity-tercile partition (X182):
    each document scored by the corpus-trained unigram LM (X66's exact
    integer micro-nat NLL), then split head/middle/tail WITHIN its
    language by the exact per-lang NLL terciles — the canonical
    pretraining-corpus quality gate (Wenzek et al. 2020: keep the head,
    sample the middle, drop the tail). bucket 0 = head (lowest NLL).

    Scale shape (the reason this is threshold-based, not rank-based):
    thresholds come from X43's exact distributed ``grouped_quantiles_int``
    (shuffle moves (lang, nll) DISTINCT-VALUE counts, not docs), the
    2-per-lang threshold table is model-sized and broadcast, and bucket
    assignment is one vectorized compare per batch — no per-lang global
    sort of the corpus, no skew exposure on the 5-language key. The
    tercile q's are 1/3 and 2/3 as float64 (1.0/3.0 both sides) and the
    stage replicates DuckDB quantile_cont interpolation bit-for-bit, so
    the int64-vs-threshold compares are exact."""
    import ray

    from phrasekit_ray.stages.agg import grouped_quantiles_int, lookup_join
    from phrasekit_ray.stages.lm import unigram_nll_scores

    docs = _docs(sf_dir)
    nll = unigram_nll_scores(docs).materialize()
    lang = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    with_lang = lookup_join(nll, lang, "doc_id", "doc_id").materialize()

    th_t = _collect(
        grouped_quantiles_int(
            with_lang, "lang", "nll_micro",
            {"q33": 1.0 / 3.0, "q67": 2.0 / 3.0},
        )
    )
    q33 = dict(zip(th_t["lang"].to_pylist(), th_t["q33"].to_pylist()))
    q67 = dict(zip(th_t["lang"].to_pylist(), th_t["q67"].to_pylist()))

    def assign(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(b["lang"].combine_chunks())
        uniq = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        v = b["nll_micro"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = np.array([q33[l] for l in uniq], np.float64)[idx]
        hi = np.array([q67[l] for l in uniq], np.float64)[idx]
        vf = v.astype(np.float64)  # nll_micro << 2^53, exact
        bucket = np.where(vf <= lo, 0, np.where(vf <= hi, 1, 2))
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "lang": b["lang"],
                "nll_micro": b["nll_micro"].cast(pa.int64()),
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    t = _collect(with_lang.map_batches(assign, batch_format="pyarrow"))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


SQL_CCNET_BUCKETS = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok
        HAVING count(*) >= 2),
vocab AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok ASC LIMIT 1000000),
tot AS (SELECT CAST(sum(c) + count(*) AS DOUBLE) AS denom FROM vocab),
lp AS (SELECT t.doc_id,
         CAST(round(ln((COALESCE(v.c, 0) + 1.0) / tot.denom) * 1000000.0)
              AS BIGINT) AS lpm
       FROM toks t LEFT JOIN vocab v ON v.tok = t.tok CROSS JOIN tot),
nll AS (SELECT d.doc_id, d.lang, COALESCE(s.nll_micro, 0) AS nll_micro
        FROM documents d LEFT JOIN (
          SELECT doc_id, CAST(-sum(lpm) AS BIGINT) AS nll_micro
          FROM lp GROUP BY doc_id) s ON s.doc_id = d.doc_id),
th AS (SELECT lang,
         quantile_cont(CAST(nll_micro AS DOUBLE), 1.0/3.0) AS q33,
         quantile_cont(CAST(nll_micro AS DOUBLE), 2.0/3.0) AS q67
       FROM nll GROUP BY lang)
SELECT CAST(n.doc_id AS BIGINT) AS doc_id, n.lang, n.nll_micro,
       CAST(CASE WHEN CAST(n.nll_micro AS DOUBLE) <= th.q33 THEN 0
                 WHEN CAST(n.nll_micro AS DOUBLE) <= th.q67 THEN 1
                 ELSE 2 END AS BIGINT) AS bucket
FROM nll n JOIN th ON th.lang = n.lang
ORDER BY doc_id
"""


EXT_QUERIES.update({"q_ccnet_buckets": q_ccnet_buckets})
EXT_ORACLE_SQL.update({"q_ccnet_buckets": SQL_CCNET_BUCKETS})


def q_containment_pairs(sf_dir: str):
    """Directed shingle-containment join (X183): C(A→B) = |A∩B|/|A| ≥ 0.8
    over distinct 3-shingles — the quote / partial-duplication detector
    the symmetric Jaccard join (X4) misses (a paragraph pasted into a
    much larger page scores near-zero Jaccard but containment ≈ 1
    src→dst). Same inverted-index core as X4
    (stages/dedup._shingle_pair_with_sizes); exact integer
    cont_micro = 10⁶·|A∩B| // |A|."""
    from phrasekit_ray.pipelines.queries import tokenize_documents
    from phrasekit_ray.stages.dedup import containment_pairs

    docs = tokenize_documents(_docs(sf_dir))
    t = _collect(containment_pairs(docs, k=3, min_containment_micro=800_000))
    t = _i64(t, "src", "dst", "n_inter", "n_src", "cont_micro")
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("src", "ascending"), ("dst", "ascending")]
        )
    )


SQL_CONTAINMENT_PAIRS = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents),
sh AS (SELECT DISTINCT t0.doc_id,
         t0.tok || ' ' || t1.tok || ' ' || t2.tok AS shingle
       FROM toks t0
       JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
       JOIN toks t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS src, b.doc_id AS dst,
                 CAST(count(*) AS BIGINT) AS n_inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
          GROUP BY 1, 2)
SELECT i.src, i.dst, i.n_inter, CAST(s.n AS BIGINT) AS n_src,
       CAST(1000000 * i.n_inter // GREATEST(s.n, 1) AS BIGINT) AS cont_micro
FROM inter i JOIN sizes s ON s.doc_id = i.src
WHERE 1000000 * i.n_inter // GREATEST(s.n, 1) >= 800000
ORDER BY src, dst
"""


EXT_QUERIES.update({"q_containment_pairs": q_containment_pairs})
EXT_ORACLE_SQL.update({"q_containment_pairs": SQL_CONTAINMENT_PAIRS})


def q_prefix_jaccard_pairs(sf_dir: str):
    """Prefix-filtered exact set-similarity join (X184): the AllPairs /
    PPJoin-family scale path — each doc indexes only its rare-first
    (df asc, shingle asc) prefix of length n − ⌈θn⌉ + 1, candidates come
    from shared PREFIX shingles only, and two native hash joins verify
    the exact intersection. Provably lossless (prefix-filtering lemma),
    so the oracle is the SAME inverted-index SQL as the exact join X4 —
    the twin certifies zero lost pairs, not just plausibility
    (stages/dedup.prefix_filter_jaccard_pairs)."""
    from phrasekit_ray.pipelines.queries import tokenize_documents
    from phrasekit_ray.stages.dedup import prefix_filter_jaccard_pairs

    docs = tokenize_documents(_docs(sf_dir))
    t = _collect(prefix_filter_jaccard_pairs(docs, k=3, threshold=0.8))
    t = _i64(t, "left", "right")
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("left", "ascending"), ("right", "ascending")]
        )
    )


SQL_PREFIX_JACCARD_PAIRS = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents),
sh AS (SELECT DISTINCT t0.doc_id,
         t0.tok || ' ' || t1.tok || ' ' || t2.tok AS shingle
       FROM toks t0
       JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
       JOIN toks t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle
            AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT l AS "left", r AS "right",
       CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = inter.l
JOIN sizes sb ON sb.doc_id = inter.r
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
ORDER BY 1, 2
"""


EXT_QUERIES.update({"q_prefix_jaccard_pairs": q_prefix_jaccard_pairs})
EXT_ORACLE_SQL.update({"q_prefix_jaccard_pairs": SQL_PREFIX_JACCARD_PAIRS})


def q_mutual_nn(sf_dir: str):
    """Mutual-nearest-neighbor embedding alignment (X185, the
    bitext-mining / cross-crawl doc-alignment criterion of Artetxe &
    Schwenk 2019): split the embedding table by id parity (the
    two-snapshot stand-in), keep (a, b) pairs where b is a's best cosine
    match AND a is b's — ties to the smaller id; cos_micro in
    round-half-away int64 micro-units
    (stages/similarity.mutual_nn_pairs)."""
    from phrasekit_ray.pipelines.queries import _embeddings
    from phrasekit_ray.stages.similarity import mutual_nn_pairs

    return mutual_nn_pairs(_embeddings(sf_dir))


SQL_MUTUAL_NN = """
WITH a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE vec_id % 2 = 0),
b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id % 2 = 1),
ab AS (SELECT a.vec_id AS sa, b.vec_id AS sb,
              list_cosine_similarity(a.e, b.e) AS cos
       FROM a CROSS JOIN b),
best_ab AS (SELECT sa, sb, cos FROM (
  SELECT sa, sb, cos,
         row_number() OVER (PARTITION BY sa ORDER BY cos DESC, sb ASC) AS rn
  FROM ab) WHERE rn = 1),
best_ba AS (SELECT sa, sb FROM (
  SELECT sa, sb,
         row_number() OVER (PARTITION BY sb ORDER BY cos DESC, sa ASC) AS rn
  FROM ab) WHERE rn = 1)
SELECT x.sa AS src, x.sb AS dst,
       CAST(round(x.cos * 1000000.0) AS BIGINT) AS cos_micro
FROM best_ab x JOIN best_ba y ON y.sa = x.sa AND y.sb = x.sb
ORDER BY src
"""


EXT_QUERIES.update({"q_mutual_nn": q_mutual_nn})
EXT_ORACLE_SQL.update({"q_mutual_nn": SQL_MUTUAL_NN})


def q_alias_clusters(sf_dir: str):
    """Record-linkage merge/purge composite (X186, the Hernández–Stolfo
    pipeline shape end-to-end): distinct part-name tokens → edit-
    distance-≤1 fuzzy self-join (X78's SymSpell deletion-neighborhood
    blocking + exact verify) → distributed hash-min connected components
    (X21) → per-cluster canonical alias = the lexicographically smallest
    member. Ids come from the sorted X19 enumeration so component-min
    id IS the lexicographic-min token; every stage (pair generation, id
    mapping joins, label propagation, label→token joins) is distributed.
    Output: (alias, canon) for every token in a ≥2 cluster."""
    import ray

    from phrasekit_ray.stages.agg import grouped_count, join_partitions, lookup_join
    from phrasekit_ray.stages.dedup import fuzzy_token_pairs
    from phrasekit_ray.stages.kg import connected_components_distributed
    from phrasekit_ray.state.rowindex import with_row_index

    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["p_name"].combine_chunks(), " ")
        off = toks.offsets.to_numpy(zero_copy_only=False)
        return pa.table({"tok": toks.values.slice(off[0], int(off[-1] - off[0]))})

    toks = parts.map_batches(explode, batch_format="pyarrow")
    pairs = fuzzy_token_pairs(toks, min_len=3).materialize()

    def kept(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.greater_equal(pc.utf8_length(b["tok"].combine_chunks()), 3)
        )

    rank = with_row_index(
        grouped_count(toks.map_batches(kept, batch_format="pyarrow"), "tok")
        .map_batches(lambda b: b.select(["tok"]), batch_format="pyarrow")
        .sort("tok"),
        col="tid",
    ).map_batches(
        lambda b: pa.table(
            {"tok": b["tok"], "tid": b["tid"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    jp = join_partitions(8)
    rank2 = rank.map_batches(
        lambda b: pa.table({"tok2": b["tok"], "tid2": b["tid"]}),
        batch_format="pyarrow",
    )
    e1 = pairs.join(
        rank, join_type="inner", num_partitions=jp,
        on=("left_tok",), right_on=("tok",),
    )
    e2 = e1.join(
        rank2, join_type="inner", num_partitions=jp,
        on=("right_tok",), right_on=("tok2",),
    )
    edges = e2.map_batches(
        lambda b: pa.table({"src": b["tid"], "dst": b["tid2"]}),
        batch_format="pyarrow",
    )
    cc = connected_components_distributed(edges).materialize()

    alias_t = lookup_join(cc, rank.map_batches(
        lambda b: pa.table({"tid": b["tid"], "alias": b["tok"]}),
        batch_format="pyarrow",
    ), "node", "tid")
    canon_t = lookup_join(alias_t, rank.map_batches(
        lambda b: pa.table({"tid": b["tid"], "canon": b["tok"]}),
        batch_format="pyarrow",
    ), "label", "tid")
    t = _collect(
        canon_t.map_batches(
            lambda b: b.select(["alias", "canon"]), batch_format="pyarrow"
        )
    )
    return t.take(pc.sort_indices(t, sort_keys=[("alias", "ascending")]))


SQL_ALIAS_CLUSTERS = """
WITH RECURSIVE t AS (SELECT unnest(string_split(p_name, ' ')) AS tok
                     FROM part),
c AS (SELECT DISTINCT tok FROM t WHERE length(tok) >= 3),
e AS MATERIALIZED (SELECT a.tok AS u, b.tok AS v
  FROM c a JOIN c b
    ON a.tok < b.tok
   AND abs(length(a.tok) - length(b.tok)) <= 1
   AND levenshtein(a.tok, b.tok) <= 1),
ee AS (SELECT DISTINCT u, v FROM
  (SELECT u, v FROM e UNION ALL SELECT v, u FROM e)),
reach(a, b) AS (
  SELECT u, v FROM ee
  UNION
  SELECT r.a, ee.v FROM reach r JOIN ee ON r.b = ee.u)
SELECT a AS alias, least(a, min(b)) AS canon
FROM reach GROUP BY a ORDER BY alias
"""


EXT_QUERIES.update({"q_alias_clusters": q_alias_clusters})
EXT_ORACLE_SQL.update({"q_alias_clusters": SQL_ALIAS_CLUSTERS})


def q_winnow_fingerprints(sf_dir: str):
    """Winnowing fingerprint index (X187, Schleimer–Wilkerson–Aiken MOSS
    selector): per-doc sliding-window minimum of token-3-gram md5 hashes
    (window 4, ties to the rightmost) — position-aware fingerprints with
    the shared-substring guarantee (any common run of ≥ 6 tokens shares
    a fingerprint) that sampling-free MinHash can't give
    (stages/textstats.winnowed_fingerprints)."""
    from phrasekit_ray.stages.textstats import winnowed_fingerprints

    t = _collect(winnowed_fingerprints(_docs(sf_dir), k=3, window=4))
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("doc_id", "ascending"), ("pos", "ascending")]
        )
    )


SQL_WINNOW_FINGERPRINTS = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents),
kg AS (SELECT t0.doc_id, t0.pos,
              md5_number_upper(t0.tok || ' ' || t1.tok || ' ' || t2.tok) AS h
       FROM toks t0
       JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
       JOIN toks t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2),
m AS (SELECT doc_id, count(*) AS m FROM kg GROUP BY 1),
-- kg pos is contiguous 1..m, so window starts enumerate from kg itself
-- (DuckDB 1.0 generate_series rejects lateral column bounds)
starts AS (SELECT k.doc_id, k.pos AS s
           FROM kg k JOIN m ON m.doc_id = k.doc_id
           WHERE k.pos <= GREATEST(m.m - 3, 1)),
win AS (SELECT s.doc_id, s.s, k.pos, k.h
        FROM starts s JOIN kg k
          ON k.doc_id = s.doc_id AND k.pos BETWEEN s.s AND s.s + 3),
sel AS (SELECT doc_id, s, pos, h,
          row_number() OVER (PARTITION BY doc_id, s
                             ORDER BY h ASC, pos DESC) AS rn
        FROM win)
SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, CAST(pos AS BIGINT) AS pos,
       CAST(h % 4611686018427387904 AS BIGINT) AS h62
FROM sel WHERE rn = 1 ORDER BY doc_id, pos
"""


EXT_QUERIES.update({"q_winnow_fingerprints": q_winnow_fingerprints})
EXT_ORACLE_SQL.update({"q_winnow_fingerprints": SQL_WINNOW_FINGERPRINTS})


def q_syndication_matrix(sf_dir: str):
    """Cross-source syndication matrix (X188): the X183 directed
    containment join (C(A→B) = |A∩B|/|A| ≥ 0.8 over 3-shingles) lifted
    to source level — n_pairs of (contained doc, containing doc) per
    (src_source, dst_source) — the "who syndicates whom" flow a crawl
    curator reads before weighting sources. Two int-keyed lookup_joins
    attach each side's source, ONE two-phase pair count."""
    import ray

    from phrasekit_ray.pipelines.queries import tokenize_documents
    from phrasekit_ray.stages.agg import grouped_count, lookup_join
    from phrasekit_ray.stages.dedup import containment_pairs

    docs = tokenize_documents(_docs(sf_dir))
    pairs = containment_pairs(
        docs, k=3, min_containment_micro=800_000
    ).materialize()
    srcs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    a = lookup_join(
        pairs.map_batches(
            lambda b: b.select(["src", "dst"]), batch_format="pyarrow"
        ),
        srcs.map_batches(
            lambda b: pa.table(
                {"doc_id": b["doc_id"], "src_source": b["source"]}
            ),
            batch_format="pyarrow",
        ),
        "src",
        "doc_id",
    )
    b = lookup_join(
        a,
        srcs.map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "dst_source": t["source"]}
            ),
            batch_format="pyarrow",
        ),
        "dst",
        "doc_id",
    )
    t = _collect(
        grouped_count(
            b.map_batches(
                lambda x: x.select(["src_source", "dst_source"]),
                batch_format="pyarrow",
            ),
            ["src_source", "dst_source"],
            count_col="n_pairs",
        )
    )
    return t.take(
        pc.sort_indices(
            t,
            sort_keys=[
                ("src_source", "ascending"),
                ("dst_source", "ascending"),
            ],
        )
    )


SQL_SYNDICATION_MATRIX = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents),
sh AS (SELECT DISTINCT t0.doc_id,
         t0.tok || ' ' || t1.tok || ' ' || t2.tok AS shingle
       FROM toks t0
       JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
       JOIN toks t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS src, b.doc_id AS dst,
                 CAST(count(*) AS BIGINT) AS n_inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
          GROUP BY 1, 2),
cp AS (SELECT i.src, i.dst FROM inter i JOIN sizes s ON s.doc_id = i.src
       WHERE 1000000 * i.n_inter // GREATEST(s.n, 1) >= 800000)
SELECT da.source AS src_source, db.source AS dst_source,
       count(*) AS n_pairs
FROM cp JOIN documents da ON da.doc_id = cp.src
        JOIN documents db ON db.doc_id = cp.dst
GROUP BY 1, 2 ORDER BY 1, 2
"""


EXT_QUERIES.update({"q_syndication_matrix": q_syndication_matrix})
EXT_ORACLE_SQL.update({"q_syndication_matrix": SQL_SYNDICATION_MATRIX})


_BURST_DAY_US = 86_400_000_000


def q_event_bursts(sf_dir: str):
    """Per-type daily burst detection (X189): day buckets per event_type,
    trailing 7-CALENDAR-day baseline (RANGE frame, days can be sparse),
    burst when 7·cnt ≥ 3·trail7 with a warm baseline (trail7 > 0) — the
    integer-exact anomaly flag a crawl/event monitor runs. Daily counts
    are ONE two-phase distributed aggregate; the (type, day) table is
    calendar-bounded (days × types), so the trailing scan is one
    vectorized searchsorted pass over the collected counts — model-sized
    by construction, never corpus-sized."""
    import ray

    from phrasekit_ray.stages.agg import grouped_count

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def day_of(b: pa.Table) -> pa.Table:
        d = pc.divide(b["ts"].combine_chunks().cast(pa.int64()),
                      pa.scalar(_BURST_DAY_US, pa.int64()))
        return pa.table({"event_type": b["event_type"], "day": d})

    counts = _collect(
        grouped_count(
            ev.map_batches(day_of, batch_format="pyarrow"),
            ["event_type", "day"],
            count_col="cnt",
        )
    )
    et = np.asarray(counts["event_type"].to_pylist(), dtype=object)
    day = counts["day"].to_numpy()
    cnt = counts["cnt"].to_numpy().astype(np.int64)
    order = np.lexsort((day, et))
    et, day, cnt = et[order], day[order], cnt[order]
    trail = np.zeros(len(et), np.int64)
    starts = np.flatnonzero(
        np.concatenate(([True], et[1:] != et[:-1]))
    )
    bounds = np.concatenate((starts, [len(et)]))
    for a, b in zip(bounds[:-1], bounds[1:]):  # one slice per TYPE (bounded)
        d, c = day[a:b], cnt[a:b]
        csum = np.concatenate(([0], np.cumsum(c)))
        lo = np.searchsorted(d, d - 7, side="left")
        hi = np.searchsorted(d, d - 1, side="right")
        trail[a:b] = csum[hi] - csum[lo]
    burst = (trail > 0) & (7 * cnt >= 3 * trail)
    return pa.table(
        {
            "event_type": pa.array(list(et), pa.string()),
            "day": pa.array(day, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "trail7": pa.array(trail, pa.int64()),
            "is_burst": pa.array(burst.astype(np.int64), pa.int64()),
        }
    )


SQL_EVENT_BURSTS = """
WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day
           FROM events),
c AS (SELECT event_type, day, count(*) AS cnt FROM d GROUP BY 1, 2),
w AS (SELECT event_type, day, cnt,
        CAST(COALESCE(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
          RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS trail7
      FROM c)
SELECT event_type, CAST(day AS BIGINT) AS day, CAST(cnt AS BIGINT) AS cnt,
       trail7,
       CAST(CASE WHEN trail7 > 0 AND 7 * cnt >= 3 * trail7
                 THEN 1 ELSE 0 END AS BIGINT) AS is_burst
FROM w ORDER BY event_type, day
"""


EXT_QUERIES.update({"q_event_bursts": q_event_bursts})
EXT_ORACLE_SQL.update({"q_event_bursts": SQL_EVENT_BURSTS})


def q_source_top_bigrams(sf_dir: str):
    """Per-source top-5 bigrams (X190): the boilerplate-phrase scan a
    curator runs per host/source — ONE vectorized bigram explode, ONE
    two-phase (source, bigram) count, then the lossless two-phase
    grouped top-k primitive (X177's grouped_topk: per-block partial
    top-k, only survivors shuffle) under the total order
    (count desc, bigram asc)."""
    import ray

    from phrasekit_ray.stages.agg import grouped_count, grouped_topk

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(off[-1]))
        n = int(off[-1])
        if n < 2:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bigram": pa.array([], pa.string()),
                }
            )
        sizes = np.diff(off)
        doc_index = np.repeat(np.arange(len(sizes)), sizes)
        keep = doc_index[: n - 1] == doc_index[1:]
        w1 = flat.slice(0, n - 1).filter(pa.array(keep))
        w2 = flat.slice(1, n - 1).filter(pa.array(keep))
        src = b["source"].combine_chunks().take(
            pa.array(doc_index[: n - 1][keep])
        )
        return pa.table(
            {
                "source": src,
                "bigram": pc.binary_join_element_wise(w1, w2, " "),
            }
        )

    counts = grouped_count(
        docs.map_batches(explode, batch_format="pyarrow"),
        ["source", "bigram"],
    )
    t = _collect(
        grouped_topk(
            counts,
            "source",
            [("count", "descending"), ("bigram", "ascending")],
            k=5,
        )
    )
    t = _i64(t, "count")
    return t.take(
        pc.sort_indices(
            t,
            sort_keys=[
                ("source", "ascending"),
                ("count", "descending"),
                ("bigram", "ascending"),
            ],
        )
    )


SQL_SOURCE_TOP_BIGRAMS = """
WITH toks AS (SELECT doc_id, source,
                     unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents),
bg AS (SELECT t0.source, t0.tok || ' ' || t1.tok AS bigram
       FROM toks t0
       JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1),
c AS (SELECT source, bigram, count(*) AS count FROM bg GROUP BY 1, 2)
SELECT source, bigram, CAST(count AS BIGINT) AS count
FROM c
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY count DESC, bigram ASC) <= 5
ORDER BY source, count DESC, bigram
"""


EXT_QUERIES.update({"q_source_top_bigrams": q_source_top_bigrams})
EXT_ORACLE_SQL.update({"q_source_top_bigrams": SQL_SOURCE_TOP_BIGRAMS})


def q_incremental_dedup_index(sf_dir: str):
    """Persistent incremental MinHash-index maintenance (X191): docs
    split by id parity into two 'crawl snapshots', each appended to an
    on-disk LSH band-row index (resumable lineage writer, parameter-
    fingerprint-gated); candidate pairs come from the STORED rows of
    both snapshots. Rows-only for the driver, with the invariant
    IN-BAND (the r3 item-6 pattern): ``invariant_mismatches`` counts
    the symmetric difference vs a full one-shot recompute over the
    union corpus — 0 by construction (same band-row multiset ⇒
    byte-identical pairs)."""
    import shutil
    import tempfile

    from phrasekit_ray.pipelines.queries import tokenize_documents
    from phrasekit_ray.stages.dedup import (
        index_candidate_pairs,
        minhash_candidate_pairs,
        write_minhash_index,
    )

    docs = tokenize_documents(_docs(sf_dir)).materialize()

    def half(parity: int):
        return docs.map_batches(
            lambda b, p=parity: b.filter(
                pc.equal(
                    pc.bit_wise_and(b["doc_id"].combine_chunks().cast(pa.int64()),
                                    pa.scalar(1, pa.int64())),
                    pa.scalar(p, pa.int64()),
                )
            ),
            batch_format="pyarrow",
        )

    idx = tempfile.mkdtemp(prefix="pk_mh_index_", dir="/tmp")
    try:
        write_minhash_index(half(0), idx, "snap_even")
        write_minhash_index(half(1), idx, "snap_odd")
        inc = sorted(
            (r["left"], r["right"])
            for r in index_candidate_pairs(idx).take_all()
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    full = sorted(
        (r["left"], r["right"])
        for r in minhash_candidate_pairs(docs).take_all()
    )
    mismatches = len(set(inc) ^ set(full))
    return pa.table(
        {
            "left": pa.array([p[0] for p in inc], pa.int64()),
            "right": pa.array([p[1] for p in inc], pa.int64()),
            "invariant_mismatches": pa.array(
                [mismatches] * len(inc), pa.int64()
            ),
        }
    )


EXT_QUERIES.update({"q_incremental_dedup_index": q_incremental_dedup_index})


def q_phrase_context_entropy(sf_dir: str):
    """Phrase-context (branching) entropy termhood (X192) — the classic
    accessor-variety signal the miner's raw counts miss: a true phrase
    occurs in MANY left/right contexts (high entropy), a fragment of a
    longer template in few. For the top-20 corpus bigrams by (count
    desc, bigram asc): distinct left/right context types and the exact
    integer-micro-nat context entropies, doc-boundary contexts as
    '<s>'/'</s>' sentinels.

    Exactness (the X168 ln protocol): per (bigram, ctx) the term
    round((ln N − ln c)·c·10⁶) is an integer function of two
    integer-valued doubles with identical expression order both sides;
    terms SUM as int64 (order-free) and H_micro = Σterm // N. Scale
    shape: one context-explode pass filtered by the broadcast top-20
    set, ONE two-phase (bigram, side, ctx) count, per-block partial
    top-20 + one bounded merge for the target set — never a full-vocab
    sort."""
    import ray

    from phrasekit_ray.stages.agg import grouped_count, hash_aggregate

    docs = _docs(sf_dir)

    def bigram_counts(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(off[-1]))
        n = int(off[-1])
        if n < 2:
            return pa.table({"bigram": pa.array([], pa.string())})
        sizes = np.diff(off)
        di = np.repeat(np.arange(len(sizes)), sizes)
        keep = di[: n - 1] == di[1:]
        w1 = flat.slice(0, n - 1).filter(pa.array(keep))
        w2 = flat.slice(1, n - 1).filter(pa.array(keep))
        return pa.table({"bigram": pc.binary_join_element_wise(w1, w2, " ")})

    counts = grouped_count(
        docs.map_batches(bigram_counts, batch_format="pyarrow"), "bigram"
    )

    def local_top(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b,
            sort_keys=[("count", "descending"), ("bigram", "ascending")],
        )
        return b.take(idx[: min(20, b.num_rows)])

    cand = _collect(counts.map_batches(local_top, batch_format="pyarrow"))
    cand = cand.take(
        pc.sort_indices(
            cand,
            sort_keys=[("count", "descending"), ("bigram", "ascending")],
        )
    )[:20] if cand.num_rows else cand
    cand = cand.slice(0, min(20, cand.num_rows))
    top = dict(zip(cand["bigram"].to_pylist(),
                   [int(c) for c in cand["count"].to_pylist()]))
    top_arr = pa.array(sorted(top), pa.string())
    top_ref = ray.put(top_arr)

    def contexts(b: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        tset = _get_broadcast(top_ref)
        toks = pc.split_pattern(b["text"].combine_chunks(), " ")
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = offsets - offsets[0]
        flat = toks.values.slice(offsets[0], int(off[-1]))
        n = int(off[-1])
        empty = pa.table(
            {
                "bigram": pa.array([], pa.string()),
                "side": pa.array([], pa.string()),
                "ctx": pa.array([], pa.string()),
            }
        )
        if n < 2:
            return empty
        sizes = np.diff(off)
        di = np.repeat(np.arange(len(sizes)), sizes)
        m = n - 1
        valid = di[:m] == di[1:]
        bg = pc.binary_join_element_wise(
            flat.slice(0, m), flat.slice(1, m), " "
        )
        hit = pc.is_in(bg, value_set=tset).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(valid & hit)
        if not len(sel):
            return empty
        bg_sel = bg.take(pa.array(sel))
        bounds = np.concatenate(([0], np.cumsum(sizes)))
        doc_of = di[sel]
        # vectorized sentinel-padded context gather: clamp the index for
        # the take, then if_else the boundary rows to the sentinel
        lpos = sel - 1
        l_ok = lpos >= bounds[:-1][doc_of]
        lctx = pc.if_else(
            pa.array(l_ok),
            flat.take(pa.array(np.where(l_ok, lpos, 0))),
            pa.scalar("<s>"),
        )
        rpos = sel + 2
        r_ok = rpos < bounds[1:][doc_of]
        rctx = pc.if_else(
            pa.array(r_ok),
            flat.take(pa.array(np.where(r_ok, rpos, 0))),
            pa.scalar("</s>"),
        )
        k = len(sel)
        return pa.table(
            {
                "bigram": pa.chunked_array([bg_sel, bg_sel]).combine_chunks(),
                "side": pa.array(["L"] * k + ["R"] * k, pa.string()),
                "ctx": pa.chunked_array([lctx, rctx]).combine_chunks(),
            }
        )

    ctx_counts = grouped_count(
        docs.map_batches(contexts, batch_format="pyarrow"),
        ["bigram", "side", "ctx"],
        count_col="c",
    )
    top_counts_ref = ray.put(top)

    def terms(b: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        tmap = _get_broadcast(top_counts_ref)
        enc = pc.dictionary_encode(b["bigram"].combine_chunks())
        tc = np.array(
            [tmap[s] for s in enc.dictionary.to_pylist()], np.float64
        )[enc.indices.to_numpy(zero_copy_only=False)] if b.num_rows else np.zeros(0)
        cv = b["c"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        term = (np.log(tc) - np.log(cv)) * cv * 1e6
        term_i = np.where(
            term >= 0, np.floor(term + 0.5), np.ceil(term - 0.5)
        ).astype(np.int64)
        return pa.table(
            {
                "bigram": b["bigram"],
                "side": b["side"],
                "term": pa.array(term_i, pa.int64()),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    # distributed per-(bigram, side) reduce: only 40 rows reach the driver
    agg = _collect(
        hash_aggregate(
            ctx_counts.map_batches(terms, batch_format="pyarrow"),
            ["bigram", "side"],
            [("term", "sum"), ("one", "sum")],
        )
    )
    out = {}
    for b2, s2, tsum, ntypes in zip(
        agg["bigram"].to_pylist(),
        agg["side"].to_pylist(),
        agg["term"].to_pylist(),
        agg["one"].to_pylist(),
    ):
        out.setdefault(b2, {"L": [0, 0], "R": [0, 0]})[s2] = [
            int(tsum), int(ntypes)
        ]
    rows = []
    for b2, cnt2 in sorted(top.items(), key=lambda kv: (-kv[1], kv[0])):
        d = out.get(b2, {"L": [0, 0], "R": [0, 0]})
        rows.append(
            (
                b2,
                cnt2,
                d["L"][1],
                d["R"][1],
                d["L"][0] // cnt2,
                d["R"][0] // cnt2,
            )
        )
    return pa.table(
        {
            "bigram": pa.array([r[0] for r in rows], pa.string()),
            "count": pa.array([r[1] for r in rows], pa.int64()),
            "n_left_types": pa.array([r[2] for r in rows], pa.int64()),
            "n_right_types": pa.array([r[3] for r in rows], pa.int64()),
            "h_left_micro": pa.array([r[4] for r in rows], pa.int64()),
            "h_right_micro": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


SQL_PHRASE_CONTEXT_ENTROPY = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents),
bg AS (SELECT t0.doc_id, t0.pos, t0.tok || ' ' || t1.tok AS bigram
       FROM toks t0
       JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1),
top AS MATERIALIZED (SELECT bigram, CAST(count(*) AS BIGINT) AS tc
       FROM bg GROUP BY 1 ORDER BY tc DESC, bigram ASC LIMIT 20),
occ AS (SELECT b.doc_id, b.pos, b.bigram, t.tc
        FROM bg b JOIN top t USING (bigram)),
ctxs AS (
  SELECT o.bigram, o.tc, 'L' AS side, COALESCE(l.tok, '<s>') AS ctx
  FROM occ o LEFT JOIN toks l
    ON l.doc_id = o.doc_id AND l.pos = o.pos - 1
  UNION ALL
  SELECT o.bigram, o.tc, 'R' AS side, COALESCE(r.tok, '</s>') AS ctx
  FROM occ o LEFT JOIN toks r
    ON r.doc_id = o.doc_id AND r.pos = o.pos + 2),
cc AS (SELECT bigram, tc, side, ctx, CAST(count(*) AS BIGINT) AS c
       FROM ctxs GROUP BY 1, 2, 3, 4),
terms AS (SELECT bigram, tc, side,
            CAST(round((ln(CAST(tc AS DOUBLE)) - ln(CAST(c AS DOUBLE)))
                       * c * 1000000.0) AS BIGINT) AS term,
            1 AS one
          FROM cc),
agg AS (SELECT bigram, tc,
          CAST(SUM(CASE WHEN side = 'L' THEN one ELSE 0 END) AS BIGINT)
            AS n_left_types,
          CAST(SUM(CASE WHEN side = 'R' THEN one ELSE 0 END) AS BIGINT)
            AS n_right_types,
          CAST(SUM(CASE WHEN side = 'L' THEN term ELSE 0 END) // tc
            AS BIGINT) AS h_left_micro,
          CAST(SUM(CASE WHEN side = 'R' THEN term ELSE 0 END) // tc
            AS BIGINT) AS h_right_micro
        FROM terms GROUP BY 1, 2)
SELECT bigram, tc AS count, n_left_types, n_right_types,
       h_left_micro, h_right_micro
FROM agg ORDER BY count DESC, bigram ASC
"""


EXT_QUERIES.update({"q_phrase_context_entropy": q_phrase_context_entropy})
EXT_ORACLE_SQL.update({"q_phrase_context_entropy": SQL_PHRASE_CONTEXT_ENTROPY})


def q_tag_vote(sf_dir: str):
    """Weak-supervision majority-vote label resolution (X193, the
    Snorkel ensemble shape over the engine's OWN labeling functions):
    the three overlap-resolution policies (leftmost_longest,
    leftmost_first, salience_max) act as three LFs emitting spans from
    the same artifact; a span survives when ≥2 LFs agree on the exact
    (doc, start, end, phrase). On a bigram artifact leftmost_longest ==
    leftmost_first, so the vote separates greedy-consensus spans
    (n_votes 2) from full-agreement spans salience_max also keeps
    (n_votes 3) — the confidence tier a downstream weak-supervision
    trainer weights by. Reuses the tagged per-policy span table and the
    policy SQL twin verbatim; the vote is one grouped count."""
    from phrasekit_ray.pipelines.queries import QUERIES as _Q

    t = _Q["q_tag_policies"](sf_dir)
    lf = t.filter(pc.not_equal(t["policy"], "all"))
    g = lf.group_by(["doc_id", "start", "end", "phrase_id"]).aggregate(
        [("policy", "count")]
    ).rename_columns(["doc_id", "start", "end", "phrase_id", "n_votes"])
    g = g.filter(pc.greater_equal(g["n_votes"], 2))
    g = _i64(g, "doc_id", "start", "end", "phrase_id", "n_votes")
    return g.take(
        pc.sort_indices(
            g,
            sort_keys=[
                ("doc_id", "ascending"),
                ("start", "ascending"),
                ("end", "ascending"),
            ],
        )
    )


def _sql_tag_vote() -> str:
    from phrasekit_ray.pipelines.queries import _sql_tag_policies

    return f"""
WITH base AS MATERIALIZED (
{_sql_tag_policies()}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(start AS BIGINT) AS start,
       CAST("end" AS BIGINT) AS "end", CAST(phrase_id AS BIGINT) AS phrase_id,
       count(*) AS n_votes
FROM base WHERE policy <> 'all'
GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2
ORDER BY doc_id, start, "end"
"""


EXT_QUERIES.update({"q_tag_vote": q_tag_vote})
EXT_ORACLE_SQL.update({"q_tag_vote": _sql_tag_vote()})


def q_compact_snapshots(sf_dir: str):
    """Zonemap compaction (X194): documents split by doc_id parity into
    two OVERLAPPING zonemapped snapshot layouts by n_chars (each sorted
    internally — the shape successive crawl appends leave), compacted
    into one layout (state/lineage.compact_zonemapped), then the X144
    [200, 400] range read runs against the COMPACTED layout. The SQL
    twin is the plain BETWEEN over the source table, so hash equality
    certifies union + merge + zone-pruned read end to end; the pruning
    improvement itself (scanned_after <= sum of per-snapshot scans) is
    pinned in pytest on the real manifests."""
    import tempfile

    import ray

    from phrasekit_ray.state.lineage import (
        compact_zonemapped,
        read_zonemapped,
        write_zonemapped,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def parity(p: int):
        return docs.map_batches(
            lambda b, pp=p: b.filter(
                pc.equal(
                    pc.bit_wise_and(
                        b["doc_id"].combine_chunks().cast(pa.int64()),
                        pa.scalar(1, pa.int64()),
                    ),
                    pa.scalar(pp, pa.int64()),
                )
            ),
            batch_format="pyarrow",
        )

    with tempfile.TemporaryDirectory(prefix="compact_") as root:
        write_zonemapped(parity(0), root, "snap_even", "n_chars", 8,
                         config_desc=sf_dir)
        write_zonemapped(parity(1), root, "snap_odd", "n_chars", 8,
                         config_desc=sf_dir)
        compact_zonemapped(root, ["snap_even", "snap_odd"],
                           "compacted", "n_chars", 16)
        out, _scanned, _total = read_zonemapped(
            root, "compacted", "n_chars", 200, 400
        )
        t = _collect(out.map_batches(
            lambda b: b.select(["doc_id", "n_chars"]),
            batch_format="pyarrow",
        ))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


SQL_COMPACT_SNAPSHOTS = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM documents WHERE n_chars BETWEEN 200 AND 400 ORDER BY doc_id
"""


EXT_QUERIES.update({"q_compact_snapshots": q_compact_snapshots})
EXT_ORACLE_SQL.update({"q_compact_snapshots": SQL_COMPACT_SNAPSHOTS})


def q_kg_trust(sf_dir: str):
    """Provenance-trust-weighted KG edges (X195, the TrustRank-shaped
    composition the north star's entity-link scoring feeds on): each
    assertion of a distinct (subj, obj) edge contributes its asserting
    page's HOST authority — the exact-integer Katz centrality (X156)
    of '{source}.example.org' over the synthesized host link graph —
    so an edge asserted once by a well-linked hub can outrank one
    spammed from link-isolated hosts. Hosts absent from the link graph
    contribute Katz's base score 10⁶ (every node's floor), mirrored by
    COALESCE in the twin. One vectorized source-extract + broadcast
    host-score map + ONE two-phase (subj, obj) sum — the host table is
    model-sized, the triple stream never collects."""
    import ray

    from phrasekit_ray.stages.agg import hash_aggregate

    triples = _flagship_triples(sf_dir)
    kt = q_katz_hosts(sf_dir)
    scores = dict(
        zip(kt["host"].to_pylist(),
            [int(v) for v in kt["katz_micro"].to_pylist()])
    )
    ref = ray.put(scores)

    def weigh(b: pa.Table) -> pa.Table:
        from phrasekit_ray.stages.score import _get_broadcast

        smap = _get_broadcast(ref)
        src = pc.replace_substring_regex(
            pc.replace_substring_regex(
                b["doc_id"].combine_chunks().cast(pa.string()),
                r"/[^/]*$", "",
            ),
            r"^.*/", "",
        )
        enc = pc.dictionary_encode(src)
        uniq = [
            smap.get(f"{s}.example.org", 10**6)
            for s in enc.dictionary.to_pylist()
        ]
        w = np.asarray(uniq, np.int64)[
            enc.indices.to_numpy(zero_copy_only=False)
        ] if b.num_rows else np.zeros(0, np.int64)
        return pa.table(
            {
                "subj": b["subj"].combine_chunks().cast(pa.int64()),
                "obj": b["obj"].combine_chunks().cast(pa.int64()),
                "trust_micro": pa.array(w, pa.int64()),
                "n_assert": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        triples.map_batches(weigh, batch_format="pyarrow"),
        ["subj", "obj"],
        [("trust_micro", "sum"), ("n_assert", "sum")],
    )
    t = _i64(_collect(agg), "subj", "obj", "trust_micro", "n_assert")
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("subj", "ascending"), ("obj", "ascending")]
        )
    )


def _sql_kg_trust() -> str:
    from phrasekit_ray.pipelines.queries import _sql_flagship

    return f"""
WITH trip AS MATERIALIZED ({_sql_flagship()}),
katz AS MATERIALIZED ({_sql_katz_hosts(4, 10**6, 1, 5)})
SELECT t.subj, t.obj,
       CAST(SUM(COALESCE(k.katz_micro, 1000000)) AS BIGINT) AS trust_micro,
       count(*) AS n_assert
FROM trip t
LEFT JOIN katz k
  ON k.host = regexp_extract(t.doc_id, '/([^/]+)/[^/]+$', 1)
              || '.example.org'
GROUP BY 1, 2 ORDER BY subj, obj
"""


EXT_QUERIES.update({"q_kg_trust": q_kg_trust})
EXT_ORACLE_SQL.update({"q_kg_trust": _sql_kg_trust()})
