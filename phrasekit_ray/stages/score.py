"""Score stage: salience of domain n-grams vs a background corpus.

Reference analog: phrasekit_score.rs — both corpora fully loaded into
HashMaps, a left lookup (missing background ⇒ 0), per-phrase salience,
filters, sort desc, sequential phrase_id assignment (SURVEY.md J1, F1-F3,
F6, O2-O3).

Ray-native shape: the background table is the SMALL side (a phrase list,
not a corpus) — it is collected to a dict once, `ray.put` into the object
store, and read zero-copy-ish inside every scoring batch (broadcast join;
no shuffle). The domain side streams. Global totals for PMI/TF-IDF are two
scalar Dataset aggregates broadcast as plain numbers. The salience sort is
the one range-partition shuffle; phrase_id enumeration rides on it via
``state.rowindex.with_row_index``.

f32 parity: salience math and the min_salience comparison run in float32
exactly as the reference does (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from phrasekit_ray.config import ScoreConfig
from phrasekit_ray.core import salience as saliencemod
from phrasekit_ray.state.rowindex import with_row_index

# Per-worker-process cache of broadcast objects: `ray.get` of the same
# ref re-deserializes a Python object on every call, so the first batch
# in each worker pays it once and later batches hit this cache. Several
# refs can be live at once in one worker (e.g. ivf_topk fetches
# centroids + queries + probe lists per batch; fused pipelines may
# interleave two stages' broadcasts), so this is a small FIFO of refs,
# NOT a single slot — a single slot would thrash and re-deserialize a
# multi-hundred-MB object on every batch.
_BG_CACHE: dict[str, object] = {}
_BG_CACHE_SLOTS = 8


def _get_broadcast(ref):
    import ray

    key = ref.hex()
    hit = _BG_CACHE.get(key)
    if hit is None:
        while len(_BG_CACHE) >= _BG_CACHE_SLOTS:
            _BG_CACHE.pop(next(iter(_BG_CACHE)))
        hit = _BG_CACHE[key] = ray.get(ref)
    return hit


def _empty_scored_table() -> pa.Table:
    return pa.table(
        {
            "ngram": pa.array([], pa.string()),
            "salience": pa.array([], pa.float32()),
            "domain_count": pa.array([], pa.uint32()),
            "background_count": pa.array([], pa.uint32()),
        }
    )


def _finalize_scored(scored, config: ScoreConfig, driver_finalize_threshold: int):
    """Sort desc (salience, ngram asc tiebreak) + sequential phrase_id.

    The scored-phrase table is normally model-sized (10K–1M rows per
    reference docs/BUILDER.md:136-142) regardless of corpus size, so the
    default finalize STREAMS batches to the driver and abandons collection
    the moment the running row count exceeds ``driver_finalize_threshold``
    — driver memory is bounded by the threshold, never by the dataset.
    Above the threshold it falls back to the distributed sort +
    block-offset enumeration path (which re-executes the lazy pipeline;
    that trade is intentional — no mid-pipeline materialize barrier on the
    common small path).
    """
    import ray

    tables: list[pa.Table] | None = []
    n_rows = 0
    for t in scored.iter_batches(batch_format="pyarrow"):
        tables.append(t)
        n_rows += t.num_rows
        if n_rows > driver_finalize_threshold:
            tables = None  # release collected batches; take the scale path
            break
    if tables is not None:
        tbl = (
            pa.concat_tables(tables, promote_options="default")
            if tables
            else _empty_scored_table()
        )
        tbl = tbl.sort_by([("salience", "descending"), ("ngram", "ascending")])
        if config.assign_phrase_ids:
            ids = np.arange(
                config.starting_phrase_id,
                config.starting_phrase_id + tbl.num_rows,
                dtype=np.uint32,
            )
            tbl = tbl.append_column("phrase_id", pa.array(ids, pa.uint32()))
        return ray.data.from_arrow(tbl)
    scored = scored.sort(["salience", "ngram"], descending=[True, False])
    if config.assign_phrase_ids:
        scored = with_row_index(scored, col="phrase_id", start=config.starting_phrase_id)
    return scored


def background_to_dict(background) -> dict[str, int]:
    """Accept a Dataset / pyarrow Table / mapping / iterable of
    (ngram, count) or reference-style {tokens, count} rows; lowercase keys;
    duplicate keys last-wins (reference phrasekit_score.rs:160-161)."""
    if isinstance(background, Mapping):
        items = background.items()
    elif isinstance(background, pa.Table):
        items = zip(
            background["ngram"].to_pylist(), background["count"].to_pylist()
        )
    elif hasattr(background, "iter_batches"):  # ray Dataset
        out: dict[str, int] = {}
        for b in background.iter_batches(batch_format="pyarrow"):
            for ng, c in zip(b["ngram"].to_pylist(), b["count"].to_pylist()):
                out[" ".join(ng.split()).lower()] = int(c)
        return out
    else:
        items = (
            (
                " ".join(r["tokens"]) if isinstance(r, dict) else r[0],
                r["count"] if isinstance(r, dict) else r[1],
            )
            for r in background
        )
    return {str(k).lower(): int(v) for k, v in items}


def score_ngrams(
    domain_ds,
    background,
    config: ScoreConfig | None = None,
    total_domain: int | None = None,
    driver_finalize_threshold: int = 2_000_000,
    **map_kwargs,
):
    """Dataset(ngram, count) → sorted Dataset(ngram, salience, [phrase_id],
    domain_count, background_count).

    ``total_domain`` may be passed to skip the extra aggregate pass when
    the caller already knows it (e.g. from mine stats). Totals are over ALL
    domain/background phrases BEFORE the min_domain_count filter, as in the
    reference (phrasekit_score.rs:179-181).
    """
    import ray

    config = config or ScoreConfig()
    bg = background_to_dict(background)
    total_background = sum(bg.values())
    if total_domain is None:
        if config.method == "ratio":
            # ratio = d/(b+1) uses no corpus totals (phrasekit_score.rs:
            # 227-229) — skip the extra full-pipeline aggregate pass
            total_domain = 0
        else:
            total_domain = int(domain_ds.sum("count") or 0)
    bg_ref = ray.put(bg)

    method = config.method
    min_domain = np.uint64(config.min_domain_count)
    min_sal = np.float32(config.min_salience)

    def score_batch(batch: pa.Table) -> pa.Table:
        bg_map = _get_broadcast(bg_ref)
        counts = batch["count"].to_numpy().astype(np.uint64)
        keep = counts >= min_domain
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "ngram": pa.array([], pa.string()),
                    "salience": pa.array([], pa.float32()),
                    "domain_count": pa.array([], pa.uint32()),
                    "background_count": pa.array([], pa.uint32()),
                }
            )
        d = batch["count"].to_numpy().astype(np.uint64)
        ngrams = batch["ngram"].to_pylist()
        # the bg dict's keys are lowercased (reference load_phrases
        # lowercases BOTH sides, phrasekit_score.rs:158-160) — probe the
        # lowercased key ONLY, so a caller dict carrying both casings
        # reads the normalized entry, matching the reference. The mining
        # path already emits lowercase n-grams, so detect cased input
        # once per batch (one vectorized kernel) instead of paying a
        # per-miss Python fallback in the hot loop.
        ng_col = batch["ngram"]
        already_lower = pc.all(
            pc.equal(pc.utf8_lower(ng_col), ng_col)
        ).as_py()
        keys = ngrams if already_lower else [s.lower() for s in ngrams]
        b = np.fromiter(
            (bg_map.get(k, 0) for k in keys),
            dtype=np.uint64,
            count=len(keys),
        )
        sal = saliencemod.compute_salience(method, d, b, total_domain, total_background)
        keep2 = sal >= min_sal
        return pa.table(
            {
                "ngram": pa.array(ngrams, pa.string()),
                "salience": pa.array(sal, pa.float32()),
                "domain_count": pa.array(d.astype(np.uint32), pa.uint32()),
                "background_count": pa.array(b.astype(np.uint32), pa.uint32()),
            }
        ).filter(pa.array(keep2))

    scored = domain_ds.map_batches(score_batch, batch_format="pyarrow", **map_kwargs)
    # deterministic total order where the reference is tie-nondeterministic
    # (SURVEY.md O2): salience desc, ngram asc.
    return _finalize_scored(scored, config, driver_finalize_threshold)


def score_stats(
    domain_ds,
    background,
    config: ScoreConfig | None = None,
    total_domain: int | None = None,
) -> dict:
    """Scoring statistics (reference phrasekit_score.rs:56-62,172-210 /
    SURVEY.md A5): domain/background phrase counts and survivors after
    each filter, computed in ONE distributed pass (per-batch partial
    counters summed by Dataset aggregates — no second scoring run)."""
    import ray

    config = config or ScoreConfig()
    bg = background_to_dict(background)
    total_background = sum(bg.values())
    if total_domain is None:
        if config.method == "ratio":
            total_domain = 0
        else:
            total_domain = int(domain_ds.sum("count") or 0)
    bg_ref = ray.put(bg)
    method = config.method
    min_domain = np.uint64(config.min_domain_count)
    min_sal = np.float32(config.min_salience)

    def partial(batch: pa.Table) -> pa.Table:
        bg_map = _get_broadcast(bg_ref)
        d = batch["count"].to_numpy().astype(np.uint64)
        keep = d >= min_domain
        ngrams = batch["ngram"].to_pylist()
        # the bg dict's keys are lowercase+whitespace-normalized
        # (reference load_phrases lowercases BOTH sides,
        # phrasekit_score.rs:158-160). Same shape as the main scoring
        # path (score_batch above): detect non-normalized input ONCE per
        # batch with vectorized kernels and probe the normalized key
        # only — no per-miss double probe in the per-row loop.
        ng_col = batch["ngram"]
        norm_col = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(ng_col), pattern=r"\s+", replacement=" "
            )
        )
        already_norm = pc.all(pc.equal(norm_col, ng_col)).as_py()
        keys = (
            ngrams
            if already_norm
            else [" ".join(s.split()).lower() for s in ngrams]
        )
        b = np.fromiter(
            (bg_map.get(k, 0) for k in keys),
            dtype=np.uint64,
            count=len(keys),
        )
        sal = saliencemod.compute_salience(
            method, d[keep], b[keep], total_domain, total_background
        )
        return pa.table(
            {
                "domain_phrases": pa.array([len(d)], pa.int64()),
                "after_domain_filter": pa.array([int(keep.sum())], pa.int64()),
                "after_salience_filter": pa.array(
                    [int((sal >= min_sal).sum())], pa.int64()
                ),
            }
        )

    t = domain_ds.map_batches(partial, batch_format="pyarrow")
    return {
        "domain_phrases": int(t.sum("domain_phrases") or 0),
        "background_phrases": len(bg),
        "after_domain_filter": int(t.sum("after_domain_filter") or 0),
        "after_salience_filter": int(t.sum("after_salience_filter") or 0),
    }


def scored_table_to_rows(table: pa.Table) -> list[dict]:
    """Arrow scored-phrase table → reference-style build-input rows."""
    has_id = "phrase_id" in table.column_names
    rows = []
    for i in range(table.num_rows):
        rows.append(
            {
                "tokens": table["ngram"][i].as_py().split(" "),
                "salience": table["salience"][i].as_py(),
                "phrase_id": table["phrase_id"][i].as_py() if has_id else None,
                "count": table["domain_count"][i].as_py(),
                "background_count": table["background_count"][i].as_py(),
            }
        )
    return rows


def score_ngrams_join(
    domain_ds,
    background_ds,
    config: ScoreConfig | None = None,
    num_partitions: int = 8,
    driver_finalize_threshold: int = 2_000_000,
):
    """Shuffle-join scoring — the scale path for J1 when the background
    phrase table is too large to broadcast (reference loads it fully in
    memory, phrasekit_score.rs:104-105; `score_ngrams` broadcasts it via
    ray.put). LEFT OUTER hash join on the ngram key (missing background →
    background_count = 0, phrasekit_score.rs:190-191), then the same
    salience/filter/sort/enumerate finalize as `score_ngrams`.

    Only the ratio method is supported here (pmi/tfidf need corpus totals,
    which the caller can compute with ds.sum and pass to `score_ngrams`).
    """
    import ray  # noqa: F401  (Dataset API)

    config = config or ScoreConfig()
    if config.method != "ratio":
        raise ValueError("score_ngrams_join supports method='ratio' only")
    min_domain = config.min_domain_count
    min_sal = np.float32(config.min_salience)

    from phrasekit_ray.stages.agg import hash_aggregate, join_partitions

    bg = background_ds.map_batches(
        lambda b: pa.table(
            {
                "ngram": b["ngram"],
                "bg_count": b["count"].cast(pa.int64(), safe=False),
            }
        ),
        batch_format="pyarrow",
    )
    # duplicate background keys must collapse BEFORE the join or each
    # duplicate would multiply its matching domain row. The broadcast
    # twin (background_to_dict) is last-wins per the reference; "last"
    # has no distributed meaning, so this path resolves duplicates with
    # max(count) — identical whenever duplicates agree, deterministic
    # when they don't.
    bg = hash_aggregate(bg, "ngram", [("bg_count", "max")])

    joined = domain_ds.join(
        bg,
        join_type="left_outer",
        num_partitions=join_partitions(num_partitions),
        on=("ngram",),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        d = batch["count"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # LEFT OUTER: unmatched background is NULL ⇒ 0 (score.rs:190-191)
        bgc = (
            pc.fill_null(batch["bg_count"], 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        keep = d >= min_domain
        sal = saliencemod.ratio_salience(d, bgc)
        keep &= sal >= min_sal
        return pa.table(
            {
                "ngram": batch["ngram"],
                "salience": pa.array(sal, pa.float32()),
                "domain_count": pa.array(d.astype(np.uint32), pa.uint32()),
                "background_count": pa.array(bgc.astype(np.uint32), pa.uint32()),
            }
        ).filter(pa.array(keep))

    scored = joined.map_batches(finalize, batch_format="pyarrow")
    return _finalize_scored(scored, config, driver_finalize_threshold)
