"""CLI entry points mirroring the reference's four stage binaries.

Reference analog: `phrasekit_mine` / `phrasekit_score` / `phrasekit_build`
/ `phrasekit_tag` (ext/phrasekit/src/bin/*.rs) — each `main(argv) → load
config JSON → stream input → write output → print stats` (SURVEY.md §3.2).
Here each subcommand is a Ray Data pipeline suitable for `ray job submit`:

    ray job submit -- python -m phrasekit_ray.cli kg \
        --pages /data/pages --output /data/kg

Config JSONs carry over from the reference unchanged (field names and
defaults match — phrasekit_ray/config.py). Inputs/outputs are Parquet
(the engine's inter-stage format; JSONL readers/writers live in
sources/jsonl.py for reference-format compatibility).

Owns the Ray session only when run as a script (guarded init — the
driver/test harness owns it otherwise).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray() -> None:
    import os

    import ray

    if not ray.is_initialized():
        # honor RAY_ADDRESS (set by `ray job submit` / cluster launchers)
        # so CLI pipelines attach to the cluster; an explicit
        # address="local" would silently start a fresh single-node
        # instance on the driver instead
        ray.init(
            address=os.environ.get("RAY_ADDRESS") or "local",
            include_dashboard=False,
        )


def _load_config(path: str | None, cls):
    if path is None:
        return cls()
    with open(path) as f:
        return cls(**json.load(f))


def cmd_mine(args) -> int:
    import ray

    from phrasekit_ray.config import MineConfig
    from phrasekit_ray.stages.extract import tokenize_documents
    from phrasekit_ray.stages.mine import mine_ngrams, mine_stats

    _init_ray()
    cfg = _load_config(args.config, MineConfig)
    ds = ray.data.read_parquet(args.input)
    # materialize once: mine_ngrams and mine_stats both consume the
    # tokenized docs (same pattern as cmd_score/cmd_tag)
    docs = tokenize_documents(
        ds, text_col=args.text_col, id_col=args.id_col
    ).materialize()
    mined = mine_ngrams(docs, cfg, sort_output=True)
    mined.write_parquet(args.output)
    stats = mine_stats(docs, cfg)
    print(json.dumps({"stage": "mine", **stats}))
    return 0


def cmd_score(args) -> int:
    import ray

    from phrasekit_ray.config import ScoreConfig
    from phrasekit_ray.stages.score import (
        background_to_dict,
        score_ngrams,
        score_stats,
    )

    _init_ray()
    cfg = _load_config(args.config, ScoreConfig)
    # materialize once: score_ngrams and score_stats both consume the
    # domain n-gram table (bounded — it is post-mining counts, not the
    # corpus) from the object store instead of re-reading + re-scoring
    domain = ray.data.read_parquet(args.domain).materialize()
    background = background_to_dict(ray.data.read_parquet(args.background))
    scored = score_ngrams(domain, background, cfg)
    scored.write_parquet(args.output)
    stats = score_stats(domain, background, cfg)
    print(json.dumps({"stage": "score", **stats}))
    return 0


def cmd_build(args) -> int:
    import ray

    from phrasekit_ray.config import BuildConfig
    from phrasekit_ray.stages.build import build_from_scored

    _init_ray()
    cfg = _load_config(args.config, BuildConfig)
    scored = ray.data.read_parquet(args.phrases)
    artifact, stats = build_from_scored(scored, cfg)
    artifact.save(args.output)
    print(json.dumps({"stage": "build", **stats.__dict__}))
    return 0


def cmd_tag(args) -> int:
    import ray

    from phrasekit_ray.config import TagConfig
    from phrasekit_ray.core.artifact import MatcherArtifact
    from phrasekit_ray.stages.extract import tokenize_documents
    from phrasekit_ray.stages.tag import tag_corpus, tag_stats

    _init_ray()
    cfg = _load_config(args.config, TagConfig)
    artifact = MatcherArtifact.load(args.artifact)
    ref = ray.put(artifact)
    ds = ray.data.read_parquet(args.input)
    docs = tokenize_documents(ds, text_col=args.text_col, id_col=args.id_col)
    tagged = tag_corpus(
        docs,
        ref,
        cfg,
        concurrency=(args.concurrency, args.concurrency),
        batch_size=args.batch_size,
        # parquet output carries doc_id + spans only; never ship the token
        # corpus through the object store just to drop it at the sink
        keep_tokens=False,
    ).materialize()  # one execution feeds both the sink and the stats pass
    tagged.write_parquet(args.output)
    print(json.dumps({"stage": "tag", **tag_stats(tagged)}))
    return 0


def cmd_kg(args) -> int:
    import ray

    from phrasekit_ray.config import KGConfig, MineConfig, ScoreConfig
    from phrasekit_ray.pipelines.kg import run_kg_pipeline
    from phrasekit_ray.sources.pages import read_pages
    from phrasekit_ray.stages.score import background_to_dict

    _init_ray()
    pages = read_pages(args.pages)
    background = (
        background_to_dict(ray.data.read_parquet(args.background))
        if args.background
        else {}
    )
    cpus = int(ray.cluster_resources().get("CPU", 8))
    res = run_kg_pipeline(
        pages,
        background,
        _load_config(args.mine_config, MineConfig),
        _load_config(args.score_config, ScoreConfig),
        kg_config=KGConfig(),
        output_root=args.output,
        num_partitions=args.num_partitions,
        tag_concurrency=(cpus, cpus),
        tag_num_cpus=0.5,
        tag_saturate_pool=True,
    )
    print(
        json.dumps(
            {
                "stage": "kg",
                "phrases": int(res.artifact.num_patterns),
                "write": res.write_summary,
            },
            default=str,
        )
    )
    return 0


def cmd_dedup(args) -> int:
    import pyarrow as pa
    import ray

    from phrasekit_ray.stages.dedup import exact_dedup, verified_minhash_pairs
    from phrasekit_ray.stages.extract import tokenize_documents

    _init_ray()
    ds = ray.data.read_parquet(args.input)
    if args.method == "exact":
        kept = exact_dedup(ds, text_col=args.text_col, id_col=args.id_col)
        kept.write_parquet(args.output)
        print(json.dumps({"stage": "dedup", "method": "exact"}))
        return 0
    docs = tokenize_documents(ds, text_col=args.text_col, id_col=args.id_col)
    # tokenize_documents standardizes the id column name to "doc_id"
    pairs = verified_minhash_pairs(
        docs,
        id_col="doc_id",
        num_perm=args.num_perm,
        bands=args.bands,
        verify_jaccard=args.verify_jaccard,
    )
    pairs.write_parquet(args.output)
    print(
        json.dumps(
            {
                "stage": "dedup",
                "method": "minhash",
                "num_perm": args.num_perm,
                "bands": args.bands,
                "verify_jaccard": args.verify_jaccard,
            }
        )
    )
    return 0


def cmd_profile(args) -> int:
    import pyarrow.parquet as _pq
    import ray

    from phrasekit_ray.stages.agg import profile_table

    _init_ray()
    ds = ray.data.read_parquet(args.input)
    cols = args.columns.split(",") if args.columns else None
    t = profile_table(ds, cols)
    if args.output:
        _pq.write_table(t, args.output)
    print(json.dumps({"stage": "profile", "columns": t["column"].to_pylist(),
                      "rows": int(t["n_rows"][0].as_py()) if t.num_rows else 0}))
    return 0


def cmd_classify(args) -> int:
    import ray

    from phrasekit_ray.stages.classify import classify_documents

    _init_ray()
    ds = ray.data.read_parquet(args.input)
    out = classify_documents(
        ds, num_buckets=args.num_buckets, seed=args.seed,
        text_col=args.text_col, id_col=args.id_col,
    )
    out.write_parquet(args.output)
    print(json.dumps({"stage": "classify", "num_buckets": args.num_buckets,
                      "seed": args.seed}))
    return 0


def cmd_decontaminate(args) -> int:
    import ray

    from phrasekit_ray.stages.dedup import contaminated_docs
    from phrasekit_ray.stages.extract import tokenize_documents

    _init_ray()
    train = tokenize_documents(
        ray.data.read_parquet(args.train), text_col=args.text_col,
        id_col=args.id_col,
    )
    bench = tokenize_documents(
        ray.data.read_parquet(args.bench), text_col=args.text_col,
        id_col=args.id_col,
    )
    flagged = contaminated_docs(train, bench, k=args.k, id_col="doc_id")
    flagged.write_parquet(args.output)
    print(json.dumps({"stage": "decontaminate", "k": args.k}))
    return 0


def cmd_links(args) -> int:
    import ray

    from phrasekit_ray.stages.extract import extract_links, host_edges

    _init_ray()
    pages = ray.data.read_parquet(args.pages, columns=[args.url_col, args.html_col])
    links = extract_links(pages, html_col=args.html_col, url_col=args.url_col)
    out = host_edges(links) if args.host_graph else links
    out.write_parquet(args.output)
    print(json.dumps({"stage": "links", "host_graph": bool(args.host_graph)}))
    return 0


def cmd_webgraph(args) -> int:
    import pyarrow.parquet as pq
    import ray

    from phrasekit_ray.pipelines.webgraph import webgraph_profile

    _init_ray()
    pages = ray.data.read_parquet(args.pages)
    profile = webgraph_profile(pages, iters=args.iters)
    pq.write_table(profile, args.output)
    print(json.dumps({"stage": "webgraph", "hosts": profile.num_rows}))
    return 0


def cmd_mix(args) -> int:
    import ray

    from phrasekit_ray.stages.mix import mix_corpora

    _init_ray()
    rates = {}
    for spec in args.rate or []:
        name, _, val = spec.partition("=")
        if not _ or not name:
            raise SystemExit(f"--rate expects SOURCE=RATE, got {spec!r}")
        rates[name] = float(val)
    ds = ray.data.read_parquet(args.input)
    mixed = mix_corpora(
        ds,
        args.source_col,
        rates,
        args.id_col,
        seed=args.seed,
        default_rate=args.default_rate,
    )
    mixed.write_parquet(args.output)
    print(json.dumps({"stage": "mix", "rates": rates}))
    return 0


def cmd_excise(args) -> int:
    import ray

    from phrasekit_ray.stages.dedup import excise_duplicate_spans

    _init_ray()
    ds = ray.data.read_parquet(args.input, columns=[args.id_col, args.text_col])
    out = excise_duplicate_spans(
        ds, k=args.k, text_col=args.text_col, id_col=args.id_col,
        min_count=args.min_count,
    )
    out.write_parquet(args.output)
    print(json.dumps({"stage": "excise", "k": args.k}))
    return 0


def cmd_warc_to_parquet(args) -> int:
    import ray  # noqa: F401

    from phrasekit_ray.sources.warc import read_warc

    _init_ray()
    ds = read_warc(args.input, strict=args.strict)
    ds.write_parquet(args.output)
    print(json.dumps({"stage": "warc-to-parquet", "strict": bool(args.strict)}))
    return 0


def cmd_pack(args) -> int:
    import ray

    from phrasekit_ray.stages.packing import pack_sequences

    _init_ray()
    ds = ray.data.read_parquet(args.input, columns=[args.id_col, args.tokens_col])
    out = pack_sequences(
        ds, args.capacity, tokens_col=args.tokens_col, id_col=args.id_col,
        num_partitions=args.num_partitions,
    )
    out.write_parquet(args.output)
    print(json.dumps({"stage": "pack", "capacity": args.capacity}))
    return 0


def cmd_communities(args) -> int:
    import ray

    from phrasekit_ray.stages.kg import label_propagation_communities

    _init_ray()
    edges = ray.data.read_parquet(args.input, columns=[args.src_col, args.dst_col])
    labels = label_propagation_communities(
        edges, src_col=args.src_col, dst_col=args.dst_col,
        max_rounds=args.max_rounds,
    )
    labels.write_parquet(args.output)
    print(json.dumps({"stage": "communities", "max_rounds": args.max_rounds}))
    return 0


def cmd_pivot(args) -> int:
    import ray

    from phrasekit_ray.stages.agg import pivot_sum

    _init_ray()
    cats = args.categories.split(",")
    ds = ray.data.read_parquet(
        args.input, columns=[args.key, args.cat_col, args.value_col]
    )
    out = pivot_sum(
        ds, args.key, args.cat_col, args.value_col, cats,
        num_partitions=args.num_partitions,
    )
    out.write_parquet(args.output)
    print(json.dumps({"stage": "pivot", "categories": cats}))
    return 0


def cmd_unpivot(args) -> int:
    import ray

    from phrasekit_ray.stages.agg import unpivot

    _init_ray()
    id_cols = args.id_cols.split(",")
    value_cols = args.value_cols.split(",")
    ds = ray.data.read_parquet(args.input, columns=id_cols + value_cols)
    out = unpivot(
        ds, id_cols, value_cols,
        cat_name=args.cat_name, value_name=args.value_name,
        drop_null=not args.include_nulls,
    )
    out.write_parquet(args.output)
    print(json.dumps({"stage": "unpivot", "value_cols": value_cols}))
    return 0


def cmd_rank_window(args) -> int:
    import ray

    from phrasekit_ray.stages.windows import rank_window

    _init_ray()
    ds = ray.data.read_parquet(
        args.input, columns=[args.user_col, args.ts_col, args.id_col]
    )
    out = rank_window(
        ds, user_col=args.user_col, ts_col=args.ts_col, id_col=args.id_col,
        ntile_k=args.ntile_k, num_partitions=args.num_partitions,
    )
    out.write_parquet(args.output)
    print(json.dumps({"stage": "rank-window", "ntile_k": args.ntile_k}))
    return 0


def cmd_funnel(args) -> int:
    import ray

    from phrasekit_ray.stages.windows import funnel_counts

    _init_ray()
    # tolerate "view, click, purchase" and trailing commas — an unstripped
    # " click" would silently match nothing and zero the funnel tail
    steps = [s.strip() for s in args.steps.split(",") if s.strip()]
    ds = ray.data.read_parquet(
        args.input, columns=[args.user_col, args.type_col, args.ts_col]
    )
    out = funnel_counts(
        ds, steps, user_col=args.user_col, type_col=args.type_col,
        ts_col=args.ts_col, num_partitions=args.num_partitions,
    )
    out.write_parquet(args.output)
    print(json.dumps({"stage": "funnel", "steps": steps}))
    return 0


def cmd_chunk(args) -> int:
    import ray

    from phrasekit_ray.stages.chunk import chunk_windows

    _init_ray()
    ds = ray.data.read_parquet(args.input, columns=[args.id_col, args.text_col])
    out = chunk_windows(
        ds, window=args.window, stride=args.stride,
        text_col=args.text_col, id_col=args.id_col,
    )
    out.write_parquet(args.output)
    print(json.dumps({"stage": "chunk", "window": args.window,
                      "stride": args.stride}))
    return 0


def cmd_ssjoin(args) -> int:
    import ray

    from phrasekit_ray.stages.dedup import (
        containment_pairs,
        jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )
    from phrasekit_ray.stages.extract import tokenize_documents

    _init_ray()
    docs = tokenize_documents(
        ray.data.read_parquet(args.input),
        text_col=args.text_col,
        id_col=args.id_col,
    )
    if args.method == "exact":
        out = jaccard_pairs(docs, k=args.k, threshold=args.threshold)
    elif args.method == "prefix":
        out = prefix_filter_jaccard_pairs(
            docs, k=args.k, threshold=args.threshold
        )
    else:
        out = containment_pairs(
            docs, k=args.k,
            min_containment_micro=int(round(args.threshold * 1_000_000)),
        )
    out.write_parquet(args.output)
    print(json.dumps({"stage": "ssjoin", "method": args.method,
                      "k": args.k, "threshold": args.threshold}))
    return 0


def cmd_mh_index(args) -> int:
    import ray

    from phrasekit_ray.stages.dedup import (
        index_candidate_pairs,
        write_minhash_index,
    )
    from phrasekit_ray.stages.extract import tokenize_documents

    _init_ray()
    summary = {}
    if args.append:
        if not args.snapshot:
            print("mh-index: --append requires --snapshot", flush=True)
            return 2
        docs = tokenize_documents(
            ray.data.read_parquet(args.append),
            text_col=args.text_col,
            id_col=args.id_col,
        )
        summary = write_minhash_index(
            docs, args.index_dir, args.snapshot, id_col="doc_id"
        )
    if args.pairs_output:
        index_candidate_pairs(args.index_dir).write_parquet(args.pairs_output)
    print(json.dumps({"stage": "mh-index", **summary}))
    return 0


def cmd_compact(args) -> int:
    from phrasekit_ray.state.lineage import compact_zonemapped

    _init_ray()
    summary = compact_zonemapped(
        args.root, args.stages, args.out_stage, args.zone_col,
        args.num_partitions,
    )
    print(json.dumps({"stage": "compact", **{
        k: v for k, v in summary.items() if k != "zones"}}))
    return 0


def cmd_winnow(args) -> int:
    import ray

    from phrasekit_ray.stages.textstats import winnowed_fingerprints

    _init_ray()
    ds = ray.data.read_parquet(args.input)
    winnowed_fingerprints(
        ds, k=args.k, window=args.window,
        text_col=args.text_col, id_col=args.id_col,
    ).write_parquet(args.output)
    print(json.dumps({"stage": "winnow", "k": args.k, "window": args.window}))
    return 0


def cmd_zscore(args) -> int:
    import ray

    from phrasekit_ray.stages.agg import grouped_zscore

    _init_ray()
    ds = ray.data.read_parquet(args.input)
    out = grouped_zscore(
        ds, args.key_col, args.value_col, scale=args.scale,
        num_partitions=args.num_partitions,
    )
    out.write_parquet(args.output)
    print(json.dumps({"stage": "zscore", "key": args.key_col}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="phrasekit_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("mine", help="n-gram mining (reference phrasekit_mine)")
    m.add_argument("--input", required=True)
    m.add_argument("--output", required=True)
    m.add_argument("--config")
    m.add_argument("--text-col", default="text")
    m.add_argument("--id-col", default="doc_id")
    m.set_defaults(fn=cmd_mine)

    s = sub.add_parser("score", help="salience scoring (reference phrasekit_score)")
    s.add_argument("--domain", required=True)
    s.add_argument("--background", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--config")
    s.set_defaults(fn=cmd_score)

    b = sub.add_parser("build", help="matcher artifact build (reference phrasekit_build)")
    b.add_argument("--phrases", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--config")
    b.set_defaults(fn=cmd_build)

    t = sub.add_parser("tag", help="corpus tagging (reference phrasekit_tag)")
    t.add_argument("--input", required=True)
    t.add_argument("--artifact", required=True)
    t.add_argument("--output", required=True)
    t.add_argument("--config")
    t.add_argument("--text-col", default="text")
    t.add_argument("--id-col", default="doc_id")
    t.add_argument("--concurrency", type=int, default=4)
    t.add_argument("--batch-size", type=int, default=1024)
    t.set_defaults(fn=cmd_tag)

    d = sub.add_parser("dedup", help="exact / minhash near-dedup over a corpus")
    d.add_argument("--input", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--method", choices=["exact", "minhash"], default="exact")
    d.add_argument("--text-col", default="text")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--num-perm", type=int, default=64)
    d.add_argument("--bands", type=int, default=16)
    d.add_argument("--verify-jaccard", type=float, default=0.5)
    d.set_defaults(fn=cmd_dedup)

    pr = sub.add_parser("profile", help="ANALYZE-style column profile of a parquet table")
    pr.add_argument("--input", required=True)
    pr.add_argument("--output", default=None)
    pr.add_argument("--columns", default=None, help="comma-separated subset")
    pr.set_defaults(fn=cmd_profile)

    cl = sub.add_parser("classify", help="hashed linear classifier over documents")
    cl.add_argument("--input", required=True)
    cl.add_argument("--output", required=True)
    cl.add_argument("--num-buckets", type=int, default=4096, dest="num_buckets")
    cl.add_argument("--seed", type=int, default=13)
    cl.add_argument("--text-col", default="text", dest="text_col")
    cl.add_argument("--id-col", default="doc_id", dest="id_col")
    cl.set_defaults(fn=cmd_classify)

    dc = sub.add_parser("decontaminate", help="k-gram overlap vs a benchmark corpus")
    dc.add_argument("--train", required=True)
    dc.add_argument("--bench", required=True)
    dc.add_argument("--output", required=True)
    dc.add_argument("--k", type=int, default=13)
    dc.add_argument("--text-col", default="text", dest="text_col")
    dc.add_argument("--id-col", default="doc_id", dest="id_col")
    dc.set_defaults(fn=cmd_decontaminate)

    k = sub.add_parser("kg", help="end-to-end KG construction over pages parquet")
    k.add_argument("--pages", required=True)
    k.add_argument("--output", required=True)
    k.add_argument("--background")
    k.add_argument("--mine-config")
    k.add_argument("--score-config")
    k.add_argument("--num-partitions", type=int, default=16)
    k.set_defaults(fn=cmd_kg)

    pk = sub.add_parser(
        "pack", help="sequence packing into fixed token-capacity bins"
    )
    pk.add_argument("--input", required=True)
    pk.add_argument("--output", required=True)
    pk.add_argument("--capacity", type=int, default=2048)
    pk.add_argument("--tokens-col", default="n_tokens")
    pk.add_argument("--id-col", default="doc_id")
    # bin ids are deterministic only for a FIXED partition count (the
    # default scales with cluster CPUs) — pin it for reproducible packs
    pk.add_argument("--num-partitions", type=int, default=None)
    pk.set_defaults(fn=cmd_pack)

    cm = sub.add_parser(
        "communities", help="label-propagation communities over an edge parquet"
    )
    cm.add_argument("--input", required=True)
    cm.add_argument("--output", required=True)
    cm.add_argument("--src-col", default="src")
    cm.add_argument("--dst-col", default="dst")
    cm.add_argument("--max-rounds", type=int, default=10)
    cm.set_defaults(fn=cmd_communities)

    pv = sub.add_parser(
        "pivot", help="conditional-aggregate pivot (sum per category column)"
    )
    pv.add_argument("--input", required=True)
    pv.add_argument("--output", required=True)
    pv.add_argument("--key", required=True)
    pv.add_argument("--cat-col", required=True)
    pv.add_argument("--value-col", required=True)
    pv.add_argument("--categories", required=True,
                    help="comma-separated category values to pivot into columns")
    pv.add_argument("--num-partitions", type=int, default=None)
    pv.set_defaults(fn=cmd_pivot)

    up = sub.add_parser("unpivot", help="UNPIVOT/melt wide columns to rows")
    up.add_argument("--input", required=True)
    up.add_argument("--output", required=True)
    up.add_argument("--id-cols", required=True, help="comma-separated")
    up.add_argument("--value-cols", required=True, help="comma-separated")
    up.add_argument("--cat-name", default="name")
    up.add_argument("--value-name", default="value")
    up.add_argument("--include-nulls", action="store_true",
                    help="INCLUDE NULLS (default excludes NULL cells)")
    up.set_defaults(fn=cmd_unpivot)

    rw = sub.add_parser(
        "rank-window",
        help="ROW_NUMBER / NTILE / percent_rank per user ordered by ts",
    )
    rw.add_argument("--input", required=True)
    rw.add_argument("--output", required=True)
    rw.add_argument("--user-col", default="user_id")
    rw.add_argument("--ts-col", default="ts")
    rw.add_argument("--id-col", default="event_id")
    rw.add_argument("--ntile-k", type=int, default=4)
    rw.add_argument("--num-partitions", type=int, default=None)
    rw.set_defaults(fn=cmd_rank_window)

    fu = sub.add_parser(
        "funnel", help="ordered multi-step funnel counts over events"
    )
    fu.add_argument("--input", required=True)
    fu.add_argument("--output", required=True)
    fu.add_argument("--steps", required=True, help="comma-separated, in order")
    fu.add_argument("--user-col", default="user_id")
    fu.add_argument("--type-col", default="event_type")
    fu.add_argument("--ts-col", default="ts")
    fu.add_argument("--num-partitions", type=int, default=None)
    fu.set_defaults(fn=cmd_funnel)

    ch = sub.add_parser(
        "chunk", help="strided training-window chunking of documents"
    )
    ch.add_argument("--input", required=True)
    ch.add_argument("--output", required=True)
    ch.add_argument("--window", type=int, default=512)
    ch.add_argument("--stride", type=int, default=384)
    ch.add_argument("--text-col", default="text")
    ch.add_argument("--id-col", default="doc_id")
    ch.set_defaults(fn=cmd_chunk)

    zs = sub.add_parser(
        "zscore", help="per-group z-score standardization of a value column"
    )
    zs.add_argument("--input", required=True)
    zs.add_argument("--output", required=True)
    zs.add_argument("--key-col", required=True)
    zs.add_argument("--value-col", required=True)
    zs.add_argument("--scale", type=float, default=100.0)
    zs.add_argument("--num-partitions", type=int, default=None)
    zs.set_defaults(fn=cmd_zscore)

    ln = sub.add_parser(
        "links", help="extract outlink edges (or host graph) from pages html"
    )
    ln.add_argument("--pages", required=True)
    ln.add_argument("--output", required=True)
    ln.add_argument("--url-col", dest="url_col", default="url")
    ln.add_argument("--html-col", dest="html_col", default="html")
    ln.add_argument("--host-graph", dest="host_graph", action="store_true")
    ln.set_defaults(fn=cmd_links)

    wg = sub.add_parser(
        "webgraph",
        help="one-pass host-graph profile (degrees/reciprocity/CC/HITS/Katz)",
    )
    wg.add_argument("--pages", required=True)
    wg.add_argument("--output", required=True)
    wg.add_argument("--iters", type=int, default=4)
    wg.set_defaults(fn=cmd_webgraph)

    mx = sub.add_parser(
        "mix", help="deterministic corpus mixing / oversampling by source rate"
    )
    mx.add_argument("--input", required=True)
    mx.add_argument("--output", required=True)
    mx.add_argument("--rate", action="append", metavar="SOURCE=RATE")
    mx.add_argument("--source-col", dest="source_col", default="source")
    mx.add_argument("--id-col", dest="id_col", default="doc_id")
    mx.add_argument("--seed", type=int, default=17)
    mx.add_argument("--default-rate", dest="default_rate", type=float, default=1.0)
    mx.set_defaults(fn=cmd_mix)

    ex = sub.add_parser(
        "excise", help="remove corpus-duplicated k-token spans from documents"
    )
    ex.add_argument("--input", required=True)
    ex.add_argument("--output", required=True)
    ex.add_argument("--k", type=int, default=5)
    ex.add_argument("--min-count", dest="min_count", type=int, default=2)
    ex.add_argument("--id-col", dest="id_col", default="doc_id")
    ex.add_argument("--text-col", dest="text_col", default="text")
    ex.set_defaults(fn=cmd_excise)

    wp = sub.add_parser(
        "warc-to-parquet",
        help="convert WARC/WARC.GZ files to pages-schema parquet",
    )
    wp.add_argument("--input", required=True, nargs="+")
    wp.add_argument("--output", required=True)
    wp.add_argument("--strict", action="store_true")
    wp.set_defaults(fn=cmd_warc_to_parquet)

    sj = sub.add_parser(
        "ssjoin",
        help="set-similarity self-join: exact inverted-index, "
        "prefix-filtered (AllPairs), or directed containment",
    )
    sj.add_argument("--input", required=True)
    sj.add_argument("--output", required=True)
    sj.add_argument(
        "--method",
        choices=["exact", "prefix", "containment"],
        default="prefix",
    )
    sj.add_argument("--k", type=int, default=3)
    sj.add_argument("--threshold", type=float, default=0.8)
    sj.add_argument("--text-col", default="text")
    sj.add_argument("--id-col", default="doc_id")
    sj.set_defaults(fn=cmd_ssjoin)

    mi = sub.add_parser(
        "mh-index",
        help="persistent incremental MinHash-LSH index: append a "
        "snapshot and/or emit candidate pairs over all snapshots",
    )
    mi.add_argument("--index-dir", required=True)
    mi.add_argument("--append", help="parquet corpus to append as a snapshot")
    mi.add_argument("--snapshot", help="snapshot name for --append")
    mi.add_argument("--pairs-output", help="write candidate pairs parquet")
    mi.add_argument("--text-col", default="text")
    mi.add_argument("--id-col", default="doc_id")
    mi.set_defaults(fn=cmd_mh_index)

    cp = sub.add_parser(
        "compact",
        help="LSM-style compaction of zonemapped snapshot layouts",
    )
    cp.add_argument("--root", required=True)
    cp.add_argument("--stages", required=True, nargs="+")
    cp.add_argument("--out-stage", required=True)
    cp.add_argument("--zone-col", required=True)
    cp.add_argument("--num-partitions", type=int, default=16)
    cp.set_defaults(fn=cmd_compact)

    wn = sub.add_parser(
        "winnow",
        help="winnowing fingerprint index (MOSS window-min selector)",
    )
    wn.add_argument("--input", required=True)
    wn.add_argument("--output", required=True)
    wn.add_argument("--k", type=int, default=3)
    wn.add_argument("--window", type=int, default=4)
    wn.add_argument("--text-col", default="text")
    wn.add_argument("--id-col", default="doc_id")
    wn.set_defaults(fn=cmd_winnow)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
