"""North-star KG-construction pipeline: pages → triples → node/edge tables.

Composition (BASELINE.json north_star; SURVEY.md §3.4):
  read pages → extract/tokenize (stateless map_batches, html dropped
  immediately) → [branch A: mine (combiner + groupby shuffle) → score
  (broadcast background) → sort + enumerate → build artifact (single task)
  → ray.put] → [branch B: tag via actor pool] → triple lift (stateless)
  → union-find canonicalization (edge set is model-sized: collected to the
  driver, mapping broadcast back) → node/edge aggregates (combiner +
  groupby) → resumable partitioned Parquet with lineage manifests.
"""

from __future__ import annotations

from dataclasses import dataclass

from phrasekit_ray.config import (
    BuildConfig,
    KGConfig,
    MineConfig,
    ScoreConfig,
    TagConfig,
)
from phrasekit_ray.pipelines.phrase import run_phrase_pipeline
from phrasekit_ray.stages import kg as kgmod
from phrasekit_ray.state import lineage


@dataclass
class KGResult:
    artifact: object
    mapping: dict  # phrase_id -> canonical entity_id
    mentions: object  # lazy Dataset
    triples: object  # lazy Dataset
    nodes: object  # lazy Dataset
    edges: object  # lazy Dataset
    write_summary: dict | None = None


def run_kg_pipeline(
    pages_ds,
    background,
    mine_config: MineConfig | None = None,
    score_config: ScoreConfig | None = None,
    build_config: BuildConfig | None = None,
    tag_config: TagConfig | None = None,
    kg_config: KGConfig | None = None,
    lang_allow: tuple[str, ...] | None = None,
    output_root: str | None = None,
    num_partitions: int = 16,
    tag_concurrency=(1, 8),
    tag_batch_size: int = 1024,
    tag_saturate_pool: bool = False,
    tag_num_cpus: float = 1,
    materialize_docs: bool = False,
    canonicalize: str = "driver",
    tag_keep_tokens: bool = False,
    collect_stage_stats: bool = False,
) -> KGResult:
    kg_config = kg_config or KGConfig()
    phase = run_phrase_pipeline(
        pages_ds,
        background,
        mine_config,
        score_config,
        build_config,
        tag_config,
        lang_allow=lang_allow,
        tag_concurrency=tag_concurrency,
        tag_batch_size=tag_batch_size,
        tag_saturate_pool=tag_saturate_pool,
        tag_num_cpus=tag_num_cpus,
        materialize_docs=materialize_docs,
        tag_keep_tokens=tag_keep_tokens,
    )
    artifact = phase.artifact
    edges_alias = kgmod.alias_edges_from_artifact(artifact)
    if canonicalize == "distributed" and edges_alias:
        # hash-min label propagation over the alias edges (the scale path
        # for corpus-derived edge sets; alias edges are artifact-sized so
        # "driver" union-find is the default)
        import pyarrow as pa
        import ray as _ray

        edge_tbl = pa.table(
            {
                "src": pa.array([a for a, _ in edges_alias], pa.int64()),
                "dst": pa.array([b for _, b in edges_alias], pa.int64()),
            }
        )
        labels = {
            r["node"]: r["label"]
            for r in kgmod.connected_components_distributed(
                _ray.data.from_arrow(edge_tbl)
            ).iter_rows()
        }
        mapping = {
            int(p): int(labels.get(int(p), int(p))) for p in artifact.phrase_ids
        }
    else:
        mapping = kgmod.canonical_mapping(artifact.phrase_ids, edges_alias)
    names = kgmod.canonical_names_from_artifact(artifact, mapping)

    tagged = phase.tagged
    mentions = kgmod.mentions_from_tagged(tagged)
    triples = kgmod.triples_from_tagged(tagged, mapping, kg_config)
    nodes = kgmod.node_table(mentions, mapping, names)
    edges = kgmod.edge_table(triples)

    summary = None
    if output_root is not None:
        cfg_desc = {
            "mine": str(mine_config),
            "score": str(score_config),
            "build": str(build_config),
            "tag": str(tag_config),
            "kg": str(kg_config),
        }
        s1 = lineage.write_dataset_resumable(
            nodes, output_root, "nodes", cfg_desc, "entity_id", num_partitions
        )
        s2 = lineage.write_dataset_resumable(
            edges, output_root, "edges", cfg_desc, "subj", num_partitions
        )
        artifact.save(f"{output_root}/artifact")
        summary = {"nodes": s1, "edges": s2}
        # run-level manifest: configs + per-stage write summaries + build
        # stats — the "lineage + metrics" record for a resumable run
        import json as _json
        import os as _os
        import time as _time

        run_manifest = {
            "config": cfg_desc,
            "stages": summary,
            "artifact": {
                "num_patterns": int(artifact.num_patterns),
                "vocab_size": len(artifact.vocab) + 1,
            },
            "canonicalize": canonicalize,
            "entities": len(set(mapping.values())),
            "written_at": _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()),
        }
        from dataclasses import asdict as _asdict

        run_manifest["build_stats"] = _asdict(phase.build_stats)
        if collect_stage_stats:
            # per-stage structured counters (reference A5/A6 parity —
            # phrasekit_score.rs:56-62, phrasekit_tag.rs:67-72). Opt-in:
            # tag_stats re-executes the lazy tagging graph once more.
            from phrasekit_ray.stages.tag import tag_stats

            run_manifest["metrics"] = {
                "phrases_scored": int(phase.scored.num_rows)
                if hasattr(phase.scored, "num_rows")
                else int(phase.scored.count()),
                "tagging": tag_stats(tagged),
            }
        with open(_os.path.join(output_root, "run_manifest.json"), "w") as f:
            _json.dump(run_manifest, f, indent=2)

    return KGResult(
        artifact=artifact,
        mapping=mapping,
        mentions=mentions,
        triples=triples,
        nodes=nodes,
        edges=edges,
        write_summary=summary,
    )


def run_kg_increment(
    pages_ds,
    artifact_ref,
    mapping: dict,
    kg_config: KGConfig | None = None,
    tag_config: TagConfig | None = None,
    id_col: str = "url",
    lang_allow: tuple[str, ...] | None = None,
    tag_concurrency=(1, 8),
    tag_batch_size: int = 1024,
) -> KGResult:
    """Incremental KG construction: run ONLY the per-document stages
    (extract → tag → triples/nodes/edges) over a NEW batch of pages,
    against a FIXED prior artifact + canonical mapping.

    Mention detection is per-document and node/edge aggregates are
    additive, so `merge_edge_tables(prior.edges, inc.edges)` /
    `merge_node_tables(...)` reproduce exactly what a full run over the
    combined corpus would emit with the same artifact (pinned by
    tests/test_kg.py::test_incremental_merge_equals_full_run). The
    corpus-wide stages (mine/score/build) deliberately do NOT rerun —
    an increment never changes the phrase inventory; re-mine on your
    own cadence and rebuild when the phrase set should refresh.
    """
    from phrasekit_ray.core.artifact import MatcherArtifact
    from phrasekit_ray.stages.extract import extract_tokens
    from phrasekit_ray.stages.tag import tag_corpus

    kg_config = kg_config or KGConfig()
    import ray as _ray

    # Accept either an ObjectRef or a plain MatcherArtifact (KGResult.artifact
    # is the plain object): TaggerActor.__init__ ray.get()s whatever it is
    # handed, so a plain artifact must be put into the object store first.
    if isinstance(artifact_ref, MatcherArtifact):
        tag_ref = _ray.put(artifact_ref)
    else:
        tag_ref = artifact_ref
    docs = extract_tokens(pages_ds, id_col=id_col, lang_allow=lang_allow)
    tagged = tag_corpus(
        docs,
        tag_ref,
        tag_config,
        concurrency=tag_concurrency,
        batch_size=tag_batch_size,
        keep_tokens=False,
        id_col="doc_id",
    )
    artifact = _ray.get(artifact_ref) if not isinstance(artifact_ref, MatcherArtifact) else artifact_ref
    names = kgmod.canonical_names_from_artifact(artifact, mapping)
    mentions = kgmod.mentions_from_tagged(tagged)
    triples = kgmod.triples_from_tagged(tagged, mapping, kg_config)
    nodes = kgmod.node_table(mentions, mapping, names)
    edges = kgmod.edge_table(triples)
    return KGResult(
        artifact=artifact,
        mapping=mapping,
        mentions=mentions,
        triples=triples,
        nodes=nodes,
        edges=edges,
    )
