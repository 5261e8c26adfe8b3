"""The flagship weak-supervision phrase pipeline, end to end.

Reference analog: examples/end_to_end_demo.rb (mine → score → build → tag
→ interactive match), four process boundaries crossed via files + argv
(SURVEY.md §3.1). Here it is one lazy Dataset graph with a single
materialization point (the phrase table feeding the artifact build) and an
actor-pool tag stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from phrasekit_ray.config import BuildConfig, MineConfig, ScoreConfig, TagConfig
from phrasekit_ray.core.artifact import BuildStats, MatcherArtifact
from phrasekit_ray.stages.build import build_from_scored, put_artifact
from phrasekit_ray.stages.extract import extract_tokens
from phrasekit_ray.stages.mine import mine_ngrams
from phrasekit_ray.stages.score import score_ngrams
from phrasekit_ray.stages.tag import tag_corpus


@dataclass
class PhrasePipelineResult:
    scored: object  # Dataset of scored phrases (materialized)
    artifact: MatcherArtifact
    artifact_ref: object
    build_stats: BuildStats
    tagged: object  # lazy Dataset of tagged docs


def run_phrase_pipeline(
    pages_ds,
    background,
    mine_config: MineConfig | None = None,
    score_config: ScoreConfig | None = None,
    build_config: BuildConfig | None = None,
    tag_config: TagConfig | None = None,
    id_col: str = "url",
    lang_allow: tuple[str, ...] | None = None,
    tag_concurrency=(1, 8),
    tag_batch_size: int = 1024,
    tag_saturate_pool: bool = False,
    tag_num_cpus: float = 1,
    materialize_docs: bool = False,
    tag_keep_tokens: bool = True,
) -> PhrasePipelineResult:
    """pages → tokenized docs → mine → score → build → tag.

    The tokenized docs Dataset is consumed twice (mining and tagging);
    Ray Data re-executes the lazy graph per consumer, so the extract stage
    runs twice — cheap and stateless — rather than pinning the whole
    tokenized corpus in the object store. (At 100 TB, re-reading beats
    materializing.)
    """
    docs = extract_tokens(pages_ds, id_col=id_col, lang_allow=lang_allow)
    if materialize_docs:
        # the tokenized corpus is consumed twice (mine + tag); pin it in
        # the object store when it fits (bench scale) instead of
        # re-executing the extract chain — at 100 TB keep False and let
        # the lazy graph re-read (or checkpoint to parquet between runs)
        docs = docs.materialize()
    mined = mine_ngrams(docs, mine_config)
    scored = score_ngrams(mined, background, score_config)
    artifact, build_stats = build_from_scored(scored, build_config)
    artifact_ref = put_artifact(artifact)
    tagged = tag_corpus(
        docs,
        artifact_ref,
        tag_config,
        concurrency=tag_concurrency,
        batch_size=tag_batch_size,
        saturate_pool=tag_saturate_pool,
        num_cpus=tag_num_cpus,
        # the KG path never reads tokens from tagged output; dropping the
        # column halves the bytes written back to the object store
        keep_tokens=tag_keep_tokens,
        # extract_tokens always emits the id under "doc_id"
        id_col="doc_id",
    )
    return PhrasePipelineResult(
        scored=scored,
        artifact=artifact,
        artifact_ref=artifact_ref,
        build_stats=build_stats,
        tagged=tagged,
    )
