"""Build stage: compile the scored-phrase Dataset into a MatcherArtifact.

Reference analog: phrasekit_build.rs (single-process automaton build).
The phrase table is the model side — 10K–1M rows by construction
(reference docs/BUILDER.md:136-142) — so the build runs as ONE Ray task
(or on the driver), and the resulting artifact is `ray.put` into the
object store exactly once; every tagger actor reads that single copy
(SURVEY.md §7.0 "collect" row, T1).
"""

from __future__ import annotations

import pyarrow as pa

from phrasekit_ray.config import BuildConfig
from phrasekit_ray.core.artifact import BuildStats, MatcherArtifact, build_artifact


def _collect_phrase_table(scored) -> pa.Table:
    if isinstance(scored, pa.Table):
        return scored
    # ray Dataset → driver arrow table (bounded: this is the model table)
    tables = [b for b in scored.iter_batches(batch_format="pyarrow")]
    if not tables:
        return pa.table(
            {
                "ngram": pa.array([], pa.string()),
                "salience": pa.array([], pa.float32()),
                "phrase_id": pa.array([], pa.uint32()),
                "domain_count": pa.array([], pa.uint32()),
            }
        )
    return pa.concat_tables(tables, promote_options="default")


def build_from_scored(
    scored,
    config: BuildConfig | None = None,
) -> tuple[MatcherArtifact, BuildStats]:
    """scored Dataset/Table (ngram, salience, phrase_id, domain_count, ...)
    → compiled MatcherArtifact + build stats."""
    table = _collect_phrase_table(scored)
    count_col = (
        "domain_count" if "domain_count" in table.column_names else "count"
    )
    rows = (
        {
            "tokens": ng.split(" "),
            "phrase_id": pid,
            "salience": sal,
            "count": cnt,
        }
        for ng, pid, sal, cnt in zip(
            table["ngram"].to_pylist(),
            table["phrase_id"].to_pylist(),
            table["salience"].to_pylist(),
            table[count_col].to_pylist(),
        )
    )
    return build_artifact(rows, config)


def put_artifact(artifact: MatcherArtifact):
    """Share the artifact via the object store (one copy per node)."""
    import ray

    return ray.put(artifact)
