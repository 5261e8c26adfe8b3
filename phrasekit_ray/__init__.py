"""phrasekit_ray — a Ray-Data-native phrase-mining / KG-construction engine.

A from-scratch re-expression of the capabilities of scientist-labs/phrasekit
(reference snapshot studied at /root/reference; see SURVEY.md) on top of
``ray.data.Dataset``: every stage is a batch transform over zero-copy Arrow
blocks, stateful stages are actor pools, and the wide steps (n-gram counting,
salience sort) are expressed as Ray Data groupby / sort shuffles.

Layout:
    core/       pure-Python correctness kernel (no Ray): normalization,
                salience formulas, overlap-resolution policies, the compiled
                matcher artifact. This is the module tests pin against the
                reference's semantics.
    sources/    readers / writers / deterministic synthetic data.
    stages/     Dataset -> Dataset transforms (extract, mine, score, build,
                tag, kg, dedup, textstats, similarity, multimodal).
    pipelines/  end-to-end compositions (phrase pipeline, KG pipeline).
    state/      lineage manifests, resumable writes, global row enumeration.
    runtime.py  in-process matcher API analogous to the reference's
                PhraseKit.load!/match_tokens runtime surface.
"""

from phrasekit_ray.config import (
    BuildConfig,
    MineConfig,
    ScoreConfig,
    TagConfig,
)
from phrasekit_ray.core.artifact import MatcherArtifact

__all__ = [
    "MineConfig",
    "ScoreConfig",
    "BuildConfig",
    "TagConfig",
    "MatcherArtifact",
]

__version__ = "0.1.0"
