"""Per-stage configuration dataclasses.

Field names, defaults and validation mirror the reference's serde configs
(reference: ext/phrasekit/src/bin/phrasekit_mine.rs:13-33,
phrasekit_score.rs:12-44, phrasekit_build.rs:34-43, phrasekit_tag.rs:14-38)
so a user of the reference can carry their config JSONs over unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

DEFAULT_SEPARATOR_ID = 4294967294  # u32::MAX - 1 (reference docs/BUILDER.md:145-147)
UNK_ID = 0

SALIENCE_METHODS = ("ratio", "pmi", "tfidf")
POLICIES = ("leftmost_longest", "leftmost_first", "salience_max", "all")


@dataclass(frozen=True)
class MineConfig:
    """N-gram mining config (reference phrasekit_mine.rs:13-33)."""

    min_n: int = 2
    max_n: int = 5
    min_count: int = 10

    def __post_init__(self) -> None:
        # reference phrasekit_mine.rs:78-80
        if self.min_n < 1 or self.max_n > 10 or self.min_n > self.max_n:
            raise ValueError(
                "Invalid config: min_n must be >= 1, max_n must be <= 10, "
                "and min_n <= max_n"
            )


@dataclass(frozen=True)
class ScoreConfig:
    """Salience scoring config (reference phrasekit_score.rs:12-44)."""

    method: str = "ratio"
    min_salience: float = 2.0
    min_domain_count: int = 10
    assign_phrase_ids: bool = True
    starting_phrase_id: int = 1000

    def __post_init__(self) -> None:
        # reference phrasekit_score.rs:95-97
        if self.method not in SALIENCE_METHODS:
            raise ValueError(
                f"Invalid method: {self.method}. Must be 'ratio', 'pmi', or 'tfidf'"
            )


@dataclass(frozen=True)
class BuildConfig:
    """Matcher artifact build config (reference phrasekit_build.rs:34-43)."""

    version: str = "1"
    tokenizer: str = "whitespace_lower"
    separator_id: int = DEFAULT_SEPARATOR_ID
    min_count: Optional[int] = None
    salience_threshold: Optional[float] = None

    def __post_init__(self) -> None:
        # reference manifest.rs:37-41: separator_id must be non-zero
        if self.separator_id == 0:
            raise ValueError("separator_id must be non-zero")


@dataclass(frozen=True)
class TagConfig:
    """Corpus tagging config (reference phrasekit_tag.rs:14-38).

    Unlike the reference (which silently passes raw overlapping matches
    through for any unknown policy string — SURVEY.md M9), unknown policies
    raise; the reference's fallthrough behavior is available explicitly as
    policy="all".
    """

    policy: str = "leftmost_longest"
    max_spans: int = 100
    label: str = "PHRASE"

    def __post_init__(self) -> None:
        if self.policy not in POLICIES:
            raise ValueError(
                f"Invalid policy: {self.policy!r}. Must be one of {POLICIES}"
            )


@dataclass(frozen=True)
class KGConfig:
    """North-rule KG extension config (no reference analog; SURVEY.md §7 P6).

    Triple lift rule: consecutive resolved mentions within a document are
    paired as (subj, pred, obj) with the constant predicate below
    (FIXTURES.md §8 "adjacent-mention pairing within a document").
    Canonicalization rule: two phrases are alias-linked when one is a
    token-prefix of the other; connected components via union-find; the
    canonical entity of a component is its member with the smallest
    phrase_id.
    """

    predicate: str = "co_mentioned_with"
    max_pair_distance: int = field(default=50)  # token gap cap for a triple
