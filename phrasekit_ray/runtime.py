"""In-process runtime matcher — the reference's Ruby API surface.

Reference analog: lib/phrasekit.rb:13-80 (PhraseKit.load! / match_tokens /
encode_tokens / match_text_tokens / stats / healthcheck) over an
Arc<RwLock<Option<Arc<Matcher>>>> with hot reload by swap (lib.rs:12-34,
SURVEY.md §2.10, T1). Python's GIL makes reads trivially safe; hot reload
is an atomic attribute swap.

An optional spell-corrector can be injected by convention (reference
docs/SPELLKIT_INTEGRATION.md:190-196): any object with
``correct(token) -> token`` and optional ``protected?(token)``.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional, Sequence

from phrasekit_ray.core.artifact import MatcherArtifact


class SpellCorrectorStub:
    """Dependency-injected spell corrector (reference lib/spellkit_stub.rb:
    53-73): fixed correction dict, protected terms bypass."""

    def __init__(
        self,
        corrections: dict[str, str] | None = None,
        protected: set[str] | None = None,
    ) -> None:
        self.corrections = corrections or {
            "oligoo": "oligo",
            "profein": "protein",
            "bufer": "buffer",
        }
        self.protected_terms = protected or {"cdk10"}

    def protected(self, token: str) -> bool:
        return token.lower() in self.protected_terms

    def correct(self, token: str) -> str:
        if self.protected(token):
            return token
        return self.corrections.get(token.lower(), token)


class PhraseMatcherRuntime:
    """Thread-safe, hot-reloadable in-process matcher."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._artifact: Optional[MatcherArtifact] = None
        self._spell = None
        self._hits = 0

    # -- lifecycle (reference lib/phrasekit.rb:13-36) -------------------

    def load(
        self,
        artifact: MatcherArtifact | None = None,
        artifact_path: str | None = None,
        spell_corrector=None,
    ) -> None:
        if artifact is None:
            if artifact_path is None:
                raise ValueError("need artifact or artifact_path")
            artifact = MatcherArtifact.load(artifact_path)
        with self._lock:  # hot reload = swap (reference matcher.rs swap)
            self._artifact = artifact
            self._spell = spell_corrector

    def _require(self) -> MatcherArtifact:
        a = self._artifact
        if a is None:
            raise RuntimeError("PhraseMatcherRuntime not loaded; call load() first")
        return a

    # -- matching (reference lib/phrasekit.rb:38-59) --------------------

    def encode_tokens(self, tokens: Sequence[str]) -> list[int]:
        return self._require().encode_tokens(tokens).tolist()

    def match_tokens(
        self,
        token_ids: Sequence[int],
        policy: str = "leftmost_longest",
        max_matches: int = 32,
    ) -> list[dict]:
        self._hits += 1
        return self._require().match_ids(token_ids, policy, max_matches)

    def match_text_tokens(
        self,
        tokens: Sequence[str],
        policy: str = "leftmost_longest",
        max_matches: int = 32,
    ) -> list[dict]:
        """Optional spell-correct → encode → match (lib/phrasekit.rb:53-59)."""
        if self._spell is not None:
            tokens = [self._spell.correct(t) for t in tokens]
        self._hits += 1
        return self._require().match_tokens(tokens, policy, max_matches)

    # -- health / stats (reference lib/phrasekit.rb:61-79) --------------

    def stats(self) -> dict:
        s = self._require().stats()
        s["hits_total"] = self._hits
        return s

    def healthcheck(self) -> dict:
        try:
            a = self._require()
            # probe match on an empty query exercises the full path
            a.match_ids([])
            return {"status": "ok", "patterns": a.num_patterns}
        except Exception as e:  # pragma: no cover
            return {"status": "error", "error": str(e)}
