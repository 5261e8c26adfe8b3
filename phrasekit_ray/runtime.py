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
    """Thread-safe, hot-reloadable in-process matcher.

    Unlike the reference — whose stats latency fields are stubbed zeros
    (matcher.rs:139-151) — this runtime MEASURES match latency: a fixed
    4096-slot ring of microsecond samples (bounded memory, O(1) per
    call) feeding real p50_us/p95_us in ``stats()``. Disable with
    ``track_latency=False`` for exact reference-stub parity."""

    _RING = 4096

    def __init__(self, track_latency: bool = True) -> None:
        self._lock = threading.Lock()
        self._artifact: Optional[MatcherArtifact] = None
        self._spell = None
        self._hits = 0
        self._track = track_latency
        self._lat_us = [0.0] * self._RING
        self._lat_n = 0  # total samples ever; ring slot = n % _RING

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

    def _record_us(self, t0: float) -> None:
        if self._track:
            self._lat_us[self._lat_n % self._RING] = (
                time.perf_counter() - t0
            ) * 1e6
            self._lat_n += 1

    def match_tokens(
        self,
        token_ids: Sequence[int],
        policy: str = "leftmost_longest",
        max_matches: int = 32,
    ) -> list[dict]:
        self._hits += 1
        t0 = time.perf_counter()
        out = self._require().match_ids(token_ids, policy, max_matches)
        self._record_us(t0)
        return out

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
        t0 = time.perf_counter()
        out = self._require().match_tokens(tokens, policy, max_matches)
        self._record_us(t0)
        return out

    # -- health / stats (reference lib/phrasekit.rb:61-79) --------------

    def stats(self) -> dict:
        s = self._require().stats()
        s["hits_total"] = self._hits
        if self._track and self._lat_n > 0:
            import numpy as np

            n = min(self._lat_n, self._RING)
            lat = np.asarray(self._lat_us[:n])
            s["p50_us"] = int(np.percentile(lat, 50))
            s["p95_us"] = int(np.percentile(lat, 95))
            s["latency_samples"] = n
        return s

    def healthcheck(self) -> dict:
        try:
            a = self._require()
            # probe match on an empty query exercises the full path
            a.match_ids([])
            return {"status": "ok", "patterns": a.num_patterns}
        except Exception as e:  # pragma: no cover
            return {"status": "error", "error": str(e)}
