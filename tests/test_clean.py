"""Composed corpus-cleaning pipeline tests."""

import pyarrow as pa

from phrasekit_ray.pipelines.clean import clean_corpus


def test_clean_corpus_each_gate_fires(ray_session):
    import ray

    good = "the quick brown fox jumps over the lazy dog again"
    docs = [
        (0, good),                               # keeps
        (1, good),                               # exact dup of 0 → dropped
        (2, "ok"),                               # too short → quality gate
        (3, "!!! ??? ### $$$ %%% ^^^ &&& ***"),  # zero alpha → quality gate
        (4, "a b c a b c a b c a b c"),          # repetitive → Gopher gate
        (5, "please contact someone at a@b.co for the customer data soon"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs]),
        }
    )
    out = (
        clean_corpus(ray.data.from_arrow(t))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 5]
    row5 = out[out["doc_id"] == 5].iloc[0]
    assert "[MASKED]" in row5["text_redacted"]      # email + blocklist hit
    assert "a@b.co" not in row5["text_redacted"]
    assert "customer" not in row5["text_redacted"]
    assert row5["n_blocked"] == 1
    row0 = out[out["doc_id"] == 0].iloc[0]
    assert row0["text_redacted"] == good and row0["n_tokens"] == 10
