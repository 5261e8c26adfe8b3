"""Text analysis operator tests."""

import numpy as np
import pyarrow as pa

from phrasekit_ray.stages import textstats


def ds_of(rows):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_token_counts(ray_session):
    ds = ds_of([(1, "a b c"), (2, ""), (3, "  x   y  ")])
    out = {r["doc_id"]: r["n_tokens"] for r in textstats.token_counts(ds).iter_rows()}
    assert out == {1: 3, 2: 0, 3: 2}


def test_bpe_ish_counts(ray_session):
    ds = ds_of([(1, "hello, world!"), (2, "a1b2")])
    out = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in textstats.bpe_ish_token_counts(ds).iter_rows()
    }
    assert out[1] == 4  # hello , world !
    assert out[2] == 4  # a 1 b 2


def test_language_id(ray_session):
    ds = ds_of(
        [
            (1, "the cat is in the house and the dog is on the mat"),
            (2, "der hund ist in der küche und die katze ist da"),
            (3, "el perro y el gato en la casa de los vecinos"),
            (4, "zzz qqq www"),
        ]
    )
    out = {r["doc_id"]: r["lang_pred"] for r in textstats.language_id(ds).iter_rows()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "und"


def test_quality_scores(ray_session):
    ds = ds_of(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "!!! ??? ### $$$ %%%"),
            (3, "ok"),
        ]
    )
    out = {r["doc_id"]: r for r in textstats.quality_scores(ds).iter_rows()}
    assert out[1]["quality_ok"] is True or out[1]["quality_ok"] == True  # noqa: E712
    assert not out[2]["quality_ok"]  # zero alpha ratio
    assert not out[3]["quality_ok"]  # too short
    assert out[1]["n_tokens"] == 9
    assert abs(out[1]["alpha_ratio"] - 1.0) < 1e-6


def test_fingerprints_deterministic_and_distinct(ray_session):
    ds = ds_of([(1, "Hello World"), (2, "hello world"), (3, "other text")])
    out = {r["doc_id"]: r["fingerprint"] for r in textstats.fingerprints(ds).iter_rows()}
    # case-insensitive: 1 == 2, distinct from 3
    assert out[1] == out[2]
    assert out[1] != out[3]
    out2 = {r["doc_id"]: r["fingerprint"] for r in textstats.fingerprints(ds).iter_rows()}
    assert out == out2


def test_fingerprints_match_reference_reimplementation(ray_session):
    """Differential: the vectorized power-table fingerprint equals a
    straight-line Horner evaluation of h = Σ b_i·P^(n-1-i) mod 2^64."""
    import ray

    texts = ["Hello World", "", "a", "The quick brown fox", "ünïcode tëxt"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = {
        r["doc_id"]: r["fingerprint"]
        for r in textstats.fingerprints(ds).iter_rows()
    }
    P = 1099511628211
    W = 1 << 64
    for i, t in enumerate(texts):
        acc = 0
        for b in t.lower().encode("utf-8"):
            acc = (acc * P + b) % W
        assert got[i] == acc, f"text {t!r}"


def test_repetition_stats_engineered(ray_session):
    import ray

    texts = [
        # "a b c" x3: trigram "a b c" occurs 3 times at 0,3,6 (others once);
        # every position covered except none — windows [0,3),[3,6),[6,9)
        # cover all 9; top bigram "a b" (and "b c") = 3, "c a" = 2
        "a b c a b c a b c",
        # no repeated trigram, repeated bigram "x y" twice (non-adjacent)
        "x y z w x y q",
        # short docs: 1 and 2 tokens
        "solo",
        "two tok",
        # overlapping duplicated trigrams: "p p p" at 0 and 1 covers 0..3
        "p p p p q r",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    got = (
        textstats.repetition_stats(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_tokens"].tolist() == [9, 7, 1, 2, 6]
    assert got["top_bigram_count"].tolist() == [3, 2, 0, 1, 3]
    # doc0: all 9 covered; doc1: none; doc4: windows at 0 and 1 cover 0-3 (4)
    assert got["dup_trigram_tokens"].tolist() == [9, 0, 0, 0, 4]
    assert got["dup_trigram_frac"].tolist() == [1.0, 0.0, 0.0, 0.0, 4 / 6]


def test_redact_patterns_engineered(ray_session):
    import ray

    texts = [
        "mail a@b.co and c.d+e@f.org twice",
        "call +1 555-123-4567 now",
        "the customer and the dup row",   # blocklist hits
        "customerless dupper untouched",  # \b guards: no hits
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts)})
    got = (
        textstats.redact_patterns(ray.data.from_arrow(t))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["n_email"].tolist() == [2, 0, 0, 0]
    assert got["n_phone"].tolist() == [0, 1, 0, 0]
    assert got["n_blocked"].tolist() == [0, 0, 2, 0]
    assert got.loc[0, "text_redacted"] == "mail [MASKED] and [MASKED] twice"
    assert got.loc[1, "text_redacted"] == "call [MASKED] now"
    assert got.loc[2, "text_redacted"] == "the [MASKED] and the [MASKED] row"
    assert got.loc[3, "text_redacted"] == texts[3]


def test_nfc_normalize_engineered(ray_session):
    import ray
    import unicodedata

    texts = ["plain ascii", "café", "already é", "Å ring"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts)})
    got = (
        textstats.nfc_normalize_texts(ray.data.from_arrow(t))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["text_nfc"].tolist() == [
        unicodedata.normalize("NFC", s) for s in texts
    ]
    assert got["changed"].tolist() == [False, True, False, True]


def test_quality_scores_trailing_empty_doc(ray_session):
    import ray

    from phrasekit_ray.stages.textstats import quality_scores

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["the cat sat", ""]),
        }
    )
    out = (
        quality_scores(ray.data.from_arrow(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.n_tokens.tolist() == [3, 0]
    assert out.mean_token_len.tolist()[1] == 0.0
