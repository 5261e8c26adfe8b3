"""Reference-format JSONL interop (SURVEY.md S1/S2/S4 semantics)."""

import json

import pyarrow as pa
import pytest

from phrasekit_ray.sources import jsonl


def test_read_corpus_skips_blank_and_malformed(ray_session, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": "a", "tokens": ["x", "y"]}\n'
        "\n"
        "not json at all\n"
        '{"tokens": ["z"]}\n'
    )
    with pytest.warns(UserWarning):
        ds = jsonl.read_corpus_jsonl(str(p))
    rows = list(ds.iter_rows())
    assert [r["doc_id"] for r in rows] == ["a", "line_1"]
    assert rows[0]["tokens"] == ["x", "y"]


def test_read_corpus_strict_aborts(ray_session, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text('{"tokens": ["x"]}\nbroken\n')
    with pytest.raises(ValueError, match="Line 2"):
        jsonl.read_corpus_jsonl(str(p), strict=True)


def test_read_ngrams_lowercase_last_wins(ray_session, tmp_path):
    p = tmp_path / "ngrams.jsonl"
    p.write_text(
        '{"tokens": ["Lysis", "Buffer"], "count": 3}\n'
        '{"tokens": ["lysis", "buffer"], "count": 9}\n'
    )
    rows = {r["ngram"]: r["count"] for r in jsonl.read_ngrams_jsonl(str(p)).iter_rows()}
    assert rows == {"lysis buffer": 9}  # lowercase merge, last wins


def test_ngram_write_read_roundtrip(ray_session, tmp_path):
    t = pa.table(
        {
            "ngram": pa.array(["a b", "c d"], pa.string()),
            "count": pa.array([5, 2], pa.uint64()),
        }
    )
    p = tmp_path / "out.jsonl"
    assert jsonl.write_ngrams_jsonl(t, str(p)) == 2
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert lines[0] == {"tokens": ["a", "b"], "count": 5}
    back = {r["ngram"]: r["count"] for r in jsonl.read_ngrams_jsonl(str(p)).iter_rows()}
    assert back == {"a b": 5, "c d": 2}


def test_write_scored_omits_missing_phrase_id(tmp_path):
    t = pa.table(
        {
            "ngram": pa.array(["a b"], pa.string()),
            "salience": pa.array([2.5], pa.float32()),
            "domain_count": pa.array([4], pa.uint32()),
            "background_count": pa.array([0], pa.uint32()),
        }
    )
    p = tmp_path / "scored.jsonl"
    jsonl.write_scored_jsonl(t, str(p))
    row = json.loads(p.read_text())
    assert "phrase_id" not in row  # serde skip_serializing_if parity
    assert row["tokens"] == ["a", "b"]


def test_write_tagged_reference_shape(tmp_path):
    spans_type = pa.list_(
        pa.struct(
            [
                ("start", pa.int32()),
                ("end", pa.int32()),
                ("phrase_id", pa.uint32()),
                ("label", pa.string()),
            ]
        )
    )
    t = pa.table(
        {
            "doc_id": pa.array(["d1"], pa.string()),
            "tokens": pa.array([["x", "y"]], pa.list_(pa.string())),
            "spans": pa.array(
                [[{"start": 0, "end": 2, "phrase_id": 7, "label": "PHRASE"}]],
                spans_type,
            ),
        }
    )
    p = tmp_path / "tagged.jsonl"
    assert jsonl.write_tagged_jsonl(t, str(p)) == 1
    row = json.loads(p.read_text())
    assert row == {
        "doc_id": "d1",
        "tokens": ["x", "y"],
        "spans": [{"start": 0, "end": 2, "phrase_id": 7, "label": "PHRASE"}],
    }


def test_read_corpus_jsonl_distributed(ray_session, tmp_path):
    import warnings

    from phrasekit_ray.sources.jsonl import read_corpus_jsonl_distributed

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": "a", "tokens": ["x", "y"]}\n'
        "\n"  # blank line skipped
        '{"tokens": ["z"]}\n'  # missing doc_id → null
        "not json\n"  # malformed → warn + skip
        '{"doc_id": "b", "tokens": []}\n'
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ds = read_corpus_jsonl_distributed(str(p))
        rows = sorted(
            ds.iter_rows(), key=lambda r: (r["doc_id"] is None, r["doc_id"] or "")
        )
    assert len(rows) == 3
    assert rows[0]["doc_id"] == "a" and rows[0]["tokens"] == ["x", "y"]
    assert rows[1]["doc_id"] == "b" and rows[1]["tokens"] == []
    assert rows[2]["doc_id"] is None and rows[2]["tokens"] == ["z"]


def test_read_corpus_jsonl_distributed_strict_raises(ray_session, tmp_path):
    import pytest
    import ray

    from phrasekit_ray.sources.jsonl import read_corpus_jsonl_distributed

    p = tmp_path / "bad.jsonl"
    p.write_text('{"tokens": ["ok"]}\nnot json\n')
    with pytest.raises(Exception):
        read_corpus_jsonl_distributed(str(p), strict=True).take_all()


def test_missing_required_field_skipped_non_strict(tmp_path):
    import warnings

    from phrasekit_ray.sources.jsonl import read_corpus_jsonl

    p = tmp_path / "c.jsonl"
    p.write_text(
        '{"doc_id": "a", "tokens": ["x"]}\n'
        '{"doc_id": "nofield"}\n'  # valid JSON, no tokens
        '{"doc_id": "b", "tokens": ["y"]}\n'
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ds = read_corpus_jsonl(str(p))
        assert ds.count() == 2
        assert any("missing field" in str(x.message) for x in w)
    with pytest.raises(ValueError):
        read_corpus_jsonl(str(p), strict=True)
