"""CSV corpus source: malformed-line policy (skip+warn / strict raise),
quoted delimiters, header validation, multi-file distributed read."""

import warnings

import pyarrow as pa
import pytest

from phrasekit_ray.sources.csv import read_corpus_csv


def _collect(ds) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_csv_basic_and_quoted(ray_session, tmp_path):
    p = _write(
        tmp_path, "a.csv",
        ['doc_id,text,lang', '1,"hello, world",en', '2,plain,de'],
    )
    t = _collect(read_corpus_csv(p, ["doc_id", "text", "lang"])).sort_by(
        "doc_id"
    )
    assert t["text"].to_pylist() == ["hello, world", "plain"]
    assert t["lang"].to_pylist() == ["en", "de"]


def test_read_csv_skips_short_rows_lenient_raises_strict(ray_session, tmp_path):
    p = _write(
        tmp_path, "b.csv",
        ["doc_id,text,lang", "1,ok,en", "2,missing-lang", "3,fine,fr"],
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        t = _collect(read_corpus_csv(p, ["doc_id", "text", "lang"]))
    assert sorted(t["doc_id"].to_pylist()) == ["1", "3"]
    with pytest.raises(Exception, match="fields"):
        _collect(read_corpus_csv(p, ["doc_id", "text", "lang"], strict=True))


def test_read_csv_header_mismatch_raises(ray_session, tmp_path):
    p = _write(tmp_path, "c.csv", ["wrong,header,row", "1,x,en"])
    with pytest.raises(ValueError, match="header mismatch"):
        read_corpus_csv(p, ["doc_id", "text", "lang"])


def test_read_csv_multi_file(ray_session, tmp_path):
    p1 = _write(tmp_path, "d1.csv", ["doc_id,text", "1,a", "2,b"])
    p2 = _write(tmp_path, "d2.csv", ["doc_id,text", "3,c"])
    t = _collect(read_corpus_csv([p1, p2], ["doc_id", "text"]))
    assert sorted(t["doc_id"].to_pylist()) == ["1", "2", "3"]


def test_read_csv_extra_fields_ignored_tsv(ray_session, tmp_path):
    p = _write(
        tmp_path, "e.tsv",
        ["doc_id\ttext", "1\thello\textra", "2\tworld"],
    )
    t = _collect(
        read_corpus_csv(p, ["doc_id", "text"], delimiter="\t")
    ).sort_by("doc_id")
    assert t["text"].to_pylist() == ["hello", "world"]
