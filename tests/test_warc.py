"""WARC source: byte-format round-trip, gzip members, malformed-record
policy, and composition with link extraction."""

import pyarrow as pa

from phrasekit_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc_file,
)


def _pages(n, base=0):
    return [
        {
            "url": f"https://h{i % 3}.org/{i}",
            "warc_ts": 1696896000_000_000 + i * 1_000_000,
            "html": (
                f'<html><body><p>doc {i}</p>'
                f'<a href="https://t.org/{i}"></a></body></html>'
            ).encode(),
        }
        for i in range(base, base + n)
    ]


def _collect(ds) -> pa.Table:
    import ray

    return pa.concat_tables(
        [
            t
            for t in ray.get(ds.materialize().to_arrow_refs())
            if t.num_columns
        ],
        promote_options="default",
    )


def test_warc_roundtrip_plain_and_gzip(ray_session, tmp_path):
    pages = _pages(20)
    write_warc_file(str(tmp_path / "a.warc"), pages[:10])
    write_warc_file(str(tmp_path / "b.warc.gz"), pages[10:], compress=True)
    ds = read_warc([str(tmp_path / "a.warc"), str(tmp_path / "b.warc.gz")])
    t = _collect(ds).sort_by("url")
    exp = sorted(pages, key=lambda p: p["url"])
    assert t["url"].to_pylist() == [p["url"] for p in exp]
    assert t["html"].to_pylist() == [p["html"] for p in exp]
    assert t["warc_ts"].cast(pa.int64()).to_pylist() == [
        p["warc_ts"] for p in exp
    ]
    assert set(t["http_status"].to_pylist()) == {200}
    assert set(t["content_type"].to_pylist()) == {"text/html"}


def test_warc_malformed_record_policy(tmp_path):
    pages = _pages(3)
    path = str(tmp_path / "c.warc")
    write_warc_file(path, pages)
    good = open(path, "rb").read()
    bad = b"GARBAGE\r\n\r\n" + good
    assert len(parse_warc_bytes(bad)) == 3  # lenient resync
    import pytest

    with pytest.raises(ValueError, match="version line"):
        parse_warc_bytes(bad, strict=True)
    # truncated header tail
    assert len(parse_warc_bytes(good[:-len(good) // 2])) <= 3


def test_warc_feeds_link_extraction(ray_session, tmp_path):
    from phrasekit_ray.stages.extract import extract_links

    write_warc_file(str(tmp_path / "d.warc"), _pages(8))
    links = _collect(extract_links(read_warc(str(tmp_path / "d.warc"))))
    assert links.num_rows == 8
    assert all(h.startswith("https://t.org/") for h in links["href"].to_pylist())


def test_orc_roundtrip_and_pruning(ray_session, tmp_path):
    from phrasekit_ray.sources.orc import read_orc, write_orc_file

    t = pa.table(
        {
            "a": pa.array([1, 2, 3], pa.int64()),
            "b": pa.array(["x", "y", "z"]),
            "c": pa.array([1.5, 2.5, 3.5], pa.float64()),
        }
    )
    p1 = str(tmp_path / "p1.orc")
    p2 = str(tmp_path / "p2.orc")
    write_orc_file(p1, t.slice(0, 2))
    write_orc_file(p2, t.slice(2))
    full = _collect(read_orc([p1, p2])).sort_by("a")
    assert full.equals(t)
    pruned = _collect(read_orc([p1, p2], columns=["b"]))
    assert pruned.column_names == ["b"]
    assert sorted(pruned["b"].to_pylist()) == ["x", "y", "z"]


def test_ipc_roundtrip_pruning_and_compression(ray_session, tmp_path):
    from phrasekit_ray.sources.ipc import read_ipc, write_ipc_file

    t = pa.table(
        {
            "a": pa.array([1, 2, 3], pa.int64()),
            "b": pa.array(["x", "y", "z"]),
            "c": pa.array([1.5, 2.5, 3.5], pa.float64()),
        }
    )
    p1 = str(tmp_path / "p1.feather")
    p2 = str(tmp_path / "p2.feather")
    write_ipc_file(p1, t.slice(0, 2))  # zstd default
    write_ipc_file(p2, t.slice(2), compression="uncompressed")
    full = _collect(read_ipc([p1, p2])).sort_by("a")
    assert full.equals(t)
    pruned = _collect(read_ipc([p1, p2], columns=["b"]))
    assert pruned.column_names == ["b"]
    assert sorted(pruned["b"].to_pylist()) == ["x", "y", "z"]
