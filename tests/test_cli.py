"""CLI subcommands (reference binaries phrasekit_mine/score/build/tag)."""

import json

import pyarrow.parquet as pq


def test_cli_mine_score_build_tag_chain(ray_session, tmp_path, capsys):
    from phrasekit_ray.cli import main
    from phrasekit_ray.sources.pages import background_table

    pq.write_table(background_table(), str(tmp_path / "bg.parquet"))
    mine_cfg = tmp_path / "mine.json"
    mine_cfg.write_text(json.dumps({"min_n": 2, "max_n": 3, "min_count": 5}))
    score_cfg = tmp_path / "score.json"
    score_cfg.write_text(json.dumps({"min_domain_count": 5}))

    assert main([
        "mine",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", str(tmp_path / "ngrams"),
        "--config", str(mine_cfg),
    ]) == 0
    assert main([
        "score",
        "--domain", str(tmp_path / "ngrams"),
        "--background", str(tmp_path / "bg.parquet"),
        "--output", str(tmp_path / "scored"),
        "--config", str(score_cfg),
    ]) == 0
    assert main([
        "build",
        "--phrases", str(tmp_path / "scored"),
        "--output", str(tmp_path / "artifact"),
    ]) == 0
    assert main([
        "tag",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--artifact", str(tmp_path / "artifact"),
        "--output", str(tmp_path / "tagged"),
        "--concurrency", "2",
    ]) == 0

    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    stages = [l["stage"] for l in lines]
    assert stages == ["mine", "score", "build", "tag"]
    assert lines[3]["documents"] == 500
    tagged = pq.read_table(str(tmp_path / "tagged"))
    assert {"doc_id", "spans"} <= set(tagged.column_names)
    assert tagged.num_rows == 500


def test_cli_dedup_exact(ray_session, tmp_path, sf_dir):
    import pyarrow.parquet as pq

    from phrasekit_ray.cli import main

    out = str(tmp_path / "kept")
    rc = main(
        [
            "dedup",
            "--input", f"{sf_dir}/documents.parquet",
            "--output", out,
            "--method", "exact",
        ]
    )
    assert rc == 0
    import glob

    files = glob.glob(f"{out}/*.parquet")
    assert files
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert n > 0


def test_cli_dedup_minhash(ray_session, tmp_path, sf_dir):
    from phrasekit_ray.cli import main

    out = str(tmp_path / "pairs")
    rc = main(
        [
            "dedup",
            "--input", f"{sf_dir}/documents.parquet",
            "--output", out,
            "--method", "minhash",
        ]
    )
    assert rc == 0


def test_cli_dedup_minhash_custom_id_col(ray_session, tmp_path, sf_dir):
    """--id-col other than doc_id must work: tokenize standardizes the id
    column name, and the pair stage must follow (review finding)."""
    import pyarrow.parquet as _pq

    from phrasekit_ray.cli import main

    t = _pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    t = t.rename_columns(["page_id", "text"])
    src = str(tmp_path / "renamed.parquet")
    _pq.write_table(t, src)
    out = str(tmp_path / "pairs2")
    rc = main(
        [
            "dedup",
            "--input", src,
            "--output", out,
            "--method", "minhash",
            "--id-col", "page_id",
        ]
    )
    assert rc == 0


def test_cli_profile(ray_session, tmp_path, sf_dir):
    import pyarrow.parquet as _pq

    from phrasekit_ray.cli import main

    out = str(tmp_path / "profile.parquet")
    rc = main(
        ["profile", "--input", f"{sf_dir}/events.parquet",
         "--output", out, "--columns", "event_type,user_id"]
    )
    assert rc == 0
    t = _pq.read_table(out)
    assert t.column_names[:3] == ["column", "n_rows", "n_null"]
    assert set(t["column"].to_pylist()) == {"event_type", "user_id"}


def test_cli_classify(ray_session, tmp_path, sf_dir):
    import pyarrow.parquet as _pq

    from phrasekit_ray.cli import main

    out = str(tmp_path / "clf")
    rc = main(["classify", "--input", f"{sf_dir}/documents.parquet",
               "--output", out])
    assert rc == 0
    import glob

    files = glob.glob(out + "/*.parquet")
    assert files
    t = _pq.read_table(files[0])
    assert {"doc_id", "score", "logit", "label"} <= set(t.column_names)


def test_cli_decontaminate(ray_session, tmp_path, sf_dir):
    import glob

    import pyarrow.parquet as _pq

    from phrasekit_ray.cli import main

    out = str(tmp_path / "decon")
    rc = main(
        ["decontaminate", "--train", f"{sf_dir}/documents.parquet",
         "--bench", f"{sf_dir}/documents.parquet", "--output", out, "--k", "3"]
    )
    assert rc == 0
    files = glob.glob(out + "/*.parquet")
    t = _pq.read_table(files[0]) if files else None
    # train == bench: every doc with >= 3 tokens flags itself
    assert t is not None and t.num_rows > 0


def test_cli_pack(ray_session, tmp_path, sf_dir):
    import glob

    import pyarrow.parquet as pq

    from phrasekit_ray.cli import main

    out = str(tmp_path / "bins")
    rc = main(
        [
            "pack",
            "--input", f"{sf_dir}/documents.parquet",
            "--output", out,
            "--capacity", "2048",
            "--tokens-col", "n_chars",
        ]
    )
    assert rc == 0
    files = glob.glob(f"{out}/*.parquet")
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    t = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    assert n == t  # every doc assigned exactly once


def test_cli_communities(ray_session, tmp_path):
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from phrasekit_ray.cli import main

    edges = tmp_path / "edges.parquet"
    pq.write_table(
        pa.table(
            {
                "src": pa.array([0, 1, 10, 11], pa.int64()),
                "dst": pa.array([1, 2, 11, 12], pa.int64()),
            }
        ),
        str(edges),
    )
    out = str(tmp_path / "labels")
    rc = main(
        ["communities", "--input", str(edges), "--output", out,
         "--max-rounds", "4"]
    )
    assert rc == 0
    files = glob.glob(f"{out}/*.parquet")
    got = pa.concat_tables(pq.read_table(f) for f in files)
    labels = dict(zip(got["node"].to_pylist(), got["label"].to_pylist()))
    # two chains → two label groups
    assert len(labels) == 6
    assert len({labels[0], labels[1], labels[2]} & {labels[10], labels[11], labels[12]}) == 0


def test_cli_pivot_unpivot_roundtrip(ray_session, tmp_path, sf_dir):
    import glob

    import pyarrow.parquet as pq

    from phrasekit_ray.cli import main

    wide = str(tmp_path / "wide")
    rc = main(
        [
            "pivot",
            "--input", f"{sf_dir}/events.parquet",
            "--output", wide,
            "--key", "user_id",
            "--cat-col", "event_type",
            "--value-col", "value",
            "--categories", "click,view,purchase",
        ]
    )
    assert rc == 0
    wfiles = glob.glob(f"{wide}/*.parquet")
    wt = pq.read_table(wfiles)
    assert {"user_id", "click_sum", "view_sum", "purchase_sum"} <= set(
        wt.column_names
    )

    longd = str(tmp_path / "long")
    rc = main(
        [
            "unpivot",
            "--input", wide,
            "--output", longd,
            "--id-cols", "user_id",
            "--value-cols", "click_sum,view_sum,purchase_sum",
            "--cat-name", "event_col",
            "--value-name", "vsum",
        ]
    )
    assert rc == 0
    lt = pq.read_table(glob.glob(f"{longd}/*.parquet"))
    assert set(lt.column_names) == {"user_id", "event_col", "vsum"}
    # every non-null wide cell melts to exactly one row
    import pyarrow.compute as pc_

    nn = sum(
        int(pc_.sum(pc_.cast(pc_.is_valid(wt[c]), "int64")).as_py() or 0)
        for c in ["click_sum", "view_sum", "purchase_sum"]
    )
    assert lt.num_rows == nn


def test_cli_rank_window(ray_session, tmp_path, sf_dir):
    import glob

    import pyarrow.parquet as pq

    from phrasekit_ray.cli import main

    out = str(tmp_path / "ranks")
    rc = main(
        [
            "rank-window",
            "--input", f"{sf_dir}/events.parquet",
            "--output", out,
            "--ntile-k", "4",
        ]
    )
    assert rc == 0
    t = pq.read_table(glob.glob(f"{out}/*.parquet"))
    assert {"event_id", "rn", "ntile", "pr_micro"} <= set(t.column_names)
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    assert t.num_rows == n


def test_cli_funnel_chunk_zscore(ray_session, tmp_path, sf_dir):
    import glob

    import pyarrow.parquet as pq

    from phrasekit_ray.cli import main

    fo = str(tmp_path / "funnel")
    rc = main(
        [
            "funnel",
            "--input", f"{sf_dir}/events.parquet",
            "--output", fo,
            "--steps", "view,click,purchase",
        ]
    )
    assert rc == 0
    ft = pq.read_table(glob.glob(f"{fo}/*.parquet"))
    assert set(ft.column_names) == {"step_idx", "step", "users"}
    assert ft.num_rows == 3
    by_idx = dict(zip(ft["step_idx"].to_pylist(), ft["users"].to_pylist()))
    # funnel counts are monotone non-increasing down the steps
    assert by_idx[0] >= by_idx[1] >= by_idx[2]

    co = str(tmp_path / "chunks")
    rc = main(
        [
            "chunk",
            "--input", f"{sf_dir}/documents.parquet",
            "--output", co,
            "--window", "32",
            "--stride", "24",
        ]
    )
    assert rc == 0
    ct = pq.read_table(glob.glob(f"{co}/*.parquet"))
    assert {"doc_id", "chunk_idx", "chunk_text", "n_tokens"} == set(
        ct.column_names
    )
    ndocs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    assert ct.num_rows >= ndocs  # every doc emits >= 1 chunk

    zo = str(tmp_path / "z")
    rc = main(
        [
            "zscore",
            "--input", f"{sf_dir}/events.parquet",
            "--output", zo,
            "--key-col", "user_id",
            "--value-col", "value",
        ]
    )
    assert rc == 0
    zt = pq.read_table(glob.glob(f"{zo}/*.parquet"))
    assert "zscore_micro" in zt.column_names
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    assert zt.num_rows == n


def test_cli_links_mix_excise(ray_session, tmp_path, sf_dir):
    import glob

    import pyarrow.parquet as pq

    from phrasekit_ray.cli import main
    from phrasekit_ray.sources.pages import pages_from_documents

    pages_path = str(tmp_path / "pages")
    pages_from_documents(sf_dir, with_links=True).write_parquet(pages_path)

    lo = str(tmp_path / "hostgraph")
    rc = main(
        ["links", "--pages", pages_path, "--output", lo, "--host-graph"]
    )
    assert rc == 0
    lt = pq.read_table(glob.glob(f"{lo}/*.parquet"))
    assert set(lt.column_names) == {"src_host", "dst_host", "n"}
    assert lt.num_rows > 0

    mo = str(tmp_path / "mixed")
    rc = main(
        [
            "mix",
            "--input", f"{sf_dir}/documents.parquet",
            "--output", mo,
            "--rate", "src0=2.0",
            "--rate", "src1=0.0",
        ]
    )
    assert rc == 0
    mt = pq.read_table(glob.glob(f"{mo}/*.parquet"))
    srcs = mt["source"].to_pylist()
    ndocs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
    n0 = ndocs["source"].to_pylist().count("src0")
    assert srcs.count("src0") == 2 * n0 and srcs.count("src1") == 0

    eo = str(tmp_path / "excised")
    rc = main(
        [
            "excise",
            "--input", f"{sf_dir}/documents.parquet",
            "--output", eo,
            "--k", "5",
        ]
    )
    assert rc == 0
    et = pq.read_table(glob.glob(f"{eo}/*.parquet"))
    assert set(et.column_names) == {"doc_id", "clean_text", "n_removed"}
    assert et.num_rows == pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows


def test_cli_warc_to_parquet(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from phrasekit_ray.cli import main
    from phrasekit_ray.sources.warc import write_warc_file

    pages = [
        {
            "url": f"https://w.org/{i}",
            "warc_ts": 1696896000_000_000 + i,
            "html": f"<p>doc {i}</p>".encode(),
        }
        for i in range(6)
    ]
    wpath = str(tmp_path / "in.warc.gz")
    write_warc_file(wpath, pages, compress=True)
    out = str(tmp_path / "pages_pq")
    rc = main(["warc-to-parquet", "--input", wpath, "--output", out])
    assert rc == 0
    t = pq.read_table(glob.glob(f"{out}/*.parquet"))
    assert t.num_rows == 6
    assert set(t.column_names) >= {"url", "warc_ts", "html", "http_status"}


def test_cli_ssjoin_prefix_matches_exact(ray_session, tmp_path, sf_dir):
    from phrasekit_ray.cli import main

    assert main([
        "ssjoin", "--input", f"{sf_dir}/documents.parquet",
        "--output", str(tmp_path / "p"), "--method", "prefix",
        "--threshold", "0.8",
    ]) == 0
    assert main([
        "ssjoin", "--input", f"{sf_dir}/documents.parquet",
        "--output", str(tmp_path / "e"), "--method", "exact",
        "--threshold", "0.8",
    ]) == 0
    a = pq.read_table(str(tmp_path / "p")).sort_by(
        [("left", "ascending"), ("right", "ascending")]
    )
    b = pq.read_table(str(tmp_path / "e")).sort_by(
        [("left", "ascending"), ("right", "ascending")]
    )
    assert a.equals(b)


def test_cli_mh_index_and_winnow(ray_session, tmp_path, sf_dir):
    from phrasekit_ray.cli import main

    assert main([
        "mh-index", "--index-dir", str(tmp_path / "idx"),
        "--append", f"{sf_dir}/documents.parquet", "--snapshot", "a",
        "--pairs-output", str(tmp_path / "pairs"),
    ]) == 0
    assert pq.read_table(str(tmp_path / "pairs")).num_rows >= 0
    assert main([
        "winnow", "--input", f"{sf_dir}/documents.parquet",
        "--output", str(tmp_path / "wn"),
    ]) == 0
    wn = pq.read_table(str(tmp_path / "wn"))
    assert set(wn.column_names) == {"doc_id", "pos", "h62"}
    assert wn.num_rows > 0


def test_cli_compact(ray_session, tmp_path, sf_dir):
    import ray

    from phrasekit_ray.cli import main
    from phrasekit_ray.state.lineage import read_partitioned, write_zonemapped

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    root = str(tmp_path / "zm")
    write_zonemapped(docs, root, "s1", "n_chars", 4)
    write_zonemapped(docs, root, "s2", "n_chars", 4)
    assert main([
        "compact", "--root", root, "--stages", "s1", "s2",
        "--out-stage", "c", "--zone-col", "n_chars",
        "--num-partitions", "8",
    ]) == 0
    assert read_partitioned(root, "c").count() == 2 * docs.count()
