"""End-to-end pipeline tests on the deterministic fixture pages
(reference examples/end_to_end_demo.rb flow; FIXTURES.md §1)."""

import pyarrow as pa
import pytest

from phrasekit_ray.config import KGConfig, MineConfig, ScoreConfig, TagConfig
from phrasekit_ray.pipelines.kg import run_kg_pipeline
from phrasekit_ray.pipelines.phrase import run_phrase_pipeline
from phrasekit_ray.sources import pages as pagesmod
from phrasekit_ray.stages.extract import extract_tokens


@pytest.fixture(scope="module")
def pages_ds(ray_session):
    import ray

    return ray.data.from_arrow(pagesmod.synthesize_pages_table())


def test_extract_invariant_byte_identical(ray_session):
    """Per-row invariant: extracted text from html == text column, per url."""
    import ray

    tbl = pagesmod.synthesize_pages_table()
    # null out text → force html path
    tbl_html = tbl.set_column(
        tbl.column_names.index("text"), "text", pa.nulls(len(tbl), pa.string())
    )
    a = {
        r["doc_id"]: r["text"]
        for r in extract_tokens(
            ray.data.from_arrow(tbl), keep_text=True
        ).iter_rows()
    }
    b = {
        r["doc_id"]: r["text"]
        for r in extract_tokens(
            ray.data.from_arrow(tbl_html), keep_text=True
        ).iter_rows()
    }
    assert a == b
    assert len(a) == len(tbl)


def test_phrase_pipeline_end_to_end(pages_ds):
    res = run_phrase_pipeline(
        pages_ds,
        pagesmod.background_table(),
        MineConfig(min_n=2, max_n=5, min_count=2),
        ScoreConfig(min_domain_count=2),
    )
    assert res.build_stats.built > 0
    assert res.artifact.num_patterns == res.build_stats.built
    tagged = {r["doc_id"]: r for r in res.tagged.iter_rows()}
    # demo doc_1 contains "rat cdk10 oligo" (mined, high salience)
    d1 = tagged["https://example.org/doc/doc_1"]
    texts = {" ".join(d1["tokens"][s["start"] : s["end"]]) for s in d1["spans"]}
    assert "rat cdk10 oligo" in texts
    # background-suppressed phrases never tagged: "lysis buffer" (bg count 8
    # → ratio 6/9 < 2.0) and "in the"/"for the" (huge bg counts)
    for r in tagged.values():
        spantexts = {
            " ".join(r["tokens"][s["start"] : s["end"]]) for s in r["spans"]
        }
        assert "lysis buffer" not in spantexts
        assert "in the" not in spantexts


def test_lang_filter(pages_ds):
    res = run_phrase_pipeline(
        pages_ds,
        pagesmod.background_table(),
        MineConfig(min_n=2, max_n=3, min_count=2),
        ScoreConfig(min_domain_count=2),
        lang_allow=("en",),
    )
    ids = [r["doc_id"] for r in res.tagged.iter_rows()]
    assert all("uni_" not in i and "/de/" not in i for i in ids)


def test_kg_pipeline_end_to_end(pages_ds, tmp_path):
    res = run_kg_pipeline(
        pages_ds,
        pagesmod.background_table(),
        MineConfig(min_n=2, max_n=5, min_count=2),
        ScoreConfig(min_domain_count=2),
        output_root=str(tmp_path / "kg"),
        num_partitions=4,
    )
    nodes = list(res.nodes.iter_rows())
    edges = list(res.edges.iter_rows())
    assert nodes and edges
    # canonicalization collapsed "rat cdk10"-family into one entity
    canon = {r["canonical"]: r for r in nodes}
    assert "rat cdk10" in canon
    by_pid = dict(zip(res.artifact.phrase_ids.tolist(), res.artifact.pattern_tokens))
    fam = [p for p, t in by_pid.items() if t[:2] == ["rat", "cdk10"]]
    assert len(fam) >= 2
    assert len({res.mapping[p] for p in fam}) == 1
    # lineage written + resumable
    assert res.write_summary["nodes"]["written"] == 4
    from phrasekit_ray.state import lineage

    back = lineage.read_partitioned(str(tmp_path / "kg"), "nodes")
    assert back.count() == len(nodes)


def test_triples_match_oracle_semantics(pages_ds):
    """Differential triple check: Ray pipeline triples vs a pure-Python
    oracle applying reference semantics (P/R must be 1.0 ≥ 0.95 target)."""
    from phrasekit_ray.core.artifact import build_artifact
    from phrasekit_ray.core import normalize
    from phrasekit_ray.stages import kg as kgmod

    mine_cfg = MineConfig(min_n=2, max_n=5, min_count=2)
    score_cfg = ScoreConfig(min_domain_count=2)
    res = run_kg_pipeline(pages_ds, pagesmod.background_table(), mine_cfg, score_cfg)
    got = {
        (r["doc_id"], r["subj"], r["pred"], r["obj"])
        for r in res.triples.iter_rows()
    }

    # oracle: single-threaded reference-semantics pipeline over same pages
    tbl = pagesmod.synthesize_pages_table()
    docs = [
        (f"https://example.org/{u.split('/')[-2]}/{u.split('/')[-1]}", t)
        for u, t in zip(tbl["url"].to_pylist(), tbl["text"].to_pylist())
    ]
    toks = {u.split("//")[1]: None for u, _ in docs}  # noqa: F841 (clarity)
    corpus = {u: normalize.tokenize_text(t) for u, t in docs}
    from collections import Counter

    counts = Counter()
    for tokens in corpus.values():
        for n in range(mine_cfg.min_n, mine_cfg.max_n + 1):
            for i in range(len(tokens) - n + 1):
                counts[tuple(tokens[i : i + n])] += 1
    bg = {tuple(k): c for k, c in pagesmod.DEMO_BACKGROUND}
    import numpy as np

    kept = []
    for tokens_t, c in counts.items():
        if c < mine_cfg.min_count or c < score_cfg.min_domain_count:
            continue
        b = bg.get(tokens_t, 0)
        sal = np.float32(c) / np.float32(b + 1)
        if sal >= np.float32(score_cfg.min_salience):
            kept.append((tokens_t, float(sal), c, b))
    kept.sort(key=lambda r: (-r[1], " ".join(r[0])))
    rows = [
        {"tokens": list(t), "phrase_id": 1000 + i, "salience": s, "count": c}
        for i, (t, s, c, b) in enumerate(kept)
    ]
    art, _ = build_artifact(rows)
    mapping = kgmod.canonical_mapping(
        art.phrase_ids, kgmod.alias_edges_from_artifact(art)
    )
    want = set()
    for u, tokens in corpus.items():
        ms = art.match_tokens(tokens, policy="leftmost_longest", max_matches=100)
        for a, b_ in zip(ms, ms[1:]):
            if b_["start"] - a["end"] <= 50:
                want.add(
                    (
                        u,
                        mapping[a["phrase_id"]],
                        "co_mentioned_with",
                        mapping[b_["phrase_id"]],
                    )
                )
    assert got == want  # P/R == 1.0


def test_kg_pipeline_distributed_canonicalization_same_mapping(pages_ds):
    """canonicalize='distributed' (hash-min CC) == driver union-find."""
    a = run_kg_pipeline(
        pages_ds, pagesmod.background_table(),
        MineConfig(min_n=2, max_n=4, min_count=2), ScoreConfig(min_domain_count=2),
    )
    b = run_kg_pipeline(
        pages_ds, pagesmod.background_table(),
        MineConfig(min_n=2, max_n=4, min_count=2), ScoreConfig(min_domain_count=2),
        canonicalize="distributed",
    )
    assert a.mapping == b.mapping


def test_kg_pipeline_zero_phrases_graceful(ray_session):
    """Thresholds that kill every phrase must flow through to empty
    (but well-formed) mention/triple/node/edge outputs, not crash."""
    import ray

    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": ["u1", "u2"],
                "warc_ts": pa.array([0, 1], pa.timestamp("us")),
                "html": pa.array([None, None], pa.binary()),
                "text": ["only two words", "other words here"],
                "lang": ["en", "en"],
            }
        )
    )
    res = run_kg_pipeline(
        pages, {}, MineConfig(min_n=2, max_n=5, min_count=99),
        ScoreConfig(min_domain_count=99),
    )
    assert res.artifact.num_patterns == 0
    assert res.edges.count() == 0
    assert res.nodes.count() == 0


def test_kg_run_manifest_stage_metrics(pages_ds, tmp_path):
    import json

    run_kg_pipeline(
        pages_ds,
        pagesmod.background_table(),
        MineConfig(min_n=2, max_n=2, min_count=2),
        ScoreConfig(min_domain_count=2),
        output_root=str(tmp_path / "kg"),
        num_partitions=2,
        collect_stage_stats=True,
    )
    man = json.loads((tmp_path / "kg" / "run_manifest.json").read_text())
    assert man["build_stats"]["built"] > 0
    m = man["metrics"]
    assert m["phrases_scored"] == man["build_stats"]["total_input"]
    assert m["tagging"]["documents"] > 0
    assert m["tagging"]["total_spans"] >= m["tagging"]["documents_with_spans"]


def test_read_partitioned_all_empty_stage(ray_session, tmp_path):
    import ray

    from phrasekit_ray.state import lineage

    empty = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    lineage.write_dataset_resumable(
        empty, str(tmp_path), "nothing", {"cfg": 1}, partition_col="k",
        num_partitions=4
    )
    back = lineage.read_partitioned(str(tmp_path), "nothing")
    assert back.count() == 0


def test_bucketed_join_string_keys(ray_session, tmp_path):
    import ray

    from phrasekit_ray.state import lineage

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["a", "b", "c"], pa.string()),
                "lv": pa.array([1, 2, 3], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["b", "c", "d"], pa.string()),
                "rv": pa.array([20, 30, 40], pa.int64()),
            }
        )
    )
    lineage.write_dataset_resumable(
        left, str(tmp_path), "L", {"cfg": 1}, partition_col="k",
        num_partitions=4
    )
    lineage.write_dataset_resumable(
        right, str(tmp_path), "R", {"cfg": 1}, partition_col="k",
        num_partitions=4
    )
    out = lineage.bucketed_join(
        str(tmp_path), "L", str(tmp_path), "R", "k", "k", 4
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out.k.tolist() == ["b", "c"]
    assert out.rv.tolist() == [20, 30]


def test_with_row_index_uint32_overflow_raises(ray_session):
    import ray

    from phrasekit_ray.state.rowindex import with_row_index

    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(list(range(5)), pa.int64())})
    )
    with pytest.raises(OverflowError):
        with_row_index(ds, start=2**32 - 2)


def test_extract_fills_null_text_from_html_selectively(ray_session):
    """Rows with null text are filled from html; rows with text never touch
    html (the fill path materializes only the null-text rows)."""
    import numpy as np

    tbl = pa.table(
        {
            "url": ["u1", "u2", "u3"],
            "warc_ts": pa.array(np.array([0, 1, 2], dtype="int64"), pa.timestamp("us")),
            "html": [b"", b"<html><body>From HTML body</body></html>", b""],
            "text": pa.array(["hello world", None, "Third Doc"], pa.string()),
            "lang": ["en", "en", "en"],
        }
    )
    import ray

    out = extract_tokens(ray.data.from_arrow(tbl), keep_text=True).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["u2"]["text"] == "From HTML body"
    assert by_id["u2"]["tokens"] == ["from", "html", "body"]
    assert by_id["u1"]["tokens"] == ["hello", "world"]
    assert by_id["u3"]["text"] == "Third Doc"
