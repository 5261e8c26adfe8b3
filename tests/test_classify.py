"""Hashed linear classifier (batched model-inference stage shape)."""

import hashlib

import numpy as np
import pyarrow as pa

from phrasekit_ray.stages.classify import (
    HashedLinearClassifier,
    _weight_table,
    classify_documents,
)


def test_weight_table_deterministic_and_bounded():
    w = _weight_table(256, 13)
    assert w.min() >= -3 and w.max() <= 3
    assert (w == _weight_table(256, 13)).all()
    assert not (w == _weight_table(256, 14)).all()


def test_classifier_matches_per_token_reference(ray_session):
    import ray

    texts = ["spark merge window table", "", "a a a a a", "sort join the"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts)})
    got = (
        classify_documents(ray.data.from_arrow(t), num_buckets=512, seed=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    w = _weight_table(512, 3)
    for i, txt in enumerate(texts):
        score = 0
        for tok in txt.split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            score += int(w[h % 512])
        assert got.loc[i, "score"] == score
        assert got.loc[i, "logit"] == score / 8.0
        assert got.loc[i, "label"] == (1 if score >= 0 else 0)


def test_classifier_actor_state_built_once():
    clf = HashedLinearClassifier(num_buckets=128, seed=5)
    b = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["x y z"])})
    r1 = clf(b)
    r2 = clf(b)
    assert r1.equals(r2)
