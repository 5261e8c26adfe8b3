"""Spell-correction stage (reference lib/spellkit_stub.rb:53-73)."""

import pyarrow as pa


def test_correct_documents(ray_session):
    import ray

    from phrasekit_ray.stages.spell import correct_documents

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the profein bufer was used",
                    "rat cdk10 oligoo probe",
                    "nothing to fix here",
                ]
            ),
        }
    )
    out = {
        r["doc_id"]: r["corrected_text"]
        for r in correct_documents(ray.data.from_arrow(tbl)).iter_rows()
    }
    assert out[1] == "the protein buffer was used"
    # cdk10 is protected; oligoo corrected
    assert out[2] == "rat cdk10 oligo probe"
    assert out[3] == "nothing to fix here"


def test_protected_term_bypasses_correction(ray_session):
    import ray

    from phrasekit_ray.runtime import SpellCorrectorStub
    from phrasekit_ray.stages.spell import correct_documents

    stub = SpellCorrectorStub(
        corrections={"cdk10": "wrong"}, protected={"cdk10"}
    )
    tbl = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["rat CDK10 assay"])}
    )
    out = list(correct_documents(ray.data.from_arrow(tbl), corrector=stub).iter_rows())
    assert out[0]["corrected_text"] == "rat CDK10 assay"


def test_correct_documents_drops_null_text_rows(ray_session):
    """A null text row yields NO output row (SQL-twin parity: unnest of
    NULL produces no rows), not corrected_text=''."""
    import pyarrow as pa
    import ray

    from phrasekit_ray.stages.spell import correct_documents

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["a", "b"],
                "text": pa.array(["the profein assay", None], pa.string()),
            }
        )
    )
    rows = correct_documents(ds).take_all()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == "a"
    assert rows[0]["corrected_text"] == "the protein assay"
