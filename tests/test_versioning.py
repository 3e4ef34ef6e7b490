"""CDC merge/upsert classification and value-resolution semantics."""

from __future__ import annotations

from llm_data_pipeline_spark.operators.versioning import merge_upsert


def test_merge_upsert_actions_and_values(spark):
    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three"), (4, "four")],
        "doc_id long, text string",
    )
    inc = spark.createDataFrame(
        [
            (2, "U", "two-v2"),  # update
            (3, "D", None),  # delete existing
            (9, "D", None),  # delete missing -> noop
            (5, "I", "five"),  # insert new
            (4, "I", "four-v2"),  # mislabelled insert of existing -> updated
        ],
        "doc_id long, op string, text string",
    )
    out = {r.doc_id: r for r in merge_upsert(base, inc).collect()}
    assert out[1].action == "unchanged" and out[1].text == "one"
    assert out[2].action == "updated" and out[2].text == "two-v2"
    assert out[3].action == "deleted" and out[3].text is None
    assert out[9].action == "noop_delete" and out[9].text is None
    assert out[5].action == "inserted" and out[5].text == "five"
    # op letter is not trusted: base existence decides inserted vs updated
    assert out[4].action == "updated" and out[4].text == "four-v2"
    assert len(out) == 6
    # next snapshot = survivors only
    merged = merge_upsert(base, inc)
    snap = {
        r.doc_id
        for r in merged.filter(
            ~merged.action.isin("deleted", "noop_delete")
        ).collect()
    }
    assert snap == {1, 2, 4, 5}


def test_merge_upsert_multiple_value_columns(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "doc_id long, text string, score int"
    )
    inc = spark.createDataFrame(
        [(2, "U", "b2", 25)], "doc_id long, op string, text string, score int"
    )
    out = {
        r.doc_id: r
        for r in merge_upsert(
            base, inc, value_cols=("text", "score")
        ).collect()
    }
    assert (out[2].text, out[2].score) == ("b2", 25)
    assert (out[1].text, out[1].score) == ("a", 10)
