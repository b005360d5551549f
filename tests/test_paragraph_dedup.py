"""paragraph_dedup (operators/dedup.py): first-occurrence-wins semantics
on a hand-built corpus — shared boilerplate, intra-doc repeats, blank
lines, and the dedupes-to-empty document."""

from __future__ import annotations

from etl_drone_sense_spark.operators.dedup import paragraph_dedup


def test_paragraph_dedup_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "HEADER\nbody one\nFOOTER"),
            (2, "HEADER\nbody two\nFOOTER"),
            (3, "HEADER"),  # nothing original -> empty after dedup
            (4, "solo\n\n  \nsolo"),  # blanks dropped; 2nd 'solo' is a dup
            (5, ""),  # blank doc: 0 paragraphs
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    assert out[1].text_clean == "HEADER\nbody one\nFOOTER"
    assert out[2].text_clean == "body two" and out[2].n_kept == 1
    assert out[3].text_clean == "" and out[3].n_paras == 1 and out[3].n_kept == 0
    assert out[4].text_clean == "solo" and out[4].n_paras == 2
    assert out[5].n_paras == 0 and out[5].text_clean == ""
