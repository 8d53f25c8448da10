"""Empty-document edge cases for the token/shingle explode queries.

``explode_outer`` emits a NULL row for an empty/null array; DuckDB's
``unnest`` emits none. The sf* testdata contains no empty documents,
so the standard parity sweep can't catch that divergence — this file
runs the affected registry queries (q84/q85/q86/q92) on a synthetic
documents table that *does* contain an empty doc, a whitespace-only
doc, and a doc shorter than the shingle width, and hash-compares each
against its own DuckDB oracle.
"""

from __future__ import annotations

import duckdb
import pytest

from building_energy_data_pipeline_spark.plans.queries import REGISTRY

from test_oracle_parity import canon

EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
    (1, "", "en", "web", 0),  # empty text -> empty token array
    (2, "   \t  \n ", "en", "books", 8),  # whitespace-only -> empty tokens
    (3, "hi", "en", "web", 2),  # < shingle width (k=3)
    (4, "one two", "fr", "web", 7),  # < shingle width, 2 tokens
    (5, "alpha beta gamma delta alpha beta", "en", "code", 33),
    (6, "alpha beta gamma delta alpha beta", "en", "code", 33),  # exact dup
    (7, "x x x x x x x x x x", "de", "web", 19),  # dominated by one token
    (8, None, "en", "web", 0),  # NULL text
    (9, "solo", "en", "wiki", 4),
    (10, "eval doc shares these exact three grams", "en", "web", 39),
    # doc_id % 10 == 0 is the EVAL_PRED holdout in the q84/q92 family
    (20, "shares these exact three grams too yes", "en", "web", 38),
    # a shared >=8-token verbatim phrase so q112/q113 (SPAN_K=8)
    # produce real spans on this fixture, exercising the non-NULL
    # excision branch next to the empty/NULL docs above
    (
        11,
        "prefix one copy the very same eight token phrase appears here twice",
        "en",
        "web",
        67,
    ),
    (
        12,
        "copy the very same eight token phrase appears here and elsewhere",
        "en",
        "books",
        64,
    ),
]

EDGE_QUERIES = [
    "q84_decontamination_overlap",
    "q85_token_dominance",
    "q86_boilerplate_ngrams",
    "q92_corpus_curation",
    # bigram family: 0- and 1-token docs must yield NO bigrams (Spark's
    # sequence(2, n<2) generates descending — the CASE guard in
    # text.bigrams_expr carries the semantics), and empty docs must
    # produce zero RAG chunks on both engines
    "q97_repetition_filter",
    "q98_rag_chunking",
    "q99_bigram_lm",
    "q109_pagerank_step",
    "q112_duplicate_spans",
    "q113_span_excision",
    "q76_text_canonicalize",
    # NULL/empty payloads through the binary decode path: a NULL text
    # becomes a NULL content payload; both engines must report zero
    # samples, not crash frombuffer / diverge on NULL propagation
    "q102_audio_int_stats",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge-docs")
    spark.createDataFrame(
        EDGE_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_empty_doc_parity(spark, edge_dir, name):
    spec = REGISTRY[name]
    got = spec.spark(spark, edge_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    want = con.execute(spec.oracle).fetchdf()
    con.close()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} != {len(want)} rows"
    assert canon(got) == canon(want), f"{name}: value mismatch"
