"""Gopher document-quality rules and sentence-aware chunking.

Pins: flags/filter == DuckDB twin on real docs, each rule fires on a
planted violation, chunks never cut mid-sentence, chunk reassembly is
lossless w.r.t. the sentence stream, Spark == twin on real docs.
"""

import os

import duckdb
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark, n=150):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .where(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


def _con():
    con = duckdb.connect()
    pq = os.path.join(SF_DIR, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_gopher_flags_match_sql_twin(spark):
    from kartothek_spark.operators.text import gopher_flags, gopher_flags_sql

    got = _rows(gopher_flags(_docs(spark)))
    want = sorted(
        tuple(r)
        for r in _con().execute(
            gopher_flags_sql("(SELECT * FROM documents WHERE doc_id < 150)")
        ).fetchall()
    )
    assert got == want and got


def test_gopher_rules_fire_on_planted_violations(spark):
    from kartothek_spark.operators.text import gopher_flags

    good = (
        "The quick brown fox jumps over the lazy dog and keeps going with "
        "plenty of ordinary words that have normal length and structure. "
    ) * 3
    rows = [
        (1, good),
        (2, "too few words"),  # word_count
        (3, good + " ##### " + "#" * 40),  # symbol ratio
        (4, "\n".join("- bullet line item" for _ in range(10)) + "\nplain"),  # bullets
        (5, "\n".join(f"line {i} trails off..." for i in range(10))),  # ellipsis
        (6, " ".join("1234567" for _ in range(80))),  # alpha words + stopwords
        (7, good + "\n" + "supercalifragilisticexpialidocious " * 60),  # mean len
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flags = {r.doc_id: r.asDict() for r in gopher_flags(df, min_words=20).collect()}
    assert flags[1]["gopher_pass"]
    assert not flags[2]["word_count_ok"]
    assert not flags[3]["symbol_ratio_ok"]
    assert not flags[4]["bullet_ratio_ok"]
    assert not flags[5]["ellipsis_ratio_ok"]
    assert not flags[6]["alpha_word_ratio_ok"] and not flags[6]["stopwords_ok"]
    assert not flags[7]["mean_word_len_ok"]
    for d in (2, 3, 4, 5, 6, 7):
        assert not flags[d]["gopher_pass"]


def test_gopher_filter_matches_flags(spark):
    from kartothek_spark.operators.text import gopher_filter, gopher_flags

    docs = _docs(spark)
    kept = {r.doc_id for r in gopher_filter(docs).select("doc_id").collect()}
    want = {
        r.doc_id for r in gopher_flags(docs).where("gopher_pass").collect()
    }
    assert kept == want


def test_chunk_sentences_matches_sql_twin(spark):
    from kartothek_spark.operators.corpus import chunk_sentences, chunk_sentences_sql

    got = _rows(chunk_sentences(_docs(spark), budget_tokens=40))
    want = sorted(
        tuple(r)
        for r in _con().execute(
            chunk_sentences_sql(
                "(SELECT * FROM documents WHERE doc_id < 150)", budget_tokens=40
            )
        ).fetchall()
    )
    assert got == want and got


def test_chunk_sentences_semantics(spark):
    from kartothek_spark.operators.corpus import chunk_sentences

    df = spark.createDataFrame(
        [
            (1, "One two three. Four five six! Seven eight? Nine ten."),
            (2, "Single short sentence."),
            (3, "A giant sentence " + "word " * 30 + "ends here. Tiny tail."),
        ],
        "doc_id long, text string",
    )
    out = chunk_sentences(df, budget_tokens=6)
    rows = sorted((r.doc_id, r.chunk_id, r.n_sentences, r.chunk_text) for r in out.collect())

    # doc 1: 4 sentences of 3/3/2/2 tokens; chunk boundary between
    # sentences only — pre-cumsums 0,3,6,8 -> chunks 0,0,1,1
    d1 = [r for r in rows if r[0] == 1]
    assert [r[2] for r in d1] == [2, 2]
    assert d1[0][3] == "One two three. Four five six!"
    assert d1[1][3] == "Seven eight? Nine ten."
    # every chunk text contains only whole sentences (terminator-final)
    for _, _, _, text in rows:
        assert text.rstrip()[-1] in ".!?"
    # doc 2: one chunk, intact
    assert [r[3] for r in rows if r[0] == 2] == ["Single short sentence."]
    # doc 3: the over-budget sentence gets chunk 0 alone; tail in chunk 5+
    d3 = [r for r in rows if r[0] == 3]
    assert d3[0][2] == 1 and d3[0][3].endswith("ends here.")
    assert d3[-1][3] == "Tiny tail."

    # reassembly is lossless: joined chunks == joined sentence stream
    joined = {r.doc_id: [] for r in out.select("doc_id").distinct().collect()}
    for r in sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_id)):
        joined[r.doc_id].append(r.chunk_text)
    assert " ".join(joined[1]) == "One two three. Four five six! Seven eight? Nine ten."


# --- property: chunk_sentences vs an independent Python oracle -------------

import re as _re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ALPHABET = "abcdefg XYZ0123.!?,"  # ASCII-only: Java \s and trim match Python


def _py_chunks(texts, budget):
    """Independent Python re-implementation (not the engine's
    expressions): marker-split sentences, tokens() token counts,
    floor(pre_cumsum/budget) assignment, ordered reassembly."""
    out = []
    for did, text in texts:
        marked = _re.sub(r"([.!?…]+)\s+", lambda m: m.group(1) + "\x01", text)
        sents = [s.strip() for s in marked.split("\x01") if s.strip() != ""]
        precum, chunks = 0, {}
        for i, s in enumerate(sents):
            nt = len([t for t in _re.split(r"[^a-z0-9]+", s.lower()) if t])
            chunks.setdefault(precum // budget, []).append((s, nt))
            precum += nt
        for cid, items in chunks.items():
            out.append(
                (
                    did,
                    cid,
                    len(items),
                    sum(nt for _, nt in items),
                    " ".join(s for s, _ in items),
                )
            )
    return sorted(out)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet=_ALPHABET, min_size=0, max_size=120),
        min_size=1,
        max_size=3,
    ),
    budget=st.integers(1, 12),
)
def test_chunk_sentences_property(spark, texts, budget):
    from kartothek_spark.operators.corpus import chunk_sentences

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in chunk_sentences(df, budget_tokens=budget).collect()
    )
    assert got == _py_chunks(rows, budget)


# --- C4 exact span dedup ----------------------------------------------------


def test_c4_span_dedup_matches_sql_twin(spark):
    from kartothek_spark.operators.corpus import c4_span_dedup, c4_span_dedup_sql

    docs = _docs(spark)
    got = _rows(c4_span_dedup(docs, n=3))
    want = sorted(
        tuple(r)
        for r in _con().execute(
            c4_span_dedup_sql("(SELECT * FROM documents WHERE doc_id < 150)", n=3)
        ).fetchall()
    )
    assert got == want and got


def test_c4_span_dedup_semantics(spark):
    from kartothek_spark.operators.corpus import c4_span_dedup

    blk = "Alpha one here. Beta two here. Gamma three here."
    rows = [
        (1, blk + " Unique tail one."),          # first occurrence: intact
        (2, "Unique head two. " + blk),          # later: loses the span
        (3, blk),                                # later, nothing else: empty
        (4, "Short doc. Two sentences only."),   # <3 sentences: untouched
        (5, "Totally unrelated. Document body. Nothing shared here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in c4_span_dedup(df, n=3).collect()}
    assert out[1] == blk + " Unique tail one."
    assert out[2] == "Unique head two."
    assert out[3] == ""
    assert out[4] == "Short doc. Two sentences only."
    assert out[5] == rows[4][1]
