"""BM25 lexical retrieval (operators/retrieval.py): exact-integer scoring
against a pure-Python reference, the df-cap stopword guard, doc-as-query
self-exclusion, deterministic tie-breaks, partition independence, and the
broadcast-only plan shape."""

from __future__ import annotations

import contextlib
import io

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from weather_bigquery_lakehouse_spark.operators import retrieval as rt


# --- pure-Python reference in the SAME integer arithmetic -----------------

def _ref_bm25(docs, queries, k=5, max_df_ppm=rt.DEFAULT_MAX_DF_PPM):
    """docs: {doc_id: text}; queries: {query_id: set-of-terms}. Returns
    {(query_id, doc_id): (score_micro, rank)} using Python int floor
    division everywhere (the module's DECIMAL-div contract)."""
    toks = {d: [t for t in txt.lower().strip().split() if t] for d, txt in docs.items() if txt is not None}
    lengths = {d: len(ts) for d, ts in toks.items() if ts}
    n = len(lengths)
    if n == 0:
        return {}
    total = sum(lengths.values())
    avgdl_milli = (1000 * total) // n
    tf: dict[tuple[str, object], int] = {}
    for d, ts in toks.items():
        for t in ts:
            tf[(t, d)] = tf.get((t, d), 0) + 1
    df: dict[str, int] = {}
    for (t, _d) in tf:
        df[t] = df.get(t, 0) + 1
    out = {}
    for q, terms in queries.items():
        scores: dict[object, int] = {}
        for t in terms:
            if t not in df or df[t] * 1_000_000 > max_df_ppm * n:
                continue
            for d in (d for (tt, d) in tf if tt == t):
                if d == q:
                    continue
                num = rt.BM25_SCALE * (n + 1) * rt._C_TOP * tf[(t, d)] * avgdl_milli
                den = (df[t] + 1) * (
                    rt._C_DEN_TF * tf[(t, d)] * avgdl_milli
                    + rt._C_DEN_A * avgdl_milli
                    + rt._C_DEN_DL * lengths[d]
                )
                scores[d] = scores.get(d, 0) + num // den
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (d, s) in enumerate(ranked[:k], start=1):
            out[(q, d)] = (s, rank)
    return out


def _run(spark, docs, queries, k=5, max_df_ppm=rt.DEFAULT_MAX_DF_PPM):
    ddf = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    qrows = [(q, t) for q, terms in queries.items() for t in terms]
    qdf = spark.createDataFrame(qrows or [], "query_id long, term string")
    got = rt.bm25_topk(ddf, queries=qdf, k=k, max_df_ppm=max_df_ppm)
    return {
        (r["query_id"], r["doc_id"]): (r["score_micro"], r["rank"])
        for r in got.collect()
    }


def test_bm25_matches_reference_on_hand_corpus(spark):
    docs = {
        1: "apple banana apple",
        2: "banana cherry",
        3: "apple cherry cherry date",
        4: "date elderberry",
        5: "banana banana banana apple",
    }
    queries = {1: {"apple", "banana", "apple"}, 4: {"cherry", "date"}}
    got = _run(spark, docs, queries, k=3, max_df_ppm=1_000_000)
    assert got == _ref_bm25(docs, queries, k=3, max_df_ppm=1_000_000)
    # doc-as-query: the query doc itself never appears in its results
    assert all(q != d for (q, d) in got)


def test_bm25_stopword_guard_drops_high_df_terms(spark):
    # "the" is in 4/4 docs (1e6 ppm); with a 500k cap it must contribute
    # nothing, so a query of only "the" returns zero rows.
    docs = {1: "the apple", 2: "the banana", 3: "the cherry", 4: "the date"}
    got = _run(spark, docs, {1: {"the"}}, max_df_ppm=500_000)
    assert got == {}
    # "apple" (df=1, 250k ppm) survives the same cap for another query
    got2 = _run(spark, docs, {2: {"the", "apple"}}, max_df_ppm=500_000)
    assert set(got2) == {(2, 1)}
    assert got2 == _ref_bm25(docs, {2: {"the", "apple"}}, max_df_ppm=500_000)


def test_bm25_shorter_doc_wins_at_equal_tf(spark):
    # classic length normalization (b > 0): same tf, shorter doc higher
    docs = {1: "apple", 2: "apple pear plum quince fig grape", 3: "apple zz"}
    got = _run(spark, docs, {3: {"apple"}}, max_df_ppm=1_000_000)
    assert got[(3, 1)][0] > got[(3, 2)][0]
    assert got[(3, 1)][1] == 1


def test_bm25_partition_independent_and_tie_break_on_doc_id(spark):
    docs = {i: "tok alpha" if i % 2 else "tok beta" for i in range(1, 11)}
    queries = {1: {"tok"}}  # every doc ties except length effects (none)
    ddf = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    qdf = spark.createDataFrame([(1, "tok")], "query_id long, term string")
    a = rt.bm25_topk(ddf.repartition(7), queries=qdf, k=4, max_df_ppm=1_000_000)
    b = rt.bm25_topk(ddf.coalesce(1), queries=qdf.repartition(3), k=4, max_df_ppm=1_000_000)
    ra = [(r["doc_id"], r["score_micro"], r["rank"]) for r in a.collect()]
    rb = [(r["doc_id"], r["score_micro"], r["rank"]) for r in b.collect()]
    assert sorted(ra) == sorted(rb)
    # all scores equal → rank order must be doc_id ascending (2,3,4,5)
    assert sorted(d for d, _s, _r in ra) == [2, 3, 4, 5]
    assert {s for _d, s, _r in ra} and len({s for _d, s, _r in ra}) == 1


_corpus = st.dictionaries(
    st.integers(min_value=0, max_value=30),
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), min_size=0, max_size=8
    ).map(" ".join),
    min_size=1,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(_corpus, st.integers(min_value=1, max_value=4), st.sampled_from([400_000, 1_000_000]))
def test_bm25_property_matches_reference(spark, corpus, k, cap):
    # queries: every third doc's distinct tokens (doc-as-query convention)
    queries = {
        d: set(txt.lower().split())
        for d, txt in corpus.items()
        if d % 3 == 0 and txt.strip()
    }
    got = _run(spark, corpus, queries, k=k, max_df_ppm=cap)
    assert got == _ref_bm25(corpus, queries, k=k, max_df_ppm=cap)


def _plan(df, mode="simple"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_bm25_plan_broadcasts_queries_and_totals_no_cartesian(spark):
    """Scale pins: the query frame and the 1-row totals frame ride
    broadcasts (postings — the corpus-scale side — never re-shuffles for
    them), the only nested-loop join is the broadcast totals attach, and
    no CartesianProduct exists anywhere."""
    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} common") for i in range(30)], "doc_id long, text string"
    )
    plan = _plan(rt.bm25_topk(docs, probe_pct=10))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # queries (and lengths) term/doc joins
    assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row totals only
