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


def test_bm25_bigint_and_decimal_paths_are_bit_equal(spark):
    """The adaptive arithmetic width (collected corpus bounds → BIGINT
    fast path vs DECIMAL(38,0) wide path) must be invisible in results:
    both floor identical non-negative integers."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta{i % 4} gamma{i % 7} " * (1 + i % 3)) for i in range(40)],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(i, t) for i in (0, 5) for t in (f"beta{i % 4}", "alpha")],
        "query_id long, term string",
    )

    def run(width):
        return sorted(
            tuple(r) for r in rt.bm25_topk(
                docs, queries=qdf, k=7, max_df_ppm=1_000_000, exact_width=width
            ).collect()
        )

    assert run("bigint") == run("decimal") == run(None)


# --- reciprocal-rank fusion ------------------------------------------------

def _ref_rrf(lists, k=10, rrf_k=60):
    """lists: [{(q, d): rank}]. Python-int floor arithmetic."""
    acc: dict[tuple, list[int]] = {}
    for lst in lists:
        for (q, d), rank in lst.items():
            acc.setdefault((q, d), []).append(rt.BM25_SCALE // (rrf_k + rank))
    fused = {
        qd: (sum(parts), len(parts)) for qd, parts in acc.items()
    }
    out = {}
    byq: dict[object, list] = {}
    for (q, d), (s, n) in fused.items():
        byq.setdefault(q, []).append((d, s, n))
    for q, rows in byq.items():
        rows.sort(key=lambda r: (-r[1], r[0]))
        for rank, (d, s, n) in enumerate(rows[:k], start=1):
            out[(q, d)] = (s, n, rank)
    return out


def _rrf_run(spark, lists, k=10, rrf_k=60):
    dfs = [
        spark.createDataFrame(
            [(q, d, r) for (q, d), r in lst.items()],
            "query_id long, doc_id long, rank int",
        )
        for lst in lists
    ]
    got = rt.rrf_fuse(dfs, k=k, rrf_k=rrf_k)
    return {
        (r["query_id"], r["doc_id"]): (r["rrf_micro"], r["n_lists"], r["rank"])
        for r in got.collect()
    }


def test_rrf_matches_reference_and_rewards_agreement(spark):
    # doc 7 is mid-ranked in BOTH lists; doc 1/9 top-ranked in only one.
    lex = {(1, 1): 1, (1, 7): 2, (1, 3): 3}
    den = {(1, 9): 1, (1, 7): 2, (1, 4): 3}
    got = _rrf_run(spark, [lex, den], k=10)
    assert got == _ref_rrf([lex, den], k=10)
    # agreement wins: rank-2 in both > rank-1 in one (2/(62) > 1/61)
    assert got[(1, 7)][2] == 1 and got[(1, 7)][1] == 2
    assert got[(1, 1)][1] == 1 and got[(1, 9)][1] == 1
    # single-list docs tie exactly (same rank 1) → doc_id ascending
    assert got[(1, 1)][2] == 2 and got[(1, 9)][2] == 3


def test_rrf_single_list_preserves_order_and_k_cuts(spark):
    lst = {(2, d): r for r, d in enumerate([5, 3, 8, 1], start=1)}
    got = _rrf_run(spark, [lst], k=2)
    assert set(got) == {(2, 5), (2, 3)}
    assert got[(2, 5)][2] == 1 and got[(2, 3)][2] == 2


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.tuples(st.integers(0, 3), st.integers(0, 20)),
            st.integers(1, 40),
            max_size=15,
        ),
        min_size=1,
        max_size=3,
    ),
    st.integers(1, 5),
)
def test_rrf_property_matches_reference(spark, lists, k):
    got = _rrf_run(spark, lists, k=k)
    assert got == _ref_rrf(lists, k=k)


def test_rrf_plan_has_no_join_between_lists(spark):
    """Fusion must be union + ONE aggregate — a join between retriever
    outputs would shuffle both lists twice and break when a doc appears
    in only one list."""
    a = spark.createDataFrame([(1, 2, 1)], "query_id long, doc_id long, rank int")
    b = spark.createDataFrame([(1, 3, 1)], "query_id long, doc_id long, rank int")
    plan = _plan(rt.rrf_fuse([a, b]))
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # agg + window only
    assert "Union" in plan


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
    # round-14 pin: the broadcast query-term LEFT-SEMI prunes the postings
    # BELOW the scoring projection, so the per-posting divide count is
    # candidate-proportional in every query regime (selective user queries
    # included), not just the dense-probe one
    assert "LeftSemi" in plan, "query-term semi-join prune missing"
