"""Unit tests for curation + incremental operators (semantics on small
constructed frames; engine-vs-oracle parity is covered by the registry
gate in tools/verify_oracle.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from weather_bigquery_lakehouse_spark.operators import curation as cu
from weather_bigquery_lakehouse_spark.operators import incremental as inc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


# --------------------------------------------------------------------------
# merge_upsert
# --------------------------------------------------------------------------


def test_merge_upsert_updates_win_and_inserts(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    updates = spark.createDataFrame([(2, "B"), (9, "Z")], "k bigint, v string")
    out = {r.k: r.v for r in inc.merge_upsert(base, updates, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 9: "Z"}


def test_merge_upsert_broadcast_variant_same_result(spark):
    base = spark.createDataFrame([(i, "old") for i in range(20)], "k bigint, v string")
    updates = spark.createDataFrame([(5, "new")], "k bigint, v string")
    plain = inc.merge_upsert(base, updates, ["k"]).collect()
    bcast = inc.merge_upsert(base, updates, ["k"], broadcast_updates=True).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, bcast))


# --------------------------------------------------------------------------
# scd2_versions
# --------------------------------------------------------------------------


def test_scd2_versions_change_points(spark):
    t = lambda s: datetime(2024, 1, 1, s)
    events = spark.createDataFrame(
        [
            (1, "free", t(1), 10),
            (1, "free", t(2), 11),   # no change → folded into v1
            (1, "paid", t(3), 12),   # change → v2
            (1, "free", t(4), 13),   # change back → v3
            (2, "paid", t(5), 14),
        ],
        "user_id bigint, plan string, ts timestamp, event_id bigint",
    )
    out = inc.scd2_versions(events, "user_id", "plan", "ts", "event_id")
    rows = {(r.user_id, r.version): r for r in out.collect()}
    assert len(rows) == 4
    assert rows[(1, 1)].plan == "free" and rows[(1, 1)].valid_to == t(3)
    assert rows[(1, 2)].plan == "paid" and rows[(1, 2)].valid_to == t(4)
    assert rows[(1, 3)].plan == "free" and rows[(1, 3)].is_current == 1
    assert rows[(1, 3)].valid_to is None
    assert rows[(2, 1)].is_current == 1
    # intervals tile: each version starts where the previous ended
    assert rows[(1, 2)].valid_from == rows[(1, 1)].valid_to


# --------------------------------------------------------------------------
# sequence_pack
# --------------------------------------------------------------------------


def test_sequence_pack_offsets_and_straddle(spark):
    df = spark.createDataFrame(
        [("s", 1, 300), ("s", 2, 300), ("s", 3, 500)],
        "source string, doc_id bigint, n_tok bigint",
    )
    out = {r.doc_id: r for r in cu.sequence_pack(df, "n_tok", budget=512).collect()}
    assert out[1].start_offset == 0 and out[1].bin_start == 0 and out[1].bin_end == 0
    # doc 2 spans the 512 boundary: tokens 300..599 → bins 0..1
    assert out[2].start_offset == 300
    assert out[2].bin_start == 0 and out[2].bin_end == 1
    assert out[3].start_offset == 600
    assert out[3].bin_start == 1 and out[3].bin_end == 2


def test_sequence_pack_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 100), ("b", 2, 100)], "source string, doc_id bigint, n_tok bigint"
    )
    out = {r.source: r for r in cu.sequence_pack(df, "n_tok").collect()}
    assert out["a"].start_offset == 0 and out["b"].start_offset == 0


# --------------------------------------------------------------------------
# shuffle_order
# --------------------------------------------------------------------------


def test_shuffle_order_matches_flat_ranking(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
    out = cu.shuffle_order(df).collect()
    assert len(out) == 200
    assert sorted(r.global_rank for r in out) == list(range(1, 201))
    # global rank must equal the rank of a flat sort by the md5 key
    import hashlib

    key = {i: hashlib.md5(f"shuf42|{i}".encode()).hexdigest() for i in range(200)}
    flat = {i: r + 1 for r, i in enumerate(sorted(range(200), key=lambda i: key[i]))}
    for r in out:
        assert r.global_rank == flat[r.doc_id]


# --------------------------------------------------------------------------
# sample_stratified
# --------------------------------------------------------------------------


def test_sample_stratified_deterministic_and_biased(spark):
    rows = [(i, "t", "en" if i % 2 == 0 else "zh") for i in range(1000)]
    df = _docs(spark, rows)
    a = {r.doc_id for r in cu.sample_stratified(df).collect()}
    b = {r.doc_id for r in cu.sample_stratified(df).collect()}
    assert a == b  # content-addressed, not rand()
    en = sum(1 for i in a if i % 2 == 0) / 500
    zh = sum(1 for i in a if i % 2 == 1) / 500
    assert 0.5 < en < 0.7  # en stratum keeps ~60%
    assert 0.03 < zh < 0.2  # default stratum keeps ~10%


# --------------------------------------------------------------------------
# decontaminate_ngram_overlap
# --------------------------------------------------------------------------


def test_decontaminate_flags_eval_copy(spark):
    # find ids landing in the eval bucket (b < 5) and train bucket
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        cu.md5_bucket("id", salt="decon|").alias("b"),
    )
    buckets = {r.doc_id: r.b for r in df.collect()}
    eval_id = next(i for i, b in buckets.items() if b < 5)
    copy_id = next(i for i, b in buckets.items() if b >= 5)
    fresh_id = next(i for i, b in buckets.items() if b >= 5 and i != copy_id)
    leaked = "alpha beta gamma delta epsilon zeta"
    clean = "one two three four five six seven"
    docs = _docs(
        spark,
        [(eval_id, leaked, "en"), (copy_id, leaked, "en"), (fresh_id, clean, "en")],
    )
    out = {r.doc_id: r for r in cu.decontaminate_ngram_overlap(docs).collect()}
    assert eval_id not in out  # eval docs are not scored
    assert out[copy_id].contam_frac == 1.0
    assert out[fresh_id].contam_frac == 0.0


# --------------------------------------------------------------------------
# pii_redact
# --------------------------------------------------------------------------


def test_pii_redact_counts_and_hash(spark):
    docs = _docs(
        spark,
        [
            (1, "mail me at jo.doe+x@corp.example.org or call 555-1234", "en"),
            (2, "ref 123456 and 987654321 no pii words", "en"),
            (3, "clean text only", "en"),
        ],
    )
    out = {r.doc_id: r for r in cu.pii_redact(docs).collect()}
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ids) == (1, 1, 0)
    assert (out[2].n_emails, out[2].n_phones, out[2].n_ids) == (0, 0, 2)
    assert (out[3].n_emails, out[3].n_phones, out[3].n_ids) == (0, 0, 0)
    import hashlib

    expected = "mail me at <EMAIL> or call <PHONE>"
    assert out[1].redacted_sha == hashlib.sha256(expected.encode()).hexdigest()


# --------------------------------------------------------------------------
# tfidf_top_terms
# --------------------------------------------------------------------------


def test_tfidf_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(
        [
            (1, "common rare rare common", "s1"),
            (2, "common common common", "s2"),
            (3, "common filler words", "s3"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = cu.tfidf_top_terms(docs, group_col="source", k=3).collect()
    s1 = {r.term: r for r in out if r.source == "s1"}
    # 'rare' (df=1, tf=2) must outrank 'common' (df=3, tf=2)
    assert s1["rare"].rank < s1["common"].rank
    assert s1["rare"].df == 1 and s1["common"].df == 3


# --------------------------------------------------------------------------
# quantize_embeddings
# --------------------------------------------------------------------------


def test_quantize_bounds_and_roundtrip(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = cu.quantize_embeddings(emb).collect()
    assert {r.vec_id for r in out} == {1}  # zero vector filtered (no scale)
    by_pos = {r.pos: r for r in out}
    assert by_pos[0].q == 127 and by_pos[1].q == -63 or by_pos[1].q == -64
    for r in out:
        assert -127 <= r.q <= 127
        # dequantization error bounded by half a quantization step
        assert abs(r.q * r.scale - [1.0, -0.5, 0.25, 0.0][r.pos]) <= r.scale / 2 + 1e-9


# --------------------------------------------------------------------------
# anomaly_zscore
# --------------------------------------------------------------------------


def test_anomaly_zscore_flags_outlier(spark):
    rows = [(i, "click", 10.0) for i in range(50)] + [(99, "click", 500.0)]
    events = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
    out = cu.anomaly_zscore(events).collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].zscore > 3


def test_anomaly_zscore_constant_group_silent(spark):
    events = spark.createDataFrame(
        [(1, "x", 5.0), (2, "x", 5.0)], "event_id bigint, event_type string, value double"
    )
    assert cu.anomaly_zscore(events).count() == 0


# --------------------------------------------------------------------------
# connected_components
# --------------------------------------------------------------------------


def test_connected_components_chain_and_clique(spark):
    from weather_bigquery_lakehouse_spark.operators.dedup import connected_components

    # a 5-node chain (diameter 4 → needs several propagation rounds),
    # a triangle, and a disjoint pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_label_flows_against_edge_direction(spark):
    from weather_bigquery_lakehouse_spark.operators.dedup import connected_components

    # min id sits at the "destination" end — propagation must go both ways
    pairs = spark.createDataFrame([(9, 1), (8, 9)], "doc_a long, doc_b long")
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == {1: 1, 8: 1, 9: 1}


def test_connected_components_long_chain_converges_via_pointer_doubling(spark):
    """A 60-node chain has diameter 59 — plain min-label propagation would
    exhaust the default 25-iteration cap and (pre-fix) silently return a
    SPLIT component; pointer doubling converges in O(log diameter). The
    LSH bucket cap bounds bucket size, not component diameter: chains like
    this form across buckets."""
    from weather_bigquery_lakehouse_spark.operators.dedup import connected_components

    n = 60
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long"
    )
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == {i: 1 for i in range(1, n + 1)}


def test_connected_components_raises_instead_of_returning_split_labels(spark):
    import pytest as _pytest

    from weather_bigquery_lakehouse_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=2)


def test_replace_groups_drops_stale_rows_of_shrunken_group(spark):
    """Group-wise REPLACE (the multi-row-per-key sibling of merge_upsert):
    a replaced key loses ALL its old rows — even when the new group is
    smaller — and untouched keys keep theirs."""
    base = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "b"), (1, 2, "c"), (2, 0, "x")],
        "doc_id long, chunk_idx int, v string",
    )
    repl = spark.createDataFrame([(1, 0, "A")], "doc_id long, chunk_idx int, v string")
    got = sorted(map(tuple, inc.replace_groups(base, repl, ["doc_id"]).collect()))
    assert got == [(1, 0, "A"), (2, 0, "x")]  # chunks 1,2 of doc 1 gone


def test_merge_upsert_dedupe_order_picks_one_row_per_key(spark):
    """An update batch with duplicate keys must not emit duplicate rows:
    with dedupe_order, the last row (descending order) deterministically
    wins before the merge."""
    base = spark.createDataFrame([(1, "old", 0)], "k long, v string, ts long")
    updates = spark.createDataFrame(
        [(1, "mid", 5), (1, "new", 9), (2, "ins", 1)], "k long, v string, ts long"
    )
    out = inc.merge_upsert(base, updates, ["k"], dedupe_order=["ts"])
    got = {r.k: (r.v, r.ts) for r in out.collect()}
    assert out.count() == 2
    assert got == {1: ("new", 9), 2: ("ins", 1)}


# --------------------------------------------------------------------------
# interval_overlap_join
# --------------------------------------------------------------------------


def test_interval_overlap_join_boundaries_and_open_end(spark):
    from datetime import datetime as dt

    from weather_bigquery_lakehouse_spark.operators.temporal import (
        interval_overlap_join,
    )

    t = lambda h: dt(2024, 1, 1, h)
    sessions = spark.createDataFrame(
        [(1, 100, t(2), t(4)), (1, 101, t(6), t(7)), (2, 200, t(1), t(2))],
        "user_id long, sid long, s_start timestamp, s_end timestamp",
    )
    versions = spark.createDataFrame(
        [
            (1, 1, t(0), t(3)),      # overlaps session 100 ([2,4] vs [0,3))
            (1, 2, t(3), None),      # open-ended: overlaps 100 and 101
            (2, 1, t(2), t(5)),      # touches session 200 only at s_end==r_start
        ],
        "user_id long, version long, valid_from timestamp, valid_to timestamp",
    )
    out = interval_overlap_join(
        sessions, versions, ["user_id"], "s_start", "s_end", "valid_from", "valid_to"
    )
    got = {(r.sid, r.version) for r in out.collect()}
    # session 200 ends exactly at valid_from → closed-left overlap counts it
    assert got == {(100, 1), (100, 2), (101, 2), (200, 1)}


def test_gopher_top_unigram_is_max_multiplicity(spark):
    """The sorted max-run fold must equal max token multiplicity exactly
    (it replaced the O(distinct·n) distinct×count form): 'spam' appears
    4/8 times → 0.5; an all-distinct doc scores 1/n."""
    docs = spark.createDataFrame(
        [
            (1, "spam a spam b spam c spam d"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cu.gopher_quality_flags(docs).collect()}
    assert got[1].top_unigram_frac == 0.5
    assert got[2].top_unigram_frac == 0.1
    assert got[3].top_unigram_frac == 1.0
    # 0.5 > 0.2 cap trips the dominance flag; 0.1 ≤ 0.2 passes it
    assert got[1].flag_top_unigram == 0 and got[2].flag_top_unigram == 1


# --------------------------------------------------------------------------
# mixture_balance
# --------------------------------------------------------------------------


def test_mixture_balance_hits_target_shares(spark):
    """A skewed corpus (90% web / 10% code) rebalanced to 50/50 must be
    bottlenecked by the rare source: all of code kept, web downsampled to
    match, output shares ≈ targets, and selection deterministic."""
    rows = [(i, "t", "web" if i < 9000 else "code") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = cu.mixture_balance(df, {"web": 0.5, "code": 0.5})
    got = {r.source: r.cnt for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got["code"] == 1000  # bottleneck source: keep everything
    assert abs(got["web"] - 1000) < 120  # md5 buckets ≈ uniform
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in cu.mixture_balance(df, {"web": 0.5, "code": 0.5}).collect()}
    assert a == b  # content-addressed, not rand()


def test_mixture_balance_drops_untargeted_sources_and_validates(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "t", "web"), (2, "t", "spamcrawl")], "doc_id bigint, text string, source string"
    )
    out = cu.mixture_balance(df, {"web": 1.0})
    assert {r.source for r in out.collect()} == {"web"}
    with _pytest.raises(ValueError, match="sum to 1"):
        cu.mixture_balance(df, {"web": 0.4})


# --------------------------------------------------------------------------
# repeated_span_flags
# --------------------------------------------------------------------------


def test_repeated_span_flags_global_frequency(spark):
    """Span repetition is corpus-GLOBAL: a span shared by docs 1 and 2 is
    repeated for both; doc 3's unique text scores 0; a doc with <k tokens
    has no spans and is absent."""
    docs = spark.createDataFrame(
        [
            (1, "the same boilerplate footer text here plus one"),
            (2, "totally different intro the same boilerplate footer text here"),
            (3, "unique words that appear exactly once in corpus"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cu.repeated_span_flags(docs, k=5).collect()}
    assert 4 not in out  # < 5 tokens → no spans
    assert out[3].n_repeated_spans == 0 and out[3].repeated_frac == 0.0
    # "the same boilerplate footer text" (+ shifted spans) repeat across 1↔2
    assert out[1].n_repeated_spans >= 1 and out[2].n_repeated_spans >= 1
    assert out[1].repeated_frac > 0 and out[2].repeated_frac > 0
    assert out[1].n_spans == 4  # 8 tokens → 4 5-gram spans


# --------------------------------------------------------------------------
# chunk_documents + split_leakage_safe
# --------------------------------------------------------------------------


def test_chunk_documents_windows_and_tail_clamp(spark):
    """Starts step by stride; the final start clamps to n-chunk so every
    chunk is full-size; short docs yield one short chunk."""
    from weather_bigquery_lakehouse_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2, "a b c")],
        "doc_id long, text string",
    )
    out = sorted(
        tx.chunk_documents(docs, chunk_tokens=6, stride=4).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    d1 = [(r.chunk_idx, r.chunk_text) for r in out if r.doc_id == 1]
    # n=10: starts 0, 4 → [t1..t6], [t5..t10] — tail overlaps, stays full
    assert d1 == [(0, "t1 t2 t3 t4 t5 t6"), (1, "t5 t6 t7 t8 t9 t10")]
    d2 = [(r.chunk_idx, r.chunk_text, r.n_chunk_tokens) for r in out if r.doc_id == 2]
    assert d2 == [(0, "a b c", 3)]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tx.chunk_documents(docs, chunk_tokens=4, stride=5)


def test_split_leakage_safe_keeps_clusters_together(spark):
    """Every member of a near-dup cluster must draw the same split; a
    singleton reduces to the plain md5(doc_id) split."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: (r.split_key, r.split)
           for r in cu.split_leakage_safe(docs, pairs).collect()}
    assert out[1] == out[2] == out[3]          # one cluster, one fate
    assert out[1][0] == 1                       # keyed on the min id
    assert out[5] == out[6] and out[5][0] == 5
    assert out[4][0] == 4 and out[7][0] == 7    # singletons: own id
    import hashlib

    for d in (4, 7):
        bucket = int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % 100
        assert out[d][1] == ("val" if bucket < 10 else "train")


def test_split_leakage_safe_shuffle_fallback_identical_and_unbroadcast(spark):
    """The label join must not broadcast unconditionally (a high-dup-rate
    100 TB corpus can label billions of nodes): broadcast_labels=False
    must produce the IDENTICAL split through a plain shuffled join, and
    its physical plan must contain no broadcast exchange for the labels."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 30)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (20, 21)], "doc_a long, doc_b long"
    )
    bc = cu.split_leakage_safe(docs, pairs, broadcast_labels=True)
    sh = cu.split_leakage_safe(docs, pairs, broadcast_labels=False)
    rows = lambda df: sorted(map(tuple, df.collect()))
    assert rows(bc) == rows(sh)

    # Static-plan check with auto-broadcast off: only a HINT can produce a
    # broadcast. The fallback must plan a shuffled join (at scale the label
    # frame's stats are large, so AQE keeps it; on this tiny fixture AQE
    # would legitimately convert at runtime — that's adaptivity, not a hint).
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sh_plan = (
            cu.split_leakage_safe(docs, pairs, broadcast_labels=False)
            ._jdf.queryExecution().sparkPlan().toString()
        )
        assert "BroadcastHashJoin" not in sh_plan
        assert "SortMergeJoin" in sh_plan or "ShuffledHashJoin" in sh_plan
        bc_plan = (
            cu.split_leakage_safe(docs, pairs, broadcast_labels=True)
            ._jdf.queryExecution().sparkPlan().toString()
        )
        assert "BroadcastHashJoin" in bc_plan  # hint survives threshold=-1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    # the auto path (None) on a tiny label frame picks the broadcast plan
    auto = cu.split_leakage_safe(docs, pairs)
    assert rows(auto) == rows(bc)


# --------------------------------------------------------------------------
# repeated_span_scrub / token_budget_sample / bigram_lm_score (round 6)
# --------------------------------------------------------------------------


def test_repeated_span_scrub_removes_shared_span_tokens(spark):
    """Tokens covered by a cross-doc 5-gram are dropped; unique text and
    sub-k docs pass through untouched (normalized to lowercase tokens)."""
    docs = spark.createDataFrame(
        [
            (1, "AAA the same boilerplate footer text here plus one"),
            (2, "intro words the same boilerplate footer text here"),
            (3, "unique words that appear exactly once in corpus"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cu.repeated_span_scrub(docs, k=5).collect()}
    # doc 1: "the same boilerplate footer text here" (6 tokens, two
    # overlapping shared 5-grams) is removed; leading AAA + trailing words stay
    assert out[1].scrubbed_text == "aaa plus one"
    assert out[1].n_removed_tokens == 6 and out[1].n_tokens == 9
    assert out[2].scrubbed_text == "intro words"
    assert out[3].scrubbed_text == out[3].scrubbed_text.lower()
    assert out[3].n_removed_tokens == 0
    assert out[4].scrubbed_text == "too short" and out[4].n_removed_tokens == 0


def test_repeated_span_scrub_can_empty_a_document(spark):
    """A doc that is ENTIRELY a shared span scrubs to the empty string —
    the row survives with n_removed == n_tokens (accounting stays exact)."""
    docs = spark.createDataFrame(
        [
            (1, "one two three four five"),
            (2, "one two three four five"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cu.repeated_span_scrub(docs, k=5).collect()}
    assert out[1].scrubbed_text == "" and out[2].scrubbed_text == ""
    assert out[1].n_removed_tokens == 5 and out[1].n_tokens == 5


def test_token_budget_sample_cuts_at_budget_and_drops_unlisted(spark):
    """Per-domain inclusive cumsum in md5(seed|id) order: docs kept while
    the running token total fits; zero-budget and unlisted domains empty."""
    rows = [(i, "w " * 10, "a") for i in range(10)]  # 10 tokens each
    rows += [(100 + i, "w " * 10, "b") for i in range(4)]
    rows += [(200 + i, "w " * 10, "zz") for i in range(3)]
    docs = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id long, text string, source string",
    )
    out = cu.token_budget_sample(
        docs, {"a": 35, "b": 1000, "c": 0}, seed="s"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # budget 35 / 10-token docs → exactly 3 whole docs, never a partial 4th
    assert len(by_src["a"]) == 3
    assert max(r.cum_tokens for r in by_src["a"]) == 30
    assert len(by_src["b"]) == 4  # budget ≫ total → domain kept whole
    assert "zz" not in by_src and "c" not in by_src
    # deterministic: same seed → same kept set
    again = cu.token_budget_sample(docs, {"a": 35, "b": 1000, "c": 0}, seed="s")
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in out
    )
    # kept set is the md5-order prefix: every kept doc's cum ≤ every
    # dropped doc's would-be position (prefix property via cum monotone)
    kept_a = sorted(r.cum_tokens for r in by_src["a"])
    assert kept_a == [10, 20, 30]


def test_bigram_lm_score_prefers_repeated_transitions(spark):
    """Docs made of the corpus's dominant transitions score high; a doc of
    one-off transitions scores low and is fully novel."""
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "a b a b"),
            (3, "q r s t u"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cu.bigram_lm_score(docs).collect()}
    # vocab V = 7 (a b q r s t u). Laplace: P(b|a) = (5+1)/(5+7) = 0.5,
    # P(a|b) = (3+1)/(3+7) = 0.4; doc 3's one-off transitions score
    # (1+1)/(1+7) = 0.25 — NOT 1.0 (the unsmoothed-MLE degeneracy).
    assert out[3].novel_bigram_frac == 1.0
    assert out[1].novel_bigram_frac == 0.0
    assert out[1].mean_cond_prob > out[3].mean_cond_prob
    assert out[1].n_bigrams == 5 and out[2].n_bigrams == 3
    assert abs(out[3].mean_cond_prob - 0.25) < 1e-9
    # mean for doc2: bigrams [ab, ba, ab] → (0.5 + 0.4 + 0.5)/3
    assert abs(out[2].mean_cond_prob - round((0.5 + 0.4 + 0.5) / 3, 6)) < 1e-9


def test_bigram_lm_score_single_token_docs_absent(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in cu.bigram_lm_score(docs).collect()}
    assert 1 not in out and out[2].n_bigrams == 1


def test_decontaminate_span_depth_contiguous_vs_scattered(spark):
    """Severity separates a verbatim quote from scattered hits: a train
    doc sharing a 5-token substring with the eval doc reports
    max_overlap_tokens == 5 (island of 3 3-gram starts), while a doc whose
    hits are non-adjacent reports k == 3; clean docs report 0 but keep
    their row."""
    from weather_bigquery_lakehouse_spark.operators.curation import md5_bucket

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),        # eval candidate
        (2, "intro words alpha beta gamma delta epsilon tail end"),
        (3, "alpha beta gamma filler filler delta epsilon zeta padpad"),
        (4, "totally unrelated clean words only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # find a bucket assignment where doc 1 is eval and the rest are train:
    # rather than search salts, force the split by id remap
    b = {
        r.doc_id: r.b
        for r in docs.select("doc_id", md5_bucket("doc_id", salt="decon|").alias("b")).collect()
    }
    eval_pct = 5
    if not (b[1] < eval_pct <= min(b[2], b[3], b[4])):
        # remap ids deterministically so doc 1 lands in the eval bucket
        # and the others don't (scan a small id space once)
        pool_eval = [i for i in range(1, 500) if _bucket_of(spark, i) < eval_pct]
        pool_train = [i for i in range(1, 500) if _bucket_of(spark, i) >= eval_pct]
        remap = {1: pool_eval[0], 2: pool_train[0], 3: pool_train[1], 4: pool_train[2]}
        rows = [(remap[i], t) for i, t in rows]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
    else:
        remap = {i: i for i, _ in rows}

    out = {
        r.doc_id: r
        for r in cu.decontaminate_span_depth(docs, eval_pct=eval_pct, k=3).collect()
    }
    assert remap[1] not in out  # eval doc not scored
    # doc 2 shares "alpha beta gamma delta epsilon" → 3 consecutive
    # 3-gram starts → 3 + 3 - 1 = 5 verbatim tokens, one island
    assert out[remap[2]].max_overlap_tokens == 5
    assert out[remap[2]].n_contam_islands == 1
    # doc 3 has two separated single-shingle hits → depth k, two islands
    assert out[remap[3]].max_overlap_tokens == 3
    assert out[remap[3]].n_contam_islands == 2
    # clean doc: row kept, zeros
    assert out[remap[4]].max_overlap_tokens == 0
    assert out[remap[4]].n_contam_islands == 0


_BUCKET_CACHE = {}


def _bucket_of(spark, i):
    if not _BUCKET_CACHE:
        from weather_bigquery_lakehouse_spark.operators.curation import md5_bucket

        df = spark.range(1, 500).select(
            F.col("id"), md5_bucket("id", salt="decon|").alias("b")
        )
        _BUCKET_CACHE.update({r.id: r.b for r in df.collect()})
    return _BUCKET_CACHE[i]


def test_source_overlap_matrix_detects_mirror(spark):
    """A mirrored domain pair scores Jaccard 1.0; disjoint domains have no
    row; partial overlap computes |∩| / |∪| on distinct shingle sets."""
    docs = spark.createDataFrame(
        [
            (1, "one two three four five", "m1"),
            (2, "one two three four five", "m2"),     # mirror of m1
            (3, "one two three ending differs here", "p1"),  # shares "one two three"
            (4, "totally different corpus content words", "q1"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.source_a, r.source_b): r
        for r in cu.source_overlap_matrix(docs, k=3).collect()
    }
    assert out[("m1", "m2")].jaccard == 1.0
    assert out[("m1", "m2")].shared_shingles == 3  # 5 tokens → 3 3-grams
    # p1: 4 shingles, m1: 3; shared = 1 ("one two three") → 1/(3+4-1)
    assert out[("m1", "p1")].shared_shingles == 1
    assert out[("m1", "p1")].jaccard == round(1 / 6, 6)
    assert ("m1", "q1") not in out and ("q1", "m1") not in out
    # ordering contract: source_a < source_b, no self-pairs
    assert all(a < b for a, b in out)


# --------------------------------------------------------------------------
# decontaminate_bloom / cms_heavy_hitters (bounded-memory sketches)
# --------------------------------------------------------------------------


def test_bloom_hits_are_superset_of_exact_hits(spark):
    # One-sided error: the Bloom filter can only ADD hits (false
    # positives), never miss a truly contaminated shingle. Compare the
    # exact and bloom variants doc by doc on a real corpus slice.
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {r.doc_id: r for r in cu.decontaminate_ngram_overlap(docs).collect()}
    bloom = {r.doc_id: r for r in cu.decontaminate_bloom(docs).collect()}
    assert set(bloom) == set(exact)
    for i, b in bloom.items():
        assert b.n_shingles == exact[i].n_shingles
        assert b.n_bloom_hits >= exact[i].n_contaminated


def test_mixture_temperature_flattens_toward_sqrt_shares(spark):
    """α=0.5 temperature semantics: the smallest domain survives whole,
    every kept set is the md5-bucket prefix of its domain (deterministic,
    rerun-stable), and realized domain sizes track n_s·sqrt(n_min/n_s) =
    sqrt(n_min·n_s) within bucket-quantization error."""
    import math

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n_by = {r.source: r.n for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    out = cu.mixture_temperature(docs)
    kept = {r.source: r.n for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    n_min = min(n_by.values())
    smallest = min(n_by, key=lambda s: n_by[s])
    assert kept[smallest] == n_by[smallest]  # rate 1.0 exactly
    for s, n in n_by.items():
        expect = n * math.sqrt(n_min / n)
        # md5 buckets are uniform, not exact: allow quantization + hash noise
        assert abs(kept.get(s, 0) - expect) <= max(6.0, 0.12 * expect), (
            s, kept.get(s, 0), expect
        )
    # deterministic: a second run keeps the identical rows
    ids1 = {r.doc_id for r in out.select("doc_id").collect()}
    ids2 = {r.doc_id for r in cu.mixture_temperature(docs).select("doc_id").collect()}
    assert ids1 == ids2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        cu.mixture_temperature(docs, alpha=0.0)


def test_ccnet_buckets_match_python_quantile_math(spark):
    """Per-domain tercile assignment re-derived independently: collect the
    LM scores, cut each domain at numpy's linear-interpolated (= SQL
    quantile_cont = our distributed core) 33/67 points rounded to 6dp,
    and every doc's bucket must match; every domain must see its own
    breakpoints (calibration, not a global threshold)."""
    import numpy as np

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = cu.ccnet_quality_buckets(docs).collect()
    scores = {r.doc_id: r.mean_cond_prob for r in cu.bigram_lm_score(docs).collect()}
    src = {
        r.doc_id: r.source for r in docs.select("doc_id", "source").collect()
    }
    by_dom: dict[str, list[float]] = {}
    for i, s in scores.items():
        by_dom.setdefault(src[i], []).append(s)
    bp = {
        d: (
            round(float(np.percentile(v, 33, method="linear")), 6),
            round(float(np.percentile(v, 67, method="linear")), 6),
        )
        for d, v in by_dom.items()
    }
    assert len(out) == len(scores) > 0
    for r in out:
        lo, hi = bp[r.source]
        assert (r.lm_p33, r.lm_p67) == (lo, hi)
        want = "head" if r.mean_cond_prob > hi else (
            "middle" if r.mean_cond_prob > lo else "tail"
        )
        assert r.bucket == want
    # the breakpoints genuinely differ across domains (calibration is real)
    assert len({v for v in bp.values()}) > 1


def test_bloom_saturation_guard_raises_with_sizing_hint(spark):
    # A filter too narrow for the eval set must fail loudly (near-1 FPR
    # would silently flag every training doc), and the message must carry
    # the m that restores ~1% FPR; max_fill=1.0 opts back in.
    import pytest as _pytest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with _pytest.raises(ValueError, match="saturated.*m >= \\d+"):
        cu.decontaminate_bloom(docs, m=64)
    assert cu.decontaminate_bloom(docs, m=64, max_fill=1.0).count() > 0


def test_bloom_flags_eval_copy_and_is_deterministic(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        cu.md5_bucket("id", salt="decon|").alias("b"),
    )
    buckets = {r.doc_id: r.b for r in df.collect()}
    eval_id = next(i for i, b in buckets.items() if b < 5)
    copy_id = next(i for i, b in buckets.items() if b >= 5)
    fresh_id = next(i for i, b in buckets.items() if b >= 5 and i != copy_id)
    leaked = "alpha beta gamma delta epsilon zeta"
    clean = "one two three four five six seven"
    docs = _docs(
        spark,
        [(eval_id, leaked, "en"), (copy_id, leaked, "en"), (fresh_id, clean, "en")],
    )
    out = {r.doc_id: r for r in cu.decontaminate_bloom(docs).collect()}
    out2 = {r.doc_id: r for r in cu.decontaminate_bloom(docs).collect()}
    assert eval_id not in out  # eval docs are not scored
    assert out[copy_id].bloom_frac == 1.0  # a verbatim copy always hits
    # with m=65536 bits and 4 eval shingles the clean doc's 5 shingles
    # cannot plausibly collide on all 3 probes each
    assert out[fresh_id].n_bloom_hits == 0
    assert {i: (r.n_bloom_hits, r.bloom_frac) for i, r in out.items()} == {
        i: (r.n_bloom_hits, r.bloom_frac) for i, r in out2.items()
    }


def test_cms_estimates_are_one_sided_and_probe_set_exact(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = cu.cms_heavy_hitters(docs).collect()
    assert out, "corpus slice must yield heavy hitters"
    for r in out:
        assert r.n_cms_est >= r.n_exact  # CMS never undercounts
        assert r.overcount == r.n_cms_est - r.n_exact
    # the probe set is exactly the spans at/above the exact threshold
    from weather_bigquery_lakehouse_spark.operators.text import (
        shingles_expr,
        tokens_expr,
    )

    el = docs.where(F.col("text").isNotNull()).select(
        F.explode(shingles_expr(tokens_expr("text"), 3)).alias("e")
    )
    counts = {r.e: r.n for r in el.groupBy("e").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    expected = {e for e, n in counts.items() if n * cu.CMS_HH_FRAC >= total}
    assert {r.span for r in out} == expected
    assert all(counts[r.span] == r.n_exact for r in out)


def test_cms_narrow_sketch_overcounts_but_min_row_tightens(spark):
    # Force collisions with a tiny width: estimates stay one-sided and a
    # deeper sketch can only tighten (min over more rows is monotone).
    docs = _docs(
        spark,
        [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i + 2) % 7} filler", "en") for i in range(40)],
    )
    wide = {r.span: r.n_cms_est for r in cu.cms_heavy_hitters(docs, d=4, w=8, hh_frac=50).collect()}
    shallow = {r.span: r.n_cms_est for r in cu.cms_heavy_hitters(docs, d=1, w=8, hh_frac=50).collect()}
    assert set(wide) == set(shallow)
    for s, est in wide.items():
        assert est <= shallow[s]


def test_cluster_label_purity_mixed_and_pure_clusters(spark):
    # Hand graph via direct CC + purity math equivalence on real data:
    # every purity must be the dominant-label share and n_top <= n_members.
    from weather_bigquery_lakehouse_spark.plans import ALL_QUERIES

    rows = ALL_QUERIES["cluster_label_purity"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "sf0.001 embeddings must form at least one cluster"
    for r in rows:
        assert 0 < r.n_top_label <= r.n_members
        assert r.purity == round(r.n_top_label / r.n_members, 6)
        assert 0 < r.purity <= 1.0


def test_mixture_drift_shares_and_delta_exact(spark):
    # verify share arithmetic against Python integer division, and that a
    # domain present in only one half shows the full drift signal
    docs = spark.createDataFrame(
        [(i, "t", "en") for i in range(400)],
        "doc_id bigint, text string, lang string",
    ).withColumn(
        "source",
        F.when(F.col("doc_id") < 300, F.lit("web")).otherwise(F.lit("books")),
    )
    out = {r.source: r for r in cu.mixture_drift(docs).collect()}
    t_a = sum(r.n_a for r in out.values())
    t_b = sum(r.n_b for r in out.values())
    assert t_a + t_b == 400
    for r in out.values():
        assert r.share_a_ppm == (r.n_a * 1_000_000) // t_a
        assert r.share_b_ppm == (r.n_b * 1_000_000) // t_b
        assert r.delta_ppm == abs(r.share_a_ppm - r.share_b_ppm)
    # TVD over ppm shares is bounded by the scale
    assert sum(r.delta_ppm for r in out.values()) / 2 <= 1_000_000


def test_hll_cardinality_estimate_and_edges(spark):
    """The raw-HLL contract at the sized register count: estimate within
    the ~1.04/sqrt(m) band of the exact count on the gate corpus; the
    register sum is the exact dyadic bigint the estimate divides; an
    empty corpus yields all-zero registers and a NULL err_ppm (raw HLL's
    no-data estimate is alpha*m, a documented non-zero — the linear-
    counting correction is deliberately out of scope, needing ln)."""
    from weather_bigquery_lakehouse_spark.operators import curation as cu

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = cu.hll_cardinality(docs, F.trim(F.col("text"))).collect()[0]
    assert row.m == cu.HLL_M
    assert 0 <= row.v_zero <= cu.HLL_M
    # three-sigma of the 1.04/sqrt(128) standard error ~ 27.6%
    assert row.err_ppm is not None and row.err_ppm < 276_000
    assert row.exact_n == docs.where(F.col("text").isNotNull()).select(
        F.trim("text")
    ).distinct().count()
    # determinism across partition layouts (content-addressed registers)
    row2 = cu.hll_cardinality(
        docs.repartition(13), F.trim(F.col("text"))
    ).collect()[0]
    assert row2 == row

    empty = spark.createDataFrame([], "doc_id string, text string")
    erow = cu.hll_cardinality(empty, F.trim(F.col("text"))).collect()[0]
    assert erow.v_zero == cu.HLL_M and erow.exact_n == 0
    assert erow.err_ppm is None
    # the all-integer contract holds with zero rows: all-zero registers,
    # sum_scaled = m·2^(W+1), est_n = the raw no-data estimate round(α·m)
    assert erow.sum_scaled == cu.HLL_M * (1 << (cu.HLL_W + 1))
    assert erow.est_n == round(
        cu.HLL_EST_NUMERATOR / (cu.HLL_M * float(1 << (cu.HLL_W + 1)))
    )


def test_hll_registers_merge_across_shards(spark):
    """The property that makes HLL the DISTRIBUTED cardinality sketch:
    registers of a union equal the elementwise MAX of the parts'
    registers (max is associative, commutative, idempotent), so shards
    sketch independently and merging is a <= m-row aggregate — never a
    re-scan. Overlapping shards (shared docs) must merge to the same
    state as the deduplicated union."""
    from weather_bigquery_lakehouse_spark.operators import curation as cu

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.where(F.col("doc_id") % 3 != 0)
    b = docs.where(F.col("doc_id") % 2 == 0)  # overlaps a

    val = F.trim(F.col("text"))
    whole = {
        r["__j"]: r["__m"] for r in cu.hll_registers(a.unionByName(b), val).collect()
    }
    merged = {
        r["__j"]: r["__m"]
        for r in cu.hll_registers(a, val)
        .unionByName(cu.hll_registers(b, val))
        .groupBy("__j")
        .agg(F.max("__m").alias("__m"))
        .collect()
    }
    assert merged == whole


def test_priority_sample_matches_reference_and_merges(spark):
    """Priority sampling: exact-integer priorities against a pure-Python
    reference, positive-weight filter, and the merge property that makes
    the sample incrementally maintainable:
    top-k(A ∪ B) == top-k(top-k(A) ∪ top-k(B))."""
    import hashlib

    from weather_bigquery_lakehouse_spark.operators import curation as cu

    rows = [(i, (i * 37) % 50 + (0 if i % 7 else -i)) for i in range(1, 40)]
    # some weights are <= 0 → excluded; doc 0 absent by construction

    def h60(i):
        return int(hashlib.md5(f"psample|{i}".encode()).hexdigest()[:15], 16)

    def ref_topk(pop, k):
        scored = [
            (i, w, (w * (1 << 60) * 1_000_000) // (h60(i) + 1))
            for i, w in pop
            if w is not None and w > 0
        ]
        scored.sort(key=lambda t: (-t[2], t[0]))
        return [(i, w, r + 1) for r, (i, w, _q) in enumerate(scored[:k])]

    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = sorted(
        tuple(r)
        for r in cu.priority_sample(df, "n_chars", k=10).collect()
    )
    assert got == sorted(ref_topk(rows, 10))
    # partition independence
    got2 = sorted(
        tuple(r)
        for r in cu.priority_sample(df.repartition(7), "n_chars", k=10).collect()
    )
    assert got2 == got
    # merge property on the id sets (ranks recompute after the union)
    a_rows, b_rows = rows[:20], rows[20:]
    union_ids = {i for i, _w, _r in ref_topk(rows, 10)}
    merged_candidates = ref_topk(a_rows, 10) + ref_topk(b_rows, 10)
    merged_ids = {
        i for i, _w, _r in ref_topk([(i, w) for i, w, _ in merged_candidates], 10)
    }
    assert merged_ids == union_ids
