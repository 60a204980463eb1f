"""Distributed BPE tokenizer training (operators/bpe.py).

The trainer is a pure function of the corpus — exact BIGINT pair counts,
lexicographic tie-break, greedy left-to-right merges — so these tests pin
it against an independent index-walk Python reference, plus the greedy
edge cases (overlapping runs), the tie-break, the apply path, the token
accounting fallbacks, and the plan shapes the word-type-table scale
argument rests on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_bigquery_lakehouse_spark.operators import bpe


# --- independent Python reference (index walk, not a scan) ----------------


def _greedy_merge(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(counts: dict[str, int], n_merges: int):
    words = {w: list(w) for w in counts}
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for l, r in zip(syms, syms[1:]):
                pc[(l, r)] = pc.get((l, r), 0) + counts[w]
        if not pc:
            break
        (lhs, rhs), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((lhs, rhs, cnt))
        words = {w: _greedy_merge(s, lhs, rhs) for w, s in words.items()}
    return merges, words


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


_CORPUS = [
    "low low low low low",
    "lower lower newer newer newer",
    "newest newest newest newest newest newest",
    "wider wider wider new new",
]


def _ref_counts(texts):
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            counts[w] = counts.get(w, 0) + 1
    return counts


def test_bpe_train_matches_reference(spark):
    merges, words = bpe.bpe_train(_docs(spark, _CORPUS), n_merges=6)
    ref_merges, ref_words = _ref_bpe(_ref_counts(_CORPUS), 6)
    assert merges == ref_merges
    got = {r["word"]: (r["n"], r["syms"]) for r in words.collect()}
    ref_n = _ref_counts(_CORPUS)
    assert got == {w: (ref_n[w], s) for w, s in ref_words.items()}


@pytest.mark.parametrize(
    "word,pair",
    [
        ("aaaa", ("a", "a")),  # overlapping run: greedy takes (aa, aa)
        ("aaaaa", ("a", "a")),  # odd run: (aa, aa, a)
        ("banana", ("a", "n")),
        ("banana", ("n", "a")),
        ("x", ("a", "b")),  # single symbol passes through
        ("ab", ("a", "b")),  # whole word fuses
    ],
)
def test_merge_scan_matches_index_walk(spark, word, pair):
    df = spark.createDataFrame([(word,)], "w string")
    got = df.select(
        bpe.merge_scan_expr(bpe.chars_expr(F.col("w")), *pair).alias("m")
    ).first()["m"]
    assert got == _greedy_merge(list(word), *pair)


def test_tiebreak_is_lexicographic(spark):
    # (b,a) and (d,c) both occur twice — the smaller pair must win rank 0
    merges, _ = bpe.bpe_train(_docs(spark, ["ba ba dc dc"]), n_merges=1)
    assert merges[0][:2] == ("b", "a")


def test_apply_merges_expr_reproduces_trained_segmentation(spark):
    merges, words = bpe.bpe_train(_docs(spark, _CORPUS), n_merges=3)
    pairs = [(l, r) for l, r, _ in merges]
    redone = words.select(
        "word",
        "syms",
        bpe.apply_merges_expr(bpe.chars_expr(F.col("word")), pairs).alias("re"),
    )
    assert redone.where(F.expr("syms <> re")).count() == 0


def test_merge_table_frame(spark):
    merges, _ = bpe.bpe_train(_docs(spark, _CORPUS), n_merges=2)
    rows = bpe.merge_table(spark, merges).collect()
    assert [r["merge_rank"] for r in rows] == [0, 1]
    assert all(r["merged"] == r["lhs"] + r["rhs"] for r in rows)
    assert rows[0]["pair_count"] == merges[0][2]


def test_vocab_weights_by_word_count(spark):
    _, words = bpe.bpe_train(_docs(spark, ["ab ab cb"]), n_merges=0)
    vocab = {r["token"]: (r["n_words"], r["n_occurrences"]) for r in
             bpe.bpe_vocab(words).collect()}
    assert vocab["b"] == (2, 3)  # in both word types; 3 total occurrences
    assert vocab["a"] == (1, 2)
    assert vocab["c"] == (1, 1)


def test_token_stats_fallbacks(spark):
    long_word = "x" * (bpe.MAX_WORD_LEN + 1)
    docs = spark.createDataFrame(
        [(0, "low low"), (1, "   "), (2, None), (3, long_word)],
        "doc_id long, text string",
    )
    _, words = bpe.bpe_train(docs, n_merges=1)  # merges (l,o) -> lo
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in
           bpe.bpe_token_stats(docs, words).collect()}
    assert got[0] == (2, 4)  # low -> [lo, w] twice
    assert got[1] == (0, 0)  # whitespace-only doc kept with zero counts
    assert 2 not in got  # null text excluded
    # over-long word: dropped from training, falls back to char count
    assert got[3] == (1, bpe.MAX_WORD_LEN + 1)


def test_train_runs_out_of_pairs_stops_early(spark):
    # single-letter words only: no adjacent pairs anywhere
    merges, words = bpe.bpe_train(_docs(spark, ["a b a c"]), n_merges=5)
    assert merges == []
    assert {r["word"] for r in words.collect()} == {"a", "b", "c"}


def test_train_determinism_across_layouts(spark):
    df = _docs(spark, _CORPUS)
    m1, w1 = bpe.bpe_train(df.repartition(7), n_merges=4)
    m2, w2 = bpe.bpe_train(df.coalesce(1), n_merges=4)
    assert m1 == m2
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))


def test_pair_counts_combine_map_side_no_window(spark):
    words = bpe.word_counts(_docs(spark, _CORPUS))
    import contextlib
    import io

    for df in (words, bpe.pair_counts(words)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "Window" not in plan  # scan/agg only — no per-position windows
        # the aggregate must have a partial (map-side) phase before its
        # exchange, so task output is bounded by per-task distinct keys
        assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_bpe_train_batched_equals_sequential_on_corpus(spark):
    """The batched trainer's contract: bit-identical merges AND final
    segmentation vs the sequential trainer, at several batch sizes —
    including batch sizes larger than the safe prefix, where the guard
    must shrink the batch rather than diverge."""
    df = _docs(spark, _CORPUS)
    seq_merges, seq_words = bpe.bpe_train(df, n_merges=6)
    seq = {r["word"]: r["syms"] for r in seq_words.collect()}
    for b in (1, 2, 4, 8):
        merges, words = bpe.bpe_train_batched(df, n_merges=6, batch_size=b)
        assert merges == seq_merges, f"batch_size={b}"
        got = {r["word"]: r["syms"] for r in words.collect()}
        assert got == seq, f"batch_size={b}"


def test_bpe_batched_adversarial_chain_degrades_to_sequential(spark):
    """A corpus where every top pair interacts with the next (shared
    symbols, chained fusions): the guard must cut the batch to 1 and the
    output must still equal sequential training."""
    texts = ["aaaa aaaa aaaa aab aab ab ab ab"]
    seq_merges, seq_words = bpe.bpe_train(_docs(spark, texts), n_merges=4)
    merges, words = bpe.bpe_train_batched(
        _docs(spark, texts), n_merges=4, batch_size=4
    )
    assert merges == seq_merges
    assert {r["word"]: r["syms"] for r in words.collect()} == {
        r["word"]: r["syms"] for r in seq_words.collect()
    }


def test_batch_merge_scan_equals_chained_single_scans(spark):
    """One multi-rule scan over symbol-disjoint pairs ≡ composing the
    single-pair scans (the claim batch application rests on)."""
    pairs = [("a", "b"), ("c", "d")]
    for word in ("abcd", "acbd", "ababcdcd", "x", "ab", "cdab", "dcba"):
        df = spark.createDataFrame([(word,)], "w string")
        one = df.select(
            bpe.batch_merge_scan_expr(bpe.chars_expr(F.col("w")), pairs).alias("m")
        ).first()["m"]
        chained = list(word)
        for p in pairs:
            chained = _greedy_merge(chained, *p)
        assert one == chained, word


def test_select_batch_guards():
    """Driver-side guard unit cases: prefix-stop on symbol overlap, on
    dominance violation, and on the truncated-list floor."""
    # disjoint + dominant: both accepted
    assert bpe._select_batch(
        [("a", "b", 10), ("c", "d", 9)], 8, truncated=False
    ) == [("a", "b", 10), ("c", "d", 9)]
    # symbol overlap stops the batch (never skips past)
    assert bpe._select_batch(
        [("a", "b", 10), ("b", "c", 9), ("x", "y", 8)], 8, truncated=False
    ) == [("a", "b", 10)]
    cands = [("a", "b", 10), ("b", "c", 9), ("x", "y", 9)]
    # list order is (cnt desc, lhs, rhs): ("b","c") precedes ("x","y");
    # it overlaps "b" → batch stops at 1
    assert bpe._select_batch(cands, 8, truncated=False) == [("a", "b", 10)]
    # dominance violation without overlap: interacting candidate count
    # equals the new pair's count
    cands = [("a", "b", 10), ("x", "y", 9), ("b", "c", 9)]
    assert bpe._select_batch(cands, 8, truncated=False) == [("a", "b", 10)]
    # truncated list: a pair at the floor is rejected
    assert bpe._select_batch(
        [("a", "b", 10), ("c", "d", 9)], 8, truncated=True
    ) == [("a", "b", 10)]
    # concat collision: ("ab", anything) must not enter a batch with (a, b)
    assert bpe._select_batch(
        [("a", "b", 10), ("ab", "c", 9)], 8, truncated=False
    ) == [("a", "b", 10)]
    # REVERSE concat collision: after accepting ("abcd", "x"), a pair
    # ("a", "bcd") whose FUSED OUTPUT equals the accepted pair's symbol
    # must end the batch — in one batched scan [a,bcd,x] would cascade
    # to 'abcdx' while the sequential trainer yields [abcd, x]
    assert bpe._select_batch(
        [("abcd", "x", 10), ("a", "bcd", 9)], 8, truncated=False
    ) == [("abcd", "x", 10)]
