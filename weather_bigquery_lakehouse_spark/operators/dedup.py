"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Everything here is built-in-function composition (md5/sha2, array ops,
hash aggregates, self-joins) — no Python in the hot path. Shuffle shape at
100 TB, per operator:

  exact        — one hash aggregate keyed on a 32-byte digest (narrow
                 shuffle key even for multi-MB documents).
  MinHash+LSH  — per-row array math (no shuffle) → one groupBy per doc for
                 the signature → self-join keyed on (band_idx, band_hash):
                 the join key is a hash bucket, so co-candidates co-locate
                 and the join degenerates to within-bucket pairs. Bucket
                 skew (a viral duplicate cluster) is the known hot spot —
                 AQE skew-join spreads moderate skew, and buckets larger
                 than ``max_bucket_size`` are dropped before the join
                 (viral clusters belong to exact dedup, which collapses
                 them in one aggregate).
  SimHash      — pure per-doc aggregation (token explode → one groupBy);
                 near-dup lookup is then a cheap equality/Hamming probe.
  n-gram Jaccard — exact pairwise verification; self-join on shingle hash.
                 Quadratic in cluster size by nature: at scale run it ONLY
                 on LSH candidate pairs, never all-pairs (the composition
                 `lsh_candidate_pairs` → `ngram_jaccard_pairs(candidates)`
                 is the intended 100 TB path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import shingles_expr, tokens_expr

# MinHash configuration shared with the oracle SQL in plans/extensions.py.
N_HASHES = 16
BAND_ROWS = 2  # 8 bands of 2 rows

# Guardrail for the LSH self-join: a band bucket with n docs produces
# ~n²/2 join rows, so one viral duplicate cluster (say 10M copies of a
# boilerplate page at 100 TB) would emit 5·10¹³ pairs. Buckets above this
# size are DROPPED from candidate generation — the standard treatment:
# such clusters are better handled by exact dedup (the digest groupBy),
# which collapses them in one aggregate regardless of size. The default is
# far above anything the fixtures produce, so capped and uncapped results
# are identical on the test data.
DEFAULT_MAX_BUCKET_SIZE = 10_000

# Universal-hash family over the Mersenne prime 2^31-1: one md5→int
# conversion per shingle, then each family member is (a·h + b) mod P —
# pure 64-bit arithmetic (h < P, a,b < P ⇒ a·h+b < 2^62, no overflow),
# portable verbatim to the DuckDB oracle. 16× cheaper than hashing the
# shingle 16 times.
MINHASH_P = 2_147_483_647
import random as _random

_rng = _random.Random(20240513)
MINHASH_AB = [
    (_rng.randrange(1, MINHASH_P), _rng.randrange(0, MINHASH_P)) for _ in range(N_HASHES)
]


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via content digest: groups keyed by sha256 of the
    normalized text, keeping the min id as the canonical representative.
    One aggregate, shuffle key = digest (32 bytes) regardless of doc size."""
    digest = F.sha2(F.trim(F.col(text_col)), 256)
    return (
        df.where(F.col(text_col).isNotNull())
        .groupBy(digest.alias("text_sha"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingle_int_expr(shingle: Column) -> Column:
    """60-bit integer hash of a shingle (md5 hex prefix), reduced mod P."""
    h = F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("bigint")
    return h % MINHASH_P


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) rows with per-doc-distinct shingles.

    Two deliberate plan choices:
      * the token array is MATERIALIZED in its own projection before the
        shingle transform — element_at inside a higher-order function is
        not common-subexpression-eliminated, so inlining the tokenizer
        would re-run the regex split per index (O(tokens²));
      * the input is hash-repartitioned by doc id up front: it spreads the
        CPU-bound shingling across all cores even when the source is a
        single file, balances long-document skew, and the downstream
        groupBy(doc_id) reuses the partitioning instead of adding its own
        shuffle — net shuffle count unchanged, the moved bytes are the
        compact pre-explode text."""
    spread = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    toks = spread.select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
    return toks.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_expr(F.col("__toks"), k))).alias("shingle"),
    )


def _signatures_from_shingles(
    sh: DataFrame, id_col: str, n_hashes: int = N_HASHES
) -> DataFrame:
    """MinHash signature aggregation from (id, shingle) rows — THE single
    definition of the signature recipe (md5-derived shingle int, hash
    family, modulus, h{i} column names). ``minhash_signatures``,
    ``lsh_verified_pairs``, and ``incremental_lsh_pairs`` all call it, so
    a persisted base signature table can never silently diverge from
    signatures computed fresh for an increment."""
    exploded = sh.select(
        F.col(id_col), shingle_int_expr(F.col("shingle")).alias("h")
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_AB[:n_hashes])
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_hashes: int = N_HASHES
) -> DataFrame:
    """Per-doc MinHash signature: columns h0..h{n-1}, each the min over the
    doc's distinct word-3-gram shingles of one universal-hash family member
    ((a·h + b) mod P over the md5-derived shingle int).

    Shape: per-row shingle explode → ONE groupBy(doc) computing all n mins
    (map-side partial aggregation makes the shuffle carry just n longs per
    doc, not the shingles). This is the frame to PERSIST at base ingest —
    ``incremental_lsh_pairs(base_signatures=…)`` accepts it back so daily
    increments never re-shingle the base corpus."""
    return _signatures_from_shingles(
        _doc_shingles(df, text_col, id_col), id_col, n_hashes
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """LSH banding over MinHash signatures → candidate near-dup pairs.

    Signature is split into n/band_rows bands; docs sharing any band hash
    become a candidate pair. The self-join keys on (band_idx, band_hash),
    so the shuffle routes each doc to exactly n_bands buckets.

    ``max_bucket_size`` is the scale guardrail: buckets holding more docs
    than this are dropped BEFORE the self-join via a map-side-combined
    occupancy count followed by a broadcast left-anti join on the hot
    (band_idx, band_hash) keys — oversized buckets are by construction few,
    so the hot-key list broadcasts and the banded rows are never reshuffled
    for the cap. This bounds the pair expansion of any one bucket at
    max_bucket_size²/2 instead of letting a viral duplicate cluster go
    quadratic. Pass ``None`` to disable."""
    sig = minhash_signatures(df, text_col, id_col, n_hashes)
    return _candidate_pairs_from_sig(sig, id_col, n_hashes, band_rows, max_bucket_size)


def _candidate_pairs_from_sig(
    sig: DataFrame,
    id_col: str,
    n_hashes: int,
    band_rows: int,
    max_bucket_size: int | None,
    flag_col: str | None = None,
) -> DataFrame:
    """``flag_col`` (0/1 column on ``sig``) is the incremental-dedup hook:
    when set, the banded self-join emits only pairs where AT LEAST ONE
    side is flagged — per-bucket pair expansion drops from n²/2 to
    n_flagged·n, and flag-flag=0 (base-base) pairs never materialize.
    Band hashes and the hot-bucket cap are flag-independent, so the
    emitted pairs equal the unrestricted run filtered post-hoc."""
    n_bands = n_hashes // band_rows
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"h{b * band_rows + r}") for r in range(band_rows)]
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    carry = [flag_col] if flag_col else []
    banded = sig.select(
        F.col(id_col), *[F.col(c) for c in carry], F.explode(bands).alias("band")
    ).select(id_col, *carry, "band.band_idx", "band.band_hash")
    # Materialize once (eager local checkpoint): the occupancy count and
    # both self-join sides reference this frame, and without
    # materialization Spark recomputes the whole tokenize→shingle→signature
    # lineage per reference. Unlike `.cache()`, checkpoint blocks are
    # released by the ContextCleaner when the frame is garbage-collected —
    # repeated calls (the 29-query gate, bench loops) don't accumulate
    # blocks in the CacheManager forever. The frame is tiny (n_bands rows ×
    # ~40 B/doc); at warehouse scale this is a persisted signature table.
    banded = banded.localCheckpoint(eager=True)
    if max_bucket_size is not None:
        # The cap costs one map-side-combined aggregate over the compact
        # banded frame plus a broadcast anti-join — NOT an extra full
        # shuffle of the rows (a windowed count would shuffle everything).
        # Oversized buckets are by construction few, so the hot-key list
        # broadcasts.
        hot = (
            banded.groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_bucket_size)
            .drop("__n")
        )
        banded = banded.join(F.broadcast(hot), ["band_idx", "band_hash"], "left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    cond = (
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    if flag_col:
        cond = cond & ((F.col(f"a.{flag_col}") + F.col(f"b.{flag_col}")) >= 1)
    return (
        a.join(b, cond)
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    k: int = 3,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over word-k-gram sets for doc pairs.

    Without ``candidates``: all pairs sharing ≥1 shingle (self-join on the
    shingle — exact but quadratic in cluster size). With ``candidates``
    (doc_a, doc_b — e.g. from LSH): verification only. Output columns:
    doc_a, doc_b, jaccard (exact rational → double, engine-portable)."""
    # Materialized once — referenced three times below (sizes + both join
    # sides). localCheckpoint instead of cache() so blocks are released on
    # GC rather than pinned in the CacheManager across repeated calls.
    sh = _doc_shingles(df, text_col, id_col, k).localCheckpoint(eager=True)
    return _jaccard_from_shingles(sh, id_col, threshold, candidates)


def _jaccard_from_shingles(
    sh: DataFrame,
    id_col: str,
    threshold: float,
    candidates: DataFrame | None,
) -> DataFrame:
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def lsh_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    k: int = 3,
) -> DataFrame:
    """FUSED near-dup pipeline: LSH candidate generation ∘ exact Jaccard
    verification sharing ONE materialized shingle frame. Composing
    ``lsh_candidate_pairs`` + ``ngram_jaccard_pairs(candidates=…)``
    naively tokenizes and shingles the corpus twice — the CPU-heaviest
    stage, so at 100 TB the fusion halves the dominant cost. Results are
    identical to the composition by construction (both stages derive from
    the same shingle rows).

    Round-13: the verify stage shingle-joins ONLY candidate-involved
    documents — ``incremental_lsh_pairs``' documented prune applied to
    the batch path. The exact-Jaccard self-join is quadratic in shingle
    document-frequency, and non-candidate pairs were previously computed
    and aggregated just to be semi-joined away afterwards (measured at
    sf0.1: 1.27M co-shingle join rows for 1,117 candidate pairs over
    1,159 involved docs — 23% of the corpus). Restricting BOTH join
    sides to candidate-involved docs keeps every candidate pair's full
    shingle sets (sizes and intersections unchanged), so the emitted
    pairs are identical; the candidate frame is checkpointed because the
    doc-set derivation and the final pair filter both consume it."""
    sh = _doc_shingles(df, text_col, id_col, k).localCheckpoint(eager=True)
    sig = _signatures_from_shingles(sh, id_col, n_hashes)
    candidates = _candidate_pairs_from_sig(
        sig, id_col, n_hashes, band_rows, max_bucket_size
    ).localCheckpoint(eager=True)
    cand_docs = (
        candidates.select(F.col("doc_a").alias(id_col))
        .unionByName(candidates.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sh_verify = sh.join(cand_docs, id_col, "left_semi")
    return _jaccard_from_shingles(sh_verify, id_col, threshold, candidates)


def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_sim_ppm: int = 600_000,
    max_chars: int = 2000,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Character-level edit-similarity verification for near-dup pairs:
    the third verify metric beside n-gram Jaccard (token-set overlap) and
    embedding cosine (semantic) — edit distance catches character-level
    mutations (typos, boilerplate substitutions, template fills) that
    leave whole shingles intact or break them entirely.

    Levenshtein is O(len_a·len_b) PER PAIR, so the 100 TB discipline is
    three nested prunes, in order:

      1. ``candidates`` — only LSH candidate pairs are ever considered
         (defaults to :func:`lsh_candidate_pairs`; never all-pairs).
      2. length prefilter — lev(a,b) ≥ |len_a − len_b|, so any pair whose
         LENGTH GAP alone puts the similarity bound below ``min_sim_ppm``
         drops before the quadratic kernel runs (cheap JVM comparison;
         evaluated first by And short-circuit — kept in a separate filter
         stage below the levenshtein projection).
      3. ``max_chars`` — the kernel runs on a bounded prefix (document
         near-dup verification, not full-document diffing; 2000² char
         comparisons ≈ tens of µs/pair). The prefix cap is part of the
         metric's definition here and mirrored in the oracle.

    Similarity is exact-integer ppm of the prefix pair:

        sim_ppm = ((maxlen − lev) · 1e6) div maxlen     (1e6 when maxlen=0)

    Output: (doc_a, doc_b, edit_distance, sim_ppm) for pairs with
    sim_ppm ≥ ``min_sim_ppm``. JVM-side end to end (``F.levenshtein`` is
    a codegen'd built-in; DuckDB's ``levenshtein`` is the identical DP)."""
    if candidates is None:
        candidates = lsh_candidate_pairs(df, text_col, id_col)
    txt = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.substring(F.col(text_col), 1, max_chars).alias("__txt"),
    )
    ta = txt.select(
        F.col(id_col).alias("doc_a"),
        F.col("__txt").alias("__ta"),
        F.length("__txt").cast("bigint").alias("__la"),
    )
    tb = txt.select(
        F.col(id_col).alias("doc_b"),
        F.col("__txt").alias("__tb"),
        F.length("__txt").cast("bigint").alias("__lb"),
    )
    maxlen = F.greatest("__la", "__lb")
    gap = F.abs(F.col("__la") - F.col("__lb"))
    # Prune 2: best-case similarity given the length gap alone. Exact
    # superset of the final predicate (lev >= gap), so results are
    # unchanged — only the kernel work shrinks.
    bound_ok = (maxlen == 0) | (
        (maxlen - gap) * F.lit(1_000_000) >= F.lit(min_sim_ppm) * maxlen
    )
    lev = F.levenshtein("__ta", "__tb").cast("bigint")
    # integer floor division via expr (BIGINT div) to match DuckDB //
    sim = F.when(maxlen == F.lit(0), F.lit(1_000_000).cast("bigint")).otherwise(
        F.expr(
            "CAST(((greatest(__la, __lb) - __lev) * CAST(1000000 AS BIGINT))"
            " div greatest(__la, __lb) AS BIGINT)"
        )
    )
    return (
        candidates.join(ta, "doc_a")
        .join(tb, "doc_b")
        .where(bound_ok)
        .withColumn("__lev", lev)
        .withColumn("sim_ppm", sim)
        .where(F.col("sim_ppm") >= min_sim_ppm)
        .select(
            "doc_a", "doc_b", F.col("__lev").alias("edit_distance"), "sim_ppm"
        )
    )


def _assemble_incremental_signatures(
    df: DataFrame,
    new_pred: Column,
    flags: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int,
    k: int,
    base_signatures: DataFrame | None,
) -> tuple[DataFrame, DataFrame | None]:
    """The flagged signature frame feeding the banded join — extracted so
    the plan contract is pin-able on exactly what ``incremental_lsh_pairs``
    checkpoints: with ``base_signatures`` present, base h{i} columns come
    straight off the persisted table's scan and ONLY increment rows are
    shingled (one Generate/explode in the whole plan, under the increment
    filter); without it, the corpus-wide shingle checkpoint is returned
    for the verify stage to reuse."""
    if base_signatures is None:
        sh = _doc_shingles(df, text_col, id_col, k).localCheckpoint(eager=True)
        return _signatures_from_shingles(sh, id_col, n_hashes).join(flags, id_col), sh
    sig_cols = [id_col] + [f"h{i}" for i in range(n_hashes)]
    # consumed exactly once (the signature aggregate) — no checkpoint
    sh_new = _doc_shingles(df.where(new_pred), text_col, id_col, k)
    sig = (
        _signatures_from_shingles(sh_new, id_col, n_hashes)
        .select(*sig_cols)
        .withColumn("__new", F.lit(1))
        .unionByName(
            base_signatures.select(*sig_cols).withColumn("__new", F.lit(0))
        )
    )
    return sig, None


def incremental_lsh_pairs(
    df: DataFrame,
    new_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    k: int = 3,
    base_signatures: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL near-dup dedup: verified pairs the NEW increment
    introduces against an already-deduped base — the daily-crawl shape.
    Re-running ``lsh_verified_pairs`` over base ∪ increment re-pairs the
    whole corpus every day (base-base pairs were found at base's own
    ingest); here the increment flag is threaded INTO the banded
    self-join, so base-base pairs never materialize and verification
    touches only candidate-involved documents.

    ``new_pred`` is a boolean column expression marking increment rows
    (e.g. an ingest-date predicate). Output: (doc_a, doc_b, jaccard,
    link_type) with ``link_type`` ∈ {'new_base', 'new_new'} — new_base
    links dedup the increment against the index, new_new links dedup
    within the increment. Equals the full ``lsh_verified_pairs`` run
    filtered to new-involving pairs (band hashes and the hot-bucket cap
    are flag-independent; Jaccard is pair-local — pytest-pinned).

    Scale shape: one shared shingle checkpoint (the fused pipeline's
    pattern); per-bucket pair expansion n_new·n_total instead of
    n_total²/2; the exact-Jaccard stage shingle-joins ONLY documents that
    appear in a candidate pair (two left-semi prunes), so verify work is
    increment-proportional.

    ``base_signatures`` is the warehouse-scale substitution: pass the
    signature table persisted at base ingest (a ``minhash_signatures``
    frame — same h{i} recipe by construction, both call
    ``_signatures_from_shingles``) and the BASE corpus is never
    re-shingled: only increment rows are tokenized for signatures, and
    base text is shingled solely for the candidate-involved doc set in
    the verify stage (increment-proportional by the bucket cap).
    Contract: ``base_signatures`` holds one row per base doc of ``df``
    (ids disjoint from increment rows); ``new_pred`` still marks the
    increment rows inside ``df``, whose text the verify stage reads.
    """
    flags = df.select(
        F.col(id_col), new_pred.cast("int").alias("__new")
    )
    sig, sh = _assemble_incremental_signatures(
        df, new_pred, flags, text_col, id_col, n_hashes, k, base_signatures
    )
    cand = _candidate_pairs_from_sig(
        sig, id_col, n_hashes, band_rows, max_bucket_size, flag_col="__new"
    ).localCheckpoint(eager=True)
    cand_docs = (
        cand.select(F.col("doc_a").alias(id_col))
        .unionByName(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    if base_signatures is None:
        sh_verify = sh.join(cand_docs, id_col, "left_semi")
    else:
        # base text is shingled here and ONLY here — for the
        # candidate-involved docs, never corpus-wide. Materialized once:
        # _jaccard_from_shingles references its input three times (sizes,
        # a-side, b-side), and unlike the recompute branch there is no
        # checkpointed corpus-wide `sh` upstream to absorb the re-reads —
        # lazy, the candidate tokenize+shingle (and the semi-join) would
        # run 3x.
        sh_verify = _doc_shingles(
            df.join(cand_docs, id_col, "left_semi"), text_col, id_col, k
        ).localCheckpoint(eager=True)
    verified = _jaccard_from_shingles(sh_verify, id_col, threshold, cand)
    link = F.when(
        (F.col("__na") + F.col("__nb")) == 2, F.lit("new_new")
    ).otherwise(F.lit("new_base"))
    return (
        verified.join(
            flags.select(F.col(id_col).alias("doc_a"), F.col("__new").alias("__na")),
            "doc_a",
        )
        .join(
            flags.select(F.col(id_col).alias("doc_b"), F.col("__new").alias("__nb")),
            "doc_b",
        )
        .select("doc_a", "doc_b", "jaccard", link.alias("link_type"))
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Frequency-weighted SimHash over tokens: each token contributes ±1
    per bit position of its 60-bit md5-derived hash; sign of the column sum
    sets the output bit. One explode + one groupBy(doc) with `bits` sums.

    Near-dup lookup downstream is then equality (or small-radius Hamming
    probing by flipping bits) — no pairwise scan."""
    # spread the tokenize+explode stage (the _doc_shingles pattern): off
    # a compacted zone the per-token md5 stream otherwise runs on the
    # scan's few partitions before the groupBy's partial aggregate
    tok = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    ).select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("token"))
    # 60-bit integer from the md5 hex prefix — portable across engines.
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("bigint")
    tok = tok.select(id_col, h.alias("h"))
    sums = tok.groupBy(id_col).agg(
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    value = None
    for b in range(bits):
        bit = F.when(F.col(f"s{b}") >= 0, F.lit(2**b)).otherwise(F.lit(0))
        value = bit if value is None else (value + bit)
    return sums.select(F.col(id_col), value.cast("bigint").alias("simhash"))


def connected_components(
    pairs: DataFrame,
    left_col: str = "doc_a",
    right_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Duplicate-cluster formation: connected components over the pair
    graph via iterative min-label propagation, the stage that turns
    near-dup PAIRS into disjoint clusters with a canonical representative
    (min id). Output: (node, cluster_id).

    This is the Pregel-style pattern with pointer doubling: each iteration
    (a) propagates labels along edges and takes the per-node min, then (b)
    contracts label chains by replacing every label with its own label
    (``comp ← label(comp)``). The contraction halves the remaining chain
    depth, so convergence is O(log diameter) instead of O(diameter) —
    long chains formed ACROSS LSH buckets (the bucket cap bounds bucket
    size, not component diameter) converge well inside ``max_iterations``.
    localCheckpoint truncates lineage each iteration (an unbounded
    iterative lineage chain re-executes every prior join on failure and
    overwhelms the planner). Convergence detection is FOLDED into the
    propagation: each row carries a ``label != old_label`` flag computed
    in the same plan that materializes the checkpoint, and the driver
    reads ``max(flag)`` with a scan-only aggregate over the checkpointed
    partitions — no separate probe join (the pre-round-6 LIMIT-1 probe
    joined new labels against old ones, a full extra shuffle per
    iteration). All joins key on node ids — shuffle-partitioned, no
    all-pairs, no driver-side graph.

    Round-13 iteration shape (results identical, fewer exchanges/jobs):

    * Round 0 is FUSED into label initialization. With ``labels(v) = v``
      the first min-propagation round reduces to
      ``comp = min(node, min(neighbors))`` — one map-side-combinable
      aggregate straight over the symmetrized edge list (every node
      appears as ``src``), replacing the old distinct-nodes checkpoint
      job PLUS the first round's edge⋈labels join.
    * Later rounds take the per-node min over {own label} ∪ {incoming
      labels} with ONE union + aggregate (the own row rides the same
      combinable min, tagged so the OLD label falls out of the identical
      aggregate for the change flag) instead of the former
      groupBy + second labels join — one exchange and one join fewer per
      round.

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iterations`` — silently returning non-converged labels would
    split one true component into several cluster_ids.
    """
    fwd = pairs.select(F.col(left_col).alias("src"), F.col(right_col).alias("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    # round 0, fused: comp = min(node, min(neighbors)); flag = changed
    new_labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("__mn"))
        .select(
            "node",
            F.least("node", "__mn").alias("comp"),
            (F.least("node", "__mn") != F.col("node")).cast("int").alias("__chg"),
        )
        .localCheckpoint(eager=True)
    )
    row = new_labels.agg(F.max("__chg").alias("c")).first()
    changed = int(row["c"] or 0)
    labels = new_labels.select("node", "comp")
    for it in range(1, max_iterations):
        if changed == 0:
            break
        msgs = edges.join(labels, edges["src"] == labels["node"]).select(
            F.col("dst").alias("node"), "comp", F.lit(0).alias("__own")
        )
        own = labels.select("node", "comp", F.lit(1).alias("__own"))
        # one combinable aggregate over own ∪ incoming rows: min(comp) is
        # the propagated label, and the tagged own row (exactly one per
        # node) yields the OLD label for the change flag — no second join
        cand = (
            msgs.unionByName(own)
            .groupBy("node")
            .agg(
                F.min("comp").alias("comp"),
                F.max(F.when(F.col("__own") == 1, F.col("comp"))).alias("__old"),
            )
            .select("node", "__old", "comp")
        )
        if it < 2:
            # near-dup components are usually pairs/small cliques that
            # converge in ≤2 plain rounds — skip the doubling join's extra
            # shuffle+checkpoint until a chain proves deeper than that
            stepped = cand
        else:
            # checkpoint BEFORE the doubling self-join: the join below
            # reads `cand` twice, and over a deep derived lineage the
            # attribute reuse trips Catalyst rewrites; over a
            # materialized leaf it is a plain self-join.
            # Pointer doubling: comp ← label(comp). Every comp value is
            # itself a node (labels cover all nodes and min-propagation
            # only moves existing ids), so the self-join is total;
            # coalesce is belt-and-braces for the root, whose label is
            # itself. Halves remaining chain depth → O(log diameter).
            cand = cand.localCheckpoint(eager=True)
            stepped = cand.join(
                cand.select(
                    F.col("node").alias("comp"), F.col("comp").alias("__comp2")
                ),
                "comp",
                "left",
            ).select(
                "node", "__old", F.coalesce("__comp2", "comp").alias("comp")
            )
        new_labels = stepped.select(
            "node",
            "comp",
            (F.col("comp") != F.col("__old")).cast("int").alias("__chg"),
        ).localCheckpoint(eager=True)
        # scan-only aggregate over the partitions the checkpoint just
        # materialized — the only per-iteration driver action
        row = new_labels.agg(F.max("__chg").alias("c")).first()
        changed = int(row["c"] or 0)
        labels = new_labels.select("node", "comp")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations — raise max_iterations (convergence is O(log "
            "diameter) under pointer doubling, so this indicates a "
            "pathological pair graph)"
        )
    return labels
