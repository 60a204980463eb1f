"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query materializes fully via the `noop` sink (no driver collect, no
result truncation — the honest cost of computing the whole answer).

Each query runs REPS times (default 4) and reports the per-query MEDIAN
over reps 2..N — the FIRST rep is discarded as cold (round-13 convention
change, VERDICT r12 Next #4): solo audits in rounds 11-12 proved the
first rep of a shuffle-heavy entry runs ~4x steady state even on a quiet
box (per-plan whole-stage-codegen compile + first-touch page-cache reads
of the sf0.1 parquet — costs a generic warm-up cannot pre-pay, see the
round-12 negative result below), and median-of-3 landing on that cold
curve produced two rounds of spurious "counter-mover" audits
(split_leakage_safe r11, dedup_minhash_lsh r12). The median still
absorbs one noisy steady rep (CPU contention from a co-tenant process
can't masquerade as a plan regression — round-2's recorded bench was
~40% inflated across the board by exactly that). ALL raw per-rep
timings, including the discarded cold rep, ship in "runs" for
auditability. Set SPARK_GRAFT_BENCH_LEGACY_MEDIAN=1 to reproduce the
pre-r13 convention (median over all reps) for cross-round continuity.

The JSON line is additionally NOISE-EVIDENT (round-6 verdict demand: the
official r6 record read as a +34% regression that was actually box load):
- "value_floor" = sum of per-query MIN reps — the best-case the plans
  achieved on this box; a loaded run shows value >> value_floor, a plan
  regression moves both together.
- "load_avg" = 1/5/15-min load averages sampled before the first timed
  query, so a contended box is self-describing in the record. If the
  1-minute load exceeds LOAD_WARN at start, "load_warning" is set.
- "cpu_probe_s" / "cpu_probe_mid_s" / "cpu_probe_end_s" = the same
  fixed-work single-thread probe at sweep start, between the headline
  and extended sweeps, and at the end. HOST-level contention shows in
  neither load_avg nor steal; a stable probe triple means per-entry
  deltas are plan-attributable, a drifting one means the sweep outran
  its window (round-13 lesson: a 0.49-start sweep sagged mid-run and
  the drift had to be reconstructed from per-entry ratios).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weather_bigquery_lakehouse_spark.session import build_session
from weather_bigquery_lakehouse_spark.operators import dedup as _dd
from weather_bigquery_lakehouse_spark.plans import ALL_QUERIES
from weather_bigquery_lakehouse_spark.plans import extensions as _ext

# Index-sizing inputs behind the ANN/dedup timings, recorded so a bench
# delta can be attributed to parameterization vs plan regression (the
# round-3 ivf slowdown was the √n sizing rule kicking in, not the plan).
SIZING = {
    "similarity_ivf_topk": {
        "n_cells": _ext._N_CELLS,
        "n_probe_queries": _ext._N_PROBES,
        "top_k": _ext._TOP_K,
        "rule": f"ivf_n_cells({_ext._GATE_CORPUS_N})",
    },
    "similarity_lsh_topk": {"n_planes": _ext._N_PLANES, "n_probes": 1},
    "similarity_ivf_multiprobe": {
        "n_cells": _ext._N_CELLS,
        "n_probe_cells": _ext._N_IVF_PROBE_CELLS,
    },
    "similarity_lsh_multiprobe": {
        "n_planes": _ext._N_PLANES,
        "n_probes": _ext._N_MULTIPROBE,
        "rule": f"lsh_n_planes({_ext._GATE_CORPUS_N}, occupancy=8)",
    },
    "dedup_minhash_lsh": {
        "n_hashes": _dd.N_HASHES,
        "band_rows": _dd.BAND_ROWS,
        "n_bands": _dd.N_HASHES // _dd.BAND_ROWS,
    },
    "similarity_ivfpq_topk": {
        "n_cells": _ext._N_CELLS,
        "n_probe_cells": _ext._N_IVF_PROBE_CELLS,
        "m": _ext._PQ_M,
        "n_codes": _ext._PQ_CODES,
    },
    "ann_kmeans_codebook": {
        "m": _ext._PQ_M,
        "n_codes": _ext._PQ_CODES,
        "n_iter": _ext._KM_ITER,
    },
    "ann_kmeans_centroids": {
        "n_cells": _ext._N_CELLS,
        "n_iter": _ext._KM_ITER,
        "sample_n": _ext._KM_SAMPLE_N,
    },
}


def _rag_sizing():
    from weather_bigquery_lakehouse_spark.plans import curation as _cur

    return {
        "embed_dim": _cur._RAG_DIM,
        "chunk_tokens": _cur._RAG_CHUNK,
        "stride": _cur._RAG_STRIDE,
        "top_k": _cur._RAG_K,
    }


SIZING["rag_chunk_index_topk"] = _rag_sizing()

# Headline set: the flagship star query + one representative per operator
# family. (Correctness for the rest is the oracle gate's job; the bench
# tracks the plans whose scale behavior matters.)
HEADLINE = [
    "flagship_star_revenue",
    "filter_project_pushdown",
    "rollup_pricing_summary",
    "topk_customers_per_region",
    "fact_orders_keys",
    "latest_snapshot",
    "hourly_events_rollup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality_score",
    "similarity_cosine_topk",
    "similarity_lsh_topk",
]

# Operators added after round 1. Timed and reported, but NOT in the
# headline total — `value` stays comparable round-over-round (the round-1
# 13-query set is the regression baseline).
EXTENDED = [
    "dedup_lsh_verified",
    "similarity_lsh_multiprobe",
    "similarity_ivf_topk",
    "similarity_ivf_multiprobe",
    "asof_last_click",
    "sessionize_events",
    "range_join_clicks_before_purchase",
    "cleaning_report_documents",
    # round-3 curation/incremental operators
    "decontaminate_ngram_overlap",
    "tfidf_top_terms",
    "merge_upsert_orders",
    "embedding_quantize",
    "train_shuffle_order",
    "quality_gopher_flags",
    "dedup_cluster_assign",
    # round-5 window rotation + composed RAG pipeline
    "rag_chunk_index_topk",
    "mixture_balance_docs",
    "repeated_span_flags",
    "split_leakage_safe",
    "chunk_documents",
    "embedding_dup_clusters",
    # round-5 staged additions
    "quality_token_df_fluency",
    "streaming_watermarked_rollup",
    "chunk_index_refresh",
    "corpus_curation_pipeline",
    "streaming_chunk_index",
    "quantiles_by_event_type",
    # round-6 rotation additions
    "training_shards_manifest",
    "multimodal_frame_manifest",
    "fact_rerun_idempotent",
    "streaming_dedup_bounded",
    # round-6 staged additions
    "repeated_span_scrub",
    "token_budget_sample",
    "quality_bigram_lm",
    "streaming_interval_join",
    "zorder_layout_events",
    "decontaminate_span_depth",
    "streaming_enrich_static",
    "source_overlap_matrix",
    "similarity_pq_topk",
    "decontaminate_bloom",
    "cms_heavy_hitters",
    "contrastive_pairs",
    "corpus_datasheet",
    "cluster_label_purity",
    "mixture_drift",
    "skew_key_report",
    # round-7 staged additions
    "similarity_ivfpq_topk",
    "silver_quality_documents",
    "quality_ccnet_buckets",
    "dedup_incremental_lsh",
    "mixture_temperature_sample",
    "embedding_covariance",
    # round-8: the trained-quantizer gates OWN the cold k-means builds
    # (PRE_REP purges their one-slot memos each rep); ann_recall_report
    # runs after them over the warm shared frames — the production shape,
    # where one registry sweep trains each quantizer once (the
    # embedding_pair_clusters / embedding_dup_clusters precedent).
    "ann_kmeans_codebook",
    "ann_kmeans_centroids",
    "ann_recall_report",
    "ivf_cell_occupancy",
    "cardinality_hll_documents",
    # round-8 late additions: bpe_merge_table OWNS the cold tokenizer
    # training (PRE_REP purges the one-slot memo); bpe_vocab and
    # bpe_token_stats run after it over the warm trained state — the
    # production shape (train once, consume everywhere).
    # snapshot_diff_orders lands its two versioned snapshots on first
    # invocation and re-diffs the committed versions on later reps, so
    # its median times the time-travel read + diff (the operator), not
    # the setup writes.
    "bpe_merge_table",
    "bpe_vocab",
    "bpe_token_stats",
    "snapshot_diff_orders",
    "pagerank_centrality",
    # round-8 late additions: lexical retrieval + fusion, the
    # edit-distance verify metric, and the outer streaming join
    "bm25_topk_documents",
    "hybrid_rrf_topk",
    "dedup_edit_distance",
    "streaming_interval_join_outer",
    "entity_resolution_customers",
    "gap_fill_hourly_events",
    "ohlc_hourly_events",
    "incremental_rollup_orders",
    "priority_sample_documents",
    "graph_triangles_neardup",
    "quality_expectations_orders",
    "multimodal_resize",
    "cohort_retention_events",
    "funnel_conversion_events",
    "unpivot_ohlc_hourly",
    # round-9: OPTIMIZE bin-packing plan (lakehouse-maintenance family)
    "compaction_plan_documents",
    # round-9: the WAV encode->decode->features binary round-trip
    "audio_wav_features_events",
    # round-9: the P6 pixel encode->decode->resample round-trip
    "image_ppm_resize_events",
    # round-10: PNG all-five-filters round-trip, the four video-container
    # parser paths, and the three-family probe dispatch
    "image_png_resize_events",
    "video_metadata_events",
    "probe_media_events",
    # round-11: the baseline JPEG codec round-trip (DC-exact window)
    "image_jpeg_roundtrip_events",
]


def _reset_chunk_index_state(sf_dir: str) -> None:
    """streaming_chunk_index maintains an AvailableNow checkpoint in the
    per-process gold workdir — without a reset, reps 2..n find the zone
    fully processed and time a no-op (round-5 bench recorded 0.12 s for a
    1.8 s build). Clearing the index+checkpoint before each rep makes the
    median time the real build, mirroring streaming_watermarked_rollup's
    fresh-scratch-per-invocation pattern."""
    import shutil

    from weather_bigquery_lakehouse_spark.plans.curation import _GOLD_WORKDIRS

    root = _GOLD_WORKDIRS.get(sf_dir)
    if root:
        for sub in ("chunk_index", "chunk_ckpt"):
            shutil.rmtree(os.path.join(root, sub), ignore_errors=True)


def _reset_pair_cluster_cache(_sf_dir: str) -> None:
    """embedding_dup_clusters OWNS the iterative pair+CC cost in this
    record: purge the shared cluster memo before each of its reps so its
    median times the cold build. The sibling audits (contrastive_pairs,
    cluster_label_purity) run AFTER it in EXTENDED and are timed over the
    warm shared frame — the production shape, where one registry sweep
    derives clusters once (round-6 verdict #5)."""
    from weather_bigquery_lakehouse_spark.operators.similarity import (
        _PAIR_CLUSTER_CACHE,
    )

    _PAIR_CLUSTER_CACHE.clear()


def _reset_kmeans_codebook_cache(_sf_dir: str) -> None:
    """ann_kmeans_codebook owns the cold PQ-codebook training cost."""
    from weather_bigquery_lakehouse_spark.operators.kmeans import _PQ_CB_CACHE

    _PQ_CB_CACHE.clear()


def _reset_kmeans_centroid_cache(_sf_dir: str) -> None:
    """ann_kmeans_centroids owns the cold IVF-centroid training cost."""
    from weather_bigquery_lakehouse_spark.operators.kmeans import _CENTROID_CACHE

    _CENTROID_CACHE.clear()


def _reset_bpe_cache(_sf_dir: str) -> None:
    """bpe_merge_table owns the cold tokenizer-training cost."""
    from weather_bigquery_lakehouse_spark.operators.bpe import _BPE_CACHE

    _BPE_CACHE.clear()


# per-query state reset run before EACH rep (outside the timed section)
def _reset_covariance_cache(_sf_dir: str) -> None:
    """embedding_covariance cache()s its dim²-bounded stats frame so the
    g/s/n slices share ONE corpus pass within a run — but Spark's
    CacheManager matches canonicalized plans ACROSS runs too, so without
    a purge reps 2..n would time cache hits instead of the kernel pass.
    The purge is TARGETED (the operator registers its cached frames and
    unpersists exactly those), not a global clearCache."""
    from weather_bigquery_lakehouse_spark.operators.embeddings import (
        purge_covariance_cache,
    )

    purge_covariance_cache()


PRE_REP = {
    "streaming_chunk_index": _reset_chunk_index_state,
    "embedding_dup_clusters": _reset_pair_cluster_cache,
    "ann_kmeans_codebook": _reset_kmeans_codebook_cache,
    "ann_kmeans_centroids": _reset_kmeans_centroid_cache,
    "bpe_merge_table": _reset_bpe_cache,
    "embedding_covariance": _reset_covariance_cache,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")

    # Bench-declared state-store partition count for the stateful
    # streaming entries (round-7 verdict #4): each stateful stage pays a
    # fixed init/commit cost per state partition, so at toy SF the
    # 32-store machinery constant dominated streaming_interval_join's
    # wall-clock and amplified box noise into the record (reps 38/23/18 s
    # loaded vs 5.7 s quiet on identical plans). 8 partitions keep the
    # same plans and results while shrinking the constant 4×; production
    # leaves this unset and sizes spark.sql.shuffle.partitions to the
    # cluster before the first stateful run (docs/SCALE.md "Knobs").
    stream_parts = os.environ.setdefault("WBL_STREAM_SHUFFLE_PARTITIONS", "8")
    try:
        stream_parts = int(stream_parts)
    except ValueError:
        # fail BEFORE the sweep: a pre-set garbage value would otherwise
        # run every timed query and then crash summary construction,
        # losing both the stdout line and the detail artifact
        raise SystemExit(
            f"WBL_STREAM_SHUFFLE_PARTITIONS must be an integer, got "
            f"{stream_parts!r}"
        )

    spark = build_session(app_name="wbl_bench")

    # Warm up the JVM paths every query shares (codegen, parquet reader,
    # shuffle machinery, broadcast) so timings reflect steady-state cost.
    # Round-12 negative result (docs/BENCH_NOTES.md): extending this to
    # explicit exchange/broadcast/sort warm-up statements did NOT shrink
    # the ~4× first-rep cost of heavy entries — that cost is per-plan
    # whole-stage-codegen compile plus first-touch page-cache reads of
    # the sf0.1 parquet, neither of which a generic warm-up can pre-pay —
    # so the warm-up stays minimal rather than adding sweep overhead.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # r13 convention: reps=4, discard the first (cold) rep, median of the
    # remaining 3. Legacy mode keeps median-of-all for continuity records.
    legacy = os.environ.get("SPARK_GRAFT_BENCH_LEGACY_MEDIAN", "") == "1"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3" if legacy else "4"))
    # discarding needs a second rep to exist; single-rep runs keep it
    discard_first = not legacy and reps >= 2

    # Sample box load AFTER warm-up, right before the first timed query:
    # a co-tenant burning CPU now is what inflates the medians.
    LOAD_WARN = 4.0
    load_avg = [round(x, 2) for x in os.getloadavg()]

    # Single-thread CPU probe (round-11 lesson): a VM can run 2x slow at
    # 1-min load 0.1 — HOST-level contention/frequency shows in neither
    # load_avg nor /proc/stat steal, so the record carries a fixed-work
    # probe. During the round-11 slow window (every query a uniform
    # ~2x the r10 quiet record at 1-min load 0.13) this loop timed
    # ~1.3-1.5 s; cross-round comparisons should ratio their probes
    # before reading any per-query delta as a plan change.
    def _cpu_probe_s() -> float:
        t0 = time.perf_counter()
        s = 0
        for i in range(10_000_000):
            s += i * i
        return round(time.perf_counter() - t0, 3)

    cpu_probe_s = _cpu_probe_s()

    # Each entry's start offset (seconds since the first timed query) ships
    # in the detail file: when a co-tenant burst lands inside a sweep, the
    # offsets localize it to a wall-clock interval and the entries inside
    # it, instead of leaving "which entries were hit" to be inferred from
    # which medians look inflated (round-13 lesson — a burst between the
    # mid and end probes ruined an extended half invisibly).
    sweep_t0 = time.perf_counter()
    entry_offsets: dict[str, float] = {}

    def run(names: list[str]) -> tuple[dict[str, float], dict[str, list[float]]]:
        medians: dict[str, float] = {}
        raw: dict[str, list[float]] = {}
        for name in names:
            fn = ALL_QUERIES[name].fn
            entry_offsets[name] = round(time.perf_counter() - sweep_t0, 1)
            times: list[float] = []
            for _ in range(reps):
                PRE_REP.get(name, lambda _d: None)(sf_dir)
                start = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - start, 3))
            raw[name] = times
            steady = times[1:] if discard_first else times
            medians[name] = round(statistics.median(steady), 3)
        return medians, raw

    # The driver's per-round record writes the default BENCH_DETAIL.json;
    # builder-side quiet-box sweeps set SPARK_GRAFT_BENCH_DETAIL (e.g.
    # BENCH_DETAIL_quiet.json) so the two artifacts never overwrite each
    # other — round-7 verdict #4: the committed detail file must match
    # what BENCH_NOTES.md claims about it.
    detail_name = os.environ.get("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")

    timings, runs = run(HEADLINE)
    # Probe again between the headline and extended sweeps and once more
    # at the end: round-13 lesson — the start probe read 0.49 while the
    # host sagged mid-sweep, and the drift had to be narrated from
    # per-entry ratios instead of read off the record. Three fixed-work
    # samples make window drift machine-evident: a stable triple means
    # per-entry deltas are plan-attributable; a rising one means the
    # sweep outran its window and the record says so itself.
    cpu_probe_mid_s = _cpu_probe_s()
    extended, extended_runs = run(EXTENDED)
    cpu_probe_end_s = _cpu_probe_s()

    total = round(sum(timings.values()), 3)
    floor_total = round(sum(min(t) for t in runs.values()), 3)
    extended_floor = round(sum(min(t) for t in extended_runs.values()), 3)
    metric = (
        "headline query wall-clock, noop-materialized, median of %d" % reps
        if not discard_first
        else "headline query wall-clock, noop-materialized, "
        "median of %d after discarding the cold first rep" % (reps - 1)
    )
    summary = {
        "metric": metric,
        "value": total,
        "value_floor": floor_total,
        "unit": "sec",
        "load_avg": load_avg,
        "cpu_probe_s": cpu_probe_s,
        "cpu_probe_mid_s": cpu_probe_mid_s,
        "cpu_probe_end_s": cpu_probe_end_s,
        "queries": timings,
        "extended_queries": extended,
        "extended_total": round(sum(extended.values()), 3),
        "extended_floor": extended_floor,
        "reps": reps,
        "discard_first": discard_first,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "stream_shuffle_partitions": stream_parts,
        "detail": detail_name,
    }
    if load_avg[0] > LOAD_WARN:
        summary["load_warning"] = (
            "1-min load %.2f > %.1f at bench start — medians likely "
            "inflated by co-tenant CPU; trust value_floor" % (load_avg[0], LOAD_WARN)
        )
    # The harness that records this output keeps only the LAST ~2000
    # characters of stdout and parses the JSON line out of that window —
    # round 3's line grew past it (raw per-rep runs + sizing) and was
    # recorded unparsed. Keep the stdout line compact; full detail (raw
    # runs, index-sizing inputs) goes to a side file next to this script.
    # The detail file keeps the FULL summary (its whole purpose); the
    # stdout line sheds detail keys until it fits the recorder's window —
    # headline growth alone could previously still overflow after the one
    # hardcoded pop. The totals always survive on stdout.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           detail_name), "w") as f:
        json.dump(
            {**summary, "runs": runs, "extended_runs": extended_runs,
             "entry_offsets": entry_offsets, "sizing": SIZING},
            f, indent=1,
        )
    line = json.dumps(summary)
    for shed in ("extended_queries", "queries"):
        if len(line) <= 1900:
            break
        summary.pop(shed, None)
        line = json.dumps(summary)
    assert len(line) <= 1900, f"bench stdout line still {len(line)} chars"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
