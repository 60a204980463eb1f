"""Record linkage (operators/records.py): planted-duplicate resolution,
weighted-score exactness against a pure-Python reference, blocking
behavior (including the hot-block cap), and NULL-field scoring."""

from __future__ import annotations


from weather_bigquery_lakehouse_spark.operators import records as rc


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def _py_sim(a, b):
    if a is None or b is None:
        return 0
    m = max(len(a), len(b))
    if m == 0:
        return rc.SIM_SCALE
    return ((m - _py_lev(a, b)) * rc.SIM_SCALE) // m


ROWS = [
    # block 1: a planted duplicate trio (typo, reformat) + a distinct row
    (1, "Acme Corporation", "123 Main St", 1),
    (2, "Acme Corporation", "123 Main St.", 1),   # near-exact dup of 1
    (3, "Acme Corporatian", "123 Main St", 1),    # typo'd dup of 1
    (4, "Zenith Industrial", "9 Harbor Rd", 1),   # distinct
    # block 2: a pair that must NOT merge with block 1 despite same name
    (5, "Acme Corporation", "123 Main St", 2),
    (6, "Acme Corp", "123 Main St", 2),           # abbreviated dup of 5
]
WEIGHTS = {"name": 6, "addr": 4}
SCHEMA = "rid long, name string, addr string, region long"


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, SCHEMA)


def _ref_scores(rows, weights):
    by_block: dict = {}
    for rid, name, addr, region in rows:
        by_block.setdefault(region, []).append((rid, name, addr))
    out = {}
    w_total = sum(weights.values())
    for members in by_block.values():
        for i, (ia, na, aa) in enumerate(members):
            for ib, nb, ab in members[i + 1 :]:
                lo, hi = min(ia, ib), max(ia, ib)
                if ia < ib:
                    s = weights["name"] * _py_sim(na, nb) + weights["addr"] * _py_sim(aa, ab)
                else:
                    s = weights["name"] * _py_sim(nb, na) + weights["addr"] * _py_sim(ab, aa)
                out[(lo, hi)] = s // w_total
    return out


def test_match_scores_match_python_reference(spark):
    got = {
        (r["id_a"], r["id_b"]): r["score_ppm"]
        for r in rc.record_match_scores(
            _df(spark), "rid", WEIGHTS, ["region"]
        ).collect()
    }
    assert got == _ref_scores(ROWS, WEIGHTS)
    # blocking: no cross-region pair, even with identical names (1 vs 5)
    assert (1, 5) not in got and (1, 6) not in got


def test_resolve_entities_clusters_planted_duplicates(spark):
    got = {
        r["rid"]: (r["entity_id"], r["is_canonical"])
        for r in rc.resolve_entities(
            _df(spark), "rid", WEIGHTS, ["region"], min_score_ppm=700_000
        ).collect()
    }
    # block 1 trio merges under the min id; 4 is a singleton (absent)
    assert got[1] == (1, 1) and got[2] == (1, 0) and got[3] == (1, 0)
    assert 4 not in got
    # block 2 pair merges separately — blocks never bridge
    assert got[5] == (5, 1) and got[6] == (5, 0)


def test_null_field_scores_zero_not_null(spark):
    rows = [(1, "Acme", None, 1), (2, "Acme", "somewhere", 1)]
    got = rc.record_match_scores(_df(spark, rows), "rid", WEIGHTS, ["region"]).collect()
    assert len(got) == 1
    r = got[0]
    assert r["sim_addr"] == 0 and r["sim_name"] == rc.SIM_SCALE
    assert r["score_ppm"] == (6 * rc.SIM_SCALE) // 10


def test_hot_block_cap_drops_degenerate_blocks(spark):
    """A degenerate blocking key (one giant block) must be dropped, not
    joined: n²/2 pairs from one bad key is the failure mode the cap
    exists for — the pattern shared with the LSH bucket cap."""
    rows = [(i, f"Name{i}", "addr", 1) for i in range(50)] + [
        (100, "Twin A", "x", 2),
        (101, "Twin B", "x", 2),
    ]
    capped = rc.blocked_pairs(_df(spark, rows), "rid", ["region"], max_block_size=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(100, 101)}  # the 50-row block is gone, the pair stays
    uncapped = rc.blocked_pairs(_df(spark, rows), "rid", ["region"], max_block_size=None)
    assert uncapped.count() == 50 * 49 // 2 + 1
