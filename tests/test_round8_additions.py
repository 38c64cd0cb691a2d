"""Round-8 additions: zc01 sequence packing, zc02 tokenizer round-trip
audit, scalerank.grouped_rank, and the depth-aware ReadSchema parser.

zc01's semantic pins are closed-form packing invariants (slot
discipline, no overfill, every doc placed once, FFD-within-band order);
zc02's pin is the audit's own claim — every bucket row must show
src == det with zero mismatches (the oracle proves cross-engine
equality; THIS test proves the audited property holds).
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spotify_tags_etl_spark.operators.scalerank import grouped_rank
from spotify_tags_etl_spark.operators.zcops import (
    ZC01_BAND_BASE,
    ZC01_TOK_PPM,
    ZC01_WINDOW,
)
from spotify_tags_etl_spark.plans import registry
from spotify_tags_etl_spark.plans.planmetrics import _struct_field_names


def _q(name: str):
    qs = registry.all_queries()
    return qs[name] if name in qs else qs["zv_" + name]


# ---------------------------------------------------------------------------
# zc01 — packing invariants
# ---------------------------------------------------------------------------


def test_zc01_packing_invariants(spark, sf_dir):
    rows = _q("zc01_sequence_packing")(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs  # every doc placed exactly once
    assert len({r.doc_id for r in rows}) == n_docs

    by_window = defaultdict(list)
    for r in rows:
        by_window[r.window_id].append(r)
    for wid, docs in by_window.items():
        band_exp = wid // ZC01_BAND_BASE
        slot_len = 1 << band_exp
        k = ZC01_WINDOW // slot_len
        assert len(docs) <= k
        # slots fill sequentially from 0 (only the band's LAST window is
        # partial, but within any window offsets are the first n slots)
        offs = sorted(d.slot_offset for d in docs)
        assert offs == [i * slot_len for i in range(len(docs))]
        for d in docs:
            # band correctness: the doc fits its slot, and (for bands
            # above the smallest) would NOT fit the next band down —
            # that bound is what caps padding below half the slot
            assert 1 <= d.doc_tokens <= slot_len
            if band_exp >= 1:
                assert d.doc_tokens > slot_len // 2
        fill = sum(d.doc_tokens for d in docs)
        assert fill <= ZC01_WINDOW  # never overfilled
        assert docs[0].fill_ppm == fill * 1_000_000 // ZC01_WINDOW
    # FFD-within-band: ranks were assigned tok DESC, so window w's
    # smallest doc is >= window w+1's largest doc within the same band
    per_band_windows = defaultdict(dict)
    for wid, docs in by_window.items():
        per_band_windows[wid // ZC01_BAND_BASE][wid % ZC01_BAND_BASE] = docs
    for _band, windows in per_band_windows.items():
        idxs = sorted(windows)
        assert idxs == list(range(len(idxs)))  # window ids are dense
        for a, b in zip(idxs, idxs[1:]):
            assert min(d.doc_tokens for d in windows[a]) >= max(
                d.doc_tokens for d in windows[b]
            )


def test_zc01_token_estimate_matches_constant(spark, sf_dir):
    # tok = clamp(n_chars * ppm / 1e6) exactly — recompute from the raw table
    docs = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    for r in _q("zc01_sequence_packing")(spark, sf_dir).collect():
        want = min(max(docs[r.doc_id] * ZC01_TOK_PPM // 1_000_000, 1), ZC01_WINDOW)
        assert r.doc_tokens == want


# ---------------------------------------------------------------------------
# zc02 — the audited losslessness property itself
# ---------------------------------------------------------------------------


def test_zc02_roundtrip_is_lossless(spark, sf_dir):
    rows = _q("zc02_tokenizer_roundtrip")(spark, sf_dir).collect()
    assert rows  # at least one populated bucket
    for r in rows:
        assert r.mismatch_types == 0, f"bucket {r.bucket}: {r.mismatch_types} mismatches"
        assert r.src_types == r.det_types
        assert r.src_occurrences == r.det_occurrences
        assert r.src_checksum == r.det_checksum


# ---------------------------------------------------------------------------
# scalerank.grouped_rank — bit-identical to the keyed window form
# ---------------------------------------------------------------------------

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group
            st.integers(min_value=-50, max_value=50),  # v
        ),
        min_size=1,
        max_size=60,
    ),
    nparts=st.sampled_from([1, 2, 5]),
)
@settings(**_SETTINGS)
def test_grouped_rank_property(spark, vals, nparts):
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(vals)], "idx LONG, g LONG, v LONG"
    )
    ranked, total = grouped_rank(
        df,
        ["g"],
        [F.col("v").desc(), F.col("idx").asc()],
        rank_col="rk",
        num_partitions=nparts,
    )
    got = {r.idx: r.rk for r in ranked.collect()}
    want: dict[int, int] = {}
    groups = defaultdict(list)
    for i, (g, v) in enumerate(vals):
        groups[g].append(((-v, i), i))
    for _g, members in groups.items():
        for pos, (_key, idx) in enumerate(sorted(members)):
            want[idx] = pos + 1
    assert total == len(vals)
    assert got == want


# ---------------------------------------------------------------------------
# planmetrics — depth-aware ReadSchema field parsing (ADVICE r7)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "body,want",
    [
        ("a:int,b:string", ["a", "b"]),
        ("price:decimal(10,2),qty:bigint", ["price", "qty"]),
        (
            "emb:array<float>,meta:struct<a:int,b:array<string>>,id:bigint",
            ["emb", "meta", "id"],
        ),
        ("", []),
        ("m:map<string,array<struct<x:int,y:decimal(38,0)>>>", ["m"]),
    ],
)
def test_struct_field_names(body, want):
    assert _struct_field_names(body) == want


# ---------------------------------------------------------------------------
# Loop-stage plan + scan pins for the zc band (cf. test_round7_additions)
# ---------------------------------------------------------------------------

EXPECTED_LOOP_PLANS = {
    "zc01_sequence_packing": {
        # the corpus scan + range exchange, recorded pre-checkpoint
        # inside scalerank._range_layout
        "scalerank:layout": [{}],
        # the parallel (_pid, band) rank window over the checkpoint
        "zc01:banded_rank": [{"exchanges": 1}],
    },
    "zc02_tokenizer_roundtrip": {
        "bpe:vocab": [{"exchanges": 1}],
        "bpe:pair_argmax": [{"exchanges": 1}],
        "bpe:fold": [{}],
        "zc02:detok": [{}],
    },
}

EXPECTED_SCANS = {
    "zc01_sequence_packing": {
        # pushdown proof: packing reads exactly (doc_id, n_chars), once
        "scalerank:layout": [["doc_id,n_chars"]],
        "zc01:banded_rank": [[]],
    },
    "zc02_tokenizer_roundtrip": {
        "bpe:vocab": [["text"]],
        "bpe:pair_argmax": [[]],
        "bpe:fold": [[]],
        "zc02:detok": [[]],
    },
}


@pytest.mark.parametrize("name", sorted(EXPECTED_LOOP_PLANS))
def test_zc_loop_stage_pins(spark, sf_dir, name):
    from spotify_tags_etl_spark.plans import planmetrics as pm

    pm.LOOP_PLAN_LOG.clear()
    pm.SCAN_LOG.clear()
    _q(name)(spark, sf_dir).count()
    scans: dict[str, set] = {}
    for label, sc in pm.SCAN_LOG:
        scans.setdefault(label, set()).add(sc)
    observed_scans = {l: sorted(list(t) for t in v) for l, v in scans.items()}
    assert observed_scans == EXPECTED_SCANS[name]
    assert pm.observed_loop_plans() == EXPECTED_LOOP_PLANS[name]
