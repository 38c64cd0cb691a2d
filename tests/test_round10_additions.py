"""Round-10 additions: the zg compositions that close the
curation-to-training loop — curated packing manifest (zg01), curated
curriculum (zg02), and the gate threshold sweep (zg03) — pinned
against the component stages' own accounting."""

from __future__ import annotations

from collections import defaultdict

from spotify_tags_etl_spark.plans.registry import get


def _q(name: str):
    return get(name).builder


# ---------------------------------------------------------------------------
# zg01 — curated pack mass conserves against zc06 and dominates zd04
# ---------------------------------------------------------------------------


def test_zg01_mass_conservation(spark, sf_dir):
    rows = _q("zg01_curated_pack_manifest")(spark, sf_dir).collect()
    assert rows

    # Per band: kept + displaced telescopes to the FULL corpus band
    # mass, which zc06 reports independently (same tok/band arithmetic,
    # no curation) — docs and tokens both.
    full = {
        r.band_exp: (r.n_docs, r.doc_tokens)
        for r in _q("zc06_pack_efficiency")(spark, sf_dir).collect()
    }
    got = {
        r.band_exp: (r.n_kept + r.n_displaced, r.kept_tokens + r.displaced_tokens)
        for r in rows
    }
    assert got == full

    for r in rows:
        # first-drop attribution is exhaustive and mutually exclusive
        assert r.displaced_tokens == (
            r.disp_exact_tokens
            + r.disp_near_tokens
            + r.disp_sem_tokens
            + r.disp_contam_tokens
            + r.disp_offtarget_tokens
        )
        # window count is the exact ceil-div of the survivor count
        k = 4096 // (1 << r.band_exp)
        assert r.n_windows == (r.n_kept + k - 1) // k
        if r.n_windows:
            assert r.fill_ppm == r.kept_tokens * 1_000_000 // (r.n_windows * 4096)
        else:
            assert r.fill_ppm is None and r.kept_tokens == 0

    # The full-lineage displaced set contains zd04's (contamination is
    # one of the five stages, attribution order notwithstanding), so
    # per band zg01 displaces at least zd04's mass.
    zd04 = {
        r.band_exp: r.displaced_tokens
        for r in _q("zd04_contamination_aware_packing")(spark, sf_dir).collect()
    }
    for r in rows:
        assert r.displaced_tokens >= zd04.get(r.band_exp, 0)


def test_zg01_kept_matches_zf01(spark, sf_dir):
    # Total survivor docs in the manifest == zf01's own keep count.
    rows = _q("zg01_curated_pack_manifest")(spark, sf_dir).collect()
    zf01_kept = sum(
        r.n_kept for r in _q("zf01_curation_lineage")(spark, sf_dir).collect()
    )
    assert sum(r.n_kept for r in rows) == zf01_kept


# ---------------------------------------------------------------------------
# zg02 — curated curriculum covers exactly the quota>0 survivors
# ---------------------------------------------------------------------------


def test_zg02_schedule_structure(spark, sf_dir):
    rows = _q("zg02_curated_curriculum")(spark, sf_dir).collect()
    assert rows

    # Survivor counts per source from zf01's report.
    zf01_by_source = {
        r.source: r.n_kept
        for r in _q("zf01_curation_lineage")(spark, sf_dir).collect()
    }

    per_source: dict[str, list] = defaultdict(list)
    for r in rows:
        per_source[r.source].append(r)

    # Scheduled sources are a subset of surviving sources (zero-quota
    # sources are excluded), and each scheduled source lists EVERY one
    # of its survivors exactly once (crank is 1..n_s).
    for source, rs in per_source.items():
        assert len(rs) == zf01_by_source[source]
        assert sorted(r.crank for r in rs) == list(range(1, len(rs) + 1))
        # block/slot arithmetic is consistent with ONE per-source quota
        # q_s: slot < q_s and crank-1 == block*q_s + slot; derive q_s
        # from any row past block 0.
        q_candidates = {
            (r.crank - 1 - r.slot) // r.block for r in rs if r.block > 0
        }
        if q_candidates:
            assert len(q_candidates) == 1
            q = q_candidates.pop()
            for r in rs:
                assert r.slot < q
                assert r.crank - 1 == r.block * q + r.slot
        else:  # all rows in block 0: slot == crank-1
            for r in rs:
                assert r.block == 0 and r.slot == r.crank - 1

    # Dropped sources are exactly those with zero quota — every source
    # absent from the schedule must have survivors and zero seats, or
    # no survivors at all; total scheduled mass is all other survivors.
    assert sum(len(rs) for rs in per_source.values()) == sum(
        zf01_by_source[s] for s in per_source
    )

    # Within a source lane, difficulty ramps with crank (n_chars asc).
    docs = dict(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    for rs in per_source.values():
        ordered = sorted(rs, key=lambda r: r.crank)
        lens = [docs[r.doc_id] for r in ordered]
        assert lens == sorted(lens)


# ---------------------------------------------------------------------------
# zg03 — the sweep is monotone and consistent with the deployed gate
# ---------------------------------------------------------------------------


def test_zg03_sweep_monotonicity(spark, sf_dir):
    rows = sorted(
        _q("zg03_gate_threshold_sweep")(spark, sf_dir).collect(), key=lambda r: r.k
    )
    assert [r.k for r in rows] == list(range(1, 10))

    n_docs = {r.n_docs for r in rows}
    assert len(n_docs) == 1  # every cut scores the same population

    for a, b in zip(rows, rows[1:]):
        assert b.thr >= a.thr  # edges rise with the decile
        assert b.n_kept <= a.n_kept  # raising the bar keeps fewer docs
        assert b.n_tgt_kept <= a.n_tgt_kept  # recall falls (weakly)
        if a.n_kept and b.n_kept:
            # equal-mass edge ranks: kept mass shrinks by about a
            # decile per step (exactly, modulo ties on the margin)
            assert b.n_kept < a.n_kept or a.thr == b.thr

    for r in rows:
        assert 0 <= r.n_tgt_kept <= r.n_kept <= r.n_docs
        assert r.kept_ppm == r.n_kept * 1_000_000 // r.n_docs
        assert r.acc_ppm == r.n_correct * 1_000_000 // r.n_docs
