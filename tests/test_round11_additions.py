"""Round-11 additions: artifact-publish hardening (verify-the-winner,
GC of superseded digests, corrupt-target recovery), the v2 flags
artifact (zg06 rule verdicts folded in; zd01/zg06 re-pointed), and the
zh band — the unified three-system keep-set (hard rules -> five-stage
funnel -> learned gate) with its packed/sharded manifests and
streaming twin."""

from __future__ import annotations

import json
import os
import shutil

import pytest


def _q(name: str):
    from spotify_tags_etl_spark.plans.registry import all_queries, resolve

    return all_queries()[resolve(name)]


# ---------------------------------------------------------------------------
# artifactio — publish verification + GC primitives (r10 verdict #5/#6)
# ---------------------------------------------------------------------------


def _mk_artifact(path: str, key) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump({"key": key}, fh)
    with open(os.path.join(path, "payload.bin"), "w") as fh:
        fh.write(str(key))


def test_publish_atomic_happy_path(tmp_path):
    from spotify_tags_etl_spark.functions import artifactio

    tmp = str(tmp_path / "digest.tmp.123")
    target = str(tmp_path / "digest")
    _mk_artifact(tmp, {"v": 1})
    artifactio.publish_atomic(tmp, target, {"v": 1})
    assert artifactio.read_meta_key(target) == {"v": 1}
    assert not os.path.exists(tmp)


def test_publish_atomic_lost_race_verifies_winner(tmp_path):
    """A failing rename is trusted as 'lost the race' ONLY when the
    surviving target's embedded key matches — the r10 verdict's
    silently-served-wrong-artifact gap."""
    from spotify_tags_etl_spark.functions import artifactio

    tmp = str(tmp_path / "digest.tmp.123")
    target = str(tmp_path / "digest")
    _mk_artifact(target, {"v": 1})  # genuine winner, same key
    _mk_artifact(tmp, {"v": 1})
    artifactio.publish_atomic(tmp, target, {"v": 1})
    assert artifactio.read_meta_key(target) == {"v": 1}
    assert not os.path.exists(tmp)  # loser's copy dropped


def test_publish_atomic_replaces_tampered_target(tmp_path):
    """A target whose meta MISMATCHES the key is interference, not a
    winner: it is removed and the publish retried, so the fresh copy
    lands instead of the tampered one being silently served."""
    from spotify_tags_etl_spark.functions import artifactio

    tmp = str(tmp_path / "digest.tmp.123")
    target = str(tmp_path / "digest")
    _mk_artifact(target, {"v": "TAMPERED"})
    _mk_artifact(tmp, {"v": 2})
    artifactio.publish_atomic(tmp, target, {"v": 2})
    assert artifactio.read_meta_key(target) == {"v": 2}


def test_publish_atomic_raises_when_winner_unverifiable(tmp_path, monkeypatch):
    """If the rename keeps failing AND the survivor never matches the
    key, publish raises loudly instead of serving an unverified dir."""
    from spotify_tags_etl_spark.functions import artifactio

    tmp = str(tmp_path / "digest.tmp.123")
    target = str(tmp_path / "digest")
    _mk_artifact(tmp, {"v": 3})

    real_rename = os.rename

    def failing(src, dst):
        if dst == target:
            raise OSError("simulated ENOTEMPTY")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing)
    with pytest.raises(RuntimeError, match="does not match"):
        artifactio.publish_atomic(tmp, target, {"v": 3})


def test_gc_superseded_sweeps_stale_digests(tmp_path):
    """GC removes same-input siblings and unreadable-meta garbage,
    keeps other-input siblings and in-flight .tmp. dirs."""
    from spotify_tags_etl_spark.functions import artifactio

    target = str(tmp_path / "fresh")
    stale = str(tmp_path / "stale")
    other = str(tmp_path / "other")
    garbage = str(tmp_path / "garbage")
    inflight = str(tmp_path / "fresh.tmp.999")
    _mk_artifact(target, {"path": "/a", "mtime": 2})
    _mk_artifact(stale, {"path": "/a", "mtime": 1})
    _mk_artifact(other, {"path": "/b", "mtime": 1})
    os.makedirs(garbage)  # no meta.json at all
    _mk_artifact(inflight, {"path": "/a", "mtime": 3})

    removed = artifactio.gc_superseded(
        target, lambda k: isinstance(k, dict) and k.get("path") == "/a"
    )
    assert sorted(removed) == sorted([stale, garbage])
    assert os.path.exists(target)
    assert os.path.exists(other)
    assert os.path.exists(inflight)


# ---------------------------------------------------------------------------
# flags artifact v2 — corrupt-target recovery, GC wiring, key coverage
# ---------------------------------------------------------------------------


@pytest.fixture()
def flags_sandbox(spark, sf_dir, tmp_path):
    """A private sf_dir copy so artifact tests can mutate inputs/targets
    without touching the shared warehouse digests."""
    root = str(tmp_path)
    for t in ("documents", "embeddings"):
        shutil.copy(
            os.path.join(sf_dir, f"{t}.parquet"),
            os.path.join(root, f"{t}.parquet"),
        )
    return root


def test_flags_artifact_corrupt_target_recaches(spark, flags_sandbox, monkeypatch):
    """The ADVICE #3 failure mode: a corrupt meta.json at the target
    used to make every publish rename fail forever (misread as a lost
    race) while the OLD parquet kept being served. Now the corrupt dir
    is replaced on the next call and caching RESUMES."""
    from spotify_tags_etl_spark.operators import zfops

    root = flags_sandbox
    calls: list[str] = []
    real = zfops.zf01_flags

    def counting(spark_, sf_, extra_cols=(), with_rules=False):
        calls.append(sf_)
        return real(spark_, sf_, extra_cols, with_rules)

    monkeypatch.setattr(zfops, "zf01_flags", counting)
    zfops._FLAGS_MEMO.clear()
    first = sorted(
        tuple(r) for r in zfops.zf01_flags_artifact(spark, root).collect()
    )
    assert len(calls) == 1
    target = zfops._flags_artifact_dir(zfops._flags_key(root))

    # corrupt the published meta
    with open(os.path.join(target, "meta.json"), "w") as fh:
        fh.write("{not json")
    zfops._FLAGS_MEMO.clear()
    got = sorted(
        tuple(r) for r in zfops.zf01_flags_artifact(spark, root).collect()
    )
    assert got == first and len(calls) == 2  # recomputed + republished
    with open(os.path.join(target, "meta.json")) as fh:
        assert json.load(fh)["key"] == zfops._flags_key(root)

    zfops._FLAGS_MEMO.clear()
    got = sorted(
        tuple(r) for r in zfops.zf01_flags_artifact(spark, root).collect()
    )
    assert got == first and len(calls) == 2  # caching RESUMED — pure hit


def test_flags_artifact_gc_on_republish(spark, flags_sandbox):
    """A fixture 'regen' (mtime bump) republises under a new digest and
    GCs the superseded one — the warehouse holds ONE live digest per
    input set (r10 verdict #6)."""
    from spotify_tags_etl_spark.operators import zfops

    root = flags_sandbox
    zfops._FLAGS_MEMO.clear()
    zfops.zf01_flags_artifact(spark, root).count()
    old_target = zfops._flags_artifact_dir(zfops._flags_key(root))
    assert os.path.exists(old_target)

    p = os.path.join(root, "documents.parquet")
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    zfops._FLAGS_MEMO.clear()
    zfops.zf01_flags_artifact(spark, root).count()
    new_target = zfops._flags_artifact_dir(zfops._flags_key(root))
    assert new_target != old_target
    assert os.path.exists(new_target)
    assert not os.path.exists(old_target)  # superseded digest swept


def test_flags_key_covers_every_stage_constant(monkeypatch):
    """The ADVICE #1 gap: the staleness key must move when ANY stage
    constant moves — dd02's LSH shape, zc03's sizing/threshold, tz06's
    split edges, zb03's census, zg06's rule thresholds."""
    from spotify_tags_etl_spark.operators import dedup as dd
    from spotify_tags_etl_spark.operators import training as tr
    from spotify_tags_etl_spark.operators import zcops as zc
    from spotify_tags_etl_spark.operators import zfops
    from spotify_tags_etl_spark.operators import zgops as zg

    sf = "/root/testdata/sf0.001"
    base = zfops._flags_key(sf)
    for mod, attr, val in [
        (dd, "N_HASHES", 16),
        (dd, "BAND_ROWS", 4),
        (zc, "ZC03_BITS", 8),
        (zc, "ZC03_TABLES", 8),
        (zc, "ZC03_T_PPM", 999_999),
        (tr, "SPLIT_EDGES", (("train", 0.7), ("val", 0.85), ("test", 1.0))),
        (zg, "ZG06_MIN_WORDS", 99),
        (zg, "ZG06_MAX_WORDS", 999),
        (zg, "ZG06_REP_PPM", 123_456),
        (zg, "ZG06_STOPWORDS", ("zzz",)),
    ]:
        monkeypatch.setattr(mod, attr, val)
        assert zfops._flags_key(sf) != base, f"{attr} not keyed"
        monkeypatch.undo()
    assert zfops._flags_key(sf) == base


def test_fit_artifact_gc_on_republish(spark, flags_sandbox):
    """Same GC discipline on the ze01 fit artifact."""
    from spotify_tags_etl_spark.operators import zeops

    root = flags_sandbox
    zeops._FIT_MEMO.clear()
    zeops.ze01_fit_artifact(spark, root)
    old_target = zeops._artifact_dir(zeops._fit_key(root))
    assert os.path.exists(old_target)

    p = os.path.join(root, "documents.parquet")
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    zeops._FIT_MEMO.clear()
    zeops.ze01_fit_artifact(spark, root)
    new_target = zeops._artifact_dir(zeops._fit_key(root))
    assert new_target != old_target
    assert os.path.exists(new_target)
    assert not os.path.exists(old_target)


def test_v2_artifact_rule_columns_match_live_census(spark, sf_dir):
    """The artifact's stored rule verdicts aggregate to exactly zg06's
    census (the artifact path IS the census path now — this pins the
    spelling equality between zf01_flags(with_rules=True) and
    zg06_census_partial)."""
    from pyspark.sql import functions as F

    from spotify_tags_etl_spark.operators.zfops import zf01_flags_artifact
    from spotify_tags_etl_spark.operators.zgops import (
        _zg06_finish,
        zg06_census_partial,
    )
    from spotify_tags_etl_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    live = sorted(
        tuple(r) for r in _zg06_finish(zg06_census_partial(docs)).collect()
    )
    via_artifact = sorted(
        tuple(r) for r in _q("zg06_quality_rule_census")(spark, sf_dir).collect()
    )
    assert via_artifact == live

    # and the stored verdicts are well-formed 0/1 indicators with the
    # short/long rules mutually exclusive (a doc cannot be both)
    art = zf01_flags_artifact(spark, sf_dir)
    n_bad = art.where(
        ~F.col("r_short").isin(0, 1)
        | ~F.col("r_long").isin(0, 1)
        | ~F.col("r_rep").isin(0, 1)
        | ~F.col("r_stop").isin(0, 1)
        | ((F.col("r_short") == 1) & (F.col("r_long") == 1))
    ).count()
    assert n_bad == 0


def test_zd01_matches_prior_live_composition(spark, sf_dir):
    """zd01 re-pointed at the artifact must equal the three stages'
    own composition (the r9 semantics, re-derived live here)."""
    from pyspark.sql import functions as F

    from spotify_tags_etl_spark.operators.dedup import dd01, dd02
    from spotify_tags_etl_spark.operators.zcops import zc03
    from spotify_tags_etl_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    keeps = {
        r.keep_doc_id for r in dd01(spark, sf_dir).select("keep_doc_id").collect()
    }
    near = {r.d2 for r in dd02(spark, sf_dir).select("d2").distinct().collect()}
    sem = {
        r.vec_id
        for r in zc03(spark, sf_dir).where(F.col("keep") == 0).collect()
    }
    rows = docs.collect()
    agg: dict[str, list[int]] = {}
    for r in rows:
        a = agg.setdefault(r.source, [0, 0, 0, 0])
        a[0] += 1
        s_e = 1 if r.doc_id in keeps else 0
        a[1] += s_e
        a[2] += s_e * (0 if r.doc_id in near else 1)
        a[3] += s_e * (0 if r.doc_id in near else 1) * (
            0 if r.doc_id in sem else 1
        )
    got = {
        r.source: (r.n_docs, r.n_exact_kept, r.n_near_kept, r.n_sem_kept)
        for r in _q("zd01_dedup_funnel")(spark, sf_dir).collect()
    }
    assert got == {s: tuple(v) for s, v in agg.items()}
