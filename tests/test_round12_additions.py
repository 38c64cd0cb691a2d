"""Round-12 additions: partition-granular artifact refresh (the r11
verdict's top scale item) — per-input-file stage partials feeding the
v3 flags artifact and the v2 margins artifact, with the documented
bucket-granularity cross-partition merge; strict-ordering GC and
memo-dir verification (r11 ADVICE); plus the zi band (corpus release
manifest, gate operating-point sensitivity)."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest


def _q(name: str):
    from spotify_tags_etl_spark.plans.registry import all_queries, resolve

    return all_queries()[resolve(name)]


# ---------------------------------------------------------------------------
# synthetic partitioned corpus — documents as a DIRECTORY of part files
# ---------------------------------------------------------------------------


def _split_parquet(src: str, dest_dir: str, n_parts: int) -> list[str]:
    """Split one fixture parquet into ``n_parts`` part files inside a
    directory-shaped table (the partitioned-corpus layout the
    incremental artifact layer exists for)."""
    tbl = pq.read_table(src)
    os.makedirs(dest_dir, exist_ok=True)
    step = (tbl.num_rows + n_parts - 1) // n_parts
    paths = []
    for i in range(n_parts):
        part = tbl.slice(i * step, step)
        p = os.path.join(dest_dir, f"part-{i:03d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


@pytest.fixture()
def parted_corpus(sf_dir, tmp_path):
    """A private sf_dir whose documents table is a 3-part directory and
    embeddings a 2-part directory — plus the part paths."""
    root = str(tmp_path / "sf")
    os.makedirs(root)
    doc_parts = _split_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(root, "documents.parquet"),
        3,
    )
    emb_parts = _split_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        os.path.join(root, "embeddings.parquet"),
        2,
    )
    return root, doc_parts, emb_parts


def _mutate_one_doc(part_path: str) -> None:
    """Rewrite one part file with one document's text changed — a real
    content change (new identity AND new derived rows), not just a
    metadata touch."""
    tbl = pq.read_table(part_path).to_pydict()
    tbl["text"][0] = tbl["text"][0] + " zzzmutation zzzmutation zzzmutation"
    import pyarrow as pa

    pq.write_table(pa.table(tbl), part_path)


# ---------------------------------------------------------------------------
# identity ordering — the r11 ADVICE GC rule
# ---------------------------------------------------------------------------


def test_identity_strictly_older_ordering():
    from spotify_tags_etl_spark.functions.partials import identity_strictly_older

    fresh = {"a": {"mtime_ns": 100, "size": 10}, "b": {"mtime_ns": 200, "size": 20}}
    older = {"a": {"mtime_ns": 90, "size": 10}, "b": {"mtime_ns": 200, "size": 20}}
    newer = {"a": {"mtime_ns": 100, "size": 10}, "b": {"mtime_ns": 300, "size": 20}}
    mixed = {"a": {"mtime_ns": 90, "size": 10}, "b": {"mtime_ns": 300, "size": 20}}
    assert identity_strictly_older(older, fresh)
    assert not identity_strictly_older(fresh, fresh)  # equal: not older
    assert not identity_strictly_older(newer, fresh)  # newer: never GC'd
    assert not identity_strictly_older(mixed, fresh)  # incomparable
    # same mtimes but a size mismatch: incomparable, left alone
    sz = {"a": {"mtime_ns": 100, "size": 99}, "b": {"mtime_ns": 200, "size": 20}}
    assert not identity_strictly_older(sz, fresh)
    # different file sets: a different logical input, never superseded
    other = {"a": {"mtime_ns": 90, "size": 10}}
    assert not identity_strictly_older(other, fresh)
    assert not identity_strictly_older(None, fresh)


def test_gc_never_removes_newer_sibling(spark, parted_corpus):
    """A publisher holding a STALE view of the inputs must not GC a
    strictly newer sibling digest (r11 ADVICE #1). Simulated by
    planting a sibling whose meta carries a newer per-file identity."""
    from spotify_tags_etl_spark.operators import zfops

    root, doc_parts, _ = parted_corpus
    zfops._FLAGS_MEMO.clear()
    zfops.zf01_flags_artifact(spark, root).count()
    key = zfops._flags_key(root)
    target = zfops._flags_artifact_dir(key)

    newer_key = json.loads(json.dumps(key))
    fname = os.path.basename(doc_parts[0])
    newer_key["inputs"]["documents"]["files"][fname]["mtime_ns"] += 10**9
    sibling = os.path.join(os.path.dirname(target), "feedfacefeedface")
    os.makedirs(sibling, exist_ok=True)
    with open(os.path.join(sibling, "meta.json"), "w") as fh:
        json.dump({"key": newer_key}, fh)

    # force a republish of the SAME (stale-view) key
    shutil.rmtree(target)
    zfops._FLAGS_MEMO.clear()
    zfops.zf01_flags_artifact(spark, root).count()
    assert os.path.exists(sibling), "newer sibling must survive stale-view GC"
    shutil.rmtree(sibling)

    # and a genuinely OLDER sibling is swept
    older_key = json.loads(json.dumps(key))
    older_key["inputs"]["documents"]["files"][fname]["mtime_ns"] -= 10**9
    os.makedirs(sibling, exist_ok=True)
    with open(os.path.join(sibling, "meta.json"), "w") as fh:
        json.dump({"key": older_key}, fh)
    shutil.rmtree(target)
    zfops._FLAGS_MEMO.clear()
    zfops.zf01_flags_artifact(spark, root).count()
    assert not os.path.exists(sibling), "older sibling must be GC'd"


def test_memo_hit_verifies_directory_exists(spark, parted_corpus):
    """r11 ADVICE #2: a memo hit whose directory was GC'd (input
    identity reverted mid-process) must fall through to recompute, not
    fail with FileNotFound."""
    from spotify_tags_etl_spark.operators import zeops, zfops

    root, _, _ = parted_corpus
    zfops._FLAGS_MEMO.clear()
    first = zfops.zf01_flags_artifact(spark, root).count()
    target = zfops._flags_artifact_dir(zfops._flags_key(root))
    shutil.rmtree(target)  # memo now points at a deleted dir
    assert zfops.zf01_flags_artifact(spark, root).count() == first

    zeops._MARGINS_MEMO.clear()
    first_m = zeops.ze02_margins_artifact(spark, root).count()
    mtarget = zeops._margins_artifact_dir(zeops._margins_key(root))
    shutil.rmtree(mtarget)
    assert zeops.ze02_margins_artifact(spark, root).count() == first_m


# ---------------------------------------------------------------------------
# partition-granular refresh — the one-changed-partition contract
# ---------------------------------------------------------------------------


def test_flags_artifact_multifile_equals_live(spark, parted_corpus):
    """On a directory-shaped corpus the partials-assembled artifact is
    bit-identical to the live text-path funnel — the cross-partition
    merge (hash groups, LSH buckets, gram joins, census) handles group
    structure spanning part files."""
    from spotify_tags_etl_spark.operators import zfops

    root, _, _ = parted_corpus
    zfops._FLAGS_MEMO.clear()
    got = sorted(
        tuple(r) for r in zfops.zf01_flags_artifact(spark, root).collect()
    )
    live = sorted(
        tuple(r)
        for r in zfops.zf01_flags(
            spark, root, extra_cols=("n_chars",), with_rules=True
        ).collect()
    )
    assert got == live


def test_one_changed_partition_reextracts_only_it(
    spark, parted_corpus, monkeypatch
):
    """THE incremental contract (r11 verdict #2): after one part file
    changes, the republish re-extracts partials for THAT file only —
    proven by counting actual extraction invocations — and the merged
    output still equals the live funnel on the modified corpus (the
    cross-partition merge re-ran over cached + fresh partials)."""
    from spotify_tags_etl_spark.functions import partials
    from spotify_tags_etl_spark.operators import zfops

    root, doc_parts, _ = parted_corpus
    zfops._FLAGS_MEMO.clear()
    zfops.zf01_flags_artifact(spark, root).count()  # publish everything

    extracted: list[str] = []
    real = partials._extract_doc_frames

    def counting(spark_, path):
        extracted.append(path)
        return real(spark_, path)

    monkeypatch.setattr(partials, "_extract_doc_frames", counting)
    monkeypatch.setitem(partials._EXTRACTORS, "doc", counting)

    changed = doc_parts[1]
    _mutate_one_doc(changed)
    zfops._FLAGS_MEMO.clear()
    got = sorted(
        tuple(r) for r in zfops.zf01_flags_artifact(spark, root).collect()
    )
    assert extracted == [changed], extracted  # ONLY the changed file re-read
    live = sorted(
        tuple(r)
        for r in zfops.zf01_flags(
            spark, root, extra_cols=("n_chars",), with_rules=True
        ).collect()
    )
    assert got == live  # merge re-ran correctly over cached + fresh partials


def test_unchanged_partials_carry_forward(spark, parted_corpus):
    """ensure_partials is idempotent and returns the carried-forward
    dirs: a second call recomputes nothing; after one file changes only
    that file's partial digest moves and the others' directories are
    byte-untouched (publish-time mtimes unchanged)."""
    from spotify_tags_etl_spark.functions import partials

    root, doc_parts, _ = parted_corpus
    doc_table = os.path.join(root, "documents.parquet")
    dirs1, rec1 = partials.ensure_partials(spark, doc_table, "doc")
    assert sorted(rec1) == sorted(os.path.basename(p) for p in doc_parts)
    dirs2, rec2 = partials.ensure_partials(spark, doc_table, "doc")
    assert rec2 == [] and dirs2 == dirs1

    mtimes = {n: os.stat(d).st_mtime_ns for n, d in dirs1.items()}
    changed = os.path.basename(doc_parts[2])
    _mutate_one_doc(doc_parts[2])
    dirs3, rec3 = partials.ensure_partials(spark, doc_table, "doc")
    assert rec3 == [changed]
    assert dirs3[changed] != dirs1[changed]  # new digest for the change
    for n in dirs1:
        if n != changed:
            assert dirs3[n] == dirs1[n]
            assert os.stat(dirs3[n]).st_mtime_ns == mtimes[n]  # untouched


def test_margins_score_parts_frozen_weights_incremental(spark, parted_corpus):
    """The margins-side contract: under FROZEN weights (the production
    cadence — model updates slower than the corpus), a one-file change
    re-scores only that file; the merged rows equal live scoring."""
    from spotify_tags_etl_spark.operators import zeops

    root, doc_parts, _ = parted_corpus
    doc_table = os.path.join(root, "documents.parquet")
    _nd, _c, w_hist = zeops.ze01_fit_artifact(spark, root)
    wavg = {b: sum(w[b] for w in w_hist) for b in w_hist[0]}

    dirs1, rec1 = zeops.ze02_score_parts(spark, doc_table, wavg)
    assert sorted(rec1) == sorted(os.path.basename(p) for p in doc_parts)
    _dirs, rec2 = zeops.ze02_score_parts(spark, doc_table, wavg)
    assert rec2 == []  # pure cache hit

    changed = os.path.basename(doc_parts[0])
    _mutate_one_doc(doc_parts[0])
    dirs3, rec3 = zeops.ze02_score_parts(spark, doc_table, wavg)
    assert rec3 == [changed]  # ONLY the changed file re-scored

    merged = sorted(
        (r.doc_id, r.y, int(r.m))
        for r in spark.read.parquet(
            *[os.path.join(d, "m.parquet") for d in dirs3.values()]
        ).collect()
    )
    feats = zeops.ze01_feats(spark, root)
    live = sorted(
        (r.doc_id, r.y, int(r.m))
        for r in zeops._margins(feats, wavg).collect()
    )
    feats.unpersist()
    assert merged == live

    # a different model never serves another model's cached scores
    wavg2 = dict(wavg)
    some_bucket = next(iter(wavg2))
    wavg2[some_bucket] = wavg2[some_bucket] + 1
    _dirs2, rec4 = zeops.ze02_score_parts(spark, doc_table, wavg2)
    assert sorted(rec4) == sorted(os.path.basename(p) for p in doc_parts)


def test_partials_key_covers_constants(monkeypatch):
    """Partial digests must move when any EXTRACTION constant moves —
    the per-file analog of the r11 whole-key coverage test."""
    from spotify_tags_etl_spark.functions import partials
    from spotify_tags_etl_spark.operators import dedup as dd
    from spotify_tags_etl_spark.operators import zcops as zc
    from spotify_tags_etl_spark.operators import zgops as zg

    base_doc = partials.doc_constants()
    base_emb = partials.emb_constants()
    for mod, attr, val, fn in [
        (dd, "N_HASHES", 16, partials.doc_constants),
        (zg, "ZG06_MIN_WORDS", 99, partials.doc_constants),
        (zc, "ZC03_BITS", 8, partials.emb_constants),
        (zc, "ZC03_TABLES", 8, partials.emb_constants),
    ]:
        monkeypatch.setattr(mod, attr, val)
        base = base_doc if fn is partials.doc_constants else base_emb
        assert fn() != base, f"{attr} not keyed"
        monkeypatch.undo()


def test_flags_key_is_per_file(parted_corpus):
    """The v3 staleness key carries one identity per part file, and a
    touch to ONE file moves the key (whole-table mtime kept lying low
    in v2: a dir's mtime does not move when a contained file's content
    is rewritten in place)."""
    from spotify_tags_etl_spark.operators import zfops

    root, doc_parts, emb_parts = parted_corpus
    key = zfops._flags_key(root)
    dfiles = key["inputs"]["documents"]["files"]
    assert len(dfiles) == 3 and len(key["inputs"]["embeddings"]["files"]) == 2
    st = os.stat(doc_parts[1])
    os.utime(doc_parts[1], ns=(st.st_atime_ns, st.st_mtime_ns + 10**9))
    assert zfops._flags_key(root) != key
