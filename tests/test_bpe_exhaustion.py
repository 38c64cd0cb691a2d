"""BPE early-exhaustion parity (ADVICE r7 item 1).

If the pair supply exhausts before ``YV10_ROUNDS`` (every vocabulary
word fused to one symbol), Spark's ``bpe_learn`` breaks out of the loop
and KEEPS the fused vocab. The oracle's fold CTE ``w{r+1}`` used to
cross-join the empty ``b{r}`` and become empty — so apply-side
consumers (za01/za05/zb01) would census a fused vocab while their
oracles censused nothing. The fix (``bpe_ctes``: LEFT JOIN ON TRUE with
a NULL-pa passthrough arm) makes the oracle keep ``w{r}`` unchanged.

This test builds a 3-word corpus that exhausts after two merges and
runs the REAL za01 builder against its REAL oracle on it — both the
merge-table truncation and the vocab passthrough are exercised.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from spotify_tags_etl_spark.operators.ytrain import YV10_ROUNDS, bpe_learn, bpe_ctes
from spotify_tags_etl_spark.plans import registry

from tests.oracle_harness import compare_frames


def _tiny_docs(tmp_path) -> str:
    # Words: "ab" x2, "cd" x1. Round 1 merges (a,b); round 2 merges
    # (c,d); round 3 finds no pairs -> exhaustion with
    # YV10_ROUNDS - 2 rounds unspent.
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["ab ab cd", "ab"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["t", "t"], pa.string()),
            "n_chars": pa.array([8, 2], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_learn_breaks_and_keeps_fused_vocab(spark, tmp_path):
    sf = _tiny_docs(tmp_path)
    rows, words = bpe_learn(spark, sf, YV10_ROUNDS)
    try:
        assert [(r, pa_, pb) for r, pa_, pb, _ in rows] == [
            (1, "a", "b"),
            (2, "c", "d"),
        ]
        got = {(r.seq, r.cnt) for r in words.collect()}
        assert got == {("ab", 3), ("cd", 1)}
    finally:
        words.unpersist()


def test_za01_oracle_agrees_under_exhaustion(spark, tmp_path):
    sf = _tiny_docs(tmp_path)
    qd = registry.get("za01_bpe_apply")
    spark_pdf = qd.builder(spark, sf).toPandas()
    assert len(spark_pdf) == 2  # the fused tokens 'ab' and 'cd'
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        oracle_pdf = con.execute(qd.oracle).fetchdf()
    finally:
        con.close()
    compare_frames(spark_pdf, oracle_pdf, "za01_exhaustion")


def test_fold_cte_passthrough_shape():
    # The generated SQL must carry the passthrough arm, not a cross join.
    joined = "\n".join(bpe_ctes(3))
    assert "LEFT JOIN b0 b ON TRUE" in joined
    assert "b.pa IS NULL" in joined
