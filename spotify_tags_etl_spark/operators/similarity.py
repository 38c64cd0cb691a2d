"""Similarity search over embedding columns (``array<float>``).

Two paths, both pure DataFrame algebra:

* brute-force cosine top-k — the exact baseline: query-set × corpus join,
  sequential-fold dot product (``F.aggregate`` over zipped arrays —
  bit-identical to DuckDB's ``list_dot_product``, both are in-order
  double folds), window top-k;
* hyperplane-LSH-bucketed ANN — the scale path: sign-signature buckets
  from fixed hyperplanes, candidates = same bucket, exact re-rank inside
  the bucket. Hyperplanes here are deterministic (taken from the corpus
  itself) so the oracle can reproduce them; in production they'd be a
  broadcast random matrix.

At 100 TB: brute force is O(|Q|·|C|) — viable only when one side
broadcasts; the LSH path shuffles each side once on the signature key,
turning all-pairs into per-bucket joins. Skewed buckets → AQE skew-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_tags_etl_spark.plans.registry import register
from spotify_tags_etl_spark.sources.tpch import load_table

#: In-order double fold — same reduction sequence as DuckDB list_dot_product.
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"


def dot(a: str, b: str):
    return F.expr(_DOT.format(a=a, b=b))


def l2norm(a: str):
    return F.sqrt(F.expr(_DOT.format(a=a, b=a)))


def with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", l2norm(vec))


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded)."""
    q = with_norm(queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")), "q_vec").withColumnRenamed("_norm", "q_norm")
    c = with_norm(corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")), "c_vec").withColumnRenamed("_norm", "c_norm")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "rank", F.round("cosine", 6).alias("cosine_r"))
    )


_ORACLE_DOT = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


@register(
    "ss01_bruteforce_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_vec,
             sqrt({_ORACLE_DOT.format(a='embedding', b='embedding')}) AS q_norm
      FROM embeddings WHERE vec_id < 8
    ),
    c AS (
      SELECT vec_id AS c_id, embedding AS c_vec,
             sqrt({_ORACLE_DOT.format(a='embedding', b='embedding')}) AS c_norm
      FROM embeddings
    ),
    scored AS (
      SELECT q_id, c_id,
             {_ORACLE_DOT.format(a='q_vec', b='c_vec')} / (q_norm * c_norm) AS cosine
      FROM q, c WHERE q_id <> c_id
    )
    SELECT q_id, c_id, rank, ROUND(cosine, 6) AS cosine_r FROM (
      SELECT q_id, c_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    doc=(
        "Brute-force cosine top-10 for 8 query vectors over the corpus: "
        "broadcast queries, in-order double-fold dot product, window top-k "
        "with id tiebreak."
    ),
    tags=("similarity", "ann"),
)
def ss01(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb.where(F.col("vec_id") < 8), emb, k=10)


N_PLANES_PER_TABLE = 4  # 4-bit signature → 16 buckets per table
N_TABLES = 4  # OR-amplification: candidate if bucket-equal in ANY table
N_PLANES = N_PLANES_PER_TABLE * N_TABLES


def _signature(vec_col: str, table: int) -> F.Column:
    base = table * N_PLANES_PER_TABLE
    return F.concat(
        *[
            F.when(dot(vec_col, f"p{base + i}") >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(N_PLANES_PER_TABLE)
        ]
    )


def lsh_bucketed_ann(corpus: DataFrame, planes: DataFrame, k: int) -> DataFrame:
    """Multi-table hyperplane-LSH ANN: L sign-signature tables, candidates
    = bucket-equal in any table (OR-amplification lifts recall from ~p to
    1-(1-p)^L), exact cosine re-rank over the candidate union.

    ``planes``: one row with columns p0..p{L*b-1} (array<float> each) —
    broadcast; the corpus is scanned once, signatures for all tables are
    computed in that pass, then one bucket-join per table (tiny keys).
    """
    sig = corpus.crossJoin(F.broadcast(planes)).select(
        "vec_id",
        "embedding",
        *[_signature("embedding", t).alias(f"bucket_{t}") for t in range(N_TABLES)],
    )
    cand = None
    for t in range(N_TABLES):
        left = sig.select(F.col("vec_id").alias("q_id"), F.col(f"bucket_{t}").alias("bk"))
        right = sig.select(F.col("vec_id").alias("c_id"), F.col(f"bucket_{t}").alias("bk"))
        p = left.join(right, "bk").where(F.col("q_id") != F.col("c_id")).select("q_id", "c_id")
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()

    q = with_norm(corpus.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")), "q_vec").withColumnRenamed("_norm", "q_norm")
    c = with_norm(corpus.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")), "c_vec").withColumnRenamed("_norm", "c_norm")
    scored = (
        cand.join(q, "q_id")
        .join(c, "c_id")
        .withColumn("cosine", dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "rank", F.round("cosine", 6).alias("cosine_r"))
    )


def _ss02_oracle() -> str:
    plane_sel = ",\n        ".join(
        f"(SELECT embedding FROM embeddings WHERE vec_id = {i}) AS p{i}" for i in range(N_PLANES)
    )
    def bucket(t: int) -> str:
        bits = ",\n               ".join(
            f"CASE WHEN {_ORACLE_DOT.format(a='embedding', b=f'p{t * N_PLANES_PER_TABLE + i}')} >= 0"
            f" THEN '1' ELSE '0' END"
            for i in range(N_PLANES_PER_TABLE)
        )
        return f"concat(\n               {bits}) AS bucket_{t}"

    buckets = ",\n             ".join(bucket(t) for t in range(N_TABLES))
    cand_union = "\n      UNION ALL\n".join(
        f"      SELECT l.vec_id AS q_id, r.vec_id AS c_id FROM sig l"
        f" JOIN sig r ON l.bucket_{t} = r.bucket_{t} AND l.vec_id <> r.vec_id"
        for t in range(N_TABLES)
    )
    return f"""
    WITH planes AS (
      SELECT
        {plane_sel}
    ),
    sig AS (
      SELECT vec_id, embedding,
             {buckets}
      FROM embeddings, planes
    ),
    cand AS (
      SELECT DISTINCT q_id, c_id FROM (
{cand_union}
      )
    ),
    q AS (SELECT vec_id AS q_id, embedding AS q_vec,
                 sqrt({_ORACLE_DOT.format(a='embedding', b='embedding')}) AS q_norm FROM embeddings),
    c AS (SELECT vec_id AS c_id, embedding AS c_vec,
                 sqrt({_ORACLE_DOT.format(a='embedding', b='embedding')}) AS c_norm FROM embeddings),
    scored AS (
      SELECT cand.q_id, cand.c_id,
             {_ORACLE_DOT.format(a='q_vec', b='c_vec')} / (q_norm * c_norm) AS cosine
      FROM cand JOIN q USING (q_id) JOIN c USING (c_id)
    )
    SELECT q_id, c_id, rank, ROUND(cosine, 6) AS cosine_r FROM (
      SELECT q_id, c_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
      FROM scored
    ) WHERE rank <= 3
    """


@register(
    "ss02_lsh_ann",
    oracle=_ss02_oracle(),
    doc=(
        "Multi-table hyperplane-LSH ANN: 4 tables × 4-bit sign signatures "
        "(deterministic planes = corpus vectors 0-15 so the oracle "
        "reproduces them), candidate union across tables, exact re-rank, "
        "top-3 per query. OR-amplification: recall 1-(1-p)^4 per neighbor."
    ),
    tags=("similarity", "ann", "lsh"),
)
def ss02(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    planes = (
        emb.where(F.col("vec_id") < N_PLANES)
        .groupBy()
        .pivot("vec_id", list(range(N_PLANES)))
        .agg(F.first("embedding"))
        .withColumnsRenamed({str(i): f"p{i}" for i in range(N_PLANES)})
    )
    return lsh_bucketed_ann(emb, planes, k=3)
