package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** REEF representation similarity: pairwise linear CKA between the
  * embedding groups (label = model/layer axis), computed as
  * distributed cross-moment aggregations — no driver-side matrices.
  *
  * Reference: reef.py:37-69 (_compute_cka):
  *   CKA(X,Y) = ‖YᵀX‖²_F / √(‖XᵀX‖²_F · ‖YᵀY‖²_F), X,Y centered.
  *
  * Alignment: groups are sampled to a common N = min(128, smallest
  * group size), rows aligned by within-group vec_id rank. The cap
  * makes per-pair cost constant (N·d² cross-moments with d=64), so
  * the operator's total cost is O(|labels|²) regardless of corpus
  * size — the 100 TB posture. Centering means are computed over the
  * same N rows.
  */
object Reef {

  val MaxN = 128

  val cka = Q(
    "ma_reef_cka",
    s"""WITH ranked AS (
       |  SELECT label, embedding,
       |    row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
       |  FROM embeddings
       |),
       |n AS (SELECT least($MaxN, min(cnt)) AS n FROM
       |  (SELECT count(*) AS cnt FROM ranked GROUP BY label)),
       |pos AS (
       |  SELECT label, rn, g, CAST(embedding[g] AS DOUBLE) AS x
       |  FROM (SELECT label, rn, embedding, unnest(generate_series(1, len(embedding))) AS g
       |        FROM ranked, n WHERE rn <= n.n)
       |),
       |centered AS (
       |  SELECT label, rn, g, x - avg(x) OVER (PARTITION BY label, g) AS xc
       |  FROM pos
       |),
       |selfg AS (
       |  SELECT label, sum(c * c) AS hsic_self FROM (
       |    SELECT a.label, a.g AS i, b.g AS j, sum(a.xc * b.xc) AS c
       |    FROM centered a JOIN centered b ON a.label = b.label AND a.rn = b.rn
       |    GROUP BY a.label, a.g, b.g
       |  ) GROUP BY label
       |),
       |crossg AS (
       |  SELECT la, lb, sum(c * c) AS hsic_xy FROM (
       |    SELECT a.label AS la, b.label AS lb, a.g AS i, b.g AS j, sum(a.xc * b.xc) AS c
       |    FROM centered a JOIN centered b ON a.rn = b.rn AND a.label < b.label
       |    GROUP BY a.label, b.label, a.g, b.g
       |  ) GROUP BY la, lb
       |)
       |SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b,
       |  round(1e-9 + CASE WHEN sqrt(sa.hsic_self * sb.hsic_self) < 1e-10 THEN CAST(0 AS DOUBLE)
       |    ELSE hsic_xy / sqrt(sa.hsic_self * sb.hsic_self) END, 6) AS cka
       |FROM crossg
       |JOIN selfg sa ON sa.label = la
       |JOIN selfg sb ON sb.label = lb
       |ORDER BY label_a, label_b""".stripMargin) { (spark, dir) =>
    ckaDf(spark, dir).orderBy("label_a", "label_b")
  }

  /** Unordered CKA pair frame; 45 fixed-width rows — cached so the
    * compare query doesn't recompute the cross-moment pipeline.
    */
  private def ckaDf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val w = Window.partitionBy("label").orderBy("vec_id")
    val ranked = emb.withColumn("rn", row_number().over(w))
    val n = ranked.groupBy("label").agg(count(lit(1)).as("cnt"))
      .agg(least(lit(MaxN), min("cnt")).as("n"))
    val pos = ranked.crossJoin(broadcast(n)).filter(col("rn") <= col("n"))
      .select(col("label"), col("rn"), posexplode(col("embedding")))
      .select(col("label"), col("rn"), (col("pos") + 1).as("g"), col("col").cast("double").as("x"))
    val centered = pos
      .withColumn("xc", col("x") - avg("x").over(Window.partitionBy("label", "g")))
      .select("label", "rn", "g", "xc")
    val a = centered.select(col("label").as("la"), col("rn"), col("g").as("i"), col("xc").as("xa"))
    val b = centered.select(col("label").as("lb"), col("rn"), col("g").as("j"), col("xc").as("xb"))
    val selfg = a.join(
      centered.select(col("label").as("la"), col("rn"), col("g").as("j"), col("xc").as("xb")),
      Seq("la", "rn"))
      .groupBy("la", "i", "j").agg(sum(col("xa") * col("xb")).as("c"))
      .groupBy("la").agg(sum(col("c") * col("c")).as("hsic_self"))
    val crossg = a.join(b, col("la") < col("lb") && a("rn") === b("rn"))
      .groupBy("la", "lb", "i", "j").agg(sum(col("xa") * col("xb")).as("c"))
      .groupBy("la", "lb").agg(sum(col("c") * col("c")).as("hsic_xy"))
    crossg
      .join(selfg.select(col("la"), col("hsic_self").as("ha")), Seq("la"))
      .join(selfg.select(col("la").as("lb"), col("hsic_self").as("hb")), Seq("lb"))
      .select(
        col("la").cast("long").as("label_a"),
        col("lb").cast("long").as("label_b"),
        round(lit(1e-9) + when(sqrt(col("ha") * col("hb")) < 1e-10, 0d)
          .otherwise(col("hsic_xy") / sqrt(col("ha") * col("hb"))), 6).as("cka"))
      .cache()
  }

  /** REEF compare verdict (reef.py:184-225): treat labels 0..4 as
    * model A's sampled layers and 5..9 as model B's, pair layer i
    * with layer i+5, average the per-layer CKAs, and apply the 0.85
    * threshold + confidence formula.
    */
  val compare = Q(
    "ma_reef_compare", {
      val ckaSql = cka.oracle.get.replace("ORDER BY label_a, label_b", "")
      s"""WITH cka AS ($ckaSql)
         |SELECT 'model_a' AS model_a, 'model_b' AS model_b,
         |  CAST(count(*) AS BIGINT) AS num_layers_compared,
         |  round(1e-9 + avg(cka) + 1e-9, 6) AS similarity,
         |  avg(cka) >= CAST(0.85 AS DOUBLE) AS is_derived,
         |  round(1e-9 + least(abs(avg(cka) - CAST(0.85 AS DOUBLE)) / CAST(0.15 AS DOUBLE),
         |    CAST(1 AS DOUBLE)) + 1e-9, 6) AS confidence
         |FROM cka
         |WHERE label_b = label_a + 5 AND label_a < 5""".stripMargin
    }) { (spark, dir) =>
    ckaDf(spark, dir)
      .filter(col("label_b") === col("label_a") + 5 && col("label_a") < 5)
      .agg(
        count(lit(1)).as("num_layers_compared"),
        round(lit(1e-9) + avg("cka") + 1e-9, 6).as("similarity"),
        (avg("cka") >= 0.85).as("is_derived"),
        round(lit(1e-9) + least(abs(avg("cka") - 0.85) / 0.15, lit(1d)) + 1e-9, 6).as("confidence"))
      .select(lit("model_a").as("model_a"), lit("model_b").as("model_b"),
        col("num_layers_compared"), col("similarity"), col("is_derived"), col("confidence"))
  }

  val all: Seq[Q] = Seq(cka, compare)
}
