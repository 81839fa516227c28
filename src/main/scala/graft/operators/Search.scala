package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword search over the corpus — the retrieval shape a
  * training-data pipeline uses for targeted corpus probes (find the
  * documents most about X) and that the reference's marker scans
  * (style.py:241-302) approximate with fixed phrase lists.
  *
  * BM25 (Robertson/Sparck Jones; the Lucene `(N-df+0.5)/(df+0.5)+1`
  * idf form so scores stay positive) with k1=1.2, b=0.75.
  *
  * Scale shape — the query-term set is small and fixed, so the plan
  * NEVER materializes an inverted index or shuffles tokens:
  *  - per-doc term frequencies are map-only array ops on the scan
  *    (one `filter` HOF per term over the shared tokenization);
  *  - corpus stats (N, avgdl, per-term df) are ONE map-side-combined
  *    global aggregate → a 1-row broadcast join back onto the docs;
  *  - the top-k is TakeOrderedAndProject (per-partition bounded heap
  *    + driver merge of k rows), never a global sort.
  * At 100 TB this is one pass over the text plus k rows out.
  */
object Search {

  private val terms = Seq("spark", "vector", "window")
  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 15

  private def tfOf(spark: SparkSession, dir: String) = {
    val words = split(trim(lower(col("text"))), "\\s+")
    Tables.documents(spark, dir)
      .select(col("doc_id"), words.as("w"))
      .select(
        col("doc_id") +: size(col("w")).cast("long").as("dl") +:
          terms.map(t => size(filter(col("w"), _ === t)).cast("long").as(s"tf_$t")): _*)
  }

  /** One-time memoized corpus statistics (N, avgdl, per-term df) —
    * the inverted-index half a production search system builds once
    * and serves many queries from. Without the memo the 1-row stats
    * aggregate forces a SECOND full text scan per query.
    */
  private[graft] def bm25Stats(spark: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.frames(spark, s"search.bm25Stats:$dir") {
      val gCols = count(lit(1)).as("n") +: avg("dl").as("avgdl") +:
        terms.map(t => sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t"))
      val g = tfOf(spark, dir).agg(gCols.head, gCols.tail: _*).persist()
      g.count()
      Seq(g)
    }.head

  val bm25 = Q(
    "ix_bm25", {
      val words = "string_split_regex(trim(lower(text)), '\\s+')"
      val tfSql = terms.map(t =>
        s"CAST(len(list_filter(w, x -> x = '$t')) AS BIGINT) AS tf_$t").mkString(",\n    ")
      val dfSql = terms.map(t =>
        s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(", ")
      val scoreSql = terms.map { t =>
        s"""ln((g.n - g.df_$t + 0.5) / (g.df_$t + 0.5) + 1)
           |      * tf_$t * ${K1 + 1} / (tf_$t + $K1 * (1 - $B + $B * dl / g.avgdl))""".stripMargin
      }.mkString("\n      + ")
      s"""WITH tf AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
         |    $tfSql
         |  FROM (SELECT doc_id, $words AS w FROM documents)
         |),
         |g AS (
         |  SELECT count(*) AS n, avg(dl) AS avgdl, $dfSql FROM tf
         |)
         |SELECT doc_id, ${terms.map(t => s"tf_$t").mkString(", ")},
         |  round(1e-9 + $scoreSql + 1e-9, 6) AS score
         |FROM tf, g
         |ORDER BY score DESC, doc_id
         |LIMIT $TopK""".stripMargin
    }) { (spark, dir) =>
    val tf = tfOf(spark, dir)
    val g = bm25Stats(spark, dir)
    val score = terms.map { t =>
      log((col("n") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5) + 1) *
        col(s"tf_$t") * (K1 + 1) /
        (col(s"tf_$t") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    tf.join(broadcast(g))
      .select(col("doc_id") +: terms.map(t => col(s"tf_$t")) :+
        round(lit(1e-9) + score + 1e-9, 6).as("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(TopK)
  }

  val all: Seq[Q] = Seq(bm25)
}
