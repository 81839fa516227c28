package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for cluster scale, as reusable library utilities:
  *
  *  - bucketed co-located join: both fact tables written bucketed by
  *    the join key join shuffle-free (the production layout for the
  *    recurring lineitem⋈orders shuffle);
  *  - salted skew join: a hot key is split across `salt` sub-keys on
  *    the skewed side and replicated on the dim side, so one reducer
  *    no longer owns the whole key.
  *
  * Verified by plan assertions in ScaleJoinsSpec (no Exchange under
  * the bucketed sort-merge join; salt column present in the salted
  * join keys).
  */
object ScaleJoins {

  /** Write both sides bucketed by the join key into `db`-less managed
    * tables, so subsequent joins on that key are shuffle-free.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Shuffle-free join of two tables previously written with
    * writeBucketed on the same key and bucket count.
    */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Salted inner join: skewed fact side gets a random salt in
    * [0, salt), the dimension side is exploded `salt` times, and the
    * join runs on (key, salt) — spreading a hot key over `salt`
    * reducers. Results are identical to the plain join.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", (rand(42) * salt).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
