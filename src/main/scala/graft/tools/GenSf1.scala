package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-time tool: derive an sf1 (10×) dataset from the driver's
  * read-only sf0.1 tables, for the scale-proof bench run (VERDICT r5
  * item 1). NOT part of the query library.
  *
  * Design: 10 key-shifted copies of every scaled table (strides = the
  * base table's key range), so every join stays FK-consistent and the
  * join/aggregate work grows 10×. Naively copying text/embeddings
  * verbatim would create 9 exact twins per doc and blow the near-dup
  * pair space up QUADRATICALLY — a data artifact, not scale — so each
  * copy perturbs content while preserving within-copy structure:
  *
  *  - documents.text: per-copy 1:1 character substitution (distinct
  *    vowel permutations + a rotation of 53 common CJK chars). Every
  *    word containing a substituted char hashes differently, so
  *    cross-copy shingle overlap collapses below any duplicate
  *    threshold, while within-copy near-dup structure is preserved
  *    exactly (same transform on both sides of every pair) and
  *    n_chars stays consistent (1:1 mapping). Language-heuristic
  *    selectivities (langid stopwords) drift for perturbed copies —
  *    acceptable: sf1 measures runtime scaling, not output parity.
  *  - embeddings.embedding: per-copy circular shift PLUS a per-copy
  *    ±1 diagonal sign pattern — both orthogonal, so all within-copy
  *    inner products (and the within-copy ANN/near-dup geometry) are
  *    preserved bit-exactly. The sign pattern is the load-bearing
  *    half: this corpus has a dominant positive mean component, so a
  *    bare shift leaves cross-copy cosine ≈ 0.75 (far above the 0.3
  *    near-dup threshold — the first sf1 cut blew dd_embed's pair set
  *    up 98×); flipping ~half the signs with a copy-relative random
  *    pattern cancels the DC term and drives cross-copy cosine to ≈ 0.
  *  - region/nation: dimension tables, copied verbatim (they do not
  *    scale with sf in TPC-H either).
  *
  * Copy 0 is the identity — sf0.1 is a strict subset of sf1.
  */
object GenSf1 {

  /** 10 distinct permutations of the 5 vowels; index 0 = identity. */
  private val vowelPerms: Seq[String] =
    "aeiou" +: Seq("eioua", "iouae", "ouaei", "uaeio", "aeiuo",
      "eioau", "iouea", "ouaie", "uaeoi")

  /** 53 high-frequency CJK chars (prime length → 10 distinct
    * rotations by 5·i).
    */
  private val cjkChars =
    "的一是不了人我在有他这中大来上国个到说们为子和你地出道时年得就那要下以生会自着去之过家学对可她里后小么心多"

  private def rot(s: String, k: Int): String = {
    val r = k % s.length
    s.substring(r) + s.substring(0, r)
  }

  /** The full 1:1 substitution alphabet for copy `i`. */
  private def subst(i: Int): (String, String) = {
    val lower = vowelPerms(i % vowelPerms.size)
    val upper = lower.toUpperCase
    val cjk = rot(cjkChars, (i * 5) % cjkChars.length)
    ("aeiou" + "AEIOU" + cjkChars, lower + upper + cjk)
  }

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/testdata-sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(name: String): DataFrame =
      spark.read.parquet(s"$base/$name.parquet")

    /** Union `copies` transformed copies and write as a multi-file
      * parquet directory (splittable — unlike the driver's
      * single-row-group files, sf1 scans parallelize natively).
      */
    def gen(name: String, files: Int)(copy: (DataFrame, Int) => DataFrame): Unit = {
      val src = load(name)
      val all = (0 until copies).map(i => copy(src, i)).reduce(_ unionByName _)
      all.repartition(files).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"$name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // strides = base key range per table (sf0.1 actuals)
    val C = 15000L; val S = 1000L; val P = 20000L; val O = 150000L
    val E = 100000L; val U = 1500L; val D = 5000L; val V = 2000L

    // dimension tables: verbatim single copies
    for (name <- Seq("region", "nation")) {
      load(name).coalesce(1).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"$name: copied verbatim")
    }
    gen("customer", 4)((df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * C)))
    gen("supplier", 1)((df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * S)))
    gen("part", 4)((df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * P)))
    gen("orders", 8)((df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * O))
      .withColumn("o_custkey", col("o_custkey") + lit(i * C)))
    gen("lineitem", 32)((df, i) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * O))
      .withColumn("l_partkey", col("l_partkey") + lit(i * P))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * S)))
    // ts was read as nanos-long; written back as plain BIGINT, which
    // Tables.events converts identically (timestamp_micros(ts div 1000))
    gen("events", 16)((df, i) => df
      .withColumn("event_id", col("event_id") + lit(i * E))
      .withColumn("user_id", col("user_id") + lit(i * U)))
    gen("documents", 16)((df, i) => {
      val (from, to) = subst(i)
      df.withColumn("doc_id", col("doc_id") + lit(i * D))
        .withColumn("text", translate(col("text"), from, to))
    })
    val dim = load("embeddings").select(size(col("embedding"))).head.getInt(0)
    // deterministic ±1 sign for copy i, coordinate j (identity at i=0)
    def sign(i: Int, j: Int): Float =
      if (i == 0 || ((i * 2654435761L + j * 40503L) >>> 7) % 2 == 0) 1f else -1f
    gen("embeddings", 8)((df, i) => {
      val shift = i % dim
      val signs = typedLit((0 until dim).map(j => sign(i, j)))
      val flipped = zip_with(col("embedding"), signs, (x, s) => x * s)
      val rotated =
        if (shift == 0) flipped
        else concat(
          slice(flipped, shift + 1, dim - shift),
          slice(flipped, 1, shift))
      df.withColumn("vec_id", col("vec_id") + lit(i * V))
        .withColumn("embedding", rotated)
    })

    spark.stop()
  }
}
