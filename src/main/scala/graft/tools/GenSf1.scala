package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-time tool: derive an sf1 (10×, default) or sf10 (100×,
  * `copies`=100) dataset from the driver's read-only sf0.1 tables,
  * for the scale-proof bench runs (VERDICT r5 item 1, r7 item 2).
  * NOT part of the query library.
  *
  * Design: N key-shifted copies of every scaled table (strides = the
  * base table's key range), so every join stays FK-consistent and the
  * join/aggregate work grows N×. Naively copying text/embeddings
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

  /** All 120 permutations of the 5 vowels in deterministic order;
    * index 0 = identity. Any two distinct permutations differ in at
    * least two positions, so cross-copy Latin text diverges for every
    * copy pair up to 120 copies (the old hand-picked list had period
    * 10 — at 100 copies, copies i and i+10 would share identical
    * Latin text and create exact cross-copy duplicates, a data
    * artifact that would blow the near-dup pair space up
    * quadratically instead of linearly).
    */
  private val vowelPerms: Seq[String] = "aeiou".permutations.toSeq

  /** 53 high-frequency CJK chars (53 prime and all chars distinct →
    * 53 distinct fixed-point-free rotations; reversing doubles the
    * family to 106 distinct 1:1 maps, enough for 100 copies — a
    * rotation-only scheme has period 53, so at 100 copies a pure-CJK
    * doc in copies i and i+53 would be byte-identical).
    */
  private val cjkChars =
    "的一是不了人我在有他这中大来上国个到说们为子和你地出道时年得就那要下以生会自着去之过家学对可她里后小么心多"

  private def rot(s: String, k: Int): String = {
    val r = k % s.length
    s.substring(r) + s.substring(0, r)
  }

  /** 21 lowercase consonants; rotation + optional reversal gives 42
    * distinct 1:1 maps (identity at i=0). Composed with the vowel
    * permutation so a cross-copy text collision needs BOTH maps to
    * agree on the text's character subset — vowel perms alone left 98
    * of 499k texts colliding at 100 copies (texts using only vowels
    * where two perms happen to agree).
    */
  private val consChars = "bcdfghjklmnpqrstvwxyz"

  private def consSub(i: Int): String = {
    val r = rot(consChars, i % consChars.length)
    if ((i / consChars.length) % 2 == 1) r.reverse else r
  }

  /** The full 1:1 substitution alphabet for copy `i`. */
  private def subst(i: Int): (String, String) = {
    val lower = vowelPerms(i % vowelPerms.size)
    val upper = lower.toUpperCase
    val cons = consSub(i)
    val cjkRot = rot(cjkChars, (i * 5) % cjkChars.length)
    val cjk = if ((i / cjkChars.length) % 2 == 1) cjkRot.reverse else cjkRot
    ("aeiou" + "AEIOU" + consChars + consChars.toUpperCase + cjkChars,
      lower + upper + cons + cons.toUpperCase + cjk)
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
      * single-row-group files, the generated scans parallelize
      * natively). `files` is sized for the 10-copy sf1; scale it
      * with the multiplier so per-file size stays constant.
      */
    def gen(name: String, files: Int)(copy: (DataFrame, Int) => DataFrame): Unit = {
      val nf = math.max(files, files * copies / 10)
      val src = load(name)
      val all = (0 until copies).map(i => copy(src, i)).reduce(_ unionByName _)
      all.repartition(nf).write.mode("overwrite").parquet(s"$out/$name.parquet")
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
    // ts passes through in whatever physical form the base table has
    // (nanos-long, TIMESTAMP_NTZ, or TIMESTAMP) — Tables.events
    // normalizes every form at read time, so copies stay faithful
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
