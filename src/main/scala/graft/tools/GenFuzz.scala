package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-time tool: derive a PATHOLOGICAL sf-tiny dataset from the
  * driver's sf0.001 tables — the edge-input classes that historically
  * diverge between engines (the round-2 golden pass caught two real
  * divergences on exactly this class): empty / whitespace-only /
  * 1-char / all-duplicate / punctuation-only / CJK-only / digit-only
  * documents, and zero-norm / exact-duplicate / antipodal / denormal
  * embedding vectors. Everything else is a plain subset of the real
  * tables (schemas derived, never synthesized, so they cannot drift).
  *
  * The documents and embeddings tables stay row-aligned (vec_id ==
  * doc_id, same cardinality) — the contract pipe_e2e_sem's
  * embedding↔doc join relies on. FuzzEdgeSpec runs the full registry
  * on this dataset; graft.Verify + tools/check.py on the same dir is
  * the oracle gate (recorded in BASELINE.md per round).
  */
object GenFuzz {

  val NumReal = 80
  val NumDocs = 100

  /** (text, lang) for the pathological tail, doc_id NumReal… */
  private val pathologicalDocs: Seq[(String, String)] = Seq(
    ("", "en"),                                        // empty
    ("   ", "en"),                                     // whitespace-only
    ("a", "en"),                                       // 1-char letter
    (".", "en"),                                       // 1-char punctuation
    ("duplicate shard common text", "en"),             // all-duplicate run …
    ("duplicate shard common text", "en"),
    ("duplicate shard common text", "fr"),             // … across langs/sources
    ("duplicate shard common text", "en"),
    ("duplicate shard common text", "de"),
    (Seq.fill(50)("spam").mkString(" "), "en"),        // one repeated word
    ("!!! ??? ;;; ,,, :::", "en"),                     // punctuation-only
    ("的一是不了人我在有他这中大来上", "zh"),            // CJK-only
    ("a\n\nb\tc  d", "en"),                            // newline/tab whitespace
    ("0 1 2 3 4 5 6 7 8 9", "en"),                     // digits-only
    ("x" * 500, "en"),                                 // one 500-char word
    ("The the THE of OF to TO and AND", "en"),         // stopword blast
    (" ", "en"),                                       // single space
    (null, "en"),                                      // placeholder → real dup
    ("éàü ñ ç ß ø å", "es"),                           // accented latin
    ("\t\t", "en"))                                    // tabs-only

  def generate(spark: SparkSession, base: String, out: String): Unit = {
    import spark.implicits._

    def load(name: String): DataFrame =
      spark.read.parquet(s"$base/$name.parquet")

    def write(name: String, df: DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name.parquet")

    // ── dimension + fact subsets (verbatim rows, FK gaps are part of
    // the edge surface: empty groups / empty join sides must agree)
    write("region", load("region"))
    write("nation", load("nation"))
    write("customer", load("customer").orderBy("c_custkey").limit(100))
    write("supplier", load("supplier").orderBy("s_suppkey").limit(50))
    write("part", load("part").orderBy("p_partkey").limit(100))
    write("orders", load("orders").orderBy("o_orderkey").limit(150))
    write("lineitem", load("lineitem").orderBy("l_orderkey", "l_linenumber").limit(300))

    // ── events: a subset plus exact-timestamp duplicate rows (the
    // tie-break surface for sessionize/windows); written as micros
    // TIMESTAMP so both engines read the same column (Tables.events
    // handles either physical form)
    val ev = graft.Tables.events(spark, base).orderBy("event_id").limit(400)
    val maxId = ev.agg(max("event_id")).head.getLong(0)
    val dupTs = ev.orderBy("event_id").limit(5)
      .withColumn("event_id", col("event_id") + lit(maxId + 1L))
    // as-of / range-join torture users: every row of user 9001 shares
    // ONE instant (purchase must see none of its same-instant clicks,
    // ties among clicks break by highest event_id); 9002 has purchases
    // but no clicks (all-null as-of matches); 9003 clicks only (no
    // output rows); 9004 is a single purchase at the epoch boundary
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 12:00:00.000001")
    val patEvents = Seq(
      (maxId + 11L, t0, 9001L, "click", 1.0, """{"k": 1}"""),
      (maxId + 12L, t0, 9001L, "click", 2.0, """{"k": 2}"""),
      (maxId + 13L, t0, 9001L, "purchase", 3.0, """{"k": 3}"""),
      (maxId + 14L, t0, 9001L, "purchase", 4.0, """{"k": 4}"""),
      (maxId + 15L, new java.sql.Timestamp(t0.getTime + 1000L), 9001L, "purchase", 5.0, """{"k": 5}"""),
      (maxId + 16L, t0, 9002L, "purchase", 6.0, """{"k": 6}"""),
      (maxId + 17L, new java.sql.Timestamp(t0.getTime + 2000L), 9002L, "purchase", 7.0, """{"k": 7}"""),
      (maxId + 18L, t0, 9003L, "click", 8.0, """{"k": 8}"""),
      (maxId + 19L, new java.sql.Timestamp(0L), 9004L, "purchase", 9.0, """{"k": 9}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    write("events", ev.unionByName(dupTs).unionByName(patEvents))

    // ── documents: NumReal real docs + the pathological tail, dense
    // doc_id, source = src(doc_id % 20) like the real mapping
    val realDocs = load("documents").filter(col("doc_id") < NumReal)
    val realText0 = load("documents").filter(col("doc_id") === 0)
      .select("text").head.getString(0)
    val tail = pathologicalDocs.zipWithIndex.map { case ((t, lang), i) =>
      val text = if (t == null) realText0 else t // cross-set exact dup of a real doc
      (NumReal + i.toLong, text, lang, s"src${(NumReal + i) % 20}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    write("documents", realDocs.unionByName(tail))

    // ── embeddings: row-aligned with documents; pathological vectors
    val realVecs = load("embeddings").filter(col("vec_id") < NumReal)
    val dim = load("embeddings").select(size(col("embedding"))).head.getInt(0)
    val realVec0 = load("embeddings").filter(col("vec_id") === 0)
      .select("embedding").as[Seq[Float]].head
    def vec(f: Int => Float): Seq[Float] = (0 until dim).map(f)
    val patVecs: Seq[Seq[Float]] = Seq(
      vec(_ => 0f),                                    // zero-norm
      vec(_ => 0f),                                    // second zero (zero-zero pair)
      realVec0,                                        // exact dup of a real vector
      realVec0.map(-_),                                // antipodal (cosine -1)
      vec(_ => 1e-30f),                                // denormal-tiny magnitude
      vec(j => if (j == 0) 1f else 0f),                // one-hot
      vec(j => if (j == 0) 1f else 0f),                // one-hot dup (cosine 1)
      vec(j => if (j % 2 == 0) 1f else -1f),           // alternating signs
      vec(j => if (j % 2 == 0) -1f else 1f),           // antipodal alternating
      vec(_ => 1f),                                    // constant positive
      vec(_ => -1f),                                   // constant negative
      vec(j => j.toFloat),                             // ramp
      vec(j => (dim - j).toFloat),                     // reverse ramp
      vec(j => if (j < dim / 2) 1f else 0f),           // half-hot
      vec(j => if (j >= dim / 2) 1f else 0f),          // complementary half
      vec(_ => 1e30f),                                 // huge magnitude
      vec(j => if (j == dim - 1) -1f else 0f),         // negative one-hot
      realVec0.map(x => x * 2f),                       // scaled dup (cosine 1)
      vec(j => ((j * 7 + 3) % 5 - 2).toFloat),         // small-integer pattern
      vec(_ => 0.5f))                                  // constant half
    val tailVecs = patVecs.zipWithIndex.map { case (v, i) =>
      (NumReal + i.toLong, v, 0)
    }.toDF("vec_id", "embedding", "label")
    write("embeddings", realVecs.unionByName(tailVecs))
  }

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/root/repo/target/fuzzdata")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, base, out)
    spark.stop()
  }
}
