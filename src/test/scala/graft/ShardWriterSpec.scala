package graft

import java.nio.file.{Files, Paths}

import graft.sources.ShardWriter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shard writer must (a) lay files out exactly where the
  * pipe_shard plan said they go, (b) deterministically, (c) with
  * lossless round-trip.
  */
class ShardWriterSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs = Tables.documents(spark, sf).select("doc_id", "source", "text")

  private def listShardDirs(out: String): Map[(String, Long), Seq[String]] = {
    val root = Paths.get(out)
    import scala.jdk.CollectionConverters._
    Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("source="))
      .flatMap { src =>
        val s = src.getFileName.toString.stripPrefix("source=")
        Files.list(src).iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("shard_id="))
          .map { sh =>
            val k = sh.getFileName.toString.stripPrefix("shard_id=").toLong
            val parts = Files.list(sh).iterator().asScala
              .map(_.getFileName.toString)
              .filter(f => f.endsWith(".parquet") && !f.startsWith("."))
              .toSeq.sorted
            (s, k) -> parts
          }
      }.toMap
  }

  test("per-doc assignments aggregate to exactly the pipe_shard result") {
    val agg = ShardWriter.assignments(docs)
      .groupBy("source", "shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("tokens_total"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("shard_id")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_total"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toMap
    val want = SparkEntry.queries("pipe_shard")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("shard_id")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_total"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toMap
    assert(agg == want)
  }

  test("layout matches the plan, one file per shard, deterministic") {
    val out = Files.createTempDirectory("graft-shards").toString
    val assign = ShardWriter.writeShards(docs, out)
    val planned = assign.groupBy("source", "shard_id").count().collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("shard_id"))).toSet
    val dirs = listShardDirs(out)
    assert(dirs.keySet == planned, "directory tree must mirror the planned shards")
    // budget-bounded shards under the default maxRecordsPerFile → one
    // task, one file each
    assert(dirs.values.forall(_.size == 1),
      s"expected one part file per shard, got ${dirs.view.mapValues(_.size).toMap.filter(_._2 != 1)}")
    // determinism: writing again produces the identical (source,
    // shard, row-count, token-total) tree
    val out2 = Files.createTempDirectory("graft-shards2").toString
    ShardWriter.writeShards(docs, out2)
    def tree(o: String) = ShardWriter.readShards(spark, o)
      .groupBy("source", "shard_id")
      .agg(count(lit(1)).as("n"), sum("tokens").as("t"),
        sum(sha2(col("text"), 256).substr(1, 8).cast("string").isNotNull.cast("long")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(tree(out) == tree(out2))
  }

  test("maxRecordsPerFile splits a shard into ceil(n/max) files after the doc_id sort") {
    val out = Files.createTempDirectory("graft-shards-split").toString
    val assign = ShardWriter.writeShards(docs, out, maxRecordsPerFile = 7L)
    val planned = assign.groupBy("source", "shard_id").count().collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("shard_id")) ->
        r.getAs[Long]("count")).toMap
    val dirs = listShardDirs(out)
    for (((s, k), parts) <- dirs)
      assert(parts.size == ((planned((s, k)) + 6) / 7).toInt,
        s"shard ($s, $k): ${parts.size} files for ${planned((s, k))} rows")
  }

  test("round-trip: the files on disk are the corpus, shard-for-shard") {
    val out = Files.createTempDirectory("graft-shards-rt").toString
    val assign = ShardWriter.writeShards(docs, out)
    val back = ShardWriter.readShards(spark, out)
      .select("doc_id", "source", "text", "tokens", "shard_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[String]("text"),
          r.getAs[Long]("tokens"), r.getAs[Long]("shard_id"))).toMap
    val want = docs
      .join(assign.select("doc_id", "tokens", "shard_id"), Seq("doc_id"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[String]("text"),
          r.getAs[Long]("tokens"), r.getAs[Long]("shard_id"))).toMap
    assert(back.size == docs.count())
    assert(back == want, "read-back rows must equal the written corpus + assignment")
  }
}
