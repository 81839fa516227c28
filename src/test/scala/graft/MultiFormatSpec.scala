package graft

import graft.sources.MultiFormat
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-exact round-trips for every supported source/sink format on
  * the real documents table — multilingual text with embedded
  * punctuation is exactly what breaks naive CSV handling.
  */
class MultiFormatSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs = Tables.documents(spark, sf)

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.join(b, a.columns.toSeq, "left_anti").count() == 0)
    assert(b.join(a, b.columns.toSeq, "left_anti").count() == 0)
  }

  for (fmt <- MultiFormat.formats) {
    test(s"$fmt round-trips the documents table row-exactly") {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-$fmt").toString
      MultiFormat.write(docs, fmt, s"$dir/t")
      val back = MultiFormat.read(spark, fmt, docs.schema, s"$dir/t")
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        docs.schema.map(f => (f.name, f.dataType)))
      assertSameRows(docs, back)
    }
  }

  test("csv round-trips a pathological frame: quotes, delimiters, newlines, empty") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "quote \" inside"),
      (4L, "newline\ninside"),
      (5L, ""),
      (6L, "all: \",\n\" mixed")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-nastycsv").toString
    MultiFormat.write(nasty, "csv", s"$dir/t")
    val back = MultiFormat.read(spark, "csv", nasty.schema, s"$dir/t")
    // empty string vs null is the one documented CSV lossy corner:
    // both serialize to a bare empty field
    val norm = (df: DataFrame) => df.withColumn("text", coalesce(col("text"), lit("")))
    assertSameRows(norm(nasty), norm(back))
  }

  test("convert lands JSON-lines as partitioned parquet, row-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-convert").toString
    MultiFormat.write(docs, "json", s"$dir/in")
    MultiFormat.convert(spark, "json", docs.schema, s"$dir/in", s"$dir/out",
      partitionBy = Seq("lang"))
    // partition directories exist per language
    val langDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).toSet
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langDirs == langs.map(l => s"lang=$l"))
    val back = spark.read.parquet(s"$dir/out")
      .select(docs.columns.map(col): _*) // partition col moves last; reorder
    assertSameRows(docs, back)
  }
}
