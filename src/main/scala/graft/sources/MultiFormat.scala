package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format ingestion/egress — the source/sink surface beyond
  * parquet. A corpus pipeline rarely controls its input format:
  * crawl dumps arrive as JSON-lines, vendor drops as CSV, legacy
  * lakes as ORC. This layer keeps every format behind the same
  * DataFrame contract with the properties that matter at 100 TB:
  *
  *  - **Explicit schemas on read, always.** Schema inference is a
  *    full extra pass over the data (and for CSV/JSON it samples —
  *    a column that is all-null in the sample silently becomes
  *    string). Every reader here takes the expected StructType, so
  *    the scan starts immediately and drift fails loudly instead of
  *    reshaping downstream plans.
  *  - **Splittable compression defaults.** Output codecs: parquet →
  *    zstd (internal block compression, always splittable), ORC →
  *    zstd likewise, CSV/JSON-lines → uncompressed directories of
  *    part files (a .gz JSON file is ONE split — a single 100 GB
  *    gzip stream serializes the whole scan onto one core; many
  *    moderate part files keep line formats parallel).
  *  - **Text-format hygiene.** CSV round-trips embedded delimiters/
  *    quotes/newlines only with explicit quote+escape settings and
  *    multiLine on read; JSON-lines needs neither but pays ~2-4× the
  *    scan CPU of parquet and reads every column regardless of
  *    projection — both are EDGE formats: land them, convert to
  *    parquet once, query the parquet (convert() below is that step).
  *
  * MultiFormatSpec pins row-exact round-trips for every format on
  * the real documents table (multilingual text, embedded
  * punctuation), plus the convert() path.
  */
object MultiFormat {

  /** Formats with first-class round-trip support in this build.
    * (spark-avro is not on the classpath in this environment; avro
    * lands through the same convert() path once its jar is present.)
    */
  val formats: Seq[String] = Seq("parquet", "orc", "json", "csv")

  private def writer(df: DataFrame, format: String) = {
    val base = df.write.mode("overwrite")
    format match {
      case "parquet" => base.format("parquet").option("compression", "zstd")
      case "orc"     => base.format("orc").option("compression", "zstd")
      case "json"    => base.format("json")
      case "csv"     => base.format("csv")
        .option("header", "true")
        // default escape is backslash-less ("); embedded quotes and
        // newlines in document text need the full quote/escape pair
        .option("quote", "\"").option("escape", "\"")
    }
  }

  def write(df: DataFrame, format: String, path: String): Unit =
    writer(df, format).save(path)

  def read(spark: SparkSession, format: String, schema: StructType, path: String): DataFrame = {
    val base = spark.read.format(format).schema(schema)
    format match {
      case "csv" => base
        .option("header", "true")
        .option("quote", "\"").option("escape", "\"")
        // embedded newlines inside quoted fields span lines; without
        // multiLine the parser treats each physical line as a record.
        // multiLine makes a csv FILE one split — which is exactly why
        // convert() to parquet is the first step of any real pipeline
        .option("multiLine", "true")
        .load(path)
      case _ => base.load(path)
    }
  }

  /** The landing step: edge format in, query-format (parquet) out,
    * partitioned for downstream pruning. One pass, no shuffle beyond
    * the optional partition column split.
    */
  def convert(spark: SparkSession, format: String, schema: StructType,
      inPath: String, outPath: String, partitionBy: Seq[String] = Nil): Unit = {
    val df = read(spark, format, schema, inPath)
    val w = df.write.mode("overwrite").option("compression", "zstd")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(outPath)
  }
}
