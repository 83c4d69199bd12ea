package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §B).
  *
  * Mirrors the reference's source-discovery step
  * (`Runner.java:54-63` — directory walk + suffix filter): here the
  * "catalog" is a directory of `<table>.parquet` files and Spark's
  * `InMemoryFileIndex` does the listing. At 100 TB each table would be
  * a multi-file parquet dataset; nothing below assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Required engine setting for the `events` table: its `ts` column is
    * parquet TIMESTAMP(NANOS), which Spark 4 rejects by default; it must
    * read as a long of epoch-nanoseconds (µs derive via `ts DIV 1000` —
    * double division would lose precision above 2^53). The shipped
    * session builders (Verify/Bench/tests) set it at build time; this
    * fallback covers a caller-provided session, set ONCE and only if the
    * caller hasn't chosen a value (a query constructor must not
    * silently flip a session-wide conf the caller pinned).
    */
  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events" &&
        !org.apache.spark.sql.graft.Shim.confExplicitlySet(spark, NanosConf))
      spark.conf.set(NanosConf, "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
