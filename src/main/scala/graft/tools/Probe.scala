package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    println("SCHEMA-EVENTS: " + ev.schema.simpleString)
    println("ROWS: " + ev.selectExpr("event_id", "ts", "ts DIV 1000 as us").limit(3).collect().mkString(" ; "))
    println("CONV: " + spark.sql("SELECT cast(conv(substr(md5('abc'),1,15),16,10) as bigint)").collect().mkString)
    println("HEX: " + spark.range(1).select(hex(encode(lit("abc"), "UTF-8"))).collect().mkString)
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    println("SCHEMA-ORDERS: " + ord.schema.simpleString)
    println("REGIONS: " + spark.read.parquet("/root/testdata/sf0.001/region.parquet").collect().mkString(" ; "))
    spark.stop()
  }
}
