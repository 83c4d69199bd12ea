package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generation compaction — the reconcile step the reference's data model
  * implies: Cassandra merges multiple SSTable generations of the same
  * table by taking, per (partition key, cell name), the cell with the
  * highest writeTime, with tombstones shadowing older live cells
  * (SURVEY.md §1; the reference reads exactly one generation,
  * `service/SSTableReader.java:79-107`, but the on-disk model it decodes
  * is the post-compaction contract this operator implements).
  *
  * Generations are derived deterministically from the `events` cell
  * model so the DuckDB oracle can replay the identical merge:
  * generation 0 is [[CellModel.cellStrings]]; generation 1 is an
  * overlay of updates (keys ≡ 2 mod 5: new value, +1h writeTime) and
  * cell tombstones (keys ≡ 4 mod 5: deletion at +1h).
  *
  * Scale shape: ONE shuffle, on (key, name) — `max(struct(...))` is a
  * hash aggregation with map-side partials, so co-located generations
  * (e.g. both read from the key-ordered sink format) combine before the
  * exchange. This is exactly how a 100 TB multi-generation merge wants
  * to run: no window over whole partitions, no sort, bounded state per
  * (key, name) group.
  */
object Compaction {

  private val HourUs = 3600000000L // writeTime is µs

  /** q53: newest-cell-wins merge of two generations with tombstone
    * shadowing. Output: the reconciled live cell set, tagged with the
    * generation each surviving cell came from.
    */
  def compact(spark: SparkSession, dir: String): DataFrame = {
    val gen0 = CellModel.cellStrings(spark, dir)
      .withColumn("gen", lit(0))
    val live0 = gen0.filter(col("kind") === "live")
    val updates = live0
      .filter(col("key").cast("long") % 5 === 2)
      .withColumn("value", concat(col("value"), lit("@2")))
      .withColumn("write_time", col("write_time") + HourUs)
      .withColumn("gen", lit(1))
    val tombstones = live0
      .filter(col("key").cast("long") % 5 === 4)
      .withColumn("value", lit(""))
      .withColumn("write_time", col("write_time") + HourUs)
      .withColumn("kind", lit("deleted"))
      .withColumn("gen", lit(1))
    gen0.unionByName(updates).unionByName(tombstones)
      .filter(!col("partition_deleted"))
      .groupBy(col("key"), col("name"))
      // lexicographic struct max == newest writeTime wins (generation as
      // tie-break; unique here since the overlay always bumps the time)
      .agg(max(struct(col("write_time"), col("gen"), col("kind"),
        col("value"))).as("w"))
      .filter(col("w.kind") === "live")
      .select(col("key"), col("name"), col("w.value").as("value"),
        col("w.write_time").as("write_time"), col("w.gen").as("gen"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_compact" -> compact)

  /** Oracle: identical generations, merged with a row_number window —
    * equivalent to the struct-max because (write_time, gen) is unique
    * within each (key, name) group.
    */
  private val compactSql =
    s"""WITH g0 AS (SELECT *, 0 AS gen FROM (${Core.cellsSql})),
       |upd AS (SELECT key, name, value || '@2' AS value,
       |          write_time + $HourUs AS write_time, kind,
       |          partition_deleted, 1 AS gen
       |        FROM g0 WHERE kind = 'live' AND CAST(key AS BIGINT) % 5 = 2),
       |del AS (SELECT key, name, '' AS value,
       |          write_time + $HourUs AS write_time, 'deleted' AS kind,
       |          partition_deleted, 1 AS gen
       |        FROM g0 WHERE kind = 'live' AND CAST(key AS BIGINT) % 5 = 4),
       |u AS (SELECT * FROM g0 UNION ALL SELECT key, name, value, write_time,
       |        kind, partition_deleted, gen FROM upd
       |      UNION ALL SELECT key, name, value, write_time, kind,
       |        partition_deleted, gen FROM del),
       |r AS (SELECT key, name, value, write_time, kind, gen,
       |        row_number() OVER (PARTITION BY key, name
       |          ORDER BY write_time DESC, gen DESC) AS rn
       |      FROM u WHERE NOT partition_deleted)
       |SELECT key, name, value, write_time, gen
       |FROM r WHERE rn = 1 AND kind = 'live'""".stripMargin

  val oracle: Map[String, String] = Map("q53_compact" -> compactSql)
}
