package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14 widening: cost-based-optimizer statistics surface.
  */
object Round14Ops {

  /** Register the six star-schema tables in the session catalog once
    * per dataset and ANALYZE them (table + key-column statistics).
    * Idempotent per (dataset, JVM): CREATE TABLE IF NOT EXISTS keyed
    * by the dataset fingerprint, ANALYZE only when the catalog has no
    * row count yet. Returns the registered name per logical table.
    */
  private[graft] def cboTables(spark: SparkSession, sfDir: String): Map[String, String] = {
    val key = ScaleTechniques.datasetKey(sfDir).toLowerCase
    val keyCol = Map(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "orders" -> "o_orderkey", "lineitem" -> "l_orderkey")
    keyCol.map { case (t, col) =>
      val name = s"graft_cbo_${key}_$t"
      synchronized {
        if (!spark.catalog.tableExists(name)) {
          spark.sql(s"CREATE TABLE IF NOT EXISTS $name USING parquet " +
            s"LOCATION '$sfDir/$t.parquet'")
          spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS $col")
        }
      }
      t -> name
    }
  }

  /** Cost-based-optimizer statistics surface (round-13 verdict task
    * 8): ANALYZE TABLE over the six star-schema tables, then surface
    * the CATALOG's own statistics — exact row count and the key
    * column's exact null/min/max — as the query result. At 100 TB
    * this is the op a pipeline runs after every major load: join
    * reordering on the 6-table star (see the PlanSpec CBO pin, which
    * proves the collected stats change the join order under
    * spark.sql.cbo.joinReorder.enabled) is only as good as these
    * numbers, and the oracle cross-checks them against direct
    * aggregation of the data — a mis-ANALYZEd table would fail hash
    * compare. The stats rows come from the catalog metadata, not a
    * data scan (ANALYZE already paid that, once per dataset).
    */
  def scaleCboStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val names = cboTables(spark, sfDir)
    val keyCol = Map(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "orders" -> "o_orderkey", "lineitem" -> "l_orderkey")
    val rows = names.toSeq.sortBy(_._1).map { case (t, name) =>
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name))
      val st = meta.stats.getOrElse(sys.error(s"no stats on $name"))
      val cs = st.colStats(keyCol(t))
      def asLong(v: Option[Any]): Long = v.get.toString.toLong
      (t, keyCol(t), st.rowCount.get.toLong,
        cs.nullCount.get.toLong, asLong(cs.min), asLong(cs.max))
    }
    spark.createDataFrame(rows)
      .toDF("tbl", "key_col", "n_rows", "n_nulls", "min_key", "max_key")
      .orderBy($"tbl")
  }
}
