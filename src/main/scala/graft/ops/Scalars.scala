package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function surface (SURVEY §2g) — string, datetime, math,
  * conditional, array (higher-order), map, JSON, struct expressions.
  *
  * All codegen-friendly built-ins (no UDFs): each query stays inside a
  * single WholeStageCodegen span over the scan. Dialect notes for the
  * DuckDB oracle live in Oracle.scala.
  */
object Scalars {

  def fnString(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    customer(spark, sfDir)
      .select($"c_custkey",
        substring($"c_name", 1, 8).as("sub8"),
        upper($"c_mktsegment").as("seg_up"),
        lower($"c_name").as("name_lo"),
        trim(concat(lit("  "), $"c_mktsegment", lit("  "))).as("seg_trim"),
        lpad($"c_name", 25, "*").as("name_pad"),
        concat_ws("|", $"c_mktsegment", $"c_name").as("joined"),
        expr("replace(c_name, 'Customer', 'Cust')").as("name_repl"),
        size(split($"c_name", "#")).cast(LongType).as("n_parts"),
        $"c_name".like("%42%").as("has42"),
        regexp_extract($"c_name", "[0-9]+", 0).as("digits"))
      .orderBy($"c_custkey")
  }

  def fnDateTime(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderdate",
        date_trunc("month", $"o_orderdate").as("month_start"),
        year($"o_orderdate").cast(LongType).as("yr"),
        month($"o_orderdate").cast(LongType).as("mo"),
        // Spark dayofweek: 1=Sunday..7=Saturday (oracle: dow+1)
        dayofweek($"o_orderdate").cast(LongType).as("dow"),
        ($"o_orderdate" + expr("INTERVAL '3' MONTH")).as("plus3m"),
        datediff($"o_orderdate", ntz("1995-01-01 00:00:00"))
          .cast(LongType).as("days_since"),
        last_day($"o_orderdate").as("month_end"))
      .orderBy($"o_orderkey")
  }

  def fnMath(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey",
        // divide by a 10-coprime constant: the exact quotient of a 2dp
        // value can then never terminate on a 4dp rounding tie, where
        // Spark (decimal HALF_UP) and DuckDB (binary) disagree
        round($"o_totalprice" / 7, 4).as("ratio4"),
        abs(-$"o_totalprice").as("abs_neg"),
        // ceil/floor: Spark yields LONG for double input, DuckDB DOUBLE
        // — normalize both to DOUBLE
        ceil($"o_totalprice").cast(DoubleType).as("ceil_p"),
        floor($"o_totalprice").cast(DoubleType).as("floor_p"),
        round(sqrt($"o_totalprice"), 6).as("sqrt6"),
        round(log($"o_totalprice"), 6).as("ln6"),
        round(log10($"o_totalprice"), 6).as("log10_6"),
        pow($"o_custkey" % 10, 2).as("pow2"),
        pmod($"o_orderkey" - 100, lit(7)).as("pm7"),
        expr("o_orderkey div 7").as("idiv7"),
        ($"o_orderkey" / 7).as("fdiv7"))
      .orderBy($"o_orderkey")
  }

  def fnConditional(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey",
        when($"o_totalprice" > 300000, "high")
          .when($"o_totalprice" > 100000, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif($"o_orderstatus", lit("P")), lit("pending")).as("status_c"),
        least($"o_totalprice", lit(250000.0)).as("capped"),
        greatest($"o_custkey" % 7, $"o_custkey" % 5, lit(2L)).as("g"))
      .orderBy($"o_orderkey")
  }

  /** Higher-order functions over the 64-dim embedding arrays; all
    * element math goes through exact float→double widening so both
    * engines compute identical IEEE doubles.
    */
  def fnArray(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = $"embedding".cast(ArrayType(DoubleType))
    embeddings(spark, sfDir)
      .select($"vec_id",
        size($"embedding").cast(LongType).as("dim"),
        element_at(d, 1).as("first_d"),
        array_max(d).as("max_d"),
        round(aggregate(d, lit(0.0), (acc, x) => acc + x), 6).as("sum_d"),
        size(filter(d, x => x > 0)).cast(LongType).as("n_pos"),
        // flattened to scalar doubles (still exercising transform /
        // sort_array): the driver harness cannot hash ndarray cells
        element_at(transform(slice(d, 1, 3), x => x * 2), 1).as("x2_1"),
        element_at(transform(slice(d, 1, 3), x => x * 2), 2).as("x2_2"),
        element_at(transform(slice(d, 1, 3), x => x * 2), 3).as("x2_3"),
        element_at(sort_array(slice(d, 1, 4)), 1).as("srt_1"),
        element_at(sort_array(slice(d, 1, 4)), 4).as("srt_4"))
      .orderBy($"vec_id")
  }

  /** str_to_map over a synthesized k=v string; output is unpacked into
    * sorted key/value arrays (never a raw map — iteration order is
    * engine-specific, SURVEY §7d).
    */
  def fnMap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .withColumn("m", expr(
        "str_to_map(concat('status=', o_orderstatus, ',prio=', split_part(o_orderpriority, '-', 1)), ',', '=')"))
      .withColumn("k", sort_array(map_keys($"m")))
      .select($"o_orderkey",
        // joined strings, not arrays — driver-harness-hashable
        array_join($"k", ",").as("keys"),
        array_join(transform($"k", k => element_at($"m", k)), ",").as("vals"),
        element_at($"m", "status").as("status_val"))
      .orderBy($"o_orderkey")
  }

  def fnJson(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val js = concat(lit("{\"u\":"), $"user_id", lit(",\"t\":\""), $"event_type", lit("\"}"))
    events(spark, sfDir)
      .withColumn("js", js)
      .withColumn("parsed",
        from_json($"js", StructType(Seq(
          StructField("u", LongType), StructField("t", StringType)))))
      .select($"event_id",
        get_json_object($"props", "$.k").cast(IntegerType).as("k"),
        $"js",
        $"parsed.u".as("u"),
        $"parsed.t".as("t"))
      .orderBy($"event_id")
  }

  def fnStruct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val st = struct($"o_orderkey".as("k"), $"o_orderstatus".as("s"))
    orders(spark, sfDir)
      .select($"o_orderkey",
        st.getField("s").as("s_field"),
        to_json(st).as("js"),
        (st < struct(lit(5000L).as("k"), lit("Z").as("s"))).as("cmp"))
      .orderBy($"o_orderkey")
  }
}
