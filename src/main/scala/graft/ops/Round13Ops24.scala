package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 24: exact Shapley-value channel
  * attribution.
  */
object Round13Ops24 {

  /** EXACT Shapley attribution over the four pre-purchase touchpoint
    * channels (view=1, click=2, search=4, cart=8): the coalition
    * value v(S) counts converting users whose pre-first-purchase
    * touch set fits inside S, and each channel's Shapley value is the
    * weighted sum of its marginals. With n=4 the weights are
    * s!(3−s)! ∈ {6,2,2,6} over a common denominator 24, so φ·24 is
    * an exact BIGINT — no factorial floats anywhere. The corpus pass
    * is ONE aggregate to per-user bitmasks; everything after runs on
    * the 16-row subset lattice (broadcast joins). The efficiency
    * axiom Σφ = v(full) − v(∅) is pinned in Round13Spec24.
    */
  def analyticShapleyAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, sfDir)
    val firstP = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"ts").as("t0"))
    val bit = expr("CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 " +
      "WHEN 'search' THEN 4 WHEN 'cart' THEN 8 ELSE 0 END")
    val masks = firstP.join(ev, Seq("user_id"), "left")
      .filter($"ts" < $"t0")
      .select($"user_id", bit.as("b"))
      .groupBy($"user_id").agg(coalesce(bit_or($"b"), lit(0)).as("mask"))
    // users whose first event IS the purchase never appear above:
    // union them back with mask 0
    val allMasks = firstP.join(masks, Seq("user_id"), "left")
      .select(coalesce($"mask", lit(0)).as("mask"))
      .groupBy($"mask").agg(count(lit(1)).as("m"))
    val lattice = spark.range(0, 16).toDF("s")
    val v = lattice.join(broadcast(allMasks),
        expr("(mask & s) = mask"), "left")
      .groupBy($"s").agg(coalesce(sum($"m"), lit(0L)).as("v"))
      .localCheckpoint()
    val channels = Seq(("view", 1), ("click", 2), ("search", 4), ("cart", 8))
      .toDF("channel", "cbit")
    val w = expr("CASE bit_count(s) WHEN 0 THEN 6 WHEN 1 THEN 2 " +
      "WHEN 2 THEN 2 WHEN 3 THEN 6 END")
    broadcast(channels).join(v.select($"s", $"v".as("v_s")),
        expr("(s & cbit) = 0"))
      .join(broadcast(v.select($"s".as("s2"), $"v".as("v_sc"))),
        expr("s2 = (s | cbit)"))
      .select($"channel", (w * ($"v_sc" - $"v_s")).as("term"))
      .groupBy($"channel").agg(sum($"term").as("phi_x24"))
      .select($"channel", $"phi_x24",
        round($"phi_x24".cast(DoubleType) / lit(24.0), 6).as("phi"))
      .orderBy($"channel")
  }
}
