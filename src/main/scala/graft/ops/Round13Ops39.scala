package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 39: one Borůvka MST round and a
  * fixed-point additive Holt–Winters fit — both all-integer, both
  * with cell-exact DuckDB mirrors (truncating division `div`/`//`
  * agrees between engines on negatives, verified −7//5 = −1).
  */
object Round13Ops39 {

  /** One Borůvka round on the part–supplier graph (edge weight = min
    * line-price cents per pair): every node picks its lightest
    * incident edge (total order (w, neighbor) — no float, no tie
    * ambiguity), mutual picks dedup to an acyclic forest, so
    * components after the round = nodes − chosen edges. This is THE
    * scalable MST building block: each round is one groupBy-min +
    * one distinct, and rounds halve the component count, so log(n)
    * rounds suffice at any scale.
    */
  def graphBoruvkaRound(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = lineitem(spark, sfDir)
      .groupBy($"l_partkey".as("p"),
        ($"l_suppkey" + 10000000L).as("s"))
      .agg(min((money($"l_extendedprice") * 100).cast(LongType)).as("w"))
    val d = e.select($"p".as("node"), $"s".as("other"), $"w")
      .union(e.select($"s".as("node"), $"p".as("other"), $"w"))
    val pick = d.withColumn("rn", row_number().over(
        Window.partitionBy($"node").orderBy($"w", $"other")))
      .filter($"rn" === 1)
    val ch = pick.select(least($"node", $"other").as("lo"),
      greatest($"node", $"other").as("hi"), $"w").distinct()
    val c = ch.agg(count(lit(1)).as("n_chosen"), sum($"w").as("fw"))
    val nn = d.agg(countDistinct($"node").as("n_nodes"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    nn.crossJoin(broadcast(ne)).crossJoin(broadcast(c))
      .select($"n_nodes", $"n_edges", $"n_chosen".as("n_chosen_edges"),
        ($"n_nodes" - $"n_chosen").as("n_components_after"),
        $"fw".as("forest_weight_cents"))
  }

  /** Additive Holt–Winters (α=1/5, β=1/10, γ=1/5, weekly season) on
    * daily revenue, ENTIRELY in integer cents: the smoothing
    * fractions are exact rationals applied with truncating division,
    * so the 2000+-step recursion is bit-identical on both engines —
    * the fixed-point discipline that made graph_weighted_pagerank
    * possible, extended to a (level, trend, season[7]) state carried
    * through one runtime `aggregate` fold. Emits the 7-day-ahead
    * forecast; the oracle replays the same recursion as a recursive
    * CTE with a list-typed season column.
    */
  def tsHoltWintersAdditive(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val arr = orders(spark, sfDir)
      .groupBy($"o_orderdate".cast(DateType).as("d"))
      .agg(sum((money($"o_totalprice") * 100).cast(LongType)).as("c"))
      .agg(array_sort(collect_list(struct($"d", $"c"))).as("sc"))
      .select(expr("transform(sc, x -> x.c)").as("cs"))
      .select($"cs", size($"cs").cast(LongType).as("n"))
    val s7  = "aggregate(sequence(1, 7), CAST(0 AS BIGINT), (a, j) -> a + element_at(cs, j))"
    val s14 = "aggregate(sequence(8, 14), CAST(0 AS BIGINT), (a, j) -> a + element_at(cs, j))"
    val lNew = "(element_at(cs, i) - element_at(st.s, ((i - 1) % 7) + 1) + 4 * (st.l + st.t)) div 5"
    val fin = expr(s"""
      aggregate(
        sequence(8, CAST(n AS INT)),
        named_struct(
          'l', $s7 div 7,
          't', ($s14 - $s7) div 49,
          's', transform(sequence(1, 7), j ->
            element_at(cs, j) - ($s7 div 7))),
        (st, i) -> named_struct(
          'l', $lNew,
          't', ((($lNew) - st.l) + 9 * st.t) div 10,
          's', transform(sequence(1, 7), j ->
            IF(j = ((i - 1) % 7) + 1,
              (element_at(cs, i) - ($lNew) + 4 * element_at(st.s, j))
                div 5,
              element_at(st.s, j)))),
        st -> st)""")
    arr.select($"n", fin.as("fin"))
      .withColumn("h", explode(expr("sequence(1, 7)")))
      .select($"h".cast(LongType).as("h"),
        expr("fin.l + h * fin.t + element_at(fin.s, CAST(((n + h - 1) % 7) + 1 AS INT))")
          .as("forecast_cents"),
        $"fin.l".as("level_cents"), $"fin.t".as("trend_cents"))
      .orderBy($"h")
  }
}
