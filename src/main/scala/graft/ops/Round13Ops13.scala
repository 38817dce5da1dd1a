package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 13: clickstream path mining, code-vs-prose
  * scoring for corpus filtering, and the broadcast/sort-merge join
  * strategy switch.
  */
object Round13Ops13 {

  /** Top user journeys: the first four event types of each user-day,
    * joined into a path string, counted corpus-wide — the "what do
    * people actually do first" table. Ordering inside a user-day is
    * (ts, event_id) so replays are byte-stable; the path build is one
    * keyed window (user-day partitions), the count one aggregate.
    * Top-15 with a full deterministic tiebreak.
    */
  def analyticTopPaths(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"d").orderBy($"ts", $"event_id")
    events(spark, sfDir)
      .select($"user_id", to_date($"ts").as("d"), $"ts", $"event_id",
        $"event_type")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 4)
      .groupBy($"user_id", $"d")
      .agg(array_sort(collect_list(struct($"rn", $"event_type"))).as("seq"))
      .select(expr(
        "array_join(transform(seq, x -> x.event_type), '>')").as("path"))
      .groupBy($"path")
      .agg(count(lit(1)).as("n_journeys"))
      .orderBy($"n_journeys".desc, $"path")
      .limit(15)
  }

  /** Code-vs-prose scoring — the corpus filter that keeps Python out
    * of a prose training mix (or finds it for a code mix). Three
    * exact integer signals per document (symbol characters, code
    * keywords, line-initial indentation) scored as
    * 3·keywords + symbols/4 + 2·indents in integer math, then
    * aggregated per language: docs, mean score (6 dp), and the share
    * over a fixed threshold. One projection pass, language-bounded
    * output.
    */
  def textCodeScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sym = size(expr("regexp_extract_all(text, '[{}()\\\\[\\\\];=<>]', 0)"))
      .cast(LongType)
    val kw = size(expr(
      "regexp_extract_all(text, '\\\\b(def|class|return|import|void|int)\\\\b', 0)"))
      .cast(LongType)
    val ind = size(expr("regexp_extract_all(text, '\\\\n(    |\\\\t)', 0)"))
      .cast(LongType)
    documents(spark, sfDir)
      .select($"lang", sym.as("sym"), kw.as("kw"), ind.as("ind"))
      .select($"lang",
        (lit(3L) * $"kw" + expr("sym div 4") + lit(2L) * $"ind").as("score"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"score").as("s"),
        sum(when($"score" >= 20, 1L).otherwise(0L)).as("n_codey"))
      .select($"lang", $"n_docs",
        round($"s".cast(DoubleType) / $"n_docs", 6).as("mean_score"),
        $"n_codey")
      .orderBy($"lang")
  }

  /** Broadcast vs sort-merge strategy switch on the same join: under
    * the default threshold the nation dim broadcasts; with the
    * threshold disabled the planner falls back to a shuffle join —
    * Round13Spec13 pins BOTH plans and this op returns the
    * (identical) aggregate from the broadcast path. The knob every
    * 100 TB job tunes first, demonstrated as a first-class operator.
    */
  def scaleJoinStrategySwitch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    customer(spark, sfDir)
      .join(nation(spark, sfDir), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"n_name")
  }
}
