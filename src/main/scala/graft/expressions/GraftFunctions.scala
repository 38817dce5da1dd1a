package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for the engine's native Catalyst functions.
  *
  * Two paths:
  *  - [[GraftFunctions.ensureRegistered]] — direct session-registry
  *    injection, used by the ops themselves (works on any session,
  *    including the driver-owned ones in Verify/Bench);
  *  - [[GraftExtensions]] — the `spark.sql.extensions` entry point for
  *    cluster deployments (`--conf spark.sql.extensions=graft.expressions.GraftExtensions`).
  */
object GraftFunctions {

  private[expressions] val dotInfo = new ExpressionInfo(
    classOf[FloatDotProduct].getName, "graft_dot")

  private[expressions] def dotBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_dot takes exactly 2 arguments")
    FloatDotProduct(children(0), children(1))
  }

  private[expressions] val isectInfo = new ExpressionInfo(
    classOf[SortedLongIntersectSize].getName, "graft_isect")

  private[expressions] def isectBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_isect takes exactly 2 arguments")
    SortedLongIntersectSize(children(0), children(1))
  }

  private[expressions] val shinglesInfo = new ExpressionInfo(
    classOf[ShingleHashes].getName, "graft_shingles")

  private[expressions] def shinglesBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_shingles takes (text, n)")
    val n = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_shingles n must be an int literal, got $other")
    }
    ShingleHashes(children(0), n)
  }

  private[expressions] val bandsigsInfo = new ExpressionInfo(
    classOf[MinHashBandSigs].getName, "graft_bandsigs")

  private[expressions] def bandsigsBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 3, "graft_bandsigs takes (th, rows, bands)")
    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_bandsigs $what must be an int literal, got $other")
    }
    MinHashBandSigs(children(0),
      intLit(children(1), "rows"), intLit(children(2), "bands"))
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(
      (FunctionIdentifier("graft_dot"), dotInfo, dotBuilder _),
      (FunctionIdentifier("graft_isect"), isectInfo, isectBuilder _),
      (FunctionIdentifier("graft_shingles"), shinglesInfo, shinglesBuilder _),
      (FunctionIdentifier("graft_bandsigs"), bandsigsInfo, bandsigsBuilder _)
    ).foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}

/** `SparkSessionExtensions` hook injecting the native functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // reuse the guarded builders so bad arity fails analysis cleanly
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      GraftFunctions.dotInfo, GraftFunctions.dotBuilder _))
    ext.injectFunction((FunctionIdentifier("graft_isect"),
      GraftFunctions.isectInfo, GraftFunctions.isectBuilder _))
    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      GraftFunctions.shinglesInfo, GraftFunctions.shinglesBuilder _))
    ext.injectFunction((FunctionIdentifier("graft_bandsigs"),
      GraftFunctions.bandsigsInfo, GraftFunctions.bandsigsBuilder _))
  }
}
