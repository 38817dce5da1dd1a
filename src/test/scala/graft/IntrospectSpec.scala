package graft

import org.apache.spark.graft.GraftIntrospect
import org.scalatest.funsuite.AnyFunSuite

/** Pins the org.apache.spark.graft.GraftIntrospect shim — the only
  * code in the repo touching private[spark] members (JvmDrift's state
  * counters and SpillSpec's listener drain). A Spark upgrade that
  * moves any of those members should fail HERE, not deep inside a
  * 10-minute drift sweep.
  */
class IntrospectSpec extends AnyFunSuite with SparkFixture {

  test("introspection counters read sane values around a shuffle") {
    import spark.implicits._
    val sc = spark.sparkContext
    // run one real shuffle so the counters have something to count
    val n = Tables.orders(spark, sf).groupBy($"o_orderstatus").count().count()
    assert(n > 0)
    GraftIntrospect.drainListenerBus(sc)
    val shuffles = GraftIntrospect.shuffleCount(sc)
    assert(shuffles >= 0, "MapOutputTrackerMaster must be readable")
    val (blocks, storageBytes) = GraftIntrospect.blockStats(sc)
    assert(blocks >= 0 && storageBytes >= 0)
    assert(GraftIntrospect.droppedEvents(sc) === 0,
      "fixture session must not be dropping listener events")
  }
}
