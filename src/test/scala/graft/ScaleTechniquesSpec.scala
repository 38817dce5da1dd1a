package graft

import graft.ops.ScaleTechniques
import org.scalatest.funsuite.AnyFunSuite

/** materializeOnce artifact GC: a version bump must reap the previous
  * version's published dirs even when the _vN segment rides MID-key
  * (name_vN_<datasetKey>) — the round-13 trailing-only strip never
  * fired for that shape and ivf_index_v3 dirs stranded forever
  * (round-17 fix). Unrelated stems must survive.
  */
class ScaleTechniquesSpec extends AnyFunSuite {

  private def publish(key: String): java.io.File = {
    ScaleTechniques.materializeOnce(key) { tmp =>
      new java.io.File(tmp).mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmp, "_SUCCESS"), Array.emptyByteArray)
    }
    new java.io.File(s"/tmp/graft_mat/$key")
  }

  test("version bump reaps the previous version's dir for the same dataset, spares others") {
    val hexA = "00000000aaaa"; val hexB = "00000000bbbb"
    val v1 = publish(s"gcspec_index_v1_sfX_$hexA")
    val v1other = publish(s"gcspec_index_v1_sfY_$hexB")
    val unrelated = publish(s"gcspec_other_v1_sfX_$hexA")
    assert(v1.exists() && v1other.exists() && unrelated.exists())
    val v2 = publish(s"gcspec_index_v2_sfX_$hexA")
    assert(v2.exists(), "new version publishes")
    assert(!v1.exists(), "same-dataset previous version reaped")
    assert(v1other.exists(),
      "other dataset's dir survives: only the same dataset's stem rolls")
    assert(unrelated.exists(), "unrelated stem survives")
    // fingerprint roll on the same stem+version reaps the old fingerprint
    val v2roll = publish(s"gcspec_index_v2_sfX_$hexB")
    assert(v2roll.exists() && !v2.exists(),
      "fingerprint roll reaps the previous fingerprint's dir")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    Seq(v1other, unrelated, v2roll).foreach(rm)
  }
}
