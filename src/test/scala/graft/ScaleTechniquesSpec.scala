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

  test("a version-looking segment INSIDE the dataset dirname never aliases stems") {
    // round-17 advisory: the strip-anywhere form normalized _vN_
    // segments in the datasetKey's directory-name portion too, so the
    // same artifact over dataset dirs `evts_v2_x` and `evts_x` shared
    // a stem and publishing one REAPED the other's live artifact. Only
    // the artifact's own (first) version segment may normalize.
    val a = publish(s"gcspec_feat_v1_evts_v2_x_00000000cccc")
    val b = publish(s"gcspec_feat_v1_evts_x_00000000dddd")
    assert(a.exists() && b.exists(),
      "artifacts over distinct dataset dirs coexist even when one " +
        "dirname contains a version-looking segment")
    // the artifact version bump still reaps ONLY its own dataset's dir
    val a2 = publish(s"gcspec_feat_v2_evts_v2_x_00000000cccc")
    assert(a2.exists() && !a.exists() && b.exists(),
      "version bump reaps its own dataset's previous version only")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    Seq(b, a2).foreach(rm)
  }
}
