package graft.operators

import graft.SparkSpec

/** mm_audio_fingerprint: the delta-sign fingerprint is verified on known
  * byte vectors (monotone energies → all-ones prefix, flat/short → 0),
  * and the distributed decode + grouping recounts from a serial fold over
  * the corpus payloads.
  */
class AudioFpSpec extends SparkSpec {

  test("known vectors: monotone energies set the delta-sign bits") {
    // 3 full frames with strictly increasing energies -> bits 0 and 1
    val up = (Array.fill(8)(1) ++ Array.fill(8)(2) ++ Array.fill(8)(3))
      .map(_.toByte)
    assert(Multimodal.stubAudioFp(up) == 3L)
    val down = (Array.fill(8)(3) ++ Array.fill(8)(2) ++ Array.fill(8)(1))
      .map(_.toByte)
    assert(Multimodal.stubAudioFp(down) == 0L)
    assert(Multimodal.stubAudioFp(Array.fill(7)(9.toByte)) == 0L,
      "no full frame -> empty print")
    val flat = Array.fill(32)(5.toByte)
    assert(Multimodal.stubAudioFp(flat) == 0L, "ties are not increases")
    // a partial trailing frame must not contribute
    val partial = up ++ Array.fill(3)(99.toByte)
    assert(Multimodal.stubAudioFp(partial) == 3L)
  }

  test("distributed fingerprint groups recount serially") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
    val fps = docs.map { case (id, t) =>
      (id, Multimodal.stubAudioFp(t.getBytes("UTF-8")))
    }
    val byFp = fps.groupBy(_._2)
    val want = fps.map { case (id, fp) =>
      val g = byFp(fp)
      (id, fp, g.map(_._1).min, g.length.toLong)
    }.sortBy(_._1).toSeq

    val got = Multimodal.audioFingerprint(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    assert(fps.map(_._2).distinct.length > 1, "degenerate: one print")
    assert(want.exists(_._4 > 1L), "calibration: no duplicate groups found")
  }
}
