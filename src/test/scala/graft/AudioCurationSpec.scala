package graft

import graft.operators.ImageHash
import org.scalatest.funsuite.AnyFunSuite

/** q239 end-to-end audio curation pipeline gates (r16 — the
  * ImageCurationSpec discipline on the audio member of the
  * q230/q234/q239 modality triple): stage counts against an
  * independent plain-Scala replay, the planted structures recovered
  * exactly, and the read-back shard count equal to the rank
  * arithmetic. */
class AudioCurationSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val docs = Tables.documents(spark, sf001)
  private lazy val corpus = ImageHash.syntheticCurationAudio(docs).collect()
  private lazy val stats = ImageHash.audioHashStats(
    ImageHash.syntheticCurationAudio(docs)).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("corpus: all seven lossless audio carriers appear among originals; siblings WAV") {
    val origs = corpus.filter(_.asset_id % 2 == 0)
    def fmtBits(b: Array[Byte]): Int = b(34) & 0xff // WAV fmt bits field
    def sniff(b: Array[Byte]): String =
      new String(b, 0, 4, "US-ASCII") match {
        case "fLaC" => "flac"
        case ".snd" => "au"
        case "FORM" => new String(b, 8, 4, "US-ASCII").toLowerCase
        case "RIFF" => s"wav${fmtBits(b)}"
        case m      => m
      }
    assert(origs.map(a => sniff(a.bytes)).toSet ==
      Set("wav16", "flac", "aiff", "aifc", "au", "wav24", "wav32"),
      s"carriers: ${origs.map(a => sniff(a.bytes)).toSet}")
    assert(corpus.filter(_.asset_id % 2 == 1)
      .forall(a => sniff(a.bytes) == "wav16"), "siblings must be canonical WAV")
  }

  test("quieted docs (id % 7 == 0) read rms_w far below the band; others inside") {
    val byId = stats.map(s => s._1 -> s._3).toMap
    byId.foreach { case (id, rms) =>
      if ((id / 2) % 7 == 0)
        assert(rms < 16384, s"asset $id: quieted rms $rms must sit below the band")
      else
        assert(rms >= 16384 && rms < 49152, s"asset $id: normal rms $rms must sit inside")
    }
  }

  test("stage counts match an independent plain-Scala replay; shards = ceil(n/64)") {
    val hm = stats.map(s => s._1 -> s._2).toMap
    val ids = hm.keys.toSeq.sorted
    val drop = (for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(hm(i) ^ hm(j)) <= 3
    } yield j).toSet
    val s1 = stats.filter(s => !drop.contains(s._1))
    val s2 = s1.filter(s => s._3 >= 16384 && s._3 < 49152)
    val expShards = math.ceil(s2.length / 64.0).toLong
    val report = ImageHash.audioCurationPipeline(
      ImageHash.audioHashStats(ImageHash.syntheticCurationAudio(docs)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(report == Seq(
      ("0_raw", stats.length.toLong, 0L),
      ("1_audio_dedup", s1.length.toLong, 0L),
      ("2_quality_sample", s2.length.toLong, 0L),
      ("3_shards_written", s2.length.toLong, expShards)), s"report: $report")
    assert(drop.nonEmpty, "sf0.001 must plant at least one recoverable pair")
    assert(s1.length > s2.length, "sf0.001 must plant at least one quieted doc")
  }

  test("carrier invariance holds for the un-quieted docs (the q164 pin argument)") {
    // un-quieted docs carry the q164 corpus's exact PCM (same @i salt
    // space), so their energy hashes must equal the all-WAV corpus's
    val wav = ImageHash.audioEnergyHashes(ImageHash.syntheticWav(docs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cur = stats.map(s => s._1 -> s._2).toMap
    val unquiet = cur.keys.filter(id => (id / 2) % 7 != 0)
    assert(unquiet.nonEmpty)
    unquiet.foreach { id =>
      assert(cur(id) == wav(id),
        s"asset $id: carrier cycle moved an un-quieted hash")
    }
  }
}
