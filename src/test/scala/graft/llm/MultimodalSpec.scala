package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  test("decodeStub is a deterministic pure function of the bytes") {
    val r = MediaRecord(7L, "abcd".getBytes("UTF-8"), "text/plain", "en", "src")
    val f = Multimodal.decodeStub(r)
    assert(f.doc_id === 7L)
    assert(f.byte_len === 4L)
    assert(f.checksum === 97L + 98 + 99 + 100)
    assert(f.byte_hist(6) === 4L)       // all of a-d have high nibble 6
    assert(f.byte_hist.sum === 4L)
    assert(f.n_frames === 1)
    val g = Multimodal.decodeStub(r)
    assert(f.checksum === g.checksum && f.byte_hist.sameElements(g.byte_hist))
  }

  test("n_frames samples one frame per started 64-byte chunk") {
    def frames(n: Int) =
      Multimodal.decodeStub(MediaRecord(1L, new Array[Byte](n), "m", "l", "s")).n_frames
    assert(frames(1) === 1)
    assert(frames(64) === 1)
    assert(frames(65) === 2)
  }

  test("resizeStub keeps every k-th byte; resize runs through the seam") {
    val r = MediaRecord(1L, Array[Byte](10, 20, 30, 40, 50, 60, 70), "m", "l", "s")
    val half = Multimodal.resizeStub(r, 2)
    assert(half.media.toSeq === Seq[Byte](10, 30, 50, 70))
    assert(Multimodal.resizeStub(r, 1).media.toSeq === r.media.toSeq)
    assert(Multimodal.resizeStub(r.copy(media = Array.empty), 3).media.isEmpty)

    val s = spark; import s.implicits._
    val docs = Seq((1L, "abcdefgh", "en", "a", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val small = Multimodal.resize(Multimodal.fromDocuments(docs), 4).collect().head
    assert(new String(small.media, "UTF-8") === "ae")
  }

  test("extractFeatures runs partition-batched over a documents frame") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "hello world", "en", "a", 11L),
      (2L, "bonjour", "fr", "b", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.map(f => (f.doc_id, f.byte_len)).toSeq === Seq((1L, 11L), (2L, 7L)))
    assert(feats.forall(_.mime === "application/octet-stream"))
  }
}
