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

  test("dhash60OfBytes matches the sampled-comparison definition and is " +
    "robust to uniform rescaling") {
    // empty payload fingerprints to 0; a monotone-nonincreasing signal
    // sets no bits
    assert(Multimodal.dhash60OfBytes(Array.empty) === 0L)
    assert(Multimodal.dhash60OfBytes(Array[Byte](9, 9, 9, 9)) === 0L)
    // definition check against a direct re-computation
    def reference(bytes: Array[Byte]): Long =
      if (bytes.isEmpty) 0L
      else (0 until 60).map { i =>
        val p = bytes(((i.toLong * bytes.length) / 61L).toInt) & 0xff
        val c = bytes((((i + 1).toLong * bytes.length) / 61L).toInt) & 0xff
        if (c > p) 1L << i else 0L
      }.sum
    val rnd = new scala.util.Random(91L)
    (1 to 20).foreach { _ =>
      val bytes = Array.fill(1 + rnd.nextInt(300))(rnd.nextInt(128).toByte)
      assert(Multimodal.dhash60OfBytes(bytes) === reference(bytes))
    }
    // unsigned compare: byte 0x80 (-128 signed) must read as 128 > 127
    val hi = Array.tabulate[Byte](122)(i => if (i < 61) 127 else 0x80.toByte)
    assert(Multimodal.dhash60OfBytes(hi) !== 0L)
    // the perceptual property x91's fixture stands on: a nearest-
    // neighbor upscale keeps the sampled grid (hence the fingerprint)
    // EXACTLY identical — for any length and any integer factor
    // (the floor(floor(kx)/k) = floor(x) identity)
    (1 to 15).foreach { _ =>
      val img = MediaRecord(1L,
        Array.fill(1 + rnd.nextInt(400))(rnd.nextInt(128).toByte), "m", "l", "s")
      Seq(2, 3, 5).foreach { k =>
        assert(Multimodal.dhash60OfBytes(Multimodal.upscaleStub(img, k).media) ===
          Multimodal.dhash60OfBytes(img.media),
          s"upscale x$k must preserve the fingerprint (len ${img.media.length})")
      }
    }
    assert(Multimodal.upscaleStub(
      MediaRecord(1L, Array[Byte](1, 2), "m", "l", "s"), 3).media.toSeq ===
      Seq[Byte](1, 1, 1, 2, 2, 2))
  }

  test("dhashGridOfBytes: 1x61 degenerates to dhash60OfBytes bit-for-bit, " +
    "matches the row-major definition, and any grid survives upscaling") {
    val rnd = new scala.util.Random(916L)
    // the grid-form reference, re-derived independently: D = rows·cols
    // samples at ⌊j·len/D⌋, within-row adjacent comparisons, row-major
    // bit order
    def reference(bytes: Array[Byte], rows: Int, cols: Int): Long =
      if (bytes.isEmpty) 0L
      else {
        val d = rows.toLong * cols
        (0 until rows).flatMap { r =>
          (0 until cols - 1).map { c =>
            val p = bytes((((r.toLong * cols + c) * bytes.length) / d).toInt) & 0xff
            val n = bytes((((r.toLong * cols + c + 1) * bytes.length) / d).toInt) & 0xff
            if (n > p) 1L << (r * (cols - 1) + c) else 0L
          }
        }.sum
      }
    assert(Multimodal.dhashGridOfBytes(Array.empty, 4, 16) === 0L)
    (1 to 20).foreach { _ =>
      val bytes = Array.fill(1 + rnd.nextInt(300))(rnd.nextInt(256).toByte)
      // degenerate 1x61 == the 1-D form (the x91/x21 oracle convention)
      assert(Multimodal.dhashGridOfBytes(bytes, 1, 61) ===
        Multimodal.dhash60OfBytes(bytes))
      Seq((4, 16), (2, 31), (6, 11)).foreach { case (r, c) =>
        assert(Multimodal.dhashGridOfBytes(bytes, r, c) === reference(bytes, r, c),
          s"grid ${r}x$c diverged from the definition (len ${bytes.length})")
      }
    }
    // the upscale identity holds for EVERY grid, not just 1x61: a
    // nearest-neighbor xk rendition samples the original's own grid
    (1 to 15).foreach { _ =>
      val img = MediaRecord(1L,
        Array.fill(1 + rnd.nextInt(400))(rnd.nextInt(256).toByte), "m", "l", "s")
      Seq(2, 3, 5).foreach { k =>
        val up = Multimodal.upscaleStub(img, k).media
        Seq((4, 16), (1, 61), (2, 31)).foreach { case (r, c) =>
          assert(Multimodal.dhashGridOfBytes(up, r, c) ===
            Multimodal.dhashGridOfBytes(img.media, r, c),
            s"grid ${r}x$c upscale x$k changed the fingerprint")
        }
      }
    }
    // dial guard: >63 bits would overflow the signed-long convention
    intercept[IllegalArgumentException](
      Multimodal.dhashGridOfBytes(Array[Byte](1), 8, 16))
  }

  test("banding completeness holds over GRID fingerprints too: banded " +
    "candidates equal brute force on 4x16-hashed payloads") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(4816L)
    // payload corpus with planted renditions (same grid hash) and
    // light corruptions (a few flipped samples → small hamming)
    val rows = (0 until 60).flatMap { i =>
      val base = Array.fill(64 + rnd.nextInt(200))(rnd.nextInt(256).toByte)
      val up = Multimodal.upscaleStub(MediaRecord(i.toLong, base, "m", "l", "s"), 2).media
      val corrupt = up.clone(); corrupt(rnd.nextInt(corrupt.length)) = 0x7f
      Seq((i.toLong, base), (i.toLong + 1000L, up), (i.toLong + 2000L, corrupt))
    }
    val hashed = rows.map { case (id, b) =>
      (id, Multimodal.dhashGridOfBytes(b, 4, 16)) }
    val got = Multimodal.perceptualNearDupPairs(
        hashed.toDF("doc_id", "ph"), "doc_id", "ph")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val repOf = hashed.groupBy(_._2).map { case (h, g) => h -> g.map(_._1).min }
    val star = hashed.filter { case (id, h) => repOf(h) != id }
      .map { case (id, h) => (repOf(h), id, 0L) }.toSet
    val reps = repOf.toSeq.map { case (h, id) => (id, h) }
    val brute = (for {
      (ia, ha) <- reps; (ib, hb) <- reps if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got === (brute ++ star))
    // the renditions really did collapse (every upscale shares its
    // base's hash — the invariance at work inside the operator)
    assert(hashed.count { case (id, _) => id < 1000 } ===
      hashed.filter { case (id, _) => id < 1000 }.map(_._2).size)
    (0 until 60).foreach { i =>
      assert(hashed.find(_._1 == i).get._2 === hashed.find(_._1 == i + 1000L).get._2)
    }
  }

  test("perceptual near-dup: banded candidates equal brute force on planted " +
    "hamming neighbors, and exact-dup groups stay linear (star edges)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(191L)
    // distinct random 60-bit hashes, each with a planted partner 1-3
    // bit-flips away, plus one exact-dup group of 5 sharing hash h0
    val mask = (1L << 60) - 1
    val bases = Seq.fill(40)(rnd.nextLong() & mask).distinct
    val planted = bases.zipWithIndex.map { case (h, i) =>
      var p = h
      (0 to i % 3).foreach(_ => p ^= 1L << rnd.nextInt(60))
      p
    }
    val h0 = bases.head
    val rows = (bases ++ planted).zipWithIndex.map { case (h, i) => (i.toLong, h) } ++
      (100L to 104L).map(id => (id, h0))
    val fps = rows.toDF("doc_id", "dhash60")
    val got = Multimodal.perceptualNearDupPairs(fps, "doc_id", "dhash60")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    // brute force over the same exact-collapse semantics: reps = min id
    // per hash; star edges + all rep pairs within hamming 3
    val repOf = rows.groupBy(_._2).map { case (h, g) => h -> g.map(_._1).min }
    val star = rows.filter { case (id, h) => repOf(h) != id }
      .map { case (id, h) => (repOf(h), id, 0L) }.toSet
    val reps = repOf.toSeq.map { case (h, id) => (id, h) }
    val brute = (for {
      (ia, ha) <- reps; (ib, hb) <- reps if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got === (brute ++ star),
      "banded pairs must equal brute force (pigeonhole completeness) plus star edges")
    // linearity: the 6-member exact group (h0's rep + ids 100..104)
    // contributes exactly 5 star edges, never the 15-pair clique
    val h0Members = rows.filter(_._2 == h0).map(_._1).toSet
    val within = got.filter(p => h0Members(p._1) && h0Members(p._2))
    assert(within.size === h0Members.size - 1,
      s"exact-dup group must stay linear: $within")
  }
}
