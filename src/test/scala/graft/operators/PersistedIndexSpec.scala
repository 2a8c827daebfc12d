package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The ONE contract every [[PersistedIndex]] implementation must
  * honor, exercised through the shared trait so no family can drift
  * (VERDICT r10 ask #6 — st23's round-9 compaction gap and round
  * 10's rewrite-staleness hole were each a verb one index had and
  * another lacked):
  *
  *   create  → probe sees the base;          staleFiles is empty
  *   append  → probe sees the new landing;   staleFiles is empty
  *   compact → probe answer BIT-IDENTICAL;   (layout-only verb)
  *   rewrite a base file in place → staleFiles names exactly it
  *
  * The probe is index-specific (a box scan, a key probe, a merged
  * sketch, a fingerprint count) — the lifecycle is not.
  */
class PersistedIndexSpec extends AnyFunSuite with SparkTestSession {

  /** One base table all six index kinds can serve: doc_id (bloom
    * key, dedup id, vector id), text (dedup corpus), month_sec
    * (sketch month), x (zone dimension), emb (ivfpq vector).
    * Single-file landings so file↔batch is deterministic; returns
    * (tablePath, landings).
    */
  private def emb(i: Int): Seq[Float] =
    (0 until 8).map(t => ((i * 13 + t * 7) % 97) / 97.0f - 0.5f)

  private def writeBase(root: String): (String, Seq[Seq[String]]) = {
    val s = spark; import s.implicits._
    val table = s"$root/base"
    val landings = (0 until 3).map { b =>
      val before = ZoneMap.dataFiles(s, table).toSet
      (b * 100 until b * 100 + 100).map { i =>
        (i.toLong, (0 until 8).map(t => s"tok${(i * 7 + t) % 23}").mkString(" "),
          (i / 100).toLong * 2592000L, i.toLong, emb(i))
      }.toDF("doc_id", "text", "month_sec", "x", "emb")
        .coalesce(1).write.mode("append").parquet(table)
      ZoneMap.dataFiles(s, table).filterNot(before).toSeq
    }
    (table, landings)
  }

  private def landBatch4(table: String): Seq[String] = {
    val s = spark; import s.implicits._
    val before = ZoneMap.dataFiles(s, table).toSet
    (300 until 350).map { i =>
      (i.toLong, (0 until 8).map(t => s"tok${(i * 7 + t) % 23}").mkString(" "),
        3L * 2592000L, i.toLong, emb(i))
    }.toDF("doc_id", "text", "month_sec", "x", "emb")
      .coalesce(1).write.mode("append").parquet(table)
    ZoneMap.dataFiles(s, table).filterNot(before).toSeq
  }

  private def rewriteInPlace(target: String, df: DataFrame): Unit = {
    val tmp = graft.core.Scratch.dir("pidx_rewrite")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tmp).getFileSystem(conf)
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).getOrElse(fail("no part file"))
    val dst = new Path(target)
    fs.delete(dst, false)
    assert(FileUtil.copy(fs, part, fs, dst, false, conf))
  }

  /** (name, build the index over tablePath, probe: a deterministic
    * index-specific digest that must survive compaction bit-for-bit
    * and reflect appends).
    */
  private def families(root: String, table: String)
      : Seq[(String, PersistedIndex, (SparkSession, PersistedIndex) => Seq[String])] = {
    val kmvMerge = udaf(new graft.functions.KmvMergeAggregator(64))
    Seq(
      ("zonemap",
        ZoneMapIndex(table, Seq("x"), s"$root/zm"),
        (s, _) => ZoneMap.readPruned(s, table, s"$root/zm",
            Seq(ZoneMap.Range("x", 120, 320)))
          .select("doc_id").collect().map(_.getLong(0)).sorted.map(_.toString).toSeq),
      ("bloom",
        BloomIndex(table, "doc_id", s"$root/bm", m = 4096, k = 4),
        (s, _) => FileBloom.readPruned(s, table, s"$root/bm", "doc_id",
            Seq(lit(42L), lit(155L), lit(333L)))
          .select("doc_id").collect().map(_.getLong(0)).sorted.map(_.toString).toSeq),
      ("sketch",
        MonthlySketchIndex(table, "month_sec", "doc_id", s"$root/sk", k = 64),
        (s, _) => SketchIndex.read(s, s"$root/sk")
          .groupBy("month_sec").agg(kmvMerge(col("sk")).as("sk"))
          .collect()
          .map(r => s"${r.getLong(0)}:${r.getSeq[Long](1).mkString(",")}")
          .sorted.toSeq),
      ("dedup",
        MinhashDedupIndex(table, "text", "doc_id", "pidx_dedup",
          s"$root/dd", buckets = 4),
        (s, idx) => {
          // content() follows the compaction generations for us
          val c = idx.content(s)
          Seq(c.count().toString,
            c.select("doc_id").distinct().count().toString)
        }),
      ("perceptual",
        PerceptualHashIndex(table, "text", "doc_id", s"$root/ph"),
        (s, idx) => {
          val p = idx.asInstanceOf[PerceptualHashIndex]
          // content count first so the digest reflects appends even
          // when the new landing adds no near-dup pair
          Seq(p.content(s).count().toString, p.reps(s).count().toString) ++
            p.pairs(s).orderBy("doc_a", "doc_b").collect()
              .map(r => s"${r.getLong(0)}<${r.getLong(1)}#${r.getLong(4)}")
              .toSeq
        }),
      ("ivfpq",
        IvfPqIndex(table, s"$root/ivf", m = 2, subDim = 4, sampleSize = 4,
          idCol = "doc_id", vecCol = "emb"),
        (s, idx) => {
          val probes = s.read.parquet(table)
            .filter(col("doc_id").isin(50L, 250L)).select("doc_id", "emb")
          // content count first, so the digest REFLECTS appends even
          // when no appended vector cracks the probes' top-3
          idx.content(s).count().toString +:
            idx.asInstanceOf[IvfPqIndex].probe(s, probes, k = 3, nprobe = 2)
              .orderBy("probe_id", "rnk").collect()
              .map(r => s"${r.getLong(0)}>${r.getLong(1)}@${r.getLong(2)}#${r.getLong(3)}")
              .toSeq
        })
    )
  }

  test("create → append → compact → rewrite: the shared lifecycle holds for all six") {
    val s = spark
    val root = graft.core.Scratch.dir("pidx")
    val (table, landings) = writeBase(root)

    val fams = families(root, table)
    fams.foreach { case (name, idx, probe) =>
      withClue(s"[$name] ") {
        idx.create(s)
        assert(idx.staleFiles(s).isEmpty, "fresh index reported staleness")
        assert(probe(s, idx).nonEmpty)
        assert(idx.content(s).count() > 0)
      }
    }

    // one landing, appended through every index via the SAME verb
    val batch4 = landBatch4(table)
    assert(batch4.size === 1)
    val afterAppend = fams.map { case (name, idx, probe) =>
      withClue(s"[$name] ") {
        idx.append(s, batch4)
        assert(idx.staleFiles(s).isEmpty, "append left staleness behind")
        val p = probe(s, idx)
        name -> p
      }
    }.toMap
    // the zone/bloom probes overlap batch 4's ids on purpose
    assert(afterAppend("zonemap").contains("300"))
    assert(afterAppend("bloom").contains("333"))

    // compaction is layout-only: every probe answer bit-identical
    fams.foreach { case (name, idx, probe) =>
      withClue(s"[$name] ") {
        idx.compact(s)
        assert(probe(s, idx) === afterAppend(name),
          "compaction changed a probe answer")
      }
    }

    // the external rewrite: batch 1's file changes under its name
    val victim = landings(1).head
    rewriteInPlace(victim, {
      val sess = s; import sess.implicits._
      (100 until 157).map { i =>
        (i.toLong + 90000L, s"rewritten text $i", 9L * 2592000L,
          i.toLong + 90000L, emb(i + 41))
      }.toDF("doc_id", "text", "month_sec", "x", "emb")
    })
    val victimCanon = new Path(victim).toUri.getPath
    fams.foreach { case (name, idx, _) =>
      withClue(s"[$name] ") {
        assert(idx.staleFiles(s) === Seq(victimCanon),
          "staleness check missed the in-place rewrite")
      }
    }

    // re-CREATE describes the new base and clears the signal: the
    // skipping indexes rebuild their stats rows, and the contribution
    // indexes RESET their provenance sidecar — an appended sidecar
    // would report the old base's fingerprints as phantom staleness
    // forever
    fams.foreach { case (name, idx, probe) =>
      withClue(s"[$name] ") {
        idx.create(s)
        assert(idx.staleFiles(s).isEmpty,
          "re-create left phantom staleness behind")
        assert(probe(s, idx).nonEmpty)
      }
    }
  }
}
