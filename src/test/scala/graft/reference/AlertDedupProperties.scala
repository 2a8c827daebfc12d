package graft.reference

import org.scalacheck.{Gen, Prop, Properties}

/** Pure-JVM ScalaCheck properties of the alert layer (SURVEY.md §5.4:
  * "every alerted key is in the watch-list", "alert fires at most
  * once per TTL window").
  */
object AlertDedupProperties extends Properties("AlertDedup") {

  private val alertGen: Gen[Alert] = for {
    np <- Gen.chooseNum(0, 3)
    tp <- Gen.oneOf(11, 31, 32, 41, 42)
    ip <- Gen.chooseNum(1L, 20L)
  } yield Alert(np, tp, 100, ip)

  private val batchesGen: Gen[List[List[Alert]]] =
    Gen.listOfN(5, Gen.listOf(alertGen))

  private val watchGen: Gen[Set[Long]] =
    Gen.containerOf[Set, Long](Gen.chooseNum(1L, 20L))

  property("every emitted alert is watch-listed") =
    Prop.forAll(batchesGen, watchGen) { (batches, watch) =>
      val d = new AlertDedup(300L)
      batches.zipWithIndex.forall { case (batch, i) =>
        d.process(batch, watch.contains, now = 1000L + i * 10)
          .forall(a => watch.contains(a.dstIp))
      }
    }

  property("a key fires at most once per TTL window") =
    Prop.forAll(batchesGen) { batches =>
      val d = new AlertDedup(300L)
      val fires = batches.zipWithIndex.flatMap { case (batch, i) =>
        val now = 1000L + i * 10 // all batches inside one TTL window
        d.process(batch, _ => true, now)
          .map(a => (a.numProtocol, a.typeProto, a.dstIp))
      }
      fires.distinct == fires
    }

  property("after the TTL passes, the same key fires again") =
    Prop.forAll(alertGen) { a =>
      val d = new AlertDedup(300L)
      d.process(Seq(a), _ => true, 1000L).nonEmpty &&
        d.process(Seq(a), _ => true, 1299L).isEmpty &&
        d.process(Seq(a), _ => true, 1300L).nonEmpty
    }
}
