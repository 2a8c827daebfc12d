package graft.app

import graft.reference.Alert
import graft.functions.IpFunctions

/** Downstream action for confirmed alerts — the reference's
  * `GenerateRule()` stub + log line (hha.py:239–242, 248–249) behind
  * an interface so deployments can emit firewall rules, tickets, etc.
  */
trait RuleSink {
  def emit(alert: Alert): Unit
}

/** Log-line sink matching the reference's output shape (hha.py:239–241). */
final class LogRuleSink(out: String => Unit = Console.out.println) extends RuleSink {
  def emit(a: Alert): Unit = {
    val ip = IpFunctions.ipv4Render(a.dstIp)
    out(s"Generate Rule for type protocol ${a.typeProto} " +
      s"number protocol ${a.numProtocol} ip = $ip baseline = ${a.baseline}")
  }
}

/** Buffering sink for tests and batch post-processing. */
final class CollectingRuleSink extends RuleSink {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Alert]
  def emit(a: Alert): Unit = buf.synchronized { buf += a }
  def alerts: Seq[Alert] = buf.synchronized { buf.toSeq }
}
