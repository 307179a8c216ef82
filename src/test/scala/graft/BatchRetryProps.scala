package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.sinks.{BatchRetry, CopyEndpoint, CopyError}
import scala.collection.mutable.ArrayBuffer

/** Batch error-recovery invariants (copy-retry-batch.lisp:47-214):
  * whatever the error shape, every row is either committed exactly once or
  * rejected exactly once, and the rejected set is exactly the bad set. */
object BatchRetryProps extends Properties("BatchRetry") {

  /** Endpoint that rejects a fixed set of row payloads. Transactional:
    * a failed send keeps nothing. `withLine` reports the 1-based index of
    * the first bad row (PG CONTEXT style); otherwise a bare error (the FK
    * violation shape that forces bisection). */
  private final class Mock(bad: Set[Int], withLine: Boolean)
      extends CopyEndpoint {
    val committed = new ArrayBuffer[Int]
    var sends = 0
    def send(rows: Seq[Array[Byte]]): Unit = {
      sends += 1
      val ids = rows.map(b => new String(b, "UTF-8").trim.toInt)
      ids.zipWithIndex.find { case (id, _) => bad(id) } match {
        case Some((id, pos)) =>
          throw CopyError(if (withLine) Some(pos + 1) else None, s"bad $id")
        case None => committed ++= ids
      }
    }
  }

  private def run(n: Int, bad: Set[Int], withLine: Boolean) = {
    val rows = (0 until n).map(i => s"$i\n".getBytes("UTF-8"))
    val ep = new Mock(bad, withLine)
    val rejected = new ArrayBuffer[Int]
    val (s, r) = BatchRetry.sendWithRecovery(ep, rows,
      (row, _) => rejected += new String(row, "UTF-8").trim.toInt)
    (ep, rejected, s, r)
  }

  private val cases = for {
    n <- Gen.choose(1, 200)
    badFrac <- Gen.choose(0.0, 0.5)
    bad <- Gen.listOfN(n, Gen.double).map(_.zipWithIndex
      .collect { case (d, i) if d < badFrac => i }.toSet)
  } yield (n, bad)

  property("line-numbered errors: sent ⊎ rejected = all, rejected = bad") =
    forAll(cases) { case (n, bad) =>
      val (ep, rejected, s, r) = run(n, bad, withLine = true)
      Prop(ep.committed.toSet == (0 until n).toSet -- bad &&
        rejected.toSet == bad &&
        ep.committed.size + rejected.size == n &&
        s == n - bad.size && r == bad.size)
    }

  property("bare errors (bisect): sent ⊎ rejected = all, rejected = bad") =
    forAll(cases) { case (n, bad) =>
      val (ep, rejected, s, r) = run(n, bad, withLine = false)
      Prop(ep.committed.toSet == (0 until n).toSet -- bad &&
        rejected.toSet == bad &&
        s == n - bad.size && r == bad.size)
    }

  property("bisect round-trips are O(errors · log n), not O(n)") = Prop {
    val n = 4096
    val bad = Set(17, 1033, 4000)
    val (ep, _, _, _) = run(n, bad, withLine = false)
    // k errors cost ≈ 2·k·log2(n) sends; allow slack
    ep.sends <= 2 * bad.size * 13 + 10
  }

  property("25k all-bad rows do not overflow the stack") = Prop {
    val n = 25000
    val (ep, rejected, s, r) = run(n, (0 until n).toSet, withLine = true)
    ep.committed.isEmpty && rejected.size == n && s == 0 && r == n
  }

  property("rows are committed in original order") =
    forAll(cases) { case (n, bad) =>
      val (ep, _, _, _) = run(n, bad, withLine = true)
      Prop(ep.committed.toList == ep.committed.toList.sorted)
    }
}
