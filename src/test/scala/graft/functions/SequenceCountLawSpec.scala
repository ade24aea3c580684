package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Law behind `agg_sequence_count`'s windowed rewrite: for the 2-step
  * pattern, the CH sequenceCount automaton (arm on view when unarmed,
  * match+disarm on purchase when armed, restart after each match)
  * counts exactly the purchases whose immediately preceding
  * view-or-purchase event is a view. Proven here by simulation against
  * the boundary formula on random event strings — the Spark query is
  * the boundary formula verbatim.
  */
class SequenceCountLawSpec extends AnyFunSuite {

  private def automaton(events: Seq[String]): Int = {
    var armed = false
    var m = 0
    events.foreach {
      case "view" => if (!armed) armed = true
      case "purchase" => if (armed) { m += 1; armed = false }
      case _ => ()
    }
    m
  }

  private def boundary(events: Seq[String]): Int = {
    val vp = events.filter(e => e == "view" || e == "purchase")
    vp.zip("" +: vp).count { case (cur, prev) =>
      cur == "purchase" && prev == "view"
    }
  }

  test("boundary formula == CH automaton on arbitrary event sequences") {
    val ev = Gen.oneOf("view", "purchase", "click", "signup", "error")
    val prop = Prop.forAllNoShrink(Gen.listOf(ev)) { events =>
      boundary(events) == automaton(events)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
