package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Inspector tap-session lifecycle: a drained key must be
  * distinguishable from an expired one (a poller slower than the idle
  * timeout reopens instead of polling a dead key forever).
  */
class InspectorSessionSpec extends AnyFunSuite {

  test("drainSession distinguishes expired key from empty buffer") {
    val ins = new Metrics.Inspector("p-expire", idleTimeoutMs = 50L)
    val key = ins.openSession()
    // live session, nothing buffered → Some(Nil), not None
    assert(ins.drainSession(key) == Some(Nil))
    ins.offer(Seq("""{"x":1}"""))
    assert(ins.drainSession(key) == Some(Seq("""{"x":1}""")))
    // idle past the timeout, then an offer sweep expires the session:
    // the slow poller must see None (tap died — reopen), never a
    // silent empty batch
    Thread.sleep(120)
    ins.offer(Seq("""{"x":2}"""))
    assert(!ins.sessionExists(key))
    assert(ins.drainSession(key).isEmpty)
    assert(ins.drainSession("never-opened").isEmpty)
  }

  test("session cap refuses the 65th concurrent tap") {
    val ins = new Metrics.Inspector("p-cap", maxSessions = 2, idleTimeoutMs = 60000L)
    ins.openSession(); ins.openSession()
    intercept[IllegalStateException](ins.openSession())
  }
}
