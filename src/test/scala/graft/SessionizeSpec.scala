package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Sessionize
import graft.queries.Sessionize.{Ev, Session}

/** The batch sessionizer must STREAM: one hot key (bot traffic) is the
  * classic task-OOM at scale, so the session builder may hold only the
  * open session's counters, never a user's event array. Proven here by
  * feeding a lazy generator and observing how much input the iterator
  * pulls before emitting — a buffering implementation (it.toArray) would
  * consume all 10M events first.
  */
class SessionizeSpec extends AnyFunSuite {

  private val Min31 = 31L * 60 * 1000 * 1000 // > the 30-min gap

  test("hot user: first session emits after O(1) consumed events, not the whole group") {
    var consumed = 0L
    val total = 10000000L
    val evs = new Iterator[Ev] {
      override def hasNext: Boolean = consumed < total
      override def next(): Ev = { consumed += 1; Ev(1L, consumed * Min31, 1.0) }
    }
    val it = Sessionize.sessionIterator(evs)
    val first = it.next()
    assert(first.n_events == 1 && first.user_id == 1L)
    assert(consumed <= 3,
      s"consumed $consumed of $total events before the first session — the group was buffered")
    (1 to 5).foreach(_ => it.next())
    assert(consumed <= 9)
  }

  test("correctness: gap splits, user changes, trailing flush") {
    val evs = Iterator(
      Ev(1, 0, 1.0), Ev(1, 60L * 1000000, 2.5),        // session 0: 2 events
      Ev(1, 60L * 1000000 + Min31, 0.25),              // gap -> session 1
      Ev(2, 5, 10.0),                                  // new user
      Ev(3, 7, 0.01), Ev(3, 7 + Min31, 0.02))          // user 3: two sessions
    val got = Sessionize.sessionIterator(evs).toList
    assert(got == List(
      Session(1, 0, 0, 2, 350),
      Session(1, 1, 60L * 1000000 + Min31, 1, 25),
      Session(2, 0, 5, 1, 1000),
      Session(3, 0, 7, 1, 1),
      Session(3, 1, 7 + Min31, 1, 2)))
  }

  test("empty input and single event") {
    assert(Sessionize.sessionIterator(Iterator.empty).toList == Nil)
    assert(Sessionize.sessionIterator(Iterator(Ev(9, 42, 1.5))).toList ==
      List(Session(9, 0, 42, 1, 150)))
  }
}
