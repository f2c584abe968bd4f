package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM spec for the shared session-memo cache shape (VERDICT r14 #5:
  * every plan-keyed memo must be bounded, KMeans' included — all three now
  * build through [[BoundedLru]], so the bound is specced once here).
  */
class BoundedLruSpec extends AnyFunSuite {

  test("eviction holds the size at the bound, dropping the eldest") {
    val m = BoundedLru[Int, String](max = 32)
    (0 until 40).foreach(i => m.put(i, s"v$i"))
    assert(m.size == 32)
    // the eight eldest insertions are gone, the newest 32 remain
    assert((0 until 8).forall(i => !m.containsKey(i)))
    assert((8 until 40).forall(i => m.containsKey(i)))
  }

  test("access order: a read refreshes an entry past younger ones") {
    val m = BoundedLru[Int, Int](max = 4)
    (0 until 4).foreach(i => m.put(i, i))
    m.get(0) // 0 is now the most recently used
    m.put(4, 4) // evicts 1 (eldest by access), not 0
    assert(m.containsKey(0) && !m.containsKey(1))
    assert(Seq(2, 3, 4).forall(m.containsKey(_)))
  }

  test("computeIfAbsent memoizes: one computation per resident key") {
    val m = BoundedLru[String, Int](max = 8)
    var computes = 0
    def lookup(k: String): Int =
      m.computeIfAbsent(k, _ => { computes += 1; k.length })
    assert(lookup("plan-a") == 6 && lookup("plan-a") == 6)
    assert(computes == 1)
    assert(lookup("b") == 1 && computes == 2)
  }

  test("computeIfAbsent is safe under concurrent callers") {
    val m = BoundedLru[Int, Int](max = 32)
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { _ =>
      new Thread(() =>
        (0 until 16).foreach(k =>
          m.computeIfAbsent(k, _ => { computes.incrementAndGet(); k * 2 })))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(computes.get == 16) // synchronizedMap computeIfAbsent: once per key
    assert((0 until 16).forall(k => m.get(k) == k * 2))
  }
}
