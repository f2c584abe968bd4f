package graft.datagen

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's generator business-rule tests
  * (`tests/test_data_generator.py`): field rules, anomaly injection,
  * weighted distribution, id uniqueness, atomic CSV format.
  */
class EventGeneratorSpec extends AnyFunSuite {

  private val gen = new EventGenerator(seed = 7L)

  test("same (seed, batch) is reproducible") {
    assert(gen.batch(3, 50) == new EventGenerator(seed = 7L).batch(3, 50))
    assert(gen.batch(3, 50) != gen.batch(4, 50))
  }

  test("event ids are unique across batches") {
    val ids = (0 until 5).flatMap(b => gen.batch(b, 100)).map(_.eventId)
    assert(ids.distinct.size == ids.size)
  }

  test("clean login-required events always carry a user") {
    val clean = new EventGenerator(seed = 1L, anomalyRate = 0.0)
    val evts = (0 until 10).flatMap(b => clean.batch(b, 200))
    assert(evts.filter(e => clean.loginRequired(e.eventType)).forall(_.userId.nonEmpty))
  }

  test("views can be anonymous (guest sessions exist)") {
    val clean = new EventGenerator(seed = 1L, anomalyRate = 0.0)
    val views = (0 until 5).flatMap(b => clean.batch(b, 200)).filter(_.eventType == "view")
    assert(views.exists(_.userId.isEmpty) && views.exists(_.userId.nonEmpty))
  }

  test("weighted distribution roughly holds (views dominate)") {
    val evts = (0 until 20).flatMap(b => gen.batch(b, 500))
    val freq = evts.groupBy(_.eventType).view.mapValues(_.size.toDouble / evts.size).toMap
    assert(freq("view") > 0.45 && freq("view") < 0.65)
    assert(freq("purchase") < 0.2)
  }

  test("anomaly rate is honored approximately") {
    val hot = new EventGenerator(seed = 2L, anomalyRate = 0.5)
    val evts = (0 until 10).flatMap(b => hot.batch(b, 200))
    val anomalous = evts.count(e =>
      e.value.isEmpty || e.value.exists(v => v < 0 || v > 400) ||
        (hot.loginRequired(e.eventType) && e.userId.isEmpty))
    val rate = anomalous.toDouble / evts.size
    assert(rate > 0.3 && rate < 0.6)
  }

  test("zero anomaly rate produces only valid rows") {
    val clean = new EventGenerator(seed = 3L, anomalyRate = 0.0)
    val evts = (0 until 5).flatMap(b => clean.batch(b, 200))
    assert(evts.forall(e => e.value.exists(v => v >= 0 && v <= 400)))
  }

  test("atomic CSV drop writes header + one line per event") {
    val dir = Files.createTempDirectory("gen-spec")
    val evts = gen.batch(0, 10)
    gen.writeCsvAtomic(dir, "b0.csv", evts)
    val lines = Files.readAllLines(dir.resolve("b0.csv"))
    assert(lines.size == 11)
    assert(lines.get(0) == gen.csvHeader)
    assert(lines.get(1).split(",", -1).length == 6)
  }
}
