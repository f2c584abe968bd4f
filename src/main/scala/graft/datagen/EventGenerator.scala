package graft.datagen

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.util.Random

/** Deterministic synthetic event generator mirroring the reference's
  * `data_generator/data_generator.py`: weighted event types, business rules
  * (login-required events always carry a user, views can be anonymous,
  * guest sessions), 30-minute session buckets, controlled anomaly
  * injection, and atomic CSV drops (temp file + rename) so the streaming
  * file source never sees partial files.
  *
  * Seeded — the same (seed, batch) always produces the same rows, which is
  * what makes generator-driven streaming tests reproducible.
  */
final case class GenEvent(
    eventId: Long,
    ts: String,
    userId: Option[Long],
    eventType: String,
    value: Option[Double],
    props: String) {
  def csvLine: String =
    s"$eventId,$ts,${userId.map(_.toString).getOrElse("")},$eventType," +
      s"${value.map(_.toString).getOrElse("")},$props"
}

class EventGenerator(
    seed: Long = 42L,
    anomalyRate: Double = 0.05,
    nUsers: Int = 50,
    guestRate: Double = 0.2) {

  /** Reference-style weighted distribution (views dominate). */
  val typeWeights: Seq[(String, Double)] = Seq(
    "view" -> 0.55, "click" -> 0.25, "purchase" -> 0.10,
    "signup" -> 0.05, "error" -> 0.05)

  /** Event types that must have a logged-in user. */
  val loginRequired: Set[String] = Set("purchase", "signup")

  private val cum: Seq[(String, Double)] = {
    var acc = 0.0
    typeWeights.map { case (t, w) => acc += w; (t, acc) }
  }

  private def pickType(rng: Random): String = {
    val x = rng.nextDouble()
    cum.find { case (_, c) => x <= c }.map(_._1).getOrElse(cum.last._1)
  }

  /** One batch of events; ids are unique across batches for a generator
    * lifetime (batch major).
    */
  def batch(batchIdx: Int, n: Int, baseTs: String = "2024-01-10 10:00:00"): Seq[GenEvent] = {
    val rng = new Random(seed ^ (batchIdx.toLong * 0x9e3779b97f4a7c15L))
    val base = java.sql.Timestamp.valueOf(baseTs).getTime
    (0 until n).map { i =>
      val id = batchIdx.toLong * n + i + 1
      val t = pickType(rng)
      // business rule: login-required events always have a user; others
      // may be guests
      val user: Option[Long] =
        if (loginRequired(t)) Some(rng.nextInt(nUsers).toLong)
        else if (rng.nextDouble() < guestRate) None
        else Some(rng.nextInt(nUsers).toLong)
      val ts = new java.sql.Timestamp(base + batchIdx * 60000L + i * 100L)
      val value = t match {
        case "purchase" => 5.0 + rng.nextInt(300) + rng.nextInt(100) / 100.0
        case "click" | "view" => rng.nextInt(50).toDouble
        case _ => 0.0
      }
      val clean = GenEvent(id, ts.toString, user, t, Some(value), "{}")
      if (rng.nextDouble() < anomalyRate) injectAnomaly(clean, rng) else clean
    }
  }

  /** Reference anomaly classes: negative value, extreme value, missing
    * user on a login-required event, null value.
    */
  private def injectAnomaly(e: GenEvent, rng: Random): GenEvent =
    rng.nextInt(4) match {
      case 0 => e.copy(value = Some(-math.abs(e.value.getOrElse(1.0))))
      case 1 => e.copy(value = Some(401.0 + rng.nextInt(1000)))
      case 2 => e.copy(eventType = "purchase", userId = None)
      case _ => e.copy(value = None)
    }

  val csvHeader = "event_id,ts,user_id,event_type,value,props"

  /** Atomic CSV drop: write a temp file, then ATOMIC_MOVE into the watched
    * directory (reference `data_generator.py:201-219`).
    */
  def writeCsvAtomic(dir: Path, name: String, events: Seq[GenEvent]): Path = {
    val tmp = Files.createTempFile("graft-gen", ".tmp")
    Files.write(tmp, (csvHeader +: events.map(_.csvLine)).mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }
}
