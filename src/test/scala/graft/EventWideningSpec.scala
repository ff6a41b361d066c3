package graft

import org.apache.spark.sql.functions._

/** Round-10 widening gates, verified against independent derivations:
  * q158 (hourly gap-fill) against a driver-side Scala recomputation of
  * the LOCF semantics from the raw events, and q159 (stream-stream
  * interval join) against the equivalent batch join computed directly —
  * the same answer the DuckDB oracle asserts, derived without the
  * streaming machinery.
  */
class EventWideningSpec extends SparkSpec {

  private def registry(name: String) =
    SparkEntry.registry.find(_.name == name).getOrElse(fail(s"$name not registered"))

  test("q158_gap_fill matches a driver-side LOCF recomputation at sf0.001") {
    import spark.implicits._
    val got = registry("q158_gap_fill").run(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq

    // independent recomputation: raw (user, epoch-hour, value) triples,
    // grid + fill in plain Scala
    val raw = tables.events
      .select($"user_id", (unix_micros($"ts") / 3600000000L).cast("long").as("hr"),
        $"value")
      .as[(Long, Long, Double)].collect()
    val exp = raw.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, rows) =>
      val hourly = rows.groupBy(_._2).map { case (h, rs) => h -> rs.map(_._3).max }
      val (h0, h1) = (hourly.keys.min, hourly.keys.max)
      var lastV = 0.0
      var (nObs, sum) = (0L, BigDecimal(0))
      (h0 to h1).foreach { h =>
        hourly.get(h) match {
          case Some(v) => lastV = v; nObs += 1
          case None => ()
        }
        sum += BigDecimal(lastV).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      }
      val nHours = h1 - h0 + 1
      (u, nHours, nObs, nHours - nObs, sum.toDouble)
    }
    assert(got == exp)
  }

  test("q159_stream_stream_join equals the batch interval-join derivation") {
    import spark.implicits._
    val got = registry("q159_stream_stream_join").run(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq

    val e = tables.events.filter($"user_id" % 4 === 0)
    val a = e.select($"user_id".as("a_user"), unix_micros($"ts").as("a_us"),
      $"event_type".as("a_type"))
    val b = e.select($"user_id".as("b_user"), unix_micros($"ts").as("b_us"),
      $"event_id".as("b_id"))
    val exp = a.join(b, $"a_user" === $"b_user" &&
        $"b_us" > $"a_us" && $"b_us" <= $"a_us" + lit(600000000L))
      .groupBy($"a_type")
      .agg(count(lit(1)).as("n_pairs"), sum($"b_id").as("pair_checksum"))
      .orderBy($"a_type")
      .as[(String, Long, Long)].collect().toSeq
    assert(exp.map(_._2).sum > 0, "degenerate fixture: no pairs at sf0.001")
    assert(got == exp)
  }

  test("q160_scd2_history matches a driver-side run-length recomputation") {
    import spark.implicits._
    val got = registry("q160_scd2_history").run(spark, sfDir)
      .select($"user_id", $"interval_seq", $"state", $"valid_from",
        $"valid_to", $"n_events", $"is_current")
      .as[(Long, Long, String, String, Option[String], Long, Long)]
      .collect().toSeq

    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val raw = tables.events
      .filter($"user_id" % 8 === 0)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val exp = raw.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      // run-length encode consecutive equal states
      val runs = ordered.foldLeft(Vector.empty[(String, Long, Long)]) {
        case (acc, (_, us, _, tpe)) => acc.lastOption match {
          case Some((t, vf, n)) if t == tpe => acc.init :+ ((t, vf, n + 1))
          case _ => acc :+ ((tpe, us, 1L))
        }
      }
      runs.zipWithIndex.map { case ((tpe, vfUs, n), i) =>
        val vt = runs.lift(i + 1).map(r => fmt.format(
          java.time.Instant.ofEpochSecond(r._2 / 1000000L)))
        (u, (i + 1).toLong, tpe,
          fmt.format(java.time.Instant.ofEpochSecond(vfUs / 1000000L)),
          vt, n, if (vt.isEmpty) 1L else 0L)
      }
    }
    assert(got.nonEmpty && got == exp)
  }
}
