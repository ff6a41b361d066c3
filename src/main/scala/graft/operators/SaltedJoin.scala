package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join (SURVEY.md §4.3 "salted keys fallback").
  *
  * AQE's skew-join splitting handles most skew at runtime; salting is the
  * explicit fallback for pathologically hot keys (one key holding a large
  * fraction of a 100 TB fact table), or when AQE is unavailable (e.g.
  * inside some streaming microbatch plans).
  *
  * Mechanics: the fact side gets a deterministic per-row salt in
  * [0, factor); the dim side is exploded `factor` ways so every
  * (key, salt) bucket finds its dim row. The join key becomes (key, salt),
  * spreading a hot key over `factor` reducers. Row multiplication is
  * dim x factor — keep `factor` modest and the dim side small (the usual
  * skew shape: huge fact, compact dim).
  *
  * The salt derives from xxhash64 of the whole fact row (stable for a given
  * row, no RNG), so results are reproducible run to run.
  */
object SaltedJoin {

  def inner(
      fact: DataFrame,
      dim: DataFrame,
      factKey: Column,
      dimKey: Column,
      factor: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn(
      "__salt", pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(factor)))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__salt", col("__salt").cast("bigint"))
    saltedFact
      .join(saltedDim, factKey === dimKey && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
