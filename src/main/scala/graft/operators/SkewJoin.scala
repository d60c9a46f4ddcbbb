package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically skewed keys.
  *
  * AQE's runtime skew-join split handles moderate skew by splitting
  * oversized shuffle partitions, but a single dominant key still lands on
  * one reducer per split boundary. Salting spreads it structurally: every
  * left row gets a deterministic salt in [0, salt), the right side is
  * replicated once per salt value, and the join key becomes
  * (keys..., salt) — one hot key now occupies `salt` reducers.
  *
  * Result is row-identical to the unsalted inner join (each left row
  * carries exactly one salt; the right side covers all salts). Cost: the
  * right side shuffles `salt`× — use for joins where the right side is the
  * smaller relation but too big to broadcast, and skew measurement (e.g.
  * a `groupBy(keys).count` top-k) shows heavy hitters.
  */
object SkewJoin {

  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(salt)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
