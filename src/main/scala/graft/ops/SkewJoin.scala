package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys: the large (skewed) side gets a random salt
  * in [0, salts), the small side is replicated once per salt value, and the
  * join key becomes (key, salt) — a hot key's rows spread over `salts`
  * reducers instead of melting one. Use when AQE's skew splitting isn't
  * enough (e.g. one key is >> a single partition even after splitting).
  *
  * The salt is deterministic (hash of a row-unique column) so results are
  * reproducible.
  */
object SkewJoin {

  /** Inner-join `big` with `small` on big(bigKey) == small(smallKey),
    * salting `big` by `bigUnique` (any column unique-ish per row). */
  def saltedInnerJoin(
      big: DataFrame, bigKey: String, bigUnique: String,
      small: DataFrame, smallKey: String,
      salts: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(col(bigUnique)), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    salted.join(replicated,
      salted(bigKey) === replicated(smallKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
