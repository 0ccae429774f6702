package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join utility for the 100 TB path. AQE's skew-join
  * handles most runtime skew (enabled by Sessions); explicit salting is
  * for the pathological case AQE can't split — a single join KEY so hot
  * that one task still owns it (e.g. a null-ish default FK, one
  * mega-tenant, the empty-string shingle).
  *
  * saltedJoin replicates the (small) right side `salt` ways and
  * scatters the left side's hot keys uniformly: left gets a random-ish
  * salt derived from a sibling column hash (deterministic — no rand(),
  * so retries/speculative tasks agree), right joins on every salt value.
  * Equivalent rows, `salt`× smaller max-task.
  */
object Skew {

  /** Inner equi-join on `key`, salted `salt` ways. `leftSaltSrc` is any
    * left column with per-row variation (an id) used to derive the
    * deterministic salt. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftSaltSrc: String, salt: Int = 16): DataFrame = {
    // fail fast, not mid-join: salt=0 is pmod-by-zero (an ANSI runtime
    // error deep in the stage; silently-empty output pre-ANSI), and a
    // pre-existing _salt column would be overwritten, joined on, and
    // dropped — corrupting both the join and the user's column
    require(salt >= 1, s"saltedJoin salt must be >= 1, got $salt")
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "saltedJoin: inputs must not carry a _salt column (reserved)")
    val l = left.withColumn("_salt",
      pmod(xxhash64(col(leftSaltSrc)), lit(salt)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
