package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salting. AQE's skew-join split handles most cases
  * at runtime (and our sessions enable it), but a pathologically hot key —
  * one key holding a double-digit percentage of a 100 TB fact table —
  * still serializes on one task pair. Salting fixes the shape statically:
  * the skewed side scatters each row into one of `salt` sub-keys by a
  * deterministic hash of `scatterCol`, the other side replicates each row
  * `salt` times, and the join key becomes (key, salt) — one hot partition
  * becomes `salt` even ones, at the cost of replicating the smaller side.
  */
object Skew {

  /** Equi-join `skewed ⋈ other ON key` with `salt`-way scatter.
    * `scatterCol` must be a column of the skewed side (any well-distributed
    * one — a line number, an id); using a hash keeps the plan deterministic
    * where a rand() salt would not be. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 scatterCol: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val sl = skewed.withColumn("_graft_salt",
      pmod(hash(col(scatterCol)), lit(salt)))
    val sr = other.withColumn("_graft_salt",
      explode(lit((0 until salt).toArray)))
    sl.join(sr, Seq(key, "_graft_salt")).drop("_graft_salt")
  }
}
