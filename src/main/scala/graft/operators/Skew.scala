package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §5: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join split handles skewed SORT-MERGE joins when the
  * skewed side's partitions are splittable; it cannot help when the
  * hot key's rows must still meet ONE copy of the matching build row
  * in one task tree, i.e. when a handful of join-key values dominate
  * the fact side. Salting rewrites the join so each hot key fans out
  * over nSalts sub-keys, with the (small) right side replicated once
  * per salt — turning a 5-task shuffle into a 5×nSalts-task shuffle.
  */
object Skew {

  /** Salted equi-join of a skewed `big` side against a replicable
    * `dim` side on `key`. The big side gets a salt in [0, nSalts)
    * hashed from its physical row POSITION (partition id + in-partition
    * ordinal via monotonically_increasing_id), NOT from row content —
    * a hot key whose rows are identical (or share a low-cardinality
    * payload) would hash content onto one or two salt values and
    * collapse right back onto the partitions salting exists to avoid.
    * Position hashing spreads even bit-identical duplicate rows
    * uniformly. The dim side is exploded ×nSalts, and the join runs on
    * (key, salt) — so each formerly-hot shuffle key now spreads over
    * nSalts partitions. Output equals the plain equi-join (the salt
    * column is internal and dropped).
    *
    * The join is pinned to sort-merge (`hint("merge")`): saltedJoin's
    * contract is a dim too large (or a planner too conservative) to
    * broadcast — if broadcast is on the table, use `broadcast(dim)`
    * instead and skip the salt entirely. Replication cost is
    * |dim| × nSalts rows of shuffle, the price of the fan-out. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
                 nSalts: Int = 32): DataFrame = {
    require(nSalts >= 1, s"nSalts=$nSalts must be >= 1")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until nSalts).map(i => lit(i)): _*)))
    salted.join(replicated.hint("merge"), Seq(key, "__salt")).drop("__salt")
  }
}
