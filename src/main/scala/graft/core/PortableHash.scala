package graft.core

/** The engine's one portable row-hash idiom: first 8 hex chars of md5 read
  * as an int64. Identical bit-for-bit in Spark and DuckDB, which is what
  * makes hash-derived behavior (train/val/test splits, stratified sampling,
  * shingle keys, MinHash/SimHash word hashes) oracle-checkable — a rand()
  * or engine-native hash would be neither reproducible nor comparable.
  *
  * Both renderings live here so the Spark expression and its DuckDB oracle
  * cannot drift independently: widen the prefix in one place and every
  * caller's engine/oracle pair moves together.
  */
object PortableHash {

  /** Spark SQL fragment hashing the given expression to int64. */
  def spark(inner: String): String =
    s"CAST(conv(substring(md5($inner), 1, 8), 16, 10) AS BIGINT)"

  /** The same value in DuckDB SQL. */
  def duck(inner: String): String =
    s"('0x' || substring(md5($inner), 1, 8))::BIGINT"
}
