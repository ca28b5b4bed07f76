package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine deterministic numeric aggregation.
  *
  * `SUM(double)` is order-dependent (floating-point addition is not
  * associative), so a Spark partial/final hash aggregate and DuckDB's
  * single-threaded aggregate can legitimately differ in the last ulp —
  * enough to break the driver's hash compare. The fix used throughout this
  * library: cast each addend to an exact DECIMAL first (per-row double
  * arithmetic is IEEE-deterministic and bit-identical across engines; only
  * the *reduction* order varies), sum exactly in decimal, then cast the
  * final value back to double. The result is identical regardless of
  * partitioning, parallelism, or engine — which also means these queries
  * stay deterministic on a 1000-executor cluster, not just on local[32].
  *
  * Map-side partial aggregation still applies (decimal sums are
  * commutative), so this costs nothing in shuffle volume.
  *
  * Rejected faster alternative: summing `round(x*1e6)` as BIGINT is ~2×
  * faster at fixture scale (primitive long agg buffer vs the 128-bit
  * decimal buffer sum(DECIMAL(18,6)) forces), but an int64 micro-scaled
  * sum overflows at ~10^8 rows of ~1e5-valued addends — far below the
  * 100 TB target. Decimal-128 accumulation is the scale-safe choice;
  * integer micro-scaling is reserved for bounded-range OUTPUT values
  * (q43's centroid coordinates), never open-ended sums.
  */
object Det {
  /** Deterministic sum of a double expression: exact decimal accumulate,
    * double result. Scale 6 keeps the half-way rounding boundary far from
    * representable doubles in the fixture value ranges. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Deterministic arithmetic mean (dsum / row count). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** DuckDB-dialect SQL for [[dsum]]. */
  def sqlDsum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"

  /** DuckDB-dialect SQL for [[davg]]. */
  def sqlDavg(e: String): String = s"(${sqlDsum(e)} / COUNT(*))"

  /** The contract-rule-9 cross-engine hash bucket: first 16 md5 bits of
    * the key's string form, as an integer in [0, 65536). THE idiom for
    * splits/sampling thresholds (never xxhash64, which the oracle can't
    * reproduce); DuckDB mirror:
    * `CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 4) AS INTEGER)`.
    * Deterministic per key — stable under task retry, unlike `rand()`.
    * INT typed (the bucket range needs 17 bits): q62/q74 emit it as an
    * output column, so the type is part of the oracle schema. */
  def md5Bucket(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast(org.apache.spark.sql.types.IntegerType)
}
