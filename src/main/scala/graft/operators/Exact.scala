package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The one overflow-loud exact-integer cast (SURVEY §4 engine-parity
  * discipline). Non-ANSI Spark WRAPS BIGINT sums silently and NULLs
  * decimal-cast overflow, while the DuckDB twins' HUGEINT arithmetic
  * errors loudly — the engines must fail the same way, so every exact
  * micro-unit pipeline surfaces overflow through this guard instead of
  * a silent null or wrap. One definition (r13 verdict #5: the per-
  * operator copies drifted in message spelling), uniform message.
  *
  * A NULL INPUT passes through as NULL instead of firing the guard
  * (r13 ADVICE: a (group, day) whose values are all NULL makes SUM()
  * NULL in BOTH engines — that is the shared no-data semantics, not an
  * overflow; raising there would fork behavior against the SQL twin,
  * which emits the NULL row).
  *
  * RESIDUAL HOLE, documented (r14 ADVICE): the NULL passthrough cannot
  * distinguish NULL-from-no-data from NULL-from-decimal-SUM-overflow.
  * Under ANSI mode — Spark 4's default, which [[graft.GraftSession]]
  * does not disable — there is no hole: the AGGREGATE itself throws
  * Spark's ARITHMETIC_OVERFLOW before this guard ever sees a value, so
  * both engines still fail loudly (DuckDB via HUGEINT error). Only a
  * deployment that explicitly sets `spark.sql.ansi.enabled=false` AND
  * sums past DECIMAL(38)'s 38 digits (≈1e29 micro-units through the
  * widest accumulator here — orders of magnitude past 100 TB of
  * micro-priced rows) would turn that overflow into a silent NULL row
  * where DuckDB errors. A count-based "group had non-NULL inputs but
  * SUM is NULL" probe could close it, but it would double every
  * guarded aggregate for a configuration the library never ships —
  * declared instead.
  */
private[graft] object Exact {

  /** `c` cast to BIGINT; overflow (cast nulls a non-null input) raises
    * `<op>: <what> overflowed BIGINT — re-scale the unit`; NULL input
    * stays NULL. */
  def guardedLong(op: String)(c: Column, what: String): Column =
    guardedCast(op, c, what, "long", "BIGINT")

  /** `c` cast to DECIMAL(18,0) (the widest window-safe accumulator both
    * engines sum exactly); same loud-overflow / NULL-passthrough
    * contract. */
  def guardedMicro(op: String)(c: Column, what: String): Column =
    guardedCast(op, c, what, "decimal(18,0)", "DECIMAL(18,0)")

  // try_cast, not cast: under ANSI (the Spark 4 default) a plain cast
  // throws Spark's CAST_OVERFLOW before the guard can name the operator
  // and the re-scale remedy; try_cast nulls the overflow in BOTH modes,
  // so the uniform message below is what a user always sees
  private def guardedCast(op: String, c: Column, what: String,
      typ: String, typName: String): Column =
    when(c.isNull, lit(null).cast(typ))
      .otherwise(coalesce(c.try_cast(typ),
        raise_error(lit(s"$op: $what overflowed $typName — " +
          "re-scale the unit")).cast(typ)))
}
