package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Marker for global windows over relations PROVEN bounded by construction.
  *
  * An empty partition spec makes WindowExec log `No Partition Defined for
  * Window operation! Moving all data to a single partition` on every
  * execution. At the call sites in this codebase the windowed relation is
  * already bounded (rows ranked AFTER `limit(n)`, a ≤4096-row bin
  * relation, or a distinct set pre-counted against a broadcast
  * threshold), so the single partition IS the intended plan and the
  * warning is noise — noise that in round 4 camouflaged real failures in
  * the bench tail.
  *
  * The warning cannot be suppressed plan-side: `partitionBy(lit(0))` is
  * semantically identical but Spark's `EliminateWindowPartitions` rule
  * (3.5+) folds constant partition keys back to the empty spec before
  * execution. So this object is a MARKER, not a plan change: every global
  * window must come through here with a call-site comment stating its
  * boundedness argument, and the harness mains ([[graft.Bench]],
  * [[graft.Verify]]) drop the WindowExec logger to ERROR, citing this
  * audit. A global window built directly on `Window.orderBy` (bypassing
  * this marker) is a review flag: either it's unbounded (a genuine scale
  * defect) or it's missing its boundedness argument.
  */
object BoundedWindow {
  /** An all-rows window ordered by `order`, for relations bounded by
    * construction at the call site (state the bound in a comment). */
  def global(order: Column*): WindowSpec = Window.orderBy(order: _*)

  /** An all-rows window with no ordering (whole-relation frame), for
    * relations bounded by construction at the call site. */
  def globalUnordered(): WindowSpec = Window.partitionBy()

  /** Logger whose WARN noise the harness mains silence — one place, so
    * the mains and this audit can't drift apart. */
  val windowExecLogger = "org.apache.spark.sql.execution.window.WindowExec"

  /** Drop WindowExec's per-execution warning for the audited bounded
    * windows. Call from harness mains AFTER SparkSession creation (Spark
    * configures log4j2 lazily). */
  def silenceBoundedWindowWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      windowExecLogger, org.apache.logging.log4j.Level.ERROR)
}
