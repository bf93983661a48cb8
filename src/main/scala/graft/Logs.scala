package graft

/** Log hygiene for the two driver-run mains (VERDICT r15 #8). */
object Logs {
  /** Silences `WindowExec`'s "No Partition Defined for Window operation!"
    * warning for the Bench/Verify runs. Every global rank window in the
    * engine sits AFTER a `limit(from+size|pool)` cut (Dsl.scala /
    * Search.scala — plan-pinned in PlanGuardSpec), so the warning is
    * bounded-by-construction noise here; the r15 bench kill's captured
    * tail was hundreds of copies of it, burying the real context. Scoped
    * to the physical-window package so genuine warnings elsewhere stay
    * visible, and to these mains only — library users keep the default. */
  def quietBoundedWindows(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window", org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // a logging backend swap must never kill a run
}
