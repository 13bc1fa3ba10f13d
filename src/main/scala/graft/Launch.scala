package graft

/** Shared launcher policy for the Verify/Bench mains. */
object Launch {
  /** local[N] width: SPARK_GRAFT_CPUS, else host cores capped at 32 (the
    * target local[32] envelope). */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(Runtime.getRuntime.availableProcessors, 32).toString)
}
