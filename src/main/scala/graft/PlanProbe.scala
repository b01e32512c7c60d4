package graft

/** Dev-only plan tap (r15): driver-orchestrated loops (PageRank,
  * canonicalize) checkpoint each round, so a post-hoc `.explain` of the
  * returned frame shows only a scan of the final RDD — the per-round plan
  * shape (Exchange count, join strategy) is otherwise unverifiable.
  * Operators `note()` their round-k frame right before the round's
  * action; when no sink is installed (production, bench, driver) this is
  * a null check and nothing else. [[PlanDump]] installs a sink that
  * writes each noted plan next to the query's own dump. */
object PlanProbe {
  @volatile var sink: (String, org.apache.spark.sql.DataFrame) => Unit = null
  def note(tag: String, df: => org.apache.spark.sql.DataFrame): Unit = {
    val s = sink
    if (s != null) s(tag, df)
  }
}
