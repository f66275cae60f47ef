package graft

/** Shared physical-plan predicates for the audit specs. */
object PlanChecks {

  def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Count of SINGLE-PARTITION SORTS: Exchange nodes with
    * `Arguments: SinglePartition` whose tree parent is a Sort — the
    * single-task global-sort shape (a global window or global sort
    * funneling a whole relation through one task). Plain SinglePartition
    * exchanges under a final HashAggregate are NOT counted: every global
    * aggregate plans that way and moves only pre-aggregated partials.
    *
    * Note the spelling: formatted explain prints the exchange argument as
    * an `Arguments: SinglePartition` detail line — matching
    * "Exchange SinglePartition" (the simple-mode spelling) finds nothing
    * and silently vacuates the assertion. */
  def singlePartitionSorts(plan: String): Int = {
    val spIds =
      """\((\d+)\) Exchange\nInput[^\n]*\nArguments: SinglePartition"""
        .r.findAllMatchIn(plan).map(_.group(1)).toSet
    if (spIds.isEmpty) return 0
    val tree = plan.split("\n\n").head.split("\n").toSeq
      .map { l =>
        """^([\s:+\-*]*)([A-Za-z][A-Za-z0-9 ]*?) \((\d+)\)""".r
          .findFirstMatchIn(l)
          .map(x => (x.group(1).length, x.group(2), x.group(3)))
      }
    var hits = 0
    for (i <- tree.indices; (ind, name, id) <- tree(i)
         if name.contains("Exchange") && spIds.contains(id)) {
      val parent = (i - 1 to 0 by -1).iterator
        .flatMap(j => tree(j)).find(_._1 < ind).map(_._2)
      // exact match: "SortAggregate" / "SortMergeJoin" parents are NOT
      // global sorts and must not count (round-12 ADVICE — startsWith
      // overcounted on such plan shapes)
      if (parent.contains("Sort")) hits += 1
    }
    hits
  }
}
