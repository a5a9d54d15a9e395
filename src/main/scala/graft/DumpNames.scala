package graft

/** Dev-only: dump registry names for SURVEY sync checks. */
object DumpNames {
  def main(args: Array[String]): Unit =
    println(SparkEntry.registry.map(q => q.name + "\t" + (if (q.oracle.isDefined) "oracle" else "rows_only")).mkString("\n"))
}
