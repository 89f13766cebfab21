package graft.spark

/** Test-scope FOREIGN COMMITTER: a separate JVM that appends one log
  * version to an existing table by re-committing a retained version's adds
  * (same paths — idempotent on replay, like the in-process simulation in
  * StrawLogSpec). Exercises the cross-process discovery path: the spawning
  * JVM holds a [[StrawLog]] latest-hint for the table, and its next
  * resolution must find this process's commit through the successor probe.
  * No SparkSession — [[StrawLog.commit]] is Hadoop-FS-only, which keeps the
  * child's startup to ~1s. */
object CrossJvmCommitter {
  def main(args: Array[String]): Unit = {
    val table = args(0)
    val srcVersion = args(1).toLong
    val (_, adds) = StrawLog.commitAdds(table, srcVersion).getOrElse(
      sys.error(s"no commit $srcVersion under $table"))
    val v = StrawLog.commit(table, adds, op = "foreign append")
    // the parent test parses this line
    println(s"COMMITTED $v")
  }
}
