package graft.queries

/** Per-JVM-unique scratch directories for query roundtrips.
  *
  * The verify and bench drivers may run concurrently in separate JVMs over
  * the same sf dir; a tmp path keyed only by the input dir would let one
  * JVM overwrite another's staged CSV/seq/avro files mid-read (observed as
  * hash-only mismatches with stable group counts). The random JVM tag makes
  * every process's staging area disjoint.
  */
object QueryTmp {
  /** PID-prefixed so the startup sweep can check owner liveness: age alone
    * would delete staging dirs a still-running sibling JVM (a verify or
    * bench run longer than the cutoff) is about to read — the dirs are
    * written once early and their mtime never refreshes. */
  private val jvmTag: String =
    s"${ProcessHandle.current().pid()}x${java.util.UUID.randomUUID().toString.take(4)}"

  /** This JVM's staging dirs are deleted on clean shutdown; dirs leaked by
    * killed JVMs are swept on the next startup once their owner process is
    * gone AND they are older than an hour (the age floor guards against
    * PID reuse racing a just-started sibling). */
  private val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
  locally {
    val cutoff = System.currentTimeMillis() - 3600L * 1000
    val OwnerPat = "graft_(\\d+)x.*".r
    def ownerDead(name: String): Boolean = name match {
      case OwnerPat(p) =>
        scala.util.Try(ProcessHandle.of(p.toLong)).toOption
          .flatMap(h => if (h.isPresent) Some(h.get) else None)
          .forall(!_.isAlive)
      case _ => true // legacy tag with no PID: age-only
    }
    val stale = root.toFile.listFiles()
    if (stale != null) stale.foreach { f =>
      if (f.getName.startsWith("graft_") && f.lastModified() < cutoff &&
          ownerDead(f.getName))
        deleteRecursively(f)
    }
    sys.addShutdownHook {
      val mine = root.toFile.listFiles()
      if (mine != null) mine.foreach { f =>
        if (f.getName.startsWith(s"graft_${jvmTag}_")) deleteRecursively(f)
      }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  def dir(tag: String, inputDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${jvmTag}_${tag}_${inputDir.hashCode.toHexString}"
}
