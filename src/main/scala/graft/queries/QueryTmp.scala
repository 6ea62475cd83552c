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
  private val jvmTag: String = java.util.UUID.randomUUID().toString.take(8)

  /** This JVM's staging dirs are deleted on clean shutdown; dirs leaked by
    * killed JVMs are swept on the next startup once they are older than an
    * hour (old enough that no concurrently-running sibling still reads
    * them — concurrent verify/bench JVMs are minutes apart). */
  private val root = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
  locally {
    val cutoff = System.currentTimeMillis() - 3600L * 1000
    val stale = root.toFile.listFiles()
    if (stale != null) stale.foreach { f =>
      if (f.getName.startsWith("graft_") && f.lastModified() < cutoff)
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
