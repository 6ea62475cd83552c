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

  def dir(tag: String, inputDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${jvmTag}_${tag}_${inputDir.hashCode.toHexString}"
}
