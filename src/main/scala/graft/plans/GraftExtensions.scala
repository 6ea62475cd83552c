package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session extensions registering ALL the engine's native expressions, so
  * every kernel is usable from `spark.sql(...)` / `expr(...)` as well as
  * the Scala API — a user of the SQL surface gets the same fused one-pass
  * kernels the built-in queries use.
  *
  * Activate with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * on the session builder. Static parameters (gram length, hash width,
  * band count) are passed as integer literals: e.g.
  * `word_shingle_hashes(text, 3, 7)`, `token_stats(text).top_word_n`.
  *
  * `NearestCentroids` is deliberately absent: it binds a driver-built
  * centroid set object, which has no SQL-literal form — use
  * `Similarity.knnIvf` from the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  private def register(ext: SparkSessionExtensions, name: String, arity: String)(
      build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo("graft.plans", name),
      (children: Seq[Expression]) => {
        require(children.length == arity.count(_ == ',') + 1,
          s"$name takes arguments ($arity)")
        build(children)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "most_recent", "versions") { c => MostRecent(c.head) }
    register(ext, "sorted_intersect_size", "a, b") { c =>
      SortedIntersectSize(c.head, c(1))
    }
    register(ext, "md5_prefix_long", "s, nibbles") { c =>
      Md5PrefixLong(c.head, intLit(c(1), "md5_prefix_long", "nibbles"))
    }
    register(ext, "md5_array_long", "arr, nibbles") { c =>
      Md5ArrayLong(c.head, intLit(c(1), "md5_array_long", "nibbles"),
        distinctSorted = true)
    }
    register(ext, "minhash_signature", "ghash, k") { c =>
      MinhashSignature(c.head, intLit(c(1), "minhash_signature", "k"))
    }
    register(ext, "simhash_of_hashes", "hs, bits") { c =>
      SimhashOfHashes(c.head, intLit(c(1), "simhash_of_hashes", "bits"))
    }
    register(ext, "char_gram_hashes", "s, n, nibbles") { c =>
      CharGramHashes(c.head, intLit(c(1), "char_gram_hashes", "n"),
        intLit(c(2), "char_gram_hashes", "nibbles"))
    }
    register(ext, "word_shingle_hashes", "s, n, nibbles") { c =>
      WordShingleHashes(c.head, intLit(c(1), "word_shingle_hashes", "n"),
        intLit(c(2), "word_shingle_hashes", "nibbles"))
    }
    register(ext, "token_stats", "s") { c => TokenStats(c.head) }
  }
}
