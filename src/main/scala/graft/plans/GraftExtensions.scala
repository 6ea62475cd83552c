package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

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

  private def boolLit(e: Expression, fn: String, what: String): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a boolean literal, got $other")
  }

  private def register(ext: SparkSessionExtensions, name: String,
                       className: String, arities: Set[Int], usage: String)(
      build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(className, name),
      (children: Seq[Expression]) => {
        require(arities.contains(children.length),
          s"$name takes arguments ($usage), got ${children.length}")
        build(children)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "most_recent", classOf[MostRecent].getName,
        Set(1), "versions") { c => MostRecent(c.head) }
    register(ext, "sorted_intersect_size", classOf[SortedIntersectSize].getName,
        Set(2), "a, b") { c => SortedIntersectSize(c.head, c(1)) }
    register(ext, "md5_prefix_long", classOf[Md5PrefixLong].getName,
        Set(2), "s, nibbles") { c =>
      Md5PrefixLong(c.head, intLit(c(1), "md5_prefix_long", "nibbles"))
    }
    // 3rd arg mirrors the Scala API's distinctSorted: `false` keeps
    // duplicate grams (the frequency-weighted simhash path needs every
    // repeated token to vote); default `true` dedups + sorts.
    register(ext, "md5_array_long", classOf[Md5ArrayLong].getName,
        Set(2, 3), "arr, nibbles[, distinct_sorted]") { c =>
      Md5ArrayLong(c.head, intLit(c(1), "md5_array_long", "nibbles"),
        distinctSorted =
          c.lengthCompare(3) < 0 ||
            boolLit(c(2), "md5_array_long", "distinct_sorted"))
    }
    register(ext, "minhash_signature", classOf[MinhashSignature].getName,
        Set(2), "ghash, k") { c =>
      MinhashSignature(c.head, intLit(c(1), "minhash_signature", "k"))
    }
    register(ext, "simhash_of_hashes", classOf[SimhashOfHashes].getName,
        Set(2), "hs, bits") { c =>
      SimhashOfHashes(c.head, intLit(c(1), "simhash_of_hashes", "bits"))
    }
    register(ext, "char_gram_hashes", classOf[CharGramHashes].getName,
        Set(3), "s, n, nibbles") { c =>
      CharGramHashes(c.head, intLit(c(1), "char_gram_hashes", "n"),
        intLit(c(2), "char_gram_hashes", "nibbles"))
    }
    register(ext, "word_shingle_hashes", classOf[WordShingleHashes].getName,
        Set(3), "s, n, nibbles") { c =>
      WordShingleHashes(c.head, intLit(c(1), "word_shingle_hashes", "n"),
        intLit(c(2), "word_shingle_hashes", "nibbles"))
    }
    register(ext, "token_stats", classOf[TokenStats].getName,
        Set(1), "s") { c => TokenStats(c.head) }
  }
}
