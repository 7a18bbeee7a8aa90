package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge
import graft.operators.Dedup

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql` users get them too:
  *
  *   vector_dot(a, b)              — codegen'd float/double dot product
  *   sorted_intersect_count(a, b)  — merge-walk |A ∩ B| (sorted sets)
  *   minhash_sig(shingles)         — one-hash MinHash signature (k=16)
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "vector_dot",
      exprs => VectorDot(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "minhash_sig",
      exprs => MinHashSig(exprs.head, Dedup.MinhashSeeds))
    Bridge.registerFunction(spark, "md5_prefix_long",
      exprs => Md5PrefixLong(exprs.head, 15))
  }
}
