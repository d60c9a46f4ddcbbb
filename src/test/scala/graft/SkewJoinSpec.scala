package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join is row-identical to the plain join under heavy skew") {
    // 10k rows of one hot key + a tail, joined to a 3-row dim per key
    val left = ((1 to 10000).map(i => ("hot", i)) ++ (1 to 50).map(i => (s"k$i", i)))
      .toDF("k", "n")
    val right = Seq("hot", "k1", "k2").flatMap(k => (1 to 3).map(j => (k, s"$k-$j")))
      .toDF("k", "attr")

    val plain = left.join(right, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedInnerJoin(left, right, Seq("k"), salt = 8)
      .groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("hot") === 30000L)
  }

  test("salt column does not leak into the output") {
    val left = Seq(("a", 1)).toDF("k", "n")
    val right = Seq(("a", "x")).toDF("k", "attr")
    val out = SkewJoin.saltedInnerJoin(left, right, Seq("k"), 4)
    assert(out.columns.toSeq === Seq("k", "n", "attr"))
    assert(out.count() === 1)
  }
}
