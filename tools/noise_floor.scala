// Host noise-floor measurement for the bench protocol (SURVEY §7.5.x /
// VERDICT r15 item 8): run a FIXED workload — zero plan variance, the
// same min-of-3-passes scoring, clearCache + System.gc between queries
// exactly like graft.Bench — and measure the min-vs-median gap. With the
// plan cost constant, any gap IS the host's intrinsic scheduling /
// page-cache weather, i.e. the floor below which no plan work can push
// the bench's own gap. Drive with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false -I tools/noise_floor.scala
sc.setLogLevel("ERROR")
import org.apache.spark.sql.functions._
val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val li = spark.read.parquet(s"$sf/lineitem.parquet")
val ord = spark.read.parquet(s"$sf/orders.parquet")
li.count(); ord.count() // warm JIT + page cache like Bench's uncounted scan
// two fixed plans bracketing the bench's per-query scale (~0.3 s agg,
// ~1.5 s join+agg), 40 "queries" each, 3 full passes over the list
def light(): Unit = { li.filter(col("l_quantity") > 10).groupBy("l_returnflag", "l_linestatus").agg(sum("l_extendedprice"), avg("l_discount"), count(lit(1))).collect(); () }
def heavy(): Unit = { li.join(ord, col("l_orderkey") === col("o_orderkey")).groupBy("l_returnflag", "o_orderpriority").agg(sum("l_extendedprice"), count(lit(1))).collect(); () }
val queries: Seq[() => Unit] = Seq.fill(40)(light _) ++ Seq.fill(40)(heavy _)
val passes = (1 to 3).map { _ => queries.map { q => val t0 = System.nanoTime; q(); spark.catalog.clearCache(); System.gc(); (System.nanoTime - t0) / 1e9 } }
val mins = queries.indices.map(i => passes.map(_(i)).min)
val meds = queries.indices.map(i => passes.map(_(i)).sorted.apply(1))
val (sm, sd) = (mins.sum, meds.sum)
println(f"NOISE_FLOOR n=${queries.size} min_sum=$sm%.2f s median_sum=$sd%.2f s gap=${(sd - sm) / sm * 100}%.2f%%")
System.exit(0)
