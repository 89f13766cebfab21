package tmpdrive
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Drive7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def straw(t: String): DataFrame = graft.Tables.straw(spark, sf, t)
    def pq(t: String): DataFrame = spark.read.parquet(s"$sf/$t.parquet")

    def probes(src: String => DataFrame): Map[String, () => DataFrame] = Map(
      "scan_filter_sort" -> (() => src("lineitem").filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice"), 2).as("p")).orderBy(col("l_orderkey"), col("l_linenumber"))),
      "q1_agg" -> (() => src("lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")), avg(col("l_quantity")), count(lit(1)))),
      "join_agg" -> (() => src("lineitem").join(src("orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_extendedprice")), count(lit(1)))),
      "q6" -> (() => src("lineitem")
        .filter(col("l_shipdate") >= lit(java.time.LocalDateTime.of(1996, 1, 1, 0, 0)) &&
          col("l_shipdate") < lit(java.time.LocalDateTime.of(1997, 1, 1, 0, 0)) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice") * col("l_discount")))),
      "topk" -> (() => src("orders").select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc).limit(10)))

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val names = probes(straw).keys.toSeq.sorted
    names.foreach(n => { time(probes(straw)(n)); time(probes(pq)(n)) })
    println(f"${"probe"}%-18s ${"parquet"}%8s ${"strawboat"}%10s  ratio")
    names.foreach { n =>
      val ps = (1 to 3).map(_ => time(probes(pq)(n))).min
      val ss = (1 to 3).map(_ => time(probes(straw)(n))).min
      println(f"$n%-18s $ps%8.3f $ss%10.3f  ${ss / ps}%5.2f")
    }
    spark.stop()
  }
}
