package tmpdrive
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions","2").config("spark.ui.enabled","false")
      .appName("probe").getOrCreate()
    import spark.implicits._
    val d = "/tmp/probe_evo_" + System.nanoTime()
    Seq((1L, "a")).toDF("id", "s").write.format("strawboat").mode("overwrite").save(d)
    // extra column
    try {
      Seq((2L, "b", 3.5)).toDF("id", "s", "score").write.format("strawboat").mode("append").save(d)
      println("EXTRA-COL APPEND: OK")
      spark.read.format("strawboat").load(d).show()
    } catch { case e: Exception => println("EXTRA-COL APPEND FAILED: " + e.getClass.getSimpleName + ": " + e.getMessage.take(300)) }
    // missing column
    try {
      Seq(9L).toDF("id").write.format("strawboat").mode("append").save(d)
      println("MISSING-COL APPEND: OK")
    } catch { case e: Exception => println("MISSING-COL APPEND FAILED: " + e.getClass.getSimpleName + ": " + e.getMessage.take(300)) }
    // type change
    try {
      Seq((1, "x")).toDF("id", "s").write.format("strawboat").mode("append").save(d)  // id int vs long
      println("NARROWER-TYPE APPEND: OK")
      spark.read.format("strawboat").load(d).show()
    } catch { case e: Exception => println("NARROWER APPEND FAILED: " + e.getClass.getSimpleName + ": " + e.getMessage.take(300)) }
    spark.stop()
  }
}
