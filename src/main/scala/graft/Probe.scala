package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object Probe {
  def time(name: String)(df: => DataFrame): Unit = {
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROBE $name%-28s rep$rep ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
  }
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cols = Seq("l_orderkey", "l_partkey", "l_returnflag", "l_linestatus")
    def spreadLi = Tables.lineitem(spark, sfDir).select(cols.map(col): _*)
      .repartition(spark.sparkContext.defaultParallelism)
    time("q31-current")(SparkEntry.queries("q31_profile")(spark, sfDir))
    val li = spreadLi
    time("q31-union4") {
      cols.map { c =>
        li.agg(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_s"),
          max(col(c)).cast("string").as("max_s"))
          .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"), col("min_s"), col("max_s"))
      }.reduce(_ unionByName _)
    }
    time("q31-union4-persist") {
      val p = spreadLi.persist()
      p.count()
      val r = cols.map { c =>
        p.agg(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_s"),
          max(col(c)).cast("string").as("max_s"))
          .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"), col("min_s"), col("max_s"))
      }.reduce(_ unionByName _)
      r
    }
    spark.stop()
  }
}
