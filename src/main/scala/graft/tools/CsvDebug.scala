package graft.tools
import org.apache.spark.sql.SparkSession
import graft.sources.CsvDialect
import java.nio.file.Files
/** Dev-only: drives the E1→E2 transfer chain end-to-end like the reference's
  * README DAG (export a query to CSV, bulk-load the CSV into a table). */
object CsvDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("chain").toString
    // E1: query → single CSV file (gzip), like PostgresToCsvOperator
    val exp = graft.operators.QueryToCsv.run(spark,
      "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey > :r ORDER BY n_nationkey;",
      s"$dir/nations.csv.gz", parameters = Map("r" -> 1), compression = Some("gzip"))
    println(s"CHAIN export rows=${exp.rowCount} path=${exp.csvFilePath}")
    // E2: CSV → table, like CsvToPostgresOperator (truncate mode)
    spark.sql("CREATE TABLE nation_copy (n_nationkey INT, n_name STRING, n_regionkey INT) USING parquet")
    val n = graft.operators.CsvToTable.run(spark, "nation_copy", s"$dir/nations.csv.gz", truncate = true)
    println(s"CHAIN import rows=$n")
    // round-trip equality vs the source query
    val a = spark.table("nation_copy").orderBy("n_nationkey").collect().toSeq
    val b = spark.sql("SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey > 1 ORDER BY n_nationkey").collect().toSeq
    println(s"CHAIN roundtrip equal=${a == b} (${a.size} rows)")
    spark.stop()
  }
}
