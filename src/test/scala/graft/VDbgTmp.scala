import org.apache.spark.sql.SparkSession
object VDbg {
  def main(a: Array[String]): Unit = {
    val base = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions).create()
    val wh = java.nio.file.Files.createTempDirectory("vdbg")
    spark.conf.set("spark.sql.catalog.vcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.vcat.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE vcat.db")
    spark.sql("CREATE TABLE vcat.db.base (id BIGINT)")
    try { spark.sql("CREATE VIEW vcat.db.base AS SELECT 1 AS x"); println("NO-THROW") }
    catch { case e: Throwable => println("THREW: " + e.getMessage.take(120)) }
    val s = java.nio.file.Files.list(wh.resolve("db"))
    s.forEach(p => println("FILE: " + p.getFileName))
    base.stop()
  }
}
