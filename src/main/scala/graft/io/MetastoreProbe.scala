package graft.io

import org.apache.spark.sql.SparkSession

/** Cross-JVM catalog-persistence probe (the deployment posture the
  * in-memory test catalog can't exercise): a Hive-backed session catalog
  * over an embedded Derby metastore at a caller-chosen path. Run once with
  * `write` to create a database + external table, then AGAIN IN A FRESH
  * JVM with `read` — the second process knows the table only if the
  * metastore actually persisted it. `spark.sql.catalogImplementation` is
  * fixed at SparkContext start, which is why this is a separate main and
  * not a test-session toggle (MetastorePersistenceSpec forks it twice).
  *
  * Success marker on stdout: `PROBE_OK mode=<mode> rows=<n>`; any
  * exception crashes the process — the spec asserts the marker.
  */
object MetastoreProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: MetastoreProbe write|read <workDir> <dataDir>")
    val mode = args(0); val workDir = args(1); val dataDir = args(2)
    System.setProperty("derby.system.home", workDir)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-metastore-probe-$mode")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$workDir/metastore_db;create=true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val n = mode match {
        case "write" =>
          import spark.implicits._
          val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
          df.write.mode("overwrite").parquet(dataDir)
          Catalog.ensureDatabase(spark, "persist_db")
          Catalog.dropTable(spark, "persist_db", "t")
          Catalog.createExternalTable(spark, "persist_db", "t",
            spark.read.parquet(dataDir).schema, Nil, dataDir)
          spark.table("persist_db.t").count()
        case "read" =>
          // a fresh JVM: the table name, schema, and location must all come
          // from the Derby metastore written by the `write` run
          require(Catalog.tableExists(spark, "persist_db", "t"),
            "metastore lost the table across JVMs")
          spark.table("persist_db.t").count()
        case other => throw new IllegalArgumentException(s"unknown mode $other")
      }
      println(s"PROBE_OK mode=$mode rows=$n")
    } finally spark.stop()
  }
}
