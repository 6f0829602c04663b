package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Catalog persistence ACROSS JVMs — the deployment contract the in-memory
  * test catalog can't touch: a table registered against a Hive/Derby
  * metastore by one process must be resolvable (name, schema, LOCATION) by
  * a later process that shares nothing but the metastore path. Forks
  * [[MetastoreProbe]] twice because `spark.sql.catalogImplementation` is
  * frozen at SparkContext start — it cannot be flipped inside the shared
  * test session's JVM.
  */
class MetastorePersistenceSpec extends AnyFunSuite {

  private def runProbe(mode: String, workDir: String, dataDir: String): String = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // inherit the test JVM's --add-opens set (Spark 4 on JDK 17 needs it)
    // and classpath (sbt fork already resolved /opt/spark/jars)
    import scala.jdk.CollectionConverters._
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(_.startsWith("--add-opens")).toSeq
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.io.MetastoreProbe", mode, workDir, dataDir)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val rc = p.waitFor()
    assert(rc === 0, s"probe $mode exited $rc:\n${out.takeRight(4000)}")
    out
  }

  test("Hive/Derby metastore: table registered in one JVM resolves in a fresh JVM") {
    val work = java.nio.file.Files.createTempDirectory("graft-metastore").toString
    val data = s"$work/data"
    val w = runProbe("write", work, data)
    assert(w.contains("PROBE_OK mode=write rows=3"), s"write probe output:\n$w")
    val r = runProbe("read", work, data)
    assert(r.contains("PROBE_OK mode=read rows=3"),
      s"fresh JVM must resolve the table from the metastore alone:\n$r")
  }
}
