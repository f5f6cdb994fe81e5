package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forks [[ClusterSmoke]] into its own JVM (a second SparkContext cannot
  * coexist with the suite's shared one) and asserts the
  * local-cluster[2,2,1024] drive succeeds — the suite's only
  * multi-process execution check. */
class ClusterSmokeSpec extends AnyFunSuite {

  test("distributed-regime keys survive local-cluster[2,2,1024] (multi-JVM execution)") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val pb = new ProcessBuilder(
      javaBin, "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.ClusterSmoke", "/root/testdata/sf0.001")
    pb.environment().put("SPARK_HOME", "/opt/spark")
    // the in-process WorkerCommandBuilder reads this from the env when
    // building the executor launch command (spark-class would normally
    // export it); without it executor launch dies with "Cannot find any
    // build directories"
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    // watchdog: a wedged worker/executor handshake must fail the test,
    // not hang the suite
    val killer = new Thread(() => {
      if (!p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)) p.destroyForcibly()
      ()
    })
    killer.setDaemon(true)
    killer.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    assert(code == 0 && out.contains("CLUSTER_SMOKE_OK"),
      s"cluster smoke failed (exit $code); last output:\n${out.takeRight(4000)}")
  }
}
