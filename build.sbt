ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "slovnetspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
val commonJavaOptions = jdk17AddOpens ++ Seq(
  // SIMD kernels (graft.kernel.VectorGemm); Spark's own executor launcher
  // injects the same module, so driver and executors agree.
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // ParallelGC: pure-throughput batch workload, no latency SLO — measured
  // ~2x steadier than G1 here at 32 threads of small-object churn.
  "-XX:+UseParallelGC",
) ++ sys.env.get("GRAFT_JVM_OPTS").toSeq.flatMap(_.split(" ").toSeq)
// Pin + pre-touch the heap for `run` (bench/verify): growing the heap
// mid-run at 32 allocating threads triggers multi-second page-zeroing
// storms on this VM (measured 12x slowdowns on first heavy stage).
// Pre-touch moves that cost to JVM start, outside any measurement.
// local-cluster executor launcher infers the Scala dir from this env var
run / envVars += ("SPARK_SCALA_VERSION" -> "2.13")
run / javaOptions := commonJavaOptions ++ Seq(
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
)
// tests stay light-weight (many short-lived forked JVMs)
Test / javaOptions := commonJavaOptions ++ Seq("-Xmx8g")
