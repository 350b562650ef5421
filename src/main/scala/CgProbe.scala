import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._
object CgProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        sys.props.getOrElse("cg.excluded", ""))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = if (args.nonEmpty) args(0) else "q_contract_errors"
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    val cg = df.queryExecution.debug.codegenToSeq()
    println(s"=== ${cg.size} codegen subtrees ===")
    cg.zipWithIndex.foreach { case ((subtree, code, stats), i) =>
      val fallback = "CodegenFallback|fallbackExpr".r.findAllIn(code).size
      println(s"--- subtree $i codeLen=${code.length} maxMethodBytecode=${stats.maxMethodCodeSize} fallbackRefs=$fallback ---")
    }
    val interp = df.queryExecution.executedPlan.toString
    println("nonCodegenOps=" + "(?m)^(?!.*\\*\\().*(Project|Filter)".r.findAllIn(interp).size)
    println("CEV_REFS=" + "__cev_".r.findAllIn(interp).size)
    val out = java.nio.file.Paths.get("/tmp/plan_" + name + ".txt")
    java.nio.file.Files.writeString(out, interp)
    println("plan chars=" + interp.length + " -> " + out)
    if (args.length > 1 && args(1) == "code") {
      cg.zipWithIndex.foreach { case ((_, code, _), i) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/tmp/cg_${name}_$i.java"), code)
      }
    }
    spark.stop()
  }
}
