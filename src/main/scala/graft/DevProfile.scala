package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for whatever pipeline is under the knife
  * (dev tool — targets change round to round).
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)"); r
    }

    // scale-clean w with integer fids: df frame carries mono_id fid,
    // plain joins (AQE broadcasts when small)
    def wFid(dir: String): DataFrame = {
      val docs = Tables.documents(spark, dir)
      val toks = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      val bg = toks.select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i + 1]))"))
          .as("f"))
      val tf = bg.groupBy("doc_id", "f").agg(count(lit(1)).as("tf"))
      val nd = tf.select(countDistinct("doc_id").as("n"))
      val df = tf.groupBy("f").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nd))
        .filter(col("df") <= expr("n div 4"))
        .select(col("f"), monotonically_increasing_id().as("fid"),
          round(log(col("n").cast("double") / col("df")) * 1000)
            .cast("long").as("idf_milli"))
      tf.join(df, "f")
        .select(col("doc_id"), col("fid"), (col("tf") * col("idf_milli")).as("w"))
    }

    def finish(dots: DataFrame, nrm: DataFrame): Long =
      dots
        .join(nrm.select(col("doc_id").as("d1"), col("nsq").as("n1sq")), "d1")
        .join(nrm.select(col("doc_id").as("d2"), col("nsq").as("n2sq")), "d2")
        .filter(col("dot").cast("decimal(38,0)") * col("dot") * 25
          >= col("n1sq").cast("decimal(38,0)") * col("n2sq") * 16)
        .count()

    def variantI(): Long = {
      val wf = wFid(sfDir)
      val nrm = wf.groupBy("doc_id").agg(sum(col("w") * col("w")).as("nsq"))
      val dots = wf.as("a").hint("SHUFFLE_HASH").join(wf.as("b"),
          col("a.fid") === col("b.fid") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(sum(col("a.w") * col("b.w")).as("dot"))
      finish(dots, nrm)
    }

    def variantJ(): Long = {
      val wf = wFid(sfDir)
      val nrm = wf.groupBy("doc_id").agg(sum(col("w") * col("w")).as("nsq"))
      val dots = wf.as("a").hint("SHUFFLE_HASH").join(wf.as("b"),
          col("a.fid") === col("b.fid") && col("a.doc_id") < col("b.doc_id"))
        .select((col("a.doc_id") * 4294967296L + col("b.doc_id")).as("pk"),
          (col("a.w") * col("b.w")).as("p"))
        .groupBy("pk").agg(sum("p").as("dot"))
        .select((col("pk") / 4294967296L).cast("long").as("d1"),
          pmod(col("pk"), lit(4294967296L)).cast("long").as("d2"), col("dot"))
      finish(dots, nrm)
    }

    timed("warmup (unrelated query)")(
      ops.Relational.queries.head.build(spark, sfDir).count())
    timed("I r1 struct key")(variantI())
    timed("J r1 packed key")(variantJ())
    timed("I r2 struct key")(variantI())
    timed("J r2 packed key")(variantJ())
    spark.stop()
  }
}
