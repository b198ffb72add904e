package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Throwaway profiling aid for the optimization round: time the
  * d_containment / d_minhash_est sub-stages separately at sf0.1.
  */
object ProfC {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.tuned(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = t("docs read")(spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).persist(StorageLevel.MEMORY_AND_DISK))
    t("docs count")(docs.count())
    val distinctShingles = array_distinct(graft.text.TextOps.shinglesCol(col("text"), 3))
    val exploded = docs.select(col("doc_id"), explode(distinctShingles).as("shingle"))
    val sh = t("sh build")(exploded
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    t("sh count")(sh.count())
    val sizes = t("sizes")(sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    t("sizes count")(sizes.count())
    val df = t("df agg")(sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 10000).persist(StorageLevel.MEMORY_AND_DISK))
    t("df count")(df.count())
    val rare = sh.join(df.select(col("shingle")), Seq("shingle"))
    val inter = t("inter build")(rare.as("x").join(rare.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    t("inter count")(inter.count())
    val ordered = inter.select(col("a").as("src_doc"), col("b").as("dst_doc"), col("inter"))
      .union(inter.select(col("b").as("src_doc"), col("a").as("dst_doc"), col("inter")))
    val out = ordered
      .join(sizes.select(col("doc_id").as("src_doc"), col("sz")), Seq("src_doc"))
      .select(col("src_doc"), col("dst_doc"),
        (col("inter").cast("double") / col("sz").cast("double")).as("containment"))
      .filter(col("containment") >= 0.5)
    t("containment tail")(out.count())
    // minhash est side: signature pass
    val sigs = t("mh sigs build")(graft.text.Dedup.minHashSignatures(docs)
      .persist(StorageLevel.MEMORY_AND_DISK))
    t("mh sigs count")(sigs.count())
    val half = sigs.where(col("doc_id") % 2 === 0)
    val est = t("mh est plan")(graft.text.Dedup.minHashAccuracyOfSigs(
      half, docs.where(col("doc_id") % 2 === 0)))
    t("mh est count")(est.count())
    spark.stop()
  }
}
