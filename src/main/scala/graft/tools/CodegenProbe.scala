package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** One-off probe: run the custom expressions with codegen fallback
  * disabled so a doGenCode bug fails loudly instead of silently
  * interpreting. Not part of the driver contract.
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.GraftExtensions)   // real injection path
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val rh = Tables.documents(spark, d)
      .select(GraftFunctions.rolling_hash(col("text")).as("h"))
      .agg(sum("h")).head.getLong(0)
    val e = Tables.embeddings(spark, d)
    val cs = e.crossJoin(e.select(col("embedding").as("e2")).limit(1))
      .select(GraftFunctions.cosine_sim(col("embedding"), col("e2")).as("c"))
      .agg(sum("c")).head.getDouble(0)
    val toks = Tables.documents(spark, d)
      .select(expr("filter(split(text, ' '), x -> x != '')").as("toks"))
    val mh = toks
      .select(GraftFunctions.minhash_sig_long(
        GraftFunctions.shingle_hashes(col("toks"), 3), 64).as("sig"))
      .select(expr("aggregate(sig, 0L, (a, v) -> a ^ v)").as("x"))
      .agg(expr("bit_xor(x)")).head.getLong(0)
    val sh = toks.select(GraftFunctions.simhash64(col("toks")).as("h"))
      .agg(expr("bit_xor(h)")).head.getLong(0)
    val shp = toks
      .select(GraftFunctions.shingle_hashes_pos(col("toks"), 5).as("g"))
      .select(expr("aggregate(g, 0L, (a, v) -> a ^ v)").as("x"))
      .agg(expr("bit_xor(x)")).head.getLong(0)
    val ld = Tables.embeddings(spark, d)
      .select(expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))").as("q"))
      .select(GraftFunctions.long_dot(col("q"), col("q")).as("dd"))
      .agg(expr("bit_xor(dd)")).head.getLong(0)
    // SQL surface via the injected extension (no registry call)
    val ext = spark.sql("SELECT rolling_hash('graft') AS h").head.getLong(0)
    println(s"CODEGEN_OK rolling_hash_sum=$rh cosine_sum=$cs minhash_xor=$mh simhash_sum=$sh shingle_pos_xor=$shp longdot_xor=$ld ext_sql=$ext")
    spark.stop()
  }
}
