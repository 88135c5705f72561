package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The surgical-rewrite protocol shared by every store's physical
  * erasure path ([[SignatureStore.forget]], [[AnnIndexStore.vacuum]]):
  * given a partitioned parquet table and the ids to erase, rewrite ONLY
  * the partitions that hold them — survivors stage to a scratch sibling
  * and swap in by rename, partitions emptied whole have their
  * directories removed (a dynamic overwrite cannot emit an empty
  * partition). One copy of the rename-swap/empty-dir protocol, so a fix
  * (rename failure handling, deeper partition trees) lands everywhere
  * at once. Cost: proportional to the AFFECTED partitions, never the
  * table; the erase set is broadcast-sized by construction (an erasure
  * request names few ids).
  */
private[graft] object PartitionRewrite {

  /** Physically remove every row of `table` whose `idCol` appears in
    * `ids`. `partCols` are the table's partition columns, outermost
    * first (integral-valued — they format into the `col=value` dir
    * names the swap targets). */
  def erase(s: SparkSession, table: String, partCols: Seq[String],
      ids: DataFrame, idCol: String): Unit = {
    val bcIds = broadcast(ids.select(col(idCol)))
    val rel = s.read.parquet(table)
    val key = concat_ws("/", partCols.map(c =>
      concat(lit(c + "="), col(c).cast("long"))): _*)
    val affected = rel.join(bcIds, idCol)
      .select(key.as("p")).distinct().collect().map(_.getString(0))
    if (affected.nonEmpty) {
      val tmp = table + "_rewrite_tmp"
      rel.filter(key.isin(affected.toSeq: _*))
        .join(bcIds, Seq(idCol), "left_anti")
        .write.mode("overwrite").partitionBy(partCols: _*).parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(table)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      affected.foreach { p =>
        val dst = new org.apache.hadoop.fs.Path(s"$table/$p")
        val src = new org.apache.hadoop.fs.Path(s"$tmp/$p")
        fs.delete(dst, true)
        // src absent ⇔ the partition was erased whole; its dir stays gone
        if (fs.exists(src)) { fs.rename(src, dst); () }
      }
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      ()
    }
  }
}
