package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write–Audit–Publish: the Iceberg-popularized ingestion pattern that
  * keeps a bad batch from ever being visible to readers. The incoming
  * batch is appended only after the POST-APPEND table state passes its
  * expectation suite; on failure the table is rolled back to the pre-write
  * tag and the batch is rejected with the violating rules.
  *
  * Mechanism here: tag current state ([[Layout.snapshot]]) → append →
  * validate ([[Checks.validate]]) → keep, or [[Layout.restore]] on
  * violation. The audit runs on the real appended table (not a copy), and
  * the rollback is the tag restore — the same primitive a real catalog
  * uses (Nessie/Iceberg branch reset). Readers between append and restore
  * could observe the staged rows in this emulation; a real catalog makes
  * the swap atomic — the API and semantics are what this layer pins down.
  *
  * Scale: audit cost = the expectation aggregates (one pass); rollback
  * cost = republishing the tagged manifest's rows (copy-on-write — a
  * pointer-based catalog does it metadata-only), and the GC physically
  * reclaims the rejected batch's staged files at the next commit.
  */
object Wap {

  final case class WapResult(published: Boolean, failedRules: Seq[String])

  def writeAuditPublish(spark: SparkSession, table: String, batch: DataFrame,
      rules: Seq[Checks.Rule], tag: String): WapResult = {
    Layout.snapshot(spark, table, tag)
    batch.write.mode("append").saveAsTable(table)
    val failed = Checks.validate(spark.table(table), rules)
      .filter(!col("pass"))
      .select("rule").collect().map(_.getString(0)).toSeq
    if (failed.isEmpty) WapResult(published = true, Nil)
    else {
      Layout.restore(spark, table, tag)
      WapResult(published = false, failed)
    }
  }

  /** Branch-isolated WAP — the form [[writeAuditPublish]]'s scaladoc
    * apologizes for not being: the batch lands on a BRANCH
    * ([[Layout.createBranch]]), the audit runs on the branch's post-append
    * state, and main only ever changes via the fast-forward merge — so
    * readers of main can NEVER observe a staged row, and a failed audit
    * costs a branch drop, not a restore. The merge inherits the branch
    * machinery's optimistic-concurrency check: if main moved during the
    * audit, the publish refuses (re-fork and replay) rather than
    * clobbering a concurrent commit. */
  def writeAuditPublishBranched(spark: SparkSession, table: String,
      batch: DataFrame, rules: Seq[Checks.Rule], branch: String): WapResult = {
    val bt = Layout.createBranch(spark, table, branch)
    batch.write.mode("append").saveAsTable(bt)
    val failed = Checks.validate(spark.table(bt), rules)
      .filter(!col("pass"))
      .select("rule").collect().map(_.getString(0)).toSeq
    if (failed.isEmpty) {
      Layout.mergeBranch(spark, table, branch)
      WapResult(published = true, Nil)
    } else {
      Layout.dropBranch(spark, table, branch)
      WapResult(published = false, failed)
    }
  }
}
