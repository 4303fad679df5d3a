package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.model.EventEnvelope

/** Stream ACLs — read-time access control (SURVEY.md §2 gap item).
  *
  * Reference: StreamAcl (src/EventStore.Core/Data/StreamAcl.cs:11) parsed
  * from the `$acl` key of stream metadata (SystemMetadata keys `$r`/`$w`/
  * `$d`/`$mr`/`$mw`), enforced before every read in StorageReaderWorker.
  * Role values may be a single string or an array of strings; `$all` grants
  * everyone, `$admins` bypasses all checks. Streams without an explicit
  * ACL fall back to the system defaults: user streams readable by anyone,
  * `$`-system streams by `$admins` only (SystemSettings defaults).
  *
  * Spark-first shape: ACLs are one row per stream with an explicit `$acl`
  * (≪ streams ≪ events), broadcast-joined into the scan — enforcement
  * costs one broadcast hash join, never a shuffle of the log.
  */
object Acl {

  /** Parse `$acl` role lists out of metastream rows (`$$<stream>`); latest
    * metadata event per stream wins, mirroring Retention.metadataFromLog.
    * Output: stream_id + one array column per ACL slot (null = slot not
    * set → default applies). */
  def aclFromLog(log: DataFrame): DataFrame = {
    val latest = log.where(col("stream_id").startsWith(EventEnvelope.MetastreamPrefix))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("stream_id")).orderBy(col("event_number").desc)))
      .where(col("_rn") === 1)
    latest.select(
      expr("substring(stream_id, 3)").as("stream_id"),
      rolesOf(col("data"), "r").as("read_roles"),
      rolesOf(col("data"), "w").as("write_roles"),
      rolesOf(col("data"), "d").as("delete_roles"),
      rolesOf(col("data"), "mr").as("meta_read_roles"),
      rolesOf(col("data"), "mw").as("meta_write_roles"))
  }

  /** One ACL slot: accepts the reference's single-string or array JSON
    * forms (`"$r": "ouro"` and `"$r": ["ouro","readers"]` both parse). */
  private def rolesOf(data: Column, key: String): Column =
    rolesAt(data, s"$$.$$acl.$$$key")

  private def rolesAt(data: Column, path: String): Column = {
    val raw = get_json_object(data, path)
    when(raw.startsWith("["), from_json(raw, ArrayType(StringType)))
      .otherwise(when(raw.isNotNull, array(raw)))
  }

  /** The `$settings` stream name (SystemNames.cs:41). */
  val SettingsStream = "$settings"

  /** Deployment-wide default ACLs from the latest `$settings` event
    * (SystemSettings.cs:22-61): `$userStreamAcl` / `$systemStreamAcl`
    * replace the built-in open / admin-only fallbacks for streams without
    * an explicit `$acl`. Returns the requested slot for (user, system)
    * streams; None = slot not configured. One bounded point read. */
  def settingsDefaults(log: DataFrame,
      slot: String = "r"): (Option[Seq[String]], Option[Seq[String]]) = {
    val rows = log.where(col("stream_id") === SettingsStream)
      .orderBy(col("event_number").desc).limit(1)
      .select(
        rolesAt(col("data"), s"$$.$$userStreamAcl.$$$slot").as("u"),
        rolesAt(col("data"), s"$$.$$systemStreamAcl.$$$slot").as("s"))
      .collect()
    rows.headOption match {
      case None => (None, None)
      case Some(r) =>
        def get(i: Int): Option[Seq[String]] =
          if (r.isNullAt(i)) None else Some(r.getSeq[String](i).toSeq)
        (get(0), get(1))
    }
  }

  /** Filter a log read down to what `principal` (with `roles`) may see.
    * `aclCol` picks the slot to enforce ("read_roles" for reads). Admins
    * bypass; explicit ACLs grant by overlap with {principal, roles, $all};
    * absent ACLs fall back to the defaults (user streams open, system
    * streams admin-only). */
  def applyAcl(log: DataFrame, acls: DataFrame, principal: String,
      roles: Seq[String] = Nil, aclCol: String = "read_roles",
      userDefault: Option[Seq[String]] = None,
      systemDefault: Option[Seq[String]] = None): DataFrame = {
    val who = (principal +: roles).distinct
    if (who.contains("$admins")) return log
    val whoArr = array((who :+ "$all").map(lit): _*)
    def defaultAllowed(d: Option[Seq[String]], fallback: Boolean): Column = d match {
      case Some(rs) => arrays_overlap(array(rs.map(lit): _*), whoArr)
      case None => lit(fallback)
    }
    val side = acls.select(col("stream_id"), col(aclCol).as("_acl_roles"))
    log.join(broadcast(side), Seq("stream_id"), "left")
      .where(
        when(col("_acl_roles").isNotNull, arrays_overlap(col("_acl_roles"), whoArr))
          .otherwise(when(col("stream_id").startsWith(EventEnvelope.SystemPrefix),
            defaultAllowed(systemDefault, fallback = false))
            .otherwise(defaultAllowed(userDefault, fallback = true))))
      .drop("_acl_roles")
  }

  /** Read-with-ACLs in one call: parse the log's own metastreams AND the
    * `$settings` defaults, then enforce the read slot — the shape of the
    * reference's every-read check. */
  def readAs(log: DataFrame, principal: String, roles: Seq[String] = Nil): DataFrame = {
    val (userDef, sysDef) = settingsDefaults(log)
    applyAcl(log.where(!col("stream_id").startsWith(EventEnvelope.MetastreamPrefix) &&
        col("stream_id") =!= SettingsStream),
      aclFromLog(log), principal, roles,
      userDefault = userDef, systemDefault = sysDef)
  }

  /** Which of `streams` the principal may NOT write — the `$w` slot of
    * the same ACL machinery, for ingest tooling to check before an append
    * (the reference enforces writes in StorageWriter the same way reads
    * are enforced in StorageReaderWorker). */
  def deniedWrites(log: DataFrame, streams: Seq[String], principal: String,
      roles: Seq[String] = Nil): Set[String] = {
    val spark = log.sparkSession
    import spark.implicits._
    val (userDef, sysDef) = settingsDefaults(log, slot = "w")
    val allowed = applyAcl(streams.toDF("stream_id"), aclFromLog(log),
        principal, roles, aclCol = "write_roles",
        userDefault = userDef, systemDefault = sysDef)
      .as[String].collect().toSet
    streams.toSet -- allowed
  }

  /** Which of `streams` the principal may NOT delete — the `$d` slot
    * (StreamAcl.cs:11 DeleteRoles; enforced before soft/hard deletes the
    * way StorageWriter checks $w). Same defaults: unprotected user streams
    * deletable, system streams admin-only. */
  def deniedDeletes(log: DataFrame, streams: Seq[String], principal: String,
      roles: Seq[String] = Nil): Set[String] =
    deniedFor(log, streams, principal, roles, "d", "delete_roles")

  /** Which of `streams` the principal may NOT write metadata for — the
    * `$mw` slot (MetaWriteRoles) gating `$$<stream>` appends
    * (setMetadata / softDelete, which IS a metadata write). */
  def deniedMetaWrites(log: DataFrame, streams: Seq[String], principal: String,
      roles: Seq[String] = Nil): Set[String] =
    deniedFor(log, streams, principal, roles, "mw", "meta_write_roles")

  private def deniedFor(log: DataFrame, streams: Seq[String], principal: String,
      roles: Seq[String], slot: String, aclCol: String): Set[String] = {
    val spark = log.sparkSession
    import spark.implicits._
    val (userDef, sysDef) = settingsDefaults(log, slot = slot)
    val allowed = applyAcl(streams.toDF("stream_id"), aclFromLog(log),
        principal, roles, aclCol = aclCol,
        userDefault = userDef, systemDefault = sysDef)
      .as[String].collect().toSet
    streams.toSet -- allowed
  }

  /** Metastream reads (`$$<stream>` rows) the principal may see — the
    * `$mr` slot (MetaReadRoles) of the TARGET stream gates reading its
    * metadata, the reference's getMetadata-via-read path
    * (StorageReaderWorker checks the original stream's metaRead ACL for
    * `$$`-prefixed reads). Defaults follow the target stream's class:
    * user-stream metadata open, system-stream metadata admin-only. */
  def readMetaAs(log: DataFrame, principal: String,
      roles: Seq[String] = Nil): DataFrame = {
    val (userDef, sysDef) = settingsDefaults(log, slot = "mr")
    val metaRows = log
      .where(col("stream_id").startsWith(EventEnvelope.MetastreamPrefix))
      // enforce on the TARGET stream id, restore the metastream id after
      .withColumn("_meta_id", col("stream_id"))
      .withColumn("stream_id", expr("substring(stream_id, 3)"))
    applyAcl(metaRows, aclFromLog(log), principal, roles,
        aclCol = "meta_read_roles",
        userDefault = userDef, systemDefault = sysDef)
      .withColumn("stream_id", col("_meta_id")).drop("_meta_id")
  }

  /** Raised by the `*As` guard helpers when the principal lacks the slot. */
  final class AclDeniedException(msg: String) extends SecurityException(msg)

  private def deny(op: String, stream: String, principal: String): Nothing =
    throw new AclDeniedException(s"$principal may not $op '$stream'")

  /** softDelete guarded by `$d` (a delete is both a delete — $d — and a
    * metastream append, but the reference gates deletes on $d alone). */
  def softDeleteAs(store: graft.sources.EventLogStore, streamId: String,
      principal: String, roles: Seq[String] = Nil): Unit = {
    if (deniedDeletes(store.read(), Seq(streamId), principal, roles).nonEmpty)
      deny("delete", streamId, principal)
    store.softDelete(streamId)
  }

  /** tombstone (hard delete) guarded by the same `$d` slot. */
  def tombstoneAs(store: graft.sources.EventLogStore, streamId: String,
      principal: String, roles: Seq[String] = Nil): Unit = {
    if (deniedDeletes(store.read(), Seq(streamId), principal, roles).nonEmpty)
      deny("delete", streamId, principal)
    store.tombstone(streamId)
  }

  /** setMetadata guarded by `$mw`. */
  def setMetadataAs(store: graft.sources.EventLogStore, streamId: String,
      principal: String, roles: Seq[String] = Nil,
      maxCount: Option[Long] = None, maxAgeSec: Option[Long] = None,
      truncateBefore: Option[Long] = None, temp: Option[Boolean] = None): Unit = {
    if (deniedMetaWrites(store.read(), Seq(streamId), principal, roles).nonEmpty)
      deny("write metadata for", streamId, principal)
    store.setMetadata(streamId, maxCount, maxAgeSec, truncateBefore, temp)
  }

  /** Set an `$acl` on a stream via the store's metadata stream (helper for
    * tests and ingest tooling; slots with None are left unset). */
  def aclJson(read: Option[Seq[String]] = None, write: Option[Seq[String]] = None,
      delete: Option[Seq[String]] = None, metaRead: Option[Seq[String]] = None,
      metaWrite: Option[Seq[String]] = None): String = {
    def slot(k: String, v: Option[Seq[String]]) =
      v.map(rs => s""""$$$k":${rs.map(r => s""""$r"""").mkString("[", ",", "]")}""")
    val slots = Seq(slot("r", read), slot("w", write), slot("d", delete),
      slot("mr", metaRead), slot("mw", metaWrite)).flatten
    s"""{"$$acl":{${slots.mkString(",")}}}"""
  }
}
