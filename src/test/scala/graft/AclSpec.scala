package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Acl
import graft.sources.{EventLogStore, PendingEvent}

/** Stream ACLs: `$acl` parse + read-time enforcement
  * (StreamAcl.cs:11; StorageReaderWorker pre-read check). */
class AclSpec extends SparkTestBase {

  private def store(): EventLogStore = {
    val s = new EventLogStore(spark, Files.createTempDirectory("graftacl").toString)
    s.append(Seq(
      PendingEvent("open-1", "e1", "E", "{}"),
      PendingEvent("secret-1", "e2", "E", "{}"),
      PendingEvent("secret-1", "e3", "E", "{}"),
      PendingEvent("team-1", "e4", "E", "{}")))
    // $acl via the metastream, both array and single-string forms
    s.append(Seq(PendingEvent("$$secret-1", "m1", "$metadata",
      Acl.aclJson(read = Some(Seq("auditors", "ouro"))))))
    s.append(Seq(PendingEvent("$$team-1", "m2", "$metadata",
      """{"$acl":{"$r":"team"}}""")))
    s
  }

  test("aclFromLog parses array and single-string role forms; latest wins") {
    val s = store()
    val acls = Acl.aclFromLog(s.read()).collect()
      .map(r => r.getString(0) -> Option(r.getSeq[String](1)).map(_.toSet))
      .toMap
    assert(acls("secret-1").contains(Set("auditors", "ouro")))
    assert(acls("team-1").contains(Set("team")))
    // overwrite: a later metadata event replaces the ACL
    s.append(Seq(PendingEvent("$$team-1", "m3", "$metadata",
      """{"$acl":{"$r":["team","leads"]}}""")))
    val acls2 = Acl.aclFromLog(s.read()).collect()
      .map(r => r.getString(0) -> Option(r.getSeq[String](1)).map(_.toSet))
      .toMap
    assert(acls2("team-1").contains(Set("team", "leads")))
  }

  test("readAs filters by the read slot: grant, deny, $all, $admins bypass") {
    val s = store()
    def visible(principal: String, roles: Seq[String] = Nil): Set[String] =
      Acl.readAs(s.read(), principal, roles)
        .select("stream_id").distinct().collect().map(_.getString(0)).toSet
    // no ACL -> default open for user streams; explicit ACL denies outsiders
    assert(visible("alice") == Set("open-1"))
    // role grant and principal-name grant
    assert(visible("bob", Seq("auditors")) == Set("open-1", "secret-1"))
    assert(visible("ouro") == Set("open-1", "secret-1"))
    assert(visible("carol", Seq("team")) == Set("open-1", "team-1"))
    // admins see everything (including unprotected system streams)
    val admin = visible("dave", Seq("$admins"))
    assert(Set("open-1", "secret-1", "team-1").subsetOf(admin))
  }

  test("$settings overrides the default ACLs for unprotected streams") {
    val s = store()
    // default: open-1 (no $acl) is readable by anyone
    assert(Acl.readAs(s.read(), "alice")
      .select("stream_id").distinct().collect().map(_.getString(0)).toSet == Set("open-1"))
    // restrict user streams to 'staff'; grant $-streams to 'ops'
    s.append(Seq(PendingEvent(Acl.SettingsStream, "s1", "$settings-updated",
      """{"$userStreamAcl":{"$r":["staff"]},"$systemStreamAcl":{"$r":"ops"}}""")))
    s.append(Seq(PendingEvent("$sys-audit", "s2", "Audit", "{}")))
    def visible(p: String, rs: Seq[String] = Nil): Set[String] =
      Acl.readAs(s.read(), p, rs)
        .select("stream_id").distinct().collect().map(_.getString(0)).toSet
    assert(visible("alice") == Set.empty) // default no longer open
    assert(visible("bob", Seq("staff")) == Set("open-1"))
    // explicit $acl still wins over the default
    assert(visible("ouro") == Set("secret-1"))
    // system default grants ops; $settings itself is never exposed
    assert(visible("carol", Seq("ops", "staff")) == Set("open-1", "$sys-audit"))
    assert(!visible("root", Seq("$admins")).contains(Acl.SettingsStream))
  }

  test("deniedWrites enforces the $w slot with the same defaults") {
    val s = store()
    s.append(Seq(PendingEvent("$$team-1", "w1", "$metadata",
      """{"$acl":{"$r":"team","$w":["leads"]}}""")))
    val streams = Seq("open-1", "team-1", "$sys-x")
    // plain user: may write unprotected user streams only
    assert(Acl.deniedWrites(s.read(), streams, "alice") == Set("team-1", "$sys-x"))
    // the $w role may write team-1; $r alone may not
    assert(Acl.deniedWrites(s.read(), streams, "bob", Seq("leads")) == Set("$sys-x"))
    assert(Acl.deniedWrites(s.read(), streams, "carol", Seq("team")) == Set("team-1", "$sys-x"))
    assert(Acl.deniedWrites(s.read(), streams, "root", Seq("$admins")) == Set.empty)
  }

  test("$d gates deletes: softDeleteAs/tombstoneAs deny without the role") {
    val s = store()
    s.append(Seq(PendingEvent("$$team-1", "d1", "$metadata",
      Acl.aclJson(read = Some(Seq("$all")), delete = Some(Seq("janitors"))))))
    // non-$d principal cannot delete (neither soft nor hard)
    intercept[Acl.AclDeniedException] { Acl.softDeleteAs(s, "team-1", "alice") }
    intercept[Acl.AclDeniedException] { Acl.tombstoneAs(s, "team-1", "alice") }
    assert(s.read().where(col("stream_id") === "team-1").count() == 1)
    // the $d role may; the stream is actually truncated
    Acl.softDeleteAs(s, "team-1", "bob", Seq("janitors"))
    assert(s.readRetained().where(col("stream_id") === "team-1").count() == 0)
    // unprotected user streams are deletable by anyone (default)
    Acl.softDeleteAs(s, "open-1", "alice")
    assert(s.readRetained().where(col("stream_id") === "open-1").count() == 0)
    // system streams delete-denied to non-admins, admins bypass
    s.append(Seq(PendingEvent("$sys-audit", "d2", "Audit", "{}")))
    intercept[Acl.AclDeniedException] { Acl.softDeleteAs(s, "$sys-audit", "alice") }
    Acl.softDeleteAs(s, "$sys-audit", "root", Seq("$admins"))
    assert(s.readRetained().where(col("stream_id") === "$sys-audit").count() == 0)
  }

  test("$mw gates metadata writes: setMetadataAs denies without the role") {
    val s = store()
    s.append(Seq(PendingEvent("$$team-1", "w1", "$metadata",
      Acl.aclJson(read = Some(Seq("$all")), metaWrite = Some(Seq("ops"))))))
    intercept[Acl.AclDeniedException] {
      Acl.setMetadataAs(s, "team-1", "alice", maxCount = Some(1L))
    }
    assert(s.getMetadata("team-1").max_count.isEmpty)
    Acl.setMetadataAs(s, "team-1", "eve", Seq("ops"), maxCount = Some(1L))
    assert(s.getMetadata("team-1").max_count.contains(1L))
    // unprotected user stream: open by default; admins bypass explicit ACLs
    Acl.setMetadataAs(s, "open-1", "alice", maxCount = Some(5L))
    Acl.setMetadataAs(s, "team-1", "root", Seq("$admins"), maxCount = Some(9L))
    assert(s.getMetadata("team-1").max_count.contains(9L))
  }

  test("$mr gates metastream reads: readMetaAs filters by the target's slot") {
    val s = store()
    s.append(Seq(PendingEvent("$$secret-1", "r1", "$metadata",
      Acl.aclJson(read = Some(Seq("auditors")), metaRead = Some(Seq("auditors"))))))
    def metaVisible(p: String, rs: Seq[String] = Nil): Set[String] =
      Acl.readMetaAs(s.read(), p, rs)
        .select("stream_id").distinct().collect().map(_.getString(0)).toSet
    // alice sees unprotected user metastreams but not secret-1's
    val alice = metaVisible("alice")
    assert(alice.contains("$$team-1") && !alice.contains("$$secret-1"))
    // the $mr role (and admins) see it
    assert(metaVisible("bob", Seq("auditors")).contains("$$secret-1"))
    assert(metaVisible("root", Seq("$admins")).contains("$$secret-1"))
    // metadata OF a system stream is admin-only by default
    s.append(Seq(PendingEvent("$$$sys-audit", "r2", "$metadata",
      """{"$maxCount":10}""")))
    assert(!metaVisible("alice").contains("$$$sys-audit"))
    assert(metaVisible("root", Seq("$admins")).contains("$$$sys-audit"))
  }

  test("$all in a read ACL grants everyone; system streams default to admins") {
    val s = store()
    s.append(Seq(PendingEvent("$$secret-1", "m4", "$metadata",
      """{"$acl":{"$r":["$all"]}}""")))
    val vis = Acl.readAs(s.read(), "nobody")
      .select("stream_id").distinct().collect().map(_.getString(0)).toSet
    assert(vis.contains("secret-1"))
    // a synthetic $-stream is hidden from non-admins by the system default
    s.append(Seq(PendingEvent("$sys-audit", "m5", "Audit", "{}")))
    val vis2 = Acl.readAs(s.read(), "nobody")
      .select("stream_id").distinct().collect().map(_.getString(0)).toSet
    assert(!vis2.contains("$sys-audit"))
    val vis3 = Acl.readAs(s.read(), "root", Seq("$admins"))
      .select("stream_id").distinct().collect().map(_.getString(0)).toSet
    assert(vis3.contains("$sys-audit"))
  }
}
