package graft.domain

import graft.SparkSpec
import graft.ops.Kernels
import org.apache.spark.sql.functions._

class SocialAclSpec extends SparkSpec {
  import spark.implicits._

  private def edges = Kernels.normalizeEdge(
    Seq((1, 2), (3, 1), (2, 4)).toDF("a", "b"), "a", "b")

  test("friendsOf finds both edge directions") {
    val users = Seq((1, "u1"), (2, "u2"), (3, "u3"), (4, "u4")).toDF("userid", "email")
    val got = Social.friendsOf(edges, users, "userid", lit(1))
      .select("userid").as[Int].collect().sorted.toSeq
    assert(got == Seq(2, 3))
  }

  test("friendshipProbe is direction-insensitive") {
    assert(Social.friendshipProbe(edges, lit(3), lit(1)).count() == 1)
    assert(Social.friendshipProbe(edges, lit(1), lit(3)).count() == 1)
    assert(Social.friendshipProbe(edges, lit(3), lit(4)).count() == 0)
  }

  test("validateRequests applies guards in precedence order") {
    val requests = Seq(
      (10L, 5L, 5L),   // self
      (11L, 2L, 1L),   // already friends (edge 1-2)
      (12L, 9L, 8L),   // dup pending (pending 8-9 below)
      (13L, 5L, 6L)    // clean
    ).toDF("requestid", "fromuserid", "touserid")
    val pending = Seq((8L, 9L, "PENDING"), (5L, 7L, "REJECTED"))
      .toDF("fromuserid", "touserid", "status")
    val got = Social.validateRequests(requests, pending, edges.select(
        col("u1").cast("long").as("u1"), col("u2").cast("long").as("u2")))
      .select("requestid", "verdict").as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "REJECT_SELF", 11L -> "REJECT_ALREADY_FRIENDS",
      12L -> "REJECT_DUPLICATE_PENDING", 13L -> "ACCEPT"))
  }

  test("transition: PENDING-only transitions; accepted yields normalized edge") {
    val requests = Seq(
      (1L, 5L, 9L, "PENDING"), (2L, 6L, 3L, "PENDING"), (3L, 7L, 8L, "ACCEPTED"))
      .toDF("requestid", "fromuserid", "touserid", "status")
    val decisions = Seq((1L, "ACCEPTED"), (3L, "REJECTED"))
      .toDF("requestid", "decision")
    val (updated, newEdges) = Social.transition(requests, decisions)
    val statuses = updated.select("requestid", "status").as[(Long, String)].collect().toMap
    assert(statuses == Map(1L -> "ACCEPTED", 2L -> "PENDING", 3L -> "ACCEPTED"))
    val e = newEdges.as[(Long, Long)].collect().toSeq
    assert(e == Seq((5L, 9L)))
  }

  test("accessibleLists = owned ∪ public ∪ shared-with-me, deduped") {
    val lists = Seq(
      (1L, 10L, false), (2L, 20L, true), (3L, 30L, false), (4L, 10L, true))
      .toDF("listid", "ownerid", "is_public")
    val shares = Seq((3L, 10L), (1L, 10L)).toDF("listid", "userid")
    val got = Acl.accessibleLists(lists, shares, lit(10L))
      .select("listid").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L))
  }

  test("visibleReviews: public list shows all, private only owner/reviewer") {
    val reviews = Seq((1L, 100L, "r1"), (1L, 200L, "r2"), (2L, 100L, "r3"), (2L, 300L, "r4"))
      .toDF("listid", "userid", "body")
    val lists = Seq((1L, 999L, true), (2L, 300L, false)).toDF("listid", "ownerid", "is_public")
    // uid=100: sees all of list 1 (public), own review on private list 2
    val got = Acl.visibleReviews(reviews, lists, lit(100L))
      .select("body").as[String].collect().sorted.toSeq
    assert(got == Seq("r1", "r2", "r3"))
    // uid=300 owns list 2: sees r3, r4 + public list
    val owner = Acl.visibleReviews(reviews, lists, lit(300L))
      .select("body").as[String].collect().sorted.toSeq
    assert(owner == Seq("r1", "r2", "r3", "r4"))
  }

  test("ledger overdraft detection flags rows after balance goes negative") {
    val ledger = Seq((1L, 1L, 100.0), (1L, 2L, -150.0), (1L, 3L, 500.0), (2L, 1L, 50.0))
      .toDF("account", "seq", "amount")
    val bad = Ledger.overdrafts(ledger, "account", col("amount"), Seq(col("seq")))
    assert(bad.count() == 1)
    assert(bad.select("seq").as[Long].head() == 2L)
  }
}
