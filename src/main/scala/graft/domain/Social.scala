package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Kernels

/** Friendship graph + friend-request state machine — the reference's
  * `friend` / `request` tables and their app-side guards
  * (`users.js`, SURVEY §2 M5, J7, P7, J12).
  *
  * Edges are stored normalized (u1 = least, u2 = greatest), the
  * invariant the reference maintains in JS (`users.js:205-206,317`);
  * every probe is then a single equi semi/anti join — never a
  * disjunctive OR-join (which Spark would plan as a nested loop).
  */
object Social {

  val Pending = "PENDING"
  val Accepted = "ACCEPTED"
  val Rejected = "REJECTED"

  /** Friends of one user — the rewrite of the disjunctive join
    * `users.js:68-77` as a union of two equi-joins (SURVEY J7). */
  def friendsOf(edges: DataFrame, users: DataFrame, userCol: String, v: Column): DataFrame =
    users.join(
      broadcast(Kernels.neighborsOf(edges, "u1", "u2", v)
        .withColumnRenamed("neighbor", userCol)),
      Seq(userCol), "left_semi")

  /** Are (a, b) already friends? — normalized-edge semi probe
    * (`users.js:318-326`). Returns the matching edges (empty = no). */
  def friendshipProbe(edges: DataFrame, a: Column, b: Column): DataFrame =
    edges.filter(col("u1") === least(a, b) && col("u2") === greatest(a, b))

  /** Validate a batch of friend requests against the state machine
    * guards the reference enforces per request (`users.js:301-350`):
    * no self-request, no duplicate pending request (either direction),
    * not already friends. Produces a verdict column; ACCEPTed rows are
    * safe to append to the request table as PENDING.
    *
    * All three guards are anti-join shaped — no per-row probes. */
  def validateRequests(requests: DataFrame, pending: DataFrame,
                       edges: DataFrame): DataFrame = {
    val normReq = requests
      .withColumn("u1", least(col("fromuserid"), col("touserid")))
      .withColumn("u2", greatest(col("fromuserid"), col("touserid")))
    val dupPending = pending.filter(col("status") === Pending)
      .select(least(col("fromuserid"), col("touserid")).as("u1"),
              greatest(col("fromuserid"), col("touserid")).as("u2"),
              lit(true).as("dup_pending")).distinct()
    val friends = edges.select(col("u1"), col("u2"), lit(true).as("already_friends"))
    normReq
      .join(dupPending, Seq("u1", "u2"), "left")
      .join(friends, Seq("u1", "u2"), "left")
      .withColumn("verdict",
        when(col("fromuserid") === col("touserid"), "REJECT_SELF")
          .when(col("already_friends").isNotNull, "REJECT_ALREADY_FRIENDS")
          .when(col("dup_pending").isNotNull, "REJECT_DUPLICATE_PENDING")
          .otherwise("ACCEPT"))
      .drop("u1", "u2", "dup_pending", "already_friends")
  }

  /** Apply an accept/reject decision set to the request table —
    * PENDING-only transitions (`users.js:185-203`, `:252-269`):
    * non-PENDING rows are untouched. Accepted transitions also yield
    * the new (normalized) friend edges to append. */
  def transition(requests: DataFrame, decisions: DataFrame): (DataFrame, DataFrame) = {
    val dec = decisions.select(col("requestid"), col("decision"))
    val updated = requests.join(broadcast(dec), Seq("requestid"), "left")
      .withColumn("status",
        when(col("status") === Pending && col("decision").isNotNull, col("decision"))
          .otherwise(col("status")))
      .drop("decision")
    val newEdges = requests.join(broadcast(dec), Seq("requestid"))
      .filter(col("status") === Pending && col("decision") === Accepted)
      .select(least(col("fromuserid"), col("touserid")).as("u1"),
              greatest(col("fromuserid"), col("touserid")).as("u2"))
      .distinct()
    (updated, newEdges)
  }

  /** Incoming pending requests with requester enrichment —
    * `users.js:132-144` (J4). */
  def incomingPending(requests: DataFrame, users: DataFrame,
                      userKey: String): DataFrame =
    requests.filter(col("status") === Pending)
      .join(broadcast(users), col("fromuserid") === col(userKey))
}
