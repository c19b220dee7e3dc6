package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Kernels

/** List/review access control — the reference's visibility model
  * (`lists.js:155-233`, `reviews.js:204-260`; SURVEY §2 J5/J6/M2/M3,
  * §3 trace 3).
  *
  * Row-level security done in-plan: the reference filters reviews in
  * JS after fetching (`reviews.js:243-251`); here every visibility
  * rule is a Column predicate Catalyst can push to the scan.
  */
object Acl {

  /** Lists accessible to `uid`: owned ∪ public ∪ shared-with-me —
    * the WHERE disjunction of `lists.js:190-195` with the EXISTS leg
    * as a semi-join. */
  def accessibleLists(lists: DataFrame, shares: DataFrame, uid: Column,
                      ownerCol: String = "ownerid",
                      publicCol: String = "is_public"): DataFrame = {
    val mine = lists.filter(col(ownerCol) === uid || col(publicCol))
    val sharedToMe = Kernels.accessibleBy(
      lists, shares.filter(col("userid") === uid), Seq("listid"))
    mine.union(sharedToMe).dropDuplicates("listid")
  }

  /** Visibility tag per list — the app-side mapping `lists.js:201-220`
    * (M2) as a projection: public > shared > private. */
  def withVisibility(lists: DataFrame, shares: DataFrame,
                     publicCol: String = "is_public"): DataFrame =
    Kernels.existsFlags(lists, shares, Seq("listid"),
        Map("has_shares" -> max(lit(true))))
      .withColumn("visibility",
        when(col(publicCol), "public")
          .when(col("has_shares"), "shared")
          .otherwise("private"))
      .drop("has_shares")

  /** Reviews visible to `uid` — the row-level rule the reference
    * applies post-hoc in JS (`reviews.js:243-251`, M3): on a public
    * list every review is visible; on a private list only the
    * reviewer's own and the list owner's view. Pushed into the plan
    * as one joined filter. */
  def visibleReviews(reviews: DataFrame, lists: DataFrame, uid: Column,
                     ownerCol: String = "ownerid",
                     publicCol: String = "is_public"): DataFrame =
    reviews.join(lists.select(col("listid"), col(ownerCol), col(publicCol)), Seq("listid"))
      .filter(col(publicCol) || col("userid") === uid || col(ownerCol) === uid)
}
