package graft

import graft.operators.Relational
import graft.sources.JsonTables
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavioral equivalence against the reference's own executed test
 * expectations (reference:
 * src/test/java/com/google/cloud/bqetl/mbdata/MusicBrainzTransformsTest.java)
 * on the reference's own test data (the json files under
 * src/test/resources):
 * - joinArtistCreditsWithRecordings: the credit⋈recording inner join
 *   yields exactly 448 rows and contains recordings 17069165 and
 *   15508507 (MusicBrainzTransformsTest.java:97-115).
 * - testNest: nesting credited recordings under artists yields one
 *   artist carrying 448 nested recordings
 *   (MusicBrainzTransformsTest.java:185-198).
 */
class ReferenceFidelitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val res = "/root/reference/src/test/resources"

  private def lines(name: String) =
    spark.read.textFile(s"$res/$name.json")

  private lazy val artists =
    JsonTables.loadTableInferred(lines("artist"), "artist")
  private lazy val credits =
    JsonTables.loadTableInferred(lines("artist_credit_name"), "artist_credit_name")
  private lazy val recordings =
    JsonTables.loadTableInferred(lines("recording"), "recording")

  test("credit x recording join matches the reference's 448-row expectation") {
    val joined = Relational.innerJoinMerge(credits, recordings,
      "artist_credit_name_artist_credit", "recording_artist_credit")
    assert(joined.count() == 448L)
    val ids = joined.select("recording_id").as[Long].collect().toSet
    assert(ids.contains(17069165L) && ids.contains(15508507L))
  }

  test("nesting credited recordings under artists matches the reference's shape") {
    val credited = Relational.innerJoinMerge(credits, recordings,
      "artist_credit_name_artist_credit", "recording_artist_credit")
    val nested = Relational.nest(artists, credited,
      "artist_id", "artist_credit_name_artist", "artist_recordings", inner = true)
    val rows = nested.collect()
    assert(rows.length == 1)
    val recs = rows(0).getAs[scala.collection.Seq[Row]]("artist_recordings")
    assert(recs.length == 448)
  }

  test("keyed load exposes the expected artist_credit keys") {
    val keys = Relational.keyBy(credits, "artist_credit_name_artist_credit")
      .select("key").as[Long].collect().toSet
    assert(keys.contains(634509L) && keys.contains(846332L))
  }
}
