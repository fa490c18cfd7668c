package graft

import java.nio.file.{Files, Paths}

/** Harness-level checks of the driver contract itself. */
class HarnessSpec extends SparkTestBase {

  test("every oracle key has a query, and oracle SQL aliases match outputs") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("Verify main writes one dir per query plus parseable oracle json") {
    val out = Files.createTempDirectory(Paths.get("target"), "verify").toString
    Verify.main(Array(sfDir, out))
    val entries = new java.io.File(out).list().toSet
    SparkEntry.queries.keySet.foreach { q =>
      assert(entries.contains(q), s"missing output dir for $q")
    }
    val json = new String(Files.readAllBytes(Paths.get(out, "oracle_sql.json")))
    // minimal JSON sanity: every oracle key quoted, no raw control chars
    SparkEntry.oracleSql.keySet.foreach { k =>
      assert(json.contains("\"" + k + "\""), s"oracle json missing $k")
    }
    assert(!json.exists(c => c < ' '), "raw control characters in oracle json")
  }

  test("flagship entry returns rows on the smoke dataset") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no query output carries array/map/binary columns (driver compare chokes on them)") {
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType}
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType]
          || f.dataType == BinaryType => f.name
      }
      assert(bad.isEmpty, s"$name outputs non-scalar columns: ${bad.mkString(",")}")
    }
  }
}
