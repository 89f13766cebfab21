package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Model-based property test for the SQL DML surface: a random sequence of
  * INSERT / DELETE / UPDATE / MERGE INTO / TRUNCATE statements — issued as
  * plain SQL against a catalog table — is mirrored into an in-memory map
  * model, and after EVERY statement the table must agree with the model
  * exactly. This is the statement-level counterpart of
  * [[LogModelPropertySpec]]: the Scala-API model test proves the mutation
  * machinery; this one proves the SQL plumbing ON TOP of it (analyzer
  * rewrites, filter translation, assignment alignment, catalog resolution)
  * drops, duplicates, or corrupts nothing across arbitrary interleavings.
  */
class SqlDmlModelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("sqlmodel").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sql-dml-model-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.catalog.straw", classOf[StrawCatalog].getName)
      .config("spark.sql.catalog.straw.warehouse", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  test("random SQL DML sequences keep table == model at every statement") {
    val rnd = new scala.util.Random(90913L)
    spark.sql("CREATE TABLE straw.model (id BIGINT, v BIGINT, tag STRING)")
    // id -> (v, tag); ids unique by construction (MERGE key contract)
    var model = Map.empty[Long, (Long, String)]
    var nextId = 0L

    def tag(): String = s"t${rnd.nextInt(4)}"

    def check(step: String): Unit = {
      val got = spark.sql("SELECT id, v, tag FROM straw.model").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got == model, s"divergence after: $step " +
        s"(table ${got.size} rows, model ${model.size})")
    }

    val steps = 40
    for (i <- 0 until steps) {
      rnd.nextInt(7) match {
        case 0 => // INSERT a small batch of fresh ids
          val rows = (0 until 1 + rnd.nextInt(4)).map { k =>
            val id = nextId + k; (id, rnd.nextInt(100).toLong, tag())
          }
          nextId += rows.length
          val values = rows.map { case (id, v, t) => s"($id, $v, '$t')" }.mkString(", ")
          spark.sql(s"INSERT INTO straw.model VALUES $values")
          model ++= rows.map { case (id, v, t) => id -> (v, t) }
          check(s"[$i] INSERT $values")

        case 1 => // DELETE by tag or id range
          if (rnd.nextBoolean()) {
            val t = tag()
            spark.sql(s"DELETE FROM straw.model WHERE tag = '$t'")
            model = model.filterNot(_._2._2 == t)
            check(s"[$i] DELETE tag=$t")
          } else {
            val lo = rnd.nextLong(math.max(1L, nextId + 1))
            spark.sql(s"DELETE FROM straw.model WHERE id >= $lo AND v < 50")
            model = model.filterNot { case (id, (v, _)) => id >= lo && v < 50 }
            check(s"[$i] DELETE id>=$lo v<50")
          }

        case 2 => // UPDATE with expression assignment
          val t = tag()
          spark.sql(
            s"UPDATE straw.model SET v = v + 1000, tag = upper(tag) WHERE tag = '$t'")
          model = model.map {
            case (id, (v, tg)) if tg == t => id -> (v + 1000, tg.toUpperCase)
            case e => e
          }
          check(s"[$i] UPDATE tag=$t")

        case 3 => // MERGE upsert: half existing ids mutated, half fresh
          if (model.nonEmpty) {
            val existing = model.keys.toSeq.sorted
              .take(1 + rnd.nextInt(math.min(4, model.size)))
            val fresh = (0 until 1 + rnd.nextInt(3)).map(k => nextId + k)
            nextId += fresh.length
            val src = (existing ++ fresh).map(id => (id, rnd.nextInt(100).toLong, tag()))
            val values = src.map { case (id, v, t) => s"($id, $v, '$t')" }.mkString(", ")
            spark.sql(
              s"""MERGE INTO straw.model AS tgt
                 |USING (SELECT * FROM VALUES $values AS s(id, v, tag)) AS src
                 |ON tgt.id = src.id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
            model ++= src.map { case (id, v, t) => id -> (v, t) }
            check(s"[$i] MERGE $values")
          }

        case 4 => // MERGE delete: matched ids vanish
          if (model.nonEmpty) {
            val victims = rnd.shuffle(model.keys.toSeq)
              .take(1 + rnd.nextInt(math.min(3, model.size)))
            val values = victims.map(id => s"($id)").mkString(", ")
            spark.sql(
              s"""MERGE INTO straw.model
                 |USING (SELECT col1 AS id, 0 AS v, 'x' AS tag
                 |       FROM VALUES $values) AS src
                 |ON model.id = src.id
                 |WHEN MATCHED THEN DELETE""".stripMargin)
            model --= victims
            check(s"[$i] MERGE-DELETE $values")
          }

        case 5 => // occasionally truncate (keeps schema), else no-op insert
          if (rnd.nextInt(4) == 0) {
            spark.sql("TRUNCATE TABLE straw.model")
            model = Map.empty
            check(s"[$i] TRUNCATE")
          }

        case 6 => // GENERAL merge: conditional clauses (first-match-wins),
          // partial assignments, conditional inserts, NOT MATCHED BY SOURCE
          if (model.nonEmpty) {
            val existing = rnd.shuffle(model.keys.toSeq)
              .take(1 + rnd.nextInt(math.min(4, model.size)))
            val fresh = (0 until rnd.nextInt(3)).map(k => nextId + k)
            nextId += fresh.length
            val src = (existing ++ fresh).map(id => (id, rnd.nextInt(100).toLong))
            val cut = 20 + rnd.nextInt(60)
            val values = src.map { case (id, sv) => s"($id, $sv)" }.mkString(", ")
            spark.sql(
              s"""MERGE INTO straw.model AS tgt
                 |USING (SELECT col1 AS id, col2 AS sv FROM VALUES $values) AS src
                 |ON tgt.id = src.id
                 |WHEN MATCHED AND src.sv >= $cut THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET v = tgt.v + src.sv
                 |WHEN NOT MATCHED AND src.sv < $cut
                 |  THEN INSERT (id, v, tag) VALUES (src.id, src.sv, 'gen')
                 |WHEN NOT MATCHED BY SOURCE AND tgt.v % 7 = 0
                 |  THEN UPDATE SET tag = 'orph'""".stripMargin)
            val srcMap = src.toMap
            val pre = model
            model = pre.flatMap { case (id, (v, tg)) =>
              srcMap.get(id) match {
                case Some(sv) if sv >= cut => None // matched clause 1: delete
                case Some(sv) => Some(id -> (v + sv, tg)) // clause 2: partial
                case None if v % 7 == 0 => Some(id -> (v, "orph")) // by source
                case None => Some(id -> (v, tg))
              }
            }
            model ++= src.collect {
              case (id, sv) if !pre.contains(id) && sv < cut => id -> (sv, "gen")
            }
            check(s"[$i] GENERAL-MERGE cut=$cut $values")
          }
      }
    }
    // the audit trail recorded every effective mutation
    val hist = StrawLog.history(s"$warehouse/model")
    assert(hist.nonEmpty && hist.exists(_.operation == "append"))
    spark.sql("DROP TABLE straw.model")
  }
}
