package graft.spark

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Model check of the column-mapping algebra: a random interleaving of
  * RENAME / DROP / ADD / WRITE steps is applied to both the real
  * [[ColumnMappingState]] and a trivially-correct model that tracks column
  * IDENTITIES. After every step, every historical "file" must translate to
  * exactly the live columns it holds data for, under their current names —
  * dropped data never resurfaces, renames never lose data, and no two live
  * columns collide on a spelling. */
class ColumnMappingPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  // model: a column identity is a unique Int; files record (spelling ->
  // identity) at write time; the live table maps identity -> current name
  private case class Model(
      live: Map[Int, String], // identity -> logical name
      files: List[Map[String, Int]], // written files: spelling -> identity
      nextId: Int)

  private sealed trait Step
  private case class Rename(fromIdx: Int, to: String) extends Step
  private case class Drop(idx: Int) extends Step
  private case class Add(name: String) extends Step
  private case object Write extends Step

  private val names = Vector("a", "b", "c", "d", "e")

  private val stepGen: Gen[Step] = Gen.frequency(
    3 -> (for { i <- Gen.choose(0, 9); n <- Gen.oneOf(names) } yield Rename(i, n)),
    2 -> Gen.choose(0, 9).map(Drop(_)),
    2 -> Gen.oneOf(names).map(Add(_)),
    3 -> Gen.const(Write))

  test("random DDL interleavings: translation matches the identity model") {
    check(Prop.forAllNoShrink(Gen.listOfN(40, stepGen)) { steps =>
      var state = ColumnMappingState.Empty
      // start with two columns, one initial file
      var model = Model(Map(0 -> "a", 1 -> "b"), Nil, 2)
      var version = 1
      def spellingOf(name: String): String = state.writeSpelling(name)
      // the initial file, written pre-any-DDL
      model = model.copy(files =
        model.live.map { case (id, n) => (n, id) } :: model.files)

      steps.foreach { step =>
        version += 1
        step match {
          case Rename(fromIdx, to) =>
            val liveNames = model.live.values.toVector.sorted
            if (liveNames.nonEmpty) {
              val from = liveNames(fromIdx % liveNames.size)
              if (!model.live.values.exists(_ == to) && from != to) {
                state = ColumnMappingState.rename(state, from, to, s"@v$version")
                val id = model.live.find(_._2 == from).get._1
                model = model.copy(live = model.live + (id -> to))
              }
            }
          case Drop(idx) =>
            // keep at least one column (the catalog guards this too)
            if (model.live.size > 1) {
              val liveNames = model.live.values.toVector.sorted
              val name = liveNames(idx % liveNames.size)
              state = ColumnMappingState.drop(state, name)
              val id = model.live.find(_._2 == name).get._1
              model = model.copy(live = model.live - id)
            }
          case Add(name) =>
            if (!model.live.values.exists(_ == name)) {
              val sp = ColumnMappingState.addSpelling(state, name, s"@v$version")
              state = ColumnMappingState.add(state, name, sp)
              model = model.copy(live = model.live + (model.nextId -> name),
                nextId = model.nextId + 1)
            }
          case Write =>
            // a new file spells every live column the way a write would
            model = model.copy(files =
              model.live.map { case (id, n) => (spellingOf(n), id) } :: model.files)
        }

        // ---- invariants after every step ----
        // 1. live logical names are unique (model guarantees; check state's
        //    write spellings don't collide either)
        val liveNames = model.live.values.toSeq
        val spells = liveNames.map(spellingOf)
        assert(spells.distinct.size == spells.size,
          s"write-spelling collision: $liveNames -> $spells\nstate=$state")

        // 2. every file translates to exactly its live columns, correctly named
        model.files.foreach { file =>
          val fileSchema = StructType(
            file.keys.toSeq.sorted.map(StructField(_, LongType)))
          val translated = state.toLogical(fileSchema).fieldNames.toSet
          val expected = file.collect {
            case (_, id) if model.live.contains(id) => model.live(id)
          }.toSet
          assert(translated == expected,
            s"file $file translated to $translated, expected $expected\n" +
              s"live=${model.live}\nstate=$state")
          // leaf-aligned variant tombstones instead of removing
          val footerT = state.toLogicalFooter(fileSchema)
          assert(footerT.length == fileSchema.length)
          val visible = footerT.fieldNames
            .filterNot(_.startsWith(ColumnMappingState.DroppedPrefix)).toSet
          assert(visible == expected,
            s"footer translation $visible, expected $expected")
        }
      }
      true
    })
  }

  // ---- nested model: one struct column whose CHILD fields rename/drop
  // while the PARENT itself renames — the interleavings that exercise the
  // logical-parent/physical-leaf keying (children must follow a renamed
  // parent; a child renamed under the new parent must still translate
  // files written under the old one).

  private sealed trait NStep
  private case class NRenameParent(to: String) extends NStep
  private case class NRenameChild(idx: Int, to: String) extends NStep
  private case class NDropChild(idx: Int) extends NStep
  private case object NWrite extends NStep

  private val nStepGen: Gen[NStep] = Gen.frequency(
    2 -> Gen.oneOf(names).map(NRenameParent(_)),
    3 -> (for { i <- Gen.choose(0, 9); n <- Gen.oneOf(names) } yield NRenameChild(i, n)),
    2 -> Gen.choose(0, 9).map(NDropChild(_)),
    3 -> Gen.const(NWrite))

  test("random NESTED DDL interleavings: translation matches the identity model") {
    check(Prop.forAllNoShrink(Gen.listOfN(40, nStepGen)) { steps =>
      var state = ColumnMappingState.Empty
      var pname = "s0" // parent's live logical name (outside `names`)
      var children = Map(0 -> "a", 1 -> "b") // child identity -> leaf name
      // files: (parent spelling, child leaf spelling -> identity)
      var files = List.empty[(String, Map[String, Int])]
      var version = 1

      def childWriteSpelling(cname: String): (String, String) = {
        // full physical path for a write of parent.child, split at level
        val full = state.writeLeafPath(s"$pname.$cname")
        val dot = full.indexOf('.')
        (full.substring(0, dot), full.substring(dot + 1))
      }
      def writeFile(): Unit = {
        val pPhys = state.writeSpelling(pname)
        files = (pPhys,
          children.map { case (id, n) => (childWriteSpelling(n)._2, id) }) :: files
      }
      writeFile() // one pre-DDL file

      steps.foreach { step =>
        version += 1
        step match {
          case NRenameParent(to0) =>
            val to = "s_" + to0
            if (to != pname) {
              state = ColumnMappingState.rename(state, pname, to, s"@v$version")
              pname = to
            }
          case NRenameChild(idx, to) =>
            val live = children.values.toVector.sorted
            val from = live(idx % live.size)
            if (from != to && !children.values.exists(_ == to)) {
              state = ColumnMappingState.rename(state,
                s"$pname.$from", s"$pname.$to", s"@v$version")
              val id = children.find(_._2 == from).get._1
              children = children + (id -> to)
            }
          case NDropChild(idx) =>
            if (children.size > 1) {
              val live = children.values.toVector.sorted
              val name = live(idx % live.size)
              state = ColumnMappingState.drop(state, s"$pname.$name")
              val id = children.find(_._2 == name).get._1
              children = children - id
            }
          case NWrite => writeFile()
        }

        // 1. live children's write spellings stay distinct, and they all
        //    land under the SAME physical parent spelling
        val spells = children.values.toSeq.map(childWriteSpelling)
        assert(spells.map(_._2).distinct.size == spells.size,
          s"child write-spelling collision: $children -> $spells\nstate=$state")
        assert(spells.map(_._1).distinct.size <= 1,
          s"children split across parent spellings: $spells\nstate=$state")

        // 2. every file translates to the live children it holds, under
        //    their CURRENT names, inside the parent's CURRENT name
        files.foreach { case (pPhys, kids) =>
          val fileSchema = StructType(Seq(StructField(pPhys, StructType(
            kids.keys.toSeq.sorted.map(StructField(_, LongType))))))
          val t = state.toLogical(fileSchema)
          assert(t.length == 1 && t.fields(0).name == pname,
            s"parent $pPhys translated to ${t.fieldNames.mkString} (want $pname)\nstate=$state")
          val gotKids = t.fields(0).dataType
            .asInstanceOf[StructType].fieldNames.toSet
          val expected = kids.collect {
            case (_, id) if children.contains(id) => children(id) }.toSet
          assert(gotKids == expected,
            s"file ($pPhys, $kids) children -> $gotKids, expected $expected\n" +
              s"live=$children pname=$pname\nstate=$state")
          // footer variant: positions preserved, tombstones invisible
          val ft = state.toLogicalFooter(fileSchema)
          val inner = ft.fields(0).dataType.asInstanceOf[StructType]
          assert(inner.length == kids.size)
          val visible = inner.fieldNames
            .filterNot(_.startsWith(ColumnMappingState.DroppedPrefix)).toSet
          assert(visible == expected,
            s"footer children $visible, expected $expected\nstate=$state")
        }
      }
      true
    })
  }
}
