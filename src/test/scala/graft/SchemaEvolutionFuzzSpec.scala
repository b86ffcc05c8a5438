package graft

import graft.pipeline.SchemaEvolution
import graft.pipeline.SchemaEvolution.TableSchema
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz over random rename/drop/add sequences against an
  * in-memory model of Iceberg's field-id contract (the discipline that
  * found real bugs in the extractor and manifest parsers in round 2):
  *  - a live column's id never changes across any operation sequence;
  *  - ids are never reused — every id ever retired stays retired
  *    (`lastAssignedId` is monotone), so drop + re-add cannot alias;
  *  - names are unique, ids are unique, and `nameOf`/`idOf` invert;
  *  - the schema JSON round-trips exactly through the sidecar
  *    serializer at every step.
  */
class SchemaEvolutionFuzzSpec extends AnyFunSuite {

  // serializer access via commit/schemaAt on a scratch dir
  private def roundTrip(s: TableSchema): TableSchema = {
    val dir = java.nio.file.Files.createTempDirectory("schema_fuzz").toString
    SchemaEvolution.commitSchema(dir, 1L, s)
    SchemaEvolution.schemaAt(dir, 1L).get
  }

  test("random evolution sequences preserve the field-id contract") {
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      var schema = SchemaEvolution.initial(Seq("c0", "c1", "c2"))
      // model: name -> id for live columns; all ids ever assigned
      var live = schema.fields.map(f => f.name -> f.id).toMap
      var everAssigned = schema.fields.map(_.id).toSet
      var retired = Set.empty[Int]
      var nextName = 3

      (1 to 40).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 if live.nonEmpty => // rename
            val old = live.keys.toSeq.sorted.apply(rnd.nextInt(live.size))
            val nn = s"c$nextName"; nextName += 1
            schema = schema.rename(old, nn)
            live = live - old + (nn -> live(old))
          case 1 if live.size > 1 => // drop (keep at least one column)
            val victim = live.keys.toSeq.sorted.apply(rnd.nextInt(live.size))
            schema = schema.drop(victim)
            retired += live(victim)
            live -= victim
          case _ => // add
            val nn = s"c$nextName"; nextName += 1
            schema = schema.add(nn)
            val id = schema.idOf(nn).get
            assert(!everAssigned.contains(id),
              s"seed $seed: id $id reused (retired set: $retired)")
            everAssigned += id
            live += nn -> id
        }
        // live columns keep their ids; uniqueness; inversion
        assert(schema.fields.map(f => f.name -> f.id).toMap === live)
        assert(schema.fields.map(_.id).distinct.size === schema.fields.size)
        live.foreach { case (n, id) =>
          assert(schema.nameOf(id).contains(n) && schema.idOf(n).contains(id))
        }
        retired.foreach(id => assert(schema.nameOf(id).isEmpty,
          s"seed $seed: retired id $id resurfaced"))
        assert(schema.lastAssignedId === everAssigned.max)
      }
      // sidecar round-trip at the end state
      val back = roundTrip(schema)
      assert(back.fields === schema.fields)
      assert(back.lastAssignedId === schema.lastAssignedId)
    }
  }
}
