package graft

import org.apache.spark.sql.SparkSession
import graft.graphout.GraphBuilder.Graph
import graft.model.{Entity, Triple}

/** Fixture graphs ported 1:1 from the reference test suites
  * (src/graph_management/test_graph_query.py:271-364 and
  * test_graph_reasoning.py fixture builder) — FIXTURES.md §3.2/3.3.
  */
object Fixtures {

  private def ent(id: String, name: String, etype: String, conf: Double,
                  attrs: Map[String, String] = Map.empty): Entity =
    Entity(id, name, etype, None, attrs, conf, "", "", "", "")

  private def rel(id: String, src: String, dst: String, rt: String, conf: Double,
                  bidir: Boolean = false): Triple =
    Triple(id, src, dst, "", "", rt, None, bidir, 1.0, conf, "")

  /** Alice/Bob query fixture (test_graph_query.py). */
  def queryGraph(spark: SparkSession): Graph = {
    import spark.implicits._
    val nodes = Seq(
      ent("alice", "Alice", "person", 0.9, Map("age" -> "30", "role" -> "manager")),
      ent("bob", "Bob", "person", 0.9, Map("age" -> "25", "role" -> "engineer")),
      ent("company_x", "Company X", "organization", 0.9, Map("industry" -> "tech")),
      ent("city_a", "City A", "location", 0.9, Map("country" -> "USA")),
      ent("project_y", "Project Y", "project", 0.9, Map("status" -> "active"))
    ).toDS()
    val edges = Seq(
      rel("alice_works_at_x", "alice", "company_x", "works_at", 0.9),
      rel("bob_works_at_x", "bob", "company_x", "works_at", 0.9),
      rel("alice_lives_in_a", "alice", "city_a", "lives_in", 0.9),
      rel("company_x_located_in_a", "company_x", "city_a", "located_in", 0.9),
      rel("bob_works_on_y", "bob", "project_y", "works_on", 0.9),
      rel("company_x_develops_y", "company_x", "project_y", "develops", 0.9)
    ).toDS()
    Graph(nodes, edges)
  }

  /** John/Jane reasoning fixture (test_graph_reasoning.py). */
  def reasoningGraph(spark: SparkSession, withContradictions: Boolean = false): Graph = {
    import spark.implicits._
    val nodes = Seq(
      ent("person1", "John Doe", "Person", 0.9, Map("age" -> "30")),
      ent("person2", "Jane Smith", "Person", 0.9, Map("age" -> "35")),
      ent("company1", "Acme Corp", "Organization", 0.9, Map("industry" -> "Tech")),
      ent("skill1", "Programming", "Skill", 0.9),
      ent("job1", "Software Developer", "Job", 0.9),
      ent("entity1", "Entity 1", "Test", 0.9),
      ent("entity2", "Entity 2", "Test", 0.9),
      ent("entity3", "Entity 3", "Test", 0.9)
    ).toDS()
    val base = Seq(
      rel("rel_person1_person2", "person1", "person2", "knows", 0.8),
      rel("rel_person1_company1", "person1", "company1", "works-for", 0.9),
      rel("rel_person1_skill1", "person1", "skill1", "has-skill", 0.9),
      rel("rel_skill1_job1", "skill1", "job1", "required-for", 0.8),
      rel("rel_company1_job1", "company1", "job1", "offers", 0.7)
    )
    val contra = if (withContradictions) Seq(
      rel("rel_contradictory1", "person1", "company1", "works-for", 0.9),
      rel("rel_contradictory2", "person1", "company1", "not-affiliated-with", 0.7)
    ) else Nil
    Graph(nodes, (base ++ contra).toDS())
  }
}
