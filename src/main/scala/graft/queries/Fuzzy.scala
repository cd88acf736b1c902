package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.util.{Q, Tables}

/** Fuzzy (edit-distance) string matching — the entity-resolution join a
  * catalog/deduplication pipeline runs against misspelled inputs.
  *
  * The scale design is the SymSpell deletion-neighborhood join (Garbe's
  * public algorithm, itself the FastSS idea): for threshold k=1, two
  * strings are within Levenshtein distance 1 IFF their single-deletion
  * neighborhoods (the string plus every string formed by deleting one
  * character) intersect — an EXACT candidate filter, no recall loss. Each
  * side explodes to length+1 short keys, candidates come from a plain
  * equi-join on those keys (shuffle or broadcast, never a cartesian), and
  * a final `levenshtein` verify keeps precision exact. Cost is linear in
  * total string length on both sides — at 100 TB the corpus side explodes
  * once and the (small) probe side broadcasts, so a misspelled-lookup
  * workload never scans more than the corpus's own posting table. (For
  * k=2 the same construction uses up-to-two deletions; the verify step is
  * unchanged.)
  */
object Fuzzy {

  /** The string plus every single-character deletion of it (distinct). */
  private def deletionNeighborhood(c: Column): Column =
    array_union(
      array(c),
      transform(sequence(lit(1), length(c)), i =>
        concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))

  /** Typo'd probes (3rd character dropped) from the 20 lowest part keys,
    * fuzzy-joined back to the FULL parts table at Levenshtein <= 1 via the
    * deletion-neighborhood candidate join. The DuckDB oracle brute-forces
    * the same join with its native levenshtein over the probe x corpus
    * product — exponentially more work, fine at oracle scale, and any
    * candidate the neighborhood join missed would surface as a hash
    * mismatch.
    */
  val q_fuzzy_join: Q = Q(
    "q_fuzzy_join",
    Some("""
      WITH probes AS (
        SELECT p_partkey AS probe_id,
               substring(lower(p_name), 1, 2) || substring(lower(p_name), 4) AS probe
        FROM part WHERE p_partkey < 20
      ), corpus AS (
        SELECT p_partkey, lower(p_name) AS name FROM part
      )
      SELECT probe_id, p_partkey, probe, name,
             CAST(levenshtein(probe, name) AS INT) AS dist
      FROM probes JOIN corpus ON levenshtein(probe, name) <= 1
      ORDER BY probe_id, p_partkey
    """),
  ) { (s, d) =>
    val parts = Tables.part(s, d).select(col("p_partkey"), lower(col("p_name")).as("name"))
    val probes = parts.filter(col("p_partkey") < 20)
      .select(col("p_partkey").as("probe_id"),
        concat(col("name").substr(lit(1), lit(2)),
          col("name").substr(lit(4), length(col("name")))).as("probe"))
    val corpusKeys = parts
      .select(col("p_partkey"), col("name"),
        explode(deletionNeighborhood(col("name"))).as("k"))
    val probeKeys = probes
      .select(col("probe_id"), col("probe"),
        explode(deletionNeighborhood(col("probe"))).as("k"))
    // the probe side is small by construction — broadcast its keys so the
    // candidate join is map-side; dedup candidate pairs before the verify
    corpusKeys.join(broadcast(probeKeys), "k")
      .select("probe_id", "p_partkey", "probe", "name")
      .distinct()
      .withColumn("dist", levenshtein(col("probe"), col("name")))
      .filter(col("dist") <= 1)
      .orderBy("probe_id", "p_partkey")
  }

  def all: Seq[Q] = Seq(q_fuzzy_join)
}
