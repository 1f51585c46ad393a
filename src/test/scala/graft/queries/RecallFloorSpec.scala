package graft.queries

import graft.SparkSpec

/**
 * Pins the recall_floor driver-contract gate (round-12 item 4: RECALL.json
 * was published but ungated) against the REAL driver testdata, so a
 * recall collapse fails the build as well as the driver's CORRECTNESS
 * gate, and so the floors are proven to hold at BOTH scales the driver
 * touches (sf0.01 correctness, sf0.1 bench) — the gate must never go red
 * from corpus-size effects, only from engine regressions.
 */
class RecallFloorSpec extends SparkSpec {

  private def haveData(dir: String) =
    new java.io.File(s"$dir/embeddings.parquet").exists

  for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
    test(s"recall floors hold with margin on $dir") {
      assume(haveData(dir))
      // small shape (nlist=16, 500-row table) AND the bench shape
      // (nlist=256, 128-D poly corpus — 20k/200k rows) added round 13:
      // the bench geometry is the one that predicts production recall
      val measured =
        VectorQueries.recallMeasured(spark, dir) :+
          VectorQueries.scaleRecallMeasured(spark, dir)
      assert(measured.size === 3)
      measured.foreach { case (config, recall, floor) =>
        info(f"$config -> measured recall $recall%.4f")
        assert(recall >= 0.0 && recall <= 1.0,
          s"$config: recall must be a real measurement, got $recall " +
            "(-1 marks an empty ground truth = config error)")
        assert(recall >= floor,
          s"$config: measured recall $recall below its gate floor $floor")
      }
    }
  }

  test("recall_floor emits one TRUE row per config, matching the oracle shape") {
    val dir = "/root/testdata/sf0.01"
    assume(haveData(dir))
    val rows = VectorQueries.queries("recall_floor")(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0)).toSeq.sorted)
    assert(rows.forall(_.getBoolean(1)), "every gate row must be TRUE on healthy data")
    // the oracle literal must name exactly the same configs
    val oracle = VectorQueries.oracleSql("recall_floor")
    rows.foreach(r => assert(oracle.contains(s"('${r.getString(0)}', TRUE)"),
      s"oracle SQL must embed config '${r.getString(0)}' verbatim"))
  }
}
