package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.streaming.{FunnelEvent, FunnelMachine}

/** ScalaCheck properties for the funnel state machine shared by e44
  * (chained running-max windows) and s36 (FunnelProcessor): the
  * invariants must hold for ARBITRARY event sequences — including
  * timestamp ties and boundary-exact conversion windows — AND for
  * arbitrary time-ordered batch splits, which is exactly what the
  * streaming delivery does to the sequence. Pure JVM (no Spark job),
  * and the fold under test IS the production [[FunnelMachine]] the
  * processor runs — not a transcription (session-14 review finding). */
object FunnelProps extends Properties("FunnelMachine") {

  private val winUs = graft.operators.Events.FunnelWinUs
  private val none = FunnelMachine.none
  private val zero = FunnelMachine.zero

  // the e44 window-chain formulation, replayed literally: running max
  // view ts (lv), then running max of qualified click ts (lc), then
  // any qualified purchase — over the SAME (ts_us, event_id) order
  private def windowChainStage(rows: Seq[FunnelEvent]): Long = {
    val sorted = rows.sortBy(e => (e.ts_us, e.event_id))
    var lv = none
    val lvAt = sorted.map { e =>
      if (e.event_type == "view") lv = math.max(lv, e.ts_us); lv
    }
    var lc = none
    val lcAt = sorted.zip(lvAt).map { case (e, l) =>
      if (e.event_type == "click" && l != none && e.ts_us <= l + winUs)
        lc = math.max(lc, e.ts_us)
      lc
    }
    val s1 = if (sorted.exists(_.event_type == "view")) 1L else 0L
    val s2 = if (lcAt.exists(_ != none)) 1L else 0L
    val s3 = if (sorted.zip(lcAt).exists { case (e, c) =>
      e.event_type == "purchase" && c != none && e.ts_us <= c + winUs
    }) 1L else 0L
    s1 + s2 + s3
  }

  // dense timestamps (ties likely) around multiples of the window so
  // boundary-exact conversions (ts == lv + win) are generated
  private val eventGen: Gen[FunnelEvent] = for {
    t <- Gen.chooseNum(0L, 4L * winUs)
    snap <- Gen.oneOf(true, false)
    ts = if (snap) (t / winUs) * winUs else t
    id <- Gen.chooseNum(0L, 30L)
    tpe <- Gen.oneOf("view", "click", "purchase", "error")
  } yield FunnelEvent(0L, ts, id, tpe)

  private val seqGen: Gen[List[FunnelEvent]] =
    Gen.listOf(eventGen).map(_.take(120))

  // split the TIME-SORTED sequence at arbitrary points into 1..5
  // ordered batches (the s36 delivery contract)
  private val splitGen: Gen[(List[FunnelEvent], List[List[FunnelEvent]])] =
    for {
      xs <- seqGen
      sorted = xs.sortBy(e => (e.ts_us, e.event_id))
      n <- Gen.chooseNum(1, 5)
      cuts <- Gen.listOfN(n - 1, Gen.chooseNum(0, sorted.size))
    } yield {
      val bounds = (0 +: cuts.sorted :+ sorted.size).distinct.sorted
      (sorted, bounds.zip(bounds.tail).map { case (a, b) =>
        sorted.slice(a, b) })
    }

  property("batch-split fold equals the one-pass fold") =
    Prop.forAll(splitGen) { case (all, parts) =>
      FunnelMachine.fold(zero, all) ==
        parts.foldLeft(zero)(FunnelMachine.fold)
    }

  property("machine stage equals the e44 window-chain stage") =
    Prop.forAll(seqGen) { xs =>
      FunnelMachine.stage(FunnelMachine.fold(zero, xs)) ==
        windowChainStage(xs)
    }

  property("stage is monotone non-decreasing across batches") =
    Prop.forAll(splitGen) { case (_, parts) =>
      val stages = parts.scanLeft(zero)(FunnelMachine.fold)
        .tail.map(FunnelMachine.stage)
      stages.zip(stages.drop(1)).forall { case (a, b) => a <= b }
    }
}
