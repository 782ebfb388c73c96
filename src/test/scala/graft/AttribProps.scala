package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.streaming.{AttribEvent, AttribHit, AttribMachine}

/** ScalaCheck properties for the attribution state machine shared by
  * e47 (LOCF window) and s37 (AttributionProcessor): for ARBITRARY
  * event sequences — including timestamp ties and boundary-exact 7-day
  * lags — the fold must equal the e47 window semantics (latest click
  * strictly preceding the purchase in (ts, event_id) order, within the
  * window), and folding across ANY time-partitioned batch split must
  * equal the single whole-sequence fold. Splits cut only BETWEEN
  * distinct timestamps — the s30/s36/s37 delivery contract (equal-ts
  * rows never straddle a batch boundary). Pure JVM, and the fold under
  * test IS the production [[AttribMachine]] — not a transcription. */
object AttribProps extends Properties("AttribMachine") {

  private val winUs = graft.operators.Events.AttribWinUs

  private val eventGen: Gen[AttribEvent] = for {
    t <- Gen.chooseNum(0L, 3L * winUs)
    snap <- Gen.oneOf(true, false)
    ts = if (snap) (t / winUs) * winUs else t
    id <- Gen.chooseNum(0L, 40L)
    tpe <- Gen.oneOf("click", "purchase", "view")
    ch <- Gen.oneOf("ads", "email", "social", "organic", "unknown")
  } yield AttribEvent(0L, ts, id,
    tpe, if (tpe == "click") ch else "",
    if (tpe == "purchase") (id % 7) * 1.25 else 0.0)

  // unique event_id per sequence: the sort order (and the contract's
  // tie rule) is unambiguous, and purchase emissions compare by id
  private val seqGen: Gen[List[AttribEvent]] =
    Gen.listOf(eventGen).map(_.take(100)
      .groupBy(_.event_id).values.map(_.head).toList)

  // the e47 window semantics, replayed literally per purchase
  private def reference(rows: Seq[AttribEvent]): Seq[AttribHit] = {
    val sorted = rows.sortBy(e => (e.ts_us, e.event_id))
    sorted.filter(_.event_type == "purchase").map { p =>
      val best = sorted.filter(c => c.event_type == "click" &&
          (c.ts_us < p.ts_us ||
            (c.ts_us == p.ts_us && c.event_id < p.event_id)) &&
          p.ts_us - c.ts_us <= winUs)
        .sortBy(c => (-c.ts_us, -c.event_id)).headOption
      best match {
        case Some(c) => AttribHit(p.user_id, p.event_id, c.channel,
          (p.ts_us - c.ts_us) / 1000000L, p.value)
        case None => AttribHit(p.user_id, p.event_id, "unattributed",
          -1L, p.value)
      }
    }
  }

  // split the ts-sorted sequence into time-partitioned batches by
  // choosing cut timestamps (never inside an equal-ts group)
  private val splitGen: Gen[(List[AttribEvent], List[List[AttribEvent]])] =
    for {
      xs <- seqGen
      cuts <- Gen.listOfN(3, Gen.chooseNum(0L, 3L * winUs))
    } yield {
      val sortedCuts = cuts.sorted
      val batches = (Long.MinValue +: sortedCuts)
        .zip(sortedCuts :+ Long.MaxValue)
        .map { case (lo, hi) => xs.filter(e => e.ts_us >= lo && e.ts_us < hi) }
      (xs, batches)
    }

  property("single fold matches the e47 window semantics") =
    Prop.forAll(seqGen) { xs =>
      AttribMachine.fold(null, xs)._2.sortBy(_.purchase_id) ==
        reference(xs).sortBy(_.purchase_id)
    }

  property("time-partitioned batch folds equal the whole-sequence fold") =
    Prop.forAll(splitGen) { case (xs, batches) =>
      val whole = AttribMachine.fold(null, xs)._2.sortBy(_.purchase_id)
      val (_, emissions) = batches.foldLeft(
          (null: graft.streaming.LastClick, Vector.empty[AttribHit])) {
        case ((st, acc), b) =>
          val (st2, out) = AttribMachine.fold(st, b)
          (st2, acc ++ out)
      }
      emissions.sortBy(_.purchase_id) == whole
    }

  property("every purchase emits exactly once, clicks never emit") =
    Prop.forAll(seqGen) { xs =>
      val hits = AttribMachine.fold(null, xs)._2
      hits.map(_.purchase_id).sorted ==
        xs.filter(_.event_type == "purchase").map(_.event_id).sorted
    }
}
