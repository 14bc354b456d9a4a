package graft.crawl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.schemas.{CrawlDatum, CrawlStatus => S}

/** Property tests over the updatedb merge (FIXTURES §A8 generator form):
  * randomized datum sets must satisfy the reducer's structural
  * invariants regardless of content. Raw ScalaCheck generators driven by
  * explicit seeds (scalatestplus isn't in the offline cache). */
class UpdateDbPropertiesSpec extends AnyFunSuite {

  private val cfg = ScheduleConfig()
  private val schedule = DefaultFetchSchedule(cfg)
  private val now = 1700000000000L
  private val Trials = 300

  private def forAllSeeds[T](gen: Gen[T])(check: T => Unit): Unit =
    (1 to Trials).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val dbStatusGen = Gen.oneOf(S.DB_UNFETCHED, S.DB_FETCHED,
    S.DB_GONE, S.DB_REDIR_TEMP, S.DB_REDIR_PERM, S.DB_NOTMODIFIED,
    S.DB_DUPLICATE, S.DB_ORPHAN)
  private val fetchStatusGen = Gen.oneOf(S.FETCH_SUCCESS, S.FETCH_RETRY,
    S.FETCH_REDIR_TEMP, S.FETCH_REDIR_PERM, S.FETCH_GONE,
    S.FETCH_NOTMODIFIED)

  // distinct fetchTimes: latest-wins on ties is input-order dependent in
  // the reference too, so ties are excluded from the permutation property
  private val timeGen = Gen.choose(1L, 1000L).map(now - _ * 7919L)

  private def datumGen(statusGen: Gen[Byte]): Gen[CrawlDatum] = for {
    st <- statusGen
    ft <- timeGen
    retries <- Gen.choose(0, 4)
    score <- Gen.choose(0, 64).map(_ * 0.25f)
    sig <- Gen.option(Gen.oneOf("aa11", "bb22", "cc33"))
  } yield CrawlDatum(st, ft, retries, cfg.defaultInterval, score, sig, 0L,
    Map.empty)

  private val linkGen = Gen.choose(0, 16).map(q =>
    CrawlDatum(S.LINKED, 0L, 0, cfg.defaultInterval, q * 0.125f, None, 0L,
      Map.empty))

  private val valuesGen: Gen[List[CrawlDatum]] = for {
    olds <- Gen.listOfN(2, datumGen(dbStatusGen))
      .map(_.distinctBy(_.fetchTime))
    nOld <- Gen.choose(0, olds.size)
    fetches <- Gen.listOfN(2, datumGen(fetchStatusGen))
      .map(_.distinctBy(_.fetchTime))
    nFetch <- Gen.choose(0, fetches.size)
    links <- Gen.listOf(linkGen).map(_.take(6).distinctBy(_.score))
  } yield olds.take(nOld) ++ fetches.take(nFetch) ++ links

  test("merge result always carries a db status") {
    forAllSeeds(valuesGen) { values =>
      UpdateDb.merge(values.iterator, now, schedule).foreach { r =>
        assert(S.hasDbStatus(r.status),
          s"non-db status ${S.name(r.status)} from $values")
      }
    }
  }

  test("merge is invariant under input permutation") {
    forAllSeeds(Gen.zip(valuesGen, Gen.choose(Long.MinValue, Long.MaxValue))) {
      case (values, seed) =>
        val shuffled = new scala.util.Random(seed).shuffle(values)
        val a = UpdateDb.merge(values.iterator, now, schedule)
        val b = UpdateDb.merge(shuffled.iterator, now, schedule)
        assert(a == b, s"order-dependent merge for $values")
    }
  }

  test("a fetch this round always advances the schedule") {
    forAllSeeds(valuesGen) { values =>
      val fetchTimes = values.collect {
        case d if S.hasFetchStatus(d.status) => d.fetchTime
      }
      if (fetchTimes.nonEmpty) {
        UpdateDb.merge(values.iterator, now, schedule).foreach { r =>
          assert(r.fetchTime > fetchTimes.max,
            s"schedule did not advance past the fetch for $values")
        }
      }
    }
  }

  test("latest fetch_retry yields only db_unfetched or db_gone") {
    forAllSeeds(valuesGen) { values =>
      val latestFetch = values.filter(d => S.hasFetchStatus(d.status))
        .maxByOption(_.fetchTime)
      if (latestFetch.exists(_.status == S.FETCH_RETRY)) {
        UpdateDb.merge(values.iterator, now, schedule).foreach { r =>
          assert(r.status == S.DB_UNFETCHED || r.status == S.DB_GONE,
            s"retry produced ${S.name(r.status)} for $values")
        }
      }
    }
  }

  test("normalize is idempotent") {
    val urlGen = for {
      host <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(10))
      path <- Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(5)),
        Gen.const("."), Gen.const(".."), Gen.const("a b"),
        Gen.const("%3k"), Gen.const("x%2Fy"))).map(_.take(5))
      port <- Gen.oneOf("", ":80", ":8080")
    } yield s"http://$host.com$port/${path.mkString("/")}"
    forAllSeeds(urlGen) { url =>
      val once = graft.functions.Urls.normalize(url)
      val twice = once.flatMap(graft.functions.Urls.normalize)
      assert(once == twice, s"not idempotent for $url: $once vs $twice")
    }
  }
}
