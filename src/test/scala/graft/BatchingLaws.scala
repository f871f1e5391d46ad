package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.query.QueryAlgebra._

/** Property laws for Q8 auto-batching (`query_builder.py:329-361`
  * semantics) over arbitrary type/entity configurations — the example-based
  * checks live in QueryAlgebraSpec; these pin the algebra in general. */
object BatchingLaws extends Properties("AutoBatchEntities") {

  private val idsGen: Gen[Seq[String]] =
    Gen.chooseNum(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.zipWithIndex
        .map { case (c, i) => s"$c$i" }))
  private val configGen: Gen[Seq[(String, Seq[String])]] =
    Gen.chooseNum(0, 4).flatMap(k =>
      Gen.listOfN(k, idsGen).map(_.zipWithIndex
        // type-index prefix keeps ids globally unique — the per-type
        // properties below key entities back to their type by id
        .map { case (ids, i) => s"type$i" -> ids.map(id => s"t$i-$id") }))
  private val batchGen: Gen[Int] = Gen.chooseNum(1, 10)

  private def ids(q: AnyQ): Seq[String] =
    q.qs.collect { case EntityQ(id) => id }

  property("groups partition the input multiset exactly") =
    Prop.forAll(configGen, batchGen) { (cfg, bs) =>
      val out = autoBatchEntities(cfg, bs).flatMap(ids)
      out.sorted == cfg.flatMap(_._2).sorted
    }

  property("group count = max per-type batch count; no group is empty") =
    Prop.forAll(configGen, batchGen) { (cfg, bs) =>
      val groups = autoBatchEntities(cfg, bs)
      val expected = cfg.map(_._2.size).map(n => (n + bs - 1) / bs)
        .maxOption.getOrElse(0)
      groups.size == expected && groups.forall(g => ids(g).nonEmpty)
    }

  property("each group holds at most batchSize entities PER TYPE") =
    Prop.forAll(configGen, batchGen) { (cfg, bs) =>
      val typeOf = cfg.flatMap { case (t, es) => es.map(_ -> t) }.toMap
      autoBatchEntities(cfg, bs).forall(g =>
        ids(g).groupBy(typeOf).values.forall(_.size <= bs))
    }

  property("per-type order is preserved within and across groups") =
    Prop.forAll(configGen, batchGen) { (cfg, bs) =>
      val groups = autoBatchEntities(cfg, bs)
      cfg.forall { case (t, es) =>
        val typeSet = es.toSet
        groups.flatMap(ids).filter(typeSet) == es
      }
    }
}
