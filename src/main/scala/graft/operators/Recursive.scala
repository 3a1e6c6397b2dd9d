package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.ZSetFrame

/** Semi-naive fixpoint evaluation (Datalog / recursive queries).
  *
  * Mirrors the reference's `recursive(f)` operator — feedback + distinct +
  * iterate-until-no-change (reference: crates/dbsp/src/operator/recursive.rs:255,
  * condition.rs:50). Catalyst has no recursion, so the loop runs on the
  * driver; per-iteration DataFrames are eagerly localCheckpoint'ed to cut
  * lineage growth (otherwise plans grow linearly and planning dominates).
  *
  * `distinct` inside the loop is mandatory for termination on cyclic data —
  * the reference enforces the same (recursive.rs:38-48).
  */
object Recursive {

  /** Materialize and re-wrap with FRESH attribute ids: localCheckpoint keeps
    * the original output attributes, so iterated self-joins would trip
    * Spark's ambiguous-self-join detection; rebuilding from the checkpointed
    * RDD severs the lineage completely (no recompute — the RDD is reused). */
  private def materialize(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** `materialize` with the row COUNT riding the checkpoint action as an
    * Observation (r17 — the Screened/d31 discipline applied to the
    * recursion loops): every fixpoint iteration needs the new delta AND
    * whether it is empty, and `isEmpty` was a separate driver-synchronous
    * job per iteration (two, with the loop-head recheck) on top of the
    * materialize — on the per-action latency floor that job count IS the
    * cost of a deep recursion. One action now returns both. */
  private def materializeCounted(df: DataFrame): (DataFrame, Long) = {
    val obs = new org.apache.spark.sql.Observation()
    val ck = df.observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
    (ck.sparkSession.createDataFrame(ck.rdd, ck.schema),
      obs.get("n").asInstanceOf[Long])
  }

  /** `materializeCounted` also carrying min(minCol) — the scc loops fuse
    * their per-round (count, next-pivot) scalar into the round's own
    * materialization action. NULL min (empty frame) maps to Long.MinValue,
    * matching the former countMin. */
  private def materializeCountMin(df: DataFrame, minCol: String)
      : (DataFrame, Long, Long) = {
    val obs = new org.apache.spark.sql.Observation()
    val ck = df.observe(obs, count(lit(1)).as("n"), min(col(minCol)).as("m"))
      .localCheckpoint(true)
    val out = ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    val row = obs.getAsJava
    val m = row.get("m")
    (out, obs.get("n").asInstanceOf[Long],
      if (m == null) Long.MinValue else m.asInstanceOf[Long])
  }

  /** Least fixpoint of `acc = base ∪ step(delta)` with set semantics.
    * `step` maps the newly-derived delta to candidate new facts; iteration
    * stops when no new facts appear. Only aggregate counts cross the driver
    * boundary — the data itself stays distributed.
    *
    * acc is a lazy union of per-iteration MATERIALIZED deltas; every
    * `compactEvery` iterations the union is collapsed into one materialized
    * frame so neither plan width nor the per-iteration `except` scan grows
    * with iteration count (deep recursions pay O(facts) per compaction,
    * amortized, instead of O(iters × facts)). */
  def fixpoint(base: DataFrame, maxIter: Int = 1000, compactEvery: Int = 8)
              (step: DataFrame => DataFrame): DataFrame = {
    val (first, n0) = materializeCounted(base.distinct())
    var deltas = List(first)
    var acc = first
    var delta = first
    var nDelta = n0
    var i = 0
    while (i < maxIter && nDelta > 0) {
      // semi-naive: derive only from the last delta, subtract known facts.
      // except() already has set semantics (EXCEPT DISTINCT) — no separate
      // distinct() pass; the delta's emptiness rides the materialization
      // (r17): ONE driver action per iteration, down from three
      // (materialize + derived.isEmpty + the loop-head isEmpty recheck)
      val (derived, m) = materializeCounted(step(delta).except(acc))
      if (m > 0) {
        deltas ::= derived
        if (deltas.size >= compactEvery) {
          acc = materialize(deltas.reduce(_ union _))
          deltas = List(acc)
        } else acc = deltas.reduce(_ union _)
      }
      delta = derived
      nDelta = m
      i += 1
    }
    acc
  }

  /** Joint least fixpoint of N MUTUALLY-recursive collections — the
    * generality of the reference's `recursive_n` (reference:
    * crates/dbsp/src/operator/recursive.rs:255, which accepts a tuple of
    * streams each defined in terms of all of them). `step` receives the
    * full accumulated collections and the last iteration's deltas and
    * returns one candidate frame per collection; semi-naive rules derive
    * from the deltas, but deriving from the accs is equally correct — the
    * per-collection `except` keeps only genuinely new facts either way.
    * Iteration stops when no collection gains a fact. Accumulators use the
    * same lazy-union + periodic compaction as `fixpoint`, so per-iteration
    * cost tracks delta sizes, not total facts. */
  def mutual(bases: Seq[DataFrame], maxIter: Int = 1000, compactEvery: Int = 8)
            (step: (Seq[DataFrame], Seq[DataFrame]) => Seq[DataFrame]): Seq[DataFrame] = {
    val n = bases.size
    val firsts = Array.tabulate(n)(j => materializeCounted(bases(j).distinct()))
    val lists = Array.tabulate(n)(j => List(firsts(j)._1))
    val accs = Array.tabulate(n)(j => lists(j).head)
    var deltas: Seq[DataFrame] = accs.toSeq
    var live = firsts.toSeq.map(_._2 > 0L)
    var i = 0
    while (i < maxIter && live.contains(true)) {
      val derived = step(accs.toSeq, deltas)
      require(derived.size == n,
        s"mutual step returned ${derived.size} collections, expected $n")
      // emptiness rides each collection's materialization (r17 — see
      // fixpoint): one action per collection per iteration, not two
      val freshCounted = Array.tabulate(n)(j =>
        materializeCounted(derived(j).except(accs(j))))
      val fresh = freshCounted.map(_._1)
      live = freshCounted.toSeq.map(_._2 > 0L)
      for (j <- 0 until n if live(j)) {
        lists(j) ::= fresh(j)
        if (lists(j).size >= compactEvery) {
          accs(j) = materialize(lists(j).reduce(_ union _))
          lists(j) = List(accs(j))
        } else accs(j) = lists(j).reduce(_ union _)
      }
      deltas = fresh.toSeq
      i += 1
    }
    accs.toSeq
  }

  /** The DOUBLED edge set E ∪ E∘E — each frontier-fixpoint barrier extends
    * paths by up to TWO hops, halving the driver-round count of every
    * reachability loop built on it (the closureDoubling lesson applied to
    * frontier search: barriers are the scarce resource, not rows). */
  private def doubledEdges(e: DataFrame): DataFrame = {
    val a = e.select(col("src").as("h_src"), col("dst").as("mid"))
    val b = e.select(col("src").as("mid"), col("dst").as("h_dst"))
    materialize(a.join(b, "mid")
      .select(col("h_src").as("src"), col("h_dst").as("dst"))
      .unionByName(e.select("src", "dst")).distinct())
  }

  /** Frontier reachability from `seed` (column `node`) over a pre-doubled
    * edge set: per-iteration work is O(frontier ⋈ edges) — rows touched
    * track the seed's actual reach, never all-pairs. The result INCLUDES
    * the seed (fixpoint accumulates its base). */
  private def reachOver(seed: DataFrame, e2: DataFrame,
                        forward: Boolean): DataFrame =
    if (forward)
      fixpoint(seed) { d =>
        d.join(e2, d("node") === e2("src")).select(e2("dst").as("node")) }
    else
      fixpoint(seed) { d =>
        d.join(e2, d("node") === e2("dst")).select(e2("src").as("node")) }

  /** Transitive closure by PATH DOUBLING: after k iterations the result is
    * closed under paths of length ≤ 2^k, so a depth-D graph needs ⌈log₂ D⌉
    * barriers instead of D. On Spark each fixpoint iteration is a full
    * driver-synchronized barrier with a ~0.1-0.5 s latency floor, so deep
    * chains (CDC lineage, long call graphs) MUST trade the extra join work
    * for exponentially fewer rounds — this is the variant that survives a
    * 1000-deep recursion at 100 TB, where the one-hop loop cannot.
    * (The reference's runtime pays ~µs per fixpoint round so it iterates
    * one-hop, recursive.rs:255 — same semantics, different cost model.) */
  def closureDoubling(edges: DataFrame, maxIter: Int = 64): DataFrame =
    closureDoublingWithRounds(edges, maxIter)._1

  /** SEMI-NAIVE path doubling (r17). The former loop squared the FULL
    * closure each round (tc ∘ tc), re-deriving every already-known pair —
    * on a depth-D chain the last squares enumerate ~n³/6 triples. A pair
    * with shortest distance L ∈ (2^k, 2^{k+1}] splits at the node 2^k from
    * its start: the prefix has shortest distance EXACTLY 2^k — first
    * derived at round k, i.e. a row of delta_k — and the suffix has
    * distance ≤ 2^k, i.e. a row of tc_k. So delta_k ∘ tc_k covers every
    * new pair: the prefix side shrinks from |tc| to |delta| (~2× less join
    * output on the chain worst case, more on graphs that close early), the
    * union(tc).distinct() re-derivation disappears (except() subtracts
    * known pairs), termination is "delta empty" instead of a count
    * plateau, and the per-round count rides the materialization action
    * (one driver job per round, down from two). The accumulated closure
    * uses fixpoint's lazy-union + periodic-compaction discipline so the
    * except's scan side stays one materialized frame (±8 arms).
    * Returns (closure, rounds) — RecursiveSpec gates the ⌈log₂D⌉-rounds
    * claim on the rounds figure, which box speed cannot move. */
  private[graft] def closureDoublingWithRounds(edges: DataFrame,
                                               maxIter: Int = 64)
      : (DataFrame, Int) = {
    val (first, n0) = materializeCounted(edges.distinct())
    var deltas = List(first)
    var acc = first
    var delta = first
    var nDelta = n0
    var i = 0
    while (i < maxIter && nDelta > 0) {
      val a = delta.select(col("src").as("d_src"), col("dst").as("mid"))
      val b = acc.select(col("src").as("mid"), col("dst").as("t_dst"))
      val (fresh, m) = materializeCounted(
        a.join(b, "mid")
          .select(col("d_src").as("src"), col("t_dst").as("dst"))
          .except(acc))
      if (m > 0) {
        deltas ::= fresh
        if (deltas.size >= 8) {
          acc = materialize(deltas.reduce(_ union _))
          deltas = List(acc)
        } else acc = deltas.reduce(_ union _)
      }
      delta = fresh
      nDelta = m
      i += 1
    }
    (if (deltas.size > 1) materialize(deltas.reduce(_ union _)) else acc, i)
  }

  /** Transitive closure maintained INCREMENTALLY under edge deltas including
    * retractions — the reference's `recursive(f)` under an outer clock: the
    * fixpoint result updates per epoch as edge deltas arrive
    * (reference: crates/dbsp/src/operator/recursive.rs:255 epoch semantics,
    * distinct.rs:78-100 nested DistinctIncremental).
    *
    * Strategy: affected-source recompute. For a delta touching edges (u,v),
    * the only closure rows that can change are those whose source reaches u
    * (or u itself): delete their rows, then re-derive reachability for just
    * those sources over the new edge set with a semi-naive fixpoint seeded
    * at the affected sources. Per-epoch cost scales with the affected
    * sources' reach, not with |closure| — sources that cannot reach any
    * touched edge keep their rows untouched (and unscanned: the anti-join
    * prunes on the broadcast affected-source set). */
  final class IncrementalClosure(initEdges: ZSetFrame) {
    /** current edge set (set semantics), columns (src, dst) */
    private var edges: DataFrame = materialize(initEdges.distinctZ.toDF)
    /** current closure, columns (src, dst) — the epoch-0 build is a batch
      * computation, so it uses the log-barrier doubling closure; only the
      * per-epoch repairs derive linearly (work ∝ affected reach) */
    private var tc: DataFrame = closureDoubling(edges)

    def currentEdges: DataFrame = edges
    def closure: DataFrame = tc

    /** Superseded generations pending release — two-step deferral, same
      * lifecycle contract as KeyedState / IncrementalScc. */
    private val retireQ =
      new graft.incremental.RetireQueue[DataFrame](graft.incremental.Pinned.release)

    /** Release ALL pinned generations; the state is unusable afterwards. */
    def close(): Unit = {
      retireQ.close()
      graft.incremental.Pinned.release(tc)
      graft.incremental.Pinned.release(edges)
    }

    /** reachability restricted to paths STARTING at `seed`'s src values.
      * Derives over the DOUBLED edge set E ∪ E∘E — one extra join per
      * epoch halves the barrier count of the repair fixpoint (each
      * iteration extends paths by up to two hops). */
    private def closureFrom(seed: DataFrame, e: DataFrame): DataFrame = {
      val a = e.select(col("src").as("h_src"), col("dst").as("mid"))
      val b = e.select(col("src").as("mid"), col("dst").as("h_dst"))
      val e2 = materialize(
        a.join(b, "mid").select(col("h_src").as("src"), col("h_dst").as("dst"))
          .union(e).distinct())
      fixpoint(seed) { d =>
        val dd = d.select(col("src").as("p_src"), col("dst").as("p_dst"))
        dd.join(e2, dd("p_dst") === e2("src"))
          .select(col("p_src").as("src"), e2("dst").as("dst"))
      }
    }

    /** one epoch: apply an edge delta Z-set (mixed ±) and repair the closure */
    def step(delta: ZSetFrame): DataFrame = {
      retireQ.advance()
      val dEdges = materialize(delta.df.select("src", "dst", ZSetFrame.W))
      val eNew = materialize(
        (ZSetFrame.fromTable(edges) + ZSetFrame.fromDelta(dEdges)).distinctZ.toDF)
      // affected sources: u of every touched edge (u,v), plus every x with
      // (x,u) already in the closure. touchedSrc is O(Δ) by the CDC
      // contract, so it broadcasts (r18, guide §3.1) — the CLOSURE side
      // (the big one) is probed in place instead of being shuffled for a
      // sort-merge join the stats-free RDD plan would otherwise pick.
      val touchedSrc = dEdges.select(col("src").as("u")).distinct()
      val aff = materialize(
        tc.join(broadcast(touchedSrc), tc("dst") === col("u"), "left_semi")
          .select("src")
          .union(touchedSrc.select(col("u").as("src"))).distinct())
      // re-derive reachability for affected sources only
      val seed = eNew.join(broadcast(aff), Seq("src"), "left_semi")
      val reAff = closureFrom(seed, eNew)
      val kept = tc.join(broadcast(aff), Seq("src"), "left_anti")
      val (oldTc, oldEdges) = (tc, edges)
      edges = eNew
      tc = materialize(kept.union(reAff))
      retireQ.retire(oldTc, oldEdges)
      tc
    }
  }

  /** Strongly-connected components by trim + forward/backward peeling —
    * NESTED RECURSION: three inner fixpoints run INSIDE an outer
    * iterate-until-empty loop, the reference's fixpoint-within-fixpoint
    * scope nesting (reference: crates/dbsp/src/operator/recursive.rs nested
    * scopes; time/nested_ts32.rs `NestedTimestamp32` — an outer epoch clock
    * over an inner iteration clock).
    *
    * Outer round: (a) TRIM fixpoint — nodes lacking an in- or out-edge in
    * the remaining subgraph are singleton SCCs; removing them exposes more,
    * iterate until none (dissolves the acyclic fringe in bulk, the standard
    * FW-BW-Trim step); (b) pick the minimum remaining node as pivot;
    * (c) FORWARD-reachability fixpoint from the pivot; (d) BACKWARD-
    * reachability fixpoint; fw ∩ bw is the pivot's SCC (labeled by the
    * pivot = its minimum member, since the pivot is the global minimum of
    * the remaining subgraph); peel it and repeat. Both reachability loops
    * run over the DOUBLED edge set (E ∪ E∘E — 2 hops per barrier), the
    * closureFrom lesson: driver-synchronized barriers are the scarce
    * resource, so halve them. Determinism: the pivot choice is a min, so
    * component labels are data-determined, not schedule-determined.
    *
    * Scale shape: everything is equi-joins and set ops over (src, dst)
    * frames — shuffle-partitionable; only the pivot scalar and per-loop
    * emptiness flags cross the driver. Outer rounds = number of
    * non-trivial SCCs not removed by trim — FW-BW's inherent sequential
    * dependency (each peel changes the subgraph the next round sees),
    * which is exactly what makes it genuinely nested. Returns
    * (node, scc = min member of the node's component). */
  def scc(edges: DataFrame, maxRounds: Int = 256,
          allPairsMax: Long = 4096L): DataFrame =
    sccWithRounds(edges, maxRounds, allPairsMax)._1

  /** `scc` plus the outer-round count (RecursiveSpec gates that the nested
    * loop genuinely iterates on chained-component graphs).
    *
    * `allPairsMax` — ADAPTIVE per-peel strategy bound: a post-trim core of
    * ≤ allPairsMax nodes is closed ALL-PAIRS by path doubling (⌈log₂ D⌉
    * barriers; worst-case rows bounded by allPairsMax² ≈ 16.7M at the
    * default — cheap on any cluster), while a larger core runs PER-PIVOT
    * frontier reachability (O(pivot reach) rows per peel, more barriers).
    * Driver-side rounds are the scarce resource on small cores, rows on
    * big ones — measured r10: frontier-always cost q76/q82 +75%/+45% on
    * their 24-node cores, all-pairs-always is the O(core²) scale killer
    * VERDICT r9 #2 flagged. RecursiveSpec gates both paths against each
    * other and brute force.
    *
    * The closure is computed ONCE per call and REUSED by every subsequent
    * peel as a plain filter: each removal (a trim layer or a peeled
    * component) deletes only COMPLETE SCCs of the graph the closure was
    * taken on, and mutual reachability between two surviving nodes never
    * depends on a removed component — u ↔ v through removed nodes would
    * put u, v and those nodes in one SCC, contradicting that removals are
    * whole SCCs. So fw(pivot) ∩ bw(pivot) read off the stale closure is
    * exactly the pivot's component among the survivors, and per-peel cost
    * drops from a fresh O(log D)-barrier closure to two filters. */
  private[graft] def sccWithRounds(edges: DataFrame,
                                   maxRounds: Int = 256,
                                   allPairsMax: Long = 4096L): (DataFrame, Int) = {
    val e0 = materialize(edges.distinct())
    var e = e0
    // fused count + min riding each node-set MATERIALIZATION (r17: the
    // former countMin was its own job per round/layer on the just-pinned
    // frame; the Observation hands both scalars over on the checkpoint
    // action itself — min doubles as the next pivot)
    var (nodes, nNodes, pivot) = materializeCountMin(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct(), "node")
    var out = List.empty[DataFrame]
    // the once-per-call all-pairs closure (small-core strategy); stays
    // valid across peels/trims per the scaladoc argument
    var coreClosure: DataFrame = null
    // edges with BOTH endpoints currently alive — LAZY: e is materialized
    // only at peel entry (once per round); trim layers read this filtered
    // view directly, so no per-layer edge materialization.
    // NOTE the trailing select: a using-column join moves the join column
    // to the FRONT of the output, and a later positional `union` against a
    // (src, dst)-ordered frame would silently flip every edge — normalize
    // the order on every rewrite
    def eLive: DataFrame = e
      .join(nodes.select(col("node").as("src")), Seq("src"), "left_semi")
      .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .select("src", "dst")
    var rounds = 0
    while (rounds < maxRounds && nNodes > 0) {
      if (coreClosure == null && nNodes <= allPairsMax) {
        e = materialize(eLive)
        coreClosure = closureDoubling(e)
      }
      if (coreClosure != null) {
        // inner fixpoint A via the closure, ONE SHOT: iterated-trim
        // survivors are exactly the cycle-sandwich nodes — reached by a
        // live cycle AND reaching a live cycle ((v,v) ∈ r marks cycles;
        // cycle nodes sandwich themselves) — so a depth-L chain is labeled
        // in one round, not L layers. Staleness caveat: a sandwich path
        // routed only through an ALREADY-PEELED component keeps its nodes
        // one extra round, where they peel as correct singletons — exact
        // either way, just slower on adversarial pivot orders.
        val r = coreClosure
        val cyc = nodes.join(r.where(col("src") === col("dst"))
          .select(col("src").as("node")), Seq("node"), "left_semi")
        val fromCyc = r.join(cyc.select(col("node").as("src")),
          Seq("src"), "left_semi").select(col("dst").as("node"))
        val toCyc = r.join(cyc.select(col("node").as("dst")),
          Seq("dst"), "left_semi").select(col("src").as("node"))
        val prev = nodes
        val (keep, nKeep, mKeep) = materializeCountMin(prev
          .join(fromCyc.distinct(), Seq("node"), "left_semi")
          .join(toCyc.distinct(), Seq("node"), "left_semi"), "node")
        if (nKeep != nNodes) {
          out ::= prev.except(keep).select(col("node"), col("node").as("scc"))
          nodes = keep
          nNodes = nKeep
          pivot = mKeep
        }
      } else {
        // inner fixpoint A, layered (big graph — closure unaffordable):
        // trim the acyclic fringe one layer at a time. ONE materialize +
        // one fused count/min job per layer; the trivial complement is
        // labeled LAZILY (both frames are checkpointed, so the deferred
        // except is stable), and the edge restriction stays lazy inside
        // eLive.
        var trimming = true
        while (trimming && nNodes > 0) {
          val prev = nodes
          val live = eLive
          val (both, nBoth, mBoth) = materializeCountMin(prev
            .join(live.select(col("src").as("node")), Seq("node"), "left_semi")
            .join(live.select(col("dst").as("node")), Seq("node"), "left_semi"),
            "node")
          if (nBoth == nNodes) trimming = false
          else {
            out ::= prev.except(both).select(col("node"), col("node").as("scc"))
            nodes = both
            nNodes = nBoth
            pivot = mBoth
          }
        }
      }
      if (nNodes > 0) {
        // frontier branch needs the node-restricted edge set as a clean
        // physical frame each round; the closure branch never reads e again
        if (coreClosure == null) e = materialize(eLive)
        val seed = nodes.where(col("node") === pivot)
        // inner fixpoints B/C (adaptive — see scaladoc): small core →
        // filters over the cached all-pairs closure; big core → per-pivot
        // frontier reachability over the doubled edge set (O(pivot reach)
        // rows, never O(core²); the same shape as IncrementalScc's repair
        // reachability), the doubled set materialized once per peel and
        // shared by both directions.
        val comp =
          if (nNodes <= allPairsMax) {
            if (coreClosure == null) coreClosure = closureDoubling(e)
            val r = coreClosure
            val fw = r.where(col("src") === pivot).select(col("dst").as("node"))
            val bw = r.where(col("dst") === pivot).select(col("src").as("node"))
            // fw∩bw ⊆ current nodes automatically: it is the pivot's
            // ORIGINAL component, which is removed only as a whole
            materialize(fw.intersect(bw).unionByName(seed).distinct())
          } else {
            val e2 = doubledEdges(e)
            val fw = reachOver(seed, e2, forward = true)
            val bw = reachOver(seed, e2, forward = false)
            materialize(fw.intersect(bw))
          }
        out ::= comp.select(col("node"), lit(pivot).as("scc"))
        val nm = materializeCountMin(nodes.except(comp), "node")
        nodes = nm._1
        nNodes = nm._2
        pivot = nm._3
      }
      rounds += 1
    }
    // a round budget that runs out with nodes remaining must FAIL, not
    // return a silently-partial labeling
    require(nNodes == 0,
      s"scc did not converge within $maxRounds rounds ($nNodes nodes remain)")
    val empty = edges.select(col("src").as("node"), col("src").as("scc"))
      .where(lit(false))
    (out.foldLeft(empty)(_ unionByName _), rounds)
  }

  /** Strongly-connected components MAINTAINED under edge deltas including
    * retractions — incremental maintenance of a NESTED fixpoint (the
    * reference expresses this as nested incremental recursion,
    * recursive.rs nested scopes + distinct.rs:78-100 DistinctIncremental;
    * here it is explicit affected-component recompute, the IncrementalClosure
    * strategy lifted one nesting level).
    *
    * Affected-set analysis per epoch (delta = ±(src, dst) Z-set):
    *  - any NEW SCC that uses an inserted edge (u, v) lies on a cycle
    *    through it, so every member is reachable from v AND reaches u:
    *    members ⊆ fw(V) ∩ bw(U) over the NEW edge set (V/U = inserted
    *    heads/tails). The set is closed under SCC membership (a mate of a
    *    member is also in both closures).
    *  - any SCC that SHRINKS (deletion) is confined to the OLD component
    *    of the deleted edge's endpoints — old components of all touched
    *    nodes are included wholesale.
    *  - an SCC using no inserted edge is inside an old SCC, so if it
    *    intersects the affected set it is covered by the old-component
    *    term; one that uses an inserted edge is covered by the fw∩bw term
    *    — together the affected set is SCC-closed in the new graph, and
    *    recomputing `scc` on its induced subgraph is exact.
    *
    * Per-epoch cost: two reachability fixpoints seeded at the delta's
    * endpoints (O(their reach), log-barrier 2-hop steps) + the nested
    * `scc` on the affected subgraph + one anti-join relabel — components
    * the delta cannot touch are never read. */
  final class IncrementalScc(initEdges: ZSetFrame) {
    private var edges: DataFrame =
      materialize(initEdges.distinctZ.toDF.select("src", "dst"))
    private var labels: DataFrame = materialize(scc(edges))

    def currentLabels: DataFrame = labels

    /** Superseded (labels, edges) generations pending release. The frame a
      * `step` returns is a pinned checkpoint the caller may still be
      * reading when the NEXT step lands, so — like KeyedState's retired
      * segments — a superseded generation is unpersisted two steps later,
      * not immediately (the lifecycle discipline ADVICE r9 asked for). */
    private val retireQ =
      new graft.incremental.RetireQueue[DataFrame](graft.incremental.Pinned.release)

    private def retire(dfs: DataFrame*): Unit = retireQ.retire(dfs: _*)

    /** Release ALL pinned generations (current + pending). The state is
      * unusable afterwards; callers materialize outputs they need first. */
    def close(): Unit = {
      retireQ.close()
      graft.incremental.Pinned.release(labels)
      graft.incremental.Pinned.release(edges)
    }

    /** one epoch: apply a ±edge delta, repair the labeling; returns it */
    def step(delta: ZSetFrame): DataFrame = {
      retireQ.advance()
      val dAll = materialize(delta.df.select("src", "dst", ZSetFrame.W))
      val eNew = materialize(
        (ZSetFrame.fromTable(edges) + ZSetFrame.fromDelta(dAll))
          .distinctZ.toDF.select("src", "dst"))
      // insert-presence rides the materialization (r17 — see fixpoint):
      // the retraction-only-epoch fast path costs no extra isEmpty job
      val (inserted, nIns) = materializeCounted(
        dAll.where(col(ZSetFrame.W) > 0))
      val touched = materialize(
        dAll.select(col("src").as("node"))
          .union(dAll.select(col("dst").as("node"))).distinct())
      // old components of every touched node (covers splits). Both probe
      // sides here are O(Δ)-bounded by the CDC contract (touched = the
      // delta's endpoints; tscc = their component ids), so they broadcast
      // (r18, guide §3.1): without the hint the RDD-backed frames carry no
      // stats, the planner picks a shuffle join, and AQE only converts it
      // AFTER materializing both shuffle stages — two scheduling-floor
      // stage jobs per epoch for a join whose build side is delta-sized.
      // The LABELS side (corpus-sized) is never shuffled now.
      val touchedComps = labels
        .join(broadcast(labels.join(broadcast(touched), Seq("node"),
            "left_semi")
          .select(col("scc").as("tscc")).distinct()),
          col("scc") === col("tscc"), "left_semi")
        .select("node")
      // cycles through inserted edges (covers merges): fw(heads) ∩ bw(tails).
      // A RETRACTION-ONLY epoch skips this entirely — no inserted edge, no
      // new cycle, so the whole doubled-edge + reachability block (the
      // epoch's priciest fixpoints) is dead weight. With inserts, the
      // BACKWARD span bw(tails) is computed first and the forward search is
      // RESTRICTED to it: any node x ∈ fw ∩ bw has every node of its
      // v →* x path inside bw too (each such node reaches x, hence the
      // tails), so forward frontier work is bounded by the NEW CYCLE SPAN,
      // never the graph's downstream fan-out — at 100 TB the insert's
      // cycle is small even when its transitive fan-out is everything.
      val cycleSpan =
        if (nIns == 0L) null
        else {
          val e2New = doubledEdges(eNew)
          val bwIn = reachOver(materialize(
            inserted.select(col("src").as("node")).distinct()),
            e2New, forward = false)
          val e2Span = e2New
            .join(bwIn.select(col("node").as("src")), Seq("src"), "left_semi")
            .join(bwIn.select(col("node").as("dst")), Seq("dst"), "left_semi")
            .select("src", "dst")
          val fwSeed = inserted.select(col("dst").as("node")).distinct()
            .join(bwIn, Seq("node"), "left_semi")
          reachOver(materialize(fwSeed), materialize(e2Span), forward = true)
        }
      val affected = materialize(
        (if (cycleSpan == null) touchedComps
         else cycleSpan.unionByName(touchedComps))
          .unionByName(touched).distinct())
      // induced subgraph on the affected set; nested scc() relabels it
      val (sub, nSub) = materializeCounted(eNew
        .join(affected.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(affected.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst"))
      val relabeled =
        if (nSub == 0L) sub.sparkSession.emptyDataFrame
          .select(lit(0L).as("node"), lit(0L).as("scc")).where(lit(false))
        else scc(sub)
      // affected nodes outside the subgraph are singletons IF they still
      // touch any edge (an affected node's cycle edges would all be in
      // `sub` by SCC-closure, so outside-sub means genuinely acyclic);
      // nodes that lost their last edge leave the labeling entirely —
      // batch scc labels only edge-endpoint nodes
      val isolated = affected
        .join(sub.select(col("src").as("node"))
          .union(sub.select(col("dst").as("node"))).distinct(),
          Seq("node"), "left_anti")
      val isolatedLive = isolated
        .join(eNew, isolated("node") === eNew("src"), "left_semi")
        .union(isolated
          .join(eNew, isolated("node") === eNew("dst"), "left_semi"))
        .distinct()
        .select(col("node"), col("node").as("scc"))
      val (oldLabels, oldEdges) = (labels, edges)
      labels = materialize(
        labels.join(affected, Seq("node"), "left_anti")
          .unionByName(relabeled).unionByName(isolatedLive))
      edges = eNew
      retire(oldLabels, oldEdges)
      labels
    }
  }

  /** PageRank — ITERATED WEIGHTED SUMS inside the recursion (reference:
    * crates/dbsp/benches/ldbc-graphalytics/pagerank.rs). Fixed iteration
    * count (the LDBC formulation); per-iteration contribution sums go
    * through DECIMAL so they are order-independent — the same ranks on any
    * partitioning/cluster size. Dangling mass is redistributed uniformly;
    * only that one scalar crosses the driver per iteration. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = (c: org.apache.spark.sql.Column) =>
      sum(c.cast(DecimalType(28, 14))).cast("double")
    val (nodes, n) = materializeCounted(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct())
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val e = materialize(edges.join(deg, "src")
      .select(col("src"), col("dst"), col("deg")))
    val srcs = materialize(e.select("src").distinct())
    var ranks = materialize(nodes.select(col("node"), lit(1.0 / n).as("rank")))
    for (_ <- 1 to iters) {
      // dangling mass stays IN the plan: a 1-row aggregate broadcast by the
      // cross join — one materialize job per iteration, no driver collect
      val dangling = ranks.join(srcs, ranks("node") === srcs("src"), "left_anti")
        .agg(coalesce(dec(col("rank")), lit(0.0)).as("dm"))
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(dec(col("c")).as("cs"))
      ranks = materialize(nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("cs"), lit(0.0)) + col("dm") / lit(n.toDouble)))
            .as("rank")))
    }
    ranks
  }

  /** BFS min-distance fixpoint — an AGGREGATE (min-fold) inside the
    * recursion, which plain closure cannot express (reference:
    * crates/dbsp/benches/ldbc-graphalytics/bfs.rs:8-14 — Min aggregate
    * inside the recursive stream). Frontier-based semi-naive: only rows
    * whose distance IMPROVED feed the next iteration, so iteration count =
    * graph eccentricity and per-iteration work = frontier ⋈ edges. */
  def bfs(edges: DataFrame /* src, dst */, roots: DataFrame /* node */,
          maxIter: Int = 1000): DataFrame = {
    val (dist0, n0) = materializeCounted(
      roots.select(col("node"), lit(0L).as("dist")))
    var dist = dist0
    var frontier = dist0
    var nFrontier = n0
    var i = 0
    while (i < maxIter && nFrontier > 0) {
      val cand = frontier.join(edges, frontier("node") === edges("src"))
        .select(edges("dst").as("node"), (frontier("dist") + 1L).as("dist"))
        .groupBy("node").agg(min("dist").as("dist"))
      val cur = dist.withColumnRenamed("dist", "old")
      // frontier emptiness rides the materialization (r17 — see fixpoint):
      // two driver actions per level, down from four
      val (improved, m) = materializeCounted(
        cand.join(cur, Seq("node"), "left")
          .where(col("old").isNull || col("dist") < col("old"))
          .select("node", "dist"))
      if (m > 0) {
        dist = materialize(
          dist.join(improved, Seq("node"), "left_anti").union(improved))
      }
      frontier = improved
      nFrontier = m
      i += 1
    }
    dist
  }
}
