"""Shared driver-coordinated iterative-DataFrame loop (Pregel-style).

Every iterative graph algorithm in this repo — PageRank (fixed and
delta-stop), connected components (fixed and fixed-point-stop), k-core
peeling, label propagation — is the same control shape: a *state*
DataFrame stepped through join-based rounds, with two scale hazards that
each hand-rolled copy had to solve separately:

1. **Lineage blowup**: N chained rounds = an N-deep plan; any action
   replays the whole chain and the optimizer re-analyzes a growing tree
   every round.  Bounded here by an eager ``localCheckpoint`` every
   ``checkpoint_every`` rounds (the cadence amortizes the per-checkpoint
   job against group size — the pagerank loop measured per-round driver
   actions as the dominant cost of small iterations).
2. **Convergence tests re-running the chain**: a delta/changed-count probe
   on an *unmaterialized* state re-executes every round so far.  The
   contract therefore only evaluates ``converged`` on a freshly
   checkpointed state, so the probe reads materialized partitions.

Checkpoint-cadence/convergence contract:

- the initial state is eagerly checkpointed before round 1 (steps never
  replay upstream ETL — the k-core fix for the copurchase self-join);
- ``step`` is pure plan construction: state in, next state out, no
  actions; whatever bookkeeping a convergence probe needs (an
  ``old_rank``/``old_label`` carry column) is ``step``'s to produce and
  the caller's to strip afterwards;
- ``converged(state)`` — if given — runs after each checkpoint group on
  the checkpointed state and stops the loop when True.  With
  ``checkpoint_every > 1`` the probe sees the LAST round's carry columns,
  which for monotone-contraction algorithms (damped pagerank, min-label
  CC) is the group's tightest bound — the correct stop signal.

The cut itself is deployment-switched via ``sparkutil.lineage_cut``:
``localCheckpoint`` on local masters (executor loss = driver loss there,
so the no-fallback tradeoff costs nothing), reliable ``checkpoint(dir)``
on any non-local master (``SPARK_GRAFT_CHECKPOINT[_DIR]``) so a lost
executor mid-loop recomputes from storage instead of failing the job.
Used by: queries/graph_analytics.py (all four algorithm
families) — reference has no iterative operators beyond shortestPath
(src/extendDocument.coffee:352-366), which keeps its own BFS in paths.py
because its per-hop visited-set bookkeeping is not a state-step loop.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from mongraph_spark.sparkutil import lineage_cut


def _release_blocks(df: DataFrame) -> None:
    """Free a DEAD loop state's checkpoint blocks immediately.

    Each eager ``lineage_cut`` pins its materialized state (RDD blocks
    for ``localCheckpoint``, a cached copy on top of the files for
    reliable ``checkpoint``) until the DataFrame is garbage collected on
    BOTH sides of py4j — which in practice is "never" within a session:
    a 6-round loop leaked 7 persisted RDDs per query execution (measured
    via ``getPersistentRDDs``: +7/trial, monotone across a session).
    Locally that is driver-heap pressure across a 150-query bench
    session; at scale it is executor storage holding EVERY round's state
    instead of the 2 live ones (guide §5: unpersist when done).  The cut
    frame's analyzed plan is exactly one ``LogicalRDD`` node; unpersist
    its RDD.  Only ever called on states the loop itself created and
    that nothing downstream can reference (the returned final state is
    never released).  Best-effort: any reflection surprise degrades to
    the old keep-until-GC behavior."""
    try:
        _quiet_unpersist_warning(df.sparkSession)
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


_QUIETED_SESSIONS: set[int] = set()


def _quiet_unpersist_warning(spark) -> None:
    """Mute MapPartitionsRDD's per-release WARN ("locally checkpointed …
    cannot be recomputed after unpersisting") — that is exactly the
    intended behavior here (the released state is dead by the loop
    contract), and a 12-round loop would otherwise emit 12 warning lines
    per query into any session's logs, the evaluation driver's vanilla
    one included.  Scoped to that single class; set once per session."""
    key = id(spark)
    if key in _QUIETED_SESSIONS:
        return
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.rdd.MapPartitionsRDD",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass
    _QUIETED_SESSIONS.add(key)


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    *,
    max_rounds: int,
    checkpoint_every: int = 1,
    converged: Callable[[DataFrame], bool] | None = None,
) -> tuple[DataFrame, int]:
    """Run ``step`` up to ``max_rounds`` times with bounded lineage.

    Returns ``(final_state, rounds_run)``; the final state is always an
    eagerly checkpointed DataFrame (safe to reuse after callers unpersist
    their inputs).
    """
    if max_rounds < 0:
        raise ValueError(f"max_rounds must be >= 0, got {max_rounds}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    # lineage_cut = localCheckpoint on local masters, reliable
    # checkpoint() on clusters (SPARK_GRAFT_CHECKPOINT / _DIR): a lost
    # executor mid-iteration recomputes from the checkpoint dir instead
    # of failing the whole loop
    state = lineage_cut(state, eager=True)
    rounds = 0
    while rounds < max_rounds:
        group = min(checkpoint_every, max_rounds - rounds)
        cur = state
        for _ in range(group):
            cur = step(cur)
        cur = lineage_cut(cur, eager=True)
        # the previous state is dead the moment cur is materialized (the
        # contract: steps are pure plan construction over the incoming
        # state, probes run on the freshly cut state, callers get only
        # the final state) — release its blocks instead of holding every
        # round's state until session GC
        _release_blocks(state)
        rounds += group
        state = cur
        if converged is not None and converged(cur):
            break
    return state, rounds
